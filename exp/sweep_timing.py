"""Lean sweep-tracer timing on the real chip (no while-loop oracle, which
takes ~15+ min to compile at 524k rays — parity is covered by
tests/test_tpu.py and exp/sweep_probe.py).

Usage: python exp/sweep_timing.py [n_rays]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops.sweep import closest_hit_swept

R = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
W, H = 1024, 512

t0 = time.time()
_, scene = build_reference_scene(objects=("floor", "loong"))
print(f"scene: {scene.n_triangles} tris, {scene.cl_aabb_min.shape[0]} "
      f"clusters ({time.time()-t0:.0f}s)", flush=True)

cam = Camera.make(aspect=W / H)
u, v = pixel_uv(W, H)
o, d = cam.generate_rays(u, v)
o, d = jax.block_until_ready((o[:R], d[:R]))
cfg = RenderConfig(width=W, height=H)

casts = {
    False: jax.jit(lambda o, d, m: closest_hit_swept(scene, o, d, cfg, mask=m)),
    True: jax.jit(lambda o, d, m: closest_hit_swept(scene, o, d, cfg, mask=m,
                                                    any_hit=True)),
}
mask_all = jnp.ones((R,), bool)


def time_cast(o, d, any_hit, mask=mask_all, n=10):
    f = casts[any_hit]
    t0 = time.time()
    jax.block_until_ready(f(o, d, mask).t)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        hit = f(o, d, mask)
    jax.block_until_ready(hit.t)
    return (time.time() - t0) / n, tc


dt, tc = time_cast(o, d, False)
print(f"coherent closest ({R} rays): {dt*1e3:.1f} ms ({R/dt/1e6:.2f} Mrays/s)"
      f"  [first call {tc:.0f}s]", flush=True)

hit = casts[False](o, d, mask_all)
hp = o + d * jnp.minimum(hit.t, 100.0)[:, None]
key = jax.random.PRNGKey(0)
rd = jax.random.normal(key, (R, 3))
rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
rd = rd * jnp.where(rd[:, 1:2] < 0, -1.0, 1.0)
hp, rd = jax.block_until_ready((hp, rd))

dt, _ = time_cast(hp, rd, True)
print(f"incoherent any-hit: {dt*1e3:.1f} ms ({R/dt/1e6:.2f} Mrays/s)",
      flush=True)
dt, tc = time_cast(hp, rd, False)
print(f"incoherent closest: {dt*1e3:.1f} ms ({R/dt/1e6:.2f} Mrays/s)",
      flush=True)

# half-dead batch: dead-lane compaction check (alternating mask is the
# worst pre-sort layout; post-sort it should cost ~half of full)
mask_half = (jnp.arange(R) % 2 == 0)
dt, _ = time_cast(hp, rd, False, mask=mask_half)
print(f"incoherent closest, 50% masked: {dt*1e3:.1f} ms", flush=True)
