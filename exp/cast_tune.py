"""Sweep-kernel tile-size tuning on the real chip.

The round-3 breakdown showed per-grid-step cost is roughly constant
(~150-180 us/step at both tile 256 and tile 1024), which would make the
fastest tile the LARGEST one whose span unions stay small. This probe
times realistic bounce-style and shadow-style casts (hit points of the
loong-100k primary cast + hemisphere / env-sample directions, ~45% dead
lanes like a real depth-2 batch) across kernel tile sizes.

Usage: python exp/cast_tune.py [n_rays]
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
from opengl_ray_tracing_framework_tpu.ops.envmap import env_sample_nearest
from opengl_ray_tracing_framework_tpu.ops.sampling import rand01
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
o, d = o[:R], d[:R]
pid = jnp.arange(R, dtype=jnp.uint32)

cfg0 = RenderConfig(width=W, height=H)
hit = closest_hit_swept(scene, o, d, cfg0)
alive = hit.tri >= 0
hp = o + d * jnp.minimum(hit.t, 100.0)[:, None]

z1 = rand01(pid, jnp.int32(2), 0) * 2.0 - 1.0
z2 = rand01(pid, jnp.int32(2), 1) * 2.0 * jnp.pi
s = jnp.sqrt(jnp.maximum(1.0 - z1 * z1, 0.0))
bd = jnp.stack([s * jnp.cos(z2), jnp.abs(z1), s * jnp.sin(z2)], axis=-1)

hh, ww = scene.hdr_map.shape[0], scene.hdr_map.shape[1]
ld, _, _ = env_sample_nearest(scene.env_fetch, hh, ww,
                           rand01(pid, jnp.int32(1), 0),
                           rand01(pid, jnp.int32(1), 1), scene.env_angle)
hp, bd, ld, alive = jax.block_until_ready((hp, bd, ld, alive))
frac = float(alive.mean())
print(f"alive fraction after primary: {frac:.2f}", flush=True)


def time_cast(tile, any_hit, d_, depth=8, n=10):
    cfg = cfg0.replace(sweep_tile_secondary=tile,
                       sweep_prefetch_depth=depth)
    f = jax.jit(lambda o, d, m: closest_hit_swept(
        scene, o, d, cfg, mask=m, any_hit=any_hit, secondary=True))
    jax.block_until_ready(f(hp, d_, alive).t)
    t0 = time.time()
    for _ in range(n):
        out = f(hp, d_, alive)
    jax.block_until_ready(out.t)
    return (time.time() - t0) / n


for depth in (2, 4, 8, 16):
    for tile in (128, 256, 512):
        tb = time_cast(tile, False, bd, depth)
        ts = time_cast(tile, True, ld, depth)
        print(f"depth {depth:2d} tile {tile:5d}: "
              f"bounce-closest {tb*1e3:7.1f} ms ({R/tb/1e6:5.2f} Mrays/s)   "
              f"shadow-anyhit {ts*1e3:7.1f} ms ({R/ts/1e6:5.2f} Mrays/s)",
              flush=True)
