"""Validate + time the swept span-list tracer.

Usage:
  JAX_PLATFORMS=cpu python exp/sweep_probe.py cpu    # interpret parity
  python exp/sweep_probe.py tpu                      # hw parity + timing
"""
import os
import sys
import time

import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if mode == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import (
    build_reference_scene, build_test_scene)
from opengl_ray_tracing_framework_tpu.ops.sweep import closest_hit_swept
from opengl_ray_tracing_framework_tpu.ops.traverse import bvh_closest_hit

interpret = mode == "cpu"

if mode == "cpu":
    builder, _ = build_test_scene(n_sphere_subdiv=3)
    scene = builder.build(cluster_size=16)   # many clusters on a toy scene
    W, H = 64, 32
else:
    _, scene = build_reference_scene(objects=("floor", "loong"))
    W, H = 1024, 512

print(f"scene: {scene.n_triangles} tris, {scene.cl_aabb_min.shape[0]} "
      f"clusters", flush=True)

cam = Camera.make(aspect=W / H)
u, v = pixel_uv(W, H)
o, d = cam.generate_rays(u, v)
R = o.shape[0]

cfg = RenderConfig(width=W, height=H)

for any_hit in (False, True):
    hit_s = closest_hit_swept(scene, o, d, cfg, any_hit=any_hit,
                              interpret=interpret)
    hit_o = bvh_closest_hit(scene, o, d)
    ts = np.asarray(hit_s.t)
    to = np.asarray(hit_o.t)
    if any_hit:
        ok = (np.asarray(hit_s.tri) >= 0) == (np.asarray(hit_o.tri) >= 0)
        print(f"any_hit occlusion agree: {ok.mean():.6f}", flush=True)
        assert ok.all()
    else:
        same_tri = (np.asarray(hit_s.tri) == np.asarray(hit_o.tri))
        dt = np.abs(ts - to)
        print(f"closest: tri agree {same_tri.mean():.6f} "
              f"max|t diff| {dt[np.isfinite(dt)].max():.2e}", flush=True)
        assert same_tri.mean() > 0.99999, same_tri.mean()
        agree = np.isclose(ts, to, atol=1e-4, rtol=1e-5)
        assert (~agree).mean() < 1e-5, (~agree).mean()

# masked lanes return misses
mask = jnp.arange(R) % 2 == 0
hm = closest_hit_swept(scene, o, d, cfg, mask=mask, interpret=interpret)
assert (np.asarray(hm.tri)[1::2] == -1).all()
assert (np.asarray(hm.t)[1::2] >= 114514.0).all()
print("mask ok", flush=True)

if mode == "tpu":
    def time_cast(o, d, any_hit, n=10):
        f = jax.jit(lambda o, d: closest_hit_swept(
            scene, o, d, cfg, any_hit=any_hit))
        jax.block_until_ready(f(o, d).t)
        t0 = time.time()
        for _ in range(n):
            hit = f(o, d)
        jax.block_until_ready(hit.t)
        return (time.time() - t0) / n

    dt = time_cast(o, d, False)
    print(f"primary closest cast ({R} rays): {dt*1e3:.1f} ms "
          f"({R/dt/1e6:.1f} Mrays/s)", flush=True)
    dt = time_cast(o, d, True)
    print(f"primary any-hit cast: {dt*1e3:.1f} ms ({R/dt/1e6:.1f} Mrays/s)",
          flush=True)

    # incoherent cast: shadow-like directions from hit points
    hit = closest_hit_swept(scene, o, d, cfg)
    hp = o + d * jnp.minimum(hit.t, 100.0)[:, None]
    key = jax.random.PRNGKey(0)
    rd = jax.random.normal(key, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    rd = rd * jnp.where(rd[:, 1:2] < 0, -1.0, 1.0)   # upper hemisphere
    hp = jax.block_until_ready(hp)
    dt = time_cast(hp, rd, True)
    print(f"incoherent any-hit cast: {dt*1e3:.1f} ms ({R/dt/1e6:.1f} "
          f"Mrays/s)", flush=True)
    dt = time_cast(hp, rd, False)
    print(f"incoherent closest cast: {dt*1e3:.1f} ms ({R/dt/1e6:.1f} "
          f"Mrays/s)", flush=True)
