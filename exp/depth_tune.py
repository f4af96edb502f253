"""Prefetch-ring depth tuning with honest fencing: per-tile fixed cost
scales with depth (prologue DMA starts + per-step drain guards), so the
round-3 depth=8 may now be past the knee.
Usage: python exp/depth_tune.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops.sweep import _swept_impl
from opengl_ray_tracing_framework_tpu.ops.traverse import closest_hit

R = 131072
_, scene = build_reference_scene(objects=("floor", "loong"))
config = RenderConfig(width=1024, height=512, use_pallas=True)
cam = Camera.make(aspect=2.0)
u, v = pixel_uv(1024, 512)
o, d = cam.generate_rays(u, v)
o, d = o[:R], d[:R]
hit0 = closest_hit(scene, o, d, config)
float(hit0.t[0])
hp = o + d * jnp.minimum(hit0.t, 50.0)[:, None]
rng = np.random.default_rng(0)
rd = rng.normal(size=(R, 3)); rd /= np.linalg.norm(rd, axis=1)[:, None]
rd = jnp.asarray(rd.astype(np.float32))
mask = hit0.is_hit


def timeit(fn, n=10):
    float(fn().t[0])
    t0 = time.time()
    for _ in range(n):
        float(fn().t[0])
    return (time.time() - t0) / n


ref = None
for depth in (2, 3, 4, 6, 8):
    cast = lambda oo, dd, mm, dep=depth: _swept_impl(
        oo, dd, mm, scene.cl_aabb_min, scene.cl_aabb_max, scene.cl_trifeat,
        scene.cl_slot2tri, any_hit=False, interpret=False, tile_r=128,
        precision="highest", depth=dep)
    coh = timeit(lambda: cast(o, d, jnp.ones(R, bool)))
    inc = timeit(lambda: cast(hp, rd, mask))
    hit = cast(hp, rd, mask)
    t = np.asarray(hit.t)
    if ref is None:
        ref = t
    else:
        assert np.allclose(ref, t, rtol=1e-5, atol=1e-5), "depth changed result!"
    print(f"depth={depth}: coherent {coh*1e3:6.1f} ms  "
          f"incoherent {inc*1e3:6.1f} ms", flush=True)
