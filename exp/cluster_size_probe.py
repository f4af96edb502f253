"""Cluster size sweep for incoherent casts: fewer/larger clusters halve the
span count per tile at the cost of more padded triangles per span. The
kernel is DMA-latency-bound per span, so fewer spans should win.
PYTHONPATH=/root/repo python exp/cluster_size_probe.py
"""
import sys, time
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops.sweep import closest_hit_swept
from opengl_ray_tracing_framework_tpu.ops.traverse import closest_hit

R = 131072


def timeit(fn, *a, n=10):
    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


config = RenderConfig(width=1024, height=512, use_pallas=True,
                      pallas_backend="sweep")
camera = Camera.make(aspect=2.0)
u, v = pixel_uv(1024, 512)
o_full, d_full = camera.generate_rays(u, v)

rng = np.random.default_rng(0)
rd = rng.normal(size=(R, 3)); rd /= np.linalg.norm(rd, axis=1)[:, None]
rd = jnp.asarray(rd.astype(np.float32))

base = None
for csize in (256, 512, 1024):
    scene_obj, scene = build_reference_scene(objects=("floor", "loong"))
    if csize != 256:
        scene = scene_obj.build(cluster_size=csize)
    C = scene.cl_aabb_min.shape[0]

    hit0 = jax.block_until_ready(
        closest_hit(scene, o_full[:R], d_full[:R], config))
    hp = o_full[:R] + d_full[:R] * jnp.minimum(hit0.t, 50.0)[:, None]
    mask = hit0.is_hit

    fwd = jax.jit(lambda o, d, m, sc=scene: closest_hit_swept(
        sc, o, d, config, mask=m, secondary=True))
    coh = timeit(fwd, o_full[:R], d_full[:R],
                 jnp.ones(R, bool))
    inc = timeit(fwd, hp, rd, mask)
    hit = jax.block_until_ready(fwd(hp, rd, mask))
    if base is None:
        base = np.asarray(hit.t)
    else:
        match = np.isclose(base, np.asarray(hit.t), rtol=1e-5, atol=1e-5)
        print(f"   parity vs 256: {match.mean()*100:.3f}% close")
    print(f"cluster={csize:4d} (C={C:4d}): coherent {coh*1e3:7.1f} ms, "
          f"incoherent {inc*1e3:7.1f} ms", flush=True)
