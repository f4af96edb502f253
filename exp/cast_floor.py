"""Dissect the ~9 ms fixed floor of a w=2048 secondary cast.
PYTHONPATH=/root/repo python exp/cast_floor.py
"""
import sys, time
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops.schedule import cluster_tnear
from opengl_ray_tracing_framework_tpu.ops.sweep import _sort_key, _swept_impl
from opengl_ray_tracing_framework_tpu.ops.intersect import INF
from opengl_ray_tracing_framework_tpu.ops.traverse import closest_hit

_, scene = build_reference_scene(objects=("floor", "loong"))
config = RenderConfig(width=1024, height=512, use_pallas=True,
                      pallas_backend="sweep")
C = scene.cl_aabb_min.shape[0]
print("clusters C =", C, "trifeat", scene.cl_trifeat.shape)

camera = Camera.make(aspect=2.0)
u, v = pixel_uv(1024, 512)
o_full, d_full = camera.generate_rays(u, v)
hit0 = jax.block_until_ready(closest_hit(scene, o_full[:131072],
                                         d_full[:131072], config))
# incoherent bounce-ish rays: hit points, reflected-ish directions
hp = o_full[:131072] + d_full[:131072] * jnp.minimum(hit0.t, 50.0)[:, None]
rng = np.random.default_rng(0)
rd = rng.normal(size=(131072, 3)); rd /= np.linalg.norm(rd, axis=1)[:, None]
rd = jnp.asarray(rd.astype(np.float32))
mask_full = hit0.is_hit


def timeit(fn, *a, n=20):
    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


for w in (2048, 8192, 32768):
    o, d, m = hp[:w], rd[:w], mask_full[:w]

    slab = jax.jit(lambda o, d: cluster_tnear(o, d, scene.cl_aabb_min,
                                              scene.cl_aabb_max))
    t_slab = timeit(slab, o, d)

    def sortfn(o, d, m):
        tn = cluster_tnear(o, d, scene.cl_aabb_min, scene.cl_aabb_max)
        key = _sort_key(tn, d, m)
        perm = jax.lax.sort((key, jnp.arange(w, dtype=jnp.int32)),
                            num_keys=1)[1]
        return o[perm], d[perm], jnp.take(tn, perm, axis=0)
    t_sort = timeit(jax.jit(sortfn), o, d, m)

    def spans(o, d):
        tn = cluster_tnear(o, d, scene.cl_aabb_min, scene.cl_aabb_max)
        g = w // 128
        tile_tn = tn.reshape(g, 128, -1).min(axis=1)
        order = jnp.argsort(tile_tn, axis=1)
        ts = jnp.take_along_axis(tile_tn, order, axis=1)
        nspan = jnp.sum(ts < INF, axis=1)
        return order, nspan
    t_spans = timeit(jax.jit(spans), o, d)

    full = jax.jit(lambda o, d, m: _swept_impl(
        o, d, m, scene.cl_aabb_min, scene.cl_aabb_max, scene.cl_trifeat,
        scene.cl_slot2tri, any_hit=False, interpret=False, tile_r=128,
        precision="highest", depth=8))
    t_full = timeit(full, o, d, m)

    # spans stats
    order, nspan = jax.jit(spans)(o, d)
    print(f"w={w:6d}: slab {t_slab*1e3:6.2f}  slab+sort {t_sort*1e3:6.2f}  "
          f"slab+spans {t_spans*1e3:6.2f}  full cast {t_full*1e3:6.2f} ms  "
          f"nspan mean {float(jnp.mean(nspan)):6.1f} max {int(jnp.max(nspan))}")
