"""Bisect the render_pass compile time (BENCH_r02 recorded 892 s).

Times .lower() and .compile() separately for each suspect at the bench
shape (1024x512, 8 bounces, loong-100k, 131072-ray tiles):

  1. one _swept_impl cast (closest / any-hit)
  2. one trace_radiance tile (the lax.map body: 1 + 16 casts + shading)
  3. the full render_pass

Usage: python exp/compile_bisect.py [tile_rays]
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
from opengl_ray_tracing_framework_tpu.ops.integrator import trace_radiance
from opengl_ray_tracing_framework_tpu.render import (
    init_render_state, render_pass)

TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
W, H, B = 1024, 512, 8

_, scene = build_reference_scene(objects=("floor", "loong"))
cam = Camera.make(aspect=W / H)
cfg = RenderConfig(width=W, height=H, max_bounce=B, use_pallas=True)

u, v = pixel_uv(W, H)
o, d = cam.generate_rays(u, v)
o, d = o[:TILE], d[:TILE]
pid = jnp.arange(TILE, dtype=jnp.uint32)


def timed(name, fn, *args, **static):
    t0 = time.time()
    lowered = jax.jit(fn, **static).lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    print(f"{name:38s} lower {t_lower:7.2f}s  compile {t_compile:7.2f}s",
          flush=True)


def kernel_only(rayfeat, best, spans, nspan, tile_sorted):
    """The pallas_call alone (host prep precomputed) — isolates Mosaic."""
    import functools as ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from opengl_ray_tracing_framework_tpu.ops.sweep import _sweep_kernel
    from opengl_ray_tracing_framework_tpu.ops.intersect_pallas import (
        BEST_W, N_FEAT)
    trifeat = scene.cl_trifeat
    r = rayfeat.shape[0]
    g = r // 1024
    c = trifeat.shape[0]
    rows, cols = trifeat.shape[1], trifeat.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1024, N_FEAT), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1024, BEST_W), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1024, BEST_W), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = ft.partial(_sweep_kernel, t_blk=cols // 4, any_hit=False,
                      tile_r=1024, precision="highest")
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, BEST_W), jnp.float32),
        input_output_aliases={4: 0},
    )(nspan, spans, tile_sorted, rayfeat, best, trifeat)


def host_prep_only(o, d):
    """Everything _swept_impl does around the kernel: sort, tnear, spans."""
    from opengl_ray_tracing_framework_tpu.ops.sweep import (
        _DEAD_KEY, _sort_key)
    from opengl_ray_tracing_framework_tpu.ops.schedule import cluster_tnear
    from opengl_ray_tracing_framework_tpu.ops.intersect import INF
    from opengl_ray_tracing_framework_tpu.ops.intersect_pallas import (
        ray_features)
    r = o.shape[0]
    g = r // 1024
    c = scene.cl_aabb_min.shape[0]
    lo = jnp.min(scene.cl_aabb_min, axis=0)
    hi = jnp.max(scene.cl_aabb_max, axis=0)
    key = _sort_key(o, d, lo, hi)
    perm = jax.lax.sort((key, jnp.arange(r, dtype=jnp.int32)),
                        num_keys=1)[1]
    o, d = o[perm], d[perm]
    tn = cluster_tnear(o, d, scene.cl_aabb_min, scene.cl_aabb_max)
    tile_tn = tn.reshape(g, 1024, c).min(axis=1)
    order = jnp.argsort(tile_tn, axis=1)
    tile_sorted = jnp.take_along_axis(tile_tn, order, axis=1)
    nspan = jnp.sum(tile_sorted < INF, axis=1).astype(jnp.int32)
    rayfeat = ray_features(o, d)
    best = jnp.zeros((r, 8), jnp.float32)
    return (rayfeat, best, order.astype(jnp.int32).reshape(g, 1, c),
            nspan, tile_sorted.reshape(g, 1, c))


prep = jax.jit(host_prep_only).lower(o, d).compile()
pre = jax.block_until_ready(prep(o, d))
timed("host prep only (sort+tnear+spans)", host_prep_only, o, d)
timed("pallas kernel only (Mosaic)", kernel_only, *pre)

timed("swept closest (1 cast)",
      lambda o, d: closest_hit_swept(scene, o, d, cfg), o, d)
timed("swept any-hit (1 cast)",
      lambda o, d: closest_hit_swept(scene, o, d, cfg, any_hit=True), o, d)
timed("trace_radiance (1 tile, 17 casts)",
      lambda o, d, pid: trace_radiance(scene, o, d, pid, jnp.int32(1), cfg),
      o, d, pid)

state = init_render_state(cfg)
timed("render_pass (full frame)",
      lambda s, c, st: render_pass(s, c, st, cfg, rays_per_tile=TILE),
      scene, cam, state)
