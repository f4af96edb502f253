"""Isolate pallas grid-step overhead: a kernel that only copies its
(tile, 8) best block, same block structure as the sweep, at G=1024 steps.
Usage: python exp/grid_overhead.py
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *a, n=20):
    float(fn(*a)[0, 0])
    t0 = time.time()
    for _ in range(n):
        float(fn(*a)[0, 0])
    return (time.time() - t0) / n


R, C = 131072, 589
for tile in (128, 256):
    g = R // tile

    def copy_kernel(nspan_ref, spans_ref, tnear_ref, rayfeat_ref, best_ref,
                    out_ref):
        out_ref[:] = best_ref[:] + rayfeat_ref[:, :8]

    nspan = jnp.zeros((g,), jnp.int32)
    spans = jnp.zeros((g, 1, C), jnp.int32)
    tnear = jnp.zeros((g, 1, C), jnp.float32)
    rayfeat = jnp.ones((R, 16), jnp.float32)
    best = jnp.zeros((R, 8), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 8), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    fn = jax.jit(lambda n_, s_, t_, r_, b_: pl.pallas_call(
        copy_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
    )(n_, s_, t_, r_, b_))
    dt = timeit(fn, nspan, spans, tnear, rayfeat, best)
    print(f"tile={tile}: {dt*1e3:.2f} ms for {g} steps "
          f"= {dt/g*1e6:.2f} us/step", flush=True)

    # same but WITHOUT the (1,1,C) span/tnear blocks
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tile, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 8), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    def copy_kernel2(nspan_ref, rayfeat_ref, best_ref, out_ref):
        out_ref[:] = best_ref[:] + rayfeat_ref[:, :8]

    fn2 = jax.jit(lambda n_, r_, b_: pl.pallas_call(
        copy_kernel2, grid_spec=grid_spec2,
        out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
    )(n_, r_, b_))
    dt2 = timeit(fn2, nspan, rayfeat, best)
    print(f"tile={tile}, no span blocks: {dt2*1e3:.2f} ms "
          f"= {dt2/g*1e6:.2f} us/step", flush=True)


# --- variant: NO scalar prefetch (plain grid spec) -------------------------
for tile in (128,):
    g = R // tile

    def copy_kernel3(rayfeat_ref, best_ref, out_ref):
        out_ref[:] = best_ref[:] + rayfeat_ref[:, :8]

    rayfeat = jnp.ones((R, 16), jnp.float32)
    best = jnp.zeros((R, 8), jnp.float32)
    fn3 = jax.jit(lambda r_, b_: pl.pallas_call(
        copy_kernel3,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tile, 16), lambda i: (i, 0)),
            pl.BlockSpec((tile, 8), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
    )(r_, b_))
    dt3 = timeit(fn3, rayfeat, best)
    print(f"tile={tile}, plain grid, no prefetch: {dt3*1e3:.2f} ms "
          f"= {dt3/g*1e6:.2f} us/step", flush=True)

    # XLA baseline: same math, no pallas
    fnx = jax.jit(lambda r_, b_: b_ + r_[:, :8])
    dtx = timeit(fnx, rayfeat, best)
    print(f"XLA fused baseline: {dtx*1e3:.2f} ms", flush=True)

    # bigger blocks, plain grid
    for tile2 in (1024, 8192):
        g2 = R // tile2
        fn4 = jax.jit(lambda r_, b_, t2=tile2, gg=g2: pl.pallas_call(
            copy_kernel3,
            grid=(gg,),
            in_specs=[
                pl.BlockSpec((t2, 16), lambda i: (i, 0)),
                pl.BlockSpec((t2, 8), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((t2, 8), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
        )(r_, b_))
        dt4 = timeit(fn4, rayfeat, best)
        print(f"tile={tile2}, plain grid: {dt4*1e3:.2f} ms "
              f"= {dt4/g2*1e6:.2f} us/step", flush=True)
