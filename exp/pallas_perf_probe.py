"""Timing probes that decide the traversal-kernel architecture:

1. VMEM capacity (max scratch allocation)
2. Pallas same-shape axis-0 gather throughput (lane-replicated table lookup)
3. XLA sort / argsort throughput (ray binning by cluster)
4. XLA big permutation-gather throughput (un-permuting ray records)
5. Pallas dynamic ref-slice streaming (cluster triangle fetch)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def probe_vmem():
    for mb in (8, 16, 32, 64, 96, 120):
        n = mb * 1024 * 1024 // 4 // 128
        try:
            def k(out, scratch):
                scratch[0, :] = jnp.zeros((128,), jnp.float32)
                out[:] = scratch[0:8, :]
            out = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
            )()
            jax.block_until_ready(out)
            print(f"VMEM scratch {mb} MB: OK")
        except Exception as e:
            print(f"VMEM scratch {mb} MB: FAIL {str(e).splitlines()[0][:90]}")
            break


def probe_axis0_gather():
    # out[i,j] = tab[idx[i,j], j]; table lane-replicated = global lookup.
    for s in (512, 1024, 2048, 4096):
        tab = jnp.asarray(
            np.tile(np.arange(s, dtype=np.float32)[:, None], (1, 128)))
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, s, (s, 128)), jnp.int32)

        def k(tab_ref, idx_ref, out):
            # 8 dependent gathers to amortize dispatch
            acc = idx_ref[:]
            for _ in range(8):
                g = jnp.take_along_axis(tab_ref[:], acc[..., None],
                                        axis=0)[..., 0]
                acc = (g.astype(jnp.int32) + 1) % s
            out[:] = acc.astype(jnp.float32)

        f = jax.jit(lambda t, i: pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((s, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        try:
            dt = bench(f, tab, idx)
            n_gathers = 8 * s * 128
            print(f"axis0 gather S={s}: {dt*1e6:8.1f} us for {n_gathers} "
                  f"gathers -> {n_gathers/dt/1e9:6.2f} Gelem/s")
        except Exception as e:
            print(f"axis0 gather S={s}: FAIL {str(e).splitlines()[0][:90]}")


def probe_sort():
    for n in (1 << 19, 1 << 21):
        keys = jnp.asarray(
            np.random.default_rng(0).integers(0, 1 << 30, n), jnp.uint32)
        pay = jnp.arange(n, dtype=jnp.int32)
        f1 = jax.jit(jnp.sort)
        dt = bench(f1, keys, iters=20)
        print(f"sort {n} u32:           {dt*1e3:7.2f} ms ({n/dt/1e6:6.1f} M/s)")
        f2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
        dt = bench(f2, keys, pay, iters=20)
        print(f"sort+1payload {n}:      {dt*1e3:7.2f} ms ({n/dt/1e6:6.1f} M/s)")
        f3 = jax.jit(jnp.argsort)
        dt = bench(f3, keys, iters=20)
        print(f"argsort {n}:            {dt*1e3:7.2f} ms ({n/dt/1e6:6.1f} M/s)")


def probe_big_gather():
    for n in (1 << 20, 1 << 22):
        tab = jnp.arange(n, dtype=jnp.float32)
        idx = jnp.asarray(
            np.random.default_rng(0).permutation(n), jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        dt = bench(f, tab, idx, iters=20)
        print(f"XLA perm-gather {n}:    {dt*1e3:7.2f} ms ({n/dt/1e6:6.1f} M/s)")
        # 2D row gather: (n/8, 8) rows
        t2 = tab.reshape(-1, 8)
        i2 = jnp.asarray(np.random.default_rng(1).permutation(n // 8),
                         jnp.int32)
        f2 = jax.jit(lambda t, i: t[i])
        dt = bench(f2, t2, i2, iters=20)
        print(f"XLA row-gather {n//8}x8: {dt*1e3:7.2f} ms "
              f"({n//8/dt/1e6:6.1f} Mrow/s)")


def probe_dynslice_stream():
    # stream 64 dynamic row-blocks of 128 rows from a VMEM table
    tab = jnp.asarray(
        np.random.default_rng(0).random((8192, 128)), jnp.float32)
    starts = jnp.asarray(
        np.random.default_rng(1).integers(0, 63, 64) * 128, jnp.int32)

    def k(starts_ref, tab_ref, out):
        def body(i, acc):
            blk = tab_ref[pl.ds(starts_ref[i], 128), :]
            return acc + jnp.sum(blk, axis=0, keepdims=True)
        out[:] = jax.lax.fori_loop(
            0, 64, body, jnp.zeros((1, 128), jnp.float32))

    f = jax.jit(lambda s, t: pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, t))
    try:
        dt = bench(f, starts, tab)
        print(f"pallas dyn-slice 64x(128,128): {dt*1e6:8.1f} us "
              f"({64*128*128*4/dt/1e9:6.1f} GB/s)")
    except Exception as e:
        print(f"pallas dyn-slice: FAIL {str(e).splitlines()[0][:90]}")


if __name__ == "__main__":
    print("== VMEM capacity ==")
    probe_vmem()
    print("== Pallas axis0 lane-replicated gather ==")
    probe_axis0_gather()
    print("== XLA sort ==")
    probe_sort()
    print("== XLA gather ==")
    probe_big_gather()
    print("== Pallas dynamic slice streaming ==")
    probe_dynslice_stream()
