"""Round 2: find the exact 2D gather form Mosaic supports, plus ref-level
dynamic slicing with scalar indices (for packet traversal)."""

import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
ROWS = N // 128


def run(name, build, verbose=False):
    try:
        out = build()
        jax.block_until_ready(out)
        print(f"{name}: OK {np.asarray(out).ravel()[:3]}")
        return True
    except Exception as e:
        if verbose:
            print(f"{name}: FAIL\n{traceback.format_exc()[-1200:]}")
        else:
            msg = str(e).split("\n")
            print(f"{name}: FAIL  {' | '.join(m[:100] for m in msg[:2])}")
        return False


def main():
    table = jnp.arange(N, dtype=jnp.float32) * 2.0
    t2d = table.reshape(ROWS, 128)          # (32, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, ROWS, (8, 128)),
                      jnp.int32)
    idx_small = idx[:, :1]                   # (8,1)

    def call(kernel, out_shape, inputs):
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*inputs)

    # 1. take_along_axis axis=0: (32,128) table, (8,128) idx -> (8,128)
    def k1(tab, ix, out):
        out[:] = jnp.take_along_axis(tab[:], ix[:], axis=0)
    run("1 taa axis0 (32,128)x(8,128)", lambda: call(
        k1, jax.ShapeDtypeStruct((8, 128), jnp.float32), (t2d, idx)),
        verbose=True)

    # 2. take_along_axis axis=1 within row
    def k2(tab, ix, out):
        out[:] = jnp.take_along_axis(tab[:, :128], ix[:] % 128, axis=1)
    run("2 taa axis1 lanes           ", lambda: call(
        k2, jax.ShapeDtypeStruct((8, 128), jnp.float32),
        (t2d[:8], idx)))

    # 3. jnp.take axis=0 of 2D table with (8,128) idx
    def k3(tab, ix, out):
        out[:] = jnp.take(tab[:], ix[:, 0], axis=0)   # (8,) idx -> (8,128)
    run("3 take rows (8,) idx        ", lambda: call(
        k3, jax.ShapeDtypeStruct((8, 128), jnp.float32), (t2d, idx)))

    # 4. ref-level scalar dynamic slice via pl.ds with SMEM scalar
    def k4(ix_smem, tab, out):
        def body(i, _):
            j = ix_smem[i]
            out[pl.ds(i, 1), :] = tab[pl.ds(j, 1), :]
            return 0
        jax.lax.fori_loop(0, 8, body, 0)
    run("4 ref pl.ds scalar rows     ", lambda: pl.pallas_call(
        k4,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx[:, 0].reshape(8), t2d))

    # 5. big take_along_axis: (4096,128) table, (256,128) idx
    big = jnp.arange(4096 * 128, dtype=jnp.float32).reshape(4096, 128)
    bidx = jnp.asarray(np.random.default_rng(1).integers(0, 4096, (256, 128)),
                       jnp.int32)
    def k5(tab, ix, out):
        out[:] = jnp.take_along_axis(tab[:], ix[:], axis=0)
    run("5 taa axis0 (4096,128)x(256,128)", lambda: call(
        k5, jax.ShapeDtypeStruct((256, 128), jnp.float32), (big, bidx)))

    # 6. XLA-level (non-pallas) gather on TPU for comparison: timing
    import time
    tab_dev = jax.device_put(big)
    idx_dev = jax.device_put(bidx)
    f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=0))
    jax.block_until_ready(f(tab_dev, idx_dev))
    t0 = time.time()
    for _ in range(100):
        o = f(tab_dev, idx_dev)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / 100
    print(f"6 XLA taa (4096,128)x(256,128): {dt*1e6:.1f} us "
          f"({256*128/dt/1e9:.2f} Gelem/s)")

    # 7. XLA 1D gather timing: table (100k,), idx (32768,)
    t1 = jnp.arange(100_000, dtype=jnp.float32)
    i1 = jnp.asarray(np.random.default_rng(2).integers(0, 100_000, 32768),
                     jnp.int32)
    g = jax.jit(lambda t, i: t[i])
    jax.block_until_ready(g(t1, i1))
    t0 = time.time()
    for _ in range(100):
        o = g(t1, i1)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / 100
    print(f"7 XLA 1D gather 32768 of 100k: {dt*1e6:.1f} us "
          f"({32768/dt/1e9:.2f} Gelem/s)")


if __name__ == "__main__":
    main()
