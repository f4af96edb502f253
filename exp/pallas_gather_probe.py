"""Probe which dynamic-indexing/gather forms Mosaic TPU supports.

The BVH traversal kernel needs, per step, a fetch of node fields for a
vector of per-ray node indices. This probes the candidate lowerings:

  A. table[idx] with a 2D vector of indices (jnp-style vectorized gather)
  B. jnp.take(table, idx, axis=0)
  C. jnp.take_along_axis on the sublane dim
  D. one-hot matmul gather on the MXU
  E. scalar fori_loop of dynamic slices (guaranteed to work, slow)

Run standalone on TPU: python exp/pallas_gather_probe.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096           # table size
R = (8, 128)       # index block


def run(name, build):
    try:
        out = build()
        out.block_until_ready()
        print(f"{name}: OK  {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL  {msg}")
        return False


def main():
    table = jnp.arange(N, dtype=jnp.float32) * 2.0
    table2d = table.reshape(N // 128, 128)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, N, size=R), jnp.int32)

    def call(kernel, *extra):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(R, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(extra)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx, *extra)

    # A. direct vector indexing
    def kA(tab, ix, out):
        out[:] = tab[ix[:]]
    run("A table[idx]            ", lambda: call(kA))

    # B. jnp.take
    def kB(tab, ix, out):
        out[:] = jnp.take(tab[:], ix[:], axis=0)
    run("B jnp.take              ", lambda: call(kB))

    # B2. jnp.take with 1D-reshaped idx rows
    def kB2(tab, ix, out):
        for r in range(R[0]):
            out[r, :] = jnp.take(tab[:], ix[r, :], axis=0)
    run("B2 jnp.take per row     ", lambda: call(kB2))

    # C. take_along_axis over sublanes: table2d (32, 128); idx rows pick rows
    def kC(tab, ix, out):
        t2 = tab[:].reshape(N // 128, 128)
        # gather along axis 0 with per-lane indices
        out[:] = jnp.take_along_axis(t2, ix[:] % (N // 128), axis=0)
    run("C take_along_axis ax0   ", lambda: call(kC))

    # D. one-hot matmul (small table): idx (8,128) x table2d? do (R,N)·(N,)
    def kD(tab, ix, out):
        oh = (ix[:][..., None] ==
              jax.lax.broadcasted_iota(jnp.int32, (8, 128, 8), 2))
        # reduce a tiny slice only — existence probe, not perf
        out[:] = jnp.sum(oh.astype(jnp.float32), axis=-1) * tab[0]
    run("D one-hot partial       ", lambda: call(kD))

    # E. scalar loop of dynamic slices
    def kE(tab, ix, out):
        def body(i, _):
            def inner(j, _):
                out[i, j] = tab[ix[i, j]]
                return 0
            return jax.lax.fori_loop(0, R[1], inner, 0)
        jax.lax.fori_loop(0, R[0], body, 0)
    run("E scalar loop           ", lambda: call(kE))

    # F. pltpu.dynamic_gather if present
    if hasattr(pltpu, "dynamic_gather"):
        def kF(tab, ix, out):
            out[:] = pltpu.dynamic_gather(tab[:], ix[:])
        run("F pltpu.dynamic_gather  ", lambda: call(kF))
    else:
        print("F pltpu.dynamic_gather  : absent")

    # G. 2D table row gather: fetch rows of (N//128,128) by scalar index
    def kG(tab, ix, out):
        t2 = tab[:].reshape(N // 128, 128)
        def body(i, _):
            out[i, :] = t2[ix[i, 0] % (N // 128), :]
            return 0
        jax.lax.fori_loop(0, R[0], body, 0)
    run("G scalar row slice      ", lambda: call(kG))


if __name__ == "__main__":
    main()
