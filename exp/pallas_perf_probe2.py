"""Round 2 timings with dependency-chained iterations (defeats pipelining
mismeasurement) and the corrected same-shape axis-0 gather."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_chained(step, x0, iters=20):
    """step: x -> x (same shape). Returns sec/iter with a data dependency."""
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


def probe_sort():
    for n in (1 << 19, 1 << 21):
        keys = jnp.asarray(
            np.random.default_rng(0).integers(0, 1 << 30, n), jnp.uint32)

        @jax.jit
        def step(k):
            s = jnp.sort(k)
            # feed something data-dependent back
            return s ^ (s >> 16)

        dt = bench_chained(step, keys)
        print(f"chained sort {n}: {dt*1e3:8.2f} ms ({n/dt/1e6:8.1f} M/s)")

        @jax.jit
        def step2(k):
            perm = jnp.argsort(k)
            return k[perm] ^ 1   # sort via gather with argsort perm
        dt = bench_chained(step2, keys)
        print(f"chained argsort+gather {n}: {dt*1e3:8.2f} ms")


def probe_gather():
    n = 1 << 21
    tab = jnp.asarray(np.random.default_rng(0).integers(0, n, n), jnp.int32)

    @jax.jit
    def step(t):
        return t[t]  # dependent permutation gather

    dt = bench_chained(step, tab)
    print(f"chained perm-gather {n}: {dt*1e3:8.2f} ms ({n/dt/1e6:8.1f} M/s)")

    # row gather (R,9) records
    rows = jnp.asarray(
        np.random.default_rng(1).random((1 << 17, 9)), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(2).permutation(1 << 17), jnp.int32)

    @jax.jit
    def step2(i):
        g = rows[i]                      # (R, 9) gather
        return (i + g[:, 0].astype(jnp.int32)) % (1 << 17)
    dt = bench_chained(step2, idx)
    print(f"chained row-gather {1<<17}x9: {dt*1e3:8.2f} ms "
          f"({(1<<17)/dt/1e6:8.1f} Mrow/s)")


def probe_axis0_gather():
    for s in (1024, 2048):
        tab = jnp.asarray(
            np.tile(np.arange(s, dtype=np.float32)[:, None], (1, 128)))
        idx0 = jnp.asarray(
            np.random.default_rng(0).integers(0, s, (s, 128)), jnp.int32)

        def k(tab_ref, idx_ref, out):
            acc = idx_ref[:]
            for _ in range(8):
                g = jnp.take_along_axis(tab_ref[:], acc, axis=0)
                acc = (g.astype(jnp.int32) + 1) % s
            out[:] = acc

        pc = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((s, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

        @jax.jit
        def step(i):
            return pc(tab, i)

        try:
            dt = bench_chained(step, idx0)
            n_g = 8 * s * 128
            print(f"pallas axis0 gather S={s}: {dt*1e6:8.1f} us, "
                  f"{n_g/dt/1e9:6.2f} Gelem/s")
        except Exception as e:
            print(f"pallas axis0 gather S={s}: FAIL "
                  f"{str(e).splitlines()[0][:110]}")


def probe_lane_gather():
    # within-row lane shuffle throughput: out[i,j] = tab[i, idx[i,j]]
    s = 2048
    tab = jnp.asarray(np.random.default_rng(0).random((s, 128)), jnp.float32)
    idx0 = jnp.asarray(np.random.default_rng(1).integers(0, 128, (s, 128)),
                       jnp.int32)

    def k(tab_ref, idx_ref, out):
        acc = idx_ref[:]
        for _ in range(8):
            g = jnp.take_along_axis(tab_ref[:], acc, axis=1)
            acc = (acc + g.astype(jnp.int32) + 1) % 128
        out[:] = acc

    pc = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((s, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def step(i):
        return pc(tab, i)

    try:
        dt = bench_chained(step, idx0)
        n_g = 8 * s * 128
        print(f"pallas lane gather: {dt*1e6:8.1f} us, {n_g/dt/1e9:6.2f} Gelem/s")
    except Exception as e:
        print(f"pallas lane gather: FAIL {str(e).splitlines()[0][:110]}")


def probe_vmem_fine():
    for mb in (10, 12, 14):
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
            print(f"VMEM scratch {mb} MB: FAIL {str(e).splitlines()[0][:80]}")
            break


if __name__ == "__main__":
    print("== chained sort ==")
    probe_sort()
    print("== chained gather ==")
    probe_gather()
    print("== pallas axis0 gather ==")
    probe_axis0_gather()
    print("== pallas lane gather ==")
    probe_lane_gather()
    print("== VMEM fine ==")
    probe_vmem_fine()
