"""Which gather layout is fast on TPU XLA? Decides the SceneData SoA refactor.

a) 9 separate 1D gathers from (N,) tables
b) (9, N) table, gather on axis 1 -> (9, R)
c) (N, 9) row gather -> (R, 9)   [known slow]
d) one flat (9N,) table, 9 offset gathers
e) sort sanity: value-check + scaling
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_chained(step, x0, iters=20):
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


N = 100_000
R = 1 << 19   # 524k gathers, the full-image wavefront size

cols = [jnp.asarray(np.random.default_rng(i).random(N), jnp.float32)
        for i in range(9)]
tab_9n = jnp.stack(cols)                 # (9, N)
tab_n9 = tab_9n.T.copy()                 # (N, 9)
tab_flat = tab_9n.reshape(-1)            # (9N,)
idx0 = jnp.asarray(np.random.default_rng(42).integers(0, N, R), jnp.int32)


def dep(idx, vals):
    """fold gathered values back into indices to create a dependency"""
    return (idx + vals.astype(jnp.int32)) % N


@jax.jit
def step_a(idx):
    s = 0.0
    for c in cols:
        s = s + c[idx]
    return dep(idx, s)


@jax.jit
def step_b(idx):
    g = tab_9n[:, idx]          # (9, R)
    return dep(idx, g.sum(0))


@jax.jit
def step_c(idx):
    g = tab_n9[idx]             # (R, 9)
    return dep(idx, g.sum(1))


@jax.jit
def step_d(idx):
    s = 0.0
    for k in range(9):
        s = s + tab_flat[idx + k * N]
    return dep(idx, s)


for name, f in [("a 9x 1D SoA", step_a), ("b (9,N) axis1", step_b),
                ("c (N,9) rows", step_c), ("d flat+offset", step_d)]:
    dt = bench_chained(f, idx0)
    print(f"{name}: {dt*1e3:8.3f} ms -> {R*9/dt/1e9:7.2f} Gelem/s")

# --- leaf-style gather: idx (R//8, 8) contiguous lanes -------------------
base = jnp.asarray(np.random.default_rng(7).integers(0, N - 8, R // 8),
                   jnp.int32)

@jax.jit
def step_leaf(b):
    ids = b[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]  # (R/8, 8)
    s = 0.0
    for c in cols:
        s = s + c[ids]          # gather (R/8,8) from (N,)
    return (b + s.sum(1).astype(jnp.int32)) % (N - 8)

dt = bench_chained(step_leaf, base)
print(f"leaf 2D-idx 1D-table: {dt*1e3:8.3f} ms -> {R*9/dt/1e9:7.2f} Gelem/s")

# --- sort sanity ----------------------------------------------------------
keys = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 30, 1 << 21),
                   jnp.uint32)
s = jnp.sort(keys)
ok = bool(jnp.all(s[1:] >= s[:-1])) and bool(jnp.sum(keys) == jnp.sum(s))
print("sort correct:", ok)

@jax.jit
def step_sort(k):
    s = jnp.sort(k)
    return s * 2654435761 + 12345   # full remix so next sort is real work

dt = bench_chained(step_sort, keys, iters=50)
print(f"sort 2M remixed: {dt*1e3:8.3f} ms ({(1<<21)/dt/1e6:8.1f} M/s)")
