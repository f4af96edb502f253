"""Orientation of the fused env-fetch gather (the round-3 breakdown's
505 ms/bounce-tile hotspot, exp/RESULTS.md).

Compares, at the bench shape (131072 random indices into a 1k-HDR-sized
table, N = 524288):
  a) (8, N) table, gather along the minor/lane axis  (round-2 layout)
  b) (N, 8) table, row gather along the major axis
  c) b + fold the 7 used rows into one (N, 8) row so every site is a
     single row gather
TPU gathers are fast along the sublane (major) axis and catastrophically
slow along the lane (minor) axis — XLA serializes minor-axis gathers.
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

N, R = 524288, 131072
key = jax.random.PRNGKey(0)
t8n = jax.random.uniform(key, (8, N), jnp.float32)
tn8 = jnp.asarray(np.asarray(t8n).T.copy())
idx = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, N, jnp.int32)

def timeit(f, *a):
    o = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(5):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.time() - t0) / 5

f_a = jax.jit(lambda t, i: t[4:7, i].sum())
f_b = jax.jit(lambda t, i: t[i, 4:7].sum())
f_c = jax.jit(lambda t, i: t[i].sum())
print(json.dumps({
    "minor_axis_(8,N)[rows,idx]": round(timeit(f_a, t8n, idx) * 1e3, 2),
    "major_axis_(N,8)[idx,rows]": round(timeit(f_b, tn8, idx) * 1e3, 2),
    "major_axis_(N,8)[idx]_full_row": round(timeit(f_c, tn8, idx) * 1e3, 2),
    "unit": "ms per gather of 131072 indices",
}))
