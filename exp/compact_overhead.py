"""Measure the fixed cost of the compaction machinery itself: partition
permutation + tree gather to width W + scatter back, per bounce, at the
bench tile width. PYTHONPATH=/root/repo python exp/compact_overhead.py
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu.ops.integrator import (
    PathState, _compact_perm)

R = 131072


def timeit(fn, *a, n=20):
    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


key = jax.random.PRNGKey(0)
alive = jax.random.uniform(key, (R,)) < 0.2
state = PathState(
    origin=jnp.ones((R, 3)), direction=jnp.ones((R, 3)),
    t=jnp.ones((R,)), tri=jnp.zeros((R,), jnp.int32),
    inside=jnp.zeros((R,), bool), history=jnp.ones((R, 3)),
    lo=jnp.zeros((R, 3)), alive=alive)
pid = jnp.arange(R, dtype=jnp.uint32)

print("perm:", timeit(jax.jit(lambda a: _compact_perm(a)), alive) * 1e3, "ms")

for w in (R, R // 4, R // 16, R // 64):
    @jax.jit
    def roundtrip(state, pid):
        perm, total = _compact_perm(state.alive)
        sel = perm[:w]
        sub = jax.tree.map(lambda x: x[sel], state)
        sub = jax.tree.map(lambda x: x + 0 if x.dtype != bool else x, sub)
        return jax.tree.map(
            lambda x, o: x.at[sel].set(o, unique_indices=True), state, sub)

    print(f"gather+scatter W={w}: {timeit(roundtrip, state, pid)*1e3:.2f} ms")
