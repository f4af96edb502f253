"""Final architecture probes:

1. variadic sort (key + 12 payload floats) for 524k rays — the per-bounce
   ray-reordering cost of a sorted-wavefront tracer
2. argsort + columnwise permute alternative
3. dense VPU elementwise throughput (fused slab-test-like chain)
4. MXU fp32 matmul throughput at block-intersection shapes
5. (R, C) cull + K-argmin selection cost in plain XLA
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def bench_chained(step, x0, iters=20):
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


R = 1 << 19          # 524288 rays
C = 512              # clusters
rng = np.random.default_rng(0)

# --- 1. variadic sort ------------------------------------------------------
keys0 = jnp.asarray(rng.integers(0, C, R), jnp.uint32)
payload = [jnp.asarray(rng.random(R), jnp.float32) for _ in range(12)]

@jax.jit
def step_sort(keys, *pay):
    out = jax.lax.sort((keys,) + pay, num_keys=1)
    k = out[0]
    # remix keys u32-safely so the next sort is fresh work
    k2 = (k * jnp.uint32(2654435761) + jnp.uint32(12345)) % jnp.uint32(C)
    return (k2,) + out[1:]

state = (keys0,) + tuple(payload)
out = step_sort(*state)
jax.block_until_ready(out)
t0 = time.time()
s = state
for _ in range(10):
    s = step_sort(*s)
jax.block_until_ready(s)
dt = (time.time() - t0) / 10
print(f"1 variadic sort 524k x (1key+12pay): {dt*1e3:8.2f} ms")

# --- 2. argsort + columnwise permutes --------------------------------------
@jax.jit
def step_argsort(keys, *pay):
    perm = jnp.argsort(keys)
    out = tuple(p[perm] for p in pay)
    k2 = (keys[perm] * jnp.uint32(2654435761) + jnp.uint32(1)) % jnp.uint32(C)
    return (k2,) + out

out = step_argsort(*state)
jax.block_until_ready(out)
t0 = time.time()
s = state
for _ in range(10):
    s = step_argsort(*s)
jax.block_until_ready(s)
dt = (time.time() - t0) / 10
print(f"2 argsort + 12 col permutes:          {dt*1e3:8.2f} ms")

# --- 3. dense VPU chain -----------------------------------------------------
x0 = jnp.asarray(rng.random((4096, 1024)), jnp.float32)

@jax.jit
def step_vpu(x):
    y = x
    for _ in range(64):
        y = y * 1.0001 + 0.3
        y = jnp.minimum(jnp.maximum(y, 0.1), 10.0)
    return y

dt = bench_chained(step_vpu, x0)
flops = 4096 * 1024 * 64 * 4
print(f"3 dense VPU chain: {dt*1e3:8.2f} ms -> {flops/dt/1e12:6.2f} Tops/s f32")

# --- 4. MXU matmul fp32 and bf16 -------------------------------------------
for dt_name, dtp in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
    a = jnp.asarray(rng.random((1024, 512)), dtp)
    b = jnp.asarray(rng.random((512, 1024)), dtp)

    @jax.jit
    def step_mxu(a, b=b):
        y = a
        for _ in range(8):
            y = jnp.dot(y, b, preferred_element_type=dtp) * 1e-3
        return y

    dtm = bench_chained(step_mxu, a)
    fl = 2 * 1024 * 512 * 1024 * 8
    print(f"4 MXU {dt_name} 1024x512x1024 x8: {dtm*1e3:8.2f} ms -> "
          f"{fl/dtm/1e12:6.1f} TFLOP/s")

# --- 5. (R, C) cull + K-argmin in XLA ---------------------------------------
aabb_min = jnp.asarray(rng.random((C, 3)) * 10 - 5, jnp.float32)
aabb_max = aabb_min + jnp.asarray(rng.random((C, 3)) * 2, jnp.float32)
org = jnp.asarray(rng.random((R, 3)) * 10 - 5, jnp.float32)
dr = jnp.asarray(rng.random((R, 3)) - 0.5, jnp.float32)
K = 8

@jax.jit
def cull(org, dr):
    inv = 1.0 / jnp.where(jnp.abs(dr) < 1e-9, 1e-9, dr)
    # (R, C) slab test via broadcasting; XLA fuses the 3-axis min/max
    f = (aabb_max[None] - org[:, None]) * inv[:, None]     # (R, C, 3)
    n = (aabb_min[None] - org[:, None]) * inv[:, None]
    t1 = jnp.min(jnp.maximum(f, n), -1)
    t0_ = jnp.max(jnp.minimum(f, n), -1)
    visit = (t1 >= t0_) & (t1 > 0)
    tent = jnp.where(visit, jnp.maximum(t0_, 0.0), jnp.inf)   # (R, C)
    # K nearest candidates by iterative argmin
    cand = []
    cur = tent
    for _ in range(K):
        k = jnp.argmin(cur, -1)
        cand.append(k)
        cur = cur.at[jnp.arange(R), k].set(jnp.inf)
    return jnp.stack(cand, 1)

dtc = bench(cull, org, dr, iters=5)
print(f"5 cull (524k x {C}) + top{K}:          {dtc*1e3:8.2f} ms")

# 5b. top-K via lax.top_k on negated distances
@jax.jit
def cull_topk(org, dr):
    inv = 1.0 / jnp.where(jnp.abs(dr) < 1e-9, 1e-9, dr)
    f = (aabb_max[None] - org[:, None]) * inv[:, None]
    n = (aabb_min[None] - org[:, None]) * inv[:, None]
    t1 = jnp.min(jnp.maximum(f, n), -1)
    t0_ = jnp.max(jnp.minimum(f, n), -1)
    visit = (t1 >= t0_) & (t1 > 0)
    tent = jnp.where(visit, jnp.maximum(t0_, 0.0), jnp.inf)
    neg, idx = jax.lax.top_k(-tent, K)
    return idx

dtc = bench(cull_topk, org, dr, iters=5)
print(f"5b cull + lax.top_k{K}:                {dtc*1e3:8.2f} ms")
