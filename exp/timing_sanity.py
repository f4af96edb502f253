"""Is block_until_ready trustworthy on the axon backend? Compare against
device->host fetch (np.asarray), which cannot lie."""

import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)

# big sort: 16M
keys = jnp.asarray(rng.integers(0, 1 << 30, 1 << 24), jnp.uint32)

@jax.jit
def chain_sort(k, n):
    def body(i, k):
        s = jnp.sort(k)
        return s * jnp.uint32(2654435761) ^ (s >> 7)
    return jax.lax.fori_loop(0, n, body, k)

for n in (1, 4):
    out = chain_sort(keys, n)
    jax.block_until_ready(out)
    t0 = time.time()
    out = chain_sort(keys, n)
    jax.block_until_ready(out)
    t_block = time.time() - t0
    t0 = time.time()
    out = chain_sort(keys, n)
    host = np.asarray(out[:8])
    t_fetch = time.time() - t0
    print(f"sort16M x{n}: block={t_block*1e3:9.2f} ms  "
          f"fetch={t_fetch*1e3:9.2f} ms  head={host[:2]}")

# VPU chain, same protocol
x = jnp.asarray(rng.random((4096, 1024)), jnp.float32)

@jax.jit
def chain_vpu(x, n):
    def body(i, y):
        for _ in range(64):
            y = jnp.minimum(jnp.maximum(y * 1.0001 + 0.3, 0.1), 10.0)
        return y
    return jax.lax.fori_loop(0, n, body, x)

for n in (1, 16):
    out = chain_vpu(x, n)
    jax.block_until_ready(out)
    t0 = time.time()
    out = chain_vpu(x, n)
    host = np.asarray(out[:1, :1])
    t_fetch = time.time() - t0
    flops = 4096 * 1024 * 64 * 4 * n
    print(f"vpu x{n}: fetch={t_fetch*1e3:9.2f} ms -> "
          f"{flops/t_fetch/1e12:6.2f} Tops/s")

# MXU fp32
a = jnp.asarray(rng.random((2048, 2048)), jnp.float32)
b = jnp.asarray(rng.random((2048, 2048)), jnp.float32)

@jax.jit
def chain_mxu(a, n):
    def body(i, y):
        return jnp.dot(y, b, preferred_element_type=jnp.float32) * 1e-4
    return jax.lax.fori_loop(0, n, body, a)

for n in (1, 8):
    out = chain_mxu(a, n)
    jax.block_until_ready(out)
    t0 = time.time()
    out = chain_mxu(a, n)
    host = np.asarray(out[:1, :1])
    t_fetch = time.time() - t0
    fl = 2 * 2048**3 * n
    print(f"mxu f32 x{n}: fetch={t_fetch*1e3:9.2f} ms -> "
          f"{fl/t_fetch/1e12:6.1f} TFLOP/s")

bb = b.astype(jnp.bfloat16)
ab = a.astype(jnp.bfloat16)

@jax.jit
def chain_mxu_bf(a, n):
    def body(i, y):
        return (jnp.dot(y, bb, preferred_element_type=jnp.float32) * 1e-4
                ).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, n, body, a)

for n in (8,):
    out = chain_mxu_bf(ab, n)
    jax.block_until_ready(out)
    t0 = time.time()
    out = chain_mxu_bf(ab, n)
    host = np.asarray(out[:1, :1])
    t_fetch = time.time() - t0
    fl = 2 * 2048**3 * n
    print(f"mxu bf16 x{n}: fetch={t_fetch*1e3:9.2f} ms -> "
          f"{fl/t_fetch/1e12:6.1f} TFLOP/s")

# variadic sort 524k + 12 payloads, fori-chained, host-fetched
R, C = 1 << 19, 512
keys2 = jnp.asarray(rng.integers(0, C, R), jnp.uint32)
pays = tuple(jnp.asarray(rng.random(R), jnp.float32) for _ in range(12))

@jax.jit
def chain_vsort(k, pays, n):
    def body(i, st):
        k, pays = st
        out = jax.lax.sort((k,) + pays, num_keys=1)
        k2 = (out[0] * jnp.uint32(2654435761) + jnp.uint32(i)) % jnp.uint32(C)
        return (k2, out[1:])
    return jax.lax.fori_loop(0, n, body, (k, pays))

for n in (1, 8):
    out = chain_vsort(keys2, pays, n)
    jax.block_until_ready(out)
    t0 = time.time()
    out = chain_vsort(keys2, pays, n)
    host = np.asarray(out[1][0][:4])
    t_fetch = time.time() - t0
    print(f"vsort 524k+12pay x{n}: fetch={t_fetch*1e3:9.2f} ms")
