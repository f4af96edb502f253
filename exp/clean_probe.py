"""Clean timing harness for the axon TPU backend.

Protocol: block_until_ready lies; device->host fetch is ground truth.
Each measurement: (1) drain queue with a fetch, (2) run chained work inside
ONE jit (fori_loop), (3) time to host-fetch of a small slice, (4) repeat and
report the second run.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def timed(name, fn, units, scale):
    """fn() -> small np array (host-fetched). Returns seconds."""
    fn()  # warm/compile + drain
    t0 = time.time()
    fn()
    dt = time.time() - t0
    t0 = time.time()
    fn()
    dt = min(dt, time.time() - t0)
    print(f"{name}: {dt*1e3:9.2f} ms -> {scale/dt:10.3g} {units}")
    return dt


ITERS = 16

# ---------------- VPU dense ----------------
x = jnp.asarray(rng.random((4096, 1024)), jnp.float32)

@jax.jit
def vpu(x):
    def body(i, y):
        for _ in range(64):
            y = jnp.minimum(jnp.maximum(y * 1.0001 + 0.3, 0.1), 10.0)
        return y
    return jax.lax.fori_loop(0, ITERS, body, x)[:1, :1]

timed("VPU madd+clamp      ", lambda: np.asarray(vpu(x)),
      "Tops/s", 4096 * 1024 * 64 * 4 * ITERS / 1e12)

# ---------------- MXU ----------------
a32 = jnp.asarray(rng.random((2048, 2048)), jnp.float32)
b32 = jnp.asarray(rng.random((2048, 2048)), jnp.float32)

@jax.jit
def mxu32(a):
    def body(i, y):
        return jnp.dot(y, b32, preferred_element_type=jnp.float32) * 1e-4
    return jax.lax.fori_loop(0, ITERS, body, a)[:1, :1]

timed("MXU f32 2048^3      ", lambda: np.asarray(mxu32(a32)),
      "TFLOP/s", 2 * 2048**3 * ITERS / 1e12)

a16 = a32.astype(jnp.bfloat16)
b16 = b32.astype(jnp.bfloat16)

@jax.jit
def mxu16(a):
    def body(i, y):
        y = jnp.dot(y, b16, preferred_element_type=jnp.float32)
        return (y * 1e-4).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, ITERS, body, a)[:1, :1]

timed("MXU bf16 2048^3     ", lambda: np.asarray(mxu16(a16)),
      "TFLOP/s", 2 * 2048**3 * ITERS / 1e12)

# ---------------- XLA 1D gather ----------------
N = 1 << 17
tabs = [jnp.asarray(rng.random(N), jnp.float32) for _ in range(9)]
idx = jnp.asarray(rng.integers(0, N, 1 << 19), jnp.int32)

@jax.jit
def g1d(idx):
    def body(i, ix):
        s = 0.0
        for t in tabs:
            s = s + t[ix]
        return (ix + s.astype(jnp.int32)) % N
    return jax.lax.fori_loop(0, ITERS, body, idx)[:1]

timed("XLA 9x1D gather 524k", lambda: np.asarray(g1d(idx)),
      "Gelem/s", 9 * (1 << 19) * ITERS / 1e9)

tab9n = jnp.stack(tabs)   # (9, N)

@jax.jit
def g9n(idx):
    def body(i, ix):
        g = tab9n[:, ix]
        return (ix + g.sum(0).astype(jnp.int32)) % N
    return jax.lax.fori_loop(0, ITERS, body, idx)[:1]

timed("XLA (9,N) ax1 524k  ", lambda: np.asarray(g9n(idx)),
      "Gelem/s", 9 * (1 << 19) * ITERS / 1e9)

tabn9 = tab9n.T.copy()    # (N, 9)

@jax.jit
def gn9(idx):
    def body(i, ix):
        g = tabn9[ix]
        return (ix + g.sum(1).astype(jnp.int32)) % N
    return jax.lax.fori_loop(0, ITERS, body, idx)[:1]

timed("XLA (N,9) rows 524k ", lambda: np.asarray(gn9(idx)),
      "Gelem/s", 9 * (1 << 19) * ITERS / 1e9)

# ---------------- sorts ----------------
R, C = 1 << 19, 512
keys = jnp.asarray(rng.integers(0, C, R), jnp.uint32)

@jax.jit
def s0(k):
    def body(i, k):
        s = jnp.sort(k)
        return (s * jnp.uint32(2654435761) + jnp.uint32(7)) % jnp.uint32(C)
    return jax.lax.fori_loop(0, ITERS, body, k)[:1]

timed("sort 524k u32       ", lambda: np.asarray(s0(keys)),
      "Msort/s", ITERS / 1e3)

pays4 = tuple(jnp.asarray(rng.random(R), jnp.float32) for _ in range(4))

@jax.jit
def s4(k, p):
    def body(i, st):
        k, p = st
        out = jax.lax.sort((k,) + p, num_keys=1)
        k2 = (out[0] * jnp.uint32(2654435761) + jnp.uint32(i)) % jnp.uint32(C)
        return (k2, out[1:])
    k, p = jax.lax.fori_loop(0, ITERS, body, (k, p))
    return k[:1]

timed("sort 524k +4pay     ", lambda: np.asarray(s4(keys, pays4)),
      "Msort/s", ITERS / 1e3)

@jax.jit
def sargsort(k, p):
    def body(i, st):
        k, p = st
        perm = jnp.argsort(k)
        p2 = tuple(q[perm] for q in p)
        k2 = (k[perm] * jnp.uint32(2654435761) + jnp.uint32(i)) % jnp.uint32(C)
        return (k2, p2)
    k, p = jax.lax.fori_loop(0, ITERS, body, (k, p))
    return k[:1]

timed("argsort+4 permutes  ", lambda: np.asarray(sargsort(keys, pays4)),
      "Msort/s", ITERS / 1e3)
