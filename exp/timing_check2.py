import time, sys
import numpy as np
import jax, jax.numpy as jnp

def sync(x):
    return float(jnp.sum(x))  # tiny transfer forces real completion

for n in (2048, 4096, 8192):
    x = jnp.ones((n, n), jnp.float32)
    f = jax.jit(lambda x: x @ x)
    sync(f(x))
    t0 = time.time(); s = sync(f(x)); t1 = time.time()
    print(f"f32 matmul {n}: {(t1-t0)*1e3:.2f} ms ({2*n**3/(t1-t0)/1e12:.2f} TFLOP/s)", flush=True)
    xb = x.astype(jnp.bfloat16)
    fb = jax.jit(lambda x: (x @ x))
    sync(fb(xb))
    t0 = time.time(); s = sync(fb(xb)); t1 = time.time()
    print(f"bf16 matmul {n}: {(t1-t0)*1e3:.2f} ms ({2*n**3/(t1-t0)/1e12:.2f} TFLOP/s)", flush=True)

# elementwise HBM bandwidth
x = jnp.ones((256 * 1024 * 1024 // 4,), jnp.float32)  # 256MB
g = jax.jit(lambda x: x * 1.0001 + 1.0)
sync(g(x))
t0 = time.time(); s = sync(g(x)); t1 = time.time()
print(f"elementwise 256MB r+w: {(t1-t0)*1e3:.2f} ms ({2*256/1024/(t1-t0):.2f} GB/ms->TB/s)", flush=True)

# scalar sync overhead itself
h = jax.jit(lambda x: jnp.sum(x[:8]))
sync(h(x))
t0 = time.time(); [sync(h(x)) for _ in range(10)]; t1 = time.time()
print(f"sync overhead: {(t1-t0)*1e2:.2f} ms/call", flush=True)
