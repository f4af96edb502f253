import time, sys
import numpy as np
import jax, jax.numpy as jnp
print("imported", flush=True)
x = jnp.ones((8192, 8192), jnp.float32)  # 268MB
f = jax.jit(lambda x: (x @ x))
t0 = time.time()
y = jax.block_until_ready(f(x))
print(f"compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); y = jax.block_until_ready(f(x)); t1 = time.time()
print(f"matmul 8192^3 block_until_ready: {(t1-t0)*1e3:.2f} ms "
      f"({2*8192**3/(t1-t0)/1e12:.1f} TFLOP/s)", flush=True)
t0 = time.time(); z = np.asarray(f(x)); t1 = time.time()
print(f"matmul + host transfer: {(t1-t0)*1e3:.2f} ms", flush=True)
