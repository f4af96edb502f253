"""Sweep-kernel per-step cost model, measured on hardware.

Synthetic worst case that defeats the prune so the kernel does EXACTLY K
steps per tile: K clusters at strictly increasing entry distance along
+x, rays marching +x through all of them, zero trifeat (every triangle
test misses, so best_t stays INF and cap = the last cluster's entry).
per-step cost = (time(K2) - time(K1)) / (K2 - K1) / n_tiles.

Also times the host prep (sort + tnear + span ordering + inverse sort)
alone, by calling the real _swept_impl with ONE cluster (1-step sweeps):
prep(R) ~= time - n_tiles * fixed_tile_cost.

Usage: python exp/kernel_micro.py [n_rays]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from opengl_ray_tracing_framework_tpu.ops.sweep import _swept_impl

R = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
T_BLK = 256   # triangles per cluster block (matches build_clusters default)

o = jnp.tile(jnp.asarray([[-1.0, 0.5, 0.5]], jnp.float32), (R, 1))
d = jnp.tile(jnp.asarray([[1.0, 1e-4, 1e-4]], jnp.float32), (R, 1))
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
mask = jnp.ones((R,), bool)
o, d = jax.block_until_ready((o, d))


def build(K):
    x0 = jnp.arange(K, dtype=jnp.float32)
    cl_min = jnp.stack([x0, jnp.zeros(K), jnp.zeros(K)], axis=1)
    cl_max = cl_min + 1.0
    trifeat = jnp.zeros((K, 16, 4 * T_BLK), jnp.float32)
    slot2tri = jnp.zeros((K * T_BLK,), jnp.int32)
    return jax.block_until_ready((cl_min, cl_max, trifeat, slot2tri))


def timeit(fn, n=10):
    # fence with an actual scalar fetch: jax.block_until_ready on the
    # tunneled device can return before queued work ran (exp/RESULTS.md)
    float(fn().t[0])
    t0 = time.time()
    for _ in range(n):
        float(fn().t[0])
    return (time.time() - t0) / n


print(f"{R} rays; every tile sweeps exactly K spans (no prune, no hits)")
for tile_r in (128, 256, 512, 1024):
    g = R // tile_r
    times = {}
    for K in (8, 64, 256):
        args = build(K)
        times[K] = timeit(lambda a=args: _swept_impl(
            o, d, mask, *a, any_hit=False, interpret=False,
            tile_r=tile_r, precision="highest"))
    step_us = (times[256] - times[8]) / (256 - 8) / g * 1e6
    base_us = (times[8] - g * 8 * step_us * 1e-6) / g * 1e6
    print(f"tile_r={tile_r:5d}: K8 {times[8]*1e3:7.2f} ms  "
          f"K64 {times[64]*1e3:7.2f}  K256 {times[256]*1e3:7.2f}  "
          f"-> {step_us:5.2f} us/step, residual {base_us:6.2f} us/tile",
          flush=True)

print("\nprecision (tile_r=256, K=256):")
args = build(256)
for prec in ("highest", "default"):
    dt = timeit(lambda: _swept_impl(o, d, mask, *args, any_hit=False,
                                    interpret=False, tile_r=256,
                                    precision=prec))
    print(f"  {prec:8s}: {dt*1e3:8.2f} ms", flush=True)

print("\nhost-prep proxy: K=1 total time (1-step sweeps + prep):")
args = build(1)
for tile_r in (256, 1024):
    dt = timeit(lambda: _swept_impl(o, d, mask, *args, any_hit=False,
                                    interpret=False, tile_r=tile_r,
                                    precision="highest"))
    print(f"  tile_r={tile_r:5d}: {dt*1e3:8.2f} ms", flush=True)
