"""Dissect scheduled-tracer cost: rounds taken, per-component times."""
import time, sys, functools
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.models.camera import pixel_uv
from opengl_ray_tracing_framework_tpu.ops import schedule as S
from opengl_ray_tracing_framework_tpu.ops.intersect_pallas import (
    RAY_TILE, cluster_intersect, init_best, ray_features)

W, H = 1024, 512
R = 131072
_, scene = build_reference_scene(objects=("floor", "loong"))
cam = Camera.make(aspect=W / H)
u, v = pixel_uv(W, H)
o_all, d_all = cam.generate_rays(u, v)
C = scene.cl_aabb_min.shape[0]
print("C =", C, "T =", scene.cl_trifeat.shape[2], flush=True)

def timeit(f, *a, n=5):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(f(*a))
    return (time.time() - t0) / n, out

# primary rays (coherent) and scrambled rays (incoherent proxy)
o = o_all[:R]; d = d_all[:R]
perm = np.random.default_rng(0).permutation(W * H)[:R]
o_i = o_all[perm]; d_i = d_all[perm]

mask = jnp.ones((R,), bool)

# 1. full scheduled cast + round count
def run(o, d, topk):
    return S._scheduled_impl(o, d, mask, scene.cl_aabb_min, scene.cl_aabb_max,
                             scene.cl_trifeat, scene.cl_slot2tri,
                             top_k=topk, any_hit=False, interpret=False)
for name, oo, dd in [("coherent", o, d), ("scrambled", o_i, d_i)]:
    for topk in (8, 16):
        dt, hit = timeit(lambda: run(oo, dd, topk), n=3)
        print(f"cast {name} topk={topk}: {dt*1e3:.1f} ms  "
              f"({R/dt/1e6:.1f} Mrays/s)", flush=True)

# 2. components
tnear_j = jax.jit(S.cluster_tnear)
dt, tn = timeit(lambda: tnear_j(o, d, scene.cl_aabb_min, scene.cl_aabb_max))
print(f"cluster_tnear (R,C): {dt*1e3:.2f} ms", flush=True)

best0 = init_best(R)
@jax.jit
def cand_vote(tn, best, visited):
    pending = (~visited) & (tn < best[:, 0:1])
    tkey = jnp.where(pending, tn, S.INF)
    cmin = jnp.min(tkey, axis=1)
    has = cmin < S.INF
    cand = jnp.argmin(tkey, axis=1).astype(jnp.int32)
    ids = jnp.arange(C, dtype=jnp.int32)
    oh = has[:, None] & (cand[:, None] == ids[None])
    votes = oh.reshape(R // RAY_TILE, RAY_TILE, C).sum(axis=1)
    counts, top = jax.lax.top_k(votes, 8)
    return cand, has, counts, top
vis0 = jnp.zeros((R, C), bool)
dt, _ = timeit(lambda: cand_vote(tn, best0, vis0))
print(f"cand+vote+topk: {dt*1e3:.2f} ms", flush=True)

# 3. kernel alone, full G x 8 grid
g = R // RAY_TILE
rayfeat = ray_features(o, d)
spans = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (g, 1))
nspan = jnp.full((g,), 8, jnp.int32)
ci = jax.jit(functools.partial(cluster_intersect, interpret=False))
dt, _ = timeit(lambda: ci(rayfeat, best0, spans, nspan, scene.cl_trifeat))
print(f"kernel grid ({g}x8 full): {dt*1e3:.2f} ms", flush=True)
nspan0 = jnp.zeros((g,), jnp.int32)
dt, _ = timeit(lambda: ci(rayfeat, best0, spans, nspan0, scene.cl_trifeat))
print(f"kernel grid ({g}x8 all-skip): {dt*1e3:.2f} ms", flush=True)
