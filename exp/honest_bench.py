"""Honest device timing: chain N reps inside ONE jit, sync once."""
import time, sys, functools
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops import schedule as S
from opengl_ray_tracing_framework_tpu.ops.intersect_pallas import (
    RAY_TILE, cluster_intersect, init_best, ray_features)

R = 131072
W, H = 1024, 512
builder, _ = build_reference_scene(objects=("floor", "loong"))
scene = builder.build(cluster_size=512)
C = scene.cl_aabb_min.shape[0]
G = R // RAY_TILE
print("C =", C, flush=True)
cam = Camera.make(aspect=W / H)
u, v = pixel_uv(W, H)
o_all, d_all = cam.generate_rays(u, v)
perm = np.random.default_rng(0).permutation(W * H)[:R]
o_i, d_i = o_all[perm], d_all[perm]
mask = jnp.ones((R,), bool)

def bench(label, fn, *args, n=10):
    f = jax.jit(functools.partial(fn, n=n))
    out = f(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1].astype(jnp.float32)))
    t0 = time.time()
    out = f(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1].astype(jnp.float32)))
    dt = (time.time() - t0 - 0.022) / n
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt

# 1. lax.sort 2-op and 4-op
def sort2(key, n):
    def body(i, k):
        out = jax.lax.sort((k, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
        return out[0] + i  # dependency
    return jax.lax.fori_loop(0, n, body, key)
key0 = jnp.asarray(np.random.default_rng(1).integers(0, 2048, R), jnp.int32)
bench("lax.sort 131k 2-op", sort2, key0)

def sort4(key, n):
    def body(i, k):
        out = jax.lax.sort((k, k.astype(jnp.float32), k.astype(jnp.float32),
                            k.astype(jnp.float32)), num_keys=1)
        return out[0] + i
    return jax.lax.fori_loop(0, n, body, key)
bench("lax.sort 131k 4-op", sort4, key0)

# 2. cluster_tnear
def tnear_rep(o, d, n):
    def body(i, acc):
        tn = S.cluster_tnear(o + acc[:, None] * 0, d, scene.cl_aabb_min,
                             scene.cl_aabb_max)
        return tn[:, 0] * 0
    return jax.lax.fori_loop(0, n, body, o[:, 0] * 0)
bench("cluster_tnear (R,C)", tnear_rep, o_i, d_i)

# 3. cand+vote+mark step
tn0 = jax.jit(S.cluster_tnear)(o_i, d_i, scene.cl_aabb_min, scene.cl_aabb_max)
best0 = init_best(R)
vis0 = jnp.zeros((R, C), bool)
ids = jnp.arange(C, dtype=jnp.int32)
def cvm_rep(tn, best, visited, n):
    def body(i, carry):
        vis, acc = carry
        pending = (~vis) & (tn < best[:, 0:1])
        tkey = jnp.where(pending, tn, S.INF)
        has = jnp.min(tkey, axis=1) < S.INF
        cand = jnp.argmin(tkey, axis=1).astype(jnp.int32)
        oh = has[:, None] & (cand[:, None] == ids[None])
        votes = oh.reshape(G, RAY_TILE, C).sum(axis=1)
        counts, top = jax.lax.top_k(votes, 8)
        valid = counts > 0
        spans = jnp.where(valid, top, C).astype(jnp.int32)
        sched = jnp.any((spans[:, :, None] == ids[None, None, :]) &
                        valid[:, :, None], axis=1)
        vis = vis | jnp.repeat(sched, RAY_TILE, axis=0)
        return vis, acc + jnp.sum(spans)
    return jax.lax.fori_loop(0, n, body, (visited, jnp.int32(0)))
bench("cand+vote+mark", cvm_rep, tn0, best0, vis0)

# 4. kernel full grid
rf = ray_features(o_i, d_i)
spans8 = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (G, 1))
nsp8 = jnp.full((G,), 8, jnp.int32)
def kern_rep(rf, best, n):
    def body(i, b):
        return cluster_intersect(rf, b, spans8, nsp8, scene.cl_trifeat)
    return jax.lax.fori_loop(0, n, body, best)
bench("kernel Gx8 all-active", kern_rep, rf, best0)
nsp0 = jnp.zeros((G,), jnp.int32)
def kern_rep0(rf, best, n):
    def body(i, b):
        return cluster_intersect(rf, b, spans8, nsp0, scene.cl_trifeat)
    return jax.lax.fori_loop(0, n, body, best)
bench("kernel Gx8 all-skip", kern_rep0, rf, best0)

# 5. full cast
def cast_rep(o, d, n):
    def body(i, acc):
        hit = S._scheduled_impl(o.at[0, 0].add(acc * 0), d, mask,
                                scene.cl_aabb_min, scene.cl_aabb_max,
                                scene.cl_trifeat, scene.cl_slot2tri,
                                top_k=8, any_hit=False, interpret=False)
        return jnp.sum(hit.t) * 0
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
bench("full cast incoherent", cast_rep, o_i, d_i, n=5)
bench("full cast coherent", cast_rep, o_all[:R], d_all[:R], n=5)
