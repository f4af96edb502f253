"""Proper amortized profile of scheduled-tracer components."""
import time, sys, functools
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
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
G = R // RAY_TILE
print("C =", C, "T =", scene.cl_trifeat.shape[2], "G =", G, flush=True)

def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].ravel()[:4].astype(jnp.float32)))

def amortized(f, args_list, label):
    sync(f(*args_list[0]))      # compile
    t0 = time.time()
    outs = [f(*a) for a in args_list]
    for o in outs: sync(o)
    dt = (time.time() - t0 - 0.022) / len(args_list)
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt

# ray sets: middle rows (hit geometry), scrambled
mid = o_all.shape[0] // 2
o = o_all[mid - R//2: mid + R//2]; d = d_all[mid - R//2: mid + R//2]
perm = np.random.default_rng(0).permutation(W * H)[:R]
o_i = o_all[perm]; d_i = d_all[perm]
mask = jnp.ones((R,), bool)

# full cast + rounds taken
@functools.partial(jax.jit, static_argnames=())
def run_with_rounds(o, d):
    hit = S._scheduled_impl(o, d, mask, scene.cl_aabb_min, scene.cl_aabb_max,
                            scene.cl_trifeat, scene.cl_slot2tri,
                            top_k=8, any_hit=False, interpret=False)
    return hit

# count rounds via the internal loop: replicate candidates loop manually
def count_rounds(o, d):
    tn = S.cluster_tnear(o, d, scene.cl_aabb_min, scene.cl_aabb_max)
    best = init_best(R); visited = jnp.zeros((R, C), bool)
    rf = ray_features(o, d)
    ids = jnp.arange(C, dtype=jnp.int32)
    rounds = 0
    nsp_hist = []
    while True:
        pending = (~visited) & (tn < best[:, 0:1])
        tkey = jnp.where(pending, tn, S.INF)
        has = jnp.min(tkey, axis=1) < S.INF
        if not bool(jnp.any(has)): break
        cand = jnp.argmin(tkey, axis=1).astype(jnp.int32)
        oh = has[:, None] & (cand[:, None] == ids[None])
        votes = oh.reshape(G, RAY_TILE, C).sum(axis=1)
        counts, top = jax.lax.top_k(votes, 8)
        valid = counts > 0
        spans = jnp.where(valid, top, C).astype(jnp.int32)
        nspan = valid.sum(axis=1).astype(jnp.int32)
        best = cluster_intersect(rf, best, spans, nspan, scene.cl_trifeat)
        sched = jnp.any((spans[:, :, None] == ids[None, None, :]) & valid[:, :, None], axis=1)
        visited = visited | jnp.repeat(sched, RAY_TILE, axis=0)
        rounds += 1
        nsp_hist.append(int(nspan.sum()))
    print(f"  rounds={rounds} visits={sum(nsp_hist)} hist={nsp_hist[:12]}", flush=True)

for name, oo, dd in [("coherent-mid", o, d), ("scrambled", o_i, d_i)]:
    print(name, flush=True)
    count_rounds(oo, dd)
    amortized(run_with_rounds, [(oo, dd)] * 5, f"  full cast {name}")

tnear_j = jax.jit(S.cluster_tnear)
amortized(tnear_j, [(o, d, scene.cl_aabb_min, scene.cl_aabb_max)] * 10, "cluster_tnear")

tn = tnear_j(o, d, scene.cl_aabb_min, scene.cl_aabb_max)
best0 = init_best(R); vis0 = jnp.zeros((R, C), bool)
@jax.jit
def cand_vote(tn, best, visited):
    pending = (~visited) & (tn < best[:, 0:1])
    tkey = jnp.where(pending, tn, S.INF)
    cmin = jnp.min(tkey, axis=1)
    has = cmin < S.INF
    cand = jnp.argmin(tkey, axis=1).astype(jnp.int32)
    ids = jnp.arange(C, dtype=jnp.int32)
    oh = has[:, None] & (cand[:, None] == ids[None])
    votes = oh.reshape(G, RAY_TILE, C).sum(axis=1)
    counts, top = jax.lax.top_k(votes, 8)
    sched = jnp.any((top[:, :, None] == ids[None, None, :]) & (counts > 0)[:, :, None], axis=1)
    visited2 = visited | jnp.repeat(sched, RAY_TILE, axis=0)
    return cand, has, counts, visited2
amortized(cand_vote, [(tn, best0, vis0)] * 10, "cand+vote+mark")

rf = ray_features(o, d)
spans = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (G, 1))
nspan8 = jnp.full((G,), 8, jnp.int32)
ci = jax.jit(functools.partial(cluster_intersect, interpret=False))
amortized(ci, [(rf, best0, spans, nspan8, scene.cl_trifeat)] * 10, "kernel Gx8 all-active")
nspan0 = jnp.zeros((G,), jnp.int32)
amortized(ci, [(rf, best0, spans, nspan0, scene.cl_trifeat)] * 10, "kernel Gx8 all-skip")
