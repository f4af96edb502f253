"""Dissect a real NEE shadow cast on loong-100k."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops import schedule as S
from opengl_ray_tracing_framework_tpu.ops.envmap import env_sample_nearest
from opengl_ray_tracing_framework_tpu.ops.sampling import rand01
from opengl_ray_tracing_framework_tpu.ops.intersect_pallas import (
    RAY_TILE, cluster_intersect, init_best, ray_features)
from opengl_ray_tracing_framework_tpu.ops.intersect import surface_attributes
from opengl_ray_tracing_framework_tpu.ops.traverse import closest_hit
from opengl_ray_tracing_framework_tpu.ops.integrator import PathState

W, H, R = 1024, 512, 131072
_, scene = build_reference_scene(objects=("floor", "loong"))
C = scene.cl_aabb_min.shape[0]
G = R // RAY_TILE
cam = Camera.make(aspect=W / H)
u, v = pixel_uv(W, H)
o_all, d_all = cam.generate_rays(u, v)
# blocked pixel order, like render does
pid = np.arange(W * H, dtype=np.uint32).reshape(H//32, 32, W//32, 32)
pid = pid.transpose(0, 2, 1, 3).reshape(-1)[:R]
o0, d0 = o_all[pid], d_all[pid]

cfg = RenderConfig(width=W, height=H, use_pallas=True)
hit0 = closest_hit(scene, o0, d0, cfg)
st = PathState(origin=o0, direction=d0, t=hit0.t, tri=hit0.tri,
               inside=hit0.inside, history=o0*0+1, lo=o0*0,
               alive=hit0.is_hit)
hp, n, vv, mat = surface_attributes(scene, st)
hh, ww = scene.hdr_map.shape[0], scene.hdr_map.shape[1]
pixid = jnp.asarray(pid, jnp.uint32)
xl1 = rand01(pixid, 1, 0); xl2 = rand01(pixid, 1, 1)
l_dir, _, _ = env_sample_nearest(scene.env_fetch, hh, ww, xl1, xl2, scene.env_angle)
facing = jnp.sum(n * l_dir, axis=-1) > 0.0
mask = hit0.is_hit & facing
print("alive+facing:", int(mask.sum()), "/", R, flush=True)

o = jax.block_until_ready(hp); d = jax.block_until_ready(l_dir)

def count_rounds(o, d, mask, any_hit, sort):
    if sort:
        key = jnp.where(mask, S._direction_key(d), 1 << 12)
        perm = jax.lax.sort((key.astype(jnp.int32),
                             jnp.arange(R, dtype=jnp.int32)), num_keys=1)[1]
        o, d, mask = o[perm], d[perm], mask[perm]
    tn = S.cluster_tnear(o, d, scene.cl_aabb_min, scene.cl_aabb_max)
    best = init_best(R); visited = jnp.zeros((R, C), bool)
    rf = ray_features(o, d)
    ids = jnp.arange(C, dtype=jnp.int32)
    rounds = 0; visits = 0; hist = []
    while True:
        pending = (~visited) & (tn < best[:, 0:1]) & mask[:, None]
        if any_hit:
            pending &= (best[:, 1] < 0.0)[:, None]
        tkey = jnp.where(pending, tn, S.INF)
        has = jnp.min(tkey, axis=1) < S.INF
        nly = int(has.sum())
        if nly == 0: break
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
        rounds += 1; visits += int(nspan.sum())
        hist.append((nly, int(nspan.sum())))
    print(f"  rounds={rounds} visits={visits} "
          f"tail={[h for h in hist[::max(1,rounds//10)]]}", flush=True)

for sort in (True, False):
    print(f"shadow cast anyhit sort={sort}:", flush=True)
    count_rounds(o, d, mask, True, sort)

# honest timing with dependency chain
def cast_rep(o, d, n=5):
    def body(i, acc):
        hit = S._scheduled_impl(o + acc, d, mask,
                                scene.cl_aabb_min, scene.cl_aabb_max,
                                scene.cl_trifeat, scene.cl_slot2tri,
                                top_k=8, any_hit=True, interpret=False)
        return acc + 0.0 * jnp.sum(hit.t).astype(jnp.float32) * 1e-30
    return jax.lax.fori_loop(0, n, body, jnp.zeros((1, 3), jnp.float32))
f = jax.jit(cast_rep)
out = f(o, d); float(jnp.sum(out))
t0 = time.time(); out = f(o, d); float(jnp.sum(out))
print(f"shadow cast (chained x5): {(time.time()-t0-0.022)/5*1e3:.1f} ms", flush=True)
