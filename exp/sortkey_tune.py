"""Sort-key variants for the dominant cast: the compacted bounce-1/2
interior-ray population (profile: 8 x 35.6 ms at bucket 32768 = the
largest kernel cost in the pass). Reconstructs the real merged b1 batch
from the bench scene and times _swept_impl under different coherence keys.
Usage: python exp/sortkey_tune.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops import disney, sweep
from opengl_ray_tracing_framework_tpu.ops.integrator import (
    PathState, _EPS_PDF, _compact_perm)
from opengl_ray_tracing_framework_tpu.ops.envmap import env_sample_nearest
from opengl_ray_tracing_framework_tpu.ops.intersect import INF, surface_attributes
from opengl_ray_tracing_framework_tpu.ops.sampling import (
    cranley_patterson, rand01, sobol_all_dims, sobol_bounce_uv)
from opengl_ray_tracing_framework_tpu.ops.traverse import closest_hit

R, W, H = 131072, 1024, 512
_, scene = build_reference_scene(objects=("floor", "loong"))
config = RenderConfig(width=W, height=H, max_bounce=8, use_pallas=True)
cam = Camera.make(aspect=2.0)
u, v = pixel_uv(W, H)
o_full, d_full = cam.generate_rays(u, v)
frame = jnp.int32(1)
sobol_point = sobol_all_dims(frame)

# tile 1 (rows 64-128): the glass-heavy tile, alive 0.28 at b1
sl = slice(1 * R, 2 * R)
o, d = o_full[sl], d_full[sl]
pid = jnp.arange(R, 2 * R, dtype=jnp.uint32)
hit0 = closest_hit(scene, o, d, config)
state = PathState(origin=o, direction=d, t=hit0.t, tri=hit0.tri,
                  inside=hit0.inside, history=jnp.ones_like(o),
                  lo=jnp.zeros_like(o), alive=hit0.is_hit)

# run bounce 0 to get the b1 state
def advance(state, b):
    hit_point, n, vv, mat = surface_attributes(scene, state)
    uu, vv2 = sobol_bounce_uv(sobol_point, b)
    xi1 = cranley_patterson(uu, rand01(pid, frame, 8 * b + 2))
    xi2 = cranley_patterson(vv2, rand01(pid, frame, 8 * b + 3))
    xi3 = rand01(pid, frame, 8 * b + 4)
    smp = disney.disney_sample(mat, vv, n, xi1, xi2, xi3)
    alive = state.alive & (smp.pdf > _EPS_PDF)
    nxt = closest_hit(scene, hit_point, smp.direction, config, mask=alive,
                      secondary=True)
    return PathState(origin=hit_point, direction=smp.direction, t=nxt.t,
                     tri=nxt.tri, inside=nxt.inside, history=state.history,
                     lo=state.lo, alive=alive & nxt.is_hit)

state = advance(state, 0)
print("b1 alive:", float(jnp.mean(state.alive)), flush=True)

# build the merged b1 cast population at bucket width 32768
perm, total = _compact_perm(state.alive)
sel = perm[:32768]
sub = jax.tree.map(lambda x: x[sel], state)
pid_s = pid[sel]
hit_point, n, vv, mat = surface_attributes(scene, sub)
xl1 = rand01(pid_s, frame, 8 * 1 + 0)
xl2 = rand01(pid_s, frame, 8 * 1 + 1)
hh, ww = scene.hdr_map.shape[0], scene.hdr_map.shape[1]
l_dir, _, _ = env_sample_nearest(scene.env_fetch, hh, ww, xl1, xl2,
                                 scene.env_angle)
facing = jnp.sum(n * l_dir, axis=-1) > 0.0
uu, vv2 = sobol_bounce_uv(sobol_point, 1)
xi1 = cranley_patterson(uu, rand01(pid_s, frame, 8 * 1 + 2))
xi2 = cranley_patterson(vv2, rand01(pid_s, frame, 8 * 1 + 3))
xi3 = rand01(pid_s, frame, 8 * 1 + 4)
smp = disney.disney_sample(mat, vv, n, xi1, xi2, xi3)
alive = sub.alive & (smp.pdf > _EPS_PDF)

o_m = jnp.concatenate([hit_point, hit_point])
d_m = jnp.concatenate([l_dir, smp.direction])
m_m = jnp.concatenate([sub.alive & facing, alive])
am = jnp.concatenate([jnp.ones(32768, bool), jnp.zeros(32768, bool)])
o_m, d_m, m_m, am = jax.block_until_ready((o_m, d_m, m_m, am))
print("merged width 65536, live:", int(jnp.sum(m_m)), flush=True)

orig_key = sweep._sort_key


def key_fine(tn, direction, mask):
    ncand = jnp.sum(tn < INF, axis=1)
    nearest = jnp.argmin(tn, axis=1).astype(jnp.int32)
    phi = jnp.arctan2(direction[:, 2], direction[:, 0])
    kphi = jnp.clip(((phi * (0.5 / jnp.pi) + 0.5) * 64).astype(jnp.int32),
                    0, 63)
    kct = jnp.clip(((direction[:, 1] * 0.5 + 0.5) * 16).astype(jnp.int32),
                   0, 15)
    key = nearest * 1024 + kphi * 16 + kct
    return jnp.where(mask & (ncand > 0), key, sweep._DEAD_KEY)


def key_second(tn, direction, mask):
    ncand = jnp.sum(tn < INF, axis=1)
    nearest = jnp.argmin(tn, axis=1).astype(jnp.int32)
    tn2 = jnp.where(jax.nn.one_hot(nearest, tn.shape[1], dtype=bool), INF, tn)
    second = jnp.argmin(tn2, axis=1).astype(jnp.int32)
    phi = jnp.arctan2(direction[:, 2], direction[:, 0])
    kphi = jnp.clip(((phi * (0.5 / jnp.pi) + 0.5) * 8).astype(jnp.int32),
                    0, 7)
    key = (nearest * 1024 + second) * 8 + kphi
    return jnp.where(mask & (ncand > 0), key, sweep._DEAD_KEY)


def timeit(fn, n=10):
    float(fn().t[0])
    t0 = time.time()
    for _ in range(n):
        float(fn().t[0])
    return (time.time() - t0) / n


ref = None
for name, key_fn in (("current", orig_key), ("fine-dir", key_fine),
                     ("second-cluster", key_second)):
    sweep._sort_key = key_fn
    for tile in (64, 128, 256):
        cast = jax.jit(lambda o_, d_, m_, a_, t=tile: sweep._swept_impl(
            o_, d_, m_, scene.cl_aabb_min, scene.cl_aabb_max,
            scene.cl_trifeat, scene.cl_slot2tri, any_hit=False,
            interpret=False, tile_r=t, precision="highest", depth=8,
            anyhit_mask=a_, s_tiles=1024 // t))
        dt = timeit(lambda: cast(o_m, d_m, m_m, am))
        hit = cast(o_m, d_m, m_m, am)
        # any-hit lanes: only occlusion is defined (first-hit t is
        # visit-order dependent); closest lanes: exact t
        t = np.where(np.arange(65536) < 32768,
                     (np.asarray(hit.tri) >= 0).astype(np.float32),
                     np.asarray(hit.t))
        if ref is None:
            ref = t
        else:
            assert np.allclose(ref, t, rtol=1e-5, atol=1e-5), (name, tile)
        print(f"{name:15s} tile={tile:4d}: {dt*1e3:6.1f} ms "
              f"(incl ~25 ms dispatch RTT)", flush=True)
sweep._sort_key = orig_key
