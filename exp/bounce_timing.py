"""Per-bounce cast timing with REAL ray populations at the bucketed
compaction widths — where does the 1.2 s pass actually go?
PYTHONPATH=/root/repo python exp/bounce_timing.py
"""
import sys, time
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops import disney
from opengl_ray_tracing_framework_tpu.ops.envmap import env_sample_nearest
from opengl_ray_tracing_framework_tpu.ops.integrator import (
    PathState, _EPS_PDF, _bucket_widths)
from opengl_ray_tracing_framework_tpu.ops.intersect import surface_attributes
from opengl_ray_tracing_framework_tpu.ops.sampling import (
    cranley_patterson, rand01, sobol_all_dims, sobol_bounce_uv)
from opengl_ray_tracing_framework_tpu.ops.traverse import closest_hit

W, H, B = 1024, 512, 8
R = 131072

_, scene = build_reference_scene(objects=("floor", "loong"))
camera = Camera.make(aspect=W / H)
config = RenderConfig(width=W, height=H, max_bounce=B, spp_per_pass=1,
                      use_pallas=True, pallas_backend="sweep")
widths = _bucket_widths(R, config.compaction_buckets)

cast_jit = {}
def timed_cast(o, d, mask, any_hit):
    """Trace at the bucketed width for mask's live count; return (hit, s)."""
    total = int(jnp.sum(mask))
    w = widths[0]
    for cand in widths[1:]:
        if total <= cand:
            w = cand
    order = np.argsort(~np.asarray(mask), kind="stable")
    sel = jnp.asarray(order[:w])
    key = (w, any_hit)
    if key not in cast_jit:
        cast_jit[key] = jax.jit(
            lambda o, d, m, ah=any_hit: closest_hit(
                scene, o, d, config, mask=m, any_hit=ah, secondary=True))
    fn = cast_jit[key]
    o2, d2, m2 = o[sel], d[sel], mask[sel]
    jax.block_until_ready(fn(o2, d2, m2))  # compile+warm
    t0 = time.time()
    for _ in range(3):
        hit = fn(o2, d2, m2)
    jax.block_until_ready(hit)
    dt = (time.time() - t0) / 3
    # scatter back
    full = jax.tree.map(
        lambda x: jnp.zeros((R,) + x.shape[1:], x.dtype).at[sel].set(x), hit)
    t = jnp.where(mask, full.t, jnp.inf)
    tri = jnp.where(mask, full.tri, -1)
    return type(hit)(t=t, tri=tri, inside=full.inside & mask), dt, w, total

u, v = pixel_uv(W, H)
o_full, d_full = camera.generate_rays(u, v)
frame = jnp.int32(1)
sobol_point = sobol_all_dims(frame)

grand = {"shadow": 0.0, "bounce": 0.0}
for tile in range(4):
    sl = slice(tile * R, (tile + 1) * R)
    o, d = o_full[sl], d_full[sl]
    pid = jnp.arange(tile * R, (tile + 1) * R, dtype=jnp.uint32)
    hit0 = jax.block_until_ready(closest_hit(scene, o, d, config))
    state = PathState(origin=o, direction=d, t=hit0.t, tri=hit0.tri,
                      inside=hit0.inside, history=jnp.ones_like(o),
                      lo=jnp.zeros_like(o), alive=hit0.is_hit)
    for b in range(B):
        hit_point, n, vv, mat = surface_attributes(scene, state)
        hh, ww = scene.hdr_map.shape[0], scene.hdr_map.shape[1]
        xl1 = rand01(pid, frame, 8 * b + 0)
        xl2 = rand01(pid, frame, 8 * b + 1)
        l_dir, _, _ = env_sample_nearest(scene.env_fetch, hh, ww, xl1, xl2,
                                         scene.env_angle)
        facing = jnp.sum(n * l_dir, axis=-1) > 0.0
        _, s_dt, s_w, s_total = timed_cast(hit_point, l_dir,
                                           state.alive & facing, True)
        uu, vv2 = sobol_bounce_uv(sobol_point, b)
        xi1 = cranley_patterson(uu, rand01(pid, frame, 8 * b + 2))
        xi2 = cranley_patterson(vv2, rand01(pid, frame, 8 * b + 3))
        xi3 = rand01(pid, frame, 8 * b + 4)
        smp = disney.disney_sample(mat, vv, n, xi1, xi2, xi3)
        alive = state.alive & (smp.pdf > _EPS_PDF)
        nxt, b_dt, b_w, b_total = timed_cast(hit_point, smp.direction,
                                             alive, False)
        print(f"t{tile} b{b}: shadow {s_dt*1e3:7.1f} ms (w={s_w:6d} "
              f"live={s_total:6d})  bounce {b_dt*1e3:7.1f} ms "
              f"(w={b_w:6d} live={b_total:6d})")
        grand["shadow"] += s_dt
        grand["bounce"] += b_dt
        state = PathState(origin=hit_point, direction=smp.direction,
                          t=nxt.t, tri=nxt.tri, inside=nxt.inside,
                          history=state.history, lo=state.lo,
                          alive=alive & nxt.is_hit)
print(f"TOTAL shadow {grand['shadow']:.3f} s  bounce {grand['bounce']:.3f} s")
