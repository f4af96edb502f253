"""Measure per-bounce alive fractions on the bench scene (loong-100k,
1024x512, 8 bounces) — the input that sizes the wavefront-compaction
buckets. Run on the TPU: PYTHONPATH=/root/repo python exp/alive_profile.py
"""
import sys
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
    PathState, _EPS_PDF)
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

u, v = pixel_uv(W, H)
o_full, d_full = camera.generate_rays(u, v)
frame = jnp.int32(1)
sobol_point = sobol_all_dims(frame)

for tile in range(4):
    sl = slice(tile * R, (tile + 1) * R)
    o, d = o_full[sl], d_full[sl]
    pid = jnp.arange(tile * R, (tile + 1) * R, dtype=jnp.uint32)
    hit0 = jax.block_until_ready(closest_hit(scene, o, d, config))
    state = PathState(origin=o, direction=d, t=hit0.t, tri=hit0.tri,
                      inside=hit0.inside, history=jnp.ones_like(o),
                      lo=jnp.zeros_like(o), alive=hit0.is_hit)
    fr = [float(jnp.mean(state.alive))]
    shadow_fr = []
    for b in range(B):
        hit_point, n, vv, mat = surface_attributes(scene, state)
        hh, ww = scene.hdr_map.shape[0], scene.hdr_map.shape[1]
        xl1 = rand01(pid, frame, 8 * b + 0)
        xl2 = rand01(pid, frame, 8 * b + 1)
        l_dir, _, _ = env_sample_nearest(scene.env_fetch, hh, ww, xl1, xl2,
                                         scene.env_angle)
        facing = jnp.sum(n * l_dir, axis=-1) > 0.0
        shadow_fr.append(float(jnp.mean(state.alive & facing)))
        uu, vv2 = sobol_bounce_uv(sobol_point, b)
        xi1 = cranley_patterson(uu, rand01(pid, frame, 8 * b + 2))
        xi2 = cranley_patterson(vv2, rand01(pid, frame, 8 * b + 3))
        xi3 = rand01(pid, frame, 8 * b + 4)
        smp = disney.disney_sample(mat, vv, n, xi1, xi2, xi3)
        alive = state.alive & (smp.pdf > _EPS_PDF)
        nxt = jax.block_until_ready(
            closest_hit(scene, hit_point, smp.direction, config, mask=alive,
                        secondary=True))
        state = PathState(origin=hit_point, direction=smp.direction,
                          t=nxt.t, tri=nxt.tri, inside=nxt.inside,
                          history=state.history, lo=state.lo,
                          alive=alive & nxt.is_hit)
        fr.append(float(jnp.mean(state.alive)))
    print(f"tile {tile}: alive at bounce-start:",
          " ".join(f"{x:.3f}" for x in fr[:-1]))
    print(f"tile {tile}: shadow live (alive&facing):",
          " ".join(f"{x:.3f}" for x in shadow_fr))
