"""Device-level profile of one incoherent cast + one full pass.
Writes an xplane trace and extracts per-op device times via
tensorboard_plugin_profile. Usage: python exp/profile_cast.py
"""
import glob, gzip, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops.sweep import _swept_impl
from opengl_ray_tracing_framework_tpu.ops.traverse import closest_hit
from opengl_ray_tracing_framework_tpu.render import init_render_state, render_pass

R = 131072
_, scene = build_reference_scene(objects=("floor", "loong"))
config = RenderConfig(width=1024, height=512, max_bounce=8, spp_per_pass=1,
                      use_pallas=True, pallas_backend="sweep")
cam = Camera.make(aspect=2.0)
u, v = pixel_uv(1024, 512)
o, d = cam.generate_rays(u, v)
o, d = o[:R], d[:R]
hit0 = closest_hit(scene, o, d, config)
float(hit0.t[0])
hp = o + d * jnp.minimum(hit0.t, 50.0)[:, None]
rng = np.random.default_rng(0)
rd = rng.normal(size=(R, 3)); rd /= np.linalg.norm(rd, axis=1)[:, None]
rd = jnp.asarray(rd.astype(np.float32))
mask = hit0.is_hit

cast = jax.jit(lambda oo, dd, mm: _swept_impl(
    oo, dd, mm, scene.cl_aabb_min, scene.cl_aabb_max, scene.cl_trifeat,
    scene.cl_slot2tri, any_hit=False, interpret=False, tile_r=128,
    precision="highest", depth=8, s_tiles=8))
float(cast(hp, rd, mask).t[0])   # compile + warm

state = init_render_state(config)
state = render_pass(scene, cam, state, config, rays_per_tile=131072)
float(state.accum[0, 0, 0])

logdir = "/tmp/ortf_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(3):
        float(cast(hp, rd, mask).t[0])
    state = render_pass(scene, cam, state, config, rays_per_tile=131072)
    float(state.accum[0, 0, 0])

xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplanes:", xs)
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
for tool in ("framework_op_stats", "op_profile"):
    try:
        data, _ = rtd.xspace_to_tool_data(xs, tool, {})
        out = f"/tmp/ortf_{tool}.json"
        with open(out, "w") as fh:
            fh.write(data if isinstance(data, str) else str(data))
        print("wrote", out, len(data))
    except Exception as e:
        print(tool, "failed:", e)
