"""Honest e2e breakdown: render_pass under feature ablations on TPU."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.render import init_render_state, render_pass

W, H = 1024, 512
builder, _ = build_reference_scene(objects=("floor", "loong"))
scene = builder.build(cluster_size=256)
cam = Camera.make(aspect=W / H)

def run(label, cfg, n=3):
    state = init_render_state(cfg)
    state = render_pass(scene, cam, state, cfg, rays_per_tile=131072)
    float(jnp.sum(state.accum[:1, :1]))
    t0 = time.time()
    for _ in range(n):
        state = render_pass(scene, cam, state, cfg, rays_per_tile=131072)
    float(jnp.sum(state.accum[:1, :1]))
    dt = (time.time() - t0 - 0.022) / n
    rays = W * H * (1 + 2 * cfg.max_bounce)
    print(f"{label}: {dt*1e3:.0f} ms/pass ({rays/dt/1e6:.2f} Mrays/s)",
          flush=True)
    return dt

base = dict(width=W, height=H, use_pallas=True)
run("full 8-bounce", RenderConfig(max_bounce=8, **base))
run("no-env (no NEE casts, sky)", RenderConfig(max_bounce=8, enable_env_map=False, **base))
run("1-bounce", RenderConfig(max_bounce=1, **base))
run("8-bounce brdf-mode", RenderConfig(max_bounce=8, enable_bsdf=False, **base))
