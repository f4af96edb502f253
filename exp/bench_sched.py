"""Probe: scheduled tracer at bench size on TPU, with knob sweep."""
import time, sys, os
import numpy as np
import jax
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.render import init_render_state, render_pass

W, H, B = 1024, 512, 8
_, scene = build_reference_scene(objects=("floor", "loong"))
cam = Camera.make(aspect=W / H)
tile = int(os.environ.get("TILE", "131072"))
topk = int(os.environ.get("TOPK", "8"))
cfg = RenderConfig(width=W, height=H, max_bounce=B, use_pallas=True,
                   sched_topk=topk)
state = init_render_state(cfg)
t0 = time.time()
state = render_pass(scene, cam, state, cfg, rays_per_tile=tile)
jax.block_until_ready(state.accum)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
for i in range(3):
    t0 = time.time()
    state = render_pass(scene, cam, state, cfg, rays_per_tile=tile)
    jax.block_until_ready(state.accum)
    dt = time.time() - t0
    rays = W * H * (1 + 2 * B)
    print(f"pass {i}: {dt:.3f}s  {rays/dt/1e6:.2f} Mrays/s", flush=True)
print("mean:", float(np.asarray(state.accum).mean()))
