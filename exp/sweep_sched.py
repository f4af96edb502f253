"""Sweep: cluster size x topk for the scheduled tracer, full bench pass."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.render import init_render_state, render_pass

W, H, B = 1024, 512, 8
scene_builder, _ = build_reference_scene(objects=("floor", "loong"))
cam = Camera.make(aspect=W / H)
rays = W * H * (1 + 2 * B)

import itertools
for csize in (256, 512, 1024):
    scene = scene_builder.build(cluster_size=csize)
    print(f"cluster_size={csize}: C={scene.cl_aabb_min.shape[0]}", flush=True)
    for topk in (8, 16):
        cfg = RenderConfig(width=W, height=H, max_bounce=B, use_pallas=True,
                           sched_topk=topk)
        state = init_render_state(cfg)
        t0 = time.time()
        state = render_pass(scene, cam, state, cfg, rays_per_tile=131072)
        jax.block_until_ready(state.accum)
        print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        n = 3
        for i in range(n):
            state = render_pass(scene, cam, state, cfg, rays_per_tile=131072)
        jax.block_until_ready(state.accum)
        float(jnp.sum(state.accum[:2,:2]))
        dt = (time.time() - t0) / n
        print(f"  topk={topk}: {dt:.3f}s/pass  {rays/dt/1e6:.2f} Mrays/s  "
              f"mean={float(state.accum.mean()):.5f}", flush=True)
