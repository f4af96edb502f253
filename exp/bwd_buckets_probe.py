"""Grad-step cost vs compaction bucket count (bwd boundary-tax hunt).

The bwd profile (exp/bwd_profile.py, 2026-08-21) shows 824 ms of the
2.56 s grad step is scalar->f32[R,1..3] broadcasts at T(8,128)-padded
layouts — ~1,900 distinct instructions materialized at the per-bounce
lax.switch boundaries under AD (x ~18 executions each). This probe
measures material_grad and the fwd pass at various bucket counts to find
the grad-optimal compaction depth.

Usage: python exp/bwd_buckets_probe.py <buckets> [tile] [mode]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.parallel.autodiff import material_grad
from opengl_ray_tracing_framework_tpu.render import init_render_state, render_pass


def main():
    buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    mode = sys.argv[3] if len(sys.argv) > 3 else "tile"
    cmode = sys.argv[4] if len(sys.argv) > 4 else "full"
    width, height, bounces = 1024, 512, 8
    _, scene = build_reference_scene(objects=("floor", "loong"))
    camera = Camera.make(aspect=width / height)
    config = RenderConfig(width=width, height=height, max_bounce=bounces,
                          spp_per_pass=1, use_pallas=True,
                          pallas_backend="sweep",
                          compaction_buckets=buckets,
                          compaction_mode=cmode,
                          grad_tile_checkpoint=(mode == "tile"))
    target = jnp.zeros((height, width, 3), jnp.float32)
    rays = width * height * (1 + 2 * bounces)

    state = init_render_state(config)
    state = render_pass(scene, camera, state, config, rays_per_tile=tile)
    float(state.accum[0, 0, 0])
    t0 = time.time()
    for _ in range(3):
        state = render_pass(scene, camera, state, config, rays_per_tile=tile)
        float(state.accum[0, 0, 0])
    fwd_s = (time.time() - t0) / 3

    t0 = time.time()
    try:
        loss, grads = material_grad(scene, camera, target, config,
                                    spp=1, rays_per_tile=tile)
        loss = float(loss)
    except Exception as e:
        print(f"buckets={buckets} tile={tile} {mode} {cmode} fwd={fwd_s:.3f}s "
              f"grad FAIL {type(e).__name__}", flush=True)
        sys.exit(1)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(2):
        loss_v, _ = material_grad(scene, camera, target, config,
                                  spp=1, rays_per_tile=tile)
        float(loss_v)
    step_s = (time.time() - t0) / 2
    print(f"buckets={buckets} tile={tile} {mode} {cmode} fwd={fwd_s:.3f}s "
          f"({rays/fwd_s/1e6:.2f}M) grad={step_s:.3f}s "
          f"({rays/step_s/1e6:.2f}M) loss={loss:.6g} "
          f"grad_compile={compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
