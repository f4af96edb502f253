"""Measure the grad-step cost of the two backward remat policies
(RenderConfig.grad_tile_checkpoint) at the bench shape.

Usage: python exp/bwd_remat_probe.py {tile|notile} [rays_per_tile]
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


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "notile"
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    width, height, bounces = 1024, 512, 8
    _, scene = build_reference_scene(objects=("floor", "loong"))
    camera = Camera.make(aspect=width / height)
    config = RenderConfig(width=width, height=height, max_bounce=bounces,
                          spp_per_pass=1, use_pallas=True,
                          pallas_backend="sweep",
                          grad_tile_checkpoint=(mode == "tile"))
    target = jnp.zeros((height, width, 3), jnp.float32)
    rays = width * height * (1 + 2 * bounces)

    t0 = time.time()
    try:
        loss, grads = material_grad(scene, camera, target, config,
                                    spp=1, rays_per_tile=tile)
        loss = float(loss)
    except Exception as e:
        msg = str(e)
        print(f"{mode} tile={tile} FAIL {type(e).__name__} "
              f"after {time.time() - t0:.0f}s", flush=True)
        for line in msg.splitlines():
            if "Size:" in line or "exceeds" in line.lower():
                print("  " + line.strip(), flush=True)
        sys.exit(1)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(2):
        loss_v, _ = material_grad(scene, camera, target, config,
                                  spp=1, rays_per_tile=tile)
        float(loss_v)
    step_s = (time.time() - t0) / 2
    print(f"{mode} tile={tile} loss={loss:.6g} compile={compile_s:.0f}s "
          f"step={step_s:.3f}s ({rays/step_s/1e6:.2f}M r/s)", flush=True)


if __name__ == "__main__":
    main()
