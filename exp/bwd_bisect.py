"""Bisect the r04 bwd compile failure at the bench shape.

Usage: python exp/bwd_bisect.py <buckets> <supertile> <secondary_tile> [tile]
Runs material_grad at 1024x512x8 with the given knobs and reports
compile+run wall time, or the exception class.
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
    buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    supertile = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    secondary = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    tile = int(sys.argv[4]) if len(sys.argv) > 4 else 131072

    width, height, bounces = 1024, 512, 8
    _, scene = build_reference_scene(objects=("floor", "loong"))
    camera = Camera.make(aspect=width / height)
    config = RenderConfig(width=width, height=height, max_bounce=bounces,
                          spp_per_pass=1, use_pallas=True,
                          pallas_backend="sweep",
                          compaction_buckets=buckets,
                          sweep_supertile=supertile,
                          sweep_tile_secondary=secondary)
    target = jnp.zeros((height, width, 3), jnp.float32)
    print(f"# buckets={buckets} supertile={supertile} secondary={secondary} "
          f"tile={tile} device={jax.devices()[0]}", flush=True)
    t0 = time.time()
    try:
        loss, grads = material_grad(scene, camera, target, config,
                                    spp=1, rays_per_tile=tile)
        loss = float(loss)
        compile_s = time.time() - t0
        t0 = time.time()
        loss, grads = material_grad(scene, camera, target, config,
                                    spp=1, rays_per_tile=tile)
        float(loss)
        step_s = time.time() - t0
        print(f"OK loss={loss:.4g} compile={compile_s:.1f}s step={step_s:.3f}s",
              flush=True)
    except Exception as e:
        msg = str(e)
        print(f"FAIL {type(e).__name__} after {time.time() - t0:.1f}s",
              flush=True)
        # print the buffer-size lines only
        for line in msg.splitlines():
            if "Size:" in line or "Shape:" in line or "label" in line \
                    or "exceeds" in line.lower() or "hbm" in line.lower():
                print("  " + line.strip(), flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
