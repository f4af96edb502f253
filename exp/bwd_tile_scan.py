"""Scan the backward-pass tile size at the bench shape (VERDICT r5 #3).

The bwd OOMs at 131072 (BENCH_r04); 32768 compiles and runs 2.60 s.
Decompose: for each tile, time material_grad (fwd+bwd in one program) and
the fwd-only render at the same tile, so the bwd premium is visible.

Usage: python exp/bwd_tile_scan.py [tile ...]
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
    tiles = [int(a) for a in sys.argv[1:]] or [65536, 32768, 16384]
    width, height, bounces = 1024, 512, 8
    _, scene = build_reference_scene(objects=("floor", "loong"))
    camera = Camera.make(aspect=width / height)
    config = RenderConfig(width=width, height=height, max_bounce=bounces,
                          spp_per_pass=1, use_pallas=True,
                          pallas_backend="sweep")
    target = jnp.zeros((height, width, 3), jnp.float32)
    rays = width * height * (1 + 2 * bounces)

    for tile in tiles:
        # fwd-only at this tile
        try:
            state = init_render_state(config)
            t0 = time.time()
            state = render_pass(scene, camera, state, config,
                                rays_per_tile=tile)
            float(state.accum[0, 0, 0])
            fwd_compile = time.time() - t0
            t0 = time.time()
            for _ in range(3):
                state = render_pass(scene, camera, state, config,
                                    rays_per_tile=tile)
                float(state.accum[0, 0, 0])
            fwd_s = (time.time() - t0) / 3
        except Exception as e:
            print(f"tile={tile} fwd FAIL {type(e).__name__}", flush=True)
            fwd_s = float("nan")

        try:
            t0 = time.time()
            loss, _ = material_grad(scene, camera, target, config, spp=1,
                                    rays_per_tile=tile)
            float(loss)
            bwd_compile = time.time() - t0
            t0 = time.time()
            for _ in range(2):
                loss, _ = material_grad(scene, camera, target, config,
                                        spp=1, rays_per_tile=tile)
                float(loss)
            bwd_s = (time.time() - t0) / 2
            print(f"tile={tile} fwd={fwd_s:.3f}s ({rays/fwd_s/1e6:.2f}M r/s) "
                  f"grad={bwd_s:.3f}s ({rays/bwd_s/1e6:.2f}M r/s) "
                  f"compiles fwd={fwd_compile:.0f}s bwd={bwd_compile:.0f}s",
                  flush=True)
        except Exception as e:
            msg = str(e).splitlines()
            hbm = next((l for l in msg if "hbm" in l.lower()), "")
            print(f"tile={tile} grad FAIL {type(e).__name__} {hbm[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
