"""Op-level device profile of one material_grad step (bwd bottleneck hunt).

Traces one warm grad step with jax.profiler and prints the top self-time
ops from the captured xplane via tensorboard_plugin_profile.

Usage: python exp/bwd_profile.py [rays_per_tile] [tile|notile]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.parallel.autodiff import material_grad


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    mode = sys.argv[2] if len(sys.argv) > 2 else "tile"
    width, height, bounces = 1024, 512, 8
    _, scene = build_reference_scene(objects=("floor", "loong"))
    camera = Camera.make(aspect=width / height)
    config = RenderConfig(width=width, height=height, max_bounce=bounces,
                          spp_per_pass=1, use_pallas=True,
                          pallas_backend="sweep",
                          grad_tile_checkpoint=(mode == "tile"))
    target = jnp.zeros((height, width, 3), jnp.float32)

    loss, _ = material_grad(scene, camera, target, config, spp=1,
                            rays_per_tile=tile)
    float(loss)   # warm

    logdir = "/tmp/jaxprof"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    loss, grads = material_grad(scene, camera, target, config, spp=1,
                                rays_per_tile=tile)
    float(loss)
    jax.profiler.stop_trace()

    planes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplanes:", planes, flush=True)
    if not planes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                planes, tool, {})
            out = f"/tmp/bwd_profile_{tool}.out"
            with open(out, "wb") as fh:
                fh.write(data if isinstance(data, bytes)
                         else data.encode())
            print(f"wrote {out} ({len(data)} bytes)", flush=True)
        except Exception as e:
            print(f"{tool}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
