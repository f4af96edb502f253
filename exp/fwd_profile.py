"""Op-level device profile of one forward render_pass (VERDICT r5 #7).

Same xplane capture as exp/bwd_profile.py, on the fwd-only bench program.
Usage: python exp/fwd_profile.py [rays_per_tile]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.render import init_render_state, render_pass


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    width, height, bounces = 1024, 512, 8
    _, scene = build_reference_scene(objects=("floor", "loong"))
    camera = Camera.make(aspect=width / height)
    config = RenderConfig(width=width, height=height, max_bounce=bounces,
                          spp_per_pass=1, use_pallas=True,
                          pallas_backend="sweep")
    state = init_render_state(config)
    state = render_pass(scene, camera, state, config, rays_per_tile=tile)
    float(state.accum[0, 0, 0])

    logdir = "/tmp/jaxprof_fwd"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    state = render_pass(scene, camera, state, config, rays_per_tile=tile)
    float(state.accum[0, 0, 0])
    jax.profiler.stop_trace()
    print("planes:", glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True),
          flush=True)


if __name__ == "__main__":
    main()
