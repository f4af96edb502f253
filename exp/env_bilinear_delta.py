"""Quantify the nearest-vs-bilinear environment filtering deviation.

The reference fetches its HDR map and inverse-CDF cache with GL_LINEAR
(texture(), glsl:635-646 / 1165-1186); the fast path fetches nearest
texels from the fused env_fetch table (ops/envmap.py). VERDICT r4
missing-#1: nobody had MEASURED the image delta. This renders loong at
512x256, 256 spp with both paths and reports the converged pixel delta
(archive the numbers in exp/RESULTS.md).

Note the bilinear path is also the reference's exact rotation semantics
(sampled direction unrotated, lookups rotated), while the nearest path
rotates the sampled direction so the sampling distribution tracks the
rotated radiance (a documented improvement). env_angle defaults to 0
where both agree.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.render import (
    init_render_state,
    render_passes,
)

W, H, SPP, CHUNK = 512, 256, 256, 32


def render(scene, cam, config):
    st = init_render_state(config)
    t0 = time.time()
    for i in range(0, SPP, CHUNK):
        st = render_passes(scene, cam, st, config, min(CHUNK, SPP - i),
                           rays_per_tile=W * H)
        float(st.accum[0, 0, 0])
        print(f"  {i + CHUNK}/{SPP} spp ({time.time() - t0:.0f}s)",
              flush=True)
    return np.asarray(st.accum)


def main():
    _, scene = build_reference_scene(objects=("floor", "loong"))
    cam = Camera.make(aspect=W / H)
    base = dict(width=W, height=H, max_bounce=8, use_pallas=True,
                pallas_backend="sweep")
    print(f"hdr resolution: {scene.hdr_map.shape}", flush=True)

    print("nearest (fused env_fetch) ...", flush=True)
    img_n = render(scene, cam, RenderConfig(**base))
    print("bilinear (GL-faithful) ...", flush=True)
    img_b = render(scene, cam, RenderConfig(env_bilinear=True, **base))

    diff = np.abs(img_n - img_b)
    rel = diff / (np.abs(img_b) + 1e-2)
    print(f"mean |delta|      = {diff.mean():.3e}  (image mean "
          f"{img_b.mean():.4f})")
    print(f"q99 / q99.9 rel   = {np.quantile(rel, 0.99):.3e} / "
          f"{np.quantile(rel, 0.999):.3e}")
    print(f"max rel           = {rel.max():.3e}")
    print(f"pixels >1% rel    = {(rel > 0.01).mean():.4%}")
    print(f"pixels >5% rel    = {(rel > 0.05).mean():.4%}")


if __name__ == "__main__":
    main()
