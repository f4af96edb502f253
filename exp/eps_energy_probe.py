"""Measure the energy cut by disney.py's _COS_EPS/_DENOM_EPS lobe cutoffs.

ADVICE r4 (low): the refraction lobe zeroes lanes with
|ldoth + eta*vdoth| < _DENOM_EPS = 1e-3 (near-TIR grazing refraction)
that the reference shader evaluates raw; the primal deviation is baked
into the regenerated goldens so regression tests cannot see it. This
renders the glass golden scene with the shipped epsilons vs 100x
smaller ones and reports the energy difference — the measured bound for
the parity notes.

Run on the chip (forward only, no AD, so the small epsilons are safe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops import disney
from opengl_ray_tracing_framework_tpu.render import (
    init_render_state,
    render_passes,
)

W, H, SPP, CHUNK = 512, 256, 128, 32


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
    _, scene = build_reference_scene(objects=("floor", "loong"))  # tear glass
    cam = Camera.make(aspect=W / H)
    cfg = RenderConfig(width=W, height=H, max_bounce=8, use_pallas=True,
                       pallas_backend="sweep")

    print(f"shipped eps: COS={disney._COS_EPS} DENOM={disney._DENOM_EPS}",
          flush=True)
    img_ship = render(scene, cam, cfg)

    # 100x tighter cutoffs ~ the raw-evaluation limit (cannot use exactly
    # 0: the masked-input scheme needs a nonzero threshold)
    disney._COS_EPS, disney._DENOM_EPS = 1e-6, 1e-5
    try:
        # the jit cache keys on config, not module globals — clear it
        from opengl_ray_tracing_framework_tpu.render import (
            render_pass, render_passes as rp)
        render_pass.clear_cache()
        rp.clear_cache()
        img_raw = render(scene, cam, cfg)
    finally:
        disney._COS_EPS, disney._DENOM_EPS = 1e-4, 1e-3

    diff = np.abs(img_ship - img_raw)
    rel = diff / (np.abs(img_raw) + 1e-2)
    print(f"image means: shipped={img_ship.mean():.5f} "
          f"raw={img_raw.mean():.5f} "
          f"(energy delta {abs(img_ship.mean()-img_raw.mean())/img_raw.mean():.3e})")
    print(f"mean |delta| = {diff.mean():.3e}; q99.9 rel = "
          f"{np.quantile(rel, 0.999):.3e}; pixels >1% rel = "
          f"{(rel > 0.01).mean():.4%}")


if __name__ == "__main__":
    main()
