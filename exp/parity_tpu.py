"""TPU parity: scheduled tracer vs while-loop oracle on loong-100k."""
import os
import sys
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.render import render_radiance

W, H = 128, 64
_, scene = build_reference_scene(objects=("floor", "loong"))
cam = Camera.make(aspect=W / H)

base = dict(width=W, height=H, max_bounce=8)
img_sched = render_radiance(scene, cam, RenderConfig(use_pallas=True, **base),
                            spp=4)
img_loop = render_radiance(scene, cam, RenderConfig(use_pallas=False, **base),
                           spp=4)
a = np.asarray(img_sched)
b = np.asarray(img_loop)
diff = np.abs(a - b)
print(f"mean sched={a.mean():.6f} loop={b.mean():.6f}")
print(f"max|diff|={diff.max():.2e} mean|diff|={diff.mean():.2e} "
      f"frac>1e-3: {(diff > 1e-3).mean():.4f}")
assert np.allclose(a, b, atol=1e-3, rtol=1e-3), "PARITY FAIL"
print("PARITY OK")
