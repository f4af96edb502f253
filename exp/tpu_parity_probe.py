"""TPU probe: scheduled tracer vs while-loop oracle on loong-100k."""
import time, sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.render import render_radiance

W, H = 128, 64
_, scene = build_reference_scene(objects=("floor", "loong"))
print("n_tris", scene.n_triangles, "n_clusters", scene.cl_aabb_min.shape[0])
cam = Camera.make(aspect=W / H)

for name, cfg in [
    ("whileloop", RenderConfig(width=W, height=H, max_bounce=8)),
    ("scheduled", RenderConfig(width=W, height=H, max_bounce=8, use_pallas=True)),
]:
    t0 = time.time()
    img = render_radiance(scene, cam, cfg, spp=4)
    img = np.asarray(jax.block_until_ready(img))
    t1 = time.time()
    # timed second run
    img2 = render_radiance(scene, cam, cfg, spp=4)
    jax.block_until_ready(img2)
    t2 = time.time()
    rays = W * H * 4 * (1 + 2 * 8)
    print(f"{name}: mean={img.mean():.6f} compile+run={t1-t0:.1f}s "
          f"run={t2-t1:.3f}s {rays/(t2-t1)/1e6:.2f} Mrays/s")
    np.save(f"/tmp/parity_{name}.npy", img)

a = np.load("/tmp/parity_whileloop.npy")
b = np.load("/tmp/parity_scheduled.npy")
d = np.abs(a - b)
print("max_abs_diff", d.max(), "mean_abs_diff", d.mean(),
      "frac>1e-3:", (d > 1e-3).mean())
