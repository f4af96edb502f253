"""Round-4 repro of the VERDICT round-3 NaN: material_grad on the icosphere
test scene at 256x256, 8 bounces, single CPU device -> NaN in specular-lobe
material gradients. Run: JAX_PLATFORMS=cpu python exp/nan_repro.py
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.material import preset_materials
from opengl_ray_tracing_framework_tpu.models.scene import build_test_scene
from opengl_ray_tracing_framework_tpu.parallel.autodiff import material_grad

SIZE = int(os.environ.get("SIZE", "256"))
BOUNCES = int(os.environ.get("BOUNCES", "8"))
MAT = os.environ.get("MAT", "brown_glass")

presets = preset_materials()
_, scene = build_test_scene(n_sphere_subdiv=2, material=presets[MAT])
camera = Camera.make(position=(0.0, 0.5, -2.0), yaw=90.0, pitch=-8.0,
                     zoom=30.0, aspect=1.0)
config = RenderConfig(width=SIZE, height=SIZE, max_bounce=BOUNCES,
                      spp_per_pass=1)
target = jnp.zeros((SIZE, SIZE, 3), jnp.float32)
loss, grads = material_grad(scene, camera, target, config,
                            rays_per_tile=16384)
loss = float(loss)
print(f"size={SIZE} bounces={BOUNCES} mat={MAT} loss={loss:.4f}")
bad = []
for path, g in jax.tree_util.tree_leaves_with_path(grads):
    if g.dtype == jax.dtypes.float0:
        continue
    a = np.asarray(g)
    if not np.isfinite(a).all():
        bad.append((jax.tree_util.keystr(path), int((~np.isfinite(a)).sum())))
print("non-finite leaves:", bad if bad else "NONE")
