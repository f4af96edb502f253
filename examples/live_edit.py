"""Live material edit -> invalidate -> re-render.

The reference's signature interactive loop is: drag an ImGui slider, the
app marks the accumulator dirty and restarts progressive rendering with
the edited material (main.cpp:324-327 slider -> camera.LoopNum = 0 ->
RefreshTriangleMaterial + TBO re-upload, Triangle.h:133-151).

The functional equivalent here, end-to-end:

  1. render the scene a few progressive passes,
  2. edit one material slot (MaterialTable.replace_material — no scene
     re-upload: the table is a device pytree, the edit is one .at[].set),
  3. invalidate by starting a fresh RenderState (the LoopNum=0 analogue),
  4. re-render and save both frames.

Run:  python examples/live_edit.py  (writes live_edit_{before,after}.png)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.material import preset_materials
from opengl_ray_tracing_framework_tpu.models.scene import build_test_scene
from opengl_ray_tracing_framework_tpu.render import (
    finalize,
    init_render_state,
    render_pass,
)
from opengl_ray_tracing_framework_tpu.utils.image import save_render

SPP = int(os.environ.get("LIVE_EDIT_SPP", "16"))

scene_builder, scene = build_test_scene(n_sphere_subdiv=2)
camera = Camera.make(position=(0.0, 0.5, -2.0), yaw=90.0, pitch=-8.0,
                     zoom=30.0, aspect=1.0)
config = RenderConfig(width=128, height=128, max_bounce=4,
                      spp_per_pass=SPP)

# 1. initial render
state = init_render_state(config)
state = render_pass(scene, camera, state, config, rays_per_tile=128 * 128)
save_render("live_edit_before.png", finalize(state, config))
print(f"before: {SPP} spp, mean={float(state.accum.mean()):.4f}")

# 2. the "slider drag": swap the sphere's material slot to golden metal
slot = scene_builder.objects[-1].material_slot
edited = scene.materials.replace_material(slot,
                                          preset_materials()["golden"])
scene = scene.with_materials(edited)

# 3. invalidate (camera.LoopNum = 0): fresh accumulator, same compiled fn
state = init_render_state(config)

# 4. re-render — render_pass reuses the jit cache (no recompile: only the
# material *values* changed, not any shape or static config)
state = render_pass(scene, camera, state, config, rays_per_tile=128 * 128)
save_render("live_edit_after.png", finalize(state, config))
print(f"after:  {SPP} spp, mean={float(state.accum.mean()):.4f}")
print("wrote live_edit_before.png / live_edit_after.png")
