"""Bisect the enable_env_map cost inside the integrator by stubbing parts."""
import os, time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.render import init_render_state, _one_pass
from opengl_ray_tracing_framework_tpu.ops import integrator as I
from opengl_ray_tracing_framework_tpu.ops.intersect import Hit, INF

W, H = 1024, 512
_, scene = build_reference_scene(objects=("floor", "loong"))
cam = Camera.make(aspect=W / H)
cfg = RenderConfig(width=W, height=H, max_bounce=8, use_pallas=True)

orig = dict(
    env_sample_nearest=I.env_sample_nearest,
    env_radiance_pdf_nearest=I.env_radiance_pdf_nearest,
    closest_hit=I.closest_hit,
)

def stub_sample(env_fetch, h, w, xi1, xi2, env_angle):
    d = jnp.zeros(xi1.shape + (3,), jnp.float32).at[..., 1].set(1.0)
    fr = jnp.ones(xi1.shape + (3,), jnp.float32) + 0 * xi1[..., None]
    return d + 0 * xi1[..., None], jnp.ones_like(xi1) * 0.25, fr

def stub_rad(env_fetch, h, w, direction, env_angle):
    return jnp.ones(direction.shape[:-1] + (3,), jnp.float32) \
        + 0 * direction[..., :1]

def stub_all_secondary(scene, o, d, config, mask=None, any_hit=False,
                       secondary=False):
    if secondary:
        z = 0 * o[..., 0]
        return Hit(t=z + INF, tri=z.astype(jnp.int32) - 1, inside=z > 1)
    return orig["closest_hit"](scene, o, d, config, mask=mask,
                               any_hit=any_hit, secondary=secondary)

def stub_rad_pdf(env_fetch, h, w, direction, env_angle):
    return stub_rad(env_fetch, h, w, direction, env_angle), \
        jnp.ones(direction.shape[:-1], jnp.float32) * 0.25 \
        + 0 * direction[..., 0]

def stub_shadow(scene, o, d, config, mask=None, any_hit=False, secondary=False):
    if any_hit:
        z = 0 * o[..., 0]
        return Hit(t=z + INF, tri=z.astype(jnp.int32) - 1, inside=z > 1)
    return orig["closest_hit"](scene, o, d, config, mask=mask,
                               any_hit=any_hit, secondary=secondary)

def run(label, **patches):
    for k, v in orig.items():
        setattr(I, k, v)
    for k, v in patches.items():
        setattr(I, k, v)
    f = jax.jit(lambda st: _one_pass(scene, cam, st, cfg, 131072))
    st = init_render_state(cfg)
    st = f(st); float(jnp.sum(st.accum[:1, :1]))
    t0 = time.time(); st = f(st); float(jnp.sum(st.accum[:1, :1]))
    print(f"{label}: {(time.time()-t0-0.022)*1e3:.0f} ms", flush=True)

run("baseline full")
run("no sample gather", env_sample_nearest=stub_sample)
run("no bounce-miss gather", env_radiance_pdf_nearest=stub_rad_pdf)
run("no shadow cast", closest_hit=stub_shadow)
run("no secondary casts at all", closest_hit=stub_all_secondary)
run("all stubs", env_sample_nearest=stub_sample,
    env_radiance_nearest=stub_rad, env_radiance_pdf_nearest=stub_rad_pdf,
    closest_hit=stub_shadow)
