"""Hardware lane: parity + smoke tests that run on a real TPU.

Round 1 shipped 60 green CPU tests alongside a hard device fault in the
headline bench (VERDICT round 1, weak #5). This lane re-runs the critical
checks on the actual chip:

    ORTF_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

- sweep / scheduled tracer image parity vs the while-loop oracle on the
  flagship loong-100k scene (the round-1 failure mode: ~32% radiance
  deficit at exactly this configuration),
- a 256x128 render_pass completes on device,
- material gradients are finite on device.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def loong():
    from opengl_ray_tracing_framework_tpu.models.scene import (
        build_reference_scene,
    )
    try:
        _, scene = build_reference_scene(objects=("floor", "loong"))
    except Exception as e:  # pragma: no cover - assets missing
        pytest.skip(f"loong assets unavailable: {e}")
    return scene


@pytest.fixture(scope="module")
def loong_oracle_image(loong):
    """While-loop tracer render at 128x64, 2 spp — the on-device oracle."""
    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.render import render_radiance

    cam = Camera.make(aspect=2.0)
    cfg = RenderConfig(width=128, height=64, max_bounce=8, use_pallas=False)
    return np.asarray(render_radiance(loong, cam, cfg, spp=2))


@pytest.mark.parametrize("backend", ["sweep", "schedule"])
def test_tracer_parity_loong(loong, loong_oracle_image, backend):
    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.render import render_radiance

    cam = Camera.make(aspect=2.0)
    cfg = RenderConfig(width=128, height=64, max_bounce=8, use_pallas=True,
                       pallas_backend=backend)
    img = np.asarray(render_radiance(loong, cam, cfg, spp=2))
    ref = loong_oracle_image
    # identical estimator, same RNG: only float ordering may differ
    assert abs(img.mean() - ref.mean()) < 1e-4 * max(ref.mean(), 1e-6)
    mismatch = ~np.isclose(img, ref, atol=1e-3, rtol=1e-3)
    assert mismatch.mean() < 1e-3, f"{mismatch.mean():.5f} pixels diverge"


def test_tracer_parity_loong_brdf(loong):
    """Legacy 3-lobe BRDF mode (enableBSDF=false,
    shadingImportanceSampling_BRDF glsl:1290-1367) on-chip: sweep tracer
    vs the while-loop oracle at the flagship scene (VERDICT r4 weak #7 —
    BRDF mode had CPU coverage but no on-chip golden)."""
    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.render import render_radiance

    cam = Camera.make(aspect=2.0)
    base = dict(width=128, height=64, max_bounce=8, enable_bsdf=False)
    ref = np.asarray(render_radiance(
        loong, cam, RenderConfig(use_pallas=False, **base), spp=2))
    img = np.asarray(render_radiance(
        loong, cam, RenderConfig(use_pallas=True, pallas_backend="sweep",
                                 **base), spp=2))
    assert np.isfinite(img).all()
    assert abs(img.mean() - ref.mean()) < 1e-4 * max(ref.mean(), 1e-6)
    mismatch = ~np.isclose(img, ref, atol=1e-3, rtol=1e-3)
    assert mismatch.mean() < 1e-3, f"{mismatch.mean():.5f} pixels diverge"


def test_render_pass_256x128(loong):
    import jax
    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.render import (
        init_render_state,
        render_pass,
    )

    cfg = RenderConfig(width=256, height=128, max_bounce=8, use_pallas=True)
    cam = Camera.make(aspect=2.0)
    state = init_render_state(cfg)
    state = render_pass(loong, cam, state, cfg, rays_per_tile=32768)
    acc = jax.block_until_ready(state.accum)
    a = np.asarray(acc)
    assert np.isfinite(a).all()
    assert a.mean() > 0.01


@pytest.mark.slow
def test_bench_shape_render_pass(loong):
    """Pin the EXACT flagship bench config (bench.py): 1024x512, 8 bounces,
    default RenderConfig, 131072-ray tile. Round 4 shipped with this shape
    broken while the lane passed at <=512x256 (VERDICT r4 weak #1) — the
    lane must contain the artifact it certifies."""
    import jax
    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.render import (
        init_render_state,
        render_pass,
    )

    cfg = RenderConfig(width=1024, height=512, max_bounce=8,
                       use_pallas=True, pallas_backend="sweep")
    cam = Camera.make(aspect=2.0)
    state = init_render_state(cfg)
    state = render_pass(loong, cam, state, cfg, rays_per_tile=131072)
    a = np.asarray(jax.block_until_ready(state.accum))
    assert np.isfinite(a).all()
    assert a.mean() > 0.01


@pytest.mark.slow
def test_bench_shape_material_grad(loong):
    """material_grad at the exact bench config + bench.py's bwd tile
    (BENCH_BWD_TILE default 131072, cast-only grad compaction): the
    artifact that was red in BENCH_r04 (bwd HBM OOM at compile).
    Compile + one step on device."""
    import jax
    import jax.numpy as jnp
    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.parallel.autodiff import (
        material_grad,
    )

    cfg = RenderConfig(width=1024, height=512, max_bounce=8,
                       use_pallas=True, pallas_backend="sweep")
    cam = Camera.make(aspect=2.0)
    target = jnp.zeros((512, 1024, 3), jnp.float32)
    loss, grads = material_grad(loong, cam, target, cfg, spp=1,
                                rays_per_tile=131072)
    loss = float(jax.block_until_ready(loss))
    assert np.isfinite(loss) and loss > 0
    flat = [np.asarray(g) for g in jax.tree.leaves(grads)
            if hasattr(g, "dtype") and g.dtype != jax.dtypes.float0]
    assert flat and all(np.isfinite(g).all() for g in flat)


def test_material_grad_finite():
    import jax
    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.models.scene import build_test_scene
    from opengl_ray_tracing_framework_tpu.parallel.autodiff import (
        material_grad,
    )

    _, scene = build_test_scene()
    cam = Camera.make(position=(0.0, 0.5, -2.0), yaw=90.0, pitch=-8.0,
                      zoom=30.0, aspect=1.0)
    cfg = RenderConfig(width=32, height=32, max_bounce=3)
    target = np.zeros((32, 32, 3), np.float32)
    loss, grads = material_grad(scene, cam, target, cfg,
                                rays_per_tile=32 * 32)
    loss = float(jax.block_until_ready(loss))
    assert np.isfinite(loss) and loss > 0
    flat = [np.asarray(g) for g in jax.tree.leaves(grads)
            if hasattr(g, "dtype") and g.dtype != jax.dtypes.float0]
    assert flat and all(np.isfinite(g).all() for g in flat)
