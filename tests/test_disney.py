"""Disney BSDF consistency tests (glsl:925-1161)."""

import numpy as np
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu.models.material import Material, preset_materials
from opengl_ray_tracing_framework_tpu.ops import disney
from opengl_ray_tracing_framework_tpu.ops.sampling import (
    rand01,
    uniform_sample_sphere,
)


def _batched(mat: Material, n: int) -> Material:
    import jax
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape), mat)


def _fixed_v_n(n):
    v = jnp.broadcast_to(jnp.asarray([0.0, 0.3, 0.954], jnp.float32), (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    return v, nrm


def test_eval_zero_below_horizon_for_opaque():
    n = 256
    mat = _batched(Material.make(base_color=(0.8, 0.4, 0.2), roughness=0.5,
                                 specular=0.5), n)
    v, nrm = _fixed_v_n(n)
    rng = np.random.default_rng(0)
    l = rng.normal(size=(n, 3))
    l[:, 2] = -np.abs(l[:, 2]) - 0.01      # below the surface
    l /= np.linalg.norm(l, axis=1, keepdims=True)
    f, pdf = disney.disney_eval(mat, v, nrm, jnp.asarray(l, jnp.float32))
    assert np.abs(np.asarray(f)).max() < 1e-6
    assert np.abs(np.asarray(pdf)).max() < 1e-6


def test_sample_directions_sane():
    n = 4096
    for name in ("white", "golden", "glass", "jade"):
        mat = _batched(preset_materials()[name], n)
        v, nrm = _fixed_v_n(n)
        pid = jnp.arange(n, dtype=jnp.uint32)
        smp = disney.disney_sample(mat, v, nrm,
                                   rand01(pid, 0, 0), rand01(pid, 0, 1),
                                   rand01(pid, 0, 2))
        d = np.asarray(smp.direction)
        assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3), name
        f = np.asarray(smp.f)
        pdf = np.asarray(smp.pdf)
        assert np.isfinite(f).all() and np.isfinite(pdf).all(), name
        assert (pdf >= 0).all(), name
        ok = pdf > 1e-8
        assert ok.mean() > 0.7, (name, ok.mean())
        # refraction only for transmissive materials
        refr = np.asarray(smp.is_refract)
        if name in ("white", "golden", "jade"):
            assert not refr.any(), name
        if name == "glass":
            assert refr.any(), "glass never refracted"
            assert (d[refr][:, 2] < 0).all(), "refracted rays must go below"


def test_sample_eval_albedo_agreement():
    """Two MC estimators of the hemispherical albedo must agree:
    (a) E[f/pdf] over BSDF samples, (b) E[f*|cos| / p_uniform] over uniform
    sphere samples of disney_eval. Validates that sample pdfs match the
    densities actually sampled."""
    n = 1 << 15
    pid = jnp.arange(n, dtype=jnp.uint32)
    # rough materials only: a uniform-sphere estimator cannot resolve
    # near-mirror lobes at this sample count
    cases = {
        "white": (preset_materials()["white"], 0.05),
        "jade": (preset_materials()["jade"], 0.1),
        "rough_metal": (Material.make(base_color=(0.9, 0.6, 0.3),
                                      metallic=1.0, roughness=0.6,
                                      specular=1.0), 0.1),
    }
    for name, (mat0, tol) in cases.items():
        mat = _batched(mat0, n)
        v, nrm = _fixed_v_n(n)

        smp = disney.disney_sample(mat, v, nrm,
                                   rand01(pid, 1, 0), rand01(pid, 1, 1),
                                   rand01(pid, 1, 2))
        w = np.asarray(smp.f) / np.maximum(np.asarray(smp.pdf), 1e-10)[:, None]
        w = np.where(np.asarray(smp.pdf)[:, None] > 1e-8, w, 0.0)
        est_a = w.mean(axis=0)

        l = uniform_sample_sphere(rand01(pid, 2, 0), rand01(pid, 2, 1))
        f, _ = disney.disney_eval(mat, v, nrm, l)
        est_b = np.asarray(f).mean(axis=0) * 4.0 * np.pi

        rel = np.abs(est_a - est_b) / np.maximum(est_b, 1e-3)
        assert rel.max() < 3 * tol + 0.15, (name, est_a, est_b)


def test_energy_conservation_white_diffuse():
    """A white, purely diffuse surface must not amplify energy:
    E[f/pdf] <= 1 + noise."""
    n = 1 << 15
    pid = jnp.arange(n, dtype=jnp.uint32)
    mat = _batched(Material.make(base_color=(1.0, 1.0, 1.0), roughness=0.5),
                   n)
    v, nrm = _fixed_v_n(n)
    smp = disney.disney_sample(mat, v, nrm, rand01(pid, 3, 0),
                               rand01(pid, 3, 1), rand01(pid, 3, 2))
    w = np.asarray(smp.f) / np.maximum(np.asarray(smp.pdf), 1e-10)[:, None]
    w = np.where(np.asarray(smp.pdf)[:, None] > 1e-8, w, 0.0)
    assert w.mean(axis=0).max() <= 1.02, w.mean(axis=0)


def test_metallic_tint():
    """Copper must reflect copper-colored light (R > G > B)."""
    n = 1 << 14
    pid = jnp.arange(n, dtype=jnp.uint32)
    mat = _batched(preset_materials()["copper"], n)
    v, nrm = _fixed_v_n(n)
    smp = disney.disney_sample(mat, v, nrm, rand01(pid, 4, 0),
                               rand01(pid, 4, 1), rand01(pid, 4, 2))
    w = np.asarray(smp.f) / np.maximum(np.asarray(smp.pdf), 1e-10)[:, None]
    w = np.where(np.asarray(smp.pdf)[:, None] > 1e-8, w, 0.0)
    mean = w.mean(axis=0)
    assert mean[0] > mean[1] > mean[2]


def test_brdf_mode_eval():
    n = 128
    mat = _batched(preset_materials()["white"], n)
    v, nrm = _fixed_v_n(n)
    from opengl_ray_tracing_framework_tpu.ops.sampling import onb
    t, b = onb(nrm)
    rng = np.random.default_rng(5)
    l = rng.normal(size=(n, 3))
    l[:, 2] = np.abs(l[:, 2]) + 0.05
    l /= np.linalg.norm(l, axis=1, keepdims=True)
    f, pdf = disney.brdf_evaluate(mat, v, nrm, jnp.asarray(l, jnp.float32),
                                  t, b)
    assert np.isfinite(np.asarray(f)).all()
    assert (np.asarray(pdf) > 0).all()
