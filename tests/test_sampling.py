"""RNG / QMC / sampler tests (reference glsl:573-785, 650-769)."""

import numpy as np
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu.ops import sampling as sp


def test_sobol_table_known_values():
    """Spot-check direction numbers against the standard constants the
    reference embeds (glsl:590-592) for the dimensions that follow the
    Sobol recurrence (see sampling.py docstring)."""
    t = sp.SOBOL_TABLE
    # dim 0: van der Corput 2^31 >> j
    assert t[0, 0] == 2147483648 and t[0, 1] == 1073741824
    assert t[0, 31] == 1
    # dim 1
    assert list(t[1, :4]) == [2147483648, 3221225472, 2684354560, 4026531840]
    # dim 2
    assert list(t[2, :4]) == [2147483648, 3221225472, 1610612736, 2415919104]
    # dim 6
    assert list(t[6, :4]) == [2147483648, 3221225472, 2684354560, 3489660928]


def test_sobol_first_points():
    """First Sobol points in Gray-code order: i=1 -> 0.5 in every dim."""
    p1 = np.asarray(sp.sobol_all_dims(jnp.uint32(1)))
    assert np.allclose(p1, 0.5, atol=1e-6)
    p0 = np.asarray(sp.sobol_all_dims(jnp.uint32(0)))
    assert np.allclose(p0, 0.0, atol=1e-6)


def test_sobol_low_discrepancy_1d():
    """First 2^k van der Corput points are exactly stratified."""
    pts = np.array([float(sp.sobol_all_dims(jnp.uint32(i))[0])
                    for i in range(16)])
    cells = np.floor(pts * 16).astype(int)
    assert sorted(cells) == list(range(16))


def test_rand01_uniform_and_deterministic():
    pid = jnp.arange(4096, dtype=jnp.uint32)
    u1 = np.asarray(sp.rand01(pid, 3, 7))
    u2 = np.asarray(sp.rand01(pid, 3, 7))
    assert np.array_equal(u1, u2)
    assert (u1 >= 0).all() and (u1 < 1).all()
    assert abs(u1.mean() - 0.5) < 0.02
    assert abs(np.corrcoef(u1[:-1], u1[1:])[0, 1]) < 0.05
    # different salt decorrelates
    u3 = np.asarray(sp.rand01(pid, 3, 8))
    assert abs(np.corrcoef(u1, u3)[0, 1]) < 0.05


def test_cranley_patterson_wraps():
    u = jnp.array([0.25, 0.9, 0.0])
    shifted = np.asarray(sp.cranley_patterson(u, jnp.array([0.5, 0.5, 0.999])))
    assert np.allclose(shifted, [0.75, 0.4, 0.999], atol=1e-6)
    assert (shifted >= 0).all() and (shifted < 1).all()


def test_cosine_hemisphere_moments():
    n = 1 << 14
    pid = jnp.arange(n, dtype=jnp.uint32)
    r1 = sp.rand01(pid, 0, 0)
    r2 = sp.rand01(pid, 0, 1)
    d = np.asarray(sp.cosine_sample_hemisphere(r1, r2))
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    assert (d[:, 2] >= 0).all()
    # E[cos(theta)] = 2/3 for cosine-weighted hemisphere
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_uniform_sphere():
    n = 1 << 14
    pid = jnp.arange(n, dtype=jnp.uint32)
    d = np.asarray(sp.uniform_sample_sphere(
        sp.rand01(pid, 1, 0), sp.rand01(pid, 1, 1)))
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    assert abs(d.mean(axis=0)).max() < 0.03


def test_onb_orthonormal():
    n = np.random.default_rng(0).normal(size=(256, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n = jnp.asarray(n, jnp.float32)
    for frame in (sp.onb, sp.onb_hemi):
        t, b = frame(n)
        t, b, nn = np.asarray(t), np.asarray(b), np.asarray(n)
        assert np.abs((t * nn).sum(1)).max() < 1e-5
        assert np.abs((b * nn).sum(1)).max() < 1e-5
        assert np.abs((t * b).sum(1)).max() < 1e-5
        assert np.allclose(np.linalg.norm(t, axis=1), 1, atol=1e-5)


def test_to_local_world_roundtrip():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    v = rng.normal(size=(64, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    n = jnp.asarray(n, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    t, b = sp.onb(n)
    local = sp.to_local(t, b, n, v)
    back = sp.to_world(t, b, n, local)
    assert np.allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_vndf_half_vectors_upper_hemisphere():
    rng = np.random.default_rng(2)
    n = 4096
    v = rng.normal(size=(n, 3))
    v[:, 2] = np.abs(v[:, 2]) + 0.05
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = jnp.asarray(v, jnp.float32)
    r1 = jnp.asarray(rng.random(n), jnp.float32)
    r2 = jnp.asarray(rng.random(n), jnp.float32)
    h = np.asarray(sp.sample_ggx_vndf(v, jnp.float32(0.3), jnp.float32(0.3),
                                      r1, r2))
    assert np.allclose(np.linalg.norm(h, axis=1), 1.0, atol=1e-4)
    assert (h[:, 2] >= 0).all()
    # every sampled half-vector must be visible from v
    assert (np.asarray(jnp.sum(v * h, axis=-1)) > -1e-4).all()


def test_hg_phase_normalization():
    """Integral of the HG phase over the sphere = 1."""
    n = 2000
    mu = np.linspace(-1, 1, n)
    for g in (0.0, 0.4, -0.7):
        p = np.asarray(sp.phase_hg(jnp.asarray(mu, jnp.float32),
                                   jnp.float32(g)))
        total = 2 * np.pi * np.trapezoid(p, mu)
        assert abs(total - 1.0) < 1e-2, (g, total)


def test_sample_hg_matches_phase():
    """The reference's HG convention measures cos(theta) against V = -ray
    direction (glsl:1195-1222): forward scattering (g > 0) means directions
    opposite V, so the mean cosine of samples w.r.t. V equals -g, matching
    the +2g*cos sign in its phase denominator."""
    rng = np.random.default_rng(3)
    n = 1 << 14
    v = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)), jnp.float32)
    r1 = jnp.asarray(rng.random(n), jnp.float32)
    r2 = jnp.asarray(rng.random(n), jnp.float32)
    for g in (0.0, 0.5, -0.3):
        d = np.asarray(sp.sample_hg(v, jnp.float32(g), r1, r2))
        assert np.allclose(np.linalg.norm(d, axis=1), 1, atol=1e-4)
        mean_cos = d[:, 2].mean()
        assert abs(mean_cos + g) < 0.02, (g, mean_cos)


def test_reflect_refract():
    i = jnp.asarray(np.array([[0.0, -1.0, 0.0]]), jnp.float32)
    n = jnp.asarray(np.array([[0.0, 1.0, 0.0]]), jnp.float32)
    r = np.asarray(sp.reflect(i, n))
    assert np.allclose(r, [[0, 1, 0]], atol=1e-6)
    # straight-through refraction at normal incidence
    t = np.asarray(sp.refract(i, n, jnp.asarray([1.0 / 1.5], jnp.float32)))
    assert np.allclose(t, [[0, -1, 0]], atol=1e-5)
    # total internal reflection -> zero vector (GLSL convention)
    i2 = jnp.asarray(np.array([[0.95, -0.312, 0.0]]), jnp.float32)
    t2 = np.asarray(sp.refract(i2, n, jnp.asarray([1.5], jnp.float32)))
    assert np.allclose(t2, 0.0)
