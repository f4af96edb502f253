"""Unit tests for the shading math against hand-evaluated formulas
(reference: fragment_shader_ray_tracing.glsl:410-506)."""

import math

import numpy as np
import jax.numpy as jnp

from opengl_ray_tracing_framework_tpu.ops import microfacet as mf


def test_luminance():
    c = jnp.array([1.0, 1.0, 1.0])
    assert np.isclose(float(mf.luminance(c)), 1.0, atol=1e-5)
    c = jnp.array([0.2, 0.5, 0.3])
    expect = 0.212671 * 0.2 + 0.715160 * 0.5 + 0.072169 * 0.3
    assert np.isclose(float(mf.luminance(c)), expect, rtol=1e-6)


def test_gtr2_matches_scalar():
    for ndoth, alpha in [(0.9, 0.1), (0.5, 0.5), (0.99, 0.01), (0.3, 1.0)]:
        a2 = alpha * alpha
        t = 1 + (a2 - 1) * ndoth * ndoth
        expect = a2 / (math.pi * t * t)
        got = float(mf.gtr2(jnp.float32(ndoth), jnp.float32(alpha)))
        assert np.isclose(got, expect, rtol=1e-5), (ndoth, alpha)


def test_gtr1_matches_scalar_and_limit():
    for ndoth, alpha in [(0.9, 0.1), (0.5, 0.5), (0.8, 0.25)]:
        a2 = alpha * alpha
        t = 1 + (a2 - 1) * ndoth * ndoth
        expect = (a2 - 1) / (math.pi * math.log(a2) * t)
        got = float(mf.gtr1(jnp.float32(ndoth), jnp.float32(alpha)))
        assert np.isclose(got, expect, rtol=1e-4)
    # alpha >= 1 returns 1/pi (glsl:432)
    assert np.isclose(float(mf.gtr1(jnp.float32(0.5), jnp.float32(1.0))),
                      1.0 / math.pi, rtol=1e-6)


def test_gtr2_integrates_to_one():
    """D is a normalized NDF: integral of D(h) cos(theta) over the
    hemisphere equals 1."""
    n = 400
    theta = (np.arange(n) + 0.5) / n * (np.pi / 2)
    for alpha in (0.1, 0.3, 0.8):
        d = np.asarray(mf.gtr2(jnp.cos(jnp.asarray(theta, jnp.float32)),
                               jnp.float32(alpha)))
        integrand = d * np.cos(theta) * np.sin(theta) * 2 * np.pi
        total = integrand.sum() * (np.pi / 2 / n)
        assert abs(total - 1.0) < 2e-2, (alpha, total)


def test_smith_g_ggx():
    for ndotv, ag in [(0.8, 0.2), (0.3, 0.5), (0.99, 0.05)]:
        a = ag * ag
        b = ndotv * ndotv
        expect = 2 * ndotv / (ndotv + math.sqrt(a + b - a * b))
        got = float(mf.smith_g_ggx(jnp.float32(ndotv), jnp.float32(ag)))
        assert np.isclose(got, expect, rtol=1e-5)


def test_schlick_fresnel():
    assert np.isclose(float(mf.schlick_fresnel(jnp.float32(1.0))), 0.0)
    assert np.isclose(float(mf.schlick_fresnel(jnp.float32(0.0))), 1.0)
    assert np.isclose(float(mf.schlick_fresnel(jnp.float32(0.5))), 0.5 ** 5)


def test_dielectric_fresnel():
    # normal incidence, air->glass eta = 1/1.5: F0 = ((1-eta)/(1+eta))^2
    eta = 1.0 / 1.5
    f0 = ((1 - eta) / (1 + eta)) ** 2
    got = float(mf.dielectric_fresnel(jnp.float32(1.0), jnp.float32(eta)))
    assert np.isclose(got, f0, rtol=1e-4)
    # grazing -> 1
    got = float(mf.dielectric_fresnel(jnp.float32(1e-4), jnp.float32(eta)))
    assert got > 0.98
    # total internal reflection: eta > 1 and shallow angle
    got = float(mf.dielectric_fresnel(jnp.float32(0.2), jnp.float32(1.5)))
    assert got == 1.0


def test_tint_and_spec_color():
    base = jnp.array([0.5, 0.25, 0.125])
    tint = np.asarray(mf.calculate_tint(base))
    lum = float(mf.luminance(base))
    assert np.allclose(tint, np.asarray(base) / lum, rtol=1e-5)

    # metallic=1 -> specCol == baseColor
    spec, sheen = mf.spec_and_sheen_color(
        base, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0),
        jnp.float32(1 / 1.5))
    assert np.allclose(np.asarray(spec), np.asarray(base), atol=1e-6)
    # sheenTint=0 -> sheen color white
    assert np.allclose(np.asarray(sheen), 1.0, atol=1e-6)


def test_gtr2_aniso_reduces_to_iso():
    """With ax == ay == alpha, anisotropic GGX equals isotropic GGX."""
    alpha = 0.3
    ndoth = 0.8
    s = math.sqrt(1 - ndoth * ndoth)
    hx, hy = s * 0.6, s * 0.8
    iso = float(mf.gtr2(jnp.float32(ndoth), jnp.float32(alpha)))
    aniso = float(mf.gtr2_aniso(jnp.float32(ndoth), jnp.float32(hx),
                                jnp.float32(hy), jnp.float32(alpha),
                                jnp.float32(alpha)))
    assert np.isclose(iso, aniso, rtol=1e-4)
