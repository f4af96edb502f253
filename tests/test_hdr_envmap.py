"""HDR cache + environment sampling tests (Utility.h:33-131, glsl:625-646,
1173-1186)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from opengl_ray_tracing_framework_tpu.models.hdr import (
    build_hdr_cache,
    load_hdr,
    make_gradient_hdr,
)
from opengl_ray_tracing_framework_tpu.ops import envmap
from opengl_ray_tracing_framework_tpu.ops.sampling import rand01

REF_HDR = "/root/reference/resources/textures/hdr/peppermint_powerplant_1k.hdr"


def test_cache_shape_and_pdf_channel():
    hdr = make_gradient_hdr(32, 16)
    cache = build_hdr_cache(hdr)
    assert cache.shape == (16, 32, 3)
    lum = 0.2 * hdr[..., 0] + 0.7 * hdr[..., 1] + 0.1 * hdr[..., 2]
    pdf = lum / lum.sum()
    np.testing.assert_allclose(cache[..., 2], pdf, rtol=1e-4)
    assert (cache[..., 0] >= 0).all() and (cache[..., 0] <= 1).all()
    assert (cache[..., 1] >= 0).all() and (cache[..., 1] <= 1).all()


def test_inverse_cdf_prefers_bright_pixels():
    """Samples drawn through the cache must land on bright rows/cols with
    the right frequency: the +y pole of the gradient env is brightest."""
    hdr = make_gradient_hdr(64, 32, bright_dir=(0.0, 1.0, 0.0))
    cache = jnp.asarray(build_hdr_cache(hdr))
    n = 1 << 14
    pid = jnp.arange(n, dtype=jnp.uint32)
    d = np.asarray(envmap.sample_hdr_direction(
        cache, rand01(pid, 0, 0), rand01(pid, 0, 1)))
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3)
    # brightest direction is +y: mean y of importance samples must be
    # strongly positive
    assert d[:, 1].mean() > 0.3


def test_hdr_pdf_normalizes():
    """Monte-Carlo integral of the sampler pdf over the sphere must be 1."""
    hdr = make_gradient_hdr(64, 32)
    cache = jnp.asarray(build_hdr_cache(hdr))
    rng = np.random.default_rng(0)
    n = 1 << 14
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pdf = np.asarray(envmap.hdr_pdf(cache, jnp.asarray(d, jnp.float32),
                                    jnp.float32(0.0), 64, 32))
    integral = pdf.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.08, integral


def test_uv_roundtrip():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(100, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    u, v = envmap.to_spherical_uv(jnp.asarray(d, jnp.float32),
                                  jnp.float32(0.0))
    u, v = np.asarray(u), np.asarray(v)
    # invert: phi = 2pi(u - .5), theta = pi(0.5 - v)
    phi = 2 * np.pi * (u - 0.5)
    theta = np.pi * (0.5 - v)
    back = np.stack([np.cos(theta) * np.cos(phi), np.sin(theta),
                     np.cos(theta) * np.sin(phi)], axis=-1)
    np.testing.assert_allclose(back, d, atol=1e-4)


def test_env_angle_rotates():
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    u0, _ = envmap.to_spherical_uv(d, jnp.float32(0.0))
    u1, _ = envmap.to_spherical_uv(d, jnp.float32(0.25))
    assert np.isclose(float(u1[0] - u0[0]), 0.25, atol=1e-6)


def test_default_sky():
    up = np.asarray(envmap.default_sky_color(jnp.float32(1.0)))
    down = np.asarray(envmap.default_sky_color(jnp.float32(-1.0)))
    np.testing.assert_allclose(up, [0.5, 0.7, 1.0], atol=1e-6)
    np.testing.assert_allclose(down, [1.0, 1.0, 1.0], atol=1e-6)


def test_bilinear_lookup_interpolates():
    tex = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 4, 1))
    # u=0.25 lands exactly between the centers of col 0 and col 1 of row 0
    v = envmap.bilinear_lookup(tex, jnp.float32(0.25), jnp.float32(0.25))
    assert np.isclose(float(v[0]), 0.5, atol=1e-5)
    # at a texel center the lookup is exact
    v = envmap.bilinear_lookup(tex, jnp.float32(0.125), jnp.float32(0.25))
    assert np.isclose(float(v[0]), 0.0, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_HDR),
                    reason="reference assets not mounted")
def test_load_reference_hdr():
    img = load_hdr(REF_HDR)
    assert img.shape == (512, 1024, 3)
    assert img.dtype == np.float32
    assert (img >= 0).all()
    assert img.max() > 1.0          # HDR content
    assert 0.01 < img.mean() < 100.0
