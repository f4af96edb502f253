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


def _write_hdr(path, header_res, payload):
    with open(path, "wb") as fh:
        fh.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        fh.write(header_res)
        fh.write(payload)


def test_load_old_style_rle(tmp_path):
    """Old-format scanlines: (1,1,1,count) markers repeat the previous
    pixel, with consecutive markers shifting count by 8 bits
    (hdrloader.cpp:160-190 oldDecrunch)."""
    w, h = 12, 2
    # row 0: pixel A, then a run of 11 copies via marker (1,1,1,11)
    a = bytes([10, 20, 30, 130])
    row0 = a + bytes([1, 1, 1, 11])
    # row 1: pixel B, run of 4, pixel C, then 6 more of C via marker
    b = bytes([40, 50, 60, 129])
    c = bytes([70, 80, 90, 128])
    row1 = b + bytes([1, 1, 1, 4]) + c + bytes([1, 1, 1, 6])
    _write_hdr(tmp_path / "old.hdr", f"-Y {h} +X {w}\n".encode(),
               row0 + row1)
    img = load_hdr(str(tmp_path / "old.hdr"))
    assert img.shape == (h, w, 3)

    def rgbe(q):
        e = q[3]
        s = np.ldexp(1.0, e - 136) if e > 0 else 0.0
        return np.asarray(list(q[:3]), np.float32) * s

    np.testing.assert_allclose(img[0], np.tile(rgbe(a), (w, 1)), rtol=1e-6)
    want1 = [rgbe(b)] * 5 + [rgbe(c)] * 7
    np.testing.assert_allclose(img[1], np.asarray(want1), rtol=1e-6)


def test_load_old_style_literal_first_pixel(tmp_path):
    """A row starting with byte 2 that is not a new-style header decodes
    its first quad literally, then continues old-style
    (hdrloader.cpp:126-139)."""
    w, h = 8, 1
    first = bytes([2, 9, 9, 131])       # g != 2 -> literal pixel
    row = first + bytes([1, 1, 1, 7])   # then 7 repeats
    _write_hdr(tmp_path / "lit.hdr", f"-Y {h} +X {w}\n".encode(), row)
    img = load_hdr(str(tmp_path / "lit.hdr"))
    s = np.ldexp(1.0, 131 - 136)
    np.testing.assert_allclose(
        img[0], np.tile(np.asarray([2, 9, 9], np.float32) * s, (w, 1)),
        rtol=1e-6)


def test_env_sample_nearest_unbiased():
    """MC estimate of the environment's total radiance through the NEE
    sampler must match the direct texel sum — the invariant the round-1
    xi-addressed pdf fetch broke (ADVICE.md round 1, high)."""
    from opengl_ray_tracing_framework_tpu.models.hdr import build_env_fetch

    hdr = make_gradient_hdr(64, 32)
    h, w = hdr.shape[:2]
    cache = build_hdr_cache(hdr)
    fetch = jnp.asarray(build_env_fetch(hdr, cache))

    n = 1 << 16
    pid = jnp.arange(n, dtype=jnp.uint32)
    xi1, xi2 = rand01(pid, 0, 0), rand01(pid, 0, 1)

    # truth: per-texel solid angle uses the same sin(pi * y_idx/H) Jacobian
    # discretization as the sampler's pdf conversion
    rows = np.arange(h) / h
    d_omega = 2.0 * np.pi ** 2 * np.sin(np.pi * rows) / (w * h)
    truth = (hdr * d_omega[:, None, None]).sum(axis=(0, 1))

    for angle in (0.0, 0.37):
        d, pdf, rad_fused = envmap.env_sample_nearest(fetch, h, w, xi1, xi2,
                                                      jnp.float32(angle))
        # the radiance fused into the sample row must match a radiance
        # lookup along the returned direction (same texel by construction;
        # the direction->uv->texel float round trip can land on a
        # neighboring texel for ~1% of samples, hence the loose rtol — the
        # fused value is the self-consistent one)
        rad = envmap.env_radiance_nearest(fetch, h, w, d,
                                          jnp.float32(angle))
        np.testing.assert_allclose(np.asarray(rad_fused), np.asarray(rad),
                                   rtol=2e-4)
        est = np.asarray(rad_fused / pdf[:, None]).mean(axis=0)
        np.testing.assert_allclose(est, truth, rtol=0.05)
