"""Bound the nearest-vs-bilinear environment-filtering deviation.

The reference samples the HDR map and cache with GL_LINEAR (texture() at
glsl:639-645, 1167); the fast integrators fetch the nearest texel from the
fused env_fetch table (ops/envmap.py, one row gather per site). This test
quantifies that documented deviation on the REAL peppermint HDR
(1024x512, the reference's default asset) instead of asserting it is
invisible:

- per-lookup radiance delta over uniformly random directions,
- the NEE estimator's integral: with nearest filtering, sample, pdf and
  radiance all belong to the same texel, so the estimator is exactly
  unbiased for the nearest-filtered environment — the image-level error
  is bounded by the radiance-lookup error measured here.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from opengl_ray_tracing_framework_tpu.models.hdr import (
    build_env_fetch,
    build_hdr_cache,
    load_hdr,
)
from opengl_ray_tracing_framework_tpu.ops.envmap import (
    env_radiance_nearest,
    hdr_color,
)

HDR_PATH = os.path.join(
    os.environ.get("ORTF_ASSETS", "/root/reference/resources"),
    "textures/hdr/peppermint_powerplant_1k.hdr")


@pytest.fixture(scope="module")
def peppermint():
    if not os.path.exists(HDR_PATH):
        pytest.skip(f"reference HDR asset not found: {HDR_PATH}")
    hdr = load_hdr(HDR_PATH)
    cache = build_hdr_cache(hdr)
    return hdr, build_env_fetch(hdr, cache)


def _random_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def test_nearest_vs_bilinear_radiance_delta(peppermint):
    hdr, env_fetch = peppermint
    h, w = hdr.shape[:2]
    assert (h, w) == (512, 1024)
    d = jnp.asarray(_random_dirs(65536))
    angle = jnp.float32(0.0)
    near = np.asarray(env_radiance_nearest(jnp.asarray(env_fetch), h, w, d,
                                           angle))
    bili = np.asarray(hdr_color(jnp.asarray(hdr), d, angle))
    lum = lambda c: 0.2126 * c[:, 0] + 0.7152 * c[:, 1] + 0.0722 * c[:, 2]
    ln, lb = lum(near), lum(bili)
    rel = np.abs(ln - lb) / np.maximum(lb, 1e-3)
    # Per-lookup deltas are texel-frequency noise (measured 2026-08-20 on
    # this asset: mean 8.5e-2, median 3.3e-2) — visible only as a slightly
    # different noise realization, not as structure.
    assert float(rel.mean()) < 0.15
    assert float(np.median(rel)) < 0.06
    # What a converged render actually sees is the *integrated* energy,
    # which matches to 0.1% (measured 9.6e-4):
    assert abs(ln.mean() - lb.mean()) / lb.mean() < 0.005


def test_nearest_nee_estimator_is_consistent(peppermint):
    """sample/pdf/radiance of env_sample_nearest come from one texel, so
    E[radiance/pdf] equals the sum of the (nearest-filtered) map exactly —
    the deviation does not bias the NEE estimator."""
    from opengl_ray_tracing_framework_tpu.ops.envmap import env_sample_nearest

    hdr, env_fetch = peppermint
    h, w = hdr.shape[:2]
    rng = np.random.default_rng(1)
    n = 1 << 18
    xi1 = jnp.asarray(rng.random(n, np.float32))
    xi2 = jnp.asarray(rng.random(n, np.float32))
    direction, pdf, fr = env_sample_nearest(
        jnp.asarray(env_fetch), h, w, xi1, xi2, jnp.float32(0.0))
    # Monte-Carlo estimate of the environment's total radiant exitance
    # integral(L dOmega) vs the exact quadrature of the discrete map
    est = np.asarray(
        (0.2126 * fr[:, 0] + 0.7152 * fr[:, 1] + 0.0722 * fr[:, 2])
        / jnp.maximum(pdf, 1e-12)).mean()
    th = (np.arange(h) + 0.5) / h * np.pi
    d_omega = (2 * np.pi / w) * (np.pi / h) * np.sin(th)[:, None]
    lumm = 0.2126 * hdr[..., 0] + 0.7152 * hdr[..., 1] + 0.0722 * hdr[..., 2]
    exact = float((lumm * d_omega).sum())
    assert abs(est - exact) / exact < 0.05
