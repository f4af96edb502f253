"""Swept span-list tracer (ops/sweep.py) vs the brute-force oracle.

Same oracle contract as test_schedule.py: every swept hit must match
closest_hit_brute (same epsilons) on randomized ray batches, including the
>= 100-cluster regime that broke round 1's fixed-K wavefront. Runs the
kernel in interpret mode on CPU; tests/test_tpu.py repeats the parity on
hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from opengl_ray_tracing_framework_tpu.models.scene import build_test_scene
from opengl_ray_tracing_framework_tpu.ops.intersect import (
    INF,
    closest_hit_brute,
)
from opengl_ray_tracing_framework_tpu.ops.sweep import closest_hit_swept
from opengl_ray_tracing_framework_tpu.utils.config import RenderConfig

from test_schedule import assert_matches_oracle, random_rays


@pytest.fixture(scope="module")
def scene():
    _, data = build_test_scene(n_sphere_subdiv=2)
    return data


@pytest.fixture(scope="module")
def many_cluster_scene():
    scene, _ = build_test_scene(n_sphere_subdiv=3)
    data = scene.build(cluster_size=8)
    assert data.cl_aabb_min.shape[0] >= 100, data.cl_aabb_min.shape
    return data


def test_swept_matches_oracle(scene):
    rng = np.random.default_rng(11)
    o, d = random_rays(rng, 2048)
    cfg = RenderConfig(pallas_interpret=True)
    hit = closest_hit_swept(scene, o, d, cfg, interpret=True)
    assert_matches_oracle(scene, hit, o, d)


def test_swept_many_clusters(many_cluster_scene):
    scene = many_cluster_scene
    rng = np.random.default_rng(7)
    o, d = random_rays(rng, 2048)
    cfg = RenderConfig(pallas_interpret=True)
    hit = closest_hit_swept(scene, o, d, cfg, interpret=True)
    assert_matches_oracle(scene, hit, o, d)


def test_swept_inside_scene_rays(scene):
    rng = np.random.default_rng(5)
    n = 512
    origin = np.asarray(rng.normal(0, 0.4, (n, 3)), np.float32)
    origin[:, 2] += 3.0
    d = np.asarray(rng.normal(0, 1, (n, 3)), np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(origin), jnp.asarray(d)
    cfg = RenderConfig(pallas_interpret=True)
    hit = closest_hit_swept(scene, o, d, cfg, interpret=True)
    assert_matches_oracle(scene, hit, o, d)


def test_swept_any_hit(many_cluster_scene):
    scene = many_cluster_scene
    rng = np.random.default_rng(13)
    o, d = random_rays(rng, 1024)
    cfg = RenderConfig(pallas_interpret=True)
    hit = closest_hit_swept(scene, o, d, cfg, any_hit=True, interpret=True)
    oracle = closest_hit_brute(o, d, scene.p1, scene.p2, scene.p3)
    assert (np.asarray(hit.tri >= 0) == np.asarray(oracle.tri >= 0)).all()


def test_swept_mask(scene):
    rng = np.random.default_rng(17)
    o, d = random_rays(rng, 512)
    mask = jnp.asarray(rng.random(512) < 0.5)
    cfg = RenderConfig(pallas_interpret=True)
    hit = closest_hit_swept(scene, o, d, cfg, mask=mask, interpret=True)
    full = closest_hit_swept(scene, o, d, cfg, interpret=True)
    m = np.asarray(mask)
    assert (np.asarray(hit.tri)[~m] == -1).all()
    assert (np.asarray(hit.t)[~m] == INF).all()
    assert (np.asarray(hit.tri)[m] == np.asarray(full.tri)[m]).all()


def test_swept_render_matches_whileloop(scene):
    """End-to-end: a small render through the sweep dispatch equals the
    while-loop tracer's image (the full-integrator parity check)."""
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.render import render_radiance

    cam = Camera.make(position=(0.0, 0.5, -2.0), yaw=90.0, pitch=-8.0,
                      zoom=30.0, aspect=1.0)
    base = dict(width=24, height=24, max_bounce=3)
    img_sweep = render_radiance(
        scene, cam,
        RenderConfig(use_pallas=True, pallas_backend="sweep",
                     pallas_interpret=True, **base),
        spp=2, rays_per_tile=24 * 24)
    img_loop = render_radiance(
        scene, cam, RenderConfig(use_pallas=False, **base), spp=2,
        rays_per_tile=24 * 24)
    np.testing.assert_allclose(np.asarray(img_sweep), np.asarray(img_loop),
                               rtol=1e-3, atol=1e-3)
