"""Scheduled-wavefront tracer vs the brute-force oracle.

The reference has no tests; its implicit oracle is "the converged image
looks right" (SURVEY.md §4). Here every scheduled hit must match
closest_hit_brute exactly (same epsilons) on randomized ray batches —
including a >= 100-cluster scene, the regime where round 1's fixed-K
wavefront silently lost hits (VERDICT.md round 1, item 2).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from opengl_ray_tracing_framework_tpu.models.bvh import build_bvh
from opengl_ray_tracing_framework_tpu.models.clusters import build_clusters
from opengl_ray_tracing_framework_tpu.models.scene import build_test_scene
from opengl_ray_tracing_framework_tpu.ops.intersect import (
    INF,
    closest_hit_brute,
)
from opengl_ray_tracing_framework_tpu.ops.schedule import (
    closest_hit_scheduled,
    cluster_tnear,
)
from opengl_ray_tracing_framework_tpu.utils.config import RenderConfig


@pytest.fixture(scope="module")
def scene():
    _, data = build_test_scene(n_sphere_subdiv=2)
    return data


@pytest.fixture(scope="module")
def many_cluster_scene():
    """>= 100 tiny clusters: the stress regime for the vote scheduler."""
    scene, _ = build_test_scene(n_sphere_subdiv=3)
    data = scene.build(cluster_size=8)
    assert data.cl_aabb_min.shape[0] >= 100, data.cl_aabb_min.shape
    return data


def random_rays(rng, n, spread=3.0):
    origin = np.asarray(rng.normal(0, spread, (n, 3)), np.float32)
    origin[:, 2] -= 1.0
    d = np.asarray(rng.normal(0, 1, (n, 3)), np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(origin), jnp.asarray(d)


def assert_matches_oracle(scene, hit, o, d, tri_agree=0.995):
    oracle = closest_hit_brute(o, d, scene.p1, scene.p2, scene.p3)
    got_hit = np.asarray(hit.tri >= 0)
    want_hit = np.asarray(oracle.tri >= 0)
    assert (got_hit == want_hit).all(), "hit/miss mismatch"
    both = got_hit & want_hit
    np.testing.assert_allclose(np.asarray(hit.t)[both],
                               np.asarray(oracle.t)[both],
                               rtol=1e-4, atol=1e-4)
    # same winning triangle except possible exact-tie duplicates
    same_tri = (np.asarray(hit.tri)[both] == np.asarray(oracle.tri)[both])
    assert same_tri.mean() >= tri_agree
    inside_g = np.asarray(hit.inside)[both][same_tri]
    inside_o = np.asarray(oracle.inside)[both][same_tri]
    assert (inside_g == inside_o).all()


def test_tnear_conservative(scene):
    """Any brute-force hit lies at t >= the entry distance of the cluster
    that owns the winning triangle (the prune's correctness condition)."""
    rng = np.random.default_rng(3)
    o, d = random_rays(rng, 256)
    oracle = closest_hit_brute(o, d, scene.p1, scene.p2, scene.p3)
    tn = np.asarray(cluster_tnear(o, d, scene.cl_aabb_min,
                                  scene.cl_aabb_max))
    slot2tri = np.asarray(scene.cl_slot2tri)
    t_blk = scene.cl_trifeat.shape[2] // 4
    tri2cl = np.full(scene.n_triangles, -1, np.int64)
    for s, tri in enumerate(slot2tri):
        if tri >= 0:
            tri2cl[tri] = s // t_blk
    hit = np.asarray(oracle.tri)
    t = np.asarray(oracle.t)
    for i in range(hit.shape[0]):
        if hit[i] >= 0:
            ci = tri2cl[hit[i]]
            assert tn[i, ci] < INF, i          # the owning cluster is visitable
            assert t[i] >= tn[i, ci] - 1e-3, i  # entry distance is conservative


@pytest.mark.parametrize("topk", [1, 2, 8])
def test_scheduled_matches_oracle(scene, topk):
    """Exact closest-hit parity for any top-K (K is a perf knob only)."""
    rng = np.random.default_rng(11)
    o, d = random_rays(rng, 2048)
    cfg = RenderConfig(sched_topk=topk, pallas_interpret=True)
    hit = closest_hit_scheduled(scene, o, d, cfg, interpret=True)
    assert_matches_oracle(scene, hit, o, d)


def test_scheduled_many_clusters(many_cluster_scene):
    scene = many_cluster_scene
    rng = np.random.default_rng(7)
    o, d = random_rays(rng, 2048)
    cfg = RenderConfig(pallas_interpret=True)
    hit = closest_hit_scheduled(scene, o, d, cfg, interpret=True)
    assert_matches_oracle(scene, hit, o, d)


def test_scheduled_inside_scene_rays(scene):
    """Rays starting inside the geometry (refraction paths)."""
    rng = np.random.default_rng(5)
    n = 512
    origin = np.asarray(rng.normal(0, 0.4, (n, 3)), np.float32)
    origin[:, 2] += 3.0   # inside the sphere at z=3
    d = np.asarray(rng.normal(0, 1, (n, 3)), np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(origin), jnp.asarray(d)
    cfg = RenderConfig(pallas_interpret=True)
    hit = closest_hit_scheduled(scene, o, d, cfg, interpret=True)
    assert_matches_oracle(scene, hit, o, d)


def test_scheduled_any_hit(many_cluster_scene):
    """any_hit agrees with the oracle on is_hit (its only contract)."""
    scene = many_cluster_scene
    rng = np.random.default_rng(13)
    o, d = random_rays(rng, 1024)
    cfg = RenderConfig(pallas_interpret=True)
    hit = closest_hit_scheduled(scene, o, d, cfg, any_hit=True,
                                interpret=True)
    oracle = closest_hit_brute(o, d, scene.p1, scene.p2, scene.p3)
    assert (np.asarray(hit.tri >= 0) == np.asarray(oracle.tri >= 0)).all()


def test_scheduled_mask(scene):
    """Masked lanes return a miss and do not perturb live lanes."""
    rng = np.random.default_rng(17)
    o, d = random_rays(rng, 512)
    mask = jnp.asarray(rng.random(512) < 0.5)
    cfg = RenderConfig(pallas_interpret=True)
    hit = closest_hit_scheduled(scene, o, d, cfg, mask=mask, interpret=True)
    full = closest_hit_scheduled(scene, o, d, cfg, interpret=True)
    m = np.asarray(mask)
    assert (np.asarray(hit.tri)[~m] == -1).all()
    assert (np.asarray(hit.t)[~m] == INF).all()
    assert (np.asarray(hit.tri)[m] == np.asarray(full.tri)[m]).all()


def test_cluster_structure(scene):
    """Clusters partition the triangle range and bound their triangles."""
    p1 = np.asarray(scene.p1)
    p2 = np.asarray(scene.p2)
    p3 = np.asarray(scene.p3)
    bvh = build_bvh(p1, p2, p3, leaf_size=8)
    # rebuild on the already-permuted arrays: perm must be identity-safe
    q1, q2, q3 = p1[bvh.perm], p2[bvh.perm], p3[bvh.perm]
    cs = build_clusters(bvh, q1, q2, q3, max_tris=64)
    n = p1.shape[0]
    covered = np.zeros(n, bool)
    for ci in range(cs.n_clusters):
        f, c = int(cs.first[ci]), int(cs.count[ci])
        assert c <= cs.block_tris
        assert not covered[f:f + c].any()
        covered[f:f + c] = True
        tri_min = np.minimum(np.minimum(q1[f:f + c], q2[f:f + c]),
                             q3[f:f + c]).min(0)
        tri_max = np.maximum(np.maximum(q1[f:f + c], q2[f:f + c]),
                             q3[f:f + c]).max(0)
        assert (tri_min >= cs.aabb_min[ci] - 1e-4).all()
        assert (tri_max <= cs.aabb_max[ci] + 1e-4).all()
    assert covered.all()
    # slot map covers every triangle exactly once
    slots = cs.slot2tri[cs.slot2tri >= 0]
    assert np.array_equal(np.sort(slots), np.arange(n))
