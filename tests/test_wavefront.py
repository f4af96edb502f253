"""Sorted-wavefront tracer vs the brute-force oracle.

The reference has no tests; its implicit oracle is "the converged image
looks right" (SURVEY.md §4). Here every wavefront hit must match
closest_hit_brute exactly (same epsilons) on randomized ray batches.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from opengl_ray_tracing_framework_tpu.models.bvh import build_bvh
from opengl_ray_tracing_framework_tpu.models.clusters import (
    build_clusters,
    cut_clusters,
)
from opengl_ray_tracing_framework_tpu.models.scene import build_test_scene
from opengl_ray_tracing_framework_tpu.ops.intersect import (
    INF,
    closest_hit_brute,
)
from opengl_ray_tracing_framework_tpu.ops.wavefront import (
    closest_hit_wavefront,
    cull_topk,
)
from opengl_ray_tracing_framework_tpu.utils.config import RenderConfig


@pytest.fixture(scope="module")
def scene():
    _, data = build_test_scene(n_sphere_subdiv=2)
    return data


def random_rays(rng, n, spread=3.0):
    origin = np.asarray(rng.normal(0, spread, (n, 3)), np.float32)
    origin[:, 2] -= 1.0
    d = np.asarray(rng.normal(0, 1, (n, 3)), np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(origin), jnp.asarray(d)


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


def test_cull_topk_contains_hit_cluster(scene):
    """The cluster containing the brute-force hit appears among the
    candidates (when the hit exists)."""
    rng = np.random.default_rng(3)
    o, d = random_rays(rng, 256)
    oracle = closest_hit_brute(o, d, scene.p1, scene.p2, scene.p3)
    cand, tent = cull_topk(o, d, scene.cl_aabb_min, scene.cl_aabb_max,
                           k=scene.cl_aabb_min.shape[0])
    slot2tri = np.asarray(scene.cl_slot2tri)
    t_blk = scene.cl_trifeat.shape[2]
    # invert slot map: tri -> cluster
    tri2cl = np.full(scene.n_triangles, -1, np.int64)
    for s, tri in enumerate(slot2tri):
        if tri >= 0:
            tri2cl[tri] = s // t_blk
    hit = np.asarray(oracle.tri)
    candn = np.asarray(cand)
    for i in range(hit.shape[0]):
        if hit[i] >= 0:
            assert tri2cl[hit[i]] in candn[i], i


@pytest.mark.parametrize("rounds", [4, 8])
def test_wavefront_matches_oracle(scene, rounds):
    rng = np.random.default_rng(11)
    o, d = random_rays(rng, 2048)
    cfg = RenderConfig(wavefront_rounds=rounds, wavefront_spans=16,
                       pallas_interpret=True)
    wf = closest_hit_wavefront(scene, o, d, cfg, interpret=True)
    oracle = closest_hit_brute(o, d, scene.p1, scene.p2, scene.p3)

    wf_hit = np.asarray(wf.tri >= 0)
    or_hit = np.asarray(oracle.tri >= 0)
    assert (wf_hit == or_hit).mean() > 0.999, "hit/miss mismatch"
    both = wf_hit & or_hit
    t_w = np.asarray(wf.t)[both]
    t_o = np.asarray(oracle.t)[both]
    np.testing.assert_allclose(t_w, t_o, rtol=1e-4, atol=1e-4)
    # same triangle except possible exact-tie duplicates
    same_tri = (np.asarray(wf.tri)[both] == np.asarray(oracle.tri)[both])
    assert same_tri.mean() > 0.995
    inside_w = np.asarray(wf.inside)[both][same_tri]
    inside_o = np.asarray(oracle.inside)[both][same_tri]
    assert (inside_w == inside_o).all()


def test_wavefront_inside_scene_rays(scene):
    """Rays starting inside the geometry (refraction paths)."""
    rng = np.random.default_rng(5)
    n = 512
    origin = np.asarray(rng.normal(0, 0.4, (n, 3)), np.float32)
    origin[:, 2] += 3.0   # inside the sphere at z=3
    d = np.asarray(rng.normal(0, 1, (n, 3)), np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(origin), jnp.asarray(d)
    cfg = RenderConfig(wavefront_rounds=8, wavefront_spans=16,
                       pallas_interpret=True)
    wf = closest_hit_wavefront(scene, o, d, cfg, interpret=True)
    oracle = closest_hit_brute(o, d, scene.p1, scene.p2, scene.p3)
    both = np.asarray(wf.tri >= 0) & np.asarray(oracle.tri >= 0)
    assert (np.asarray(wf.tri >= 0) == np.asarray(oracle.tri >= 0)).all()
    np.testing.assert_allclose(np.asarray(wf.t)[both],
                               np.asarray(oracle.t)[both],
                               rtol=1e-4, atol=1e-4)
