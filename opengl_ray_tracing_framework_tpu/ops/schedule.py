"""Scheduled-wavefront closest hit: convergent cluster traversal for TPU.

The reference finds the closest hit by walking a per-ray BVH stack with
random node/triangle fetches (hitBVH, fragment_shader_ray_tracing
.glsl:338-392) — a pattern TPUs execute at gather speed (~0.7 Gelem/s
measured on v5e). This module reorganizes the search around dense VPU/MXU
work on the treelet clusters of models/clusters.py:

  round loop (lax.while_loop, runs until NO ray has a pending cluster):
    1. CANDIDATES (VPU, dense): slab-test every ray against every cluster
       AABB -> (R, C) entry distances; each ray's candidate is its nearest
       cluster that is not yet visited and not pruned by the current best
       hit (the `t_enter > best_t` cut of glsl:373-388).
    2. VOTE (VPU): each RAY_TILE-ray tile histograms its rays' candidates
       and elects the top-K most-wanted clusters.
    3. INTERSECT (MXU, Pallas): ops.intersect_pallas.cluster_intersect
       runs one dense ray-tile x cluster matmul per elected cluster and
       updates every ray's best hit (opportunistic: all rays in the tile
       test every elected cluster, not only the voters).
    4. MARK: elected clusters become `visited` for all rays of the tile.

Unlike a fixed-round scheme, nothing is ever dropped: a ray whose
candidate loses the vote simply re-votes next round, and each round
processes at least one new cluster per tile with pending rays, so the
loop terminates in at most C rounds (typically 3-10: candidates are
distance-ordered and the best-t prune kills most clusters after the
first hit).

Shadow rays pass any_hit=True: a ray stops voting as soon as it has *any*
hit, which resolves occlusion in ~1 round (the reference's shadow rays run
full closest-hit, glsl:1386).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .intersect import Hit, INF
from .intersect_pallas import (
    RAY_TILE,
    cluster_intersect,
    init_best,
    ray_features,
)


def cluster_tnear(origin, direction, cl_min, cl_max):
    """Conservative AABB entry distance of each ray to each cluster.

    Returns (R, C) float32: max(t_enter, 0) where the slab test passes
    (hitAABB semantics, glsl:303-316: visit iff t1 >= t0 and t1 > 0),
    INF where it misses. Axis-by-axis accumulation keeps temporaries at
    (R, C) instead of (R, C, 3).
    """
    r = origin.shape[0]
    c = cl_min.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12,
                          jnp.where(direction < 0, -1e-12, 1e-12), direction)
    t0 = jnp.full((r, c), -INF, jnp.float32)
    t1 = jnp.full((r, c), INF, jnp.float32)
    for ax in range(3):
        near = (cl_min[None, :, ax] - origin[:, None, ax]) * inv[:, None, ax]
        far = (cl_max[None, :, ax] - origin[:, None, ax]) * inv[:, None, ax]
        t0 = jnp.maximum(t0, jnp.minimum(near, far))
        t1 = jnp.minimum(t1, jnp.maximum(near, far))
    visit = (t1 >= t0) & (t1 > 0.0)
    return jnp.where(visit, jnp.maximum(t0, 0.0), INF)


def _direction_key(direction):
    """11-bit quantized direction (6b azimuth, 5b elevation) — the sort key
    that groups rays with similar candidate-cluster sets into the same
    tiles. Equal keys keep their original (pixel-block) order: lax.sort is
    stable, so coherent primary rays are left untouched."""
    phi = jnp.arctan2(direction[:, 2], direction[:, 0])
    kphi = jnp.clip(((phi * (0.5 / jnp.pi) + 0.5) * 64).astype(jnp.int32),
                    0, 63)
    kct = jnp.clip(((direction[:, 1] * 0.5 + 0.5) * 32).astype(jnp.int32),
                   0, 31)
    return kphi * 32 + kct


class _Carry(NamedTuple):
    best: jax.Array      # (R, 8) f32 best-hit records
    visited: jax.Array   # (R, C) bool clusters already tested for this ray
    has: jax.Array       # (R,) bool ray still has a pending candidate
    cand: jax.Array      # (R,) int32 its nearest pending cluster
    rounds: jax.Array    # scalar int32


@functools.partial(
    jax.jit, static_argnames=("top_k", "any_hit", "interpret", "precision"))
def _scheduled_impl(origin, direction, mask, cl_min, cl_max, trifeat,
                    slot2tri, top_k: int, any_hit: bool, interpret: bool,
                    precision: str = "highest"):
    r_in = origin.shape[0]
    c = cl_min.shape[0]
    pad = (-r_in) % RAY_TILE
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), origin.dtype)])
        direction = jnp.concatenate(
            [direction,
             jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], direction.dtype),
                      (pad, 1))])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    r = origin.shape[0]
    g = r // RAY_TILE
    k = min(top_k, c)

    # Sort rays by quantized direction so each tile's rays share candidate
    # clusters (a multi-tile batch of bounce/shadow rays is otherwise
    # direction-incoherent and every tile elects every cluster). One
    # 2-operand key sort + row gathers in, one 4-operand sort back out.
    mask_in = mask
    sort_rays = g > 1
    if sort_rays:
        key = jnp.where(mask, _direction_key(direction), 1 << 12)
        perm = jax.lax.sort((key.astype(jnp.int32),
                             jnp.arange(r, dtype=jnp.int32)), num_keys=1)[1]
        origin = origin[perm]
        direction = direction[perm]
        mask = mask[perm]

    rayfeat = ray_features(origin, direction)
    tnear = cluster_tnear(origin, direction, cl_min, cl_max)
    cluster_ids = jnp.arange(c, dtype=jnp.int32)

    def candidates(best, visited):
        pending = (~visited) & (tnear < best[:, 0:1]) & mask[:, None]
        if any_hit:
            pending &= (best[:, 1] < 0.0)[:, None]
        tkey = jnp.where(pending, tnear, INF)
        cmin = jnp.min(tkey, axis=1)
        has = cmin < INF
        cand = jnp.argmin(tkey, axis=1).astype(jnp.int32)
        return has, cand

    has0, cand0 = candidates(init_best(r), jnp.zeros((r, c), bool))
    init = _Carry(best=init_best(r), visited=jnp.zeros((r, c), bool),
                  has=has0, cand=cand0, rounds=jnp.int32(0))

    # Each round marks >= 1 new cluster visited for every tile that still
    # has pending rays, so C + 1 rounds is a hard correctness bound.
    max_rounds = c + 1

    def cond(carry):
        return jnp.any(carry.has) & (carry.rounds < max_rounds)

    def body(carry):
        # 2. per-tile vote over the carried candidates
        oh = carry.has[:, None] & (carry.cand[:, None] == cluster_ids[None])
        votes = oh.reshape(g, RAY_TILE, c).sum(axis=1)        # (G, C) i32
        counts, ids = jax.lax.top_k(votes, k)
        valid = counts > 0
        spans = jnp.where(valid, ids, c).astype(jnp.int32)    # (G, K)
        nspan = valid.sum(axis=1).astype(jnp.int32)           # (G,)

        # 3. dense MXU intersect of every tile against its elected clusters
        best = cluster_intersect(rayfeat, carry.best, spans, nspan, trifeat,
                                 interpret=interpret, precision=precision)

        # 4. elected clusters are now visited for every ray of the tile
        sched = jnp.any(
            (spans[:, :, None] == cluster_ids[None, None, :]) &
            valid[:, :, None], axis=1)                        # (G, C)
        visited = carry.visited | jnp.repeat(sched, RAY_TILE, axis=0)

        has, cand = candidates(best, visited)
        return _Carry(best=best, visited=visited, has=has, cand=cand,
                      rounds=carry.rounds + 1)

    final = jax.lax.while_loop(cond, body, init)
    best = final.best

    if sort_rays:   # restore original ray order
        _, t_all, slot_all, inside_all = jax.lax.sort(
            (perm, best[:, 0], best[:, 1], best[:, 2]), num_keys=1)
    else:
        t_all, slot_all, inside_all = best[:, 0], best[:, 1], best[:, 2]

    # masked lanes can pick up opportunistic tile hits — contract is a miss
    m = mask_in[:r_in]
    t = jnp.where(m, t_all[:r_in], INF)
    slot = jnp.where(m, slot_all[:r_in].astype(jnp.int32), -1)
    inside = m & (inside_all[:r_in] > 0.5)
    tri = jnp.where(slot >= 0,
                    slot2tri[jnp.clip(slot, 0, slot2tri.shape[0] - 1)], -1)
    return Hit(t=t, tri=tri, inside=inside)


def closest_hit_scheduled(scene, origin, direction, config,
                          mask=None, any_hit: bool = False,
                          interpret: bool = False) -> Hit:
    """Scheduled-wavefront closest (or any) hit against the scene clusters.

    mask: optional (R,) bool — lanes with mask=False are not traced and
    return a miss (integrators gate on their own alive mask anyway).
    any_hit: occlusion-only semantics — rays stop once any hit is found
    (the returned t/tri are then *a* hit, not necessarily the closest).
    """
    if mask is None:
        mask = jnp.ones(origin.shape[:1], bool)
    return _scheduled_impl(
        origin, direction, mask,
        scene.cl_aabb_min, scene.cl_aabb_max,
        scene.cl_trifeat, scene.cl_slot2tri,
        top_k=config.sched_topk, any_hit=any_hit, interpret=interpret,
        precision=config.mxu_precision)
