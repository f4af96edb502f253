"""Swept span-list closest hit: the single-kernel TPU traversal.

The reference resolves a closest hit by walking the BVH per fragment with a
stack (hitBVH, fragment_shader_ray_tracing.glsl:338-392). ops.schedule
re-shaped that into rounds of (vote, elect top-K, dense intersect) — exact,
but each round pays a host-visible while_loop step, a (R, C) candidate
argmin, a (R, C) one-hot vote and a fresh pallas dispatch; incoherent NEE
shadow batches take dozens of rounds (~3.3 s per 131k-ray cast measured on
v5e — 26 of 30 seconds of a full 1024x512x8 pass).

This module collapses the whole traversal into ONE pallas kernel:

  host (jnp, fused):
    1. tile_tn[g, c] = min over the tile's rays of the ray-cluster AABB
       entry distance (INF where no overlap) — one fused slab+reduce,
    2. per-tile span list = cluster ids sorted by tile_tn, ascending;
       nspan = number of overlapped clusters (tiles of masked-off rays
       get nspan = 0 and cost nothing).

  kernel (grid = one step per ray tile):
    a lax.while_loop over the tile's span list, double-buffering each
    cluster's (16, 5T) triangle-feature block HBM -> VMEM with manual
    DMA while the MXU intersects the previous one (models/clusters.py
    derivation), and stopping at the first span whose entry distance
    exceeds every live ray's current pruning bound.

Two measures keep incoherent (bounce/NEE shadow) batches off the
everything-overlaps-everything cliff:

  * rays are SORTED before tiling — rays that trace nothing (masked off,
    or overlapping zero clusters: the measured MAJORITY of bounce rays
    escape to the environment) last, live rays by (nearest candidate
    cluster, quantized direction) — so each tile's span list approaches
    the per-ray candidate lists (measured mean 1.2 clusters/ray on
    loong-100k secondary batches, exp/span_stats.py) and trace-nothing
    tiles get nspan = 0 and cost nothing. The permutation is inverted on
    the way out, so callers see original order.
  * each ray carries a static personal bound cap = nextafter(max finite
    cluster-entry distance): a ray can never need a span whose tile entry
    distance exceeds the entry distance of its own farthest overlapped
    cluster, so rays that miss everything stop extending the sweep once
    their own candidate list is exhausted (previously one miss ray forced
    the tile through every overlapped cluster).

Exactness: spans are visited in conservative nearest-first order; the
sweep stops only when the next span's tile-min entry distance is >= every
ray's min(best_t, cap). tile_tnear(s) <= tn[ray, s] for every ray, so a
skipped span satisfies, per ray, either tn >= best_t (cannot improve the
hit — the same reasoning as bvh_closest_hit's `d < best.t` early-out, an
added exact optimization over the reference hitBVH, glsl:338-392, which
pushes every child with d > 0) or tn > its farthest finite entry distance
(the ray does not overlap the cluster at all). Every ray intersects every
triangle of every visited cluster (dense tiles), so the result equals the
brute-force closest hit. any_hit=True (NEE shadow rays) additionally
drops rays from the stop test once they have any hit, which ends the
sweep as soon as every live ray is occluded or out of candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, INF, T_MIN
from .intersect_pallas import (
    BEST_W,
    EPS_ROW,
    N_FEAT,
    PRECISIONS,
    RAY_TILE,
    ray_features,
)
from .schedule import cluster_tnear

_DEAD_KEY = 1 << 30   # sort key for lanes that trace nothing


def _sort_key(tn, direction, mask):
    """Coherence sort key from the slab test itself.

    Major: the ray's NEAREST candidate cluster (argmin of its cluster
    entry distances) — rays that will sweep the same spans first end up in
    the same tile, and cluster ids are BVH in-order so adjacent ids are
    spatially adjacent treelets. Minor: 7-bit quantized direction.
    Rays with NO candidates (measured: the majority of bounce rays — they
    escape to the environment) get _DEAD_KEY and compact into trailing
    tiles with nspan = 0 that cost nothing. lax.sort is stable, so
    pixel-block order survives within equal keys."""
    ncand = jnp.sum(tn < INF, axis=1)
    nearest = jnp.argmin(tn, axis=1).astype(jnp.int32)
    phi = jnp.arctan2(direction[:, 2], direction[:, 0])
    kphi = jnp.clip(((phi * (0.5 / jnp.pi) + 0.5) * 16).astype(jnp.int32),
                    0, 15)
    kct = jnp.clip(((direction[:, 1] * 0.5 + 0.5) * 8).astype(jnp.int32),
                   0, 7)
    key = nearest * 128 + kphi * 8 + kct
    return jnp.where(mask & (ncand > 0), key, _DEAD_KEY)


def _sweep_kernel(nspan_ref, spans_ref, tnear_ref, rayfeat_ref, best_in_ref,
                  trifeat_hbm, out_ref, buf, sems, *,
                  t_blk: int, any_hit: bool, tile_r: int, precision: str,
                  depth: int, mixed: bool = False, s_tiles: int = 1):
    # One grid step processes s_tiles logical ray tiles ("supertiling"):
    # the automatic block pipeline issues one DMA per operand per step,
    # and small-block DMAs cost ~5 us each on this part (a bare copy
    # kernel with (128, x) blocks runs at ~27 us/step regardless of
    # content, exp/grid_overhead.py) — so fewer, larger block transfers
    # amortize the fixed cost s_tiles-fold while each logical tile keeps
    # its own span list, prune bound and while_loop.
    step = pl.program_id(0)
    out_ref[:] = best_in_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_r, t_blk), 1)

    def make_tile(st):
        limit = nspan_ref[step * s_tiles + st]
        spans_row = spans_ref[0, st][None, :]       # (1, C) i32 in VMEM
        tnear_row = tnear_ref[0, st][None, :]       # (1, C) f32 in VMEM
        iota_c = jax.lax.broadcasted_iota(jnp.int32, spans_row.shape, 1)

        def span_id(j):
            # dynamic scalar extract from the VMEM row via one-hot reduce
            return jnp.sum(jnp.where(iota_c == j, spans_row, 0))

        def span_tnear(j):
            return jnp.sum(jnp.where(iota_c == j, tnear_row, 0.0))

        def dma(j):
            return pltpu.make_async_copy(
                trifeat_hbm.at[span_id(j)], buf.at[st, j % depth],
                sems.at[st, j % depth])

        return limit, span_id, span_tnear, dma

    tiles = [make_tile(st) for st in range(s_tiles)]

    # prologue for EVERY sub-tile up front: each sub-tile has its own
    # prefetch ring, so later sub-tiles' first cluster blocks stream in
    # while earlier sub-tiles compute — without this, every logical tile
    # pays its first DMA's full latency on the critical path (the
    # measured ~30 us/tile fixed cost that dominates incoherent casts).
    for st in range(s_tiles):
        limit, _, _, dma = tiles[st]
        for k in range(depth - 1):
            @pl.when(k < limit)
            def _(k=k, dma=dma):
                dma(k).start()

    for st in range(s_tiles):
        limit, span_id, span_tnear, dma = tiles[st]
        sl = slice(st * tile_r, (st + 1) * tile_r)
        rf = rayfeat_ref[sl, :]                     # (RT, 16)

        def body(carry, dma=dma, span_id=span_id, span_tnear=span_tnear,
                 rf=rf, sl=sl, limit=limit, st=st):
            j, _ = carry

            @pl.when(j + depth - 1 < limit)
            def _():
                dma(j + depth - 1).start()

            dma(j).wait()
            tf = buf[st, j % depth]                           # (16, 4T)
            # precision="highest": f32 multi-pass decomposition — the v5e
            # MXU multiplies in bf16 by default (~2^-9 relative error on
            # t — self-intersection acne).
            ft = jnp.dot(rf, tf, preferred_element_type=jnp.float32,
                         precision=PRECISIONS[precision])     # (RT, 4T)
            a = ft[:, 0:t_blk]                                # d.n
            tn = ft[:, t_blk:2 * t_blk]                       # (p1-o).n
            u = ft[:, 2 * t_blk:3 * t_blk]                    # u*det
            v = ft[:, 3 * t_blk:4 * t_blk]                    # v*det
            eps = tf[EPS_ROW, 0:t_blk][None, :]               # parallel thr

            not_par = jnp.abs(a) > eps
            s = jnp.where(a > 0.0, -1.0, 1.0)
            us = u * s
            vs = v * s
            in_tri = (us > 0.0) & (vs > 0.0) & (us + vs < jnp.abs(a))
            t = tn / jnp.where(not_par, a, 1.0)
            valid = not_par & in_tri & (t >= T_MIN)
            tmat = jnp.where(valid, t - 1e-5, INF)            # (RT, T)

            tmin = jnp.min(tmat, axis=1)                      # (RT,)
            hit_any = tmin < INF
            k = jnp.min(jnp.where(tmat <= tmin[:, None], lane, t_blk),
                        axis=1)
            onehot = (lane == k[:, None]).astype(jnp.float32)
            a_win = jnp.sum(a * onehot, axis=1)

            best = out_ref[sl, :]
            best_t = best[:, 0]
            better = hit_any & (tmin < best_t)
            slot = (span_id(j) * t_blk + k).astype(jnp.float32)
            new_t = jnp.where(better, tmin, best_t)
            new_slot = jnp.where(better, slot, best[:, 1])
            new_inside = jnp.where(better,
                                   (a_win > 0.0).astype(jnp.float32),
                                   best[:, 2])
            out_ref[sl, :] = jnp.concatenate(
                [new_t[:, None], new_slot[:, None], new_inside[:, None],
                 best[:, 3:]], axis=1)

            # stop when the next span's conservative entry distance
            # exceeds every live ray's pruning bound min(best_t, cap) —
            # cap (col 3) is the ray's own farthest finite cluster-entry
            # distance, so rays that miss everything stop mattering once
            # their candidate list is exhausted. masked rays carry
            # best_t = -INF and never extend the sweep; any-hit rays
            # retire once occluded. mixed mode reads a per-ray any-hit
            # flag (col 4) so one launch serves NEE shadow rays and
            # closest-hit bounce rays together.
            if mixed:
                anyflag = best[:, 4] > 0.5
                live_t = jnp.where(anyflag & (new_slot >= 0.0), -INF,
                                   new_t)
            elif any_hit:
                live_t = jnp.where(new_slot < 0.0, new_t, -INF)
            else:
                live_t = new_t
            live_t = jnp.minimum(live_t, best[:, 3])
            thresh = jnp.max(live_t)
            more = (j + 1 < limit) & (span_tnear(j + 1) < thresh)

            # retire in-flight prefetches when the prune ends the sweep
            for k in range(1, depth):
                @pl.when(~more & (j + k < limit))
                def _(k=k):
                    dma(j + k).wait()

            return j + 1, more

        jax.lax.while_loop(lambda c: c[1], body, (jnp.int32(0), limit > 0))


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret",
                                              "tile_r", "precision", "depth",
                                              "s_tiles"))
def _swept_impl(origin, direction, mask, cl_min, cl_max, trifeat, slot2tri,
                any_hit: bool, interpret: bool, tile_r: int = RAY_TILE,
                precision: str = "highest", depth: int = 8,
                anyhit_mask=None, s_tiles: int = 8):
    r_in = origin.shape[0]
    c = cl_min.shape[0]
    mixed = anyhit_mask is not None
    # supertile: s_tiles logical tiles per grid step (see _sweep_kernel);
    # shrink for small batches so the grid stays non-empty, and cap a
    # supertile at 1024 rays — Mosaic stack-allocates the unrolled
    # sub-tile bodies' temporaries, so bigger products blow the 16 MB
    # scoped VMEM (and large tiles don't need DMA amortization anyway)
    s_tiles = max(1, min(s_tiles, -(-r_in // tile_r), 1024 // tile_r))
    pad = (-r_in) % (tile_r * s_tiles)
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), origin.dtype)])
        direction = jnp.concatenate(
            [direction,
             jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], direction.dtype),
                      (pad, 1))])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
        if mixed:
            anyhit_mask = jnp.concatenate(
                [anyhit_mask, jnp.zeros((pad,), bool)])
    r = origin.shape[0]
    g = r // tile_r
    rows, cols = trifeat.shape[1], trifeat.shape[2]
    t_blk = cols // 4

    # 0. slab test (one fused ray x cluster pass), then the coherence
    # sort: rays that trace nothing — masked off OR overlapping zero
    # clusters — compact into trailing tiles with nspan = 0 that cost
    # nothing (wavefront compaction without dynamic shapes); live rays
    # group by (nearest candidate cluster, direction) so tile span lists
    # approach the per-ray candidate lists (see _sort_key).
    # The (R, C) slab matrix is consumed ONLY through per-ray reductions
    # (sort key, pruning cap) and the per-tile min — it is never gathered
    # or carried whole: permuted quantities are recomputed from the
    # permuted rays in a second streamed pass. XLA fuses both passes into
    # their reductions, so peak memory stays O(R + G*C) instead of
    # O(R*C) — at the bench's merged full-width cast that is the
    # difference between a 617 MB temp per switch branch (HBM OOM at 6
    # compaction buckets) and none.
    tn = cluster_tnear(origin, direction, cl_min, cl_max)     # (R, C)
    tn = jnp.where(mask[:, None], tn, INF)
    mask_in = mask
    sort_rays = g > 1
    if sort_rays:
        key = _sort_key(tn, direction, mask)
        perm = jax.lax.sort((key, jnp.arange(r, dtype=jnp.int32)),
                            num_keys=1)[1]
        origin = origin[perm]
        direction = direction[perm]
        mask = mask[perm]
        if mixed:
            anyhit_mask = anyhit_mask[perm]
        tn = cluster_tnear(origin, direction, cl_min, cl_max)  # streamed
        tn = jnp.where(mask[:, None], tn, INF)

    # 1. per-tile nearest-first span lists
    tile_tn = tn.reshape(g, tile_r, c).min(axis=1)            # (G, C)
    order = jnp.argsort(tile_tn, axis=1)
    tile_sorted = jnp.take_along_axis(tile_tn, order, axis=1)
    nspan = jnp.sum(tile_sorted < INF, axis=1).astype(jnp.int32)
    spans = order.astype(jnp.int32).reshape(g // s_tiles, s_tiles, c)
    tile_sorted = tile_sorted.reshape(g // s_tiles, s_tiles, c)

    # per-ray static pruning bound: a ray never needs a span whose entry
    # distance exceeds its own farthest finite cluster-entry distance
    # (nextafter: the bound itself must remain reachable — tn == cap)
    cap = jnp.nextafter(jnp.max(jnp.where(tn < INF, tn, -INF), axis=1), INF)

    rayfeat = ray_features(origin, direction)
    best = jnp.zeros((r, BEST_W), jnp.float32)
    # masked rays: best_t = -INF so they never receive hits or extend sweeps
    best = best.at[:, 0].set(jnp.where(mask, INF, -INF))
    best = best.at[:, 1].set(-1.0)
    best = best.at[:, 3].set(cap)
    if mixed:
        best = best.at[:, 4].set(anyhit_mask.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g // s_tiles,),
        in_specs=[
            # (G/S, S, C) with (1, S, C) blocks: the TPU block rule wants
            # the last two dims divisible by (8, 128) or equal to the
            # array's
            pl.BlockSpec((1, s_tiles, c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # spans rows
            pl.BlockSpec((1, s_tiles, c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # tnear rows
            pl.BlockSpec((s_tiles * tile_r, N_FEAT), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_tiles * tile_r, BEST_W), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),                # trifeat (HBM)
        ],
        out_specs=pl.BlockSpec((s_tiles * tile_r, BEST_W),
                               lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # one prefetch ring per sub-tile (see _sweep_kernel prologue)
            pltpu.VMEM((s_tiles, depth, rows, cols), jnp.float32),
            pltpu.SemaphoreType.DMA((s_tiles, depth)),
        ],
    )

    kernel = functools.partial(_sweep_kernel, t_blk=t_blk, any_hit=any_hit,
                               tile_r=tile_r, precision=precision,
                               depth=depth, mixed=mixed, s_tiles=s_tiles)
    best = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, BEST_W), jnp.float32),
        input_output_aliases={4: 0},     # best (arg 4 incl. scalar prefetch)
        interpret=interpret,
    )(nspan, spans, tile_sorted, rayfeat, best, trifeat)

    if sort_rays:   # restore original ray order
        _, t_all, slot_all, inside_all = jax.lax.sort(
            (perm, best[:, 0], best[:, 1], best[:, 2]), num_keys=1)
    else:
        t_all, slot_all, inside_all = best[:, 0], best[:, 1], best[:, 2]

    m = mask_in[:r_in]
    t = jnp.where(m, t_all[:r_in], INF)
    slot = jnp.where(m, slot_all[:r_in].astype(jnp.int32), -1)
    inside = m & (inside_all[:r_in] > 0.5)
    tri = jnp.where(slot >= 0,
                    slot2tri[jnp.clip(slot, 0, slot2tri.shape[0] - 1)], -1)
    return Hit(t=t, tri=tri, inside=inside)


def closest_hit_swept_pair(scene, o_any, d_any, m_any, o_cls, d_cls, m_cls,
                           config, interpret: bool = False):
    """NEE shadow (any-hit) + bounce (closest-hit) rays in ONE launch.

    The two per-bounce casts of the integrator share everything but the
    any-hit early-out: merging them halves the per-cast fixed costs (one
    coherence sort, one slab pass, one kernel dispatch) and lets the
    kernel interleave both populations' tiles. The kernel reads a per-ray
    any-hit flag (best col 4, `mixed=True`). Returns (hit_any, hit_cls)
    in the callers' original orders; exactness is per-ray, identical to
    two separate casts."""
    w = o_any.shape[0]
    origin = jnp.concatenate([o_any, o_cls])
    direction = jnp.concatenate([d_any, d_cls])
    mask = jnp.concatenate([m_any, m_cls])
    anyhit_mask = jnp.concatenate(
        [jnp.ones((w,), bool), jnp.zeros((o_cls.shape[0],), bool)])
    hit = _swept_impl(
        origin, direction, mask,
        scene.cl_aabb_min, scene.cl_aabb_max,
        scene.cl_trifeat, scene.cl_slot2tri,
        any_hit=False, interpret=interpret,
        tile_r=config.sweep_tile_secondary,
        precision=config.mxu_precision,
        depth=config.sweep_prefetch_depth,
        anyhit_mask=anyhit_mask,
        s_tiles=config.sweep_supertile)
    head = Hit(t=hit.t[:w], tri=hit.tri[:w], inside=hit.inside[:w])
    tail = Hit(t=hit.t[w:], tri=hit.tri[w:], inside=hit.inside[w:])
    return head, tail


def closest_hit_swept(scene, origin, direction, config, mask=None,
                      any_hit: bool = False, interpret: bool = False,
                      secondary: bool = False) -> Hit:
    """Swept span-list closest (or any) hit against the scene clusters.

    Exact closest-hit semantics of hitBVH (glsl:338-392); see module
    docstring for the sweep argument. mask=False lanes return a miss.
    secondary: incoherent bounce/shadow batch — uses the smaller
    config.sweep_tile_secondary kernel tile (tighter span unions); a pure
    performance hint, never affects results.
    """
    if mask is None:
        mask = jnp.ones(origin.shape[:1], bool)
    return _swept_impl(
        origin, direction, mask,
        scene.cl_aabb_min, scene.cl_aabb_max,
        scene.cl_trifeat, scene.cl_slot2tri,
        any_hit=any_hit, interpret=interpret,
        tile_r=(config.sweep_tile_secondary if secondary
                else config.sweep_tile),
        precision=config.mxu_precision,
        depth=config.sweep_prefetch_depth,
        s_tiles=config.sweep_supertile)
