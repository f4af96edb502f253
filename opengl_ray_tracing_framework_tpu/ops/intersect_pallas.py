"""Pallas TPU kernel: dense ray-tile x triangle-cluster intersection.

This replaces the reference's per-fragment BVH descent + hitTriangle loop
(fragment_shader_ray_tracing.glsl:241-299, 320-392) with the TPU-shaped
equivalent: rays arrive SORTED by candidate cluster id (ops.wavefront), so
each grid step intersects one tile of RAY_TILE rays against one cluster of
T triangles using

  - one MXU contraction per Moller-Trumbore output group
    (rayfeat (RAY_TILE, 16) @ trifeat (16, T); groups A/TN/U/V/E, see
    models/clusters.py for the derivation), and
  - a VPU epilogue for the hit test + per-ray min-reduction,

with zero per-lane gathers. Cluster blocks stream HBM->VMEM through the
automatic grid pipeline; the (grid g, grid j) layout revisits the same ray
tile for each of its <= J spanned clusters, accumulating into the same
output block while it stays resident in VMEM.

Epsilons and conventions match ops.intersect.ray_triangle exactly:
  t >= T_MIN before the 1e-5 pullback, parallel iff |A| <= E, strict
  interior test, inside = (d.n > 0) like glsl:256-259.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import INF, T_MIN

RAY_TILE = 1024          # rays per tile (8 sublanes x 128 lanes)
N_FEAT = 16              # ray feature vector width (10 used)
BEST_W = 8               # best-hit record width: [t, slot, inside, pad...]
EPS_ROW = 10             # trifeat row carrying E (models/clusters.py)

# MXU precision for the Moller-Trumbore contraction. HIGHEST restores
# ~1e-7 relative error on t via the f32 multi-pass decomposition (the v5e
# MXU multiplies in bf16 by default — ~2^-9 on t shows as
# self-intersection acne). Mosaic does not lower the 3-pass HIGH tier.
PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def ray_features(origin, direction):
    """(R, 16) f32 feature vector [o, d, o x d, 1, 0...] per ray."""
    oxd = jnp.cross(origin, direction)
    ones = jnp.ones(origin.shape[:-1] + (1,), origin.dtype)
    pad = jnp.zeros(origin.shape[:-1] + (N_FEAT - 10,), origin.dtype)
    return jnp.concatenate([origin, direction, oxd, ones, pad], axis=-1)


def init_best(n_rays: int):
    """Fresh best-hit record: t=INF, slot=-1, inside=0."""
    best = jnp.zeros((n_rays, BEST_W), jnp.float32)
    best = best.at[:, 0].set(INF)
    best = best.at[:, 1].set(-1.0)
    return best


def _kernel(spans_ref, nspan_ref, rayfeat_ref, best_in_ref, trifeat_ref,
            out_ref, *, t_blk: int, n_clusters: int, precision: str):
    g = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = best_in_ref[:]

    c = spans_ref[g, j]

    @pl.when(jnp.logical_and(j < nspan_ref[g], c < n_clusters))
    def _():
        rf = rayfeat_ref[:]                                   # (RT, 16)
        tf = trifeat_ref[0]                                   # (16, 4T)
        # One fused contraction over all four column groups: fewer kernel
        # launches than four 16-row dots (measured v5e).
        ft = jnp.dot(rf, tf, preferred_element_type=jnp.float32,
                     precision=PRECISIONS[precision])         # (RT, 4T)
        a = ft[:, 0:t_blk]                                    # d.n
        tn = ft[:, t_blk:2 * t_blk]                           # (p1-o).n
        u = ft[:, 2 * t_blk:3 * t_blk]                        # u*det
        v = ft[:, 3 * t_blk:4 * t_blk]                        # v*det
        eps = tf[EPS_ROW, 0:t_blk][None, :]                   # parallel thr

        not_par = jnp.abs(a) > eps
        # det = -A; s = sign(det); strict interior test in det-scaled form
        s = jnp.where(a > 0.0, -1.0, 1.0)
        us = u * s
        vs = v * s
        in_tri = (us > 0.0) & (vs > 0.0) & (us + vs < jnp.abs(a))
        t = tn / jnp.where(not_par, a, 1.0)
        valid = not_par & in_tri & (t >= T_MIN)
        tmat = jnp.where(valid, t - 1e-5, INF)                # (RT, T)

        tmin = jnp.min(tmat, axis=1)                          # (RT,)
        hit_any = tmin < INF
        # winner lane: lowest index attaining tmin (exact: tmin is a value
        # of tmat). jnp.argmin lowering is avoided on purpose — an int
        # min-reduce is guaranteed on the VPU.
        lane = jax.lax.broadcasted_iota(jnp.int32, tmat.shape, 1)
        k = jnp.min(jnp.where(tmat <= tmin[:, None], lane, t_blk), axis=1)
        onehot = (lane == k[:, None]).astype(jnp.float32)
        a_win = jnp.sum(a * onehot, axis=1)

        best = out_ref[:]
        better = hit_any & (tmin < best[:, 0])
        slot = (c * t_blk + k).astype(jnp.float32)
        new_t = jnp.where(better, tmin, best[:, 0])
        new_slot = jnp.where(better, slot, best[:, 1])
        new_inside = jnp.where(better, (a_win > 0.0).astype(jnp.float32),
                               best[:, 2])
        out_ref[:] = jnp.concatenate(
            [new_t[:, None], new_slot[:, None], new_inside[:, None],
             best[:, 3:]], axis=1)


def cluster_intersect(rayfeat, best, spans, nspan, trifeat,
                      interpret: bool = False, precision: str = "highest"):
    """Intersect sorted rays against their tiles' spanned clusters.

    rayfeat: (R, 16) f32, R multiple of RAY_TILE, sorted by cluster key.
    best:    (R, 8) f32 current best-hit records (same order).
    spans:   (G, J) i32 cluster ids spanned by each tile (>=n_clusters
             entries are skipped).
    nspan:   (G,) i32 number of valid span entries.
    trifeat: (C, 16, 4T) f32 cluster matmul constants.
    Returns updated (R, 8) best records.
    """
    r = rayfeat.shape[0]
    assert r % RAY_TILE == 0, r
    g = r // RAY_TILE
    jspans = spans.shape[1]
    c, rows, cols = trifeat.shape
    assert rows == N_FEAT, rows
    t_blk = cols // 4
    assert spans.shape == (g, jspans), (spans.shape, g, jspans)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g, jspans),
        in_specs=[
            pl.BlockSpec((RAY_TILE, N_FEAT), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, BEST_W), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, rows, cols),
                lambda i, j, spans_ref, nspan_ref: (
                    jnp.clip(spans_ref[i, j], 0, c - 1), 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_TILE, BEST_W), lambda i, j, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_kernel, t_blk=t_blk, n_clusters=c,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, BEST_W), jnp.float32),
        # the best-hit record is read-modified-written in place: saves a
        # buffer and keeps XLA from promoting a second copy into VMEM
        input_output_aliases={3: 0},
        interpret=interpret,
    )(spans, nspan, rayfeat, best, trifeat)
