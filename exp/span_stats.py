"""Span-list statistics for realistic secondary-ray batches.

For primary / NEE-shadow / diffuse-bounce ray populations on loong-100k,
reports, per sweep tile size:
  - mean/median per-ray overlapped-cluster count (the lower bound on work)
  - mean per-tile span count (what the sweep actually does, pre-prune)
  - the looseness ratio tile_nspan / ray_overlap (1.0 = perfect sort)

This is pure jnp (no pallas), so it runs anywhere; the numbers motivate
the sweep tile size and sort key choices (ops/sweep.py).

Usage: [JAX_PLATFORMS=cpu] python exp/span_stats.py [n_rays]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from opengl_ray_tracing_framework_tpu import RenderConfig
from opengl_ray_tracing_framework_tpu.models.camera import Camera, pixel_uv
from opengl_ray_tracing_framework_tpu.models.scene import build_reference_scene
from opengl_ray_tracing_framework_tpu.ops.envmap import env_sample_nearest
from opengl_ray_tracing_framework_tpu.ops.intersect import INF, surface_attributes
from opengl_ray_tracing_framework_tpu.ops.sampling import onb, rand01
from opengl_ray_tracing_framework_tpu.ops.schedule import cluster_tnear
from opengl_ray_tracing_framework_tpu.ops.sweep import _sort_key
from opengl_ray_tracing_framework_tpu.ops.traverse import closest_hit

R = int(sys.argv[1]) if len(sys.argv) > 1 else 131072

_, scene = build_reference_scene(objects=("floor", "loong"))
C = scene.cl_aabb_min.shape[0]
print(f"scene: {scene.n_triangles} tris, {C} clusters", flush=True)

W, H = 1024, 512
cfg = RenderConfig(width=W, height=H, max_bounce=8)
cam = Camera.make(aspect=W / H)
u, v = pixel_uv(W, H)
o_all, d_all = cam.generate_rays(u, v)
# evenly-strided pixels: a representative population (the first R pixels
# would be the top image rows = mostly sky)
sel = jnp.linspace(0, W * H - 1, R).astype(jnp.int32)
o, d = o_all[sel], d_all[sel]
pid = sel.astype(jnp.uint32)

hit = jax.block_until_ready(closest_hit(scene, o, d, cfg))
alive = hit.tri >= 0
from opengl_ray_tracing_framework_tpu.ops.integrator import PathState
st = PathState(origin=o, direction=d, t=hit.t, tri=hit.tri,
               inside=hit.inside, history=jnp.ones_like(o),
               lo=jnp.zeros_like(o), alive=alive)
hp, n, vdir, mat = surface_attributes(scene, st)

# NEE shadow directions (env importance sample)
hh, ww = scene.hdr_map.shape[0], scene.hdr_map.shape[1]
xl1 = rand01(pid, jnp.int32(1), 0)
xl2 = rand01(pid, jnp.int32(1), 1)
sdir, _, _ = env_sample_nearest(scene.env_fetch, hh, ww, xl1, xl2,
                             scene.env_angle)

# cosine-hemisphere bounce directions around the shading normal
z1 = rand01(pid, jnp.int32(2), 0)
z2 = rand01(pid, jnp.int32(2), 1)
r_ = jnp.sqrt(z1)
phi = 2 * jnp.pi * z2
tb, bb = onb(n)
bdir = (tb * (r_ * jnp.cos(phi))[:, None]
        + bb * (r_ * jnp.sin(phi))[:, None]
        + n * jnp.sqrt(jnp.maximum(1 - z1, 0.0))[:, None])

def stats(name, oo, dd, mask):
    tn = cluster_tnear(oo, dd, scene.cl_aabb_min, scene.cl_aabb_max)
    tn = jnp.where(mask[:, None], tn, INF)
    key = _sort_key(tn, dd, mask)
    perm = jax.lax.sort((key, jnp.arange(R, dtype=jnp.int32)), num_keys=1)[1]
    tn = jnp.take(tn, perm, axis=0)
    mm = mask[perm]
    per_ray = np.asarray(jnp.sum(tn < INF, axis=1))
    live = np.asarray(mm)
    pr = per_ray[live]
    print(f"\n[{name}] live {live.sum()}/{R}; per-ray overlap "
          f"mean {pr.mean():.1f} median {np.median(pr):.0f} "
          f"p95 {np.percentile(pr, 95):.0f}")
    for tile_r in (128, 256, 512, 1024):
        g = R // tile_r
        tile_tn = np.asarray(tn.reshape(g, tile_r, C).min(axis=1))
        nspan = (tile_tn < INF).sum(axis=1)
        total = nspan.sum()
        print(f"  tile_r={tile_r:5d}: tile nspan mean {nspan.mean():7.1f} "
              f"sum {total:8d} looseness x{total * tile_r / max(pr.sum(), 1):.1f}")


stats("primary", o, d, jnp.ones((R,), bool))
stats("shadow NEE", hp, sdir, alive)
stats("diffuse bounce", hp, bdir, alive)
