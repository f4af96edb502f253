"""Differentiable pinhole camera.

Pytree replacement for the reference's FPS camera (src/core/Camera.h:26-175)
minus the input handling: pose is (position, yaw, pitch) plus a zoom
half-angle, and the ray-generation basis is *derived inside jit* so pixel
gradients w.r.t. the pose flow through ray generation.

Reference conventions reproduced:
- front = (cos(yaw)cos(pitch), sin(pitch), sin(yaw)cos(pitch)), right/up via
  world up (0,1,0) (updateCameraVectors, Camera.h:160-171),
- halfH = tan(radians(zoom)), halfW = halfH * aspect, leftBottomCorner =
  front - halfW*right - halfH*up (Camera.h:171-173),
- ray(u, v) = normalize(lbc + 2u*halfW*right + 2v*halfH*up) (glsl:1525-1527),
- defaults: position (0,0,7), rotation (-87.78, -14), zoom 30
  (RenderSettings.h:18-20, Camera.h:23).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Camera(NamedTuple):
    position: jax.Array   # (3,) float32
    yaw: jax.Array        # degrees, scalar float32 (Rotation.x)
    pitch: jax.Array      # degrees, scalar float32 (Rotation.y)
    zoom: jax.Array       # degrees, scalar float32 — vertical half-angle arg
    aspect: jax.Array     # width / height, scalar float32

    @staticmethod
    def make(position=(0.0, 0.0, 7.0), yaw=-87.78, pitch=-14.0, zoom=30.0,
             aspect=2.0) -> "Camera":
        f = lambda x: jnp.asarray(x, jnp.float32)
        return Camera(position=f(position), yaw=f(yaw), pitch=f(pitch),
                      zoom=f(zoom), aspect=f(aspect))

    def basis(self):
        """(front, right, up, half_w, half_h) — Camera.h:160-173."""
        yaw = jnp.deg2rad(self.yaw)
        pitch = jnp.deg2rad(self.pitch)
        cp = jnp.cos(pitch)
        front = jnp.stack(
            [jnp.cos(yaw) * cp, jnp.sin(pitch), jnp.sin(yaw) * cp])
        front = front / jnp.linalg.norm(front)
        world_up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
        right = jnp.cross(front, world_up)
        right = right / jnp.maximum(jnp.linalg.norm(right), 1e-12)
        up = jnp.cross(right, front)
        up = up / jnp.maximum(jnp.linalg.norm(up), 1e-12)
        half_h = jnp.tan(jnp.deg2rad(self.zoom))
        half_w = half_h * self.aspect
        return front, right, up, half_w, half_h

    def generate_rays(self, u, v):
        """Primary rays through film coords u, v in [0, 1] (glsl:1525-1527).

        u/v: (...,) arrays. Returns (origin (..., 3), direction (..., 3)).
        """
        front, right, up, half_w, half_h = self.basis()
        lbc = front - half_w * right - half_h * up
        d = (lbc[None, :]
             + (2.0 * u * half_w)[..., None] * right
             + (2.0 * v * half_h)[..., None] * up)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        origin = jnp.broadcast_to(self.position, d.shape)
        return origin, d


def pixel_uv(width: int, height: int, jitter_u=None, jitter_v=None):
    """Film coordinates for every pixel, row-major (R = H*W,).

    Pixel (x, y) with y=0 the *bottom* row (GL texture convention) maps to
    uv = ((x + .5)/W, (y + .5)/H) — the rasterized fragment coordinate the
    reference shades. Optional jitter arrays replace the .5 offsets.
    """
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    gx = jnp.tile(xs[None, :], (height, 1)).reshape(-1)
    gy = jnp.repeat(ys, width)
    ju = 0.5 if jitter_u is None else jitter_u
    jv = 0.5 if jitter_v is None else jitter_v
    return (gx + ju) / width, (gy + jv) / height
