"""Differentiable rendering across the device mesh.

The capability the reference only has interactively — edit a material, see
the re-render (ImGui loop, main.cpp:329-480 + RefreshTriangleMaterial) —
becomes reverse-mode AD: d(pixel loss)/d(material table). Pixels are
sharded like the forward pass; each device backprops its own rows and the
parameter gradients are `psum`'d over the ICI (scene parameters are
replicated, so the reduction is the only collective).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.camera import Camera
from ..utils.config import RenderConfig
from .sharding import _trace_rows


def render_rows_radiance(scene, camera, config, row0, n_rows, spp,
                         rays_per_tile=65536):
    """Mean radiance over spp samples for rows [row0, row0+n_rows)."""
    acc = jnp.zeros((n_rows, config.width, 3), jnp.float32)
    for s in range(spp):
        frame = jnp.int32(s + 1)
        sample = _trace_rows(scene, camera, frame, config, row0, n_rows,
                             rays_per_tile)
        acc = acc + (sample - acc) / (s + 1)
    return acc


def material_loss(materials, scene, camera, target_rows, config, row0,
                  n_rows, spp, rays_per_tile):
    scene = scene.with_materials(materials)
    img = render_rows_radiance(scene, camera, config, row0, n_rows, spp,
                               rays_per_tile)
    return jnp.sum((img - target_rows) ** 2)


def material_grad_sharded(scene, camera: Camera, target, config: RenderConfig,
                          mesh: Mesh, spp: int = 1, rays_per_tile: int = 65536):
    """(loss, grads) of sum((render - target)^2) w.r.t. the material table,
    with pixels sharded over `mesh` and gradients psum-reduced."""
    from jax import shard_map

    n_dev = mesh.devices.size
    if config.height % n_dev:
        raise ValueError("height must divide the mesh size")
    rows_per_dev = config.height // n_dev

    def device_block(scene, camera, target_block, dev_idx):
        row0 = dev_idx[0] * rows_per_dev
        loss, grads = jax.value_and_grad(material_loss, allow_int=True)(
            scene.materials, scene, camera, target_block, config, row0,
            rows_per_dev, spp, rays_per_tile)
        loss = jax.lax.psum(loss, "tiles")
        # No explicit psum for the grads: materials enter replicated (P()),
        # and differentiating a replicated primal inside shard_map already
        # psums the cotangents across the mesh (the transpose of the
        # implicit unvarying->varying cast). Each device's grad is the
        # global gradient.
        return loss, grads

    dev_ids = jnp.arange(n_dev, dtype=jnp.int32)
    fn = shard_map(
        device_block,
        mesh=mesh,
        in_specs=(P(), P(), P("tiles", None, None), P("tiles")),
        out_specs=(P(), P()),
    )
    return jax.jit(fn)(scene, camera, target, dev_ids)


@functools.partial(jax.jit, static_argnames=("config", "spp", "rays_per_tile"))
def material_grad(scene, camera: Camera, target, config: RenderConfig,
                  spp: int = 1, rays_per_tile: int = 65536):
    """Single-device (loss, grads) w.r.t. the material table."""
    loss, grads = jax.value_and_grad(material_loss, allow_int=True)(
        scene.materials, scene, camera, target, config, jnp.int32(0),
        config.height, spp, rays_per_tile)
    return loss, grads


@functools.partial(jax.jit, static_argnames=("config", "spp", "rays_per_tile"))
def camera_grad(scene, camera: Camera, target, config: RenderConfig,
                spp: int = 1, rays_per_tile: int = 65536):
    """Single-device (loss, grads) w.r.t. the camera pose pytree."""

    def loss_fn(cam):
        img = render_rows_radiance(scene, cam, config, jnp.int32(0),
                                   config.height, spp, rays_per_tile)
        return jnp.sum((img - target) ** 2)

    return jax.value_and_grad(loss_fn)(camera)


@functools.partial(jax.jit, static_argnames=("config", "spp", "rays_per_tile"))
def geometry_grad(scene, camera: Camera, target, config: RenderConfig,
                  spp: int = 1, rays_per_tile: int = 65536):
    """Single-device (loss, vertex_grads) w.r.t. the triangle vertices.

    Shading recomputes the hit distance and normal from the fused tri_attr
    table (ops.intersect.surface_attributes), so reverse-mode gradients
    w.r.t. vertex positions flow through the hit point, the shading normal
    and every downstream BSDF term. Traversal stays detached — silhouette
    (visibility) gradients are the documented bias of detached sampling
    (SURVEY.md §7).

    Returns (loss, grads) with grads shaped (3, 3, N): d loss / d p_k[axis]
    for vertex k of every leaf-ordered triangle.
    """

    def loss_fn(vertices):
        tri_attr = scene.tri_attr.at[0:9, :].set(
            vertices.reshape(9, -1))
        sc = scene._replace(tri_attr=tri_attr)
        img = render_rows_radiance(sc, camera, config, jnp.int32(0),
                                   config.height, spp, rays_per_tile)
        return jnp.sum((img - target) ** 2)

    vertices = scene.tri_attr[0:9, :].reshape(3, 3, -1)
    return jax.value_and_grad(loss_fn)(vertices)
