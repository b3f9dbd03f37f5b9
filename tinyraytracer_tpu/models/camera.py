"""Thin-lens camera with defocus blur.

Reproduces the reference camera exactly (camera.rs:16-71): viewport derived
from vertical fov + focus distance, orthonormal basis w = pos - look_at,
u = up x w, v = w x u, viewport origin at the *upper-left*, v axis flipped,
and defocus-disk depth of field. Ray generation is vectorized over the whole
pixel x sample grid (replacing the pointgen stage, renderer/pointgen.rs:38-51,
including its (width-1)/(height-1) jitter normalization).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from tinyraytracer_tpu.ops import rng


def _cross(a, b):
    return jnp.cross(a, b)


def _normalize(v):
    return v / jnp.linalg.norm(v)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """Precomputed camera frame. Width/height are static (Python ints)."""

    position: jax.Array           # (3,)
    viewport_upper_left: jax.Array  # (3,)
    forward: jax.Array            # (3,) = w * focus_distance
    horizontal: jax.Array         # (3,) = u * viewport_width
    vertical: jax.Array           # (3,) = v * viewport_height
    defocus_disk_u: jax.Array     # (3,)
    defocus_disk_v: jax.Array     # (3,)
    width: int = dataclasses.field(metadata=dict(static=True), default=0)
    height: int = dataclasses.field(metadata=dict(static=True), default=0)

    @staticmethod
    def new(
        focus_distance: float,
        defocus_angle: float,
        position: Tuple[float, float, float],
        look_at: Tuple[float, float, float],
        up: Tuple[float, float, float],
        vertical_fov: float,
        width: int,
        height: int,
    ) -> "Camera":
        """Same signature and math as Camera::new (camera.rs:16-56)."""
        position = jnp.asarray(position, jnp.float32)
        look_at = jnp.asarray(look_at, jnp.float32)
        up = jnp.asarray(up, jnp.float32)

        viewport_height = 2.0 * focus_distance * math.tan(math.radians(vertical_fov) / 2.0)
        aspect_ratio = width / height
        viewport_width = aspect_ratio * viewport_height

        w = _normalize(position - look_at)
        u = _normalize(_cross(up, w))
        v = _normalize(_cross(w, u))

        forward = w * focus_distance
        horizontal = u * viewport_width
        vertical = v * viewport_height
        viewport_upper_left = position - horizontal / 2.0 + vertical / 2.0 - forward

        defocus_radius = focus_distance * math.tan(math.radians(defocus_angle) / 2.0)
        return Camera(
            position=position,
            viewport_upper_left=viewport_upper_left,
            forward=forward,
            horizontal=horizontal,
            vertical=vertical,
            defocus_disk_u=u * defocus_radius,
            defocus_disk_v=v * defocus_radius,
            width=width,
            height=height,
        )

    def get_image_size(self) -> Tuple[int, int]:
        return (self.width, self.height)

    def get_ray(self, u, v, disk):
        """Rays through unit viewport coords (u, v) with defocus offsets.

        Vectorized Camera::get_ray (camera.rs:58-66): u/v are (...,) arrays,
        disk is (..., 2) points in the unit disk. Returns (origin, direction)
        with direction normalized at construction (ray.rs:13)."""
        origin = (
            self.position
            + disk[..., 0:1] * self.defocus_disk_u
            + disk[..., 1:2] * self.defocus_disk_v
        )
        target = (
            self.viewport_upper_left
            + u[..., None] * self.horizontal
            - v[..., None] * self.vertical
        )
        direction = target - origin
        direction = direction / jnp.sqrt(
            jnp.maximum(jnp.sum(direction * direction, -1, keepdims=True), 1e-24)
        )
        return origin, direction


def generate_rays(camera: Camera, pixel_id, sample_id, seed):
    """Jittered primary rays for flat pixel ids (replaces pointgen.rs:38-51).

    pixel_id: (R,) u32 flat indices y*width + x; sample_id: scalar or (R,).
    Jitter uses u = (x + r1)/(width-1), v = (y + r2)/(height-1) — the
    reference's off-by-one-friendly normalization — and the defocus disk draw
    of camera.rs:59-60.
    """
    w = jnp.uint32(camera.width)
    px = (pixel_id % w).astype(jnp.float32)
    py = (pixel_id // w).astype(jnp.float32)
    r1, r2, r3, r4 = rng.uniform4(seed, pixel_id, sample_id, jnp.uint32(0))
    # max(.., 1) guards 1-pixel-wide/tall images (the reference's (w-1)
    # normalization divides by zero there; pointgen.rs:41-42 never hits it
    # because its scenes are fixed-size).
    u = (px + r1) / jnp.float32(max(camera.width - 1, 1))
    v = (py + r2) / jnp.float32(max(camera.height - 1, 1))
    disk = rng.uniform_in_unit_disk(r3, r4)
    return camera.get_ray(u, v, disk)
