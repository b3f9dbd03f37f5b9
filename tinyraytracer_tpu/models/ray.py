"""Ray value type (ray.rs:4-27), vectorized.

The hot paths carry origins/directions as separate (R, 3) arrays (SoA);
this wrapper is the user-facing object for scripting and tests, keeping
the reference's semantic that directions are normalized at construction
(ray.rs:13).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Ray:
    origin: jax.Array     # (..., 3)
    direction: jax.Array  # (..., 3), unit

    @staticmethod
    def new(origin, direction) -> "Ray":
        o = jnp.asarray(origin, jnp.float32)
        d = jnp.asarray(direction, jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)  # ray.rs:13
        return Ray(o, d)

    def at(self, t) -> jax.Array:
        """origin + t * direction (ray.rs:24-26)."""
        t = jnp.asarray(t, jnp.float32)
        return self.origin + t[..., None] * self.direction
