"""4×4 affine transforms (math/transform.rs:10-111).

The reference builds T·S·R compositions over homogeneous coordinates with
ndarray; here the matrix is a (4, 4) jnp array and application to points is
vectorized over arbitrary batches (and differentiable, like everything
else). The reference never wires Transform into a render path (SURVEY.md
"dead scaffolding") but ships and tests it as public API; parity keeps it.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

Vec = Tuple[float, float, float]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Transform:
    """Affine transform: `matrix` applies to homogeneous column vectors."""

    matrix: jax.Array  # (4, 4) f32

    # -- constructors (transform.rs:20-97) --------------------------------

    @staticmethod
    def identity() -> "Transform":
        return Transform(jnp.eye(4, dtype=jnp.float32))

    @staticmethod
    def translate(offset: Vec) -> "Transform":
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[0:3, 3].set(jnp.asarray(offset, jnp.float32))
        return Transform(m)

    @staticmethod
    def scale(factors: Vec) -> "Transform":
        return Transform(
            jnp.diag(jnp.asarray(list(factors) + [1.0], jnp.float32))
        )

    @staticmethod
    def _rot(axis0: int, axis1: int, degrees: float) -> "Transform":
        r = math.radians(degrees)
        c, s = math.cos(r), math.sin(r)
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[axis0, axis0].set(c).at[axis0, axis1].set(-s)
        m = m.at[axis1, axis0].set(s).at[axis1, axis1].set(c)
        return Transform(m)

    @staticmethod
    def rotate_x(degrees: float) -> "Transform":
        return Transform._rot(1, 2, degrees)

    @staticmethod
    def rotate_y(degrees: float) -> "Transform":
        # y-rotation has the transposed sign layout (transform.rs)
        r = math.radians(degrees)
        c, s = math.cos(r), math.sin(r)
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[0, 0].set(c).at[0, 2].set(s)
        m = m.at[2, 0].set(-s).at[2, 2].set(c)
        return Transform(m)

    @staticmethod
    def rotate_z(degrees: float) -> "Transform":
        return Transform._rot(0, 1, degrees)

    @staticmethod
    def new(translation: Vec, scaling: Vec, rotation_degrees: Vec) -> "Transform":
        """T · S · Rz · Ry · Rx composition (transform.rs:20)."""
        t = Transform.translate(translation)
        s = Transform.scale(scaling)
        rx = Transform.rotate_x(rotation_degrees[0])
        ry = Transform.rotate_y(rotation_degrees[1])
        rz = Transform.rotate_z(rotation_degrees[2])
        return t @ s @ rz @ ry @ rx

    # -- operations -------------------------------------------------------

    def __matmul__(self, other: "Transform") -> "Transform":
        return Transform(self.matrix @ other.matrix)

    def apply(self, points) -> jax.Array:
        """Apply to (..., 3) points via homogeneous coordinates
        (transform.rs:99-111)."""
        p = jnp.asarray(points, jnp.float32)
        h = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), jnp.float32)], -1)
        out = h @ self.matrix.T
        return out[..., :3] / out[..., 3:4]

    def apply_vector(self, vectors) -> jax.Array:
        """Apply the linear part only (directions: no translation)."""
        v = jnp.asarray(vectors, jnp.float32)
        return v @ self.matrix[:3, :3].T
