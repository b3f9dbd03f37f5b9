"""Batched ray-scene intersection.

The reference intersects one ray against one primitive at a time through
trait objects (hittable/sphere.rs:29-54, quad.rs:33-54) or Metal intersection
functions (shader/geometry.metal:33-99). The TPU-native formulation
intersects a batch of R rays against *all* N primitives at once:

  - sphere quadratic terms d.c and o.c are (R,3)@(3,N) matmuls -> MXU;
  - quad plane/planar-coordinate tests reduce to scalar triple products
    (p x v).w = p.(v x w), linear in p, so they are matmuls too;
  - the closest-hit argmin is a lane reduction on the VPU.

Semantics preserved from the reference:
  - t range is half-open [t_min, t_max) (Rust Range::contains);
  - sphere: near root, then far root fallback (sphere.rs:40-46);
  - quad: planar coords in half-open [0,1) — the CPU semantics, not the
    Metal shader's closed bounds (quad.rs:41 vs geometry.metal:88);
  - HitRecord normal flipped to face the ray, front_face = d.n_out < 0
    (hittable/mod.rs:34-40).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from tinyraytracer_tpu.models.world import SceneArrays

# t for "no hit". Large-but-finite so downstream arithmetic never makes NaNs.
MISS_T = jnp.float32(3.0e38)
T_MIN = jnp.float32(1.0e-3)  # sampler/cpu.rs:48


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HitRecord:
    """SoA hit record for a ray batch (hittable/mod.rs:19-48, vectorized)."""

    t: jax.Array          # (R,)  f32, MISS_T when no hit
    hit: jax.Array        # (R,)  bool
    point: jax.Array      # (R,3) f32
    normal: jax.Array     # (R,3) f32, unit, flipped toward the ray
    front_face: jax.Array  # (R,) bool
    mat_kind: jax.Array   # (R,)  i32
    albedo: jax.Array     # (R,3) f32
    fuzz: jax.Array       # (R,)  f32
    ior: jax.Array        # (R,)  f32
    emit: jax.Array       # (R,3) f32


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def sphere_ts(scene: SceneArrays, o, d, t_min, t_max, exact: bool = False):
    """Per-(ray, sphere) hit parameter t, MISS_T where no valid hit.

    o, d: (R,3); returns (R, Ns). `exact` uses the reference's oc = o - c
    form (broadcasted (R,Ns,3), exact in f32, the test oracle); the default
    expands the quadratic so the heavy terms are matmuls.
    """
    c = scene.sph_center
    r = scene.sph_radius
    if exact:
        oc = o[:, None, :] - c[None, :, :]          # (R,Ns,3)
        half_b = jnp.einsum("rns,rs->rn", oc, d)
        c_term = jnp.sum(oc * oc, axis=-1) - r[None, :] ** 2
    else:
        d_dot_c = d @ c.T                            # (R,Ns) — MXU
        o_dot_c = o @ c.T                            # (R,Ns) — MXU
        half_b = _dot(d, o)[:, None] - d_dot_c
        c_term = (
            _dot(o, o)[:, None] - 2.0 * o_dot_c + jnp.sum(c * c, axis=-1)[None, :]
            - r[None, :] ** 2
        )
    disc = half_b * half_b - c_term
    has_root = disc >= 0.0
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -half_b - sqrtd  # near root (a == 1: directions are normalized)
    t1 = -half_b + sqrtd  # far root fallback (sphere.rs:42-46)
    in0 = (t0 >= t_min) & (t0 < t_max)
    in1 = (t1 >= t_min) & (t1 < t_max)
    t = jnp.where(in0, t0, jnp.where(in1, t1, MISS_T))
    valid = has_root & scene.sph_valid[None, :]
    return jnp.where(valid, t, MISS_T)


def quad_ts(scene: SceneArrays, o, d, t_min, t_max):
    """Per-(ray, quad) hit parameter t, MISS_T where no valid hit.

    Quad plane quantities (quad.rs:20-29): n = u x v, w = n/(n.n),
    d_plane = n.corner. Planar coordinates (quad.rs:38-41):
      alpha = (p x v).w = p.(v x w) / (n.n)  with p relative to corner,
      beta  = (u x p).w = p.(w_vec x u)... expressed as p.(n x u)/(n.n);
    both are linear in p, so alpha/beta over the whole (R,Nq) grid are
    matmuls of ray origin/direction against per-quad constant vectors.
    """
    corner, u, v = scene.quad_corner, scene.quad_u, scene.quad_v
    n = jnp.cross(u, v)                       # (Nq,3)
    nn = _dot(n, n)                           # (Nq,)
    inv_nn = 1.0 / nn
    d_plane = _dot(n, corner)                 # (Nq,)
    # alpha = (p x v) . (n/nn) = p . (v x n) / nn
    a_vec = jnp.cross(v, n) * inv_nn[:, None]   # (Nq,3)
    # beta = (u x p) . (n/nn) = p . (n x u) / nn
    b_vec = jnp.cross(n, u) * inv_nn[:, None]   # (Nq,3)

    denom = d @ n.T                            # (R,Nq) — MXU
    t = (d_plane[None, :] - o @ n.T) / denom   # (R,Nq)
    in_range = (t >= t_min) & (t < t_max)

    # p = o + t*d - corner; alpha = p.a_vec, beta = p.b_vec — all matmuls.
    o_a = o @ a_vec.T
    d_a = d @ a_vec.T
    c_a = _dot(corner, a_vec)
    alpha = o_a + t * d_a - c_a[None, :]
    o_b = o @ b_vec.T
    d_b = d @ b_vec.T
    c_b = _dot(corner, b_vec)
    beta = o_b + t * d_b - c_b[None, :]

    inside = (alpha >= 0.0) & (alpha < 1.0) & (beta >= 0.0) & (beta < 1.0)
    valid = in_range & inside & scene.quad_valid[None, :] & jnp.isfinite(t)
    return jnp.where(valid, t, MISS_T)


def _gather_materials(scene: SceneArrays, mat_id):
    take = lambda a: jnp.take(a, mat_id, axis=0)
    return (
        take(scene.mat_kind),
        take(scene.mat_albedo),
        take(scene.mat_fuzz),
        take(scene.mat_ior),
        take(scene.mat_emit),
    )


def intersect_scene(
    scene: SceneArrays,
    o,
    d,
    t_min=T_MIN,
    t_max=MISS_T,
    exact: bool = False,
) -> HitRecord:
    """Closest hit of each ray in (o, d) against the whole scene.

    Vectorized equivalent of walking World geometry / BVH::hit
    (bvh.rs:88-107): compute all candidate ts, take the argmin. The discrete
    winner index is detached by construction (argmin), while t and the
    geometric quantities stay differentiable w.r.t. scene parameters through
    the gathered branch.
    """
    ts = sphere_ts(scene, o, d, t_min, t_max, exact=exact)
    tq = quad_ts(scene, o, d, t_min, t_max)
    ns = ts.shape[1]
    t_all = jnp.concatenate([ts, tq], axis=1)      # (R, Ns+Nq)
    j = jnp.argmin(t_all, axis=1)                  # (R,) detached (int)
    t = jnp.take_along_axis(t_all, j[:, None], axis=1)[:, 0]
    hit = t < MISS_T
    t_safe = jnp.where(hit, t, 1.0)
    point = o + t_safe[:, None] * d

    is_quad = j >= ns
    sph_j = jnp.minimum(j, ns - 1)
    quad_j = jnp.clip(j - ns, 0, tq.shape[1] - 1)

    center = jnp.take(scene.sph_center, sph_j, axis=0)     # (R,3)
    sph_out = point - center                                # outward normal dir
    qn = jnp.cross(
        jnp.take(scene.quad_u, quad_j, axis=0),
        jnp.take(scene.quad_v, quad_j, axis=0),
    )
    outward = jnp.where(is_quad[:, None], qn, sph_out)
    norm = jnp.linalg.norm(outward, axis=-1, keepdims=True)
    outward_unit = outward / jnp.maximum(norm, 1e-30)

    front_face = _dot(d, outward) < 0.0                     # hittable/mod.rs:35
    normal = jnp.where(front_face[:, None], outward_unit, -outward_unit)

    mat_id = jnp.where(
        is_quad,
        jnp.take(scene.quad_mat, quad_j),
        jnp.take(scene.sph_mat, sph_j),
    )
    kind, albedo, fuzz, ior, emit = _gather_materials(scene, mat_id)
    return HitRecord(
        t=t,
        hit=hit,
        point=point,
        normal=normal,
        front_face=front_face,
        mat_kind=kind,
        albedo=albedo,
        fuzz=fuzz,
        ior=ior,
        emit=emit,
    )
