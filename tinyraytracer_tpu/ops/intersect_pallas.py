"""Pallas TPU kernel: fused closest-hit selection over a compacted scene.

This is the TPU-native equivalent of the reference's Metal intersection
stack (shader/geometry.metal:33-99 intersection functions + the hardware
acceleration-structure dispatch, sampler/metal/*): one fused kernel that
finds each ray's closest primitive.

Why a kernel: the XLA dense path materializes (R, N) candidate tensors in
HBM between ops — at R=360k, N=256 that is ~370 MB of traffic *per
elementwise step*, and the bounce loop is pure HBM bandwidth. Here a tile
of TR rays is resident in VMEM, the whole candidate matrix (N, TR) lives
and dies in VMEM, and only (R,) best-t / best-j leave the chip.

Layout (TPU tiling: f32 tiles are 8 sublanes x 128 lanes):
  - rays on LANES: ray components are passed as (G, TR) rows, one grid
    step per row, TR a multiple of 128;
  - primitives on SUBLANES: compacted scene component columns (N, 1),
    N a multiple of 8 — no 128-padding waste on the primitive axis;
  - candidate t matrix (N, TR) = (N,1) x (1,TR) broadcasts, VPU FMAs.

The kernel is selection-only and detached by design: the winner's t is
recomputed differentiably by ops.intersect.prim_t (shared with the dense
and BVH paths), so gradients are identical across all three intersectors.

Compaction: only *valid* primitives enter (padded build slots dropped),
re-padded to 8-sublane multiples with inert entries (centers/corners at
1e30 never hit). Winner indices map back to global (spheres-then-quads)
ids via a host-built index table; compaction preserves order, so the
first-minimum tie-break matches the brute-force argmin exactly.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyraytracer_tpu.models.world import SceneArrays
from tinyraytracer_tpu.ops.intersect import (
    MISS_T,
    T_MIN,
    HitRecord,
    hit_record_from,
    prim_t,
)

# Rays per kernel tile (lanes): 512 keeps the (N, TR) candidate matrix at
# N=512 prims to 1 MB — comfortably inside VMEM next to its temporaries.
TILE_RAYS = 512

_FAR = 1.0e30  # inert-primitive displacement: never intersected


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CompactScene:
    """Valid primitives only, SoA columns (N, 1), 8-sublane padded.

    Sphere block first (ns rows), then quads (nq rows); `index_map` sends
    compacted row -> global primitive id (spheres-then-quads convention of
    ops.intersect). Quad plane quantities are precomputed on host from the
    concrete scene (selection is detached, so staleness vs. differentiable
    params is impossible by construction — rebuild per scene like the BVH).
    """

    # spheres
    sph_c: jax.Array      # (Ns, 3)
    sph_r2: jax.Array     # (Ns, 1) radius^2
    # quads: plane normal n, d_plane = n.corner, alpha/beta row vectors
    quad_n: jax.Array     # (Nq, 3)
    quad_dp: jax.Array    # (Nq, 1)
    quad_av: jax.Array    # (Nq, 3)  (v x n) / (n.n)
    quad_ca: jax.Array    # (Nq, 1)  corner . av
    quad_bv: jax.Array    # (Nq, 3)  (n x u) / (n.n)
    quad_cb: jax.Array    # (Nq, 1)  corner . bv
    index_map: jax.Array  # (Ns+Nq,) i32 compacted row -> global prim id
    # Real (unpadded) counts — static so kernels compile out an absent
    # primitive kind entirely (e.g. Cornell has zero spheres).
    n_sph_real: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_quad_real: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def ns(self) -> int:
        return int(self.sph_c.shape[0])

    @property
    def nq(self) -> int:
        return int(self.quad_n.shape[0])


def _pad8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


def compact_scene(scene: SceneArrays, sphere_order=None) -> CompactScene:
    """Host-side compaction + quad plane precompute (like build_bvh).

    `sphere_order` optionally permutes the valid spheres (a permutation of
    range(n_valid)) — used by the megakernel's cluster lowering to store
    spatially-coherent spheres contiguously. Winner ids still map back
    through index_map, so consumers are order-agnostic (sphere/sphere
    exact-t ties may resolve to a different winner; quad z-fight ties,
    the ones that matter statistically, are unaffected)."""
    sc = np.asarray(scene.sph_center, np.float32)
    sr = np.asarray(scene.sph_radius, np.float32)
    sv = np.asarray(scene.sph_valid, bool)
    qc = np.asarray(scene.quad_corner, np.float32)
    qu = np.asarray(scene.quad_u, np.float32)
    qv = np.asarray(scene.quad_v, np.float32)
    qvl = np.asarray(scene.quad_valid, bool)

    s_idx = np.nonzero(sv)[0]
    if sphere_order is not None:
        s_idx = s_idx[np.asarray(sphere_order)]
    q_idx = np.nonzero(qvl)[0]
    ns, nq = _pad8(len(s_idx)), _pad8(len(q_idx))

    sph_c = np.full((ns, 3), _FAR, np.float32)
    sph_r2 = np.zeros((ns, 1), np.float32)
    sph_c[: len(s_idx)] = sc[s_idx]
    sph_r2[: len(s_idx), 0] = sr[s_idx] ** 2

    # Padded quad rows keep u = v = 0: the zero normal fails every kernel's
    # |n.d| >= 1e-12 validity guard, so pad rows are DETERMINISTICALLY
    # inert. (The previous 1e30-corner padding relied on alpha/beta landing
    # out of [0,1), which catastrophic cancellation could defeat for rays
    # with dx==dy==dz to within rounding.)
    corner = np.full((nq, 3), _FAR, np.float32)
    u = np.zeros((nq, 3), np.float32)
    v = np.zeros((nq, 3), np.float32)
    corner[: len(q_idx)] = qc[q_idx]
    u[: len(q_idx)] = qu[q_idx]
    v[: len(q_idx)] = qv[q_idx]
    n = np.cross(u, v)
    nn = np.maximum((n * n).sum(-1, keepdims=True), 1e-30)
    av = np.cross(v, n) / nn
    bv = np.cross(n, u) / nn
    dp = (n * corner).sum(-1, keepdims=True)
    ca = (corner * av).sum(-1, keepdims=True)
    cb = (corner * bv).sum(-1, keepdims=True)

    nsph_total = sc.shape[0]
    index_map = np.zeros((ns + nq,), np.int32)
    index_map[: len(s_idx)] = s_idx
    index_map[ns : ns + len(q_idx)] = nsph_total + q_idx

    return CompactScene(
        sph_c=jnp.asarray(sph_c),
        sph_r2=jnp.asarray(sph_r2),
        quad_n=jnp.asarray(n.astype(np.float32)),
        quad_dp=jnp.asarray(dp.astype(np.float32)),
        quad_av=jnp.asarray(av.astype(np.float32)),
        quad_ca=jnp.asarray(ca.astype(np.float32)),
        quad_bv=jnp.asarray(bv.astype(np.float32)),
        quad_cb=jnp.asarray(cb.astype(np.float32)),
        index_map=jnp.asarray(index_map),
        n_sph_real=len(s_idx),
        n_quad_real=len(q_idx),
    )


def _closest_hit_kernel(
    o_ref, d_ref,
    sph_c_ref, sph_r2_ref,
    quad_n_ref, quad_dp_ref, quad_av_ref, quad_ca_ref,
    quad_bv_ref, quad_cb_ref,
    t_ref, j_ref,
):
    """One grid step: TR rays vs all primitives, entirely in VMEM."""
    # Python-float copies of ops.intersect constants (jnp scalars would be
    # captured tracers, which pallas_call rejects).
    t_min = float(T_MIN)
    miss = float(MISS_T)
    ox = o_ref[0:1, :]
    oy = o_ref[1:2, :]
    oz = o_ref[2:3, :]
    dx = d_ref[0:1, :]
    dy = d_ref[1:2, :]
    dz = d_ref[2:3, :]

    # --- spheres: quadratic with near-then-far roots (sphere.rs:29-54) ---
    cx = sph_c_ref[:, 0:1]
    cy = sph_c_ref[:, 1:2]
    cz = sph_c_ref[:, 2:3]
    ocx = ox - cx                      # (Ns, TR)
    ocy = oy - cy
    ocz = oz - cz
    half_b = ocx * dx + ocy * dy + ocz * dz
    c_term = ocx * ocx + ocy * ocy + ocz * ocz - sph_r2_ref[:, 0:1]
    disc = half_b * half_b - c_term
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -half_b - sqrtd
    t1 = -half_b + sqrtd
    ts = jnp.where((t0 >= t_min) & (t0 < miss), t0,
                   jnp.where((t1 >= t_min) & (t1 < miss), t1, miss))
    ts = jnp.where(disc >= 0.0, ts, miss)

    # --- quads: plane + half-open planar bounds (quad.rs:33-54) ---
    nx = quad_n_ref[:, 0:1]
    ny = quad_n_ref[:, 1:2]
    nz = quad_n_ref[:, 2:3]
    denom = nx * dx + ny * dy + nz * dz          # (Nq, TR)
    # Validity guard BEFORE the clamp (dense-oracle parity,
    # ops/intersect.py quad_ts): a grazing ray (|n.d| < 1e-12) is no hit —
    # clamping alone would keep a sign-flipped t for negative denom.
    ok_den = jnp.abs(denom) >= 1e-12
    denom = jnp.where(ok_den, denom, 1e-12)
    tq = (quad_dp_ref[:, 0:1] - (nx * ox + ny * oy + nz * oz)) / denom
    avx = quad_av_ref[:, 0:1]
    avy = quad_av_ref[:, 1:2]
    avz = quad_av_ref[:, 2:3]
    alpha = (avx * ox + avy * oy + avz * oz) + tq * (
        avx * dx + avy * dy + avz * dz
    ) - quad_ca_ref[:, 0:1]
    bvx = quad_bv_ref[:, 0:1]
    bvy = quad_bv_ref[:, 1:2]
    bvz = quad_bv_ref[:, 2:3]
    beta = (bvx * ox + bvy * oy + bvz * oz) + tq * (
        bvx * dx + bvy * dy + bvz * dz
    ) - quad_cb_ref[:, 0:1]
    ok = (
        ok_den & (tq >= t_min) & (tq < miss)
        & (alpha >= 0.0) & (alpha < 1.0)
        & (beta >= 0.0) & (beta < 1.0)
    )
    tq = jnp.where(ok, tq, miss)

    # --- combined first-minimum over the primitive (sublane) axis ---
    t_all = jnp.concatenate([ts, tq], axis=0)    # (Ns+Nq, TR)
    best_t = jnp.min(t_all, axis=0, keepdims=True)
    n_all = t_all.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 0)
    # First (lowest-index) minimum, matching jnp.argmin / the BF tie-break.
    cand = jnp.where(t_all == best_t, row, n_all)
    best_row = jnp.min(cand, axis=0, keepdims=True)
    t_ref[0:1, :] = best_t
    j_ref[0:1, :] = jnp.where(best_t < miss, best_row, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_pallas(cs: CompactScene, o, d, interpret: bool = False):
    """Closest-hit selection for rays (o, d): returns detached (t, j_global).

    o, d: (R, 3). R is padded to TILE_RAYS internally; t is the screening
    t (used only for hit/miss), j_global indexes spheres-then-quads in the
    *original* scene (-1 = miss).
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    r = o.shape[0]
    g = (r + TILE_RAYS - 1) // TILE_RAYS
    rp = g * TILE_RAYS
    # (3, G*TR) component layout -> grid rows of (3, TR).
    ot = jnp.zeros((3, rp), jnp.float32).at[:, :r].set(o.T)
    dt = jnp.ones((3, rp), jnp.float32).at[:, :r].set(d.T)

    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[
            pl.BlockSpec((3, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM)  # whole scene table, resident
            for _ in range(8)
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
    )
    t, j = pl.pallas_call(
        _closest_hit_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ],
        interpret=interpret,
    )(
        ot, dt,
        cs.sph_c, cs.sph_r2,
        cs.quad_n, cs.quad_dp, cs.quad_av, cs.quad_ca,
        cs.quad_bv, cs.quad_cb,
    )
    t = t[0, :r]
    j = j[0, :r]
    hit = j >= 0
    j_global = jnp.where(hit, jnp.take(cs.index_map, jnp.maximum(j, 0)), -1)
    return t, j_global


def intersect_scene_compact(
    scene: SceneArrays,
    cs: CompactScene,
    o,
    d,
    interpret: bool = False,
) -> HitRecord:
    """Closest hit via the Pallas kernel, gradient-equivalent to the dense
    and BVH paths (selection detached, winner recomputed by prim_t)."""
    from tinyraytracer_tpu.ops.intersect import select_to_record

    t_screen, j = closest_hit_pallas(cs, o, d, interpret=interpret)
    return select_to_record(scene, o, d, t_screen, j)
