"""Fused differentiable render: forward + loss + hand-derived backward in
ONE Pallas kernel launch.

The modular autodiff path (ops/trace.py + jax.grad) is the flexible oracle,
but its training throughput is bounded by XLA fusion-boundary traffic and
per-bounce kernel launches (~43 ms/bounce fwd+bwd at R=360k measured on
v5e). This module is the TPU-native answer for the north-star metric
"forward+backward rays/sec" (BASELINE.md): the whole photometric-MSE
training objective

    L = mean((render_nee(scene) - target)^2)

is evaluated AND differentiated w.r.t. every scene parameter inside one
kernel: a tile of rays lives in VMEM through (a) the NEE forward that
accumulates the image, (b) the locally-computed loss cotangent
dL/d(pixel) = 2 (img - target) / (npix * 3), and (c) a reverse sweep that
replays each sample's bounce chain (Python-unrolled, states held in VMEM)
and applies hand-derived vector-Jacobian products, accumulating parameter
gradients into small per-scene tables via one-hot MXU matmuls.

Semantics match ops/trace.trace(nee=True, silhouette=True) — the training
estimator: same pcg4d streams, emission-skip rule, quad-light NEE with the
soft-shadow surrogate, sphere silhouette surrogate, and all four material
scatter chains (lambertian.rs/metal.rs/dielectric.rs/light.rs). Discrete
events (winner selection, shadow visibility, dielectric branch, light
choice) are detached exactly as the modular path detaches them, so the
gradients agree with jax.grad of render_loss (gated by
tests/test_diffkernel.py against the oracle).

Gradient targets: sph_center, sph_radius, quad_corner, quad_u, quad_v,
mat_albedo, mat_fuzz, mat_ior, mat_emit, background.

Reference lineage: this is the "GPU training kernel" the reference never
had — its Metal stack (sampler/metal/*) stops at a debug-color forward
(kernel.metal:57-60); here the complete differentiable objective runs on
device.
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyraytracer_tpu.models.camera import Camera
from tinyraytracer_tpu.models.world import SceneArrays
from tinyraytracer_tpu.ops.megakernel import (
    _camera_vector,
    _normalize3,
    _uniform4,
)

# Rays per tile. Much smaller than the forward megakernel's 1024: the
# unrolled replay keeps each bounce's saved state AND shade intermediates
# live in VMEM across the reverse sweep (~200 KB/bounce at 256 lanes);
# 512 lanes exceeded v5e's 16 MB scoped-vmem limit by ~5% at mb=8.
TILE = 256

_T_MIN = 1.0e-3
_MISS = 3.0e38
_TWO_PI = 6.283185307179586

# Payload row indices (see _diff_payload).
_P_ISQ = 0
_P_C = 1        # 1..3 sphere center
_P_NH = 4       # 4..6 quad unit normal
_P_KIND = 7
_P_ALB = 8      # 8..10
_P_FUZZ = 11
_P_IOR = 12
_P_EMIT = 13    # 13..15
_P_MAT = 16
_P_RAD = 17
_P_QC = 18      # 18..20 quad corner
_P_QU = 21      # 21..23 quad u
_P_QV = 24      # 24..26 quad v
_P_ROWS = 32


@dataclasses.dataclass(frozen=True)
class DiffStatic:
    """Static (host-computed) structure of a scene for the fused kernel.

    Row selections, material ids and light membership are int/bool
    *structure* (diff/params.py: never differentiated, never traced), so
    they are extracted once on host; the numeric device tables are rebuilt
    from live parameters inside jit by `diff_tables` — a training step can
    therefore update geometry/materials without host round trips.
    """

    ns: int                 # padded compacted sphere rows
    nq: int                 # padded compacted quad rows
    nm: int                 # padded material rows
    nl: int                 # padded light rows
    n_lights: int           # real light count
    sph_rows: tuple         # global sphere rows (real)
    quad_rows: tuple        # global quad rows (real)
    light_quad_rows: tuple  # global quad rows of the lights
    light_mat_rows: tuple   # material rows of the lights
    mat_ids: tuple          # compacted prim -> global material row
    mat_kinds: tuple        # material kind codes (static ints)


def build_diff_static(scene: SceneArrays) -> DiffStatic:
    from tinyraytracer_tpu.models import materials as mat

    s_rows = np.nonzero(np.asarray(scene.sph_valid))[0]
    q_rows = np.nonzero(np.asarray(scene.quad_valid))[0]
    kinds = np.asarray(scene.mat_kind)
    sph_mat = np.asarray(scene.sph_mat)
    quad_mat = np.asarray(scene.quad_mat)
    ns = max(8, ((len(s_rows) + 7) // 8) * 8)
    nq = max(8, ((len(q_rows) + 7) // 8) * 8)
    na = ns + nq
    mids = np.zeros((na,), np.int64)
    mids[: len(s_rows)] = sph_mat[s_rows]
    mids[ns:ns + len(q_rows)] = quad_mat[q_rows]
    is_light = kinds[quad_mat[q_rows]] == mat.LIGHT
    lq_rows = q_rows[is_light]
    nl = max(8, ((len(lq_rows) + 7) // 8) * 8)
    nm = max(8, ((kinds.shape[0] + 7) // 8) * 8)
    return DiffStatic(
        ns=ns, nq=nq, nm=nm, nl=nl, n_lights=len(lq_rows),
        sph_rows=tuple(int(i) for i in s_rows),
        quad_rows=tuple(int(i) for i in q_rows),
        light_quad_rows=tuple(int(i) for i in lq_rows),
        light_mat_rows=tuple(int(i) for i in quad_mat[lq_rows]),
        mat_ids=tuple(int(i) for i in mids),
        mat_kinds=tuple(int(k) for k in kinds),
    )


def static_kind_flags(st: DiffStatic):
    """(has_met, has_die) from the static structure: does any REAL
    primitive use a Metal / Dielectric material? Lets the fused kernels
    compile out the absent scatter chains and their adjoints — exactly
    value-preserving, since the dropped terms are winner-gated selects
    (never taken) and exact-zero cotangent products (see bounce_adj).

    The DiffStatic twin of megakernel.used_kind_flags (which reads the
    SceneArrays directly): the diff kernels receive possibly-traced
    scenes, so the flags must come from the host-computed static
    structure. Both use the same materials.* kind codes; equality of the
    two derivations is gated by tests/test_diffkernel.py."""
    from tinyraytracer_tpu.models import materials as mat

    used = set()
    for i in range(len(st.sph_rows)):
        used.add(st.mat_kinds[st.mat_ids[i]])
    for j in range(len(st.quad_rows)):
        used.add(st.mat_kinds[st.mat_ids[st.ns + j]])
    return (mat.METAL in used), (mat.DIELECTRIC in used)


# Scoped-VMEM acceptance for the classic kernel's auto tile sizing: v5e's
# scoped limit is 16.00 MB (Mosaic's own error reports); accept a config
# when the model's prediction x safety margin stays under it.
_SCOPED_LIMIT = 15.75e6
# Round-4 refit has a 13% worst-case underprediction (the allocator is
# lumpy at small sizes); 1.15 keeps every probe point inside the margin.
_SCOPED_SAFETY = 1.15


def _classic_scoped_bytes(mb: int, n_rows: int, tr: int) -> int:
    """Predicted scoped-VMEM bytes of one classic-kernel grid step
    (base kernel — the cache_isect scratch is added separately by the
    caller, which knows spp).

    Least-squares model over {1, mb, rows, mb·rows} x {1, tr} calibrated
    against Mosaic's OWN scoped-size reports on v5e (round-4 refit after
    the onehot-save removal + quad surrogates: max rel err 13%, mean 5.5%
    over the 18-point (tr, mb, rows) grid; scripts/probe_diff_vmem.py —
    a 1 MB TINYRT_DIFF_VMEM_CAP makes every compile fail with the true
    size in the error)."""
    m, r, t = float(mb), float(n_rows), float(tr)
    return int(
        2236185.7 - 65291.2 * m - 35614.3 * r + 4551.8 * m * r
        - 8410.9 * t + 2085.6 * m * t + 207.66 * r * t + 5.75 * m * r * t
    )


def _classic_tile(mb: int, n_rows: int, tile=None) -> int:
    """Lane-tile width for the classic kernel, or 0 if no width fits.

    256 lanes is the VPU sweet spot (diffkernel TILE); large
    (rows x bounces) reverse sweeps halve it to 128 when the predicted
    scoped VMEM would bust the 16 MB limit. 128 is the floor — Mosaic
    pads the lane axis to 128, so smaller tiles save nothing. An
    explicit `tile` int (or TINYRT_DIFF_TILE) overrides the model; use
    it to push borderline configs the model rejects by <10%."""
    if tile is not None:
        return int(tile[-1]) if isinstance(tile, (tuple, list)) else int(tile)
    env = _os.environ.get("TINYRT_DIFF_TILE")
    if env:
        return int(env)
    for tr in (256, 128):
        if _classic_scoped_bytes(mb, n_rows, tr) * _SCOPED_SAFETY \
                <= _SCOPED_LIMIT:
            return tr
    return 0


# Row-block width of the STREAMED classic kernel (VERDICT r4 #3): the
# rows-sized sweeps fold in blocks of this many sublane rows. 256
# mirrors the forward row-streamed megakernel's measured-best chunk.
DIFF_ROW_CHUNK = int(_os.environ.get("TINYRT_DIFF_ROW_CHUNK", "256"))


def _streamed_scoped_bytes(mb: int, n_rows: int, chunk: int,
                           tr: int) -> int:
    """Predicted scoped-VMEM bytes of one STREAMED-kernel grid step.

    The classic model evaluated with the live row window = ONE chunk
    (the fori_loop frees each block's intermediates, so the rows term
    collapses to the chunk) plus the VMEM-resident scene columns +
    both payload orientations (~170 B/row)."""
    return _classic_scoped_bytes(mb, min(chunk, n_rows), tr) \
        + 170 * n_rows


def _streamed_tile(mb: int, n_rows: int, chunk: int, tile=None) -> int:
    """Lane-tile width for the streamed classic kernel, or 0."""
    if tile is not None:
        return int(tile[-1]) if isinstance(tile, (tuple, list)) else int(tile)
    env = _os.environ.get("TINYRT_DIFF_TILE")
    if env:
        return int(env)
    for tr in (256, 128):
        if _streamed_scoped_bytes(mb, n_rows, chunk, tr) \
                * _SCOPED_SAFETY <= _SCOPED_LIMIT:
            return tr
    return 0


def fused_engine_feasible(st: DiffStatic, mesh=None,
                          interpret: bool = False,
                          max_bounces: int | None = None,
                          classic_only: bool = False) -> bool:
    """Single source of truth for "can the fused kernels run this scene".

    Mirrors render_value_and_grad's auto-routing exactly (packed unroll
    limit, many-sphere packed cutoff, classic VMEM tile model, mesh
    availability) so callers probing feasibility up front — e.g.
    diff/inverse.fit(engine='auto') — can never diverge from what the
    dispatch itself will accept as the limits evolve.

    max_bounces: bounce depth of the intended fit — the classic kernel's
    VMEM need scales with it. None = assume the reference default (20),
    the conservative end of every BASELINE config.

    classic_only (ADVICE r4): probe the classic kernel's bound alone —
    for callers whose options force it (explicit trainable_rows subsets
    route classic regardless of packed feasibility), so a packed-only
    feasible scene doesn't get promised an engine the dispatch will
    reject.

    Beyond-VMEM scenes probe the row-streamed kernel's model; since
    round 5 dense surrogate classes stream chunk-by-chunk, so
    feasibility does not depend on the surrogate scope."""
    from tinyraytracer_tpu.ops.diffkernel_packed import (
        DIFF_PACKED_MAX_PRIMS,
        DIFF_PACKED_MAX_SPHERES,
    )

    del mesh  # both kernels shard the same way; limits are per-device
    n_real = len(st.sph_rows) + len(st.quad_rows)
    packed_ok = n_real <= DIFF_PACKED_MAX_PRIMS
    if packed_ok and len(st.sph_rows) > DIFF_PACKED_MAX_SPHERES:
        packed_ok = False       # auto would route classic: check its bound
    mb = 20 if max_bounces is None else max_bounces
    n_rows = st.ns + st.nq
    # interpret mode has no VMEM constraint (ADVICE r3): classic always ok
    classic_ok = interpret or _classic_tile(mb, n_rows) > 0
    if not classic_ok:
        classic_ok = _streamed_tile(
            mb, n_rows, min(DIFF_ROW_CHUNK, n_rows)) > 0
    if classic_only:
        return classic_ok
    return packed_ok or classic_ok


def diff_tables(scene: SceneArrays, st: DiffStatic):
    """jit-safe device tables from (possibly traced) scene parameters."""
    ns, nq, na = st.ns, st.nq, st.ns + st.nq
    nreal_s = len(st.sph_rows)
    nreal_q = len(st.quad_rows)
    s_idx = jnp.asarray(st.sph_rows, jnp.int32).reshape(-1)
    q_idx = jnp.asarray(st.quad_rows, jnp.int32).reshape(-1)
    m_idx = jnp.asarray(st.mat_ids, jnp.int32)
    kinds = jnp.asarray(st.mat_kinds, jnp.float32)

    def take(a, idx):
        return jnp.take(a, idx, axis=0) if idx.shape[0] else a[:0]

    sc = take(scene.sph_center, s_idx)                  # (nreal_s, 3)
    sr = take(scene.sph_radius, s_idx)
    qc = take(scene.quad_corner, q_idx)
    qu = take(scene.quad_u, q_idx)
    qv = take(scene.quad_v, q_idx)

    sph_c = jnp.full((ns, 3), 1e30, jnp.float32).at[:nreal_s].set(sc)
    sph_r = jnp.zeros((ns, 1), jnp.float32).at[:nreal_s, 0].set(sr)
    quad_c = jnp.full((nq, 3), 1e30, jnp.float32).at[:nreal_q].set(qc)
    quad_u = jnp.zeros((nq, 3), jnp.float32).at[:nreal_q].set(qu)
    quad_v = jnp.zeros((nq, 3), jnp.float32).at[:nreal_q].set(qv)

    alb = jnp.take(scene.mat_albedo, m_idx, axis=0)     # (na, 3)
    fuzz = jnp.take(scene.mat_fuzz, m_idx)
    ior = jnp.take(scene.mat_ior, m_idx)
    emit = jnp.take(scene.mat_emit, m_idx, axis=0)
    kind_rows = jnp.take(kinds, m_idx)

    nvec = jnp.cross(qu, qv)
    nlen = jnp.sqrt(jnp.maximum(jnp.sum(nvec * nvec, -1, keepdims=True),
                                1e-30))
    nhat = nvec / nlen

    pay = jnp.zeros((_P_ROWS, na), jnp.float32)
    pay = pay.at[_P_C:_P_C + 3, :nreal_s].set(sc.T)
    pay = pay.at[_P_RAD, :nreal_s].set(sr)
    pay = pay.at[_P_ISQ, ns:].set(1.0)
    pay = pay.at[_P_NH:_P_NH + 3, ns:ns + nreal_q].set(nhat.T)
    pay = pay.at[_P_QC:_P_QC + 3, ns:ns + nreal_q].set(qc.T)
    pay = pay.at[_P_QU:_P_QU + 3, ns:ns + nreal_q].set(qu.T)
    pay = pay.at[_P_QV:_P_QV + 3, ns:ns + nreal_q].set(qv.T)
    pay = pay.at[_P_KIND].set(kind_rows)
    pay = pay.at[_P_ALB:_P_ALB + 3].set(alb.T)
    pay = pay.at[_P_FUZZ].set(fuzz)
    pay = pay.at[_P_IOR].set(ior)
    pay = pay.at[_P_EMIT:_P_EMIT + 3].set(emit.T)
    pay = pay.at[_P_MAT].set(m_idx.astype(jnp.float32))
    # padded sphere rows must never win but also never NaN the replay:
    # center 1e30 / radius 0 keeps every guard finite.

    light_pay = jnp.zeros((16, st.nl), jnp.float32)
    if st.n_lights:
        lq = jnp.asarray(st.light_quad_rows, jnp.int32)
        lm = jnp.asarray(st.light_mat_rows, jnp.int32)
        light_pay = light_pay.at[0:3, :st.n_lights].set(
            jnp.take(scene.quad_corner, lq, axis=0).T)
        light_pay = light_pay.at[3:6, :st.n_lights].set(
            jnp.take(scene.quad_u, lq, axis=0).T)
        light_pay = light_pay.at[6:9, :st.n_lights].set(
            jnp.take(scene.quad_v, lq, axis=0).T)
        light_pay = light_pay.at[9:12, :st.n_lights].set(
            jnp.take(scene.mat_emit, lm, axis=0).T)
    return dict(sph_c=sph_c, sph_r=sph_r, quad_c=quad_c, quad_u=quad_u,
                quad_v=quad_v, pay=pay, light_pay=light_pay)


def _make_diff_kernel(spp: int, mb: int, ns: int, nq: int, nm: int,
                      nl: int, n_lights: int, nee: bool, sil: bool,
                      has_met: bool = True, has_die: bool = True,
                      surr_s: tuple | None = None,
                      surr_q: tuple | None = None,
                      cache_isect: bool = False,
                      row_chunk: int = 0):
    """Kernel: NEE forward image + local MSE cotangent + unrolled adjoint.

    All per-ray values are (1, TR) f32 rows; per-sphere matrices are
    (ns, TR) (sublanes x lanes, both dense). Discrete masks are carried as
    f32 0/1 (Mosaic rejects bool loop carries).

    surr_s / surr_q (VERDICT r3 #1): kernel-row subsets (sphere rows /
    quad rows) whose boundary-surrogate gradients the caller trains.
    None = all rows (dense, the historical behavior). With a subset, the
    per-bounce silhouette + NEE soft-shadow adjoints run on (k, TR)
    gathered rows instead of (ns, TR)/(nq, TR) — the surrogate cost then
    scales with the TRAINABLE primitive count, not the scene size
    (measured 128-sphere scene: the dense surrogates were 136 ms of a
    263 ms step). The soft-shadow VISIBILITY PRODUCT still runs over all
    rows (the ratio's clamp needs the full product); the approximation
    is that non-subset occluders' soft-shadow cotangents into the shared
    ray chain (cp/cwl/cdist) are dropped — a surrogate-artifact term,
    zero whenever those rows' coverage is saturated.

    row_chunk (VERDICT r4 #3 — the diff twin of megakernel row
    streaming): when > 0, every rows-sized sweep folds over
    `row_chunk`-row blocks inside a fori_loop (dynamic sublane slices of
    the scene refs) instead of materializing (rows, TR): the candidate
    closest-hit (phase 1, shadow re-trace, replay), the winner payload
    gather (an extra TRANSPOSED payload input, rows on sublanes), and
    the parameter-gradient accumulation (chunked one-hot MXU adds
    written straight into the output tables). Boundary surrogates
    stream in either scope: subset rows / class-off run as (k, TR)
    static gathers, and DENSE classes (surr None, round 5) fold their
    soft-shadow product and surrogate adjoints chunk-by-chunk via the
    stream_dense machinery below. Loss and image are BIT-IDENTICAL to
    the monolithic kernel (the strict-< fold reproduces min +
    first-index-at-min exactly — the same construction
    megakernel.closest_hit_chunked parity-gates); gradients match to fp
    reassociation (~1e-7 relative) because the chunked table writes and
    per-chunk lane reductions re-associate the per-bounce sums.
    """
    na = ns + nq
    nlf = float(n_lights)

    def dot3(ax, ay, az, bx, by, bz):
        return ax * bx + ay * by + az * bz

    def cross3(ax, ay, az, bx, by, bz):
        return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def cl(a, b):
        # contract lane axes: (ra, TR) x (rb, TR) -> (ra, rb)
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def kernel(cam_ref, ctl_ref, pid_ref, px_ref, py_ref, wgt_ref, tgt_ref,
               sphc_ref, sphr_ref, qc_ref, qu_ref, qv_ref, pay_ref, lpay_ref,
               *rest):
        if row_chunk:
            # streamed mode carries the TRANSPOSED payload (na, 32) so
            # the chunked winner gather slices rows on the SUBLANE axis
            # (Mosaic's pl.ds constraint — same layout argument as
            # megakernel.payload_chunked)
            payT_ref, *rest = rest
        (img_ref, dsph_ref, dquad_ref, dmat_ref, dlight_ref, dmisc_ref,
         *isect_scratch) = rest
        # cache_isect (same design as diffkernel_packed): (spp*mb, 1, TR)
        # VMEM scratches holding phase 1's per-(sample, bounce) winner t /
        # winner row / shadow visibility, so the phase-3 replay skips its
        # closest-hit AND shadow re-trace — the two O(rows) candidate
        # sweeps of a replay bounce. Values are bit-identical by
        # construction (the replay repeats phase 1's exact sequence).
        if cache_isect:
            ct_ref, cr_ref, cv_ref = isect_scratch
        tr = pid_ref.shape[1]
        pid = pid_ref[0:1, :]
        px = px_ref[0:1, :]
        py = py_ref[0:1, :]

        def cam(i):
            return cam_ref[0, i]

        pos_x, pos_y, pos_z = cam(0), cam(1), cam(2)
        ul_x, ul_y, ul_z = cam(3), cam(4), cam(5)
        hx, hy, hz = cam(6), cam(7), cam(8)
        vx, vy, vz = cam(9), cam(10), cam(11)
        dux, duy, duz = cam(12), cam(13), cam(14)
        dvx, dvy, dvz = cam(15), cam(16), cam(17)
        inv_w1, inv_h1 = cam(18), cam(19)
        bg_r, bg_g, bg_b = cam(20), cam(21), cam(22)
        npixf = cam(23)
        seed = ctl_ref[0, 0].astype(jnp.uint32)
        spp_offset = ctl_ref[0, 1].astype(jnp.uint32)

        # --- derived scene columns (rows = primitives) ------------------
        scx = sphc_ref[:, 0:1]
        scy = sphc_ref[:, 1:2]
        scz = sphc_ref[:, 2:3]
        sr = sphr_ref[:, 0:1]
        sr2 = sr * sr
        qcx, qcy, qcz = qc_ref[:, 0:1], qc_ref[:, 1:2], qc_ref[:, 2:3]
        qux, quy, quz = qu_ref[:, 0:1], qu_ref[:, 1:2], qu_ref[:, 2:3]
        qvx, qvy, qvz = qv_ref[:, 0:1], qv_ref[:, 1:2], qv_ref[:, 2:3]
        qnx, qny, qnz = cross3(qux, quy, quz, qvx, qvy, qvz)
        nn = jnp.maximum(dot3(qnx, qny, qnz, qnx, qny, qnz), 1e-30)
        inv_nn = 1.0 / nn
        qdp = dot3(qnx, qny, qnz, qcx, qcy, qcz)
        avx, avy, avz = cross3(qvx, qvy, qvz, qnx, qny, qnz)
        avx, avy, avz = avx * inv_nn, avy * inv_nn, avz * inv_nn
        qca = dot3(avx, avy, avz, qcx, qcy, qcz)
        bvx, bvy, bvz = cross3(qnx, qny, qnz, qux, quy, quz)
        bvx, bvy, bvz = bvx * inv_nn, bvy * inv_nn, bvz * inv_nn
        qcb = dot3(bvx, bvy, bvz, qcx, qcy, qcz)

        # w = n/(n.n) as explicit columns: the quad surrogate adjoints
        # (silhouette edges + NEE soft shadow) differentiate through it
        wqvec_x = qnx * inv_nn
        wqvec_y = qny * inv_nn
        wqvec_z = qnz * inv_nn

        # rows-sized iotas only in monolithic mode (streamed mode never
        # materializes a (rows, TR) matrix); the full-surrogate row iotas
        # only when that class runs dense surrogates
        row_ids = (None if row_chunk
                   else jax.lax.broadcasted_iota(jnp.int32, (na, tr), 0))
        srow_ids = (jax.lax.broadcasted_iota(jnp.int32, (ns, tr), 0)
                    if surr_s is None and not row_chunk else None)
        qrow_ids = (jax.lax.broadcasted_iota(jnp.int32, (nq, tr), 0)
                    if surr_q is None and not row_chunk else None)
        mrow_ids = (None if row_chunk
                    else jax.lax.broadcasted_iota(jnp.int32, (nm, tr), 0))
        lrow_ids = jax.lax.broadcasted_iota(jnp.int32, (nl, tr), 0)
        sval = (scx < 1e29).astype(jnp.float32)          # (ns,1) real spheres
        qval = (qcx < 1e29).astype(jnp.float32)          # (nq,1) real quads

        # ---- surrogate row subsets (VERDICT r3 #1) --------------------
        # Column bundles the surrogate fns consume: full (all rows) or a
        # static-row gather (concat of 1-row slices — static indices, so
        # Mosaic lowers them as views). `rows` is the kernel row id per
        # sublane for winner matching; `scat` the (n_full, k) one-hot
        # that scatters reduced (k, 8/16) grads back to full table rows.
        def _pad_rows(idx):
            """Pad a row subset to a whole sublane group (min 8) with
            inert None rows: sub-8 (k, 1) constants trip a Mosaic
            concatenate layout bug (measured at k=1), and aligned
            sublane groups lay out better regardless. Pads gather row 0
            (finite values), carry id -1 (matches no winner), valid 0
            (every surrogate term gated off) and an all-zero scatter
            column (contribute nothing) — exactly inert."""
            k = len(idx)
            kp = max(8, ((k + 7) // 8) * 8)
            return tuple(idx) + (None,) * (kp - k)

        def _ids_const(idx):
            return jnp.concatenate(
                [jnp.full((1, 1), -1 if i is None else int(i), jnp.int32)
                 for i in idx], axis=0)

        def _scat_const(n_full, idx):
            col = jax.lax.broadcasted_iota(jnp.int32, (n_full, 1), 0)
            return jnp.concatenate(
                [(col == (-1 if i is None else int(i))).astype(jnp.float32)
                 for i in idx], axis=1)

        def _gather_rows(a, idx):
            return jnp.concatenate(
                [a[0:1] if i is None else a[i:i + 1] for i in idx], axis=0)

        def _pad_mask(idx):
            return jnp.concatenate(
                [jnp.full((1, 1), 0.0 if i is None else 1.0, jnp.float32)
                 for i in idx], axis=0)

        # Streamed DENSE surrogates (round 5): with row_chunk set and a
        # class left dense (surr None), its surrogate sweeps fold over
        # row chunks like the candidate sweep — per-chunk bundles built
        # from the refs feed the SAME surrogate functions, per-row grads
        # write straight into the output tables, and the shared-chain
        # cotangents accumulate in (1, TR) fori carries. Full-rank
        # large-N fits (every sphere trained) thus keep a fused step.
        stream_dense_s = bool(row_chunk) and surr_s is None
        stream_dense_q = bool(row_chunk) and surr_q is None
        scols = dict(scx=scx, scy=scy, scz=scz, sr=sr, val=sval,
                     rows=srow_ids, k=ns, scat=None)
        if surr_s is None:
            scols_t = None if row_chunk else scols
        elif len(surr_s) == 0:
            scols_t = None
        else:
            sp = _pad_rows(surr_s)
            scols_t = dict(
                scx=_gather_rows(scx, sp),
                scy=_gather_rows(scy, sp),
                scz=_gather_rows(scz, sp),
                sr=_gather_rows(sr, sp),
                val=_gather_rows(sval, sp) * _pad_mask(sp),
                rows=_ids_const(sp), k=len(sp),
                scat=_scat_const(ns, sp))
        qcols = dict(qcx=qcx, qcy=qcy, qcz=qcz,
                     qux=qux, quy=quy, quz=quz,
                     qvx=qvx, qvy=qvy, qvz=qvz,
                     qnx=qnx, qny=qny, qnz=qnz, qdp=qdp, inv_nn=inv_nn,
                     wx=wqvec_x, wy=wqvec_y, wz=wqvec_z,
                     val=qval, rows=qrow_ids, k=nq, scat=None)
        if surr_q is None:
            qcols_t = None if row_chunk else qcols
        elif len(surr_q) == 0:
            qcols_t = None
        else:
            qp = _pad_rows(surr_q)
            qcols_t = dict(
                {kk_: _gather_rows(qcols[kk_], qp)
                 for kk_ in ("qcx", "qcy", "qcz", "qux", "quy", "quz",
                             "qvx", "qvy", "qvz", "qnx", "qny", "qnz",
                             "qdp", "inv_nn", "wx", "wy", "wz")},
                val=_gather_rows(qcols["val"], qp) * _pad_mask(qp),
                rows=_ids_const(qp), k=len(qp),
                scat=_scat_const(nq, qp))

        def closest_hit(ox, oy, oz, dx, dy, dz):
            """-> best_t (1,TR), row i32 (1,TR), hit bool (1,TR)."""
            ocx = ox - scx
            ocy = oy - scy
            ocz = oz - scz
            half_b = ocx * dx + ocy * dy + ocz * dz
            c_term = ocx * ocx + ocy * ocy + ocz * ocz - sr2
            disc = half_b * half_b - c_term
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = -half_b - sq
            t1 = -half_b + sq
            # no (t < _MISS) guard: real-row t is bounded ~1e5 and inert
            # pad rows are rejected by the disc guard below (their
            # half_b^2 / c_term overflow to inf: disc is NaN or -inf,
            # never >= 0), so the bound check is vacuous — 4 VPU ops
            # saved per (prim, ray)
            ts = jnp.where(t0 >= _T_MIN, t0,
                           jnp.where(t1 >= _T_MIN, t1, _MISS))
            ts = jnp.where(disc >= 0.0, ts, _MISS)

            den = qnx * dx + qny * dy + qnz * dz
            # grazing-ray validity guard (megakernel._quad_best)
            ok_den = jnp.abs(den) >= 1e-12
            den = jnp.where(ok_den, den, 1e-12)
            tq = (qdp - (qnx * ox + qny * oy + qnz * oz)) / den
            al = (avx * ox + avy * oy + avz * oz) + tq * (
                avx * dx + avy * dy + avz * dz) - qca
            be = (bvx * ox + bvy * oy + bvz * oz) + tq * (
                bvx * dx + bvy * dy + bvz * dz) - qcb
            ok = (ok_den & (tq >= _T_MIN)
                  & (al >= 0.0) & (al < 1.0) & (be >= 0.0) & (be < 1.0))
            tq = jnp.where(ok, tq, _MISS)

            t_all = jnp.concatenate([ts, tq], axis=0)
            best_t = jnp.min(t_all, axis=0, keepdims=True)
            row = jnp.min(
                jnp.where(t_all == best_t, row_ids, na), axis=0, keepdims=True
            )
            hit = best_t < _MISS
            return best_t, jnp.minimum(row, na - 1), hit

        def _fold_chunk(ts, base, best, rowf):
            """Strict-< min-fold of one (C, TR) candidate block into the
            running winner — exactly megakernel._fold_chunk: earliest
            block wins cross-block ties, first-index-at-min within a
            block, so the result equals the monolithic min +
            first-index rule bit for bit. Re-tested overlap rows of a
            clamped tail block never win on equality."""
            c = ts.shape[0]
            bt = jnp.min(ts, axis=0, keepdims=True)
            rows = jax.lax.broadcasted_iota(jnp.int32, (c, tr), 0) + base
            first = jnp.min(
                jnp.where(ts == bt, rows, na),
                axis=0, keepdims=True).astype(jnp.float32)
            upd = bt < best
            return (jnp.where(upd, bt, best),
                    jnp.where(upd, first, rowf))

        def closest_hit_chunked(ox, oy, oz, dx, dy, dz):
            """Row-streamed candidate sweep (VERDICT r4 #3): fori folds
            `row_chunk`-row blocks of the scene refs through a running
            (best_t, winner row); peak VMEM is ONE block's
            intermediates. Quad derived columns (n, a/ca, b/cb, dp) are
            recomputed per (C, 1) block — the same formulas the kernel
            prologue applies to the full columns, so candidates are
            bit-identical. Pad rows self-reject exactly as in the
            monolithic test (sphere 1e30 centers -> NaN disc; quad zero
            u/v -> |den| < 1e-12). -> (best_t, row i32, hit)."""
            best = jnp.full((1, tr), _MISS, jnp.float32)
            rowf = jnp.full((1, tr), float(na), jnp.float32)

            c = min(row_chunk, ns)
            n_ch = -(-ns // c)

            def sph_body(i, st_):
                best, rowf = st_
                base = jnp.minimum(i * c, ns - c)
                blk = sphc_ref[pl.ds(base, c), :]            # (C, 3)
                rb = sphr_ref[pl.ds(base, c), 0:1]
                ocx = ox - blk[:, 0:1]
                ocy = oy - blk[:, 1:2]
                ocz = oz - blk[:, 2:3]
                half_b = ocx * dx + ocy * dy + ocz * dz
                c_term = ocx * ocx + ocy * ocy + ocz * ocz - rb * rb
                disc = half_b * half_b - c_term
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t0 = -half_b - sq
                t1 = -half_b + sq
                ts = jnp.where(t0 >= _T_MIN, t0,
                               jnp.where(t1 >= _T_MIN, t1, _MISS))
                ts = jnp.where(disc >= 0.0, ts, _MISS)
                return _fold_chunk(ts, base, best, rowf)

            best, rowf = jax.lax.fori_loop(0, n_ch, sph_body, (best, rowf))

            cq = min(row_chunk, nq)
            n_chq = -(-nq // cq)

            def quad_body(i, st_):
                best, rowf = st_
                base = jnp.minimum(i * cq, nq - cq)
                qcb_ = qc_ref[pl.ds(base, cq), :]            # (C, 3)
                qub_ = qu_ref[pl.ds(base, cq), :]
                qvb_ = qv_ref[pl.ds(base, cq), :]
                cqcx, cqcy, cqcz = qcb_[:, 0:1], qcb_[:, 1:2], qcb_[:, 2:3]
                cqux, cquy, cquz = qub_[:, 0:1], qub_[:, 1:2], qub_[:, 2:3]
                cqvx, cqvy, cqvz = qvb_[:, 0:1], qvb_[:, 1:2], qvb_[:, 2:3]
                nxc, nyc, nzc = cross3(cqux, cquy, cquz, cqvx, cqvy, cqvz)
                nnc = jnp.maximum(
                    dot3(nxc, nyc, nzc, nxc, nyc, nzc), 1e-30)
                invc = 1.0 / nnc
                dpc = dot3(nxc, nyc, nzc, cqcx, cqcy, cqcz)
                axc, ayc, azc = cross3(cqvx, cqvy, cqvz, nxc, nyc, nzc)
                axc, ayc, azc = axc * invc, ayc * invc, azc * invc
                cac = dot3(axc, ayc, azc, cqcx, cqcy, cqcz)
                bxc, byc, bzc = cross3(nxc, nyc, nzc, cqux, cquy, cquz)
                bxc, byc, bzc = bxc * invc, byc * invc, bzc * invc
                cbc = dot3(bxc, byc, bzc, cqcx, cqcy, cqcz)
                den = nxc * dx + nyc * dy + nzc * dz
                ok_den = jnp.abs(den) >= 1e-12
                den = jnp.where(ok_den, den, 1e-12)
                tq = (dpc - (nxc * ox + nyc * oy + nzc * oz)) / den
                al = (axc * ox + ayc * oy + azc * oz) + tq * (
                    axc * dx + ayc * dy + azc * dz) - cac
                be = (bxc * ox + byc * oy + bzc * oz) + tq * (
                    bxc * dx + byc * dy + bzc * dz) - cbc
                ok = (ok_den & (tq >= _T_MIN)
                      & (al >= 0.0) & (al < 1.0)
                      & (be >= 0.0) & (be < 1.0))
                ts = jnp.where(ok, tq, _MISS)
                return _fold_chunk(ts, ns + base, best, rowf)

            best, rowf = jax.lax.fori_loop(
                0, n_chq, quad_body, (best, rowf))
            row = jnp.minimum(rowf.astype(jnp.int32), na - 1)
            return best, row, best < _MISS

        if row_chunk:
            closest_hit = closest_hit_chunked

        def payload_chunked(rowi):
            """(32, TR) winner payload: fori over (C, 32) sublane slices
            of the transposed payload; payw = sum_blocks block.T @
            onehot_block, overlap rows of a clamped tail block masked
            out (megakernel.payload_chunked's construction)."""
            c = min(row_chunk, na)
            n_ch = -(-na // c)

            def body(i, payw):
                s_begin = i * c
                base = jnp.minimum(s_begin, na - c)
                blk = payT_ref[pl.ds(base, c), :]            # (C, 32)
                rows = (jax.lax.broadcasted_iota(jnp.int32, (c, tr), 0)
                        + base)
                oh = ((rows == rowi)
                      & (rows >= s_begin)).astype(jnp.float32)
                return payw + jax.lax.dot_general(
                    blk, oh,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                            # (32, TR)

            return jax.lax.fori_loop(
                0, n_ch, body, jnp.zeros((32, tr), jnp.float32))

        def acc_table_chunked(ref, n_rows, base0, rowi, G):
            """Chunked one-hot parameter accumulation (streamed mode):
            for each `row_chunk` block of table rows, build the (C, TR)
            winner one-hot and add the (C, K) MXU product straight into
            the output table slice — the in-place twin of
            cl(onehot, G). `base0` maps table rows to kernel winner
            rows (0 for spheres/materials, ns for quads)."""
            c = min(row_chunk, n_rows)
            n_ch = -(-n_rows // c)

            def body(i, _):
                s_begin = i * c
                base = jnp.minimum(s_begin, n_rows - c)
                rows = (jax.lax.broadcasted_iota(jnp.int32, (c, tr), 0)
                        + base + base0)
                oh = ((rows == rowi)
                      & (rows >= s_begin + base0)).astype(jnp.float32)
                ref[pl.ds(base, c), :] = ref[pl.ds(base, c), :] + cl(oh, G)
                return 0

            jax.lax.fori_loop(0, n_ch, body, 0)

        # ---- streamed DENSE surrogate machinery (round 5) -------------
        # Per-chunk column bundles in the exact shape the surrogate fns
        # consume; the tail-clamped overlap rows carry val=0 so they
        # contribute nothing twice (product factors 1, grads 0).
        def _sph_chunk_bundle(i):
            c = min(row_chunk, ns)
            s_begin = i * c
            base = jnp.minimum(s_begin, ns - c)
            blk = sphc_ref[pl.ds(base, c), :]
            rb = sphr_ref[pl.ds(base, c), 0:1]
            rows = jax.lax.broadcasted_iota(jnp.int32, (c, tr), 0) + base
            col = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0) + base
            valm = ((blk[:, 0:1] < 1e29)
                    & (col >= s_begin)).astype(jnp.float32)
            return base, c, dict(
                scx=blk[:, 0:1], scy=blk[:, 1:2], scz=blk[:, 2:3],
                sr=rb, val=valm, rows=rows, k=c, scat=None)

        def _quad_chunk_bundle(i):
            c = min(row_chunk, nq)
            s_begin = i * c
            base = jnp.minimum(s_begin, nq - c)
            qcb = qc_ref[pl.ds(base, c), :]
            qub = qu_ref[pl.ds(base, c), :]
            qvb = qv_ref[pl.ds(base, c), :]
            cqcx, cqcy, cqcz = qcb[:, 0:1], qcb[:, 1:2], qcb[:, 2:3]
            cqux, cquy, cquz = qub[:, 0:1], qub[:, 1:2], qub[:, 2:3]
            cqvx, cqvy, cqvz = qvb[:, 0:1], qvb[:, 1:2], qvb[:, 2:3]
            nxc, nyc, nzc = cross3(cqux, cquy, cquz, cqvx, cqvy, cqvz)
            nnc = jnp.maximum(dot3(nxc, nyc, nzc, nxc, nyc, nzc), 1e-30)
            invc = 1.0 / nnc
            dpc = dot3(nxc, nyc, nzc, cqcx, cqcy, cqcz)
            rows = jax.lax.broadcasted_iota(jnp.int32, (c, tr), 0) + base
            col = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0) + base
            valm = ((cqcx < 1e29) & (col >= s_begin)).astype(jnp.float32)
            return base, c, dict(
                qcx=cqcx, qcy=cqcy, qcz=cqcz,
                qux=cqux, quy=cquy, quz=cquz,
                qvx=cqvx, qvy=cqvy, qvz=cqvz,
                qnx=nxc, qny=nyc, qnz=nzc, qdp=dpc, inv_nn=invc,
                wx=nxc * invc, wy=nyc * invc, wz=nzc * invc,
                val=valm, rows=rows, k=c, scat=None)

        def _soft_v_stream(g, bundle_of, n_rows):
            """Full soft-visibility product via a chunked log-sum fold."""
            c = min(row_chunk, n_rows)
            n_ch = -(-n_rows // c)
            is_sph = bundle_of is _sph_chunk_bundle

            def body(i, logv):
                _, _, sc = bundle_of(i)
                f = (softshadow_fwd(g, sc) if is_sph
                     else quad_softshadow_fwd(g, sc))
                vs = f["vs"] if is_sph else f["vq"]
                return logv + jnp.sum(
                    jnp.log(jnp.maximum(vs, 1e-30)), axis=0, keepdims=True)

            return jnp.exp(jax.lax.fori_loop(
                0, n_ch, body, jnp.zeros((1, tr), jnp.float32)))

        def _row_tab(grads, c, width, off=0):
            """[(c,TR) grads] -> (c, width) table block (lane-reduced)."""
            one = jnp.ones((1, tr), jnp.float32)
            cols = [jnp.zeros((c, 1), jnp.float32)] * off + [
                cl(m, one) for m in grads]
            cols += [jnp.zeros((c, 1), jnp.float32)] * (
                width - len(cols))
            return jnp.concatenate(cols, axis=1)

        def _sph_soft_adj_stream(v_all, cv, g):
            c = min(row_chunk, ns)
            n_ch = -(-ns // c)

            def body(i, carry):
                base, c_, sc = _sph_chunk_bundle(i)
                ss = softshadow_fwd(g, sc)
                (cscx, cscy, cscz, csr, cpx_c, cpy_c, cpz_c,
                 cwlx_c, cwly_c, cwlz_c, cdist_c) = softshadow_adj(
                    ss, v_all, cv, g, sc)
                tab = _row_tab((cscx, cscy, cscz, csr), c_, 8)
                dsph_ref[pl.ds(base, c_), :] = (
                    dsph_ref[pl.ds(base, c_), :] + tab)
                return tuple(a + b for a, b in zip(
                    carry, (cpx_c, cpy_c, cpz_c,
                            cwlx_c, cwly_c, cwlz_c, cdist_c)))

            z = jnp.zeros((1, tr), jnp.float32)
            return jax.lax.fori_loop(0, n_ch, body, (z,) * 7)

        def _quad_soft_adj_stream(v_all, cv, g):
            c = min(row_chunk, nq)
            n_ch = -(-nq // c)

            def body(i, carry):
                base, c_, qc = _quad_chunk_bundle(i)
                qs = quad_softshadow_fwd(g, qc)
                qout = quad_softshadow_adj(qs, v_all, cv, g, qc)
                tab = _row_tab(qout[:9], c_, 16)
                dquad_ref[pl.ds(base, c_), :] = (
                    dquad_ref[pl.ds(base, c_), :] + tab)
                return tuple(a + b for a, b in zip(carry, qout[9:15]))

            z = jnp.zeros((1, tr), jnp.float32)
            return jax.lax.fori_loop(0, n_ch, body, (z,) * 6)

        def _sph_sil_stream(st_, best_t_, rowf_, cF):
            c = min(row_chunk, ns)
            n_ch = -(-ns // c)

            def body(i, _):
                base, c_, sc = _sph_chunk_bundle(i)
                s1 = silhouette_adj(st_, best_t_, rowf_, cF, sc)
                tab = _row_tab(s1, c_, 8)
                dsph_ref[pl.ds(base, c_), :] = (
                    dsph_ref[pl.ds(base, c_), :] + tab)
                return 0

            jax.lax.fori_loop(0, n_ch, body, 0)

        def _quad_sil_stream(st_, best_t_, rowf_, cF):
            c = min(row_chunk, nq)
            n_ch = -(-nq // c)

            def body(i, _):
                base, c_, qc = _quad_chunk_bundle(i)
                qsil = quad_silhouette_adj(st_, best_t_, rowf_, cF, qc)
                tab = _row_tab(qsil, c_, 16)
                dquad_ref[pl.ds(base, c_), :] = (
                    dquad_ref[pl.ds(base, c_), :] + tab)
                return 0

            jax.lax.fori_loop(0, n_ch, body, 0)

        def raygen(s):
            sample_id = spp_offset + s.astype(jnp.uint32)
            r1, r2_, r3, r4 = _uniform4(pid, sample_id, jnp.uint32(0), seed)
            u = (px + r1) * inv_w1
            v = (py + r2_) * inv_h1
            rad = jnp.sqrt(r3)
            th = _TWO_PI * r4
            ox = pos_x + rad * jnp.cos(th) * dux + rad * jnp.sin(th) * dvx
            oy = pos_y + rad * jnp.cos(th) * duy + rad * jnp.sin(th) * dvy
            oz = pos_z + rad * jnp.cos(th) * duz + rad * jnp.sin(th) * dvz
            tx = ul_x + u * hx - v * vx - ox
            ty = ul_y + u * hy - v * vy - oy
            tz = ul_z + u * hz - v * vz - oz
            dx, dy, dz = _normalize3(tx, ty, tz)
            return ox, oy, oz, dx, dy, dz, sample_id

        # ---------------------------------------------------------------
        # shade: all per-bounce intermediates from (state, winner, vis).
        # Used by the forward phases (to advance state / accumulate color)
        # and by the adjoint (same values, then reversed). Everything is
        # recomputed rather than stored: VPU FLOPs are cheaper than VMEM.
        # ---------------------------------------------------------------
        def shade(sample_id, b_u32, st, best_t, rowf):
            (ox, oy, oz, dx, dy, dz, tr_, tg_, tb_, alive_f, pd_f) = st
            g = {}
            if row_chunk:
                payw = payload_chunked(rowf.astype(jnp.int32))  # (32, TR)
            else:
                onehot = (row_ids == rowf.astype(jnp.int32)).astype(
                    jnp.float32)
                payw = mm(pay_ref[:, :], onehot)        # (32, TR)

            def pw(i):
                return payw[i:i + 1, :]

            isq = pw(_P_ISQ)
            wcx, wcy, wcz = pw(_P_C), pw(_P_C + 1), pw(_P_C + 2)
            nhx, nhy, nhz = pw(_P_NH), pw(_P_NH + 1), pw(_P_NH + 2)
            kind = pw(_P_KIND)
            war, wag, wab = pw(_P_ALB), pw(_P_ALB + 1), pw(_P_ALB + 2)
            wfuzz = pw(_P_FUZZ)
            wior = pw(_P_IOR)
            wer, weg, web = pw(_P_EMIT), pw(_P_EMIT + 1), pw(_P_EMIT + 2)
            wmat = pw(_P_MAT)
            wrad = pw(_P_RAD)
            wqcx, wqcy, wqcz = pw(_P_QC), pw(_P_QC + 1), pw(_P_QC + 2)
            wqux, wquy, wquz = pw(_P_QU), pw(_P_QU + 1), pw(_P_QU + 2)
            wqvx, wqvy, wqvz = pw(_P_QV), pw(_P_QV + 1), pw(_P_QV + 2)

            hit = best_t < _MISS
            alive = alive_f > 0.5
            hit_live = alive & hit
            miss_live = alive & ~hit
            hlf = hit_live.astype(jnp.float32)
            mlf = miss_live.astype(jnp.float32)

            # differentiable winner t (prim_t semantics)
            ocx = ox - wcx
            ocy = oy - wcy
            ocz = oz - wcz
            hb = dot3(ocx, ocy, ocz, dx, dy, dz)
            cterm = dot3(ocx, ocy, ocz, ocx, ocy, ocz) - wrad * wrad
            disc = hb * hb - cterm
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            sq_safe = jnp.maximum(sq, 1e-8)
            t0 = -hb - sq
            t1 = -hb + sq
            use0 = t0 >= _T_MIN   # (t0 < _MISS) vacuous: see closest_hit
            t_sph = jnp.where(use0, t0, t1)
            # quad plane
            wnx, wny, wnz = cross3(wqux, wquy, wquz, wqvx, wqvy, wqvz)
            dden = dot3(wnx, wny, wnz, dx, dy, dz)
            dden = jnp.where(jnp.abs(dden) < 1e-12, 1e-12, dden)
            num = dot3(wnx, wny, wnz, wqcx - ox, wqcy - oy, wqcz - oz)
            t_quad = num / dden
            quad_w = isq > 0.5
            t_diff = jnp.where(quad_w, t_quad, t_sph)
            t = jnp.where(hit, t_diff, 1.0)

            p_x = ox + t * dx
            p_y = oy + t * dy
            p_z = oz + t * dz

            # outward normal + face flip
            mx_ = p_x - wcx
            my_ = p_y - wcy
            mz_ = p_z - wcz
            rho = jnp.sqrt(jnp.maximum(dot3(mx_, my_, mz_, mx_, my_, mz_),
                                       1e-24))
            sx_o = mx_ / rho
            sy_o = my_ / rho
            sz_o = mz_ / rho
            qlen = jnp.sqrt(jnp.maximum(
                dot3(wnx, wny, wnz, wnx, wny, wnz), 1e-24))
            qx_o = wnx / qlen
            qy_o = wny / qlen
            qz_o = wnz / qlen
            n_ox = jnp.where(quad_w, qx_o, sx_o)
            n_oy = jnp.where(quad_w, qy_o, sy_o)
            n_oz = jnp.where(quad_w, qz_o, sz_o)
            front = dot3(dx, dy, dz, n_ox, n_oy, n_oz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            nx_ = n_ox * sgn
            ny_ = n_oy * sgn
            nz_ = n_oz * sgn

            is_lam = kind < 0.5
            is_met = (kind >= 0.5) & (kind < 1.5)
            is_die = (kind >= 1.5) & (kind < 2.5)
            is_light = kind >= 2.5

            # emission gate (NEE skip rule: trace.py)
            if nee:
                nee_sampled = quad_w & is_light
                gate_e = hlf * (1.0 - pd_f * nee_sampled.astype(jnp.float32))
            else:
                gate_e = hlf

            # --- NEE sample geometry ---------------------------------
            if nee and n_lights > 0:
                nu1, nu2, nu3, _ = _uniform4(
                    pid, sample_id, jnp.uint32(0x40000000) + b_u32, seed
                )
                kpick = jnp.clip((nu3 * nlf).astype(jnp.int32), 0,
                                 n_lights - 1)
                lone = (lrow_ids == kpick).astype(jnp.float32)  # (nl, TR)
                lsel = mm(lpay_ref[:, :], lone)                 # (16, TR)

                def lw(i):
                    return lsel[i:i + 1, :]

                lcx, lcy, lcz = lw(0), lw(1), lw(2)
                lux, luy, luz = lw(3), lw(4), lw(5)
                lvx, lvy, lvz = lw(6), lw(7), lw(8)
                ler, leg, leb = lw(9), lw(10), lw(11)
                yx = lcx + nu1 * lux + nu2 * lvx
                yy = lcy + nu1 * luy + nu2 * lvy
                yz = lcz + nu1 * luz + nu2 * lvz
                tlx = yx - p_x
                tly = yy - p_y
                tlz = yz - p_z
                r2l = dot3(tlx, tly, tlz, tlx, tly, tlz)
                r2g = jnp.maximum(r2l, 1e-12)
                dist = jnp.sqrt(r2g)
                idist = 1.0 / dist
                wlx = tlx * idist
                wly = tly * idist
                wlz = tlz * idist
                lnx, lny, lnz = cross3(lux, luy, luz, lvx, lvy, lvz)
                area = jnp.sqrt(jnp.maximum(
                    dot3(lnx, lny, lnz, lnx, lny, lnz), 1e-24))
                ainv = 1.0 / area
                lnux = lnx * ainv
                lnuy = lny * ainv
                lnuz = lnz * ainv
                cosx = dot3(nx_, ny_, nz_, wlx, wly, wlz)
                cy_raw = dot3(lnux, lnuy, lnuz, wlx, wly, wlz)
                cosy = jnp.abs(cy_raw)
                graw = cosx * cosy * area * nlf / r2g
                geom = jnp.minimum(graw, 16.0 * jnp.pi)
                activef = (hit_live & is_lam & (cosx > 0.0)).astype(
                    jnp.float32)

                # soft-shadow (all spheres, (ns, TR)); value not needed in
                # the forward (ratio == 1): computed only for the adjoint.
                g.update(nee_vals=dict(
                    nu1=nu1, nu2=nu2, kpick=kpick, lone=lone,
                    lcx=lcx, lcy=lcy, lcz=lcz, lux=lux, luy=luy, luz=luz,
                    lvx=lvx, lvy=lvy, lvz=lvz, ler=ler, leg=leg, leb=leb,
                    yx=yx, yy=yy, yz=yz, tlx=tlx, tly=tly, tlz=tlz,
                    r2l=r2l, r2g=r2g, dist=dist, idist=idist,
                    wlx=wlx, wly=wly, wlz=wlz,
                    lnx=lnx, lny=lny, lnz=lnz, area=area, ainv=ainv,
                    lnux=lnux, lnuy=lnuy, lnuz=lnuz,
                    cosx=cosx, cy_raw=cy_raw, cosy=cosy,
                    graw=graw, geom=geom, activef=activef,
                ))
            # --- scatter ---------------------------------------------
            su1, su2, su3, su4 = _uniform4(
                pid, sample_id, jnp.uint32(1) + b_u32, seed
            )
            theta = _TWO_PI * su1
            cphi = 1.0 - 2.0 * su2
            sphi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cphi * cphi))
            rr = jnp.exp(jnp.log(jnp.maximum(su3, 1e-30)) * (1.0 / 3.0))
            bx = rr * sphi * jnp.cos(theta)
            by = rr * sphi * jnp.sin(theta)
            bz = rr * cphi
            bnorm = jax.lax.rsqrt(
                jnp.maximum(bx * bx + by * by + bz * bz, 1e-24))
            ux_ = bx * bnorm
            uy_ = by * bnorm
            uz_ = bz * bnorm

            # lambertian
            lx = nx_ + ux_
            ly = ny_ + uy_
            lz = nz_ + uz_
            degen = (jnp.abs(lx) < 1e-7) & (jnp.abs(ly) < 1e-7) & (
                jnp.abs(lz) < 1e-7)
            lamx = jnp.where(degen, nx_, lx)
            lamy = jnp.where(degen, ny_, ly)
            lamz = jnp.where(degen, nz_, lz)
            # metal / dielectric chains: compiled out when the scene has
            # no primitive of that kind (see static_kind_flags) — the
            # dropped results are winner-gated selects that can never be
            # taken, so every reachable lane is bit-identical
            if has_met or has_die:
                sdn = dot3(dx, dy, dz, nx_, ny_, nz_)
                rfx = dx - 2.0 * sdn * nx_
                rfy = dy - 2.0 * sdn * ny_
                rfz = dz - 2.0 * sdn * nz_
            if has_met:
                mex = rfx + wfuzz * bx
                mey = rfy + wfuzz * by
                mez = rfz + wfuzz * bz
            if has_die:
                eta = jnp.where(front, 1.0 / jnp.maximum(wior, 1e-6), wior)
                mcos_raw = -(nx_ * dx + ny_ * dy + nz_ * dz)
                cos_clip = mcos_raw < 1.0
                cosv = jnp.minimum(mcos_raw, 1.0)
                sinv = jnp.sqrt(jnp.maximum(0.0, 1.0 - cosv * cosv))
                tir = eta * sinv > 1.0
                sr0 = (1.0 - eta) / (1.0 + eta)
                r0 = sr0 * sr0
                reflp = r0 + (1.0 - r0) * (1.0 - cosv) ** 5
                cref = tir | (reflp > su4)
                ppx = eta * (dx + nx_ * cosv)
                ppy = eta * (dy + ny_ * cosv)
                ppz = eta * (dz + nz_ * cosv)
                plen2 = dot3(ppx, ppy, ppz, ppx, ppy, ppz)
                zk = 1.0 - plen2
                kk = jnp.maximum(jnp.abs(zk), 1e-12)
                par = -jnp.sqrt(kk)
                fx = ppx + par * nx_
                fy = ppy + par * ny_
                fz = ppz + par * nz_
                dnx_die = jnp.where(cref, rfx, fx)
                dny_die = jnp.where(cref, rfy, fy)
                dnz_die = jnp.where(cref, rfz, fz)

            if has_met and has_die:
                dnx = jnp.where(is_lam, lamx,
                                jnp.where(is_met, mex, dnx_die))
                dny = jnp.where(is_lam, lamy,
                                jnp.where(is_met, mey, dny_die))
                dnz = jnp.where(is_lam, lamz,
                                jnp.where(is_met, mez, dnz_die))
            elif has_met:
                dnx = jnp.where(is_lam, lamx, mex)
                dny = jnp.where(is_lam, lamy, mey)
                dnz = jnp.where(is_lam, lamz, mez)
            elif has_die:
                dnx = jnp.where(is_lam, lamx, dnx_die)
                dny = jnp.where(is_lam, lamy, dny_die)
                dnz = jnp.where(is_lam, lamz, dnz_die)
            else:
                dnx, dny, dnz = lamx, lamy, lamz
            invl = jax.lax.rsqrt(
                jnp.maximum(dot3(dnx, dny, dnz, dnx, dny, dnz), 1e-24))
            sdx = dnx * invl
            sdy = dny * invl
            sdz = dnz * invl

            scat = hit_live & ~is_light
            scf = scat.astype(jnp.float32)
            # onehot ((na, TR), the only rows-sized member) deliberately
            # NOT stored: phase 3 saves g per bounce, and holding mb
            # onehots is mb*na*TR*4 bytes of scoped VMEM; bounce_adj
            # recomputes it from the saved winner row (1 compare+cast).
            g.update(
                isq=isq, quad_w=quad_w, hit=hit,
                hit_live=hit_live, miss_live=miss_live, hlf=hlf, mlf=mlf,
                gate_e=gate_e, scat=scat, scf=scf,
                wcx=wcx, wcy=wcy, wcz=wcz, wrad=wrad,
                wqcx=wqcx, wqcy=wqcy, wqcz=wqcz,
                wqux=wqux, wquy=wquy, wquz=wquz,
                wqvx=wqvx, wqvy=wqvy, wqvz=wqvz,
                wnx=wnx, wny=wny, wnz=wnz,
                war=war, wag=wag, wab=wab, wfuzz=wfuzz, wior=wior,
                wer=wer, weg=weg, web=web, wmat=wmat, kind=kind,
                is_lam=is_lam, is_met=is_met, is_die=is_die,
                ocx=ocx, ocy=ocy, ocz=ocz,
                hb=hb, sq=sq, sq_safe=sq_safe, use0=use0, disc=disc,
                dden=dden, num=num, t_sph=t_sph, t_quad=t_quad,
                t_diff=t_diff, t=t, p_x=p_x, p_y=p_y, p_z=p_z,
                mx_=mx_, my_=my_, mz_=mz_, rho=rho,
                sx_o=sx_o, sy_o=sy_o, sz_o=sz_o,
                qx_o=qx_o, qy_o=qy_o, qz_o=qz_o, qlen=qlen,
                n_ox=n_ox, n_oy=n_oy, n_oz=n_oz, front=front, sgn=sgn,
                nx_=nx_, ny_=ny_, nz_=nz_,
                bx=bx, by=by, bz=bz, ux_=ux_, uy_=uy_, uz_=uz_,
                degen=degen, lamx=lamx, lamy=lamy, lamz=lamz,
                dnx=dnx, dny=dny, dnz=dnz, invl=invl,
                sdx=sdx, sdy=sdy, sdz=sdz,
            )
            if has_met or has_die:
                g.update(sdn=sdn, rfx=rfx, rfy=rfy, rfz=rfz)
            if has_die:
                g.update(eta=eta, cosv=cosv, cos_clip=cos_clip, cref=cref,
                         ppx=ppx, ppy=ppy, ppz=ppz, plen2=plen2, zk=zk,
                         kk=kk, par=par, fx=fx, fy=fy, fz=fz)
            return g

        def advance(g, st):
            """Post-scatter state (floats)."""
            (ox, oy, oz, dx, dy, dz, tr_, tg_, tb_, alive_f, pd_f) = st
            scf = g["scf"]
            inv = 1.0 - scf
            return (
                inv * ox + scf * g["p_x"],
                inv * oy + scf * g["p_y"],
                inv * oz + scf * g["p_z"],
                inv * dx + scf * g["sdx"],
                inv * dy + scf * g["sdy"],
                inv * dz + scf * g["sdz"],
                tr_ * (inv + scf * g["war"]),
                tg_ * (inv + scf * g["wag"]),
                tb_ * (inv + scf * g["wab"]),
                scf,
                scf * g["is_lam"].astype(jnp.float32),
            )

        def color_adds(g, st, vis):
            """(dcol_r, dcol_g, dcol_b) of this bounce (forward value)."""
            tr_, tg_, tb_ = st[6], st[7], st[8]
            mlf, gate_e = g["mlf"], g["gate_e"]
            cr = mlf * tr_ * bg_r + gate_e * tr_ * g["wer"]
            cg = mlf * tg_ * bg_g + gate_e * tg_ * g["weg"]
            cb = mlf * tb_ * bg_b + gate_e * tb_ * g["web"]
            if nee and n_lights > 0:
                nv = g["nee_vals"]
                gate_n = nv["activef"] * vis
                s = gate_n * nv["geom"] * (1.0 / jnp.pi)
                cr = cr + s * tr_ * g["war"] * nv["ler"]
                cg = cg + s * tg_ * g["wag"] * nv["leg"]
                cb = cb + s * tb_ * g["wab"] * nv["leb"]
            return cr, cg, cb

        def shadow_vis(g):
            """Detached hard shadow visibility (1,TR) f32 (1 = lit)."""
            if not (nee and n_lights > 0):
                return jnp.ones_like(g["hlf"])
            nv = g["nee_vals"]
            occ_t, _, _ = closest_hit(
                g["p_x"], g["p_y"], g["p_z"],
                nv["wlx"], nv["wly"], nv["wlz"],
            )
            return (~(occ_t < nv["dist"] * (1.0 - 1e-3))).astype(jnp.float32)

        def softshadow_fwd(g, sc):
            """Soft-visibility intermediates, (sc.k, TR) oriented."""
            nv = g["nee_vals"]
            px_, py_, pz_ = g["p_x"], g["p_y"], g["p_z"]
            wlx, wly, wlz = nv["wlx"], nv["wly"], nv["wlz"]
            dist = nv["dist"]
            r_abs = jnp.abs(sc["sr"])
            cxx = sc["scx"] - px_
            cxy = sc["scy"] - py_
            cxz = sc["scz"] - pz_
            s_along = cxx * wlx + cxy * wly + cxz * wlz
            s_cl = jnp.clip(s_along, 0.0, dist)
            ex = px_ + s_cl * wlx - sc["scx"]
            ey = py_ + s_cl * wly - sc["scy"]
            ez = pz_ + s_cl * wlz - sc["scz"]
            dsep = jnp.sqrt(jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-12))
            wsoft = 0.25 * r_abs + 1e-6
            zs = (dsep - r_abs) / wsoft
            vs_raw = jax.nn.sigmoid(zs)
            vs = jnp.where(sc["val"] > 0.5, vs_raw, 1.0)
            # Mosaic has no reduce_prod lowering; exp-sum-log is exact to
            # a few ulp here (vs in (0, 1], floored against log(0)).
            v = jnp.exp(jnp.sum(jnp.log(jnp.maximum(vs, 1e-30)),
                                axis=0, keepdims=True))
            return dict(cxx=cxx, cxy=cxy, cxz=cxz, s_along=s_along,
                        s_cl=s_cl, ex=ex, ey=ey, ez=ez, dsep=dsep,
                        wsoft=wsoft, vs_raw=vs_raw, vs=vs, v=v,
                        r_abs=r_abs, dist=dist)

        def softshadow_adj(ss, v_all, cv, g, sc):
            """VJP of v_soft: cv (1,TR) -> sphere grads (sc.k,TR)x4 and
            (cpx, cpy, cpz, cwlx, cwly, cwlz, cdist) (1,TR). `ss` holds
            sc's rows' intermediates; v_all is the FULL sphere product
            (all rows — the ratio's forward value)."""
            nv = g["nee_vals"]
            wlx, wly, wlz = nv["wlx"], nv["wly"], nv["wlz"]
            vs_c = jnp.maximum(ss["vs"], 1e-6)
            cvs = cv * v_all / vs_c                         # (k,TR)
            cvs = jnp.where(sc["val"] > 0.5, cvs, 0.0)
            s_sig = ss["vs_raw"] * (1.0 - ss["vs_raw"])
            czs = cvs * s_sig
            w2 = ss["wsoft"] * ss["wsoft"]
            csr_abs = czs * (-(ss["wsoft"]) - (ss["dsep"] - ss["r_abs"]) * 0.25) / w2
            cdsep = czs / ss["wsoft"]
            inv_dsep = 1.0 / ss["dsep"]
            cex = cdsep * ss["ex"] * inv_dsep
            cey = cdsep * ss["ey"] * inv_dsep
            cez = cdsep * ss["ez"] * inv_dsep
            # e = p + s_cl*w - c
            cscx = -cex
            cscy = -cey
            cscz = -cez
            cpx = jnp.sum(cex, axis=0, keepdims=True)
            cpy = jnp.sum(cey, axis=0, keepdims=True)
            cpz = jnp.sum(cez, axis=0, keepdims=True)
            cs_cl = cex * wlx + cey * wly + cez * wlz
            cwlx_m = cex * ss["s_cl"]
            cwly_m = cey * ss["s_cl"]
            cwlz_m = cez * ss["s_cl"]
            # s_cl = clip(s_along, 0, dist)
            in_rng = ((ss["s_along"] > 0.0) & (ss["s_along"] < ss["dist"]))
            cs_along = jnp.where(in_rng, cs_cl, 0.0)
            cdist = jnp.sum(
                jnp.where(ss["s_along"] >= ss["dist"], cs_cl, 0.0),
                axis=0, keepdims=True,
            )
            # s_along = (c - p) . w
            cscx = cscx + cs_along * wlx
            cscy = cscy + cs_along * wly
            cscz = cscz + cs_along * wlz
            cpx = cpx - jnp.sum(cs_along * wlx, axis=0, keepdims=True)
            cpy = cpy - jnp.sum(cs_along * wly, axis=0, keepdims=True)
            cpz = cpz - jnp.sum(cs_along * wlz, axis=0, keepdims=True)
            cwlx_m = cwlx_m + cs_along * ss["cxx"]
            cwly_m = cwly_m + cs_along * ss["cxy"]
            cwlz_m = cwlz_m + cs_along * ss["cxz"]
            cwlx = jnp.sum(cwlx_m, axis=0, keepdims=True)
            cwly = jnp.sum(cwly_m, axis=0, keepdims=True)
            cwlz = jnp.sum(cwlz_m, axis=0, keepdims=True)
            csr = csr_abs * jnp.sign(sc["sr"])
            return (cscx, cscy, cscz, csr, cpx, cpy, cpz,
                    cwlx, cwly, cwlz, cdist)

        def silhouette_adj(st, best_t, rowf, cF, sc):
            """VJP of the silhouette factor wrt sphere params.

            cF (1,TR) is the cotangent of the factor (forward value 1);
            o, d, t are detached. Returns (sc.k,TR) grads (cx, cy, cz, r).
            The factor log-factorizes per row, so restricting to a row
            subset is EXACT for those rows' gradients."""
            (ox, oy, oz, dx, dy, dz, _tr, _tg, _tb, alive_f, _pd) = st
            hit = best_t < _MISS
            t_lim = jnp.where(hit, best_t, 3.0e30)
            ws = ((rowf.astype(jnp.int32) == sc["rows"])
                  & hit).astype(jnp.float32)               # (k,TR)
            r_abs = jnp.abs(sc["sr"])
            cox = sc["scx"] - ox
            coy = sc["scy"] - oy
            coz = sc["scz"] - oz
            s_along = cox * dx + coy * dy + coz * dz
            s_hit = jnp.maximum(s_along, _T_MIN)
            s_blk = jnp.clip(s_along, _T_MIN, t_lim)
            s_eff = jnp.where(ws > 0.5, s_hit, s_blk)
            ex = ox + s_eff * dx - sc["scx"]
            ey = oy + s_eff * dy - sc["scy"]
            ez = oz + s_eff * dz - sc["scz"]
            dmin = jnp.sqrt(jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-12))
            wsil = 0.05 * r_abs + 1e-5
            z = (r_abs - dmin) / wsil
            cov = jax.nn.sigmoid(z)
            live = (sc["val"] > 0.5) & (alive_f > 0.5)
            p = jnp.where(ws > 0.5, cov, 1.0 - cov)
            p = jnp.where(live, p, 1.0)
            pc = jnp.maximum(p, 1e-3)
            cp = cF / pc
            sign = jnp.where(ws > 0.5, 1.0, -1.0)
            ccov = jnp.where(live, cp * sign, 0.0)
            cz = ccov * cov * (1.0 - cov)
            w2 = wsil * wsil
            cr_abs = cz * (wsil - (r_abs - dmin) * 0.05) / w2
            cdmin = -cz / wsil
            inv_dmin = 1.0 / dmin
            cex = cdmin * ex * inv_dmin
            cey = cdmin * ey * inv_dmin
            cez = cdmin * ez * inv_dmin
            cscx = -cex
            cscy = -cey
            cscz = -cez
            cs_eff = cex * dx + cey * dy + cez * dz
            m_hit = (s_along > _T_MIN).astype(jnp.float32)
            m_blk = ((s_along > _T_MIN) & (s_along < t_lim)).astype(jnp.float32)
            cs_along = jnp.where(ws > 0.5, m_hit, m_blk) * cs_eff
            cscx = cscx + cs_along * dx
            cscy = cscy + cs_along * dy
            cscz = cscz + cs_along * dz
            csr = cr_abs * jnp.sign(sc["sr"])
            return cscx, cscy, cscz, csr

        # ---- quad boundary surrogates (round-4: VERDICT r3 #2) --------
        # The quad analog of the sphere circle silhouette: soft coverage
        # on the four [0,1) planar-coordinate edges of the segment's
        # plane crossing (ops/trace.py _silhouette_factor quad branch /
        # _nee_contribution quad soft-shadow). Forward factors are
        # exactly 1 (value-preserving ratios), so only the adjoint runs
        # in-kernel. Everything is (nq, TR) dense rows.
        WQE = 0.05     # edge softness, fraction of each edge length

        def quad_cov_fwd(qc, ax, ay, az, bx_, by_, bz_):
            """Plane crossing tpar = (n.c - n.a)/(n.b) + soft edge
            coverage of the segment a + t*b against qc's quad rows."""
            qnx, qny, qnz = qc["qnx"], qc["qny"], qc["qnz"]
            qcx, qcy, qcz = qc["qcx"], qc["qcy"], qc["qcz"]
            qux, quy, quz = qc["qux"], qc["quy"], qc["quz"]
            qvx, qvy, qvz = qc["qvx"], qc["qvy"], qc["qvz"]
            wqvec_x, wqvec_y, wqvec_z = qc["wx"], qc["wy"], qc["wz"]
            den = qnx * bx_ + qny * by_ + qnz * bz_
            den_ok = jnp.abs(den) > 1e-8
            dsafe = jnp.where(den_ok, den, 1.0)
            tpar = (qc["qdp"] - (qnx * ax + qny * ay + qnz * az)) / dsafe
            prx = ax + tpar * bx_ - qcx
            pry = ay + tpar * by_ - qcy
            prz = az + tpar * bz_ - qcz
            al = ((pry * qvz - prz * qvy) * wqvec_x
                  + (prz * qvx - prx * qvz) * wqvec_y
                  + (prx * qvy - pry * qvx) * wqvec_z)
            be = ((quy * prz - quz * pry) * wqvec_x
                  + (quz * prx - qux * prz) * wqvec_y
                  + (qux * pry - quy * prx) * wqvec_z)
            s1 = jax.nn.sigmoid(al * (1.0 / WQE))
            s2 = jax.nn.sigmoid((1.0 - al) * (1.0 / WQE))
            s3 = jax.nn.sigmoid(be * (1.0 / WQE))
            s4 = jax.nn.sigmoid((1.0 - be) * (1.0 / WQE))
            cov = s1 * s2 * s3 * s4
            return dict(den_ok=den_ok, dsafe=dsafe, tpar=tpar,
                        prx=prx, pry=pry, prz=prz,
                        s1=s1, s2=s2, s3=s3, s4=s4, cov=cov)

        def quad_cov_adj(qc, qf, ccov, ax, ay, az, bx_, by_, bz_):
            """VJP of quad_cov_fwd's coverage: ccov (k,TR) -> 9 quad
            grads (k,TR) + segment origin/direction cotangents (1,TR).

            Chain: cov -> (alpha, beta) -> (pr, w(u,v), u, v) -> tpar ->
            (n(u,v), corner). d cov/d alpha = cov (s2 - s1)/WQE (the
            sigmoid-product log-derivative)."""
            qnx, qny, qnz = qc["qnx"], qc["qny"], qc["qnz"]
            qcx, qcy, qcz = qc["qcx"], qc["qcy"], qc["qcz"]
            qux, quy, quz = qc["qux"], qc["quy"], qc["quz"]
            qvx, qvy, qvz = qc["qvx"], qc["qvy"], qc["qvz"]
            wqvec_x, wqvec_y, wqvec_z = qc["wx"], qc["wy"], qc["wz"]
            inv_nn = qc["inv_nn"]
            prx, pry, prz = qf["prx"], qf["pry"], qf["prz"]
            tpar, dsafe = qf["tpar"], qf["dsafe"]
            s1, s2, s3, s4 = qf["s1"], qf["s2"], qf["s3"], qf["s4"]
            cov = qf["cov"]
            cal = ccov * cov * (s2 - s1) * (1.0 / WQE)
            cbe = ccov * cov * (s4 - s3) * (1.0 / WQE)
            # al = (pr x v).w : d/dpr = v x w ; d/dv = w x pr ; d/dw = pr x v
            vxw_x, vxw_y, vxw_z = cross3(
                qvx, qvy, qvz, wqvec_x, wqvec_y, wqvec_z)
            wxp_x, wxp_y, wxp_z = cross3(
                wqvec_x, wqvec_y, wqvec_z, prx, pry, prz)
            pxv_x, pxv_y, pxv_z = cross3(prx, pry, prz, qvx, qvy, qvz)
            cprx = cal * vxw_x
            cpry = cal * vxw_y
            cprz = cal * vxw_z
            cqv_x = cal * wxp_x
            cqv_y = cal * wxp_y
            cqv_z = cal * wxp_z
            cwx = cal * pxv_x
            cwy = cal * pxv_y
            cwz = cal * pxv_z
            # be = (u x pr).w : d/dpr = w x u ; d/du = pr x w ; d/dw = u x pr
            wxu_x, wxu_y, wxu_z = cross3(
                wqvec_x, wqvec_y, wqvec_z, qux, quy, quz)
            pxw_x, pxw_y, pxw_z = cross3(
                prx, pry, prz, wqvec_x, wqvec_y, wqvec_z)
            uxp_x, uxp_y, uxp_z = cross3(qux, quy, quz, prx, pry, prz)
            cprx = cprx + cbe * wxu_x
            cpry = cpry + cbe * wxu_y
            cprz = cprz + cbe * wxu_z
            cqu_x = cbe * pxw_x
            cqu_y = cbe * pxw_y
            cqu_z = cbe * pxw_z
            cwx = cwx + cbe * uxp_x
            cwy = cwy + cbe * uxp_y
            cwz = cwz + cbe * uxp_z
            # w = n * inv_nn : cn = cw*inv_nn - 2 w (w.cw)
            wdc = wqvec_x * cwx + wqvec_y * cwy + wqvec_z * cwz
            cnx_ = cwx * inv_nn - 2.0 * wqvec_x * wdc
            cny_ = cwy * inv_nn - 2.0 * wqvec_y * wdc
            cnz_ = cwz * inv_nn - 2.0 * wqvec_z * wdc
            # pr = a + tpar*b - c
            denf = qf["den_ok"].astype(jnp.float32)
            ctp = (cprx * bx_ + cpry * by_ + cprz * bz_) * denf
            cqc_x = -cprx
            cqc_y = -cpry
            cqc_z = -cprz
            # tpar = N/D, N = n.(c - a), D = n.b
            cN = ctp / dsafe
            cD = -ctp * tpar / dsafe
            cnx_ = cnx_ + cN * (qcx - ax) + cD * bx_
            cny_ = cny_ + cN * (qcy - ay) + cD * by_
            cnz_ = cnz_ + cN * (qcz - az) + cD * bz_
            cqc_x = cqc_x + cN * qnx
            cqc_y = cqc_y + cN * qny
            cqc_z = cqc_z + cN * qnz
            # n = u x v : cu += v x cn ; cv += cn x u
            t1x, t1y, t1z = cross3(qvx, qvy, qvz, cnx_, cny_, cnz_)
            cqu_x = cqu_x + t1x
            cqu_y = cqu_y + t1y
            cqu_z = cqu_z + t1z
            t2x, t2y, t2z = cross3(cnx_, cny_, cnz_, qux, quy, quz)
            cqv_x = cqv_x + t2x
            cqv_y = cqv_y + t2y
            cqv_z = cqv_z + t2z
            ca_x = jnp.sum(cprx - cN * qnx, axis=0, keepdims=True)
            ca_y = jnp.sum(cpry - cN * qny, axis=0, keepdims=True)
            ca_z = jnp.sum(cprz - cN * qnz, axis=0, keepdims=True)
            cb_x = jnp.sum(cprx * tpar + cD * qnx, axis=0, keepdims=True)
            cb_y = jnp.sum(cpry * tpar + cD * qny, axis=0, keepdims=True)
            cb_z = jnp.sum(cprz * tpar + cD * qnz, axis=0, keepdims=True)
            return (cqc_x, cqc_y, cqc_z, cqu_x, cqu_y, cqu_z,
                    cqv_x, cqv_y, cqv_z, ca_x, ca_y, ca_z, cb_x, cb_y, cb_z)

        def quad_silhouette_adj(st, best_t, rowf, cF, qc):
            """VJP of the quad-edge silhouette factor wrt corner/u/v.
            cF (1,TR) is the factor cotangent; rays and winner t are
            detached (ops/trace.py _silhouette_factor quad branch).
            Log-factorizes per row: subset rows are exact."""
            (ox, oy, oz, dx, dy, dz, _tr, _tg, _tb, alive_f, _pd) = st
            hit = best_t < _MISS
            t_lim = jnp.where(hit, best_t, 3.0e30)
            qf = quad_cov_fwd(qc, ox, oy, oz, dx, dy, dz)
            wq_win = ((rowf.astype(jnp.int32) - ns) == qc["rows"]) & hit
            gate = (qf["den_ok"] & (qf["tpar"] > _T_MIN)
                    & (qf["tpar"] < t_lim)).astype(jnp.float32)
            live = (qc["val"] > 0.5) & (alive_f > 0.5)
            p = jnp.where(wq_win, qf["cov"], 1.0 - gate * qf["cov"])
            p = jnp.where(live, p, 1.0)
            pc = jnp.maximum(p, 1e-3)
            cp = cF / pc
            sgn_ev = jnp.where(wq_win, 1.0, -gate)
            ccov = jnp.where(live, cp * sgn_ev, 0.0)
            return quad_cov_adj(qc, qf, ccov, ox, oy, oz, dx, dy, dz)[:9]

        def quad_softshadow_fwd(g, qc):
            """Quad soft-visibility intermediates, (qc.k, TR) oriented."""
            nv = g["nee_vals"]
            qf = quad_cov_fwd(qc, g["p_x"], g["p_y"], g["p_z"],
                              nv["wlx"], nv["wly"], nv["wlz"])
            # hard, detached in-range gate; the sampled light's own plane
            # sits at tpar = dist and is excluded by the 1e-3 slack
            gate = (qf["den_ok"] & (qf["tpar"] > 1e-3)
                    & (qf["tpar"] < nv["dist"] * (1.0 - 1e-3))
                    ).astype(jnp.float32)
            vq_raw = 1.0 - gate * qf["cov"]
            vq = jnp.where(qc["val"] > 0.5, jnp.maximum(vq_raw, 1e-3), 1.0)
            v = jnp.exp(jnp.sum(jnp.log(jnp.maximum(vq, 1e-30)),
                                axis=0, keepdims=True))
            qf.update(gate=gate, vq_raw=vq_raw, vq=vq, v=v)
            return qf

        def quad_softshadow_adj(qs, v_all, cv, g, qc):
            """VJP of the quad soft-visibility product: cv (1,TR) ->
            9 quad grads (qc.k,TR) + (cpx, cpy, cpz, cwlx, cwly, cwlz).
            v_all is the FULL quad product (all rows)."""
            nv = g["nee_vals"]
            cvq = cv * v_all / jnp.maximum(qs["vq"], 1e-6)
            cvq = jnp.where((qc["val"] > 0.5) & (qs["vq_raw"] > 1e-3),
                            cvq, 0.0)
            ccov = -qs["gate"] * cvq
            return quad_cov_adj(qc, qs, ccov, g["p_x"], g["p_y"], g["p_z"],
                                nv["wlx"], nv["wly"], nv["wlz"])

        ones_1tr = jnp.ones((1, tr), jnp.float32)

        def bounce_adj(sample_id, b_py, st, best_t, rowf, vis, g,
                       cin, chat):
            """Reverse one bounce. `st` is the state BEFORE the bounce;
            `g` is the replay's shade dict for this bounce (reused, not
            recomputed); `cin` = (co x3, cd x3, cT x3) cotangents of the
            state AFTER; `chat` = (3,) per-sample color cotangent rows.
            Returns (cout, grad adds)."""
            (ox, oy, oz, dx, dy, dz, T0r, T0g, T0b, alive_f, pd_f) = st
            (cox_in, coy_in, coz_in, cdx_in, cdy_in, cdz_in,
             cTr_in, cTg_in, cTb_in) = cin
            chr_, chg_, chb_ = chat
            scf = g["scf"]
            inv_s = 1.0 - scf
            hlf, mlf, gate_e = g["hlf"], g["mlf"], g["gate_e"]
            nx_, ny_, nz_ = g["nx_"], g["ny_"], g["nz_"]
            T1r, T1g, T1b = T0r, T0g, T0b   # silhouette factor == 1 fwd

            # ---- A5 scatter -------------------------------------------
            cT1r = cTr_in * (inv_s + scf * g["war"])
            cT1g = cTg_in * (inv_s + scf * g["wag"])
            cT1b = cTb_in * (inv_s + scf * g["wab"])
            calb_r = scf * cTr_in * T1r
            calb_g = scf * cTg_in * T1g
            calb_b = scf * cTb_in * T1b
            cpx = scf * cox_in
            cpy = scf * coy_in
            cpz = scf * coz_in
            cox = inv_s * cox_in
            coy = inv_s * coy_in
            coz = inv_s * coz_in
            csdx = scf * cdx_in
            csdy = scf * cdy_in
            csdz = scf * cdz_in
            cdx = inv_s * cdx_in
            cdy = inv_s * cdy_in
            cdz = inv_s * cdz_in
            # sd = dn * invl (normalize VJP)
            sdx, sdy, sdz, invl = g["sdx"], g["sdy"], g["sdz"], g["invl"]
            dot_c = sdx * csdx + sdy * csdy + sdz * csdz
            cdnx = invl * (csdx - sdx * dot_c)
            cdny = invl * (csdy - sdy * dot_c)
            cdnz = invl * (csdz - sdz * dot_c)
            lamf = g["is_lam"].astype(jnp.float32)
            cnx = lamf * cdnx
            cny = lamf * cdny
            cnz = lamf * cdnz
            # metal / dielectric adjoints: compiled out with the forward
            # chains (static_kind_flags). The dropped contributions are
            # exact zeros on every reachable lane (metf/dief gate them),
            # so skipping the additions is value-preserving.
            zal = jnp.zeros_like(cdnx)
            creflx = crefly = creflz = zal
            cfuzz = zal
            cior = zal
            if has_met:
                metf = g["is_met"].astype(jnp.float32)
                creflx = metf * cdnx
                crefly = metf * cdny
                creflz = metf * cdnz
                cfuzz = metf * (g["bx"] * cdnx + g["by"] * cdny
                                + g["bz"] * cdnz)
            if has_die:
                dief = g["is_die"].astype(jnp.float32)
                creff = g["cref"].astype(jnp.float32)
                creflx = creflx + dief * creff * cdnx
                crefly = crefly + dief * creff * cdny
                creflz = creflz + dief * creff * cdnz
                refr_f = dief * (1.0 - creff)
                cfx = refr_f * cdnx
                cfy = refr_f * cdny
                cfz = refr_f * cdnz
                cppx = cfx
                cppy = cfy
                cppz = cfz
                cpar = nx_ * cfx + ny_ * cfy + nz_ * cfz
                cnx = cnx + g["par"] * cfx
                cny = cny + g["par"] * cfy
                cnz = cnz + g["par"] * cfz
                kk, zk = g["kk"], g["zk"]
                live_k = (jnp.abs(zk) > 1e-12).astype(jnp.float32)
                cpl = cpar * 0.5 * jnp.sign(zk) * live_k / jnp.sqrt(kk)
                cppx = cppx + 2.0 * cpl * g["ppx"]
                cppy = cppy + 2.0 * cpl * g["ppy"]
                cppz = cppz + 2.0 * cpl * g["ppz"]
                eta, cosv = g["eta"], g["cosv"]
                ceta = ((dx + nx_ * cosv) * cppx + (dy + ny_ * cosv) * cppy
                        + (dz + nz_ * cosv) * cppz)
                cdx = cdx + eta * cppx
                cdy = cdy + eta * cppy
                cdz = cdz + eta * cppz
                cnx = cnx + eta * cosv * cppx
                cny = cny + eta * cosv * cppy
                cnz = cnz + eta * cosv * cppz
                ccos = eta * (nx_ * cppx + ny_ * cppy + nz_ * cppz)
                clipf = g["cos_clip"].astype(jnp.float32)
                cnd = -ccos * clipf
                cnx = cnx + cnd * dx
                cny = cny + cnd * dy
                cnz = cnz + cnd * dz
                cdx = cdx + cnd * nx_
                cdy = cdy + cnd * ny_
                cdz = cdz + cnd * nz_
                frontf = g["front"].astype(jnp.float32)
                iors = jnp.maximum(g["wior"], 1e-6)
                cior = ceta * (frontf * (-1.0 / (iors * iors))
                               + (1.0 - frontf))
            if has_met or has_die:
                sdn = g["sdn"]
                ndotcr = nx_ * creflx + ny_ * crefly + nz_ * creflz
                cdx = cdx + creflx - 2.0 * ndotcr * nx_
                cdy = cdy + crefly - 2.0 * ndotcr * ny_
                cdz = cdz + creflz - 2.0 * ndotcr * nz_
                cnx = cnx - 2.0 * sdn * creflx - 2.0 * ndotcr * dx
                cny = cny - 2.0 * sdn * crefly - 2.0 * ndotcr * dy
                cnz = cnz - 2.0 * sdn * creflz - 2.0 * ndotcr * dz

            # ---- A4 NEE -----------------------------------------------
            zr = jnp.zeros_like(hlf)
            # surrogate grad accumulators over the TRAINED rows only
            # (scols_t/qcols_t; full tables when no subset was given)
            ks_t = 0 if scols_t is None else scols_t["k"]
            kq_t = 0 if qcols_t is None else qcols_t["k"]
            cs_all = ([jnp.zeros((ks_t, tr), jnp.float32)
                       for _ in range(4)] if ks_t else None)
            cq_all = ([jnp.zeros((kq_t, tr), jnp.float32)
                       for _ in range(9)] if kq_t else None)
            Gl = None
            lone = None
            if nee and n_lights > 0:
                nv = g["nee_vals"]
                lone = nv["lone"]
                gate_n = nv["activef"] * vis
                inv_pi = 1.0 / jnp.pi
                geomf = nv["geom"]
                ler, leg, leb = nv["ler"], nv["leg"], nv["leb"]
                war, wag, wab = g["war"], g["wag"], g["wab"]
                s_base = gate_n * inv_pi
                cT1r = cT1r + s_base * geomf * war * ler * chr_
                cT1g = cT1g + s_base * geomf * wag * leg * chg_
                cT1b = cT1b + s_base * geomf * wab * leb * chb_
                calb_r = calb_r + s_base * geomf * T1r * ler * chr_
                calb_g = calb_g + s_base * geomf * T1g * leg * chg_
                calb_b = calb_b + s_base * geomf * T1b * leb * chb_
                cler = s_base * geomf * T1r * war * chr_
                cleg = s_base * geomf * T1g * wag * chg_
                cleb = s_base * geomf * T1b * wab * chb_
                ghat = s_base * (chr_ * T1r * war * ler
                                 + chg_ * T1g * wag * leg
                                 + chb_ * T1b * wab * leb)
                cgeom = ghat
                cvr = ghat * geomf
                uncl = (nv["graw"] < 16.0 * jnp.pi).astype(jnp.float32)
                cgraw = cgeom * uncl
                # soft-shadow ratio: v_total = v_spheres * v_quads, one
                # shared ratio clamp (product-rule split of the
                # cotangent). In subset mode the products run over the
                # SUBSET rows only: in the unclamped regime the full
                # product cancels exactly (cvs_i = cvr / vs_i), so this
                # is identical to the dense path except when the
                # deep-shadow clamp (v < 1e-3) is tripped by an
                # untrained occluder — and it drops the O(ns) full
                # forward from every adjoint bounce.
                one_tr = jnp.ones((1, tr), jnp.float32)
                ss_t = (softshadow_fwd(g, scols_t)
                        if cs_all is not None else None)
                qs_t = (quad_softshadow_fwd(g, qcols_t)
                        if cq_all is not None else None)
                if ss_t is not None:
                    v_s = ss_t["v"]
                elif stream_dense_s:
                    v_s = _soft_v_stream(g, _sph_chunk_bundle, ns)
                else:
                    v_s = one_tr
                if qs_t is not None:
                    v_q = qs_t["v"]
                elif stream_dense_q:
                    v_q = _soft_v_stream(g, _quad_chunk_bundle, nq)
                else:
                    v_q = one_tr
                vcl = jnp.maximum(v_s * v_q, 1e-3)
                cv_t = cvr / vcl
                cwlx = cwly = cwlz = cdist = zr
                if ss_t is not None:
                    (sscx, sscy, sscz, ssr, cpx_s, cpy_s, cpz_s,
                     cwlx, cwly, cwlz, cdist) = softshadow_adj(
                         ss_t, v_s, cv_t * v_q, g, scols_t)
                    cs_all = [a + b for a, b in zip(
                        cs_all, (sscx, sscy, sscz, ssr))]
                    cpx = cpx + cpx_s
                    cpy = cpy + cpy_s
                    cpz = cpz + cpz_s
                elif stream_dense_s:
                    (cpx_s, cpy_s, cpz_s, cwlx_s, cwly_s, cwlz_s,
                     cdist_s) = _sph_soft_adj_stream(v_s, cv_t * v_q, g)
                    cpx = cpx + cpx_s
                    cpy = cpy + cpy_s
                    cpz = cpz + cpz_s
                    cwlx = cwlx + cwlx_s
                    cwly = cwly + cwly_s
                    cwlz = cwlz + cwlz_s
                    cdist = cdist + cdist_s
                if qs_t is not None:
                    qout = quad_softshadow_adj(
                        qs_t, v_q, cv_t * v_s, g, qcols_t)
                    cq_all = [a + b for a, b in zip(cq_all, qout[:9])]
                    cpx = cpx + qout[9]
                    cpy = cpy + qout[10]
                    cpz = cpz + qout[11]
                    cwlx = cwlx + qout[12]
                    cwly = cwly + qout[13]
                    cwlz = cwlz + qout[14]
                elif stream_dense_q:
                    (cpx_q, cpy_q, cpz_q, cwlx_q, cwly_q,
                     cwlz_q) = _quad_soft_adj_stream(v_q, cv_t * v_s, g)
                    cpx = cpx + cpx_q
                    cpy = cpy + cpy_q
                    cpz = cpz + cpz_q
                    cwlx = cwlx + cwlx_q
                    cwly = cwly + cwly_q
                    cwlz = cwlz + cwlz_q
                # graw = cosx*cosy*area*NL/r2g
                r2g = nv["r2g"]
                area = nv["area"]
                f_cx = cgraw * nv["cosy"] * area * nlf / r2g
                f_cy = cgraw * nv["cosx"] * area * nlf / r2g
                carea = cgraw * nv["cosx"] * nv["cosy"] * nlf / r2g
                live_r2 = (nv["r2l"] > 1e-12).astype(jnp.float32)
                cr2 = -cgraw * nv["graw"] / r2g * live_r2
                cnx = cnx + f_cx * nv["wlx"]
                cny = cny + f_cx * nv["wly"]
                cnz = cnz + f_cx * nv["wlz"]
                cwlx = cwlx + f_cx * nx_
                cwly = cwly + f_cx * ny_
                cwlz = cwlz + f_cx * nz_
                sgn_y = jnp.sign(nv["cy_raw"])
                ccy = f_cy * sgn_y
                clnux = ccy * nv["wlx"]
                clnuy = ccy * nv["wly"]
                clnuz = ccy * nv["wlz"]
                cwlx = cwlx + ccy * nv["lnux"]
                cwly = cwly + ccy * nv["lnuy"]
                cwlz = cwlz + ccy * nv["lnuz"]
                ainv = nv["ainv"]
                clnx = clnux * ainv
                clny = clnuy * ainv
                clnz = clnuz * ainv
                cainv = (nv["lnx"] * clnux + nv["lny"] * clnuy
                         + nv["lnz"] * clnuz)
                carea = carea - ainv * ainv * cainv
                clnx = clnx + carea * nv["lnux"]
                clny = clny + carea * nv["lnuy"]
                clnz = clnz + carea * nv["lnuz"]
                # ln = lu x lv
                clux, cluy, cluz = cross3(
                    nv["lvx"], nv["lvy"], nv["lvz"], clnx, clny, clnz)
                clvx, clvy, clvz = cross3(
                    clnx, clny, clnz, nv["lux"], nv["luy"], nv["luz"])
                # w = tl * idist ; dist = sqrt(max(r2,1e-12)) ; r2 = tl.tl
                idist = nv["idist"]
                ctlx = cwlx * idist
                ctly = cwly * idist
                ctlz = cwlz * idist
                cidist = (nv["tlx"] * cwlx + nv["tly"] * cwly
                          + nv["tlz"] * cwlz)
                cdist = cdist - idist * idist * cidist
                cr2 = cr2 + cdist * 0.5 * idist * live_r2
                ctlx = ctlx + 2.0 * cr2 * nv["tlx"]
                ctly = ctly + 2.0 * cr2 * nv["tly"]
                ctlz = ctlz + 2.0 * cr2 * nv["tlz"]
                # tl = y - p ; y = lc + u1 lu + u2 lv
                cpx = cpx - ctlx
                cpy = cpy - ctly
                cpz = cpz - ctlz
                clcx, clcy, clcz = ctlx, ctly, ctlz
                clux = clux + nv["nu1"] * ctlx
                cluy = cluy + nv["nu1"] * ctly
                cluz = cluz + nv["nu1"] * ctlz
                clvx = clvx + nv["nu2"] * ctlx
                clvy = clvy + nv["nu2"] * ctly
                clvz = clvz + nv["nu2"] * ctlz
                Gl = jnp.concatenate(
                    [clcx, clcy, clcz, clux, cluy, cluz,
                     clvx, clvy, clvz, cler, cleg, cleb,
                     zr, zr, zr, zr], axis=0)            # (16, TR)

            # ---- A3 emission + A2 background --------------------------
            cT1r = cT1r + gate_e * chr_ * g["wer"] + mlf * chr_ * bg_r
            cT1g = cT1g + gate_e * chg_ * g["weg"] + mlf * chg_ * bg_g
            cT1b = cT1b + gate_e * chb_ * g["web"] + mlf * chb_ * bg_b
            cemit_r = gate_e * chr_ * T1r
            cemit_g = gate_e * chg_ * T1g
            cemit_b = gate_e * chb_ * T1b
            cbg_r = mlf * T1r * chr_
            cbg_g = mlf * T1g * chg_
            cbg_b = mlf * T1b * chb_

            # ---- A1 silhouette ----------------------------------------
            if sil and (cs_all is not None or cq_all is not None
                        or stream_dense_s or stream_dense_q):
                cF = cT1r * T0r + cT1g * T0g + cT1b * T0b
                if cs_all is not None:
                    s1 = silhouette_adj(st, best_t, rowf, cF, scols_t)
                    cs_all = [a + b for a, b in zip(cs_all, s1)]
                elif stream_dense_s:
                    _sph_sil_stream(st, best_t, rowf, cF)
                if cq_all is not None:
                    qsil = quad_silhouette_adj(st, best_t, rowf, cF,
                                               qcols_t)
                    cq_all = [a + b for a, b in zip(cq_all, qsil)]
                elif stream_dense_q:
                    _quad_sil_stream(st, best_t, rowf, cF)
            cT0r, cT0g, cT0b = cT1r, cT1g, cT1b

            # ---- A0 normal -> point -> t -> geometry params -----------
            sgn = g["sgn"]
            cnox = sgn * cnx
            cnoy = sgn * cny
            cnoz = sgn * cnz
            quadf = g["isq"]
            sphf = 1.0 - quadf
            # sphere: n_out = m / rho, m = p - c
            rho = g["rho"]
            sd_n = (g["sx_o"] * cnox + g["sy_o"] * cnoy + g["sz_o"] * cnoz)
            cmx = sphf * (cnox - g["sx_o"] * sd_n) / rho
            cmy = sphf * (cnoy - g["sy_o"] * sd_n) / rho
            cmz = sphf * (cnoz - g["sz_o"] * sd_n) / rho
            cpx = cpx + cmx
            cpy = cpy + cmy
            cpz = cpz + cmz
            c_cx = -cmx
            c_cy = -cmy
            c_cz = -cmz
            # quad: n_out = wn / qlen
            qd_n = (g["qx_o"] * cnox + g["qy_o"] * cnoy + g["qz_o"] * cnoz)
            cwnx = quadf * (cnox - g["qx_o"] * qd_n) / g["qlen"]
            cwny = quadf * (cnoy - g["qy_o"] * qd_n) / g["qlen"]
            cwnz = quadf * (cnoz - g["qz_o"] * qd_n) / g["qlen"]
            # p = o + t d
            ct = (cpx * dx + cpy * dy + cpz * dz) * hlf
            cox = cox + cpx
            coy = coy + cpy
            coz = coz + cpz
            cdx = cdx + g["t"] * cpx
            cdy = cdy + g["t"] * cpy
            cdz = cdz + g["t"] * cpz
            # sphere t chain (explicit roots)
            sphtf = sphf * hlf
            sq_safe = g["sq_safe"]
            use0f = g["use0"].astype(jnp.float32)
            root_sgn = 2.0 * use0f - 1.0    # +1 near root, -1 far root
            chb = ct * sphtf * (-1.0 - root_sgn * g["hb"] / sq_safe)
            cct = ct * sphtf * (root_sgn * 0.5 / sq_safe)
            ocx, ocy, ocz = g["ocx"], g["ocy"], g["ocz"]
            cocx = chb * dx + 2.0 * cct * ocx
            cocy = chb * dy + 2.0 * cct * ocy
            cocz = chb * dz + 2.0 * cct * ocz
            crad = cct * (-2.0 * g["wrad"])
            cdx = cdx + chb * ocx
            cdy = cdy + chb * ocy
            cdz = cdz + chb * ocz
            cox = cox + cocx
            coy = coy + cocy
            coz = coz + cocz
            c_cx = c_cx - cocx
            c_cy = c_cy - cocy
            c_cz = c_cz - cocz
            # quad t chain: t = num/den, num = wn.(qc - o), den = wn.d
            qtf = quadf * hlf
            cnum = ct * qtf / g["dden"]
            cden = -ct * qtf * g["t_quad"] / g["dden"]
            cwnx = cwnx + cnum * (g["wqcx"] - ox) + cden * dx
            cwny = cwny + cnum * (g["wqcy"] - oy) + cden * dy
            cwnz = cwnz + cnum * (g["wqcz"] - oz) + cden * dz
            cqc_x = cnum * g["wnx"]
            cqc_y = cnum * g["wny"]
            cqc_z = cnum * g["wnz"]
            cox = cox - cnum * g["wnx"]
            coy = coy - cnum * g["wny"]
            coz = coz - cnum * g["wnz"]
            cdx = cdx + cden * g["wnx"]
            cdy = cdy + cden * g["wny"]
            cdz = cdz + cden * g["wnz"]
            # wn = wqu x wqv
            cqux, cquy, cquz = cross3(
                g["wqvx"], g["wqvy"], g["wqvz"], cwnx, cwny, cwnz)
            cqvx, cqvy, cqvz = cross3(
                cwnx, cwny, cwnz, g["wqux"], g["wquy"], g["wquz"])

            # ---- parameter accumulation matrices ----------------------
            # recomputed, not read from g (see the shade note): 1 op vs
            # mb (na, TR) VMEM residents across the reverse sweep
            Gs = jnp.concatenate(
                [c_cx, c_cy, c_cz, crad, zr, zr, zr, zr], axis=0)  # (8,TR)
            Gq = jnp.concatenate(
                [cqc_x, cqc_y, cqc_z, cqux, cquy, cquz,
                 cqvx, cqvy, cqvz, zr, zr, zr, zr, zr, zr, zr], axis=0)
            Gm = jnp.concatenate(
                [calb_r, calb_g, calb_b, cfuzz, cior,
                 cemit_r, cemit_g, cemit_b], axis=0)                # (8,TR)
            red = lambda m: cl(m, ones_1tr)                         # (k,1)
            s_tab = None
            if cs_all is not None and (sil or (nee and n_lights > 0)):
                s_tab = jnp.concatenate(
                    [red(m) for m in cs_all]
                    + [jnp.zeros((ks_t, 4), jnp.float32)], axis=1)  # (k,8)
                if scols_t["scat"] is not None:
                    s_tab = mm(scols_t["scat"], s_tab)              # (ns,8)
            q_tab = None
            if cq_all is not None and (sil or (nee and n_lights > 0)):
                # quad surrogate rows (edge silhouette + soft shadow)
                q_tab = jnp.concatenate(
                    [red(m) for m in cq_all]
                    + [jnp.zeros((kq_t, 7), jnp.float32)], axis=1)  # (k,16)
                if qcols_t["scat"] is not None:
                    q_tab = mm(qcols_t["scat"], q_tab)              # (nq,16)
            cout = (cox, coy, coz, cdx, cdy, cdz, cT0r, cT0g, cT0b)
            if row_chunk:
                # streamed: chunked one-hot adds straight into the output
                # tables (zeroed once at phase-3 start of program 0);
                # subset surrogate tables are (ns, 8)/(nq, 16)-small and
                # add densely. Only the background triplet stays a loop
                # carry.
                rowi = rowf.astype(jnp.int32)
                acc_table_chunked(dsph_ref, ns, 0, rowi, Gs)
                if s_tab is not None:
                    dsph_ref[...] = dsph_ref[...] + s_tab
                acc_table_chunked(dquad_ref, nq, ns, rowi, Gq)
                if q_tab is not None:
                    dquad_ref[...] = dquad_ref[...] + q_tab
                acc_table_chunked(
                    dmat_ref, nm, 0, g["wmat"].astype(jnp.int32), Gm)
                if Gl is not None:
                    dlight_ref[...] = dlight_ref[...] + cl(lone, Gl)
                return cout, (cbg_r, cbg_g, cbg_b)
            onehot = (row_ids == rowf.astype(jnp.int32)).astype(
                jnp.float32)
            dsph_add = cl(onehot[:ns], Gs)                          # (ns,8)
            if s_tab is not None:
                dsph_add = dsph_add + s_tab
            dquad_add = cl(onehot[ns:], Gq)                         # (nq,16)
            if q_tab is not None:
                dquad_add = dquad_add + q_tab
            monehot = (mrow_ids == g["wmat"].astype(jnp.int32)).astype(
                jnp.float32)
            dmat_add = cl(monehot, Gm)                              # (nm,8)
            if Gl is not None:
                dlight_add = cl(lone, Gl)                           # (nl,16)
            else:
                dlight_add = jnp.zeros((nl, 16), jnp.float32)
            return cout, (dsph_add, dquad_add, dmat_add, dlight_add,
                          cbg_r, cbg_g, cbg_b)

        # ============== phase 1: forward NEE image ====================
        zeros_ = jnp.zeros((1, tr), jnp.float32)
        ones_ = jnp.ones((1, tr), jnp.float32)

        def sample_fwd(s, acc):
            ox, oy, oz, dx, dy, dz, sample_id = raygen(s)
            st0 = (ox, oy, oz, dx, dy, dz, ones_, ones_, ones_, ones_,
                   zeros_)

            def b_body(b, carry):
                st = carry[:11]
                col = carry[11:]
                best_t, row, _hit = closest_hit(
                    st[0], st[1], st[2], st[3], st[4], st[5])
                g = shade(sample_id, b.astype(jnp.uint32), st, best_t, row)
                vis = shadow_vis(g)
                if cache_isect:
                    idx = s * mb + b
                    ct_ref[idx] = best_t
                    cr_ref[idx] = row.astype(jnp.float32)
                    cv_ref[idx] = vis
                dcr, dcg, dcb = color_adds(g, st, vis)
                st2 = advance(g, st)
                return st2 + (col[0] + dcr, col[1] + dcg, col[2] + dcb)

            carry = st0 + (zeros_, zeros_, zeros_)
            carry = jax.lax.fori_loop(0, mb, b_body, carry)
            ar, ag, ab = acc
            return (ar + carry[11], ag + carry[12], ab + carry[13])

        ar, ag, ab = jax.lax.fori_loop(
            0, spp, sample_fwd, (zeros_, zeros_, zeros_))
        inv_spp = 1.0 / float(spp)
        img_r = ar * inv_spp
        img_g = ag * inv_spp
        img_b = ab * inv_spp
        img_ref[0:1, :] = img_r
        img_ref[1:2, :] = img_g
        img_ref[2:3, :] = img_b

        # ============== phase 2: local loss cotangent =================
        # per-lane weight (1 = real pixel, 0 = clamped pad duplicate)
        # arrives as an input row rather than being derived from
        # program_id: under a mesh shard_map the grid is LOCAL to the
        # device, so a program_id-based global lane index would be wrong
        # on every shard but the first
        wgt = wgt_ref[0:1, :]
        dr_ = img_r - tgt_ref[0:1, :]
        dg_ = img_g - tgt_ref[1:2, :]
        db_ = img_b - tgt_ref[2:3, :]
        cscale = 2.0 * wgt / (npixf * 3.0 * float(spp))
        chat = (cscale * dr_, cscale * dg_, cscale * db_)
        # The MSE itself, accumulated in-kernel (this tile's partial):
        # the caller must not recompute it post-kernel — a fused
        # consumer reading the big `target` constant after this custom
        # call has been observed to read corrupted values under jit on
        # TPU, while in-VMEM values are always right.
        lsum = jnp.sum(wgt * (dr_ * dr_ + dg_ * dg_ + db_ * db_)) / (
            npixf * 3.0)

        # ============== phase 3: replay + adjoint =====================
        first = pl.program_id(0) == 0
        if row_chunk:
            # streamed tables accumulate IN PLACE during the sweep:
            # zero them once before program 0's accumulation (later
            # programs keep adding to the running totals)
            @pl.when(first)
            def _():
                dsph_ref[...] = jnp.zeros((ns, 8), jnp.float32)
                dquad_ref[...] = jnp.zeros((nq, 16), jnp.float32)
                dmat_ref[...] = jnp.zeros((nm, 8), jnp.float32)
                dlight_ref[...] = jnp.zeros((nl, 16), jnp.float32)

        def sample_bwd(s, accs):
            if row_chunk:
                (bgr_a, bgg_a, bgb_a) = accs
            else:
                (dsph_a, dquad_a, dmat_a, dlight_a,
                 bgr_a, bgg_a, bgb_a) = accs
            ox, oy, oz, dx, dy, dz, sample_id = raygen(s)
            st = (ox, oy, oz, dx, dy, dz, ones_, ones_, ones_, ones_,
                  zeros_)
            saves = []
            for b in range(mb):                      # python-unrolled
                if cache_isect:
                    idx = s * mb + b
                    best_t = ct_ref[idx]
                    row = cr_ref[idx].astype(jnp.int32)
                    vis = cv_ref[idx]
                    g = shade(sample_id, jnp.uint32(b), st, best_t, row)
                else:
                    best_t, row, _hit = closest_hit(
                        st[0], st[1], st[2], st[3], st[4], st[5])
                    g = shade(sample_id, jnp.uint32(b), st, best_t, row)
                    vis = shadow_vis(g)
                saves.append((st, best_t, row, vis, g))
                st = advance(g, st)
            co = (zeros_,) * 9
            for b in reversed(range(mb)):
                st_b, bt_b, row_b, vis_b, g_b = saves[b]
                co, adds = bounce_adj(sample_id, b, st_b, bt_b, row_b,
                                      vis_b, g_b, co, chat)
                if row_chunk:
                    bgr_a = bgr_a + adds[0]
                    bgg_a = bgg_a + adds[1]
                    bgb_a = bgb_a + adds[2]
                else:
                    dsph_a = dsph_a + adds[0]
                    dquad_a = dquad_a + adds[1]
                    dmat_a = dmat_a + adds[2]
                    dlight_a = dlight_a + adds[3]
                    bgr_a = bgr_a + adds[4]
                    bgg_a = bgg_a + adds[5]
                    bgb_a = bgb_a + adds[6]
            if row_chunk:
                return (bgr_a, bgg_a, bgb_a)
            return (dsph_a, dquad_a, dmat_a, dlight_a, bgr_a, bgg_a, bgb_a)

        if row_chunk:
            accs0 = (zeros_, zeros_, zeros_)
            bgr_a, bgg_a, bgb_a = jax.lax.fori_loop(
                0, spp, sample_bwd, accs0)
        else:
            accs0 = (
                jnp.zeros((ns, 8), jnp.float32),
                jnp.zeros((nq, 16), jnp.float32),
                jnp.zeros((nm, 8), jnp.float32),
                jnp.zeros((nl, 16), jnp.float32),
                zeros_, zeros_, zeros_,
            )
            accs = jax.lax.fori_loop(0, spp, sample_bwd, accs0)
            (dsph_a, dquad_a, dmat_a, dlight_a,
             bgr_a, bgg_a, bgb_a) = accs

        # dmisc: background gradient in row 0 cols 0..2, MSE in col 3
        row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        bsr = jnp.sum(bgr_a)
        bsg = jnp.sum(bgg_a)
        bsb = jnp.sum(bgb_a)
        dmisc = jnp.where(
            (row_i == 0) & (col_i == 0), bsr,
            jnp.where((row_i == 0) & (col_i == 1), bsg,
                      jnp.where((row_i == 0) & (col_i == 2), bsb,
                                jnp.where((row_i == 0) & (col_i == 3),
                                          lsum, 0.0))),
        )

        if row_chunk:
            # tables already accumulated in place; only dmisc remains
            @pl.when(first)
            def _():
                dmisc_ref[...] = dmisc

            @pl.when(jnp.logical_not(first))
            def _():
                dmisc_ref[...] = dmisc_ref[...] + dmisc
        else:
            @pl.when(first)
            def _():
                dsph_ref[...] = dsph_a
                dquad_ref[...] = dquad_a
                dmat_ref[...] = dmat_a
                dlight_ref[...] = dlight_a
                dmisc_ref[...] = dmisc

            @pl.when(jnp.logical_not(first))
            def _():
                dsph_ref[...] = dsph_ref[...] + dsph_a
                dquad_ref[...] = dquad_ref[...] + dquad_a
                dmat_ref[...] = dmat_ref[...] + dmat_a
                dlight_ref[...] = dlight_ref[...] + dlight_a
                dmisc_ref[...] = dmisc_ref[...] + dmisc

    return kernel


def _diff_call(tables, cam_vec, ctl, pid, px, py, wgt, tgt_cols, *,
               spp, max_bounces, n_lights, nm, nee, sil, interpret,
               has_met=True, has_die=True, tr=TILE,
               surr_s=None, surr_q=None, cache_isect=False,
               row_chunk=0):
    """One pallas launch over the given lane arrays (possibly a mesh
    shard's slice — the grid is sized from the LOCAL lane count).

    tr: rays per tile (lane width of every per-ray row). 256 is the
    VPU sweet spot; large (rows x bounces) scenes shrink it to fit the
    reverse sweep in the ~16 MB scoped VMEM (see _classic_tile).

    row_chunk > 0 engages the streamed kernel (see _make_diff_kernel):
    an extra transposed-payload input rides along and the rows-sized
    sweeps fold in `row_chunk` blocks."""
    rp = pid.shape[1]
    ns = tables["sph_c"].shape[0]
    nq = tables["quad_c"].shape[0]
    nl = tables["light_pay"].shape[1]
    kernel = _make_diff_kernel(spp, max_bounces, ns, nq, nm, nl,
                               n_lights, nee, sil, has_met, has_die,
                               surr_s=surr_s, surr_q=surr_q,
                               cache_isect=cache_isect,
                               row_chunk=row_chunk)
    tile = lambda i: (0, i)
    const = lambda i: (0, 0)
    n_tab = 8 if row_chunk else 7
    extra_in = (tables["pay"].T,) if row_chunk else ()
    outs = pl.pallas_call(
        kernel,
        grid=(rp // tr,),
        in_specs=[
            pl.BlockSpec((1, 32), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tr), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr), tile, memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_tab)],
        out_specs=[
            pl.BlockSpec((3, tr), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 16), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nm, 8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nl, 16), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, rp), jnp.float32),
            jax.ShapeDtypeStruct((ns, 8), jnp.float32),
            jax.ShapeDtypeStruct((nq, 16), jnp.float32),
            jax.ShapeDtypeStruct((nm, 8), jnp.float32),
            jax.ShapeDtypeStruct((nl, 16), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((spp * max_bounces, 1, tr), jnp.float32)] * 3
            if cache_isect else []),
        interpret=interpret,
        # TINYRT_DIFF_VMEM_CAP (bytes): calibration hook — setting a tiny
        # cap makes every compile fail with the kernel's TRUE scoped-VMEM
        # size in the error, which is how _classic_tile's model was fit
        # (scripts/probe_diff_vmem.py). Unset in production.
        **(
            {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=int(_os.environ["TINYRT_DIFF_VMEM_CAP"]))}
            if _os.environ.get("TINYRT_DIFF_VMEM_CAP") else {}
        ),
    )(
        cam_vec, ctl, pid, px, py, wgt, tgt_cols,
        tables["sph_c"], tables["sph_r"], tables["quad_c"],
        tables["quad_u"], tables["quad_v"], tables["pay"],
        tables["light_pay"], *extra_in,
    )
    return outs


def render_value_and_grad(
    scene: SceneArrays,
    camera: Camera,
    target,
    *,
    spp: int,
    max_bounces: int,
    background,
    seed: int = 0,
    spp_offset=0,
    nee: bool = True,
    silhouette: bool = True,
    interpret: bool = False,
    static: DiffStatic | None = None,
    packed: bool | None = None,
    mesh=None,
    tile: tuple | None = None,
    surr_rows: dict | None = None,
):
    """Fused train objective: returns (loss, image, grads).

    surr_rows (VERDICT r3 #1, r4 #1): optional {"sph": rows, "quad":
    rows} restricting the boundary-surrogate adjoints (silhouette + NEE
    soft shadow) to the geometry actually being trained. Per-class
    values: None = full class, () / missing = class compiled out, a
    row-id tuple = explicit subset. The per-bounce surrogate cost then
    scales with the TRAINED primitive count instead of the scene size —
    the enabler for many-sphere fits AND for partially-trained fits
    (e.g. sphere-only training on an all-quad-walls Cornell compiles
    every quad surrogate chain out). Exact for the silhouette term (it
    log-factorizes per row); for the soft shadow the visibility product
    runs over the scoped rows only, so non-listed occluders' cotangents
    into the shared ray chain are dropped (a surrogate-artifact term).
    All other gradient fields (materials, winner geometry, lights) are
    unaffected. Explicit row subsets force this classic kernel;
    class-level scopes (all values None/empty) keep the packed kernel
    eligible via its surr_sph/surr_quad flags.

    grads is a diff.params-style dict over FLOAT_FIELDS (plus
    "background"), shaped like the SceneArrays fields — what
    jax.value_and_grad(render_loss) produces through the modular path
    (same estimator, same RNG streams), computed in one kernel launch.
    Callable under jit: `scene` float fields may be traced; `static`
    (host structure) can be precomputed once per topology.

    packed: route to the sublane-packed kernel (diffkernel_packed.py) —
    same estimator and streams, (S, L) ray state. None = auto: packed
    for compiled runs on scenes small enough to unroll, this classic
    candidate-matrix kernel otherwise (and under interpret, where the
    packed kernel's unrolled select chains trace slowly).

    mesh: optional jax.sharding.Mesh — data-parallel fused training on
    either kernel: pixel-tile lanes shard over every mesh device and the
    parameter-gradient tables (plus the in-kernel MSE partial) psum over
    the mesh. Gradients match single-device up to collective summation
    order; many-sphere scenes keep the classic kernel's flat (ns, TR)
    scaling under a mesh instead of falling back to packed unrolls.

    tile: kernel tile override. For the packed kernel a (sublanes,
    lanes) tuple; for this classic kernel an int lane width (rays per
    grid step). None = auto: 256 lanes, halved by _classic_tile until
    the reverse sweep's predicted scoped VMEM fits.
    """
    if jnp.asarray(background, jnp.float32).ndim != 1:
        raise ValueError(
            "the fused diff kernels support constant backgrounds only; "
            "gradient-sky ((2,3) [bottom, top]) scenes train through the "
            "modular path (make_train_step / render_loss), which "
            "differentiates the sky-lerped miss term via autodiff")
    if static is None:
        static = build_diff_static(scene)
    st = static
    surr_s = surr_q = None
    surr_sph_on = surr_quad_on = True
    if surr_rows is not None:
        # Per-class values: None = full class (exact dense surrogates),
        # empty = class compiled out, row tuple = explicit subset. A
        # CLASS-LEVEL scope (every value None/empty — what
        # make_fused_train_step derives from `trainable`, VERDICT r4 #1)
        # keeps the packed kernel eligible via its surr_sph/surr_quad
        # flags; an explicit row subset forces this classic kernel.
        sv = surr_rows.get("sph", ())
        qv = surr_rows.get("quad", ())
        smap = {r: i for i, r in enumerate(st.sph_rows)}
        qmap = {r: j for j, r in enumerate(st.quad_rows)}
        try:
            surr_s = None if sv is None else tuple(sorted(
                smap[int(r)] for r in sv))
            surr_q = None if qv is None else tuple(sorted(
                qmap[int(r)] for r in qv))
        except KeyError as e:
            raise ValueError(
                f"surr_rows names row {e} which is not a valid "
                "sphere/quad row of this scene") from None
        surr_sph_on = sv is None
        surr_quad_on = qv is None
        class_level = (surr_s is None or not surr_s) and (
            surr_q is None or not surr_q)
        if not class_level:
            packed = False        # row subsets: classic kernel only
    if packed is None:
        from tinyraytracer_tpu.ops.diffkernel_packed import (
            DIFF_PACKED_MAX_PRIMS,
            DIFF_PACKED_MAX_SPHERES,
        )

        # packed wins decisively on unrollable scenes: measured at the
        # config-5 north star (cornell_spheres 600^2 spp200 mb20, class
        # scope) 48.9 vs the classic kernel's 8.9 Mrays/s — the (1, TR)
        # classic row layout pays ~8x sublane underfill on per-ray work
        # when the scene is too small to fill sublanes with primitives.
        packed = (not interpret) and (
            len(st.sph_rows) + len(st.quad_rows) <= DIFF_PACKED_MAX_PRIMS)
        if packed and len(st.sph_rows) > DIFF_PACKED_MAX_SPHERES:
            # many-sphere scenes: the packed kernel's per-sphere
            # surrogate unrolls + scalar-sum tables collapse (see
            # DIFF_PACKED_MAX_SPHERES); the classic kernel's dense
            # (ns, TR) surrogate rows scale far better — and has its own
            # mesh path, so mesh-sharded fits are no longer pinned to
            # the packed kernel
            packed = False
    tr = TILE
    row_chunk = 0
    env_stream = _os.environ.get("TINYRT_DIFF_STREAM")
    if not packed:
        n_rows = st.ns + st.nq
        if interpret:
            # the host interpreter has no VMEM constraint (ADVICE r3):
            # keep the default tile unless the caller pinned one
            if tile is not None:
                tr = _classic_tile(max_bounces, st.ns + st.nq, tile)
            if env_stream:
                # test hook: force the streamed kernel under interpret
                row_chunk = min(DIFF_ROW_CHUNK, int(env_stream))
        else:
            tr = _classic_tile(max_bounces, n_rows, tile)
            if not tr or env_stream:
                # TINYRT_DIFF_STREAM=<chunk>: test hook — force streaming
                # at that chunk width (same meaning as interpret mode)
                # Row-streamed mode (VERDICT r4 #3): beyond the
                # monolithic reverse sweep's VMEM model, fold the
                # rows-sized sweeps in DIFF_ROW_CHUNK blocks. Scoped
                # surrogates (subset/class-off) stream as (k, TR)
                # gathers; dense classes stream chunk-by-chunk too
                # (round 5), so full-rank large-N fits keep a fused
                # step — at O(rows) surrogate cost per bounce.
                want = int(env_stream) if env_stream else DIFF_ROW_CHUNK
                row_chunk = min(want, n_rows)
                tr = _streamed_tile(max_bounces, n_rows, row_chunk, tile)
            if not tr:
                raise ValueError(
                    f"scene has {n_rows} candidate rows at "
                    f"max_bounces={max_bounces} — beyond even the "
                    "row-streamed fused diff kernel's VMEM model at a "
                    "128-lane tile; reduce max_bounces, pass tile=128 "
                    "to force a borderline config, or use the modular "
                    "make_train_step path")
    if packed:
        from tinyraytracer_tpu.ops.diffkernel_packed import (
            render_value_and_grad_packed,
        )

        return render_value_and_grad_packed(
            scene, camera, target, spp=spp, max_bounces=max_bounces,
            background=background, seed=seed, spp_offset=spp_offset,
            nee=nee, silhouette=silhouette, interpret=interpret,
            static=static, mesh=mesh, tile=tile,
            surr_sph=surr_sph_on, surr_quad=surr_quad_on,
        )
    from tinyraytracer_tpu.ops.megakernel import _pixel_arrays

    w, h = camera.width, camera.height
    npix = w * h
    cam_vec = _camera_vector(camera, background)
    cam_vec = cam_vec.at[0, 23].set(float(npix))
    ctl = jnp.asarray([[0, 0, 0, 0]], jnp.int32)
    ctl = ctl.at[0, 0].set(jnp.asarray(seed, jnp.uint32).astype(jnp.int32))
    ctl = ctl.at[0, 1].set(
        jnp.asarray(spp_offset, jnp.uint32).astype(jnp.int32))
    # rays pad to a whole number of tiles PER MESH DEVICE so the lane
    # axis shards evenly (pads clamp to the last pixel and carry weight 0
    # — rendered but excluded from loss/gradients, like single-device)
    n_shards = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    chunk = tr * n_shards
    rp = ((npix + chunk - 1) // chunk) * chunk
    pid, px, py = _pixel_arrays(w, h, rp)
    wgt = (jnp.arange(rp) < npix).astype(jnp.float32).reshape(1, rp)
    tgt = jnp.asarray(target, jnp.float32).reshape(-1, 3)
    pad_ids = jnp.minimum(jnp.arange(rp), npix - 1)
    tgt_cols = jnp.take(tgt, pad_ids, axis=0).T          # (3, rp)

    tables = diff_tables(scene, st)
    has_met, has_die = static_kind_flags(st)
    # Phase-1 intersection cache (the packed kernel's cache_isect,
    # classic layout): 3 x (spp*mb, 1, tr) f32 scratches. Enable when it
    # fits the scoped-VMEM limit alongside the reverse sweep's own
    # prediction; when it doesn't (e.g. spp=200 mb=20), the replay
    # recomputes as before. Bit-identical either way.
    cache_bytes = 3 * spp * max_bounces * tr * 4
    base_bytes = (
        _streamed_scoped_bytes(max_bounces, st.ns + st.nq, row_chunk, tr)
        if row_chunk else
        _classic_scoped_bytes(max_bounces, st.ns + st.nq, tr))
    cache_isect = bool(
        base_bytes * _SCOPED_SAFETY + cache_bytes <= _SCOPED_LIMIT)
    call = functools.partial(
        _diff_call, spp=spp, max_bounces=max_bounces,
        n_lights=st.n_lights, nm=st.nm, nee=nee, sil=silhouette,
        interpret=interpret, has_met=has_met, has_die=has_die, tr=tr,
        surr_s=surr_s, surr_q=surr_q, cache_isect=cache_isect,
        row_chunk=row_chunk)
    if mesh is None:
        img_cols, dsph, dquad, dmat, dlight, dmisc = call(
            tables, cam_vec, ctl, pid, px, py, wgt, tgt_cols)
    else:
        # data-parallel over pixel-tile lanes: every device runs the same
        # kernel on its lane shard against replicated scene tables; the
        # parameter-gradient tables (and the in-kernel MSE partial in
        # dmisc) psum over the whole mesh — identical construction to the
        # packed kernel's mesh path (render_value_and_grad_packed)
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.shape.keys())

        def body(tables_, cam_v, ctl_v, pid_a, px_a, py_a, wgt_a, tgt_a):
            outs = call(tables_, cam_v, ctl_v, pid_a, px_a, py_a, wgt_a,
                        tgt_a)
            img_c, *tabs = outs
            tabs = [jax.lax.psum(t, axes) for t in tabs]
            return (img_c, *tabs)

        shard = P(None, axes)   # lane blocks split over the whole mesh
        img_cols, dsph, dquad, dmat, dlight, dmisc = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(), P(), shard, shard, shard, shard, shard),
            out_specs=(shard, P(), P(), P(), P(), P()),
            check_vma=False,
        )(tables, cam_vec, ctl, pid, px, py, wgt, tgt_cols)
    img = img_cols[:, :npix].T.reshape(h, w, 3)
    # Loss comes out of the kernel (dmisc[0, 3]), not a post-kernel
    # mean((img - target)**2): under jit on TPU a fused consumer of the
    # target constant after the custom call reads corrupted values
    # (kernel-side accumulation is immune, and free — phase 2 already
    # forms img - target per lane).
    loss = dmisc[0, 3]
    grads = _grads_to_scene(scene, st, dsph, dquad, dmat, dlight, dmisc)
    return loss, img, grads


def _grads_to_scene(scene, st, dsph, dquad, dmat, dlight, dmisc):
    """Map compacted grad tables back to SceneArrays-shaped arrays."""
    ns_real = len(st.sph_rows)
    nq_real = len(st.quad_rows)
    g_sc = jnp.zeros_like(scene.sph_center)
    g_sr = jnp.zeros_like(scene.sph_radius)
    if ns_real:
        sph_rows = jnp.asarray(st.sph_rows, jnp.int32)
        g_sc = g_sc.at[sph_rows].set(dsph[:ns_real, 0:3])
        g_sr = g_sr.at[sph_rows].set(dsph[:ns_real, 3])
    g_qc = jnp.zeros_like(scene.quad_corner)
    g_qu = jnp.zeros_like(scene.quad_u)
    g_qv = jnp.zeros_like(scene.quad_v)
    if nq_real:
        quad_rows = jnp.asarray(st.quad_rows, jnp.int32)
        g_qc = g_qc.at[quad_rows].set(dquad[:nq_real, 0:3])
        g_qu = g_qu.at[quad_rows].set(dquad[:nq_real, 3:6])
        g_qv = g_qv.at[quad_rows].set(dquad[:nq_real, 6:9])
    nmr = scene.mat_albedo.shape[0]
    g_alb = dmat[:nmr, 0:3]
    g_fuzz = dmat[:nmr, 3]
    g_ior = dmat[:nmr, 4]
    g_emit = dmat[:nmr, 5:8]
    if st.n_lights:
        lq = jnp.asarray(st.light_quad_rows, jnp.int32)
        lm = jnp.asarray(st.light_mat_rows, jnp.int32)
        g_qc = g_qc.at[lq].add(dlight[:st.n_lights, 0:3])
        g_qu = g_qu.at[lq].add(dlight[:st.n_lights, 3:6])
        g_qv = g_qv.at[lq].add(dlight[:st.n_lights, 6:9])
        g_emit = g_emit.at[lm].add(dlight[:st.n_lights, 9:12])
    grads = {
        "sph_center": g_sc,
        "sph_radius": g_sr,
        "quad_corner": g_qc,
        "quad_u": g_qu,
        "quad_v": g_qv,
        "mat_albedo": g_alb,
        "mat_fuzz": g_fuzz,
        "mat_ior": g_ior,
        "mat_emit": g_emit,
        "background": dmisc[0, 0:3],
    }
    return grads
