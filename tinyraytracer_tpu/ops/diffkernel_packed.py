"""Sublane-packed fused differentiable render kernel.

Same objective as ops/diffkernel.py — NEE forward render + local MSE
cotangent + hand-derived reverse bounce sweep over every scene parameter,
all in ONE Pallas launch — but with ray state laid out (S, L) sublanes x
lanes instead of (1, TILE) rows, so every per-ray elementwise op fills
S/8 full vregs instead of 1/8 of one (the same relayout that took the
forward megakernel from 98.7 to 110+ Mrays/s on Cornell and 9.3x on a
pure segment probe; see ops/megakernel_packed.py).

Layout changes relative to the classic diff kernel, each validated by a
standalone Mosaic probe (scripts/probe_packgrad.py, probe_packgrad2.py):

- Intersection drops the (NA, TR) candidate matrix for an unrolled
  per-primitive loop over SMEM scalars with a strict-< winner chain
  (identical tie-break to the classic argmin-first in compacted
  spheres-then-quads row order).
- Winner payload fields are selected by an unrolled per-primitive
  equality chain against the winner row id, reading scene scalars from
  SMEM (a (1, S*L) -> (S, L) unpack of an MXU gather does NOT lower:
  "infer-vector-layout: unsupported shape cast"; the opposite direction
  does — see below).
- Parameter-gradient scatter reshapes every per-ray cotangent to
  (1, S*L) — the direction Mosaic DOES lower — builds a one-hot
  (NA, S*L) from the winner rows, and contracts on the MXU: exactly the
  classic kernel's cl(onehot, G) with 8x the rays per call
  (probe: 0.296 ns/lane-bounce for a 24x16 table at (32, 256)).
- The per-sphere soft-shadow / silhouette surrogates become unrolled
  loops over the REAL spheres only (the classic kernel padded them to 8
  sublane rows); their gradients reduce to scalars and scatter into the
  (ns, 8) table via iota-equality selects.
- The reverse sweep recomputes each bounce's shade intermediates from
  the saved minimal state (11 state rows + best_t + winner row + shadow
  visibility) instead of keeping the ~90-array shade dict alive per
  bounce: at (S, L) tiles the classic save-everything scheme would need
  ~4 MB/bounce of VMEM; recompute trades that for ~one extra shade per
  bounce (VPU FLOPs are cheaper than VMEM). Re-measured at (8, 512) in
  round 3: saving the full dict fits the VMEM limit but runs 5% SLOWER
  at cornell_spheres 300^2 spp16 mb8 and no faster at the north-star
  config — the save/restore traffic out-costs the recompute it skips,
  so recompute stays.

Semantics are unchanged: same pcg4d streams keyed on (pixel, sample,
bounce) — placement-invariant, so gradients match the classic fused
kernel and the modular jax.grad oracle (gated by tests/test_diffkernel).
Reference lineage: the complete differentiable device sampler the
reference's Metal stack (sampler/metal/*, kernel.metal:35-91) was
heading toward but never finished.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyraytracer_tpu.models.camera import Camera
from tinyraytracer_tpu.models.world import SceneArrays
from tinyraytracer_tpu.ops.diffkernel import (
    DiffStatic,
    _MISS,
    _T_MIN,
    _TWO_PI,
    build_diff_static,
)
from tinyraytracer_tpu.ops.megakernel import (
    _camera_vector,
    _normalize3,
    _uniform4,
)

# Tile shape. Smaller than the forward packed kernel's (32, 256): the
# reverse sweep holds mb bounce-saves (14 arrays each) plus one bounce's
# live shade intermediates in VMEM — (32, 256) exceeds it and fails to
# compile. Measured on v5e at Cornell 300x300 spp=16 mb=8:
# (16,256) 20.2, (8,512) 26.6 Mrays/s — wide lanes beat sublane rows.
DIFF_SUBLANES = int(_os.environ.get("TINYRT_DIFF_SUBLANES", "8"))
DIFF_LANES = int(_os.environ.get("TINYRT_DIFF_LANES", "512"))

# Above this many real primitives the unrolled loop stops paying and the
# classic candidate-matrix kernel takes over (same threshold rationale as
# megakernel_packed.PACKED_MAX_PRIMS).
DIFF_PACKED_MAX_PRIMS = int(
    _os.environ.get("TINYRT_DIFF_PACKED_MAX_PRIMS", "48"))

# Separate, tighter bound on REAL SPHERES: the soft-shadow and
# silhouette surrogates unroll per sphere and their gradients reduce to
# scalars through per-sphere full-tile sums (sphere_scalar_table) — at
# 63 spheres the packed kernel measured 13x SLOWER than the classic
# (whose (ns, TR) surrogate rows scale as dense sublanes): 32.1 s vs
# 2.4 s per step at 200^2 spp=8 mb=6 on v5e. Auto routing falls back to
# the classic kernel above this many spheres; mesh-sharded many-sphere
# fits route to the classic kernel's own mesh path (added round 4).
DIFF_PACKED_MAX_SPHERES = int(
    _os.environ.get("TINYRT_DIFF_PACKED_MAX_SPHERES", "16"))

# VMEM budget for the phase-1 intersection cache (winner t / winner row /
# shadow vis per (sample, bounce)): 3 * spp * mb * S * L * 4 bytes. When
# it fits ALONGSIDE the kernel's other VMEM residents (reverse-sweep
# bounce saves, live shade intermediates, I/O blocks — see
# _non_cache_vmem_bytes) under the scoped-VMEM limit, the phase-3 replay
# skips its closest-hit and shadow re-traces (~30% of a replay bounce);
# when it doesn't (e.g. spp=200 mb=20), the replay recomputes as before.
DIFF_ISECT_CACHE_BYTES = int(
    _os.environ.get("TINYRT_DIFF_ISECT_CACHE_BYTES", str(48 * 1024 * 1024)))
DIFF_VMEM_LIMIT = int(
    _os.environ.get("TINYRT_DIFF_VMEM_LIMIT", str(100 * 1024 * 1024)))


def _non_cache_vmem_bytes(mb: int, s: int, l: int) -> int:
    """Rough upper bound on the kernel's VMEM residents other than the
    intersection cache: the reverse sweep's per-bounce saves (the
    `saves.append((st, best_t, rowf, vis))` tuple in phase 3: 11 state
    rows + 3), ~90 live (S, L) shade intermediates, and 10 (S, L) I/O
    blocks, plus 25% headroom so modest kernel growth degrades to a
    graceful cache-off fallback instead of a compile failure. If the
    save tuple or the shade dict grows materially, update the counts
    here (the check only decides cache on/off, so over-counting merely
    disables the cache early)."""
    lane_bytes = s * l * 4
    return ((14 * mb + 90 + 10) * lane_bytes * 5) // 4

# Per-prim SMEM blocks. Geometry intersection fields first, then the
# differentiable raw fields and the material block the winner-field
# select chain reads.
_SPH_F = 15   # cx cy cz r2 r | kind ar ag ab fuzz ior er eg eb | matrow
_QUAD_F = 31  # n3 dp av3 ca bv3 cb | qc3 qu3 qv3 | mat block 9 | matrow
_MAT_OFF_S = 5    # mat block offset within a sphere block
_GEO_OFF_Q = 12   # raw qc/qu/qv offset within a quad block
_MAT_OFF_Q = 21   # mat block offset within a quad block
_LIGHT_F = 12  # corner(3) u(3) v(3) emit(3)


def packed_flat_table(scene: SceneArrays, st: DiffStatic):
    """Flatten the traced scene into one (1, NW) SMEM scalar row.

    Geometry intersection fields (quad n/dp/av/ca/bv/cb) are derived here
    with the exact formulas the classic kernel uses in its prologue
    (diffkernel.py kernel lines: cross, 1e-30 floor, dot) — they only feed
    DETACHED candidate-t tests, so deriving them outside the kernel does
    not move any gradient; all parameter gradients are hand-assembled
    inside the kernel against the raw qc/qu/qv / center / radius fields.
    Returns (tab, prims, light_off) where prims is a static tuple of
    ("s"|"q", scalar_offset, padded_payload_row).
    """
    def mat_block(mid):
        # material structure (kind code, row id) is static host data in
        # DiffStatic; the numeric fields stay traced
        kind = float(st.mat_kinds[mid])
        alb = scene.mat_albedo[mid].astype(jnp.float32)
        fuzz = scene.mat_fuzz[mid].astype(jnp.float32)
        ior = scene.mat_ior[mid].astype(jnp.float32)
        emit = scene.mat_emit[mid].astype(jnp.float32)
        return [jnp.full((1,), kind, jnp.float32), alb, fuzz[None],
                ior[None], emit, jnp.full((1,), float(mid), jnp.float32)]

    parts = []
    prims = []
    off = 0
    for i, r in enumerate(st.sph_rows):
        c = scene.sph_center[r].astype(jnp.float32)
        rad = scene.sph_radius[r].astype(jnp.float32)
        parts += [c, (rad * rad)[None], rad[None]]
        parts += mat_block(st.mat_ids[i])
        prims.append(("s", off, i))
        off += _SPH_F
    for j, r in enumerate(st.quad_rows):
        qc = scene.quad_corner[r].astype(jnp.float32)
        qu = scene.quad_u[r].astype(jnp.float32)
        qv = scene.quad_v[r].astype(jnp.float32)
        n = jnp.cross(qu, qv)
        nn = jnp.maximum(jnp.dot(n, n), 1e-30)
        dp = jnp.dot(n, qc)
        av = jnp.cross(qv, n) / nn
        ca = jnp.dot(av, qc)
        bv = jnp.cross(n, qu) / nn
        cb = jnp.dot(bv, qc)
        parts += [n, dp[None], av, ca[None], bv, cb[None], qc, qu, qv]
        parts += mat_block(st.mat_ids[st.ns + j])
        prims.append(("q", off, st.ns + j))
        off += _QUAD_F
    light_off = off
    for lq, lm in zip(st.light_quad_rows, st.light_mat_rows):
        parts += [
            scene.quad_corner[lq].astype(jnp.float32),
            scene.quad_u[lq].astype(jnp.float32),
            scene.quad_v[lq].astype(jnp.float32),
            scene.mat_emit[lm].astype(jnp.float32),
        ]
        off += _LIGHT_F
    flat = jnp.concatenate(parts) if parts else jnp.zeros((1,), jnp.float32)
    nw = max(8, ((flat.shape[0] + 7) // 8) * 8)
    tab = jnp.zeros((1, nw), jnp.float32).at[0, : flat.shape[0]].set(flat)
    return tab, tuple(prims), light_off


@functools.lru_cache(maxsize=32)
def _packed_diff_arrays(width: int, height: int, s: int, l: int,
                        g_mult: int = 1):
    """FLAT pixel layout for (S, L) tiles plus ownership weights.

    The forward megakernel blocks pixels 2-D for regeneration coherence;
    the diff kernel has a FIXED bounce budget (every lane pays spp x mb
    regardless), so coherence buys nothing and the 2-D edge-block
    duplication (13.8% at Cornell 300x300) is pure waste. Lanes map to
    consecutive flat pixel ids; only the tail tile pads (clamped to the
    last pixel, weight 0 — the loss cotangent counts every pixel exactly
    once).

    g_mult: pad the tile count to a multiple (sharding over the tile
    axis needs equal per-device grids); pad tiles clamp like the tail.
    """
    tile = s * l
    g = -(-width * height // tile)
    gp = ((g + g_mult - 1) // g_mult) * g_mult
    i = np.arange(gp * tile)
    npix = width * height
    pid = np.minimum(i, npix - 1).astype(np.uint32)
    x = (pid % width).astype(np.float32)
    y = (pid // width).astype(np.float32)
    wgt = (i < npix).astype(np.float32)
    inv = np.arange(npix, dtype=np.int32)

    def to_input(a):
        return np.ascontiguousarray(
            a.reshape(gp, s, l).transpose(1, 0, 2).reshape(s, gp * l))

    return (to_input(pid),
            to_input(x),
            to_input(y),
            to_input(wgt),
            pid, inv, gp)


def _make_packed_diff_kernel(spp: int, mb: int, prims: tuple,
                             light_off: int, ns: int, nq: int, nm: int,
                             nl: int, n_lights: int, nee: bool, sil: bool,
                             s_sub: int, l_lan: int,
                             has_met: bool = True, has_die: bool = True,
                             cache_isect: bool = False,
                             light_prows: tuple = (),
                             surr_sph: bool = True,
                             surr_quad: bool = True):
    na = ns + nq
    nlf = float(n_lights)
    # surr_sph / surr_quad (VERDICT r4 #1): class-level boundary-surrogate
    # scope. False compiles that class's soft-shadow + silhouette
    # surrogate chains out of the adjoint entirely (its soft visibility
    # factor is treated as 1, same convention as diffkernel.py's
    # scols_t/qcols_t=None subset path) — used when the fit trains no
    # geometry of that class, where those chains feed only grads the
    # caller masks to zero anyway.
    n_s_all = sum(1 for k, _, _ in prims if k == "s")
    n_s = n_s_all if surr_sph else 0
    sl = s_sub * l_lan

    def dot3(ax, ay, az, bx, by, bz):
        return ax * bx + ay * by + az * bz

    def cross3(ax, ay, az, bx, by, bz):
        return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

    def kernel(cam_ref, ctl_ref, tab_ref, pid_ref, px_ref, py_ref,
               wgt_ref, tgr_ref, tgg_ref, tgb_ref,
               imr_ref, img_ref_g, imb_ref,
               dsph_ref, dquad_ref, dmat_ref, dlight_ref, dmisc_ref,
               *isect_scratch):
        # cache_isect: (spp*mb, S, L) VMEM scratches holding phase 1's
        # per-(sample, bounce) winner t / winner row / shadow visibility,
        # so the phase-3 replay skips its closest-hit AND shadow re-trace
        # (the two re-traces are ~30% of a bounce's ops). Values are
        # bit-identical by construction: the replay runs the exact same
        # deterministic sequence phase 1 ran.
        if cache_isect:
            ct_ref, cr_ref, cv_ref = isect_scratch
        pid = pid_ref[...]
        px = px_ref[...]
        py = py_ref[...]

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

        def tb(j):
            return tab_ref[0, j]

        # ---------------- intersection: unrolled prim loop --------------
        def closest_hit(ox, oy, oz, dx, dy, dz, want_row):
            """-> best_t (S,L), rowf f32 (S,L) padded-payload row, hit."""
            best = jnp.full_like(ox, _MISS)
            rowf = jnp.zeros_like(ox)
            for kind, off, prow in prims:
                if kind == "s":
                    cxs, cys, czs = tb(off), tb(off + 1), tb(off + 2)
                    r2s = tb(off + 3)
                    ocx = ox - cxs
                    ocy = oy - cys
                    ocz = oz - czs
                    half_b = ocx * dx + ocy * dy + ocz * dz
                    c_term = ocx * ocx + ocy * ocy + ocz * ocz - r2s
                    disc = half_b * half_b - c_term
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    t0 = -half_b - sq
                    t1 = -half_b + sq
                    # vacuous (t < _MISS) guards dropped — see the
                    # classic kernel's note (disc guard keeps pad rows
                    # and invalid roots inert)
                    ts = jnp.where(
                        t0 >= _T_MIN, t0,
                        jnp.where(t1 >= _T_MIN, t1, _MISS))
                    ts = jnp.where(disc >= 0.0, ts, _MISS)
                else:
                    qnx, qny, qnz = tb(off), tb(off + 1), tb(off + 2)
                    qdp = tb(off + 3)
                    avx, avy, avz = tb(off + 4), tb(off + 5), tb(off + 6)
                    qca = tb(off + 7)
                    bvx, bvy, bvz = tb(off + 8), tb(off + 9), tb(off + 10)
                    qcb = tb(off + 11)
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
                          & (al >= 0.0) & (al < 1.0)
                          & (be >= 0.0) & (be < 1.0))
                    ts = jnp.where(ok, tq, _MISS)
                # strict < keeps the FIRST row at the global min — the
                # classic kernel's argmin-first tie-break, same row order
                w = ts < best
                best = jnp.where(w, ts, best)
                if want_row:
                    rowf = jnp.where(w, float(prow), rowf)
            hit = best < _MISS
            return best, rowf, hit

        row_na = jax.lax.broadcasted_iota(jnp.int32, (na, sl), 0)
        row_nm = jax.lax.broadcasted_iota(jnp.int32, (nm, sl), 0)
        row_nl = jax.lax.broadcasted_iota(jnp.int32, (nl, sl), 0)

        def flat(a):
            # (S, L) -> (1, S*L): the reshape direction Mosaic lowers
            return a.reshape(1, sl)

        def winner_fields(rowf, hit, lite=False):
            """Winner payload via an unrolled per-prim equality chain
            (the classic kernel's one-hot MXU gather; the (1, S*L) ->
            (S, L) unpack that gather would need does not lower).

            lite: replay mode (see shade) — the emission/material-row
            fields (wer/weg/web/wmat) are never read by the replay, so
            their per-prim selects are skipped."""
            rowi = rowf.astype(jnp.int32)
            z = jnp.zeros_like(rowf)
            f = dict(isq=z, wcx=z, wcy=z, wcz=z, wrad=z, kind=z,
                     war=z, wag=z, wab=z, wfuzz=z, wior=z,
                     wer=z, weg=z, web=z, wmat=z,
                     wqcx=z, wqcy=z, wqcz=z, wqux=z, wquy=z, wquz=z,
                     wqvx=z, wqvy=z, wqvz=z)
            for kind_, off, prow in prims:
                m = (rowi == prow) & hit

                def sel(cur, j):
                    return jnp.where(m, tb(j), cur)

                if kind_ == "s":
                    f["wcx"] = sel(f["wcx"], off)
                    f["wcy"] = sel(f["wcy"], off + 1)
                    f["wcz"] = sel(f["wcz"], off + 2)
                    f["wrad"] = sel(f["wrad"], off + 4)
                    mo = off + _MAT_OFF_S
                else:
                    f["isq"] = jnp.where(m, 1.0, f["isq"])
                    go = off + _GEO_OFF_Q
                    for name, k in (("wqcx", 0), ("wqcy", 1), ("wqcz", 2),
                                    ("wqux", 3), ("wquy", 4), ("wquz", 5),
                                    ("wqvx", 6), ("wqvy", 7), ("wqvz", 8)):
                        f[name] = sel(f[name], go + k)
                    mo = off + _MAT_OFF_Q
                # fuzz/ior feed only the compiled-out scatter chains —
                # skip their per-prim selects when the kind is absent
                mat_fields = [("kind", 0), ("war", 1), ("wag", 2),
                              ("wab", 3)]
                if has_met:
                    mat_fields.append(("wfuzz", 4))
                if has_die:
                    mat_fields.append(("wior", 5))
                if not lite:
                    mat_fields += [("wer", 6), ("weg", 7), ("web", 8),
                                   ("wmat", 9)]
                for name, k in mat_fields:
                    f[name] = sel(f[name], mo + k)
            return f

        def lane_dot(a, b):
            # (ra, SL) x (rb, SL) -> (ra, rb), contract lanes (classic cl)
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def gen_camera_ray(samp_u):
            """Camera ray for a sample id (scalar uint32 on the lockstep
            path, per-lane (S, L) uint32 on the regeneration path — the
            PCG4D broadcasts make the arithmetic identical either way).
            The ONE copy of the defocus-disk/pixel-jitter math: raygen
            and the regen loop both call it, so lockstep-vs-regen
            bit-parity has a single point of change."""
            r1, r2_, r3, r4 = _uniform4(pid, samp_u, jnp.uint32(0), seed)
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
            return ox, oy, oz, dx, dy, dz

        def raygen(s):
            sample_id = spp_offset + s.astype(jnp.uint32)
            return (*gen_camera_ray(sample_id), sample_id)

        # ---------------------------------------------------------------
        # shade: all per-bounce intermediates from (state, winner). Same
        # formulas as the classic kernel's shade, on (S, L); winner
        # payload gathered via one-hot MXU + lane unpack.
        # ---------------------------------------------------------------
        def shade(sample_id, b_u32, st, best_t, rowf, lite=False,
                  need_nee=True):
            """lite: phase-3 replay mode. The replay only advances state
            (advance: p, sd, throughput, alive, pd) and traces the shadow
            ray (shadow_vis: p, wl, dist) — emission gating, the NEE
            geometry factor, and the material-row fields are color- or
            adjoint-only, and bounce_adj always recomputes with
            lite=False — so those ops are skipped. Everything the replay
            DOES compute is op-identical to the full shade.

            need_nee=False (cache_isect replay): the shadow visibility is
            read back from phase 1's scratch, so even the shadow-ray
            geometry (light sample point, direction, distance) is
            skipped."""
            (ox, oy, oz, dx, dy, dz, tr_, tg_, tb_, alive_f, pd_f) = st
            g = {}
            hit = best_t < _MISS
            wf = winner_fields(rowf, hit, lite)
            isq = wf["isq"]
            wcx, wcy, wcz = wf["wcx"], wf["wcy"], wf["wcz"]
            kind = wf["kind"]
            war, wag, wab = wf["war"], wf["wag"], wf["wab"]
            wfuzz = wf["wfuzz"]
            wior = wf["wior"]
            wer, weg, web = wf["wer"], wf["weg"], wf["web"]
            wmat = wf["wmat"]
            wrad = wf["wrad"]
            wqcx, wqcy, wqcz = wf["wqcx"], wf["wqcy"], wf["wqcz"]
            wqux, wquy, wquz = wf["wqux"], wf["wquy"], wf["wquz"]
            wqvx, wqvy, wqvz = wf["wqvx"], wf["wqvy"], wf["wqvz"]
            alive = alive_f > 0.5
            hit_live = alive & hit
            miss_live = alive & ~hit
            hlf = hit_live.astype(jnp.float32)
            mlf = miss_live.astype(jnp.float32)

            # differentiable winner t
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

            if lite:
                gate_e = None     # color is not accumulated in the replay
            elif nee:
                nee_sampled = quad_w & is_light
                gate_e = hlf * (1.0 - pd_f * nee_sampled.astype(jnp.float32))
            else:
                gate_e = hlf

            if nee and n_lights > 0 and need_nee:
                nu1, nu2, nu3, _ = _uniform4(
                    pid, sample_id, jnp.uint32(0x40000000) + b_u32, seed
                )
                kpick = jnp.clip((nu3 * nlf).astype(jnp.int32), 0,
                                 n_lights - 1)
                zt = jnp.zeros_like(nu1)
                lcx = lcy = lcz = zt
                lux = luy = luz = zt
                lvx = lvy = lvz = zt
                ler = leg = leb = zt
                for k in range(n_lights):
                    lo = light_off + k * _LIGHT_F
                    m = (kpick == k).astype(jnp.float32)
                    lcx = lcx + m * tb(lo + 0)
                    lcy = lcy + m * tb(lo + 1)
                    lcz = lcz + m * tb(lo + 2)
                    lux = lux + m * tb(lo + 3)
                    luy = luy + m * tb(lo + 4)
                    luz = luz + m * tb(lo + 5)
                    lvx = lvx + m * tb(lo + 6)
                    lvy = lvy + m * tb(lo + 7)
                    lvz = lvz + m * tb(lo + 8)
                    if not lite:     # emission feeds color/adjoint only
                        ler = ler + m * tb(lo + 9)
                        leg = leg + m * tb(lo + 10)
                        leb = leb + m * tb(lo + 11)
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
                if lite:
                    # shadow_vis consumes only (wl, dist); the geometry
                    # factor below is color/adjoint-only
                    g.update(nee_vals=dict(
                        wlx=wlx, wly=wly, wlz=wlz, dist=dist))
                    lnx = None     # sentinel: tail skipped
                if not lite:
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
                    g.update(nee_vals=dict(
                    nu1=nu1, nu2=nu2, kpick=kpick,
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
            # --- scatter -------------------------------------------
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

            lx = nx_ + ux_
            ly = ny_ + uy_
            lz = nz_ + uz_
            degen = (jnp.abs(lx) < 1e-7) & (jnp.abs(ly) < 1e-7) & (
                jnp.abs(lz) < 1e-7)
            lamx = jnp.where(degen, nx_, lx)
            lamy = jnp.where(degen, ny_, ly)
            lamz = jnp.where(degen, nz_, lz)
            # metal / dielectric chains: compiled out when the scene has
            # no primitive of that kind (diffkernel.static_kind_flags) —
            # value-preserving, the dropped results are never selected
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
            if not (nee and n_lights > 0):
                return jnp.ones_like(g["hlf"])
            nv = g["nee_vals"]
            occ_t, _, _ = closest_hit(
                g["p_x"], g["p_y"], g["p_z"],
                nv["wlx"], nv["wly"], nv["wlz"], False,
            )
            return (~(occ_t < nv["dist"] * (1.0 - 1e-3))).astype(jnp.float32)

        # ---- per-real-sphere soft shadow + silhouette surrogates -------
        def sphere_scalars(i):
            kind, off, _prow = prims[i]
            assert kind == "s"
            return tb(off), tb(off + 1), tb(off + 2), tb(off + 4)

        def softshadow_fwd(g):
            """Per-real-sphere soft visibility; product over spheres."""
            nv = g["nee_vals"]
            px_, py_, pz_ = g["p_x"], g["p_y"], g["p_z"]
            wlx, wly, wlz = nv["wlx"], nv["wly"], nv["wlz"]
            dist = nv["dist"]
            per = []
            v = jnp.ones_like(px_)
            for i in range(n_s):
                cxs, cys, czs, srs = sphere_scalars(i)
                r_abs = jnp.abs(srs)
                cxx = cxs - px_
                cxy = cys - py_
                cxz = czs - pz_
                s_along = cxx * wlx + cxy * wly + cxz * wlz
                s_cl = jnp.clip(s_along, 0.0, dist)
                ex = px_ + s_cl * wlx - cxs
                ey = py_ + s_cl * wly - cys
                ez = pz_ + s_cl * wlz - czs
                dsep = jnp.sqrt(jnp.maximum(
                    ex * ex + ey * ey + ez * ez, 1e-12))
                wsoft = 0.25 * r_abs + 1e-6
                zs = (dsep - r_abs) / wsoft
                vs = jax.nn.sigmoid(zs)
                v = v * vs
                per.append(dict(cxx=cxx, cxy=cxy, cxz=cxz,
                                s_along=s_along, s_cl=s_cl,
                                ex=ex, ey=ey, ez=ez, dsep=dsep,
                                wsoft=wsoft, vs=vs, r_abs=r_abs))
            return dict(per=per, v=v, dist=dist)

        def softshadow_adj(ss, cv, g):
            """-> per-sphere (cx,cy,cz,cr) scalar-pending (S,L) grads and
            point/direction/dist cotangents."""
            nv = g["nee_vals"]
            wlx, wly, wlz = nv["wlx"], nv["wly"], nv["wlz"]
            z = jnp.zeros_like(cv)
            cpx = z
            cpy = z
            cpz = z
            cwlx = z
            cwly = z
            cwlz = z
            cdist = z
            sph_grads = []
            for i in range(n_s):
                p = ss["per"][i]
                srs = sphere_scalars(i)[3]
                vs_c = jnp.maximum(p["vs"], 1e-6)
                cvs = cv * ss["v"] / vs_c
                s_sig = p["vs"] * (1.0 - p["vs"])
                czs_ = cvs * s_sig
                w2 = p["wsoft"] * p["wsoft"]
                csr_abs = czs_ * (
                    -(p["wsoft"]) - (p["dsep"] - p["r_abs"]) * 0.25) / w2
                cdsep = czs_ / p["wsoft"]
                inv_dsep = 1.0 / p["dsep"]
                cex = cdsep * p["ex"] * inv_dsep
                cey = cdsep * p["ey"] * inv_dsep
                cez = cdsep * p["ez"] * inv_dsep
                cscx = -cex
                cscy = -cey
                cscz = -cez
                cpx = cpx + cex
                cpy = cpy + cey
                cpz = cpz + cez
                cs_cl = cex * wlx + cey * wly + cez * wlz
                cwlx_m = cex * p["s_cl"]
                cwly_m = cey * p["s_cl"]
                cwlz_m = cez * p["s_cl"]
                in_rng = ((p["s_along"] > 0.0)
                          & (p["s_along"] < ss["dist"]))
                cs_along = jnp.where(in_rng, cs_cl, 0.0)
                cdist = cdist + jnp.where(
                    p["s_along"] >= ss["dist"], cs_cl, 0.0)
                cscx = cscx + cs_along * wlx
                cscy = cscy + cs_along * wly
                cscz = cscz + cs_along * wlz
                cpx = cpx - cs_along * wlx
                cpy = cpy - cs_along * wly
                cpz = cpz - cs_along * wlz
                cwlx = cwlx + cwlx_m + cs_along * p["cxx"]
                cwly = cwly + cwly_m + cs_along * p["cxy"]
                cwlz = cwlz + cwlz_m + cs_along * p["cxz"]
                csr = csr_abs * jnp.sign(srs)
                sph_grads.append((cscx, cscy, cscz, csr))
            return sph_grads, (cpx, cpy, cpz, cwlx, cwly, cwlz, cdist)

        # ---- per-real-quad edge surrogates (round-4: VERDICT r3 #2) ----
        # Quad analog of the sphere surrogates: soft coverage on the four
        # [0,1) planar-coordinate edges of the segment's plane crossing
        # (same math as diffkernel.quad_cov_fwd/adj, unrolled per quad
        # with scalar params). n/w are recomputed from the RAW qu/qv
        # scalars so the hand chain owns their u,v dependence (the
        # table's precomputed n/av/bv rows feed detached tests only).
        _WQE = 0.05

        # surr_quad=False: class-level scope (see factory docnote) — the
        # empty q_list statically drops every per-quad surrogate chain.
        q_list = tuple((off, prow) for k, off, prow in prims
                       if k == "q") if surr_quad else ()
        n_q = len(q_list)
        # Soft-shadow occluder set: with a single light, the sampled
        # light's OWN plane crossing sits exactly at tpar = dist and the
        # (tpar < dist*(1-1e-3)) gate is always 0 — its vq is identically
        # 1, so the whole per-quad chain is statically skipped (exact).
        # With multiple lights, light quad A can still occlude a segment
        # toward light B, so every quad stays in.
        q_shadow = tuple(
            (off, prow) for off, prow in q_list
            if not (n_lights == 1 and prow in light_prows))

        def quad_scalars(off):
            return ((tb(off + 12), tb(off + 13), tb(off + 14)),
                    (tb(off + 15), tb(off + 16), tb(off + 17)),
                    (tb(off + 18), tb(off + 19), tb(off + 20)))

        def _quad_cov_one(off, ax, ay, az, bx_, by_, bz_):
            """Forward coverage of segment a + t*b against quad `off`.
            Returns everything the fused adjoint below needs."""
            (qcx, qcy, qcz), (qux, quy, quz), (qvx, qvy, qvz) = \
                quad_scalars(off)
            nx = quy * qvz - quz * qvy
            ny = quz * qvx - qux * qvz
            nz = qux * qvy - quy * qvx
            nn = jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30)
            inv_nn = 1.0 / nn
            wx = nx * inv_nn
            wy = ny * inv_nn
            wz = nz * inv_nn
            dp = nx * qcx + ny * qcy + nz * qcz
            den = nx * bx_ + ny * by_ + nz * bz_
            den_ok = jnp.abs(den) > 1e-8
            dsafe = jnp.where(den_ok, den, 1.0)
            tpar = (dp - (nx * ax + ny * ay + nz * az)) / dsafe
            prx = ax + tpar * bx_ - qcx
            pry = ay + tpar * by_ - qcy
            prz = az + tpar * bz_ - qcz
            al = ((pry * qvz - prz * qvy) * wx
                  + (prz * qvx - prx * qvz) * wy
                  + (prx * qvy - pry * qvx) * wz)
            be = ((quy * prz - quz * pry) * wx
                  + (quz * prx - qux * prz) * wy
                  + (qux * pry - quy * prx) * wz)
            s1 = jax.nn.sigmoid(al * (1.0 / _WQE))
            s2 = jax.nn.sigmoid((1.0 - al) * (1.0 / _WQE))
            s3 = jax.nn.sigmoid(be * (1.0 / _WQE))
            s4 = jax.nn.sigmoid((1.0 - be) * (1.0 / _WQE))
            cov = s1 * s2 * s3 * s4
            return dict(qc=(qcx, qcy, qcz), qu=(qux, quy, quz),
                        qv=(qvx, qvy, qvz), n=(nx, ny, nz), w=(wx, wy, wz),
                        inv_nn=inv_nn, den_ok=den_ok, dsafe=dsafe,
                        tpar=tpar, prx=prx, pry=pry, prz=prz,
                        s1=s1, s2=s2, s3=s3, s4=s4, cov=cov)

        def _quad_cov_adj_one(qf, ccov, ax, ay, az, bx_, by_, bz_,
                              need_seg=True):
            """ccov -> 9 quad grads (S,L) + segment a/b cotangents.
            Mirror of diffkernel.quad_cov_adj with scalar quad params.
            need_seg=False skips the a/b cotangents (the silhouette
            detaches rays, so they are discarded there)."""
            qcx, qcy, qcz = qf["qc"]
            qux, quy, quz = qf["qu"]
            qvx, qvy, qvz = qf["qv"]
            nx, ny, nz = qf["n"]
            wx, wy, wz = qf["w"]
            prx, pry, prz = qf["prx"], qf["pry"], qf["prz"]
            tpar, dsafe = qf["tpar"], qf["dsafe"]
            cal = ccov * qf["cov"] * (qf["s2"] - qf["s1"]) * (1.0 / _WQE)
            cbe = ccov * qf["cov"] * (qf["s4"] - qf["s3"]) * (1.0 / _WQE)
            # al = (pr x v).w ; be = (u x pr).w
            cprx = cal * (qvy * wz - qvz * wy) + cbe * (wy * quz - wz * quy)
            cpry = cal * (qvz * wx - qvx * wz) + cbe * (wz * qux - wx * quz)
            cprz = cal * (qvx * wy - qvy * wx) + cbe * (wx * quy - wy * qux)
            cqv_x = cal * (wy * prz - wz * pry)
            cqv_y = cal * (wz * prx - wx * prz)
            cqv_z = cal * (wx * pry - wy * prx)
            cqu_x = cbe * (pry * wz - prz * wy)
            cqu_y = cbe * (prz * wx - prx * wz)
            cqu_z = cbe * (prx * wy - pry * wx)
            cwx = (cal * (pry * qvz - prz * qvy)
                   + cbe * (quy * prz - quz * pry))
            cwy = (cal * (prz * qvx - prx * qvz)
                   + cbe * (quz * prx - qux * prz))
            cwz = (cal * (prx * qvy - pry * qvx)
                   + cbe * (qux * pry - quy * prx))
            # w = n * inv_nn
            wdc = wx * cwx + wy * cwy + wz * cwz
            cnx = cwx * qf["inv_nn"] - 2.0 * wx * wdc
            cny = cwy * qf["inv_nn"] - 2.0 * wy * wdc
            cnz = cwz * qf["inv_nn"] - 2.0 * wz * wdc
            # pr = a + tpar*b - c ; tpar = N/D
            denf = qf["den_ok"].astype(jnp.float32)
            ctp = (cprx * bx_ + cpry * by_ + cprz * bz_) * denf
            cqc_x = -cprx
            cqc_y = -cpry
            cqc_z = -cprz
            cN = ctp / dsafe
            cD = -ctp * tpar / dsafe
            cnx = cnx + cN * (qcx - ax) + cD * bx_
            cny = cny + cN * (qcy - ay) + cD * by_
            cnz = cnz + cN * (qcz - az) + cD * bz_
            cqc_x = cqc_x + cN * nx
            cqc_y = cqc_y + cN * ny
            cqc_z = cqc_z + cN * nz
            # n = u x v
            cqu_x = cqu_x + (qvy * cnz - qvz * cny)
            cqu_y = cqu_y + (qvz * cnx - qvx * cnz)
            cqu_z = cqu_z + (qvx * cny - qvy * cnx)
            cqv_x = cqv_x + (cny * quz - cnz * quy)
            cqv_y = cqv_y + (cnz * qux - cnx * quz)
            cqv_z = cqv_z + (cnx * quy - cny * qux)
            if not need_seg:
                return ((cqc_x, cqc_y, cqc_z, cqu_x, cqu_y, cqu_z,
                         cqv_x, cqv_y, cqv_z), None, None)
            ca = (cprx - cN * nx, cpry - cN * ny, cprz - cN * nz)
            cb = (cprx * tpar + cD * nx, cpry * tpar + cD * ny,
                  cprz * tpar + cD * nz)
            return ((cqc_x, cqc_y, cqc_z, cqu_x, cqu_y, cqu_z,
                     cqv_x, cqv_y, cqv_z), ca, cb)

        def quad_softshadow_v(g):
            """Per-quad soft visibilities (None for statically-skipped
            light quads, aligned with q_list) + product."""
            nv = g["nee_vals"]
            keep = {off for off, _ in q_shadow}
            vqs = []
            v = None
            for off, _prow in q_list:
                if off not in keep:
                    vqs.append(None)
                    continue
                qf = _quad_cov_one(off, g["p_x"], g["p_y"], g["p_z"],
                                   nv["wlx"], nv["wly"], nv["wlz"])
                gate = (qf["den_ok"] & (qf["tpar"] > 1e-3)
                        & (qf["tpar"] < nv["dist"] * (1.0 - 1e-3))
                        ).astype(jnp.float32)
                vq = jnp.maximum(1.0 - gate * qf["cov"], 1e-3)
                vqs.append(vq)
                v = vq if v is None else v * vq
            if v is None:
                v = jnp.ones_like(g["hlf"])
            return vqs, v

        def quad_softshadow_adj(vqs, v_q, cv, g):
            """cv (S,L) -> per-quad 9-grads + (cp x3, cwl x3). Coverage
            is recomputed per quad (VPU flops beat holding n_q forward
            dicts in VMEM; same policy as shade())."""
            nv = g["nee_vals"]
            quad_grads = []
            z = jnp.zeros_like(cv)
            cpx = cpy = cpz = z
            cwlx = cwly = cwlz = z
            for qi, (off, _prow) in enumerate(q_list):
                if vqs[qi] is None:
                    quad_grads.append((z,) * 9)
                    continue
                qf = _quad_cov_one(off, g["p_x"], g["p_y"], g["p_z"],
                                   nv["wlx"], nv["wly"], nv["wlz"])
                gate = (qf["den_ok"] & (qf["tpar"] > 1e-3)
                        & (qf["tpar"] < nv["dist"] * (1.0 - 1e-3))
                        ).astype(jnp.float32)
                vq_raw = 1.0 - gate * qf["cov"]
                cvq = cv * v_q / jnp.maximum(vqs[qi], 1e-6)
                cvq = jnp.where(vq_raw > 1e-3, cvq, 0.0)
                ccov = -gate * cvq
                grads, ca, cb = _quad_cov_adj_one(
                    qf, ccov, g["p_x"], g["p_y"], g["p_z"],
                    nv["wlx"], nv["wly"], nv["wlz"])
                quad_grads.append(grads)
                cpx = cpx + ca[0]
                cpy = cpy + ca[1]
                cpz = cpz + ca[2]
                cwlx = cwlx + cb[0]
                cwly = cwly + cb[1]
                cwlz = cwlz + cb[2]
            return quad_grads, (cpx, cpy, cpz, cwlx, cwly, cwlz)

        def quad_silhouette_adj(st, best_t, rowf, cF):
            """Per-real-quad edge-silhouette grads [(9 x (S,L))]."""
            (ox, oy, oz, dx, dy, dz, _tr, _tg, _tb, alive_f, _pd) = st
            hit = best_t < _MISS
            t_lim = jnp.where(hit, best_t, 3.0e30)
            rowi = rowf.astype(jnp.int32)
            live = alive_f > 0.5
            out = []
            for off, prow in q_list:
                qf = _quad_cov_one(off, ox, oy, oz, dx, dy, dz)
                wq_win = (rowi == prow) & hit
                gate = (qf["den_ok"] & (qf["tpar"] > _T_MIN)
                        & (qf["tpar"] < t_lim)).astype(jnp.float32)
                p = jnp.where(wq_win, qf["cov"], 1.0 - gate * qf["cov"])
                p = jnp.where(live, p, 1.0)
                pc = jnp.maximum(p, 1e-3)
                cp = cF / pc
                sgn_ev = jnp.where(wq_win, 1.0, -gate)
                ccov = jnp.where(live, cp * sgn_ev, 0.0)
                grads, _ca, _cb = _quad_cov_adj_one(
                    qf, ccov, ox, oy, oz, dx, dy, dz, need_seg=False)
                out.append(grads)
            return out

        def silhouette_adj(st, best_t, rowf, cF):
            """Per-real-sphere silhouette surrogate grads (S,L) x4."""
            (ox, oy, oz, dx, dy, dz, _tr, _tg, _tb, alive_f, _pd) = st
            hit = best_t < _MISS
            t_lim = jnp.where(hit, best_t, 3.0e30)
            rowi = rowf.astype(jnp.int32)
            out = []
            for i in range(n_s):
                kind, off, prow = prims[i]
                cxs, cys, czs, srs = sphere_scalars(i)
                r_abs = jnp.abs(srs)
                ws = ((rowi == prow) & hit).astype(jnp.float32)
                cox = cxs - ox
                coy = cys - oy
                coz = czs - oz
                s_along = cox * dx + coy * dy + coz * dz
                s_hit = jnp.maximum(s_along, _T_MIN)
                s_blk = jnp.clip(s_along, _T_MIN, t_lim)
                s_eff = jnp.where(ws > 0.5, s_hit, s_blk)
                ex = ox + s_eff * dx - cxs
                ey = oy + s_eff * dy - cys
                ez = oz + s_eff * dz - czs
                dmin = jnp.sqrt(jnp.maximum(
                    ex * ex + ey * ey + ez * ez, 1e-12))
                wsil = 0.05 * r_abs + 1e-5
                zq = (r_abs - dmin) / wsil
                cov = jax.nn.sigmoid(zq)
                live = alive_f > 0.5
                p = jnp.where(ws > 0.5, cov, 1.0 - cov)
                p = jnp.where(live, p, 1.0)
                pc = jnp.maximum(p, 1e-3)
                cp = cF / pc
                sign = jnp.where(ws > 0.5, 1.0, -1.0)
                ccov = jnp.where(live, cp * sign, 0.0)
                cz_ = ccov * cov * (1.0 - cov)
                w2 = wsil * wsil
                cr_abs = cz_ * (wsil - (r_abs - dmin) * 0.05) / w2
                cdmin = -cz_ / wsil
                inv_dmin = 1.0 / dmin
                cex = cdmin * ex * inv_dmin
                cey = cdmin * ey * inv_dmin
                cez = cdmin * ez * inv_dmin
                cscx = -cex
                cscy = -cey
                cscz = -cez
                cs_eff = cex * dx + cey * dy + cez * dz
                m_hit = (s_along > _T_MIN).astype(jnp.float32)
                m_blk = ((s_along > _T_MIN)
                         & (s_along < t_lim)).astype(jnp.float32)
                cs_along = jnp.where(ws > 0.5, m_hit, m_blk) * cs_eff
                cscx = cscx + cs_along * dx
                cscy = cscy + cs_along * dy
                cscz = cscz + cs_along * dz
                csr = cr_abs * jnp.sign(srs)
                out.append((cscx, cscy, cscz, csr))
            return out

        row_ns8 = jax.lax.broadcasted_iota(jnp.int32, (ns, 8), 0)
        col_ns8 = jax.lax.broadcasted_iota(jnp.int32, (ns, 8), 1)

        def sphere_scalar_table(per_sphere):
            """[(cx,cy,cz,cr) (S,L) x n_s] -> (ns, 8) via scalar sums."""
            tab = jnp.zeros((ns, 8), jnp.float32)
            for i, comps in enumerate(per_sphere):
                hit_row = row_ns8 == i
                for c4, arr in enumerate(comps):
                    tab = tab + jnp.where(
                        hit_row & (col_ns8 == c4), jnp.sum(arr), 0.0)
            return tab

        row_nq16 = jax.lax.broadcasted_iota(jnp.int32, (nq, 16), 0)
        col_nq16 = jax.lax.broadcasted_iota(jnp.int32, (nq, 16), 1)

        def quad_scalar_table(per_quad):
            """[(9 x (S,L)) per real quad] -> (nq, 16): corner/u/v cols
            0..8; real quad j sits at table row prow - ns (prims order,
            same convention as sphere_scalar_table)."""
            tab = jnp.zeros((nq, 16), jnp.float32)
            for (off_, prow_), comps in zip(q_list, per_quad):
                hit_row = row_nq16 == (prow_ - ns)
                for c9, arr in enumerate(comps):
                    tab = tab + jnp.where(
                        hit_row & (col_nq16 == c9), jnp.sum(arr), 0.0)
            return tab

        def bounce_adj(sample_id, b_py, st, best_t, rowf, vis,
                       cin, chat):
            """Reverse one bounce: recompute shade, apply hand VJPs."""
            g = shade(sample_id, jnp.uint32(b_py), st, best_t, rowf)
            (ox, oy, oz, dx, dy, dz, T0r, T0g, T0b, alive_f, pd_f) = st
            (cox_in, coy_in, coz_in, cdx_in, cdy_in, cdz_in,
             cTr_in, cTg_in, cTb_in) = cin
            chr_, chg_, chb_ = chat
            scf = g["scf"]
            inv_s = 1.0 - scf
            hlf, mlf, gate_e = g["hlf"], g["mlf"], g["gate_e"]
            nx_, ny_, nz_ = g["nx_"], g["ny_"], g["nz_"]
            T1r, T1g, T1b = T0r, T0g, T0b

            # ---- A5 scatter ---------------------------------------
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
            # chains; the dropped contributions are exact zeros on every
            # reachable lane (metf/dief gate them)
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

            # ---- A4 NEE -------------------------------------------
            sph_soft = [(jnp.zeros_like(hlf),) * 4 for _ in range(n_s)]
            quad_soft = [(jnp.zeros_like(hlf),) * 9 for _ in range(n_q)]
            Gl_rows = None
            kpick = None
            if nee and n_lights > 0:
                nv = g["nee_vals"]
                kpick = nv["kpick"]
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
                if n_s or n_q:
                    # v_total = v_spheres * v_quads, one shared ratio
                    # clamp (product-rule split of the cotangent — same
                    # construction as diffkernel.py A4)
                    zlt = jnp.zeros_like(hlf)
                    olt = jnp.ones_like(hlf)
                    ss = softshadow_fwd(g) if n_s else dict(v=olt)
                    vqs, v_q = quad_softshadow_v(g) if n_q else ([], olt)
                    vcl = jnp.maximum(ss["v"] * v_q, 1e-3)
                    cv_t = cvr / vcl
                    cwlx = cwly = cwlz = cdist = zlt
                    if n_s:
                        sph_grads, (cpx_s, cpy_s, cpz_s, cwlx, cwly,
                                    cwlz, cdist) = softshadow_adj(
                            ss, cv_t * v_q, g)
                        sph_soft = [
                            tuple(a + b for a, b in zip(sg, so))
                            for sg, so in zip(sph_grads, sph_soft)
                        ]
                        cpx = cpx + cpx_s
                        cpy = cpy + cpy_s
                        cpz = cpz + cpz_s
                    if n_q:
                        q_grads, (cpx_q, cpy_q, cpz_q, cwlx_q, cwly_q,
                                  cwlz_q) = quad_softshadow_adj(
                            vqs, v_q, cv_t * ss["v"], g)
                        quad_soft = [
                            tuple(a + b for a, b in zip(qg, qo))
                            for qg, qo in zip(q_grads, quad_soft)
                        ]
                        cpx = cpx + cpx_q
                        cpy = cpy + cpy_q
                        cpz = cpz + cpz_q
                        cwlx = cwlx + cwlx_q
                        cwly = cwly + cwly_q
                        cwlz = cwlz + cwlz_q
                else:
                    zlt = jnp.zeros_like(hlf)
                    cwlx = cwly = cwlz = cdist = zlt
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
                clux, cluy, cluz = cross3(
                    nv["lvx"], nv["lvy"], nv["lvz"], clnx, clny, clnz)
                clvx, clvy, clvz = cross3(
                    clnx, clny, clnz, nv["lux"], nv["luy"], nv["luz"])
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
                Gl_rows = [clcx, clcy, clcz, clux, cluy, cluz,
                           clvx, clvy, clvz, cler, cleg, cleb]

            # ---- A3 emission + A2 background ----------------------
            cT1r = cT1r + gate_e * chr_ * g["wer"] + mlf * chr_ * bg_r
            cT1g = cT1g + gate_e * chg_ * g["weg"] + mlf * chg_ * bg_g
            cT1b = cT1b + gate_e * chb_ * g["web"] + mlf * chb_ * bg_b
            cemit_r = gate_e * chr_ * T1r
            cemit_g = gate_e * chg_ * T1g
            cemit_b = gate_e * chb_ * T1b
            cbg_r = mlf * T1r * chr_
            cbg_g = mlf * T1g * chg_
            cbg_b = mlf * T1b * chb_

            # ---- A1 silhouette ------------------------------------
            if sil and (n_s or n_q):
                cF = cT1r * T0r + cT1g * T0g + cT1b * T0b
                if n_s:
                    sil_grads = silhouette_adj(st, best_t, rowf, cF)
                    sph_soft = [
                        tuple(a + b for a, b in zip(sg, so))
                        for sg, so in zip(sil_grads, sph_soft)
                    ]
                if n_q:
                    qsil = quad_silhouette_adj(st, best_t, rowf, cF)
                    quad_soft = [
                        tuple(a + b for a, b in zip(qg, qo))
                        for qg, qo in zip(qsil, quad_soft)
                    ]
            cT0r, cT0g, cT0b = cT1r, cT1g, cT1b

            # ---- A0 normal -> point -> t -> geometry params --------
            sgn = g["sgn"]
            cnox = sgn * cnx
            cnoy = sgn * cny
            cnoz = sgn * cnz
            quadf = g["isq"]
            sphf = 1.0 - quadf
            rho = g["rho"]
            sd_n = (g["sx_o"] * cnox + g["sy_o"] * cnoy
                    + g["sz_o"] * cnoz)
            cmx = sphf * (cnox - g["sx_o"] * sd_n) / rho
            cmy = sphf * (cnoy - g["sy_o"] * sd_n) / rho
            cmz = sphf * (cnoz - g["sz_o"] * sd_n) / rho
            cpx = cpx + cmx
            cpy = cpy + cmy
            cpz = cpz + cmz
            c_cx = -cmx
            c_cy = -cmy
            c_cz = -cmz
            qd_n = (g["qx_o"] * cnox + g["qy_o"] * cnoy
                    + g["qz_o"] * cnoz)
            cwnx = quadf * (cnox - g["qx_o"] * qd_n) / g["qlen"]
            cwny = quadf * (cnoy - g["qy_o"] * qd_n) / g["qlen"]
            cwnz = quadf * (cnoz - g["qz_o"] * qd_n) / g["qlen"]
            ct = (cpx * dx + cpy * dy + cpz * dz) * hlf
            cox = cox + cpx
            coy = coy + cpy
            coz = coz + cpz
            cdx = cdx + g["t"] * cpx
            cdy = cdy + g["t"] * cpy
            cdz = cdz + g["t"] * cpz
            sphtf = sphf * hlf
            sq_safe = g["sq_safe"]
            use0f = g["use0"].astype(jnp.float32)
            root_sgn = 2.0 * use0f - 1.0
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
            cqux, cquy, cquz = cross3(
                g["wqvx"], g["wqvy"], g["wqvz"], cwnx, cwny, cwnz)
            cqvx, cqvy, cqvz = cross3(
                cwnx, cwny, cwnz, g["wqux"], g["wquy"], g["wquz"])

            # ---- parameter accumulation matrices (MXU over lanes) --
            # winner one-hot from the saved row ids: the (S,L)->(1,S*L)
            # reshape is the direction Mosaic lowers (probe A)
            onehot = (row_na == flat(rowf).astype(jnp.int32)).astype(
                jnp.float32)
            zf = flat(jnp.zeros_like(hlf))
            Gs = jnp.concatenate(
                [flat(c_cx), flat(c_cy), flat(c_cz), flat(crad),
                 zf, zf, zf, zf], axis=0)                     # (8, SL)
            dsph_add = lane_dot(onehot[:ns], Gs)
            dsph_add = dsph_add + sphere_scalar_table(sph_soft)
            Gq = jnp.concatenate(
                [flat(cqc_x), flat(cqc_y), flat(cqc_z),
                 flat(cqux), flat(cquy), flat(cquz),
                 flat(cqvx), flat(cqvy), flat(cqvz),
                 zf, zf, zf, zf, zf, zf, zf], axis=0)         # (16, SL)
            dquad_add = lane_dot(onehot[ns:], Gq)
            if n_q:
                dquad_add = dquad_add + quad_scalar_table(quad_soft)
            monehot = (row_nm == flat(g["wmat"]).astype(jnp.int32)).astype(
                jnp.float32)
            Gm = jnp.concatenate(
                [flat(calb_r), flat(calb_g), flat(calb_b),
                 flat(cfuzz), flat(cior),
                 flat(cemit_r), flat(cemit_g), flat(cemit_b)],
                axis=0)                                       # (8, SL)
            dmat_add = lane_dot(monehot, Gm)
            if Gl_rows is not None:
                lone = (row_nl == flat(
                    kpick.astype(jnp.float32)).astype(jnp.int32)).astype(
                    jnp.float32)
                Gl = jnp.concatenate(
                    [flat(r) for r in Gl_rows] + [zf, zf, zf, zf], axis=0)
                dlight_add = lane_dot(lone, Gl)
            else:
                dlight_add = jnp.zeros((nl, 16), jnp.float32)
            cout = (cox, coy, coz, cdx, cdy, cdz, cT0r, cT0g, cT0b)
            return cout, (dsph_add, dquad_add, dmat_add, dlight_add,
                          cbg_r, cbg_g, cbg_b)

        # ============== phase 1: forward NEE image ====================
        v0 = px * 0.0       # lane-varying zero (safe Mosaic loop layout)
        zeros_ = v0
        ones_ = v0 + 1.0

        def sample_fwd(s, acc):
            ox, oy, oz, dx, dy, dz, sample_id = raygen(s)
            st0 = (ox, oy, oz, dx, dy, dz, ones_, ones_, ones_, ones_,
                   zeros_)

            def b_body(b, carry):
                st = carry[:11]
                col = carry[11:]
                best_t, rowf, _hit = closest_hit(
                    st[0], st[1], st[2], st[3], st[4], st[5], True)
                g = shade(sample_id, b.astype(jnp.uint32), st, best_t,
                          rowf)
                vis = shadow_vis(g)
                if cache_isect:
                    idx = s * mb + b
                    ct_ref[idx] = best_t
                    cr_ref[idx] = rowf
                    cv_ref[idx] = vis
                dcr, dcg, dcb = color_adds(g, st, vis)
                st2 = advance(g, st)
                return st2 + (col[0] + dcr, col[1] + dcg, col[2] + dcb)

            carry = st0 + (zeros_, zeros_, zeros_)
            carry = jax.lax.fori_loop(0, mb, b_body, carry)
            ar, ag, ab = acc
            return (ar + carry[11], ag + carry[12], ab + carry[13])

        def regen_fwd_image():
            """Per-lane sample-regeneration forward (the megakernel's
            _regen_sample_loop bookkeeping + the diff estimator's pd_f
            emission-skip carry): a lane pays ~ spp x mean path length
            instead of spp x mb. Per-lane op sequences are identical to
            the lockstep sample_fwd (same RNG streams keyed on
            (pixel, sample, bounce), same fold order per lane), so the
            image is bit-identical. Used when the intersection cache is
            OFF — regeneration's per-lane (sample, bounce) cursors can't
            store at the cache's uniform (s*mb + b) indices; at
            cache-sized configs (small spp x mb) the lockstep+cache
            combination is the faster pair anyway."""
            fspp = float(spp)
            fmb = float(mb)

            def loop_cond(stt):
                return jnp.min(stt[0]) < fspp

            def loop_body(stt):
                (samp_f, bnc_f, ox, oy, oz, dx, dy, dz,
                 tr_, tg_, tb_, col_r, col_g, col_b,
                 acc_r, acc_g, acc_b, alive_f, pd_f) = stt
                # fold the finished sample, start the next one (per lane)
                need = alive_f < 0.5
                acc_r = jnp.where(need, acc_r + col_r, acc_r)
                acc_g = jnp.where(need, acc_g + col_g, acc_g)
                acc_b = jnp.where(need, acc_b + col_b, acc_b)
                samp_f = jnp.where(need, samp_f + 1.0, samp_f)
                start = need & (samp_f < fspp)
                samp_u = spp_offset + jnp.maximum(samp_f, 0.0).astype(
                    jnp.int32).astype(jnp.uint32)
                gox, goy, goz, gdx, gdy, gdz = gen_camera_ray(samp_u)
                ox = jnp.where(start, gox, ox)
                oy = jnp.where(start, goy, oy)
                oz = jnp.where(start, goz, oz)
                dx = jnp.where(start, gdx, dx)
                dy = jnp.where(start, gdy, dy)
                dz = jnp.where(start, gdz, dz)
                col_r = jnp.where(need, 0.0, col_r)
                col_g = jnp.where(need, 0.0, col_g)
                col_b = jnp.where(need, 0.0, col_b)
                tr_ = jnp.where(start, 1.0, tr_)
                tg_ = jnp.where(start, 1.0, tg_)
                tb_ = jnp.where(start, 1.0, tb_)
                bnc_f = jnp.where(start, 0.0, bnc_f)
                alive_f = jnp.where(start, 1.0, alive_f)
                pd_f = jnp.where(start, 0.0, pd_f)

                # one bounce for whoever is live
                was_alive = alive_f
                bctr = bnc_f.astype(jnp.int32).astype(jnp.uint32)
                st = (ox, oy, oz, dx, dy, dz, tr_, tg_, tb_, alive_f,
                      pd_f)
                best_t, rowf, _hit = closest_hit(
                    ox, oy, oz, dx, dy, dz, True)
                g = shade(samp_u, bctr, st, best_t, rowf)
                vis = shadow_vis(g)
                dcr, dcg, dcb = color_adds(g, st, vis)
                col_r = col_r + dcr
                col_g = col_g + dcg
                col_b = col_b + dcb
                (ox, oy, oz, dx, dy, dz, tr_, tg_, tb_, alive_f,
                 pd_f) = advance(g, st)
                # budget exhaustion kills with NO background add
                bnc_f = bnc_f + was_alive
                alive_f = jnp.where(bnc_f < fmb, alive_f, 0.0)
                return (samp_f, bnc_f, ox, oy, oz, dx, dy, dz,
                        tr_, tg_, tb_, col_r, col_g, col_b,
                        acc_r, acc_g, acc_b, alive_f, pd_f)

            z0 = lambda: v0
            o0 = lambda: v0 + 1.0
            st0 = (
                v0 - 1.0,                           # samp: pre-first
                z0(),                               # bounce counter
                z0(), z0(), z0(),                   # o (regen'd first)
                z0(), z0(), o0(),                   # d (inert +z)
                o0(), o0(), o0(),                   # throughput
                z0(), z0(), z0(),                   # sample color
                z0(), z0(), z0(),                   # accumulator
                z0(),                               # dead -> regen
                z0(),                               # pd_f
            )
            stt = jax.lax.while_loop(loop_cond, loop_body, st0)
            return stt[14], stt[15], stt[16]

        if cache_isect:
            ar, ag, ab = jax.lax.fori_loop(
                0, spp, sample_fwd, (zeros_, zeros_, zeros_))
        else:
            ar, ag, ab = regen_fwd_image()
        inv_spp = 1.0 / float(spp)
        img_r = ar * inv_spp
        img_g = ag * inv_spp
        img_b = ab * inv_spp
        imr_ref[...] = img_r
        img_ref_g[...] = img_g
        imb_ref[...] = img_b

        # ============== phase 2: local loss cotangent =================
        wgt = wgt_ref[...]
        dr_ = img_r - tgr_ref[...]
        dg_ = img_g - tgg_ref[...]
        db_ = img_b - tgb_ref[...]
        cscale = 2.0 * wgt / (npixf * 3.0 * float(spp))
        chat = (cscale * dr_, cscale * dg_, cscale * db_)
        # In-kernel MSE partial (see diffkernel.py: a post-kernel
        # mean((img - target)**2) reads corrupted target values when
        # fused after this custom call under jit on TPU).
        lsum = jnp.sum(wgt * (dr_ * dr_ + dg_ * dg_ + db_ * db_)) / (
            npixf * 3.0)

        # ============== phase 3: replay + adjoint =====================
        def sample_bwd(s, accs):
            (dsph_a, dquad_a, dmat_a, dlight_a, bgr_a, bgg_a, bgb_a) = accs
            ox, oy, oz, dx, dy, dz, sample_id = raygen(s)
            st = (ox, oy, oz, dx, dy, dz, ones_, ones_, ones_, ones_,
                  zeros_)
            saves = []
            for b in range(mb):                  # python-unrolled
                if cache_isect:
                    idx = s * mb + b
                    best_t = ct_ref[idx]
                    rowf = cr_ref[idx]
                    vis = cv_ref[idx]
                    g = shade(sample_id, jnp.uint32(b), st, best_t, rowf,
                              lite=True, need_nee=False)
                else:
                    best_t, rowf, _hit = closest_hit(
                        st[0], st[1], st[2], st[3], st[4], st[5], True)
                    g = shade(sample_id, jnp.uint32(b), st, best_t, rowf,
                              lite=True)
                    vis = shadow_vis(g)
                # VMEM accounting: this tuple's size (11 state rows + 3)
                # is mirrored in _non_cache_vmem_bytes — update both
                saves.append((st, best_t, rowf, vis))
                st = advance(g, st)
            co = (zeros_,) * 9
            for b in reversed(range(mb)):
                st_b, bt_b, rowf_b, vis_b = saves[b]
                co, adds = bounce_adj(sample_id, b, st_b, bt_b, rowf_b,
                                      vis_b, co, chat)
                dsph_a = dsph_a + adds[0]
                dquad_a = dquad_a + adds[1]
                dmat_a = dmat_a + adds[2]
                dlight_a = dlight_a + adds[3]
                bgr_a = bgr_a + adds[4]
                bgg_a = bgg_a + adds[5]
                bgb_a = bgb_a + adds[6]
            return (dsph_a, dquad_a, dmat_a, dlight_a, bgr_a, bgg_a,
                    bgb_a)

        accs0 = (
            jnp.zeros((ns, 8), jnp.float32),
            jnp.zeros((nq, 16), jnp.float32),
            jnp.zeros((nm, 8), jnp.float32),
            jnp.zeros((nl, 16), jnp.float32),
            zeros_, zeros_, zeros_,
        )
        accs = jax.lax.fori_loop(0, spp, sample_bwd, accs0)
        dsph_a, dquad_a, dmat_a, dlight_a, bgr_a, bgg_a, bgb_a = accs

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

        first = pl.program_id(0) == 0

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


def render_value_and_grad_packed(
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
    tile: tuple | None = None,
    mesh=None,
    surr_sph: bool = True,
    surr_quad: bool = True,
):
    """Packed-layout drop-in for diffkernel.render_value_and_grad.

    tile: optional (sublanes, lanes) override of the module defaults —
    used by tests to keep interpret-mode tiles small.

    surr_sph / surr_quad (VERDICT r4 #1): class-level boundary-surrogate
    scope — False statically compiles that class's soft-shadow +
    silhouette surrogate chains out of the adjoint (the class's soft
    visibility factor becomes 1, the same convention as the classic
    kernel's empty row subset). Correct when the fit trains no geometry
    of that class: the skipped chains feed only that class's geometry
    gradient rows (plus surrogate-artifact cotangents into the shared
    ray chain, the same terms diffkernel.py's subset mode drops).

    mesh: optional jax.sharding.Mesh. Data-parallel training over the
    pixel-tile blocks (BASELINE config 5's "sharded across >=2 hosts"):
    every device runs the SAME fused kernel on its shard of the tile
    blocks and the parameter-gradient tables are `psum`-reduced over the
    whole mesh — the per-pixel loss cotangent involves only that pixel's
    own samples, so tile sharding changes nothing in the estimator
    (gradients match single-device up to psum summation order). The
    scene tables replicate (KBs); rays are the big tensor — the same
    layout argument as parallel/sharded.py.
    """
    from tinyraytracer_tpu.ops.diffkernel import _grads_to_scene

    if static is None:
        static = build_diff_static(scene)
    st = static
    w, h = camera.width, camera.height
    npix = w * h
    cam_vec = _camera_vector(camera, background)
    cam_vec = cam_vec.at[0, 23].set(float(npix))
    ctl = jnp.asarray([[0, 0, 0, 0]], jnp.int32)
    ctl = ctl.at[0, 0].set(jnp.asarray(seed, jnp.uint32).astype(jnp.int32))
    ctl = ctl.at[0, 1].set(
        jnp.asarray(spp_offset, jnp.uint32).astype(jnp.int32))

    tab, prims, light_off = packed_flat_table(scene, st)
    s, l = tile if tile is not None else (DIFF_SUBLANES, DIFF_LANES)

    n_shards = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    pid, px, py, wgt, pid_flat, inv, g = _packed_diff_arrays(
        w, h, s, l, n_shards)
    tgt = jnp.asarray(target, jnp.float32).reshape(-1, 3)
    # per-lane targets in kernel input layout (duplicate lanes carry
    # their pixel's target; they are weight-0 in the cotangent); pure
    # jnp so a traced target works
    tgt_lanes = jnp.take(
        tgt, jnp.minimum(jnp.asarray(pid_flat.astype(np.int32)), npix - 1),
        axis=0)                                       # (G*S*L, 3)
    tgt_in = [
        tgt_lanes[:, c].reshape(g, s, l).transpose(1, 0, 2).reshape(
            s, g * l)
        for c in range(3)
    ]

    ns, nq, nl, nm = st.ns, st.nq, st.nl, st.nm
    from tinyraytracer_tpu.ops.diffkernel import static_kind_flags
    has_met, has_die = static_kind_flags(st)
    cache_bytes = 3 * spp * max_bounces * s * l * 4
    cache_isect = (
        cache_bytes <= DIFF_ISECT_CACHE_BYTES
        and cache_bytes + _non_cache_vmem_bytes(max_bounces, s, l)
        <= DIFF_VMEM_LIMIT)
    # padded-payload rows of the light quads (prims order): lets the
    # kernel statically skip the single sampled light in the soft shadow
    light_prows = tuple(
        st.ns + st.quad_rows.index(r) for r in st.light_quad_rows)
    kernel = _make_packed_diff_kernel(
        spp, max_bounces, prims, light_off, ns, nq, nm, nl,
        st.n_lights, nee, silhouette, s, l, has_met, has_die, cache_isect,
        light_prows=light_prows, surr_sph=surr_sph, surr_quad=surr_quad)
    nw = tab.shape[1]
    tspec = lambda i: (0, i)
    const = lambda i: (0, 0)
    g_local = g // n_shards

    def call_local(cam_v, ctl_v, tab_v, pid_a, px_a, py_a, wgt_a,
                   t0, t1, t2):
        return pl.pallas_call(
            kernel,
            grid=(g_local,),
            in_specs=[
                pl.BlockSpec((1, 32), const, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 4), const, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nw), const, memory_space=pltpu.SMEM),
            ]
            + [pl.BlockSpec((s, l), tspec,
                            memory_space=pltpu.VMEM)] * 7,
            out_specs=[pl.BlockSpec((s, l), tspec,
                                    memory_space=pltpu.VMEM)] * 3
            + [
                pl.BlockSpec((ns, 8), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((nq, 16), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((nm, 8), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((nl, 16), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), const, memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((s, g_local * l),
                                            jnp.float32)] * 3
            + [
                jax.ShapeDtypeStruct((ns, 8), jnp.float32),
                jax.ShapeDtypeStruct((nq, 16), jnp.float32),
                jax.ShapeDtypeStruct((nm, 8), jnp.float32),
                jax.ShapeDtypeStruct((nl, 16), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ],
            scratch_shapes=(
                [pltpu.VMEM((spp * max_bounces, s, l), jnp.float32)] * 3
                if cache_isect else []),
            compiler_params=pltpu.CompilerParams(
                # the reverse sweep's bounce saves + live shade dict
                # exceed the default scoped-VMEM budget at >=8192 rays
                vmem_limit_bytes=DIFF_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(cam_v, ctl_v, tab_v, pid_a, px_a, py_a, wgt_a, t0, t1, t2)

    args = (cam_vec, ctl, tab, jnp.asarray(pid), jnp.asarray(px),
            jnp.asarray(py), jnp.asarray(wgt), *tgt_in)
    if mesh is None:
        outs = call_local(*args)
    else:
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.shape.keys())

        def body(cam_v, ctl_v, tab_v, pid_a, px_a, py_a, wgt_a,
                 t0, t1, t2):
            outs = call_local(cam_v, ctl_v, tab_v, pid_a, px_a, py_a,
                              wgt_a, t0, t1, t2)
            ims, tabs = outs[:3], outs[3:]
            tabs = [jax.lax.psum(t, axes) for t in tabs]
            return (*ims, *tabs)

        shard = P(None, axes)   # tile blocks split over the whole mesh
        outs = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(), P(), shard, shard, shard, shard,
                      shard, shard, shard),
            out_specs=(shard, shard, shard, P(), P(), P(), P(), P()),
            check_vma=False,
        )(*args)

    imr, img_g, imb, dsph, dquad, dmat, dlight, dmisc = outs
    color = jnp.stack([imr, img_g, imb], 0)           # (3, S, G*L)
    color = color.reshape(3, s, g, l).transpose(0, 2, 1, 3).reshape(3, -1)
    del inv  # flat layout: lane order IS pixel order
    img = color[:, :npix].T.reshape(h, w, 3)
    # In-kernel MSE (dmisc[0, 3]; psum'd over mesh shards like every
    # other table) — never recompute from `target` post-kernel, see
    # diffkernel.py's note on the jit/TPU corrupted-constant read.
    loss = dmisc[0, 3]
    grads = _grads_to_scene(scene, st, dsph, dquad, dmat, dlight, dmisc)
    return loss, img, grads
