"""Sublane-packed path-tracing megakernel: 8x the VPU per elementwise op.

The classic megakernel (ops/megakernel.py) keeps per-ray state as (1, TR)
rows. That shape is ideal for the (NA, TR) candidate-matrix intersection
(primitives occupy sublanes), but every *per-ray* op — camera generation,
RNG, scatter, accumulation, the regeneration bookkeeping — runs on one
sublane of each 8x128 vreg: 1/8 of the VPU. At Cornell scale (NA ~ 20) the
per-ray chain dominates, so most of the machine idles.

Here ray state is (S, L) — S sublanes x L lanes, S*L rays per tile — so
every elementwise op fills S/8 full vregs. Intersection drops the candidate
matrix for a per-primitive *unrolled* loop reading scene scalars from SMEM
(broadcast against the whole (S, L) tile) with a running min/select chain
for the winner payload — no argmin, no one-hot MXU gather. A standalone
probe of one path segment's op mix (scripts/probe_seglayout.py, v5e)
measured 0.615 ns/ray-seg for the classic layout vs 0.066 for (32, 256)
packed — 9.3x — so this is the production forward path for scenes small
enough to unroll (PACKED_MAX_PRIMS); the classic kernel remains both the
reference oracle and the large-scene (config 4) path, where the candidate
matrix already fills sublanes with primitives.

Semantics are bit-identical to the classic regeneration kernel per pixel:
the RNG is counter-based on (pixel, sample, bounce) — placement-invariant —
and the shading math is literally shared (megakernel._shade_bounce), the
intersection formulas are copied op for op, and the strict `<` min-chain
reproduces the classic argmin-first tie-break (rows are enumerated in the
same compacted spheres-then-quads order). Reference semantics preserved:
near-then-far sphere roots (sphere.rs:29-54), half-open quad bounds
(quad.rs:41), budget-exhaustion-adds-no-background (cpu.rs:47-62).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyraytracer_tpu.ops.intersect_pallas import CompactScene
from tinyraytracer_tpu.ops.megakernel import (
    _MISS,
    _T_MIN,
    _TWO_PI,
    _regen_sample_loop,
    _shade_bounce,
    _uniform4,
    _normalize3,
)

# Tile shape: S sublanes x L lanes. (32, 256) measured fastest of
# {8,16,32}x{128,256,512} in the layout probe (more sublane rows = more
# independent work per op to hide VPU latency; 256 lanes = 2 vregs wide).
PACKED_SUBLANES = int(_os.environ.get("TINYRT_PACKED_SUBLANES", "32"))
PACKED_LANES = int(_os.environ.get("TINYRT_PACKED_LANES", "256"))

# Above this many real primitives the unrolled per-prim loop stops paying
# (code size grows linearly; the classic candidate matrix already fills
# sublanes with primitives at that scale). Measured on v5e (sky-lit
# random spheres, 400x225 spp=64): packed vs classic is 126.5/123.7
# Mrays/s at 48 prims, 101.8/100.1 at 96, 66.0/74.5 at 160 — the
# crossover sits between 96 and 160, so 48 is conservative by ~2% in
# the 48-96 band; kept for the smaller unrolled code size.
PACKED_MAX_PRIMS = int(_os.environ.get("TINYRT_PACKED_MAX_PRIMS", "48"))

_SPH_FIELDS = 4     # cx cy cz r2
_QUAD_FIELDS = 15   # n(3) dp av(3) ca bv(3) cb nhat(3)
_MAT_FIELDS = 9     # kind albedo(3) fuzz ior emit(3)


def scene_table(cs: CompactScene, pay) -> tuple[np.ndarray, tuple]:
    """Flatten the compacted scene into one SMEM scalar row.

    Values are copied verbatim from the CompactScene columns and the
    classic kernel's payload matrix (megakernel._payload_matrix), so the
    packed kernel consumes bit-identical scene constants. Returns
    (table (1, NW) f32, prims) where prims is a static tuple of
    ("s"|"q", offset) in compacted spheres-then-quads order; each prim's
    material block sits right after its geometry fields.
    """
    pay = np.asarray(pay)
    sph_c = np.asarray(cs.sph_c)
    sph_r2 = np.asarray(cs.sph_r2)
    quad_n = np.asarray(cs.quad_n)
    quad_dp = np.asarray(cs.quad_dp)
    quad_av = np.asarray(cs.quad_av)
    quad_ca = np.asarray(cs.quad_ca)
    quad_bv = np.asarray(cs.quad_bv)
    quad_cb = np.asarray(cs.quad_cb)

    vals: list[float] = []
    prims: list[tuple[str, int]] = []

    def mat_block(row):
        return [pay[7, row], pay[8, row], pay[9, row], pay[10, row],
                pay[11, row], pay[12, row], pay[13, row], pay[14, row],
                pay[15, row]]

    for r in range(cs.n_sph_real):
        prims.append(("s", len(vals)))
        vals += [sph_c[r, 0], sph_c[r, 1], sph_c[r, 2], sph_r2[r, 0]]
        vals += mat_block(r)
    for j in range(cs.n_quad_real):
        row = cs.ns + j
        prims.append(("q", len(vals)))
        vals += [quad_n[j, 0], quad_n[j, 1], quad_n[j, 2], quad_dp[j, 0],
                 quad_av[j, 0], quad_av[j, 1], quad_av[j, 2], quad_ca[j, 0],
                 quad_bv[j, 0], quad_bv[j, 1], quad_bv[j, 2], quad_cb[j, 0],
                 pay[4, row], pay[5, row], pay[6, row]]
        vals += mat_block(row)

    nw = max(8, ((len(vals) + 7) // 8) * 8)
    tab = np.zeros((1, nw), np.float32)
    tab[0, : len(vals)] = np.asarray(vals, np.float32)
    # Host array, not jnp: callers cache the table across calls (e.g.
    # MegakernelRenderer._packed), and a jnp constant created inside a
    # jit trace (render_burst's batched program) would leak its tracer
    # into that cache. Numpy converts to a device constant at use.
    return tab, tuple(prims)


def _make_packed_kernel(spp: int, max_bounces: int, prims: tuple,
                        has_met: bool = True, has_die: bool = True,
                        sky: bool = False):
    """Regeneration main loop on (S, L) state (see megakernel regen docs:
    each lane owns its own (sample, bounce) cursor and pays ~ spp x mean
    path length)."""

    def kernel(cam_ref, ctl_ref, tab_ref, pid_ref, px_ref, py_ref,
               outr_ref, outg_ref, outb_ref):
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
        # sky top (static: constant scenes compile the lerp out)
        bg2_r, bg2_g, bg2_b = (
            (cam(24), cam(25), cam(26)) if sky else (None, None, None))
        seed = ctl_ref[0, 0].astype(jnp.uint32)
        spp_offset = ctl_ref[0, 1].astype(jnp.uint32)

        def tb(j):
            return tab_ref[0, j]

        def closest_hit(ox, oy, oz, dx, dy, dz):
            best = jnp.full_like(ox, _MISS)
            zro = jnp.zeros_like(ox)
            w_isq = zro
            w_ax = zro
            w_ay = zro
            w_az = zro
            w_kind = zro
            w_ar = zro
            w_ag = zro
            w_ab = zro
            w_fuzz = zro
            w_ior = zro
            w_er = zro
            w_eg = zro
            w_eb = zro
            for kind, off in prims:
                if kind == "s":
                    # sphere quadratic, near-then-far (sphere.rs:29-54);
                    # same op order as megakernel._sphere_rows_test
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
                    isq = 0.0
                    ax, ay, az = cxs, cys, czs
                    moff = off + _SPH_FIELDS
                else:
                    # quad plane + planar coords, half-open [0,1)
                    # (quad.rs:33-54); same op order as _quad_best
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
                    isq = 1.0
                    ax, ay, az = tb(off + 12), tb(off + 13), tb(off + 14)
                    moff = off + _QUAD_FIELDS
                # strict < keeps the FIRST row at the global min — the
                # classic kernel's argmin-first tie-break, same row order
                w = ts < best
                best = jnp.where(w, ts, best)
                w_isq = jnp.where(w, isq, w_isq)
                w_ax = jnp.where(w, ax, w_ax)
                w_ay = jnp.where(w, ay, w_ay)
                w_az = jnp.where(w, az, w_az)
                w_kind = jnp.where(w, tb(moff), w_kind)
                w_ar = jnp.where(w, tb(moff + 1), w_ar)
                w_ag = jnp.where(w, tb(moff + 2), w_ag)
                w_ab = jnp.where(w, tb(moff + 3), w_ab)
                # fuzz/ior feed only the compiled-out scatter chains —
                # skip their per-prim selects when the kind is absent
                if has_met:
                    w_fuzz = jnp.where(w, tb(moff + 4), w_fuzz)
                if has_die:
                    w_ior = jnp.where(w, tb(moff + 5), w_ior)
                w_er = jnp.where(w, tb(moff + 6), w_er)
                w_eg = jnp.where(w, tb(moff + 7), w_eg)
                w_eb = jnp.where(w, tb(moff + 8), w_eb)
            hit = best < _MISS
            return best, hit, (w_isq, w_ax, w_ay, w_az, w_kind,
                               w_ar, w_ag, w_ab, w_fuzz, w_ior,
                               w_er, w_eg, w_eb)

        def gen_camera_ray(sample_id):
            r1, r2_, r3, r4 = _uniform4(pid, sample_id, jnp.uint32(0), seed)
            # pointgen.rs:41-42 (w-1)/(h-1) normalization
            u = (px + r1) * inv_w1
            v = (py + r2_) * inv_h1
            # defocus disk, polar form (math/vec3extend.rs:45-53)
            rad = jnp.sqrt(r3)
            th = _TWO_PI * r4
            ox = pos_x + rad * jnp.cos(th) * dux + rad * jnp.sin(th) * dvx
            oy = pos_y + rad * jnp.cos(th) * duy + rad * jnp.sin(th) * dvy
            oz = pos_z + rad * jnp.cos(th) * duz + rad * jnp.sin(th) * dvz
            tx = ul_x + u * hx - v * vx - ox
            ty = ul_y + u * hy - v * vy - oy
            tz = ul_z + u * hz - v * vz - oz
            dx, dy, dz = _normalize3(tx, ty, tz)   # ray.rs:13
            return ox, oy, oz, dx, dy, dz

        def bounce_step(sample_id, bctr, st):
            (ox, oy, oz, dx, dy, dz,
             tput_r, tput_g, tput_b, col_r, col_g, col_b, alive_f) = st
            alive = alive_f > 0.5
            best_t, hit, w = closest_hit(ox, oy, oz, dx, dy, dz)
            # scatter randomness: stream 1 + bounce (ops/scatter.py)
            u1, u2, u3, u4 = _uniform4(
                pid, sample_id, jnp.uint32(1) + bctr, seed)
            return _shade_bounce(
                ox, oy, oz, dx, dy, dz,
                tput_r, tput_g, tput_b, col_r, col_g, col_b,
                alive, best_t, hit, *w,
                u1, u2, u3, u4, bg_r, bg_g, bg_b,
                has_met=has_met, has_die=has_die,
                bg2_r=bg2_r, bg2_g=bg2_g, bg2_b=bg2_b)

        # Per-lane persistent-path sample loop, shared op for op with the
        # classic kernel (megakernel._regen_sample_loop) — one source for
        # the fold/start/budget bookkeeping keeps the bitwise-parity
        # invariant a single point of change.
        acc_r, acc_g, acc_b = _regen_sample_loop(
            px, spp, max_bounces, spp_offset, gen_camera_ray, bounce_step)
        inv = 1.0 / float(spp)
        outr_ref[...] = acc_r * inv
        outg_ref[...] = acc_g * inv
        outb_ref[...] = acc_b * inv

    return kernel


@functools.lru_cache(maxsize=32)
def _packed_pixel_arrays(width: int, height: int, s: int, l: int,
                         g_mult: int = 1):
    """Block pixel order for (S, L) tiles: tile g covers a bw x bh pixel
    block (bw*bh = S*L), lane (s, l) -> block offset j = s*L + l. Edge
    blocks clamp to duplicate pixels, which recompute bit-identically (RNG
    keys off pixel id alone). Returns numpy (S, G*L) pid/px/py in the
    kernel's input layout, the pixel->flat-lane inverse map, and G."""
    tile = s * l
    bw = min(128, 1 << (tile.bit_length() // 2))
    bh = tile // bw
    nbx = -(-width // bw)
    nby = -(-height // bh)
    g = nbx * nby
    # g_mult: pad the tile count to a multiple (sharding over the tile
    # axis needs equal per-device grids). Pad blocks clamp to in-image
    # pixels and recompute them bit-identically (RNG keys off pixel id
    # alone); the reversed-write inverse map keeps the FIRST occurrence
    # of every pixel, so pad duplicates never win.
    g = ((g + g_mult - 1) // g_mult) * g_mult
    i = np.arange(g * tile)
    blk, j = i // tile, i % tile
    x = np.minimum((blk % nbx) * bw + j % bw, width - 1)
    y = np.minimum(np.minimum(blk // nbx, nby - 1) * bh + j // bw,
                   height - 1)
    pid = (y * width + x).astype(np.uint32)
    inv = np.zeros(width * height, np.int32)
    inv[pid[::-1]] = np.arange(len(pid) - 1, -1, -1, dtype=np.int32)

    def to_input(a):
        # flat lane order (g, s, l) -> kernel input layout (S, G*L)
        return np.ascontiguousarray(
            a.reshape(g, s, l).transpose(1, 0, 2).reshape(s, g * l))

    return (to_input(pid),
            to_input(x.astype(np.float32)),
            to_input(y.astype(np.float32)),
            inv, g)


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_bounces", "width", "height", "prims",
                     "s", "l", "interpret", "has_met", "has_die", "sky"),
)
def _render_packed(
    tab,
    cam_vec,
    ctl,
    *,
    spp: int,
    max_bounces: int,
    width: int,
    height: int,
    prims: tuple,
    s: int,
    l: int,
    interpret: bool = False,
    has_met: bool = True,
    has_die: bool = True,
    sky: bool = False,
):
    pid, px, py, inv, g = _packed_pixel_arrays(width, height, s, l)
    nw = tab.shape[1]
    kernel = _make_packed_kernel(spp, max_bounces, prims, has_met, has_die,
                                 sky=sky)
    tile = lambda i: (0, i)
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nw), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((s, l), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, l), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, l), tile, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((s, l), tile, memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((s, g * l), jnp.float32)] * 3,
        interpret=interpret,
    )(cam_vec, ctl, tab, jnp.asarray(pid), jnp.asarray(px), jnp.asarray(py))
    color = jnp.stack(outs, 0)                       # (3, S, G*L)
    color = color.reshape(3, s, g, l).transpose(0, 2, 1, 3).reshape(3, -1)
    return jnp.take(color, jnp.asarray(inv), axis=1).T.reshape(
        height, width, 3)


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_bounces", "width", "height", "prims",
                     "s", "l", "mesh", "interpret", "has_met", "has_die",
                     "sky"),
)
def _render_packed_sharded(
    tab,
    cam_vec,
    ctl,
    *,
    spp: int,
    max_bounces: int,
    width: int,
    height: int,
    prims: tuple,
    s: int,
    l: int,
    mesh,
    interpret: bool = False,
    has_met: bool = True,
    has_die: bool = True,
    sky: bool = False,
):
    """Packed megakernel over a (tile x sample) mesh: pixel tile-blocks
    shard over "tile", spp splits over "sample" with a pmean — the same
    layout as megakernel._render_flat_sharded (scene table replicated,
    rays are the big tensor). Tile-only meshes are bit-identical to the
    single-device packed render (placement-invariant RNG); sample splits
    agree to the 1-ulp mean-of-means reassociation."""
    from jax.sharding import PartitionSpec as P

    from tinyraytracer_tpu.parallel.sharded import SAMPLE_AXIS, TILE_AXIS

    n_tile = mesh.shape[TILE_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    if spp % n_sample != 0:
        raise ValueError(f"spp={spp} not divisible by sample axis "
                         f"{n_sample}")
    spp_local = spp // n_sample
    pid, px, py, inv, g = _packed_pixel_arrays(width, height, s, l, n_tile)
    nw = tab.shape[1]
    kernel = _make_packed_kernel(spp_local, max_bounces, prims,
                                 has_met, has_die, sky=sky)
    g_local = g // n_tile
    tile = lambda i: (0, i)

    def body(cam_v, ctl_v, tab_v, pid_a, px_a, py_a):
        s_idx = jax.lax.axis_index(SAMPLE_AXIS).astype(jnp.int32)
        ctl_v = ctl_v.at[0, 1].add(s_idx * jnp.int32(spp_local))
        outs = pl.pallas_call(
            kernel,
            grid=(g_local,),
            in_specs=[
                pl.BlockSpec((1, 32), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nw), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((s, l), tile, memory_space=pltpu.VMEM),
                pl.BlockSpec((s, l), tile, memory_space=pltpu.VMEM),
                pl.BlockSpec((s, l), tile, memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((s, l), tile,
                                    memory_space=pltpu.VMEM)] * 3,
            out_shape=[jax.ShapeDtypeStruct((s, g_local * l),
                                            jnp.float32)] * 3,
            interpret=interpret,
        )(cam_v, ctl_v, tab_v, pid_a, px_a, py_a)
        return tuple(jax.lax.pmean(o, SAMPLE_AXIS) for o in outs)

    shard = P(None, TILE_AXIS)
    outs = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), shard, shard, shard),
        out_specs=(shard,) * 3,
        check_vma=False,
    )(cam_vec, ctl, tab, jnp.asarray(pid), jnp.asarray(px),
      jnp.asarray(py))
    color = jnp.stack(outs, 0)                       # (3, S, G*L)
    color = color.reshape(3, s, g, l).transpose(0, 2, 1, 3).reshape(3, -1)
    return jnp.take(color, jnp.asarray(inv), axis=1).T.reshape(
        height, width, 3)
