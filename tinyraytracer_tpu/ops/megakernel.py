"""The full path-tracing megakernel: a whole sampler in VMEM.

This is the TPU-native realization of what the reference's Metal backend was
*going* to be (sampler/metal/shader/kernel.metal:35-91 only ever traced one
segment and wrote a debug color): the complete pipeline — jittered camera
ray generation (pointgen.rs:38-51 + camera.rs:58-66), counter RNG, closest
hit over all primitives, material scatter (material/*), emission/background
accumulation (sampler/cpu.rs:47-62) and the sample mean (imager.rs:46-51) —
fused into ONE Pallas kernel launch per image.

Why: the modular XLA path spends ~15 ms/bounce at R=360k on HBM round trips
and dispatch overhead (measured; the fused closest-hit kernel itself is
4 ms). Here a tile of TR rays lives in VMEM for its *entire life*: every
bounce of every sample. HBM traffic is one (TR,) pixel-id read and one
(3, TR) color write per tile — per image. The bounce and sample loops are
`fori_loop`s inside the kernel; per-ray state (o, d, throughput, color,
alive) are VMEM values carried through the loops.

Numerics match the modular path op for op (same pcg4d streams, same
intersection formulas as ops/intersect_pallas.py, same scatter math as
ops/scatter.py), so images agree with the modular renderer up to float
reassociation; all reference semantics (near-then-far roots, half-open quad
bounds, budget-exhaustion-adds-no-background) are preserved.

The megakernel is the production *forward* renderer. Gradients use the
modular path (ops/trace.py), whose selection+recompute structure autodiffs;
both consume the same CompactScene.

Winner payload (centers, normals, material rows) is extracted with a
one-hot reduction over the primitive axis — on the VPU for small scenes;
scenes big enough to want the MXU one-hot matmul should also be using the
two-level culling path (future work, SURVEY.md §7 phase 7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyraytracer_tpu.models.camera import Camera
from tinyraytracer_tpu.models.world import SceneArrays
from tinyraytracer_tpu.ops.intersect_pallas import CompactScene, compact_scene

import os as _os

# Rays per kernel tile (lanes). 1024 measured fastest on v5e for the
# Cornell benchmark (512: 43.5, 1024: 49.6, 2048: 49.1 Mrays/s) — fewer
# grid steps amortize per-step overheads while the (N, TR) candidate
# matrix stays tiny in VMEM. Overridable for experiments.
TILE_RAYS = int(_os.environ.get("TINYRT_TILE_RAYS", "1024"))

# Feasibility cap on (candidate rows x tile rays): the kernel keeps
# several (N, TR) f32 intermediates live, and Mosaic fails to allocate
# past ~512K elements (measured on v5e: 512x1024 [config 4] and
# 4008x128 compile; 4008x256 does not). The auto tile shrinks to keep
# N*TR under this; beyond it at the 128-lane floor the scene must use
# the modular BVH path (Renderer routes this automatically).
MAX_ROWS_X_TILE = int(_os.environ.get("TINYRT_MAX_ROWS_X_TILE",
                                      str(512 * 1024)))


def auto_tile_rays(n_rows: int, want: int = 0) -> int:
    """Largest power-of-2 tile in [128, want] with n_rows*tile under the
    feasibility cap (0 = no feasible tile even at 128 lanes). `want` is
    normalized to a power of two >= 128 first, so a non-pow2 or sub-128
    TINYRT_TILE_RAYS override can't produce a lane-misaligned tile."""
    want = max(int(want or TILE_RAYS), 128)
    tr = 128
    while tr * 2 <= want:
        tr *= 2
    while tr > 128 and n_rows * tr > MAX_ROWS_X_TILE:
        tr //= 2
    return 0 if n_rows * tr > MAX_ROWS_X_TILE else tr

_T_MIN = 1.0e-3      # sampler/cpu.rs:48
_MISS = 3.0e38
_TWO_PI = 6.283185307179586
_INV_2_24 = float(1.0 / (1 << 24))

# NOTE on the opt-in cluster cull (see _build_clusters): measured on v5e
# it loses at every tested size (cfg4: 1.32 vs dense 6.01 Mrays/s) —
# whole-tile `cond` skips are too expensive relative to the 8-sphere
# blocks they avoid — so dense is the default and the cull is opt-in only
# (use_clusters=True), at any sphere count.
#
# A fourth culling design was analyzed in round 3 and rejected on paper:
# per-block FRUSTUM prim subsets for camera rays (host-precomputed, so
# no in-kernel gathers — each block would read a dense (M << N, fields)
# slice). It requires splitting primary rays from continuations into two
# kernel phases, and the continuation phase cannot use per-lane sample
# regeneration (its next-state loads would be per-lane HBM gathers);
# lockstep continuations pay the tile-max path (~4.7x the mean for the
# config-4 sky scene), overwhelming the ~25x bounce-0 saving:
# 0.37*0.04 + 0.63*4.7 ~= 3x the regen kernel's cost. Per-lane sample
# regeneration over the dense candidate matrix remains the fastest
# large-N design measured or modeled on this hardware.
_CLUSTER_P = 8       # spheres per cluster == compacted sublane group


def _morton_order(centers: np.ndarray) -> np.ndarray:
    """Spatial sort: Morton (Z-order) indices of sphere centers.

    The reference reaches spatial coherence through its BVH build
    (bvh.rs:42-84); for the megakernel's cluster march a Morton sort gives
    the same property — nearby spheres land in the same cluster — without
    a tree. 10 bits/axis over the scene bbox."""
    lo = centers.min(axis=0)
    span = np.maximum(centers.max(axis=0) - lo, 1e-12)
    q = np.clip(((centers - lo) / span * 1023.0), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))
    return np.argsort(code, kind="stable")


def _build_clusters(cs: CompactScene):
    """Cluster the compacted (Morton-ordered) spheres into groups of 8.

    Returns (cmin (K,3), cmax (K,3)) device arrays: cluster AABBs over the
    *real* members (sphere bounds center±|r|, aabb.rs:13-19 padding).
    All-inert clusters keep the (1,-1) init — NOTE this is not an
    auto-culling sentinel (the slab test min/max-normalizes the corner
    pairs, so it behaves like the real box [-1,1]^3); it is unreachable
    anyway: padding adds at most 7 inert rows per class, so every
    8-row cluster holds a real member. This is the TPU-native analog of
    the reference's
    two-level Metal acceleration structure (accelstructure.rs:23-67):
    level 1 = cluster AABBs (vector slab tests), level 2 = a static-order
    unrolled loop over clusters where each cluster's 8 spheres (a static
    8-sublane slice of the compacted arrays — no gather) are tested only
    if some live lane's ray enters the cluster AABB before its current
    best hit (the closest-hit narrowing of bvh.rs:96-101, at whole-tile
    granularity)."""
    p = _CLUSTER_P
    ns = cs.ns
    k = ns // p
    c = np.asarray(cs.sph_c)                      # (ns, 3), inert rows 1e30
    r2 = np.asarray(cs.sph_r2)[:, 0]
    r = np.sqrt(r2)
    real = c[:, 0] < 1e29
    cmin = np.full((k, 3), 1.0, np.float32)
    cmax = np.full((k, 3), -1.0, np.float32)      # empty (never hit)
    for ki in range(k):
        m = real[ki * p:(ki + 1) * p]
        if not m.any():
            continue
        cc = c[ki * p:(ki + 1) * p][m]
        rr = r[ki * p:(ki + 1) * p][m][:, None]
        cmin[ki] = (cc - rr).min(axis=0) - 5e-5
        cmax[ki] = (cc + rr).max(axis=0) + 5e-5
    return jnp.asarray(cmin), jnp.asarray(cmax)


# --- in-kernel counter RNG: identical streams to ops/rng.py ----------------

def _pcg4d(a, b, c, d):
    mul = jnp.uint32(1664525)
    add = jnp.uint32(1013904223)
    x = a * mul + add
    y = b * mul + add
    z = c * mul + add
    w = d * mul + add
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _uniform(bits):
    # Top 24 bits; route u32 -> i32 -> f32 (Mosaic has no direct u32->f32
    # cast; the value fits in 24 bits so the i32 hop is exact).
    return (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * _INV_2_24


def _uniform4(pid, sample, stream, seed):
    x, y, z, w = _pcg4d(pid, sample, stream, seed)
    return _uniform(x), _uniform(y), _uniform(z), _uniform(w)


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _shade_bounce(ox, oy, oz, dx, dy, dz,
                  tput_r, tput_g, tput_b, col_r, col_g, col_b,
                  alive, best_t, hit,
                  w_isq, w_ax, w_ay, w_az, w_kind,
                  w_ar, w_ag, w_ab, w_fuzz, w_ior, w_er, w_eg, w_eb,
                  u1, u2, u3, u4, bg_r, bg_g, bg_b,
                  has_met=True, has_die=True,
                  bg2_r=None, bg2_g=None, bg2_b=None):
    """One bounce's shading given the winner payload (cpu.rs:47-62).

    Shape-agnostic: every array argument shares one shape — (1, TR) in the
    classic lane-row kernel, (S, L) in the sublane-packed kernel — so both
    layouts run the exact same op sequence per lane (bit-identical images).
    `w_a*` is the normal source: the quad's unit plane normal when
    `w_isq > 0.5`, the sphere center otherwise (hittable/mod.rs:34-40 does
    the face flip here). `u1..u4` are this bounce's scatter uniforms.
    Returns the post-bounce (o, d, throughput, color, alive_f) state.

    `has_met`/`has_die` are STATIC scene facts (does any valid primitive
    use a Metal / Dielectric material?). When False, that kind's scatter
    math is compiled out entirely. This is exactly value-preserving: the
    skipped results are consumed only through `is_met`/`is_die` winner
    selects, which can never be taken when no primitive carries that kind
    — lanes whose winner is a Light keep whatever the remaining chain
    yields, but their direction is discarded by the `scat` gate below.
    Scenes like the Cornell box (lambertian + light only) drop the whole
    reflect/refract/Schlick chain per bounce.
    """
    hit_live = alive & hit
    miss_live = alive & ~hit

    t = jnp.where(hit, best_t, 1.0)
    p_x = ox + t * dx
    p_y = oy + t * dy
    p_z = oz + t * dz
    # outward normal: quad -> unit plane normal, sphere -> p - c
    onx = jnp.where(w_isq > 0.5, w_ax, p_x - w_ax)
    ony = jnp.where(w_isq > 0.5, w_ay, p_y - w_ay)
    onz = jnp.where(w_isq > 0.5, w_az, p_z - w_az)
    onx, ony, onz = _normalize3(onx, ony, onz)
    # hittable/mod.rs:34-40 face flip
    front = (dx * onx + dy * ony + dz * onz) < 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    nx_ = onx * sgn
    ny_ = ony * sgn
    nz_ = onz * sgn

    # cpu.rs:58-60 miss -> background; cpu.rs:49-50 emission.
    # Gradient sky (see _camera_vector): lerp bottom->top on the unit
    # miss direction's y; bg2 == bg makes the lerp exactly bg (t*0 == 0),
    # so constant scenes keep bit-identical images.
    if bg2_r is not None:
        tmix = 0.5 * (dy + 1.0)
        bg_r = bg_r + tmix * (bg2_r - bg_r)
        bg_g = bg_g + tmix * (bg2_g - bg_g)
        bg_b = bg_b + tmix * (bg2_b - bg_b)
    mlf = miss_live.astype(jnp.float32)
    hlf = hit_live.astype(jnp.float32)
    col_r = col_r + mlf * tput_r * bg_r + hlf * tput_r * w_er
    col_g = col_g + mlf * tput_g * bg_g + hlf * tput_g * w_eg
    col_b = col_b + mlf * tput_b * bg_b + hlf * tput_b * w_eb

    # uniform in unit ball, inverse CDF (vec3extend.rs:15-30)
    theta = _TWO_PI * u1
    cphi = 1.0 - 2.0 * u2
    sphi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cphi * cphi))
    # ops/rng.py cbrt: exp(log/3) (Mosaic has no cbrt primitive)
    rr = jnp.exp(jnp.log(jnp.maximum(u3, 1e-30)) * (1.0 / 3.0))
    bx = rr * sphi * jnp.cos(theta)
    by = rr * sphi * jnp.sin(theta)
    bz = rr * cphi
    bnorm = jax.lax.rsqrt(jnp.maximum(bx * bx + by * by + bz * bz, 1e-30))
    ux_ = bx * bnorm
    uy_ = by * bnorm
    uz_ = bz * bnorm

    # Lambertian (lambertian.rs:16-22)
    lx = nx_ + ux_
    ly = ny_ + uy_
    lz = nz_ + uz_
    degen = (jnp.abs(lx) < 1e-7) & (jnp.abs(ly) < 1e-7) & (jnp.abs(lz) < 1e-7)
    lx = jnp.where(degen, nx_, lx)
    ly = jnp.where(degen, ny_, ly)
    lz = jnp.where(degen, nz_, lz)

    if has_met or has_die:
        # shared reflection (metal.rs:18-25 / dielectric reflect branch)
        ddn = dx * nx_ + dy * ny_ + dz * nz_
        rx = dx - 2.0 * ddn * nx_
        ry = dy - 2.0 * ddn * ny_
        rz = dz - 2.0 * ddn * nz_
    if has_met:
        # Metal fuzz (metal.rs:18-25)
        mx = rx + w_fuzz * bx
        my = ry + w_fuzz * by
        mz = rz + w_fuzz * bz
    if has_die:
        # Dielectric (dielectric.rs:26-46)
        eta = jnp.where(front, 1.0 / w_ior, w_ior)
        cos = jnp.minimum(-(nx_ * dx + ny_ * dy + nz_ * dz), 1.0)
        sin = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos * cos))
        tir = eta * sin > 1.0
        sr0 = (1.0 - eta) / (1.0 + eta)
        r0 = sr0 * sr0
        refl = r0 + (1.0 - r0) * (1.0 - cos) ** 5
        choose_reflect = tir | (refl > u4)
        # refract (vec3extend.rs:79-84)
        px_ = eta * (dx + nx_ * cos)
        py2 = eta * (dy + ny_ * cos)
        pz_ = eta * (dz + nz_ * cos)
        plen2 = px_ * px_ + py2 * py2 + pz_ * pz_
        # Same 1e-12 floor as ops/scatter.py refract: keeps the two
        # paths bit-identical at grazing incidence.
        par = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - plen2), 1e-12))
        fx = px_ + par * nx_
        fy = py2 + par * ny_
        fz = pz_ + par * nz_
        gx = jnp.where(choose_reflect, rx, fx)
        gy = jnp.where(choose_reflect, ry, fy)
        gz = jnp.where(choose_reflect, rz, fz)

    # winner-kind select over whichever kinds exist in the scene; an
    # absent kind's branch can never win, so dropping it from the chain
    # is value-identical on every reachable lane
    is_lam = w_kind < 0.5
    if has_met and has_die:
        is_met = (w_kind >= 0.5) & (w_kind < 1.5)
        sx = jnp.where(is_lam, lx, jnp.where(is_met, mx, gx))
        sy = jnp.where(is_lam, ly, jnp.where(is_met, my, gy))
        sz = jnp.where(is_lam, lz, jnp.where(is_met, mz, gz))
    elif has_met:
        sx = jnp.where(is_lam, lx, mx)
        sy = jnp.where(is_lam, ly, my)
        sz = jnp.where(is_lam, lz, mz)
    elif has_die:
        sx = jnp.where(is_lam, lx, gx)
        sy = jnp.where(is_lam, ly, gy)
        sz = jnp.where(is_lam, lz, gz)
    else:
        sx, sy, sz = lx, ly, lz
    sx, sy, sz = _normalize3(sx, sy, sz)

    absorbed = w_kind >= 2.5          # LIGHT = 3
    scat = hit_live & ~absorbed
    sf = scat.astype(jnp.float32)
    inv_sf = 1.0 - sf
    tput_r = tput_r * (inv_sf + sf * w_ar)
    tput_g = tput_g * (inv_sf + sf * w_ag)
    tput_b = tput_b * (inv_sf + sf * w_ab)
    ox = jnp.where(scat, p_x, ox)
    oy = jnp.where(scat, p_y, oy)
    oz = jnp.where(scat, p_z, oz)
    dx = jnp.where(scat, sx, dx)
    dy = jnp.where(scat, sy, dy)
    dz = jnp.where(scat, sz, dz)
    return (ox, oy, oz, dx, dy, dz,
            tput_r, tput_g, tput_b, col_r, col_g, col_b, sf)


def _regen_sample_loop(px, spp, max_bounces, spp_offset,
                       gen_camera_ray, bounce_step):
    """Per-lane persistent-path sample loop, shared by the classic and the
    sublane-packed kernels (megakernel_packed.py).

    Each lane owns its own (sample, bounce) cursor: the moment its path
    dies it folds the sample into its accumulator and immediately starts
    its next camera ray, so a lane pays ~ spp x mean path length instead of
    spp x (tile max path). Pure per-lane selects — no compaction, no
    cross-lane traffic except the one scalar while-condition reduce per
    bounce. Per-lane op sequences are identical to the classic lockstep
    rounds, so the image is bit-identical.

    `px` seeds every carry with a lane-VARYING zero: splat-constant carries
    get a lane-replicated Mosaic layout that the loop body's lane-varying
    updates can't relayout back to ("Invalid relayout ... replicated in
    destination but not in source").

    Returns (acc_r, acc_g, acc_b): per-lane radiance SUMS over spp samples.
    """
    fspp = float(spp)
    fmb = float(max_bounces)

    def loop_cond(st):
        return jnp.min(st[0]) < fspp

    def loop_body(st):
        (samp_f, bnc_f, ox, oy, oz, dx, dy, dz,
         tput_r, tput_g, tput_b, col_r, col_g, col_b,
         acc_r, acc_g, acc_b, alive_f) = st

        # fold the finished sample, start the next one (per lane)
        need = alive_f < 0.5
        acc_r = jnp.where(need, acc_r + col_r, acc_r)
        acc_g = jnp.where(need, acc_g + col_g, acc_g)
        acc_b = jnp.where(need, acc_b + col_b, acc_b)
        samp_f = jnp.where(need, samp_f + 1.0, samp_f)
        start = need & (samp_f < fspp)
        # f32 -> i32 -> u32: sample counters stay < 2^24, exact
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
        tput_r = jnp.where(start, 1.0, tput_r)
        tput_g = jnp.where(start, 1.0, tput_g)
        tput_b = jnp.where(start, 1.0, tput_b)
        bnc_f = jnp.where(start, 0.0, bnc_f)
        alive_f = jnp.where(start, 1.0, alive_f)

        # one bounce for whoever is live
        was_alive = alive_f
        bctr = bnc_f.astype(jnp.int32).astype(jnp.uint32)
        (ox, oy, oz, dx, dy, dz,
         tput_r, tput_g, tput_b, col_r, col_g, col_b,
         alive_f) = bounce_step(
            samp_u, bctr,
            (ox, oy, oz, dx, dy, dz,
             tput_r, tput_g, tput_b, col_r, col_g, col_b, alive_f))
        # budget exhaustion kills with NO background add (cpu.rs:47-62)
        bnc_f = bnc_f + was_alive
        alive_f = jnp.where(bnc_f < fmb, alive_f, 0.0)
        return (samp_f, bnc_f, ox, oy, oz, dx, dy, dz,
                tput_r, tput_g, tput_b, col_r, col_g, col_b,
                acc_r, acc_g, acc_b, alive_f)

    v0 = px * 0.0
    z0 = lambda: v0
    o0 = lambda: v0 + 1.0
    st0 = (
        v0 - 1.0,                               # samp: pre-first
        z0(),                                   # bounce counter
        z0(), z0(), z0(),                       # o (regen'd first)
        z0(), z0(), o0(),                       # d (inert +z)
        o0(), o0(), o0(),                       # throughput
        z0(), z0(), z0(),                       # sample color
        z0(), z0(), z0(),                       # accumulator
        z0(),                                   # dead -> regen
    )
    st = jax.lax.while_loop(loop_cond, loop_body, st0)
    return st[14], st[15], st[16]


def _build_chunk_aabbs(cs: CompactScene, chunk: int):
    """AABBs of the row-streamed kernel's sphere CHUNK blocks.

    Block i covers compacted sphere rows [min(i*chunk, ns-chunk), +chunk)
    — the exact clamped-base rule closest_hit_chunked folds with — and
    its AABB spans the real members' center±|r| bounds (aabb.rs:13-19
    padding class). All-inert blocks get an empty AABB (min > max) so
    the slab test culls them outright. With Morton-ordered rows
    (_morton_order) the blocks are spatially compact, so a coherent ray
    tile skips most blocks' candidate math entirely — cluster culling at
    the granularity where the whole-tile `cond` is cheap relative to
    the work it skips (a 256-row block ~ 5000 lane-ops vs a ~25-lane-op
    slab test; the 8-row clusters that lost at 512 spheres paid the
    same test for 1/32 the avoided work)."""
    ns = cs.ns
    c = min(chunk, ns)
    k = -(-ns // c)
    cc = np.asarray(cs.sph_c)
    r = np.sqrt(np.asarray(cs.sph_r2)[:, 0])
    real = cc[:, 0] < 1e29
    cmin = np.full((k, 3), 1.0, np.float32)
    cmax = np.full((k, 3), -1.0, np.float32)      # empty (never hit)
    for i in range(k):
        base = min(i * c, ns - c)
        m = real[base:base + c]
        if not m.any():
            continue
        cb = cc[base:base + c][m]
        rb = r[base:base + c][m][:, None]
        cmin[i] = (cb - rb).min(axis=0) - 5e-5
        cmax[i] = (cb + rb).max(axis=0) + 5e-5
    return jnp.asarray(cmin), jnp.asarray(cmax)


def _make_kernel(spp: int, max_bounces: int, ns: int, nq: int,
                 has_sph: bool, has_quad: bool, early_exit: bool = False,
                 n_clusters: int = 0, regen: bool = False,
                 has_met: bool = True, has_die: bool = True,
                 sky: bool = False, row_chunk: int = 0,
                 chunk_cull: bool = False):
    """Kernel body specialized on static (spp, max_bounces, Ns, Nq).

    `has_sph`/`has_quad` compile out an absent primitive kind entirely —
    the Cornell box (quads only) skips all sphere arithmetic, random-sphere
    scenes skip the quad block. `has_met`/`has_die` do the same for the
    material scatter chains (see _shade_bounce).

    `early_exit` makes each spp round's bounce fori skip its remaining
    iterations once every lane in the tile is dead. In *open* scenes (sky
    background) the mean path length is a small fraction of the budget —
    config 4 runs max_bounces=50 with ~3-bounce mean paths, so the plain
    fori wastes >90% of its iterations on dead lanes (measured: throughput
    scales ~1/budget). It still pays spp x (longest path in tile).

    `regen` replaces the spp x bounce loop nest entirely with per-lane
    sample regeneration (see the loop's comment block) — the stronger form
    of the same idea, costing ~ spp x *mean* path per lane. The two flags
    are mutually exclusive (`regen` wins).
    """

    def kernel(
        # scalar-prefetch / SMEM
        cam_ref,        # (1, 32) f32: camera frame + background + inv sizes
        ctl_ref,        # (1, 4)  i32: [seed, spp_offset, 0, 0] (as u32 bits)
        # VMEM per-tile
        pid_ref,        # (1, TR) u32 flat pixel ids
        px_ref,         # (1, TR) f32 pixel x
        py_ref,         # (1, TR) f32 pixel y
        # VMEM scene (resident across grid)
        sph_c_ref, sph_r2_ref,
        quad_n_ref, quad_dp_ref, quad_av_ref, quad_ca_ref,
        quad_bv_ref, quad_cb_ref,
        pay_ref,        # (16, NA) f32 ACTIVE payload rows (see _payload_matrix)
        # optional cluster tables (present iff n_clusters > 0)
        *cluster_refs,  # cmin (K,3), cmax (K,3) + out_ref last
    ):
        out_ref = cluster_refs[-1]   # (3, TR) f32 mean radiance
        _extras = list(cluster_refs[:-1])
        if n_clusters:
            cmin_ref, cmax_ref = _extras[0], _extras[1]
            _extras = _extras[2:]
        payT_ref = _extras[0] if row_chunk else None  # (NA, 16)
        if chunk_cull:
            # per-chunk AABBs of the streamed sphere blocks (K, 3)
            ccmin_ref, ccmax_ref = _extras[1], _extras[2]
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
        # sky top color (static flag: constant scenes compile the lerp
        # out entirely, keeping the pre-sky op count bit-for-bit)
        bg2_r, bg2_g, bg2_b = (
            (cam(24), cam(25), cam(26)) if sky else (None, None, None))
        seed = ctl_ref[0, 0].astype(jnp.uint32)
        spp_offset = ctl_ref[0, 1].astype(jnp.uint32)

        # scene columns
        cx = sph_c_ref[:, 0:1]
        cy = sph_c_ref[:, 1:2]
        cz = sph_c_ref[:, 2:3]
        r2 = sph_r2_ref[:, 0:1]
        qnx = quad_n_ref[:, 0:1]
        qny = quad_n_ref[:, 1:2]
        qnz = quad_n_ref[:, 2:3]
        qdp = quad_dp_ref[:, 0:1]
        avx = quad_av_ref[:, 0:1]
        avy = quad_av_ref[:, 1:2]
        avz = quad_av_ref[:, 2:3]
        qca = quad_ca_ref[:, 0:1]
        bvx = quad_bv_ref[:, 0:1]
        bvy = quad_bv_ref[:, 1:2]
        bvz = quad_bv_ref[:, 2:3]
        qcb = quad_cb_ref[:, 0:1]
        # Active rows: spheres then quads, absent kinds compiled out.
        n_act = (ns if has_sph else 0) + (nq if has_quad else 0)
        if not row_chunk:
            # (NA, TR) — only the monolithic path materializes it
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_act, tr), 0)

        def _sphere_rows_test(ocx, ocy, ocz, dx, dy, dz, r2v):
            """Shared sphere quadratic: candidate t rows, MISS when none."""
            half_b = ocx * dx + ocy * dy + ocz * dz
            c_term = ocx * ocx + ocy * ocy + ocz * ocz - r2v
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
            return jnp.where(disc >= 0.0, ts, _MISS)

        def _quad_best(ox, oy, oz, dx, dy, dz):
            den = qnx * dx + qny * dy + qnz * dz
            # grazing-ray validity guard (dense-oracle parity,
            # ops/intersect.py quad_ts); also keeps zero-normal pad rows
            # deterministically inert
            ok_den = jnp.abs(den) >= 1e-12
            den = jnp.where(ok_den, den, 1e-12)
            tq = (qdp - (qnx * ox + qny * oy + qnz * oz)) / den
            al = (avx * ox + avy * oy + avz * oz) + tq * (
                avx * dx + avy * dy + avz * dz) - qca
            be = (bvx * ox + bvy * oy + bvz * oz) + tq * (
                bvx * dx + bvy * dy + bvz * dz) - qcb
            ok = (ok_den & (tq >= _T_MIN)
                  & (al >= 0.0) & (al < 1.0) & (be >= 0.0) & (be < 1.0))
            return jnp.where(ok, tq, _MISS)

        if n_clusters:
            ccx0 = cmin_ref[:, 0:1]
            ccy0 = cmin_ref[:, 1:2]
            ccz0 = cmin_ref[:, 2:3]
            ccx1 = cmax_ref[:, 0:1]
            ccy1 = cmax_ref[:, 1:2]
            ccz1 = cmax_ref[:, 2:3]

        def _cluster_cull(ox, oy, oz, dx, dy, dz, alive, best_t0, row0):
            """Static-order cull over the 8-sphere cluster blocks.

            Level 1: slab-test all K cluster AABBs at once (vector,
            aabb.rs:36-61 semantics) giving per-lane entry t's. Level 2:
            an unrolled loop over clusters; cluster k's 8 spheres — a
            static 8-sublane slice of the compacted columns, no gather —
            are tested only when some live lane enters its AABB before
            that lane's current best hit (whole-tile `cond` skip). No
            per-lane ordering state: the earlier per-lane front-to-back
            march was measured 5x slower (its per-iteration argmin +
            one-hot MXU gathers out-cost the dense tests it avoided)."""
            inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-24, 1e-24, dx)
            inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-24, 1e-24, dy)
            inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-24, 1e-24, dz)
            tx0 = (ccx0 - ox) * inv_dx
            tx1 = (ccx1 - ox) * inv_dx
            ty0 = (ccy0 - oy) * inv_dy
            ty1 = (ccy1 - oy) * inv_dy
            tz0 = (ccz0 - oz) * inv_dz
            tz1 = (ccz1 - oz) * inv_dz
            near = (jnp.maximum(jnp.minimum(tx0, tx1),
                    jnp.maximum(jnp.minimum(ty0, ty1),
                                jnp.minimum(tz0, tz1))))
            far = (jnp.minimum(jnp.maximum(tx0, tx1),
                   jnp.minimum(jnp.maximum(ty0, ty1),
                               jnp.maximum(tz0, tz1))))
            lo = jnp.maximum(near, _T_MIN)
            entry = jnp.where(lo <= far, lo, _MISS)       # (K, TR)
            live = alive.astype(jnp.float32)              # (1, TR)

            best_t, row_f = best_t0, row0
            for k in range(n_clusters):
                s0 = k * _CLUSTER_P

                def test_cluster(st, s0=s0):
                    bt, rf = st
                    c8x = sph_c_ref[s0:s0 + _CLUSTER_P, 0:1]
                    c8y = sph_c_ref[s0:s0 + _CLUSTER_P, 1:2]
                    c8z = sph_c_ref[s0:s0 + _CLUSTER_P, 2:3]
                    r28 = sph_r2_ref[s0:s0 + _CLUSTER_P, 0:1]
                    ts = _sphere_rows_test(
                        ox - c8x, oy - c8y, oz - c8z, dx, dy, dz, r28)
                    bt8 = jnp.min(ts, axis=0, keepdims=True)
                    rows8 = jax.lax.broadcasted_iota(
                        jnp.int32, (_CLUSTER_P, tr), 0) + s0
                    first8 = jnp.min(
                        jnp.where(ts == bt8, rows8, n_act),
                        axis=0, keepdims=True,
                    ).astype(jnp.float32)
                    upd = bt8 < bt
                    return (jnp.where(upd, bt8, bt),
                            jnp.where(upd, first8, rf))

                wanted = jnp.max(
                    jnp.where(entry[k:k + 1, :] < best_t, live, 0.0))
                best_t, row_f = jax.lax.cond(
                    wanted > 0.5, test_cluster, lambda st: st,
                    (best_t, row_f))
            return best_t, row_f

        def closest_hit(ox, oy, oz, dx, dy, dz, alive):
            """(1,TR)x6 -> best_t (1,TR), onehot (NA,TR), hit (1,TR)."""
            if n_clusters:
                if has_quad:
                    tq = _quad_best(ox, oy, oz, dx, dy, dz)
                    bq = jnp.min(tq, axis=0, keepdims=True)
                    qrow = jnp.min(
                        jnp.where(tq == bq,
                                  jax.lax.broadcasted_iota(
                                      jnp.int32, (nq, tr), 0) + ns,
                                  n_act),
                        axis=0, keepdims=True,
                    ).astype(jnp.float32)
                    best0, row0 = bq, qrow
                else:
                    best0 = jnp.full((1, tr), _MISS, jnp.float32)
                    row0 = jnp.full((1, tr), float(n_act), jnp.float32)
                best_t, row_f = _cluster_cull(
                    ox, oy, oz, dx, dy, dz, alive, best0, row0)
                first = row_f.astype(jnp.int32)
                onehot = (row_ids == first).astype(jnp.float32)
                hit = best_t < _MISS
                return best_t, onehot, hit

            parts = []
            if has_sph:
                # Direct oc = o - c form: an MXU-expanded variant
                # ((Ns,3)@(3,TR) matmuls) was measured SLOWER on v5e
                # (cfg4: 3.8 vs 5.6 Mrays/s) — K=3 matmuls per bounce
                # cost more than the 6 VPU ops they replace.
                parts.append(_sphere_rows_test(
                    ox - cx, oy - cy, oz - cz, dx, dy, dz, r2))
            if has_quad:
                parts.append(_quad_best(ox, oy, oz, dx, dy, dz))
            t_all = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            best_t = jnp.min(t_all, axis=0, keepdims=True)
            first = jnp.min(
                jnp.where(t_all == best_t, row_ids, n_act), axis=0, keepdims=True
            )
            onehot = (row_ids == first).astype(jnp.float32)  # (NA, TR)
            hit = best_t < _MISS
            return best_t, onehot, hit

        def _fold_chunk(ts, base, best, rowf):
            """Min-fold one (C, TR) candidate block into the running
            winner. Strict `<` keeps the earliest block's winner on
            cross-block ties and first-index-at-min within a block —
            together exactly the monolithic min + first-index rule (the
            same construction as _cluster_cull's fold, parity-gated).
            Re-tested overlap rows from a clamped tail block are
            harmless: equal t never updates, so the first occurrence's
            row id survives."""
            c = ts.shape[0]
            bt = jnp.min(ts, axis=0, keepdims=True)
            rows = jax.lax.broadcasted_iota(jnp.int32, (c, tr), 0) + base
            first = jnp.min(
                jnp.where(ts == bt, rows, n_act),
                axis=0, keepdims=True).astype(jnp.float32)
            upd = bt < best
            return (jnp.where(upd, bt, best),
                    jnp.where(upd, first, rowf))

        def closest_hit_chunked(ox, oy, oz, dx, dy, dz):
            """Row-streamed candidate sweep for scenes whose (NA, TR)
            candidate matrix would bust VMEM: a fori_loop folds
            `row_chunk`-row blocks (dynamic sublane slices of the
            VMEM-resident scene columns) through a running (best_t,
            winner row) — peak VMEM is ONE block's intermediates. Tail
            blocks clamp their base (rows re-tested, never re-won).
            -> (best_t, rowf f32, hit), all (1, TR)."""
            best = jnp.full((1, tr), _MISS, jnp.float32)
            rowf = jnp.full((1, tr), float(n_act), jnp.float32)

            if has_sph:
                c = min(row_chunk, ns)
                n_ch = -(-ns // c)
                if chunk_cull:
                    # hoisted slab-test reciprocals (shared by every
                    # block's AABB test this sweep)
                    inv_dx = 1.0 / jnp.where(
                        jnp.abs(dx) < 1e-24, 1e-24, dx)
                    inv_dy = 1.0 / jnp.where(
                        jnp.abs(dy) < 1e-24, 1e-24, dy)
                    inv_dz = 1.0 / jnp.where(
                        jnp.abs(dz) < 1e-24, 1e-24, dz)

                def sph_chunk(i, base, best, rowf):
                    blk = sph_c_ref[pl.ds(base, c), :]       # (C, 3)
                    ts = _sphere_rows_test(
                        ox - blk[:, 0:1], oy - blk[:, 1:2],
                        oz - blk[:, 2:3], dx, dy, dz,
                        sph_r2_ref[pl.ds(base, c), 0:1])
                    return _fold_chunk(ts, base, best, rowf)

                if chunk_cull:
                    def sph_body(i, st):
                        best, rowf = st
                        base = jnp.minimum(i * c, ns - c)
                        # block AABB slab test (aabb.rs:36-61): skip the
                        # whole block's candidate math when no lane's
                        # ray enters its AABB before that lane's
                        # current best hit
                        mn = ccmin_ref[pl.ds(i, 1), :]       # (1, 3)
                        mx = ccmax_ref[pl.ds(i, 1), :]
                        tx0 = (mn[0:1, 0:1] - ox) * inv_dx
                        tx1 = (mx[0:1, 0:1] - ox) * inv_dx
                        ty0 = (mn[0:1, 1:2] - oy) * inv_dy
                        ty1 = (mx[0:1, 1:2] - oy) * inv_dy
                        tz0 = (mn[0:1, 2:3] - oz) * inv_dz
                        tz1 = (mx[0:1, 2:3] - oz) * inv_dz
                        near = jnp.maximum(
                            jnp.minimum(tx0, tx1),
                            jnp.maximum(jnp.minimum(ty0, ty1),
                                        jnp.minimum(tz0, tz1)))
                        far = jnp.minimum(
                            jnp.maximum(tx0, tx1),
                            jnp.minimum(jnp.maximum(ty0, ty1),
                                        jnp.maximum(tz0, tz1)))
                        lo = jnp.maximum(near, _T_MIN)
                        enter = (lo <= far) & (lo < best)
                        wanted = jnp.max(
                            jnp.where(enter, 1.0, 0.0)) > 0.5
                        return jax.lax.cond(
                            wanted,
                            lambda st_: sph_chunk(i, base, *st_),
                            lambda st_: st_,
                            (best, rowf))
                else:
                    def sph_body(i, st):
                        best, rowf = st
                        base = jnp.minimum(i * c, ns - c)
                        return sph_chunk(i, base, best, rowf)

                best, rowf = jax.lax.fori_loop(
                    0, n_ch, sph_body, (best, rowf))
            if has_quad:
                q_base0 = ns if has_sph else 0
                c = min(row_chunk, nq)
                n_ch = -(-nq // c)

                def quad_body(i, st):
                    best, rowf = st
                    base = jnp.minimum(i * c, nq - c)
                    nblk = quad_n_ref[pl.ds(base, c), :]
                    nxc, nyc, nzc = nblk[:, 0:1], nblk[:, 1:2], nblk[:, 2:3]
                    den = nxc * dx + nyc * dy + nzc * dz
                    ok_den = jnp.abs(den) >= 1e-12
                    den = jnp.where(ok_den, den, 1e-12)
                    tq = (quad_dp_ref[pl.ds(base, c), 0:1]
                          - (nxc * ox + nyc * oy + nzc * oz)) / den
                    ablk = quad_av_ref[pl.ds(base, c), :]
                    axc, ayc, azc = ablk[:, 0:1], ablk[:, 1:2], ablk[:, 2:3]
                    al = (axc * ox + ayc * oy + azc * oz) + tq * (
                        axc * dx + ayc * dy + azc * dz
                    ) - quad_ca_ref[pl.ds(base, c), 0:1]
                    bblk = quad_bv_ref[pl.ds(base, c), :]
                    bxc, byc, bzc = bblk[:, 0:1], bblk[:, 1:2], bblk[:, 2:3]
                    be = (bxc * ox + byc * oy + bzc * oz) + tq * (
                        bxc * dx + byc * dy + bzc * dz
                    ) - quad_cb_ref[pl.ds(base, c), 0:1]
                    ok = (ok_den & (tq >= _T_MIN)
                          & (al >= 0.0) & (al < 1.0)
                          & (be >= 0.0) & (be < 1.0))
                    ts = jnp.where(ok, tq, _MISS)
                    return _fold_chunk(ts, q_base0 + base, best, rowf)

                best, rowf = jax.lax.fori_loop(
                    0, n_ch, quad_body, (best, rowf))
            return best, rowf, best < _MISS

        def payload_chunked(payT_ref, rowf):
            """(16, TR) winner payload, fori over (C, 16) slices of the
            TRANSPOSED payload (rows are sublanes there, so the dynamic
            slice stays off the lane axis): payw = sum_blocks
            block.T @ onehot_block. Overlap rows of a clamped tail block
            are masked out (they already contributed in their own
            block), so the sum selects each winner exactly once."""
            first_i = rowf.astype(jnp.int32)
            c = min(row_chunk, n_act)
            n_ch = -(-n_act // c)

            def body(i, payw):
                s_begin = i * c
                base = jnp.minimum(s_begin, n_act - c)
                blk = payT_ref[pl.ds(base, c), :]            # (C, 16)
                rows = (jax.lax.broadcasted_iota(jnp.int32, (c, tr), 0)
                        + base)
                oh = ((rows == first_i)
                      & (rows >= s_begin)).astype(jnp.float32)
                return payw + jax.lax.dot_general(
                    blk, oh,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                            # (16, TR)

            return jax.lax.fori_loop(
                0, n_ch, body, jnp.zeros((16, tr), jnp.float32))

        def gen_camera_ray(sample_id):
            """Camera ray for `sample_id` ((1,TR) u32 or scalar u32)."""
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
                """One bounce (cpu.rs:47-62) for every live lane.

                `sample_id`/`bctr` are uint32 — scalars on the classic
                all-lanes-in-lockstep path, (1, TR) vectors on the
                regeneration path where each lane owns its (sample, bounce)
                position. The arithmetic is identical either way (PCG4D
                broadcasts), so the two paths produce bit-identical
                per-lane streams."""
                (ox, oy, oz, dx, dy, dz,
                 tput_r, tput_g, tput_b, col_r, col_g, col_b, alive_f) = st
                alive = alive_f > 0.5
                if row_chunk:
                    best_t, rowf_w, hit = closest_hit_chunked(
                        ox, oy, oz, dx, dy, dz)
                    payw = payload_chunked(payT_ref, rowf_w)
                else:
                    best_t, onehot, hit = closest_hit(ox, oy, oz, dx, dy,
                                                      dz, alive)

                    # winner payload: one-hot column selection as a single
                    # (16, NA) @ (NA, TR) matmul — the MXU does the gather
                    # the VPU would otherwise pay 16 reduce passes for.
                    # HIGHEST precision keeps the selected f32 values
                    # exact to ~1 ulp.
                    payw = jax.lax.dot_general(
                        pay_ref[:, :], onehot,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )                                   # (16, TR)
                w_isq = payw[0:1, :]
                # normal source: quad -> unit plane normal rows, sphere ->
                # center rows. Exactly one is nonzero per column (the
                # payload matrix zero-fills the other kind's rows), and
                # selection-before-subtraction is value-identical to the
                # old subtract-then-select (see _shade_bounce).
                w_ax = jnp.where(w_isq > 0.5, payw[4:5, :], payw[1:2, :])
                w_ay = jnp.where(w_isq > 0.5, payw[5:6, :], payw[2:3, :])
                w_az = jnp.where(w_isq > 0.5, payw[6:7, :], payw[3:4, :])
                w_kind = payw[7:8, :]
                w_ar = payw[8:9, :]
                w_ag = payw[9:10, :]
                w_ab = payw[10:11, :]
                w_fuzz = payw[11:12, :]
                w_ior = payw[12:13, :]
                w_er = payw[13:14, :]
                w_eg = payw[14:15, :]
                w_eb = payw[15:16, :]

                # scatter randomness: stream 1 + bounce (ops/scatter.py)
                u1, u2, u3, u4 = _uniform4(
                    pid, sample_id, jnp.uint32(1) + bctr, seed
                )
                return _shade_bounce(
                    ox, oy, oz, dx, dy, dz,
                    tput_r, tput_g, tput_b, col_r, col_g, col_b,
                    alive, best_t, hit,
                    w_isq, w_ax, w_ay, w_az, w_kind,
                    w_ar, w_ag, w_ab, w_fuzz, w_ior, w_er, w_eg, w_eb,
                    u1, u2, u3, u4, bg_r, bg_g, bg_b,
                    has_met=has_met, has_die=has_die,
                    bg2_r=bg2_r, bg2_g=bg2_g, bg2_b=bg2_b)

        zeros = lambda: jnp.zeros((1, tr), jnp.float32)
        ones = lambda: jnp.ones((1, tr), jnp.float32)

        if regen:
            # --- sample-regeneration ("persistent lanes") main loop ------
            # The classic path runs spp rounds of a max_bounces fori, so a
            # tile pays spp x (longest path in tile) bounces even though the
            # mean path is far shorter (cfg4: throughput scaled ~1/budget —
            # mb=50: 5.97 vs mb=6: 23.68 Mrays/s). Here each lane owns its
            # own (sample, bounce) cursor: the moment its path dies it folds
            # the sample into its accumulator and immediately starts its
            # next camera ray. All lanes stay busy until the tile's total
            # work (~ spp x mean path, not spp x max path) is done; per-lane
            # op sequences are identical to the classic path, so the image
            # is bit-identical. This is the TPU answer to the GPU wavefront
            # path tracers' ray-regeneration stage (shared with the packed
            # kernel: _regen_sample_loop).
            ar, ag, ab = _regen_sample_loop(
                px, spp, max_bounces, spp_offset,
                gen_camera_ray, bounce_step)
        else:
            def sample_body(s, acc):
                sample_id = spp_offset + s.astype(jnp.uint32)
                ox, oy, oz, dx, dy, dz = gen_camera_ray(sample_id)
                st = (ox, oy, oz, dx, dy, dz,
                      ones(), ones(), ones(),           # throughput
                      zeros(), zeros(), zeros(),        # color
                      ones())                           # alive (f32: bool
                                                        # carries crash
                                                        # Mosaic)

                def bounce_body(b, st):
                    return bounce_step(sample_id, b.astype(jnp.uint32), st)

                if early_exit:
                    # Bounded fori with a conditional skip: once every lane
                    # in the tile is dead, the remaining iterations take the
                    # empty branch (a reduce + branch, ~free). Chosen over a
                    # while_loop: same savings, provably terminates.
                    def bounce_or_skip(b, st):
                        return jax.lax.cond(
                            jnp.max(st[12]) > 0.5,
                            lambda s: bounce_body(b, s),
                            lambda s: s,
                            st,
                        )

                    st = jax.lax.fori_loop(0, max_bounces, bounce_or_skip, st)
                else:
                    # In enclosed scenes most lanes live to the budget: the
                    # alive-check would never fire and costs ~10% in reduce
                    # + lost loop pipelining.
                    st = jax.lax.fori_loop(0, max_bounces, bounce_body, st)
                col_r, col_g, col_b = st[9], st[10], st[11]
                ar, ag, ab = acc
                return (ar + col_r, ag + col_g, ab + col_b)

            acc0 = (zeros(), zeros(), zeros())
            ar, ag, ab = jax.lax.fori_loop(0, spp, sample_body, acc0)
        inv = 1.0 / float(spp)
        out_ref[0:1, :] = ar * inv
        out_ref[1:2, :] = ag * inv
        out_ref[2:3, :] = ab * inv

    return kernel


def used_kind_flags(scene: SceneArrays) -> tuple:
    """(has_met, has_die): does any VALID primitive use a Metal /
    Dielectric material? Static scene facts that let every kernel compile
    out the absent scatter chains (see _shade_bounce) — a material merely
    registered but unused by live geometry doesn't count."""
    from tinyraytracer_tpu.models import materials as mat

    kinds = np.asarray(scene.mat_kind)
    used = []
    sv = np.asarray(scene.sph_valid)
    qv = np.asarray(scene.quad_valid)
    if sv.any():
        used.append(kinds[np.asarray(scene.sph_mat)[sv]])
    if qv.any():
        used.append(kinds[np.asarray(scene.quad_mat)[qv]])
    uk = np.concatenate(used) if used else np.zeros((0,), kinds.dtype)
    return bool((uk == mat.METAL).any()), bool((uk == mat.DIELECTRIC).any())


def _payload_matrix(scene: SceneArrays, cs: CompactScene) -> jnp.ndarray:
    """(16, N) winner-payload rows for the compacted scene.

    Rows: [is_quad, cx, cy, cz, nhat_x, nhat_y, nhat_z, mat_kind,
           albedo r/g/b, fuzz, ior, emit r/g/b]. Laid out pre-transposed so
    the kernel's (16, NA) @ (NA, TR) one-hot selection matmul needs no
    in-kernel transpose.
    """
    ns, nq = cs.ns, cs.nq
    n = ns + nq
    pay = np.zeros((16, n), np.float32)
    idx = np.asarray(cs.index_map)
    sph_n_total = np.asarray(scene.sph_center).shape[0]

    sph_c = np.asarray(cs.sph_c)
    pay[1, :ns] = sph_c[:, 0]
    pay[2, :ns] = sph_c[:, 1]
    pay[3, :ns] = sph_c[:, 2]

    qn = np.asarray(cs.quad_n)
    qlen = np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-30)
    nhat = qn / qlen
    pay[0, ns:] = 1.0
    pay[4, ns:] = nhat[:, 0]
    pay[5, ns:] = nhat[:, 1]
    pay[6, ns:] = nhat[:, 2]

    # material rows via the global prim -> mat id mapping
    sph_mat = np.asarray(scene.sph_mat)
    quad_mat = np.asarray(scene.quad_mat)
    kinds = np.asarray(scene.mat_kind)
    alb = np.asarray(scene.mat_albedo)
    fuzz = np.asarray(scene.mat_fuzz)
    ior = np.asarray(scene.mat_ior)
    emit = np.asarray(scene.mat_emit)
    for row in range(n):
        g = idx[row]
        # padded rows keep mat 0; they are unreachable (inert prims at 1e30)
        if row < ns:
            if row >= len(np.nonzero(np.asarray(scene.sph_valid))[0]):
                m = 0
            else:
                m = int(sph_mat[g])
        else:
            qrow = row - ns
            if qrow >= len(np.nonzero(np.asarray(scene.quad_valid))[0]):
                m = 0
            else:
                m = int(quad_mat[g - sph_n_total])
        pay[7, row] = kinds[m]
        pay[8:11, row] = alb[m]
        pay[11, row] = fuzz[m]
        pay[12, row] = ior[m]
        pay[13:16, row] = emit[m]
    return jnp.asarray(pay)


def _camera_vector(camera: Camera, background) -> jnp.ndarray:
    """(1, 32) SMEM camera/config row. `background` is (3,) constant or
    (2, 3) [bottom, top] gradient sky (lerped on the unit miss
    direction's y, renderer.rs's dropped sky capability — see
    /root/reference/output.png). Slots 20:23 = bottom, 24:27 = top; a
    constant stores top == bottom, and the kernels' lerp
    `b + t*(top-b)` is then exactly `b` (t*0 == 0 in f32), so constant
    scenes are bit-identical to the pre-sky kernels."""
    cam = np.zeros((1, 32), np.float32)
    cam[0, 0:3] = np.asarray(camera.position)
    cam[0, 3:6] = np.asarray(camera.viewport_upper_left)
    cam[0, 6:9] = np.asarray(camera.horizontal)
    cam[0, 9:12] = np.asarray(camera.vertical)
    cam[0, 12:15] = np.asarray(camera.defocus_disk_u)
    cam[0, 15:18] = np.asarray(camera.defocus_disk_v)
    cam[0, 18] = 1.0 / (camera.width - 1)
    cam[0, 19] = 1.0 / (camera.height - 1)
    bg = np.asarray(background, np.float32)
    if bg.shape == (2, 3):
        cam[0, 20:23] = bg[0]
        cam[0, 24:27] = bg[1]
    else:
        cam[0, 20:23] = bg
        cam[0, 24:27] = bg
    return jnp.asarray(cam)


def _run_kernel(cs, pay_active, cam_vec, ctl, pid, px, py,
                spp, max_bounces, has_sph, has_quad, interpret,
                early_exit=False, clusters=None, tile_rays=None,
                regen=False, has_met=True, has_die=True, sky=False,
                row_chunk=0, chunk_aabbs=None):
    """pallas_call over prepared (1, RP) ray arrays; returns (3, RP)."""
    tr = tile_rays or TILE_RAYS
    rp = pid.shape[1]
    g = rp // tr
    n_clusters = clusters[0].shape[0] if clusters is not None else 0
    chunk_cull = bool(row_chunk) and chunk_aabbs is not None
    kernel = _make_kernel(spp, max_bounces, cs.ns, cs.nq, has_sph, has_quad,
                          early_exit, n_clusters, regen, has_met, has_die,
                          sky=sky, row_chunk=row_chunk,
                          chunk_cull=chunk_cull)
    tile = lambda i: (0, i)
    n_scene = (9 + (2 if clusters is not None else 0)
               + (1 if row_chunk else 0)
               + (2 if chunk_cull else 0))
    operands = [
        cam_vec,
        ctl,
        pid, px, py,
        cs.sph_c, cs.sph_r2,
        cs.quad_n, cs.quad_dp, cs.quad_av, cs.quad_ca,
        cs.quad_bv, cs.quad_cb,
        pay_active,
    ]
    if clusters is not None:
        operands += list(clusters)
    if row_chunk:
        # transposed payload: rows on the SUBLANE axis so the chunked
        # gather's dynamic slice stays off the lane axis
        operands.append(pay_active.T)
    if chunk_cull:
        operands += list(chunk_aabbs)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tr), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), tile, memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_scene)],
        out_specs=pl.BlockSpec((3, tr), tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, rp), jnp.float32),
        interpret=interpret,
    )(*operands)


def _active_payload(cs: CompactScene, pay):
    has_sph = cs.n_sph_real > 0
    has_quad = cs.n_quad_real > 0
    if not (has_sph or has_quad):
        raise ValueError("scene has no primitives")
    row_off = 0 if has_sph else cs.ns
    n_act = (cs.ns if has_sph else 0) + (cs.nq if has_quad else 0)
    return jax.lax.slice_in_dim(pay, row_off, row_off + n_act, axis=1), has_sph, has_quad


def _pixel_arrays(width: int, height: int, rp: int):
    npix = width * height
    pid = jnp.minimum(jnp.arange(rp, dtype=jnp.uint32), jnp.uint32(npix - 1))
    px = (pid % jnp.uint32(width)).astype(jnp.float32).reshape(1, rp)
    py = (pid // jnp.uint32(width)).astype(jnp.float32).reshape(1, rp)
    return pid.reshape(1, rp), px, py


@functools.lru_cache(maxsize=32)
def _block_pixel_arrays(width: int, height: int, tile_rays: int):
    """Square-block pixel ordering for early-exit scenes.

    The in-kernel all-dead exit is tile-granular: a tile pays the *longest*
    path among its lanes. Flat ordering makes a tile a thin w-pixel strip
    whose frustum mixes sky rays (die at bounce 1) with deep paths; a
    square block (16x16 for 256 lanes) is spatially compact, so whole sky
    tiles die immediately and the per-tile max path tracks the local mean.
    Returns (pid (1,RP), px, py, inv (npix,), rp): `inv` maps pixel id ->
    ray index (edge blocks pad with clamped duplicate pixels, which
    recompute the same pixel bit-identically — RNG keys off pid alone)."""
    bw = 16 if tile_rays <= 512 else 32
    bh = tile_rays // bw
    nbx = -(-width // bw)
    nby = -(-height // bh)
    rp = nbx * nby * tile_rays
    i = np.arange(rp)
    blk, lane = i // tile_rays, i % tile_rays
    x = np.minimum((blk % nbx) * bw + lane % bw, width - 1)
    y = np.minimum((blk // nbx) * bh + lane // bw, height - 1)
    pid = (y * width + x).astype(np.uint32)
    inv = np.zeros(width * height, np.int32)
    inv[pid[::-1]] = np.arange(rp - 1, -1, -1, dtype=np.int32)
    # numpy only: jnp constants created here would leak tracers when this
    # cache is hit from inside a different jit trace.
    return (
        pid.reshape(1, rp),
        x.astype(np.float32).reshape(1, rp),
        y.astype(np.float32).reshape(1, rp),
        inv,
        rp,
    )


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_bounces", "width", "height", "interpret",
                     "early_exit", "tile_rays", "regen",
                     "has_met", "has_die", "sky", "row_chunk"),
)
def _render_flat(
    cs: CompactScene,
    pay,
    cam_vec,
    ctl,
    *,
    spp: int,
    max_bounces: int,
    width: int,
    height: int,
    interpret: bool = False,
    early_exit: bool = False,
    clusters=None,
    tile_rays: int = 0,
    regen: bool = False,
    has_met: bool = True,
    has_die: bool = True,
    sky: bool = False,
    row_chunk: int = 0,
    chunk_aabbs=None,
):
    tr = tile_rays or TILE_RAYS
    npix = width * height
    pay_active, has_sph, has_quad = _active_payload(cs, pay)
    if early_exit or regen:
        # Both tile-exit and regeneration finish a tile when its slowest
        # lane finishes — square blocks keep tile path lengths coherent.
        pid, px, py, inv, rp = _block_pixel_arrays(width, height, tr)
        color = _run_kernel(cs, pay_active, cam_vec, ctl,
                            jnp.asarray(pid), jnp.asarray(px),
                            jnp.asarray(py),
                            spp, max_bounces, has_sph, has_quad, interpret,
                            early_exit, clusters, tr, regen,
                            has_met, has_die, sky=sky, row_chunk=row_chunk,
                            chunk_aabbs=chunk_aabbs)
        return jnp.take(color, jnp.asarray(inv),
                        axis=1).T.reshape(height, width, 3)
    rp = ((npix + tr - 1) // tr) * tr
    pid, px, py = _pixel_arrays(width, height, rp)
    color = _run_kernel(cs, pay_active, cam_vec, ctl, pid, px, py,
                        spp, max_bounces, has_sph, has_quad, interpret,
                        early_exit, clusters, tr, regen, has_met, has_die,
                        sky=sky, row_chunk=row_chunk,
                        chunk_aabbs=chunk_aabbs)
    return color[:, :npix].T.reshape(height, width, 3)


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_bounces", "width", "height", "interpret",
                     "mesh", "early_exit", "tile_rays", "regen",
                     "has_met", "has_die", "sky", "row_chunk"),
)
def _render_flat_sharded(
    cs: CompactScene,
    pay,
    cam_vec,
    ctl,
    *,
    spp: int,
    max_bounces: int,
    width: int,
    height: int,
    mesh,
    interpret: bool = False,
    early_exit: bool = False,
    clusters=None,
    tile_rays: int = 0,
    regen: bool = False,
    has_met: bool = True,
    has_die: bool = True,
    sky: bool = False,
    row_chunk: int = 0,
    chunk_aabbs=None,
):
    """Megakernel over a (tile x sample) mesh: pixels shard over "tile",
    spp splits over "sample" with a pmean — the multi-chip forward path
    (scene/payload replicated; the kernel runs per shard). chunk_aabbs
    replicate like the scene (KBs) so sharded large-N renders keep the
    chunk-granular cull."""
    from jax.sharding import PartitionSpec as P

    from tinyraytracer_tpu.parallel.sharded import SAMPLE_AXIS, TILE_AXIS

    n_tile = mesh.shape[TILE_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    if spp % n_sample != 0:
        raise ValueError(f"spp={spp} not divisible by sample axis {n_sample}")
    spp_local = spp // n_sample

    tr = tile_rays or TILE_RAYS
    npix = width * height
    chunk = tr * n_tile
    rp = ((npix + chunk - 1) // chunk) * chunk
    pid, px, py = _pixel_arrays(width, height, rp)
    pay_active, has_sph, has_quad = _active_payload(cs, pay)

    def body(cs, pay_active, cam_vec, ctl, pid, px, py, clusters,
             chunk_aabbs):
        s_idx = jax.lax.axis_index(SAMPLE_AXIS).astype(jnp.int32)
        ctl = ctl.at[0, 1].add(s_idx * jnp.int32(spp_local))
        color = _run_kernel(cs, pay_active, cam_vec, ctl, pid, px, py,
                            spp_local, max_bounces, has_sph, has_quad,
                            interpret, early_exit, clusters, tr, regen,
                            has_met, has_die, sky=sky, row_chunk=row_chunk,
                            chunk_aabbs=chunk_aabbs)
        return jax.lax.pmean(color, SAMPLE_AXIS)

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(None, TILE_AXIS), P(None, TILE_AXIS),
                  P(None, TILE_AXIS), P(), P()),
        out_specs=P(None, TILE_AXIS),
        check_vma=False,
    )
    color = f(cs, pay_active, cam_vec, ctl, pid, px, py, clusters,
              chunk_aabbs)
    return color[:, :npix].T.reshape(height, width, 3)


class MegakernelRenderer:
    """Scene-bound fast forward renderer (one kernel launch per image)."""

    def __init__(self, scene: SceneArrays, camera: Camera, background,
                 interpret: bool = False, use_clusters: bool | None = None,
                 chunk_cull: bool | None = None):
        self.scene = scene
        self.camera = camera
        n_sph_real = int(np.asarray(scene.sph_valid).sum())
        n_quad_real = int(np.asarray(scene.quad_valid).sum())
        if use_clusters is None:
            # Dense stays the default at every size: on v5e (cfg4, 512
            # spheres) the static-order cluster cull measured 1.32 vs the
            # dense path's 6.01 Mrays/s — each whole-tile `cond` +
            # cross-lane `wanted` reduce costs far more than the 8-sphere
            # block it can skip, and bounced (incoherent) rays want most
            # clusters anyway. Kept opt-in for future tuning.
            use_clusters = False
        if chunk_cull is None:
            # CHUNK-granular culling on the row-streamed path (VERDICT
            # r4 #4): the slab test amortizes over a whole ROW_CHUNK
            # block (~25 lane-ops to maybe skip ~5000), the regime the
            # 8-row cluster cull never reached. Auto: on whenever the
            # scene is large enough that render() will row-stream.
            ns_pad = max(8, -(-n_sph_real // 8) * 8)
            nq_pad = max(8, -(-n_quad_real // 8) * 8)
            n_rows = (ns_pad if n_sph_real else 0) + (
                nq_pad if n_quad_real else 0)
            chunk_cull = auto_tile_rays(n_rows) == 0
        self.chunk_cull = bool(chunk_cull) and n_sph_real > 0
        if (use_clusters or self.chunk_cull) and n_sph_real:
            # Morton-order the spheres so cluster/chunk blocks are
            # spatially tight, then build the acceleration tables
            # (clusters here; chunk AABBs lazily in render(), once the
            # row-chunk width is known).
            centers = np.asarray(scene.sph_center)[
                np.asarray(scene.sph_valid)
            ]
            order = _morton_order(centers)
            self.cs = compact_scene(scene, sphere_order=order)
            self.clusters = _build_clusters(self.cs) if use_clusters \
                else None
        else:
            self.cs = compact_scene(scene)
            self.clusters = None
        self._chunk_aabbs = {}  # row_chunk -> (cmin, cmax) cache
        self.pay = _payload_matrix(scene, self.cs)
        self.has_met, self.has_die = used_kind_flags(scene)
        self.cam_vec = _camera_vector(camera, background)
        self.interpret = interpret
        self._packed = None    # lazy (SMEM table, prims) for the packed path
        # Auto early-exit rule: a bright background marks an *open* scene
        # (sky) whose rays escape after a few bounces — the all-dead exit
        # fires long before the budget. Near-black backgrounds mark enclosed
        # scenes (Cornell) where lanes survive to the budget and the exit
        # check only costs.
        self._bg_open = float(np.max(np.asarray(background))) > 0.01
        # static sky flag: gradient background compiles the miss lerp in;
        # constant scenes keep the pre-sky kernel bit-for-bit
        self.sky = np.asarray(background, np.float32).shape == (2, 3)
        self._burst = None     # (key, jitted fn) cache for render_burst

    def render_burst(self, *, spp: int, max_bounces: int, seeds,
                     **kw) -> jax.Array:
        """len(seeds) independent renders in ONE XLA program -> (n,H,W,3).

        Small workloads (cfg1: ~2 ms of kernel in a ~27 ms wall) are
        host-dispatch-bound — each launch pays the full dispatch/tunnel
        round trip. Baking N seed-renders into one compiled program pays
        that cost once for N images (the TPU analog of the reference
        batching 10,240 rays per Metal dispatch, sampler.rs:11)."""
        seeds = tuple(int(s) for s in seeds)
        key = (spp, max_bounces, seeds, tuple(sorted(kw.items())))
        if self._burst is None or self._burst[0] != key:
            fn = jax.jit(lambda: jnp.stack([
                self.render(spp=spp, max_bounces=max_bounces, seed=s, **kw)
                for s in seeds]))
            self._burst = (key, fn)
        return self._burst[1]()

    def render(self, *, spp: int, max_bounces: int, seed: int = 0,
               spp_offset: int = 0, mesh=None, early_exit=None,
               tile_rays: int = 0, regen=None, packed=None):
        if packed is None:
            # Sublane-packed layout: default for small scenes (the per-ray
            # chain dominates there and packing fills 8x the VPU per op);
            # large scenes keep the classic candidate matrix, whose sublane
            # rows are the primitives themselves. Explicit regen/early_exit
            # arguments force the classic kernel — the packed path has no
            # lockstep mode and would silently drop the flags.
            from tinyraytracer_tpu.ops import megakernel_packed as mkp
            n_real = self.cs.n_sph_real + self.cs.n_quad_real
            packed = (regen is None and early_exit is None
                      and self.clusters is None and not tile_rays
                      and n_real <= mkp.PACKED_MAX_PRIMS)
        if packed:
            from tinyraytracer_tpu.ops import megakernel_packed as mkp
            if self._packed is None:
                self._packed = mkp.scene_table(self.cs, self.pay)
            tab, prims = self._packed
            ctl = jnp.asarray(
                [[np.int32(np.uint32(seed)),
                  np.int32(np.uint32(spp_offset)), 0, 0]], jnp.int32)
            if mesh is not None:
                return mkp._render_packed_sharded(
                    tab, self.cam_vec, ctl,
                    spp=spp, max_bounces=max_bounces,
                    width=self.camera.width, height=self.camera.height,
                    prims=prims, s=mkp.PACKED_SUBLANES,
                    l=mkp.PACKED_LANES, mesh=mesh,
                    interpret=self.interpret,
                    has_met=self.has_met, has_die=self.has_die,
                    sky=self.sky)
            return mkp._render_packed(
                tab, self.cam_vec, ctl,
                spp=spp, max_bounces=max_bounces,
                width=self.camera.width, height=self.camera.height,
                prims=prims, s=mkp.PACKED_SUBLANES, l=mkp.PACKED_LANES,
                interpret=self.interpret,
                has_met=self.has_met, has_die=self.has_die,
                sky=self.sky)
        row_chunk = 0
        if regen is None:
            # Sample regeneration is the default everywhere: each lane pays
            # ~ spp x mean path length instead of spp x (tile max path), a
            # win whenever paths end before the budget — open scenes (sky
            # misses) AND enclosed ones (light absorption). Classic lockstep
            # rounds remain reachable with regen=False (+ early_exit for
            # the tile-granular skip).
            regen = True
        if early_exit is None:
            early_exit = False if regen else self._bg_open
        if not tile_rays:
            # Regen amortizes stragglers over spp whole samples, so it
            # wants FULL tiles for per-op sublane efficiency (measured
            # Cornell 600^2: tr=256 38.9 / 512 57.6 / 1024 78.0 Mrays/s;
            # cfg4: 1024 > 2048). Classic early-exit fires only when the
            # whole tile is dead and wants small tiles instead (measured
            # cfg4: 4.1 at 1024 -> 5.6 at 256). Very large scenes shrink
            # the tile so the (N, TR) candidate matrix stays compilable
            # (auto_tile_rays / MAX_ROWS_X_TILE).
            want = 256 if (early_exit and not regen) else TILE_RAYS
            n_rows = ((self.cs.ns if self.cs.n_sph_real else 0)
                      + (self.cs.nq if self.cs.n_quad_real else 0))
            tile_rays = auto_tile_rays(n_rows, want)
            if not tile_rays:
                # Row-streamed mode (round 4): beyond the monolithic
                # (NA, TR) candidate matrix's VMEM cap, fold the rows
                # through the tile in ROW_CHUNK blocks — peak VMEM is one
                # block's intermediates; the whole scene's columns
                # (N x ~14 f32) stay VMEM-resident (8000 rows ~= 450 KB).
                # Measured (8000 spheres, 400x225 mb50 on v5e): 0.80
                # Mrays/s at spp=16, 1.02 at spp=64 — 17-22x the dense
                # modular path, ~600x the BVH walk. (256, 512) measured
                # best of {128,256,512}x{512,1024}.
                row_chunk = int(_os.environ.get("TINYRT_ROW_CHUNK", "256"))
                tile_rays = int(_os.environ.get(
                    "TINYRT_ROW_CHUNK_TILE", "512"))
        chunk_aabbs = None
        if row_chunk and self.chunk_cull and self.cs.n_sph_real:
            # Morton-ordered block AABBs for the streamed sweep's
            # whole-block skip (built once per chunk width)
            if row_chunk not in self._chunk_aabbs:
                self._chunk_aabbs[row_chunk] = _build_chunk_aabbs(
                    self.cs, row_chunk)
            chunk_aabbs = self._chunk_aabbs[row_chunk]
        ctl = jnp.asarray(
            [[np.int32(np.uint32(seed)), np.int32(np.uint32(spp_offset)), 0, 0]],
            jnp.int32,
        )
        if mesh is not None:
            return _render_flat_sharded(
                self.cs,
                self.pay,
                self.cam_vec,
                ctl,
                spp=spp,
                max_bounces=max_bounces,
                width=self.camera.width,
                height=self.camera.height,
                mesh=mesh,
                interpret=self.interpret,
                early_exit=early_exit,
                clusters=self.clusters,
                tile_rays=tile_rays,
                regen=regen,
                has_met=self.has_met,
                has_die=self.has_die,
                sky=self.sky,
                row_chunk=row_chunk,
                chunk_aabbs=chunk_aabbs,
            )
        return _render_flat(
            self.cs,
            self.pay,
            self.cam_vec,
            ctl,
            spp=spp,
            max_bounces=max_bounces,
            width=self.camera.width,
            height=self.camera.height,
            chunk_aabbs=chunk_aabbs,
            interpret=self.interpret,
            early_exit=early_exit,
            clusters=self.clusters,
            tile_rays=tile_rays,
            regen=regen,
            has_met=self.has_met,
            has_die=self.has_die,
            sky=self.sky,
            row_chunk=row_chunk,
        )


def render_image_megakernel(
    scene: SceneArrays,
    camera: Camera,
    *,
    spp: int,
    max_bounces: int,
    background,
    seed: int = 0,
    interpret: bool = False,
    packed=None,
):
    """One-shot megakernel render. Returns (H, W, 3) linear radiance."""
    r = MegakernelRenderer(scene, camera, background, interpret=interpret)
    return r.render(spp=spp, max_bounces=max_bounces, seed=seed,
                    packed=packed)
