"""Speed-of-light (roofline) model for the forward megakernel.

BASELINE.md gate: "forward+backward at HBM/FLOP speed-of-light bounds per
chip" — which requires a denominator. The megakernel keeps a ray tile and
the whole scene resident in VMEM for the entire image (ops/megakernel.py),
so HBM traffic per ray is a few bytes (pixel id in, RGB out) and the
roofline is pure compute: the VPU issue rate bounds throughput.

Model (counts audited against ops/megakernel.py's kernel body):
  - sphere candidate test:   ~14 VPU ops/row   (oc, half_b, disc, roots,
                                                compares, select)
  - quad candidate test:     ~20 VPU ops/row   (plane t, alpha/beta, bounds)
  - winner min/onehot:       ~3  ops/row
  - per-segment fixed work:  ~260 ops          (payload matmul is MXU-side;
                                                normal/scatter/RNG chain)
  - per-camera-ray fixed:    ~90 ops           (raygen + accumulate)

TPU v5e per-chip peaks (public spec): 394 GB/s HBM BW, 197 TFLOP/s bf16
MXU; the VPU executes 4 f32 lanes-groups of (8,128) per cycle at 940 MHz
~= 3.85 Top/s f32. The kernel's elementwise work is f32 on the VPU, so
pct_sol is measured against the VPU bound (the MXU payload matmuls overlap
and are nowhere near their own bound; HBM is ~0% utilized by design).
"""

from __future__ import annotations

VPU_F32_OPS_PER_SEC = 3.85e12  # v5e: 4 x (8,128) f32 ALU @ 940 MHz

SPHERE_OPS_PER_ROW = 14.0
QUAD_OPS_PER_ROW = 20.0
WINNER_OPS_PER_ROW = 3.0
SEGMENT_FIXED_OPS = 260.0
RAY_FIXED_OPS = 90.0

# --- round-5 measured calibration (VERDICT r4 #2) -------------------------
# scripts/probe_vpu_microbench.py measured what (32, 256) packed tiles
# ACTUALLY sustain on v5e for op mixes stepping from pure FMAs to the
# exact sphere-candidate sequence this model counts as "14 ops":
#     independent FMA chains             2.39 Tops/s  (counting fma = 2)
#     compare+select mix                 3.01 Tops/s
#     sphere candidate sequence          2.70 Tops/s actual scalar ops
#       = in THIS MODEL'S counting units (fma = 1 op, negations
#         uncounted: 14 counted per 24 actual)     1.57 T counted-ops/s
#     transcendental mix (rsqrt/div/exp/log)       1.14 Tops/s
# So the spec peak 3.85e12 is unreachable in the model's counting units:
# an fma counts once but costs a slot, and the shade chain's
# transcendentals run the multi-cycle unit. The measured two-rate
# ceiling below replaces hand-audited-only pct_sol: candidate-row work
# at the measured candidate rate, fixed per-segment/per-ray work at the
# transcendental-leaning rate (shade/RNG/scatter are full of rsqrt,
# exp-log cube roots, divides). pct_of_sol_measured() reports against
# it; the spec-peak pct_of_sol() stays for cross-round comparability.
CAND_COUNTED_OPS_PER_SEC = 1.57e12   # sphere-candidate mix, counted units
FIXED_COUNTED_OPS_PER_SEC = 1.15e12  # transcendental-leaning shade mix


def ops_per_camera_ray(n_sph_rows: int, n_quad_rows: int,
                       bounces_executed: float) -> float:
    """Modelled VPU ops one camera ray costs in the megakernel.

    `bounces_executed` is the number of bounce iterations the kernel
    actually runs per ray (the budget for fori tiles; the tile's max alive
    path length under early exit).
    """
    per_seg = (
        n_sph_rows * (SPHERE_OPS_PER_ROW + WINNER_OPS_PER_ROW)
        + n_quad_rows * (QUAD_OPS_PER_ROW + WINNER_OPS_PER_ROW)
        + SEGMENT_FIXED_OPS
    )
    return RAY_FIXED_OPS + bounces_executed * per_seg


def pct_of_sol(rays_per_sec: float, n_sph_rows: int, n_quad_rows: int,
               bounces_executed: float) -> float:
    """Fraction of the VPU compute roofline the measured rate achieves.

    With the regeneration kernel (ops/megakernel.py regen=True) lanes stop
    paying for dead bounces, so `bounces_executed` must be the *mean
    executed segments per camera ray* (see mean_executed_bounces), not the
    bounce budget — passing the budget would credit the kernel for work it
    deliberately skipped.
    """
    achieved = rays_per_sec * ops_per_camera_ray(
        n_sph_rows, n_quad_rows, bounces_executed
    )
    return achieved / VPU_F32_OPS_PER_SEC


def pct_of_sol_measured(rays_per_sec: float, n_sph_rows: int,
                        n_quad_rows: int,
                        bounces_executed: float) -> float:
    """Fraction of the MEASURED-mix ceiling the forward kernel achieves.

    Two-rate model calibrated by scripts/probe_vpu_microbench.py (see
    the constants above): candidate-row counted ops at the measured
    candidate-mix rate, fixed per-segment/per-ray counted ops at the
    transcendental-leaning rate. For Cornell 600^2 this ceiling is ~258
    Mrays/s — the realistic speed of light for this kernel's op mix,
    against which the achieved 197 Mrays/s is ~0.76 (the spec-peak
    pct_of_sol reads 0.278 for the same run because its 3.85e12
    denominator is unreachable in counted-op units)."""
    cand = bounces_executed * (
        n_sph_rows * (SPHERE_OPS_PER_ROW + WINNER_OPS_PER_ROW)
        + n_quad_rows * (QUAD_OPS_PER_ROW + WINNER_OPS_PER_ROW))
    fixed = RAY_FIXED_OPS + bounces_executed * SEGMENT_FIXED_OPS
    t_floor = (cand / CAND_COUNTED_OPS_PER_SEC
               + fixed / FIXED_COUNTED_OPS_PER_SEC)
    return rays_per_sec * t_floor


# --- fused differentiable kernel (ops/diffkernel_packed.py) ---------------
#
# The train step executes, per camera sample, with NO early exit (lockstep
# fori over spp x max_bounces):
#   phase 1 forward render        ~ 1.0 x a forward segment per bounce
#   phase 3 replay (hit + shade)  ~ 1.0 x again (saves are VMEM-resident)
#   phase 3 adjoint chains        ~ 2.0 x a forward segment per bounce
#     (audited order-of-magnitude against bounce_adj: scatter/NEE/
#      silhouette cotangent chains roughly double the forward shading
#      op count, on top of the hit recompute)
#   per-bounce gradient scatter   ~ SCATTER_FIXED_OPS on the VPU (one-hot
#     build + concats; the (prims x SL)x(SL x 8/16) table matmuls ride
#     the MXU and overlap)
# NEE adds a shadow-visibility pass per bounce in BOTH forward and replay;
# that is folded into SEGMENT_FIXED_OPS's shading estimate already used by
# the forward model, so the multipliers below apply to the same per_seg.
#
# Round-3 execution modes change what the kernel ACTUALLY executes, and
# the roofline numerator must charge executed work, not the old lockstep
# upper bound (otherwise skipped work would inflate pct_sol):
#   - cached replay (small spp x mb): phase 3's replay reads phase-1's
#     (winner t, row, shadow vis) from VMEM scratch — only the shade
#     chain remains, ~REPLAY_CACHED_MULT of a full segment;
#   - regenerative phase 1 (large spp x mb, cache off): the forward
#     phase pays ~mean executed bounces per sample, not the budget —
#     pass `fwd_bounces` (see mean_executed_bounces).
# Phase 3 (replay + adjoint) is always lockstep over the full budget.

DIFF_SCATTER_FIXED_OPS = 220.0   # per bounce: one-hot + concat builds
DIFF_RAY_FIXED_OPS = 2.0 * RAY_FIXED_OPS + 40.0  # two raygens + cotangent
REPLAY_CACHED_MULT = 0.45        # cached replay: shade only, no re-trace

# Round-4 quad boundary gradients (edge silhouette + NEE soft shadow,
# VERDICT r3 #2): every REAL quad adds a per-adjoint-bounce surrogate
# chain (plane crossing + 4-edge sigmoid coverage, forward + 9-param
# hand VJP, twice — primary segment and shadow segment). Calibrated
# against the measured cost on v5e: enabling the surrogates added
# 20.5 ms to the Cornell 300^2 spp16 mb8 packed step = 7.9e10 VPU ops
# over 1.44e6 samples x 8 bounces x 23 quads ~= 300 ops/quad/bounce.
# The sphere surrogates remain inside the historical 2.0x adjoint
# multiplier (they predate the model's calibration).
#
# CAVEAT (VERDICT r4 #2): because this constant was FIT from the
# measured slowdown, the surrogate term of the roofline denominator is
# at 100% SoL by construction — a pct_sol_diff value on an all-quad
# scene partly restates the measurement rather than independently
# auditing it. The hand-audited terms (candidate/shade/replay) are the
# model's load-bearing content; see pct_of_sol_measured for the
# microbenchmark-calibrated forward ceiling.
QUAD_BOUNDARY_OPS_PER_ROW = 300.0


def ops_per_camera_ray_diff(n_sph_rows: int, n_quad_rows: int,
                            max_bounces: int, *,
                            fwd_bounces: float | None = None,
                            cached_replay: bool = False) -> float:
    """Modelled VPU ops one camera sample costs in the fused train step.

    fwd_bounces: bounce iterations phase 1 executes per sample — the
    budget on the lockstep/cached path (default), the measured mean on
    the regenerative path. cached_replay: True when the intersection
    cache is active (replay skips its closest-hit and shadow re-trace).
    """
    per_seg = (
        n_sph_rows * (SPHERE_OPS_PER_ROW + WINNER_OPS_PER_ROW)
        + n_quad_rows * (QUAD_OPS_PER_ROW + WINNER_OPS_PER_ROW)
        + SEGMENT_FIXED_OPS
    )
    if fwd_bounces is None:
        fwd_bounces = float(max_bounces)
    replay_mult = REPLAY_CACHED_MULT if cached_replay else 1.0
    return DIFF_RAY_FIXED_OPS + (
        fwd_bounces * per_seg                      # phase 1 forward
        + max_bounces * replay_mult * per_seg      # phase 3 replay
        + max_bounces * 2.0 * per_seg              # adjoint chains
        + max_bounces * n_quad_rows * QUAD_BOUNDARY_OPS_PER_ROW
        + max_bounces * DIFF_SCATTER_FIXED_OPS
    )


def pct_of_sol_diff(rays_per_sec: float, n_sph_rows: int, n_quad_rows: int,
                    max_bounces: int, *,
                    fwd_bounces: float | None = None,
                    cached_replay: bool = False) -> float:
    """Fraction of the VPU roofline the fused fwd+bwd step achieves,
    charging the work the kernel actually executes under its mode (see
    the mode notes above)."""
    achieved = rays_per_sec * ops_per_camera_ray_diff(
        n_sph_rows, n_quad_rows, max_bounces,
        fwd_bounces=fwd_bounces, cached_replay=cached_replay,
    )
    return achieved / VPU_F32_OPS_PER_SEC


def mean_executed_bounces(scene, camera, *, max_bounces: int, background,
                          spp: int = 2, seed: int = 0) -> float:
    """Empirical mean bounce segments per camera ray for this scene.

    Traces a low-spp wavefront with the modular path (ops/trace.py,
    count_alive=True) and integrates the survival curve: executed
    segments = 1 (the guaranteed first bounce) + sum_b alive_after(b).
    The path-length distribution is camera/scene geometry, independent of
    resolution to first order, so a cheap low-spp estimate serves the
    roofline denominator for any render size of the same scene.
    """
    import jax.numpy as jnp

    from tinyraytracer_tpu.models.camera import generate_rays
    from tinyraytracer_tpu.ops.trace import trace

    npix = camera.width * camera.height
    alive_total = 0.0
    for s in range(spp):
        pid = jnp.arange(npix, dtype=jnp.uint32)
        o, d = generate_rays(camera, pid, jnp.uint32(s), jnp.uint32(seed))
        _, alive_counts = trace(
            scene, o, d, pid, jnp.uint32(s), jnp.uint32(seed),
            max_bounces=max_bounces, background=jnp.asarray(background),
            count_alive=True,
        )
        # alive_after(max_bounces-1) rays execute no further segment.
        alive_total += float(jnp.sum(alive_counts[:-1]))
    return 1.0 + alive_total / (npix * spp)
