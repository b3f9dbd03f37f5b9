"""Inverse rendering: gradient-descent recovery of scene parameters.

BASELINE.md config 5: recover Cornell sphere positions / albedos from a
target image by gradient descent, sharded across the device mesh. The
reference has no differentiability at all (SURVEY.md §5) — this is the
new-capability half of the north star.

Design notes (TPU-first):
  - The renderer is an expectation over (pixel jitter, scatter) randomness;
    the loss uses a *fresh sample round per step* (spp_offset advances with
    the step counter), so optimization is stochastic gradient descent over
    the true expected-loss landscape rather than overfitting one noise draw.
  - Discrete events (closest-hit argmin, dielectric reflect-vs-refract,
    light absorption) are detached by construction in ops/ — gradients flow
    through the continuous geometry/shading terms (reparameterized sampling:
    scatter directions are smooth functions of the surface normal).
  - The whole step (render → loss → backward → optimizer update, with the
    sample-axis pmean and the tile-axis gradient psum that shard_map's
    transpose inserts) is ONE jitted XLA program; the scene-gradient
    all-reduce overlaps with the backward bounce loop under XLA's scheduler.
  - Optimizer state checkpointing (save/restore) covers the reference's
    missing checkpoint/resume subsystem (SURVEY.md §5) for long fits.
"""

from __future__ import annotations

import os
import pickle
import functools
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from tinyraytracer_tpu.diff.params import Params, apply_params, scene_params
from tinyraytracer_tpu.models.camera import Camera
from tinyraytracer_tpu.models.world import SceneArrays
from tinyraytracer_tpu.ops import trace as trace_ops
from tinyraytracer_tpu.parallel import sharded


def image_mse(img, target):
    """Mean squared error in linear radiance."""
    return jnp.mean((img - target) ** 2)


def adaptive_clip(threshold: float = 4.0, decay: float = 0.9,
                  eps: float = 1e-12) -> optax.GradientTransformation:
    """Clip each gradient leaf to `threshold` x its own running RMS norm.

    The boundary surrogates (NEE soft shadow, silhouette ratio) are
    score-function estimators with heavy tails: a single near-tangent ray
    can contribute 10-100x the typical whole-image gradient. A fixed clip
    threshold can't serve fields whose scales differ by 10^4 (centers vs
    albedos), so the threshold adapts: an EMA of each leaf's gradient norm
    is tracked, and the leaf is rescaled whenever its norm exceeds
    threshold x EMA. The EMA updates with the CLIPPED norm, so one spike
    can't ratchet the gate open for the next.

    Unlike median-of-chunks aggregation this keeps 100% of the mean
    gradient direction — sparse boundary signal (a few informative rays
    per step) passes through; only the magnitude of outlier steps is
    bounded. Chain it in FRONT of Adam: what it protects is Adam's second
    moment, which one unclipped spike poisons for ~1/(1-b2) steps.
    """

    def init(params):
        return {"ema": jax.tree.map(lambda p: jnp.zeros((), jnp.float32),
                                    params),
                "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        del params
        count = state["count"] + 1
        warm = count <= 3  # track-only warmup: no trusted scale yet

        def one(g, ema):
            n = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2) + eps)
            limit = threshold * ema
            scale = jnp.where(
                warm | (ema <= eps) | (n <= limit), 1.0, limit / n)
            g_clip = g * scale
            n_clip = jnp.minimum(n, jnp.where(warm | (ema <= eps),
                                              n, limit))
            new_ema = jnp.where(
                count == 1, n_clip, decay * ema + (1.0 - decay) * n_clip)
            return g_clip, new_ema

        leaves, treedef = jax.tree.flatten(updates)
        emas = treedef.flatten_up_to(state["ema"])
        out = [one(g, e) for g, e in zip(leaves, emas)]
        new_updates = treedef.unflatten([o[0] for o in out])
        new_ema = treedef.unflatten([o[1] for o in out])
        return new_updates, {"ema": new_ema, "count": count}

    return optax.GradientTransformation(init, update)


@partial(
    jax.jit,
    static_argnames=("spp", "max_bounces", "exact", "nee", "silhouette"),
)
def render_loss(
    params: Params,
    scene: SceneArrays,
    camera: Camera,
    target,
    *,
    spp: int,
    max_bounces: int,
    background,
    seed,
    spp_offset=0,
    exact: bool = False,
    nee: bool = True,
    silhouette: bool = True,
    compact=None,
):
    """Single-device MSE between a fresh render and the target image.

    NEE is on by default: without explicit light sampling the pathwise
    gradient w.r.t. geometry is exactly zero a.e. (see ops.trace.trace).
    `compact` (a CompactScene) switches closest-hit *selection* to the
    fused Pallas kernel — selection is detached, so autodiff never sees
    the kernel; gradients flow through the shared prim_t recompute.
    """
    s = apply_params(scene, params)
    w, h = camera.width, camera.height
    pixel_id = jnp.arange(w * h, dtype=jnp.uint32)
    img = trace_ops.render_pixels(
        s,
        camera,
        pixel_id,
        spp=spp,
        max_bounces=max_bounces,
        background=background,
        seed=seed,
        exact=exact,
        spp_offset=spp_offset,
        nee=nee,
        silhouette=silhouette,
        compact=compact,
        fuse_spp=True,
    )
    return image_mse(img, target.reshape(-1, 3))


def make_train_step(
    scene_template: SceneArrays,
    camera: Camera,
    target,
    *,
    spp: int,
    max_bounces: int,
    background,
    seed: int = 0,
    optimizer: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-2,
    mesh: Optional[Mesh] = None,
    advance_samples: bool = True,
    trainable: Optional[Tuple[str, ...]] = None,
    nee: bool = True,
    silhouette: bool = True,
    use_kernel: Optional[bool] = None,
    grad_chunks: int = 1,
) -> Tuple[Callable, Tuple[Params, optax.OptState]]:
    """Build a jitted SGD step over the scene params (optionally sharded).

    grad_chunks > 1: elementwise-median-of-chunks robust gradient (split
    the step's spp into N chunks, take the median of the N chunk
    gradients) — see make_fused_train_step for why (heavy-tailed boundary
    score spikes poison Adam). Single-device path only.

    Returns (step, (params0, opt_state0)); step(params, opt_state, step_idx)
    -> (params, opt_state, loss). When `mesh` is given, pixels shard over
    its "tile" axis and samples over its "sample" axis; shard_map's
    transpose inserts the cross-device psum on the replicated scene grads.

    `advance_samples` (default): each step draws a fresh sample round, i.e.
    true SGD over the expected loss. Note the estimator-variance bias this
    carries at tiny spp: E||X - t||^2 = ||EX - t||^2 + Var(X), so the
    optimizer also descends Var(X) and the minimizer shifts off the true
    scene. Use a generous spp for recovery tasks, or set
    advance_samples=False to fit the fixed sample estimator exactly (useful
    when the target was rendered with the same seed/spp).

    `trainable` restricts optimization to the named param fields (e.g.
    ("sph_center", "mat_albedo") for the config-5 recovery task); gradients
    of the other fields are zeroed. With every field free, the problem is
    badly under-determined — geometry changes can compensate for material
    changes and reach near-zero loss away from the true scene.
    """
    optimizer = optimizer or optax.adam(learning_rate)
    background = jnp.asarray(background, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    base_seed = jnp.uint32(seed)
    # Pallas closest-hit selection for the training render (TPU only by
    # default; single-device path). The kernel consumes a host-compacted
    # scene snapshot passed as a step argument: selection is detached and t
    # is recomputed from the live params, so a slightly stale snapshot only
    # perturbs winner choice near surfaces that moved; callers fitting
    # geometry should refresh it every few steps:
    #     compact = refresh_compact(scene_template, params)
    #     params, opt_state, loss = step(params, opt_state, i, compact)
    if use_kernel is None:
        use_kernel = jax.devices()[0].platform == "tpu"
    compact0 = None
    if use_kernel:
        from tinyraytracer_tpu.ops.intersect_pallas import compact_scene

        compact0 = compact_scene(scene_template)

    if mesh is not None:
        n_tile = mesh.shape[sharded.TILE_AXIS]
        n_sample = mesh.shape[sharded.SAMPLE_AXIS]
        if spp % n_sample != 0:
            raise ValueError(f"spp={spp} not divisible by sample axis {n_sample}")
        spp_local = spp // n_sample
        stride = jnp.uint32(spp if advance_samples else 0)
        w, h = camera.width, camera.height
        npix = w * h
        pixel_id = sharded._padded_pixel_ids(npix, n_tile)
        total = pixel_id.shape[0]
        # Pad the target the same way so pixel/target stay aligned per shard.
        tgt_flat = target.reshape(-1, 3)
        tgt_pad = jnp.take(tgt_flat, jnp.asarray(pixel_id, jnp.int32), axis=0)
        # Padded duplicate pixels would double-count in the loss; weight them 0.
        weight = (jnp.arange(total, dtype=jnp.uint32) < jnp.uint32(npix)).astype(
            jnp.float32
        )

        def loss_fn(params, step_idx, compact):
            s = apply_params(scene_template, params)

            def body(scene, camera, background, tgt, wgt, pids, compact):
                s_idx = jax.lax.axis_index(sharded.SAMPLE_AXIS).astype(jnp.uint32)
                img = trace_ops.render_pixels(
                    scene,
                    camera,
                    pids,
                    spp=spp_local,
                    max_bounces=max_bounces,
                    background=background,
                    seed=base_seed,
                    spp_offset=step_idx * stride
                    + s_idx * jnp.uint32(spp_local),
                    nee=nee,
                    silhouette=silhouette,
                    compact=compact,
                    fuse_spp=True,
                )
                img = jax.lax.pmean(img, sharded.SAMPLE_AXIS)
                se = jnp.sum(wgt[:, None] * (img - tgt) ** 2)
                return jax.lax.psum(se, sharded.TILE_AXIS)

            f = jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(
                    P(),
                    P(),
                    P(),
                    P(sharded.TILE_AXIS),
                    P(sharded.TILE_AXIS),
                    P(sharded.TILE_AXIS),
                    P(),
                ),
                out_specs=P(),
                check_vma=False,  # see parallel/sharded.py
            )
            se = f(s, camera, background, tgt_pad, weight, pixel_id, compact)
            return se / jnp.float32(npix * 3)

    else:
        stride = jnp.uint32(spp if advance_samples else 0)

        def make_loss(spp_eff):
            def loss_fn(params, step_idx, compact, extra_off=jnp.uint32(0)):
                return render_loss(
                    params,
                    scene_template,
                    camera,
                    target,
                    spp=spp_eff,
                    max_bounces=max_bounces,
                    background=background,
                    seed=base_seed,
                    spp_offset=step_idx * stride + extra_off,
                    nee=nee,
                    silhouette=silhouette,
                    compact=compact,
                )

            return loss_fn

        loss_fn = make_loss(spp)

    if grad_chunks < 1 or (grad_chunks > 1 and mesh is not None):
        raise ValueError("grad_chunks needs the single-device path")
    if spp % grad_chunks:
        raise ValueError(f"grad_chunks={grad_chunks} must divide spp={spp}")
    chunk_loss = make_loss(spp // grad_chunks) if grad_chunks > 1 else None

    trainset = None if trainable is None else frozenset(trainable)

    @functools.partial(jax.jit, static_argnames=())
    def step(params, opt_state, step_idx, compact=compact0):
        if grad_chunks == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, jnp.uint32(step_idx), compact
            )
        else:
            cspp = spp // grad_chunks
            losses, gs = [], []
            for c in range(grad_chunks):
                cl, cg = jax.value_and_grad(chunk_loss)(
                    params, jnp.uint32(step_idx), compact,
                    jnp.uint32(c * cspp),
                )
                losses.append(cl)
                gs.append(cg)
            loss = sum(losses) / grad_chunks
            grads = {
                k: jnp.median(jnp.stack([g[k] for g in gs]), axis=0)
                for k in gs[0]
            }
        # Gradient sanitization: a single degenerate sample (observed on
        # TPU only — its approximate transcendentals hit edges the CPU
        # path does not; the same trajectory runs clean on CPU) would
        # otherwise NaN the optimizer state permanently. Zeroing the rare
        # non-finite entries keeps the fit unbiased in expectation.
        grads = {
            k: jnp.where(jnp.isfinite(g), g, 0.0) for k, g in grads.items()
        }
        if trainset is not None:
            grads = {
                k: g if k in trainset else jnp.zeros_like(g)
                for k, g in grads.items()
            }
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params0 = scene_params(scene_template)
    return step, (params0, optimizer.init(params0))


def make_fused_train_step(
    scene_template: SceneArrays,
    camera: Camera,
    target,
    *,
    spp: int,
    max_bounces: int,
    background,
    seed: int = 0,
    optimizer: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-2,
    advance_samples: bool = True,
    trainable: Optional[Tuple[str, ...]] = None,
    trainable_rows: Optional[dict] = None,
    interpret: bool = False,
    mesh=None,
    tile: Optional[Tuple[int, int]] = None,
    grad_chunks: int = 1,
    static=None,
) -> Tuple[Callable, Tuple[Params, optax.OptState]]:
    """Train step on the fused differentiable kernel (ops/diffkernel.py).

    trainable_rows (VERDICT r3 #1): optional {"sph": scene-row ids,
    "quad": scene-row ids} restricting GEOMETRY training to those
    primitive rows. Two effects: (a) the kernel's boundary-surrogate
    adjoints run only on those rows, so the per-bounce surrogate cost
    scales with the trained subset, not the scene (the many-sphere
    enabler — a 128-sphere scene with 8 trained spheres steps ~2x
    faster); (b) geometry gradients of every other row are masked to
    zero, so the optimizer cannot move scenery the caller pinned.
    Material fields are unaffected (they are winner-indexed, not
    row-surrogate work). Forces the classic kernel.

    Subset-mode caveat (ADVICE r4): the soft-shadow ratio clamp then
    sees only the SUBSET rows' visibility product, so when an UNTRAINED
    occluder fully blocks the light (where the dense path's v<1e-3
    clamp would suppress the gradient) trained rows still receive
    full-strength soft-shadow gradients. Fits whose trained geometry
    sits in shadows cast by pinned scenery can see noisier steps there;
    the adaptive_clip/grad_chunks aggregators bound the damage.

    When trainable_rows is NOT given but `trainable` is, the surrogate
    scope is auto-derived per primitive CLASS (VERDICT r4 #1): a class
    none of whose geometry fields appear in `trainable` has its
    surrogate chains compiled out of the kernel (both kernels support
    class scopes — packed stays eligible). Training sph_center on a
    quad-walled Cornell thus pays no quad surrogate cost.

    static: optional precomputed build_diff_static(scene_template) — the
    host-side scene compaction; pass it when the caller already built one
    (fit's auto-engine probe) to avoid repeating the analysis.

    Semantics match make_train_step(nee=True, silhouette=True) — same
    estimator, RNG streams and gradients (tests/test_diffkernel.py) — but
    render, loss and the whole backward run in ONE kernel launch, so a
    step costs ~3 forward renders instead of the modular path's
    fusion-boundary-bound fwd+bwd.

    mesh: optional jax.sharding.Mesh — data-parallel fused training:
    pixel-tile blocks shard over every mesh device, each runs the same
    fused kernel on its shard, and parameter-gradient tables psum over
    the mesh (BASELINE config 5's sharded inverse rendering). Gradients
    match single-device up to collective summation order.

    grad_chunks: robust gradient aggregation. The boundary surrogates'
    score terms are heavy-tailed — a single near-tangent shadow/silhouette
    ray can contribute 10-100x the typical whole-image gradient, and one
    such spike poisons Adam's second moment for ~1/(1-b2) steps (observed:
    a geometry fit kicked a sphere 5 units off and froze). With
    grad_chunks=N, the step's spp samples are split into N chunks, the
    fused kernel runs per chunk (same sample set, same streams), and the
    gradient is the ELEMENTWISE MEDIAN over chunks — a spike living in one
    chunk is voted out; smooth components (identical in expectation across
    chunks) pass through. The reported loss is the mean of per-chunk MSEs
    (monitoring only — it upper-bounds the full-spp MSE by the extra MC
    variance of a 1/N-sample image; each chunk gradient likewise carries
    the usual O(1/chunk_spp) MC-MSE correlation bias, same class as the
    unchunked step's O(1/spp) one).
    """
    from tinyraytracer_tpu.ops.diffkernel import (
        build_diff_static,
        render_value_and_grad,
    )

    optimizer = optimizer or optax.adam(learning_rate)
    target = jnp.asarray(target, jnp.float32)
    if static is None:
        static = build_diff_static(scene_template)
    stride = spp if advance_samples else 0
    trainset = None if trainable is None else frozenset(trainable)
    if grad_chunks < 1 or spp % grad_chunks:
        raise ValueError(f"grad_chunks={grad_chunks} must divide spp={spp}")
    cspp = spp // grad_chunks
    # The silhouette surrogate contributes ONLY to the geometry gradient
    # rows (sphere center/radius + quad corner/u/v; its cotangents never
    # feed the shared chains — diffkernel bounce_adj A1). When the fit
    # doesn't train geometry those rows are masked to zero anyway, so
    # skipping the surrogate is bit-identical on every used output and
    # drops its per-primitive unrolled work from the adjoint.
    sil = trainset is None or bool(
        {"sph_center", "sph_radius",
         "quad_corner", "quad_u", "quad_v"} & trainset)
    surr_rows = None
    row_mask = None
    if trainable_rows is None and trainset is not None:
        # VERDICT r4 #1: derive the boundary-surrogate scope from what is
        # trained. A class whose geometry fields are all untrained gets
        # its surrogate chains (NEE soft shadow + silhouette) compiled
        # out of the kernel — they feed only gradient rows the trainset
        # filter below zeroes (plus surrogate-artifact cotangents into
        # the shared ray chain, the same terms the explicit
        # trainable_rows subset mode drops). On the config-5 task
        # (trainable sph_center+mat_albedo on a quad-walled Cornell)
        # this removes the all-quad surrogate cost that dominated the
        # round-4 north-star step.
        sph_geo = bool({"sph_center", "sph_radius"} & trainset)
        quad_geo = bool({"quad_corner", "quad_u", "quad_v"} & trainset)
        if not (sph_geo and quad_geo):
            surr_rows = {"sph": None if sph_geo else (),
                         "quad": None if quad_geo else ()}
    if trainable_rows is not None:
        surr_rows = {"sph": tuple(int(r) for r in
                                  trainable_rows.get("sph", ())),
                     "quad": tuple(int(r) for r in
                                   trainable_rows.get("quad", ()))}
        # per-row update masks over the full SceneArrays row axes
        sm = jnp.zeros((scene_template.sph_center.shape[0],), jnp.float32)
        if surr_rows["sph"]:
            sm = sm.at[jnp.asarray(surr_rows["sph"])].set(1.0)
        qm = jnp.zeros((scene_template.quad_corner.shape[0],), jnp.float32)
        if surr_rows["quad"]:
            qm = qm.at[jnp.asarray(surr_rows["quad"])].set(1.0)
        row_mask = {"sph_center": sm[:, None], "sph_radius": sm,
                    "quad_corner": qm[:, None], "quad_u": qm[:, None],
                    "quad_v": qm[:, None]}

    @jax.jit
    def step(params, opt_state, step_idx):
        s = apply_params(scene_template, params)
        base = jnp.uint32(step_idx) * jnp.uint32(stride)
        if grad_chunks == 1:
            loss, _img, grads = render_value_and_grad(
                s, camera, target,
                spp=spp, max_bounces=max_bounces, background=background,
                seed=seed, spp_offset=base, silhouette=sil,
                interpret=interpret, static=static, mesh=mesh, tile=tile,
                surr_rows=surr_rows,
            )
        else:
            losses, gs = [], []
            for c in range(grad_chunks):
                cl, _img, cg = render_value_and_grad(
                    s, camera, target,
                    spp=cspp, max_bounces=max_bounces,
                    background=background, seed=seed,
                    spp_offset=base + jnp.uint32(c * cspp),
                    silhouette=sil,
                    interpret=interpret, static=static, mesh=mesh,
                    tile=tile, surr_rows=surr_rows,
                )
                losses.append(cl)
                gs.append(cg)
            loss = sum(losses) / grad_chunks
            grads = {
                k: jnp.median(jnp.stack([g[k] for g in gs]), axis=0)
                for k in gs[0]
            }
        grads = {
            k: jnp.where(jnp.isfinite(g), g, 0.0)
            for k, g in grads.items() if k != "background"
        }
        if trainset is not None:
            grads = {
                k: g if k in trainset else jnp.zeros_like(g)
                for k, g in grads.items()
            }
        if row_mask is not None:
            grads = {
                k: g * row_mask[k] if k in row_mask else g
                for k, g in grads.items()
            }
        updates, new_opt = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_opt, loss

    params0 = scene_params(scene_template)
    return step, (params0, optimizer.init(params0))


def refresh_compact(scene_template: SceneArrays, params: Params):
    """Host-side compaction snapshot of the current fit state, for passing
    back into a kernel-selected train step (see make_train_step)."""
    from tinyraytracer_tpu.ops.intersect_pallas import compact_scene

    return compact_scene(apply_params(scene_template, params))


# ---------------------------------------------------------------------------
# Checkpoint / resume (SURVEY.md §5: a capability the reference lacks).
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, params: Params, opt_state, step: int) -> None:
    """Persist optimizer progress; atomic rename so a crash never corrupts."""
    state = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, opt_state),
        "step": int(step),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, opt_state_template=None):
    """Returns (params, opt_state, step). opt_state arrays are re-hosted as
    jnp; the template (from optimizer.init) restores the pytree structure."""
    with open(path, "rb") as f:
        state = pickle.load(f)
    params = jax.tree.map(jnp.asarray, state["params"])
    opt_state = state["opt_state"]
    if opt_state_template is not None:
        leaves = jax.tree.leaves(opt_state)
        treedef = jax.tree.structure(opt_state_template)
        opt_state = jax.tree.unflatten(treedef, [jnp.asarray(x) for x in leaves])
    return params, opt_state, state["step"]


_GEOMETRY_FIELDS = frozenset(
    ("sph_center", "sph_radius", "quad_corner", "quad_u", "quad_v")
)


def fit(
    scene_template: SceneArrays,
    camera: Camera,
    target,
    *,
    steps: int,
    spp: int,
    max_bounces: int,
    background,
    seed: int = 0,
    learning_rate: float = 1e-2,
    optimizer: Optional[optax.GradientTransformation] = None,
    trainable: Optional[Tuple[str, ...]] = None,
    trainable_rows: Optional[dict] = None,
    mesh: Optional[Mesh] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 50,
    refresh_compact_every: int = 10,
    log_every: int = 0,
    average_last: int = 0,
    engine: str = "auto",
) -> Tuple[SceneArrays, list]:
    """Run `steps` of Adam on the scene params; returns (scene, loss curve).

    `trainable` names the free param fields (strongly recommended — with
    every field free the problem is under-determined, see make_train_step);
    `optimizer` overrides the default Adam. When the fit moves geometry and
    the Pallas closest-hit kernel is in use, the compacted selection
    snapshot is refreshed every `refresh_compact_every` steps so winner
    selection tracks the moving surfaces. Resumes from `checkpoint_path`
    if it exists.

    `average_last`: if > 0, the returned scene uses the Polyak average of
    the final N iterates instead of the last one — geometry fits have
    heavy-tailed gradient noise (silhouette/shadow score-term spikes) and
    the iterate random-walks around the optimum; tail averaging cancels
    the walk.

    `engine`: "fused" runs the one-launch fused kernel
    (make_fused_train_step, same estimator and gradients, ~50x the
    modular step on TPU; geometry tables rebuild from live params every
    step inside jit, so no compact refresh is needed); "modular" runs
    the autodiff path; "auto" picks fused on TPU when the scene fits the
    fused kernel's limits, modular otherwise.

    `trainable_rows` ({"sph": rows, "quad": rows}, fused engine only):
    restrict geometry training to those primitive rows — surrogate cost
    then scales with the trained subset (make_fused_train_step docs).
    """
    if engine not in ("auto", "fused", "modular"):
        raise ValueError(f"unknown engine {engine!r}")
    if trainable_rows is not None and engine == "modular":
        raise ValueError(
            "trainable_rows requires the fused engine (the modular path "
            "has no row-subset surrogate mode)")
    fused_static = None
    if engine == "auto":
        use_fused = False
        if jax.devices()[0].platform == "tpu":
            from tinyraytracer_tpu.ops.diffkernel import (
                build_diff_static, fused_engine_feasible)

            fused_static = build_diff_static(scene_template)
            # one shared helper — the probe can never diverge from what
            # render_value_and_grad's own routing will accept (ADVICE r3).
            # Explicit trainable_rows subsets force the classic kernel,
            # so probe its bound alone in that case (ADVICE r4): packed
            # feasibility must not promise an engine the dispatch would
            # reject at the first step.
            # Beyond-VMEM scenes stream (VERDICT r4 #3); since round 5
            # dense surrogate classes stream chunk-by-chunk too, so
            # feasibility no longer depends on the surrogate scope.
            use_fused = fused_engine_feasible(
                fused_static, mesh=mesh, max_bounces=max_bounces,
                classic_only=trainable_rows is not None)
        engine = "fused" if use_fused else "modular"
    if engine == "fused":
        factory = functools.partial(make_fused_train_step,
                                    static=fused_static,
                                    trainable_rows=trainable_rows)
    else:
        if trainable_rows is not None:
            raise ValueError(
                "trainable_rows requires the fused engine, but auto "
                "selected modular for this scene/platform")
        factory = make_train_step
    step_fn, (params, opt_state) = factory(
        scene_template,
        camera,
        target,
        spp=spp,
        max_bounces=max_bounces,
        background=background,
        seed=seed,
        learning_rate=learning_rate,
        optimizer=optimizer,
        trainable=trainable,
        mesh=mesh,
    )
    start = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        params, opt_state, start = load_checkpoint(checkpoint_path, opt_state)
    fits_geometry = trainable is None or bool(
        _GEOMETRY_FIELDS & set(trainable)
    )
    # The fused kernel derives its tables from live params inside jit —
    # geometry is always fresh, no compacted snapshot to refresh.
    use_kernel = (engine == "modular"
                  and jax.devices()[0].platform == "tpu")
    compact = refresh_compact(scene_template, params) if use_kernel else None
    losses = []
    avg_from = max(start, steps - average_last) if average_last else steps
    avg_params, avg_n = None, 0
    for i in range(start, steps):
        if (
            use_kernel
            and fits_geometry
            and i > start
            and refresh_compact_every
            and i % refresh_compact_every == 0
        ):
            compact = refresh_compact(scene_template, params)
        if use_kernel:
            params, opt_state, loss = step_fn(params, opt_state, i, compact)
        else:
            params, opt_state, loss = step_fn(params, opt_state, i)
        # Keep the device scalar: float(loss) here would sync every step
        # and serialize dispatch against execution. Materialized at
        # log/return boundaries only.
        losses.append(loss)
        if i >= avg_from:
            avg_n += 1
            if avg_params is None:
                avg_params = dict(params)
            else:
                avg_params = {
                    k: v + (params[k] - v) / avg_n
                    for k, v in avg_params.items()
                }
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}/{steps}  loss {float(loss):.6f}")
        if checkpoint_path and (i + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, params, opt_state, i + 1)
    if avg_params is not None:
        params = avg_params
    return apply_params(scene_template, params), [float(x) for x in losses]
