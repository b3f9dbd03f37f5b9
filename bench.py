"""Headline benchmark: Cornell box 600×600 spp=200 (BASELINE config 3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Metric: forward camera-rays/sec/chip (w·h·spp primary rays per wall second,
compile excluded) through the Pallas path-tracing megakernel — the
production forward path (ops/megakernel.py). A forward+backward number
through the differentiable modular path is reported alongside.

The reference publishes no numbers (BASELINE.md: two-line README, no
benchmarks dir), so vs_baseline uses an estimated 1e7 camera rays/sec for
the reference's 8-thread Rust CPU tracer on this scene class; the estimate
is recorded in "baseline_estimate".
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the backward-pass XLA compile takes ~5 min
# on the tunneled TPU; cache it across bench runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

WIDTH = 600
HEIGHT = 600
SPP = 200
MAX_BOUNCES = 20

BASELINE_RAYS_PER_SEC = 1.0e7  # estimated reference CPU throughput (see above)

# The fwd+bwd probe costs a long one-time compile; opt in via env.
RUN_FWDBWD = os.environ.get("BENCH_FWDBWD", "0") == "1"


def main() -> None:
    from tinyraytracer_tpu.diff.inverse import make_train_step
    from tinyraytracer_tpu.models import presets
    from tinyraytracer_tpu.ops.megakernel import MegakernelRenderer

    world, camera, kw = presets.cornell_box(width=WIDTH, height=HEIGHT)
    scene = world.build()
    rays = WIDTH * HEIGHT * SPP

    # --- forward: megakernel -------------------------------------------
    r = MegakernelRenderer(scene, camera, kw["background"])
    r.render(spp=SPP, max_bounces=MAX_BOUNCES, seed=0).block_until_ready()
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        r.render(spp=SPP, max_bounces=MAX_BOUNCES, seed=i + 1).block_until_ready()
        times.append(time.perf_counter() - t0)
    fwd_best = min(times)
    fwd_rays = rays / fwd_best

    result = {
        "metric": "fwd_camera_rays_per_sec_per_chip_cornell600_spp200",
        "value": round(fwd_rays, 1),
        "unit": "rays/sec",
        "vs_baseline": round(fwd_rays / BASELINE_RAYS_PER_SEC, 3),
        "baseline_estimate": BASELINE_RAYS_PER_SEC,
        "fwd_wall_s_best_of_3": round(fwd_best, 3),
        "device": str(jax.devices()[0].platform),
    }

    if RUN_FWDBWD:
        # One optimization step = render + MSE + full backward to every
        # scene parameter, through the differentiable modular path.
        bw, bh, bwd_spp, bwd_mb = 300, 300, 4, 8
        world2, camera2, kw2 = presets.cornell_box(width=bw, height=bh)
        scene2 = world2.build()
        target = jnp.zeros((bh, bw, 3), jnp.float32)
        step, (params, opt_state) = make_train_step(
            scene2,
            camera2,
            target,
            spp=bwd_spp,
            max_bounces=bwd_mb,
            background=kw2["background"],
            seed=0,
        )
        params, opt_state, _ = step(params, opt_state, 0)  # compile
        jax.block_until_ready((params, opt_state))
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, 1)
        jax.block_until_ready((params, opt_state, loss))
        bwd_dt = time.perf_counter() - t0
        result["fwdbwd_rays_per_sec"] = round(bw * bh * bwd_spp / bwd_dt, 1)
        result["fwdbwd_config"] = f"cornell {bw}x{bh} spp={bwd_spp} mb={bwd_mb}"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
