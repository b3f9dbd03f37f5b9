"""Scaling harness: rays/sec vs device count over the (tile × sample) mesh.

BASELINE.md gate: >=80% linear rays/s scaling from 1 chip to >=2 hosts.
Real multi-chip TPU hardware is not available in this environment, so this
harness has two modes:

  - default: N virtual CPU devices (xla_force_host_platform_device_count),
    measuring *functional* scaling of the sharded program — partition
    overhead, collective count, and work balance — on real XLA collectives;
  - on a TPU pod (when available): run under `jax.distributed.initialize`
    (one process per host, same script, --distributed) and the identical
    mesh code routes the sample-axis pmean over ICI/DCN.

The multi-host launch path is exercised by `init_distributed` below — on a
pod each process calls it before building the global mesh; single-process
environments skip it. ICI cost model (why >=80% is expected on real chips):
the only cross-chip traffic in the forward render is the final framebuffer
pmean over the sample axis — (H*W*3/n_tile) f32 per chip per image, e.g.
4.3 MB for Cornell 600² on a 2-chip sample split. At ~45 GB/s/link ICI
that is ~0.1 ms against a ~1.4 s/chip render: <0.01% communication, so
scaling is compute-bound and limited only by pixel-count imbalance
(<= one 1024-ray tile per chip) and per-chip dispatch overhead.

Writes one JSON line per mesh shape; `--report` renders SCALING_r{N}.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def init_distributed(args) -> None:
    """Multi-host entry: initialize the JAX distributed runtime.

    On a TPU pod, run this script once per host with --distributed;
    coordinator/process ids come from the TPU environment (or flags)."""
    import jax

    if args.distributed:
        jax.distributed.initialize(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU device count (ignored on real pods)")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--preset", default="cornell_box")
    ap.add_argument("--train", action="store_true",
                    help="measure the sharded inverse-rendering train step "
                         "(BASELINE config 5) instead of the forward render")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: hold PER-DEVICE work constant by "
                         "growing the image height with the device count. "
                         "On the virtual CPU mesh this is the honest mode — "
                         "strong scaling there measures the host-core "
                         "ceiling, not the sharded program (the N 'devices' "
                         "share the host's physical cores)")
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--num-processes", type=int, default=0)
    ap.add_argument("--process-id", type=int, default=-1)
    ap.add_argument("--report", default="", help="write a markdown table here")
    args = ap.parse_args()

    import jax

    if not args.distributed:
        # Virtual CPU mesh mode (the only mode available in this env).
        # jax is already imported by the environment's sitecustomize, so
        # steer the platform through jax.config (works post-import; env
        # vars would be read too late).
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_num_cpu_devices", args.devices)
        except Exception:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.devices}"
            )

    init_distributed(args)

    from tinyraytracer_tpu.models import presets
    from tinyraytracer_tpu.parallel.sharded import make_mesh, render_image_sharded

    devices = jax.devices()

    if args.train:
        from tinyraytracer_tpu.diff.inverse import make_train_step

    def measure(n_dev: int, sample_parallel: int = 1) -> float:
        """rays/s at n_dev devices. Weak mode grows the pixel grid with
        the device count so every device keeps the 1-device workload —
        on the shared-core virtual mesh this isolates partition overhead
        (the per-device program is identical at every nd); strong mode
        divides a fixed grid (and, on a virtual mesh, measures the host
        cores saturating, not the program)."""
        height = args.height * (n_dev if args.weak else 1)
        world, camera, kw = presets.PRESETS[args.preset](args.width, height)
        scene = world.build()
        rays = args.width * height * args.spp
        mesh = make_mesh(devices[:n_dev], sample_parallel=sample_parallel)
        if args.train:
            # BASELINE config 5: the sharded inverse-rendering step
            # (forward NEE render + MSE + backward + Adam, gradients
            # all-reduced over the mesh).
            target = render_image_sharded(
                scene, camera, spp=args.spp, max_bounces=kw["max_bounces"],
                background=kw["background"], seed=7, mesh=mesh,
            )
            jax.block_until_ready(target)
            step, (params, opt_state) = make_train_step(
                scene, camera, target, spp=args.spp,
                max_bounces=kw["max_bounces"],
                background=kw["background"], seed=0, mesh=mesh,
            )
            params, opt_state, _ = step(params, opt_state, 0)
            jax.block_until_ready((params, opt_state))
            ts = []
            for s in range(3):
                t0 = time.perf_counter()
                params, opt_state, loss = step(params, opt_state, s + 1)
                jax.block_until_ready((params, opt_state, loss))
                ts.append(time.perf_counter() - t0)
            return rays / min(ts)
        f = lambda seed: render_image_sharded(
            scene, camera, spp=args.spp, max_bounces=kw["max_bounces"],
            background=kw["background"], seed=seed, mesh=mesh,
        )
        jax.block_until_ready(f(0))
        ts = []
        for s in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(s + 1))
            ts.append(time.perf_counter() - t0)
        return rays / min(ts)

    results = []
    base = None
    n = len(devices)
    counts = sorted({1, 2, max(2, n // 2), n})
    for nd in counts:
        if nd > n:
            continue
        rps = measure(nd)
        if base is None:
            base = rps
        eff = rps / (base * nd)
        results.append({"devices": nd, "rays_per_sec": round(rps, 1),
                        "scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)

    if args.report:
        mode = "train step" if args.train else "forward render"
        mode += ", weak scaling" if args.weak else ", strong scaling"
        lines = [
            f"# Scaling — {args.preset} {args.width}x{args.height} "
            f"spp={args.spp} {mode} ({jax.devices()[0].platform} mesh)",
            "",
            "| devices | rays/s | efficiency vs linear |",
            "|---|---|---|",
        ]
        for r in results:
            lines.append(
                f"| {r['devices']} | {r['rays_per_sec']:.0f} | "
                f"{100 * r['scaling_efficiency']:.1f}% |"
            )
        ncores = os.cpu_count() or 1
        lines += [
            "",
            "Mesh: (tile × sample) shard_map; scene/BVH replicated, pixels",
            "sharded over the tile axis, one `pmean` per image over the",
            "sample axis.",
            "",
            f"Caveat (virtual mode): the {len(devices)} mesh devices are "
            f"XLA CPU *threads sharing {ncores} physical cores*. In "
            "STRONG mode wall-clock efficiency therefore measures the "
            "host-core ceiling, not the sharded program. WEAK mode "
            "(--weak) holds per-device work constant, so the per-device "
            "program is identical at every count and the efficiency "
            "column isolates partition + collective overhead — the "
            "quantity that actually transfers to real multi-chip "
            "hardware, where each mesh device is a dedicated chip. "
            "Companion evidence: tests/test_scaling_evidence.py pins the "
            "compiled collective set (one all-reduce per image; "
            "param-table all-reduces per train step), and "
            "scripts/partition_overhead.py bounds the 1-device "
            "sharded-vs-unsharded gap on the real TPU.",
        ]
        with open(args.report, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.report}")


if __name__ == "__main__":
    main()
