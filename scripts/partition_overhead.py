"""Partition-overhead bound on the REAL chip (SCALING_r04 artifact b).

The >=80% multi-chip scaling gate can't be measured end-to-end here (one
physical chip), but its per-chip half can: run the SAME sharded programs
over a 1x1 (tile x sample) mesh on the TPU and compare against the
unsharded dispatch. The difference bounds everything shard_map adds per
chip — partition bookkeeping, the degenerate collectives, the padded lane
layout. With the collective payloads pinned KB-small and ray-independent
(tests/test_scaling_evidence.py), per-chip overhead is the only remaining
term of the scaling model that needs real hardware.

Prints one JSON line per program: unsharded s, 1x1-mesh s, overhead %.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tinyraytracer_tpu.models import presets  # noqa: E402
from tinyraytracer_tpu.ops.megakernel import MegakernelRenderer  # noqa: E402

W = int(os.environ.get("PO_W", "600"))
H = int(os.environ.get("PO_H", "600"))
SPP = int(os.environ.get("PO_SPP", "200"))


def best(f, n=3):
    f()  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    world, camera, kw = presets.PRESETS["cornell_box"](W, H)
    scene = world.build()
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("tile", "sample"))
    results = {}

    r = MegakernelRenderer(scene, camera, kw["background"])
    mb = kw["max_bounces"]
    t_un = best(lambda: r.render(spp=SPP, max_bounces=mb, seed=1))
    t_sh = best(lambda: r.render(spp=SPP, max_bounces=mb, seed=1, mesh=mesh))
    results["forward_megakernel"] = (t_un, t_sh)

    from tinyraytracer_tpu.ops.diffkernel import (
        build_diff_static, render_value_and_grad)

    st = build_diff_static(scene)
    target = jnp.zeros((H, W, 3), jnp.float32)

    def make_step(m):
        @jax.jit
        def step():
            loss, _img, g = render_value_and_grad(
                scene, camera, target, spp=SPP, max_bounces=mb,
                background=kw["background"], seed=0, static=st, mesh=m)
            return loss, g

        def run():
            loss, _g = step()
            # forced host read: axon's block_until_ready has been
            # observed returning before the dispatch completes (bench.py
            # carries the same workaround)
            float(loss)
        return run

    t_un = best(make_step(None))
    t_sh = best(make_step(mesh))
    results["fused_train_step"] = (t_un, t_sh)

    for name, (tu, ts_) in results.items():
        print(json.dumps({
            "program": name,
            "config": f"cornell {W}x{H} spp={SPP} mb={mb}",
            "unsharded_s": round(tu, 4),
            "mesh1x1_s": round(ts_, 4),
            "overhead_pct": round(100.0 * (ts_ / tu - 1.0), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
