"""Measure the packed kernel's Cornell fwd+bwd (bench fwdbwd config) —
checking the cost of the round-4 quad boundary surrogates (Cornell is
all-quads, so the new per-quad scalar unrolls land on this config)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tinyraytracer_tpu.diff.inverse import make_fused_train_step
from tinyraytracer_tpu.models import presets


def run(tag, **kw):
    bw, bh, bspp, bmb = 300, 300, 16, 8
    world, cam, kws = presets.cornell_box(width=bw, height=bh)
    scene = world.build()
    target = jnp.zeros((bh, bw, 3), jnp.float32)
    step, (p, o) = make_fused_train_step(
        scene, cam, target, spp=bspp, max_bounces=bmb,
        background=kws["background"], seed=0, **kw)
    p, o, _ = step(p, o, 0)
    jax.block_until_ready((p, o))
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        p, o, loss = step(p, o, i + 1)
        float(loss)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{tag:44s} {dt*1e3:8.1f} ms  {bw*bh*bspp/dt/1e6:7.2f} Mrays/s",
          flush=True)


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    run("packed full (default train step)")
    run("packed material-only (sil off)",
        trainable=("mat_albedo", "mat_emit"))


if __name__ == "__main__":
    main()
