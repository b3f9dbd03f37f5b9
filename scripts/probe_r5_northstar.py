"""Round-5 north-star probe: class-scoped surrogates on the real chip.

Measures the config-5-shaped train step (cornell_spheres 600x600 spp=200
mb=20, trainable=sph_center+mat_albedo — quad surrogate chains compiled
out by the auto class scope) against the all-trainable step on the same
scene, plus the round-4 all-trainable cornell_box north-star for
continuity. Target (VERDICT r4 #1): cfg5-shaped ≥ 35 Mrays/s.
"""

import json
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


def time_step(step, p, o, n=2):
    p, o, _ = step(p, o, 0)
    jax.block_until_ready((p, o))
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        p, o, loss = step(p, o, i + 1)
        float(loss)   # forced host read (axon block_until_ready gotcha)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    w = h = 600
    spp, mb = 200, 20
    rays = w * h * spp
    out = {"device": jax.devices()[0].platform}

    world, cam, kw = presets.cornell_spheres(width=w, height=h)
    scene = world.build()
    target = jnp.zeros((h, w, 3), jnp.float32)

    for name, trainable in (
            ("cfg5_shaped", ("sph_center", "mat_albedo")),
            ("all_trainable_spheres_scene", None)):
        t0 = time.perf_counter()
        step, (p, o) = make_fused_train_step(
            scene, cam, target, spp=spp, max_bounces=mb,
            background=kw["background"], seed=0, trainable=trainable)
        dt = time_step(step, p, o)
        out[name + "_step_s"] = round(dt, 3)
        out[name + "_rays_per_sec"] = round(rays / dt, 1)
        out[name + "_total_incl_compile_s"] = round(
            time.perf_counter() - t0, 1)
        print(json.dumps(out), flush=True)

    # continuity: the round-4 all-trainable cornell_box north-star
    world3, cam3, kw3 = presets.cornell_box(width=w, height=h)
    scene3 = world3.build()
    step3, (p3, o3) = make_fused_train_step(
        scene3, cam3, target, spp=spp, max_bounces=mb,
        background=kw3["background"], seed=0)
    dt3 = time_step(step3, p3, o3)
    out["box_all_trainable_step_s"] = round(dt3, 3)
    out["box_all_trainable_rays_per_sec"] = round(rays / dt3, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
