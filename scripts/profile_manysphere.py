"""Profile the classic fused diff kernel on a 128-sphere scene (VERDICT r3 #1).

Decomposes the fused train step's cost: full surrogates vs silhouette-off
vs pathwise-only vs forward-only megakernel, plus the Cornell fwd+bwd rate
at the same (size, spp, mb) for the within-3x gate.

Run on the real TPU:  python scripts/profile_manysphere.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.models.geometry import Quad
from tinyraytracer_tpu.models.materials import Light
from tinyraytracer_tpu.ops.diffkernel import (
    build_diff_static, render_value_and_grad)
from tinyraytracer_tpu.ops.megakernel import MegakernelRenderer

W, H, SPP, MB = 300, 300, 16, 8
N_RAYS = W * H * SPP


def lit_random_spheres(n=128):
    world, cam, kw = presets.random_spheres(width=W, height=H, n=n)
    world.add_material("lamp", Light((12.0, 12.0, 12.0)))
    world.add_geometry(Quad((-4.0, 11.99, -4.0), (8.0, 0.0, 0.0),
                            (0.0, 0.0, 8.0), "lamp"))
    kw = dict(kw, background=(0.01, 0.01, 0.015))
    return world, cam, kw


def time_step(scene, cam, kw, st, nee, sil, tag, surr_rows=None, tile=None):
    target = jnp.zeros((H, W, 3), jnp.float32)

    @jax.jit
    def f(seed):
        loss, img, g = render_value_and_grad(
            scene, cam, target, spp=SPP, max_bounces=MB,
            background=kw["background"], seed=seed, static=st,
            nee=nee, silhouette=sil, surr_rows=surr_rows, tile=tile)
        return loss

    float(f(0))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(f(i + 1))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{tag:36s} {dt*1e3:9.1f} ms   {N_RAYS/dt/1e6:8.2f} Mrays/s",
          flush=True)
    return dt


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    world, cam, kw = lit_random_spheres(128)
    scene = world.build()
    st = build_diff_static(scene)
    print(f"scene: ns={st.ns} nq={st.nq} lights={st.n_lights} "
          f"mb={MB} spp={SPP} {W}x{H}", flush=True)

    # forward-only megakernel
    r = MegakernelRenderer(scene, cam, kw["background"])
    r.render(spp=SPP, max_bounces=MB, seed=0).block_until_ready()
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        r.render(spp=SPP, max_bounces=MB, seed=i + 1).block_until_ready()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{'forward megakernel':36s} {dt*1e3:9.1f} ms   "
          f"{N_RAYS/dt/1e6:8.2f} Mrays/s", flush=True)

    time_step(scene, cam, kw, st, nee=True, sil=True, tag="fused full (nee+sil)")
    time_step(scene, cam, kw, st, nee=True, sil=False, tag="fused sil off")
    time_step(scene, cam, kw, st, nee=False, sil=False, tag="fused pathwise only")
    # subset surrogates (VERDICT r3 #1): train 8 of the 128 spheres
    sub8 = {"sph": st.sph_rows[:8]}
    time_step(scene, cam, kw, st, nee=True, sil=True, surr_rows=sub8,
              tag="fused subset-8 (nee+sil)")
    try:
        time_step(scene, cam, kw, st, nee=True, sil=True, surr_rows=sub8,
                  tile=256, tag="fused subset-8 tile=256")
    except Exception as e:
        print("tile=256 failed:", type(e).__name__, str(e)[:120], flush=True)

    # Cornell reference at the same config
    world_c, cam_c, kw_c = presets.cornell_box(width=W, height=H)
    scene_c = world_c.build()
    st_c = build_diff_static(scene_c)
    print(f"cornell: ns={st_c.ns} nq={st_c.nq}", flush=True)
    time_step(scene_c, cam_c, kw_c, st_c, nee=True, sil=True,
              tag="cornell fused full")


if __name__ == "__main__":
    main()
