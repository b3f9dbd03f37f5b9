"""Many-sphere inverse rendering with row-subset surrogates (round 4).

The boundary surrogates (silhouette + NEE soft shadow) cost
O(primitives) per bounce in the fused kernel's adjoint. When only a few
of a large scene's primitives are being fitted, `trainable_rows`
restricts the surrogate adjoints to those rows — the cost then scales
with the TRAINED subset, not the scene (VERDICT r3 #1; measured: a
128-sphere lit scene steps 235 -> 169 ms at 300^2 spp16 mb8 on v5e
with 8 trained spheres).

This demo builds a 128-sphere lit scene, offsets the big DIFFUSE
sphere by 1.5 units, and recovers its position with the classic fused
kernel while every other primitive stays pinned. (Diffuse appearance is
the well-posed case — a glass sphere's refraction-dominated pixels and
out-of-frame offsets under the scene's narrow 20-degree camera both
flatten the loss landscape.) (The scene's
narrow 20-degree camera means large offsets push a sphere out of frame,
where the silhouette surrogate has nothing to pull on — keep offsets
in-view.)

Run (TPU; CPU works via --interpret but is slow):
    python examples/manysphere_fit.py --steps 80
"""

from __future__ import annotations

import argparse
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

import optax

from tinyraytracer_tpu.diff import inverse
from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.models.geometry import Quad
from tinyraytracer_tpu.models.materials import Light
from tinyraytracer_tpu.ops import trace as trace_ops
from tinyraytracer_tpu.ops.diffkernel import build_diff_static


def build(offset, n=128, width=128, height=128):
    world, cam, kw = presets.random_spheres(width=width, height=height, n=n)
    world.add_material("lamp", Light((12.0, 12.0, 12.0)))
    world.add_geometry(Quad((-4.0, 11.99, -4.0), (8.0, 0.0, 0.0),
                            (0.0, 0.0, 8.0), "lamp"))
    scene = world.build()
    # move the big diffuse sphere (at (-4, 1, 0)) along z
    centers = np.asarray(scene.sph_center)
    valid = np.asarray(scene.sph_valid)
    rows = np.nonzero(valid)[0]
    target_row = int(rows[np.argmin(np.linalg.norm(
        centers[rows] - np.array([-4.0, 1.0, 0.0]), axis=-1))])
    scene = scene.replace(sph_center=scene.sph_center.at[target_row, 2].add(
        float(offset)))
    return scene, cam, kw, target_row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    scene_t, cam, kw, row = build(0.0, width=args.size, height=args.size)
    bg = jnp.asarray((0.01, 0.01, 0.015), jnp.float32)
    target = trace_ops.render_image(
        scene_t, cam, spp=48, max_bounces=4, background=bg, seed=1,
        nee=True)
    scene0, _, _, _ = build(1.5, width=args.size, height=args.size)
    true_c = np.asarray(scene_t.sph_center)[row]
    st = build_diff_static(scene0)
    print(f"scene: {len(st.sph_rows)} spheres; training row {row} only "
          f"(start offset 1.5)", flush=True)

    sched = optax.join_schedules(
        [optax.constant_schedule(0.08),
         optax.exponential_decay(0.08, transition_steps=10,
                                 decay_rate=0.5)],
        boundaries=[max(10, args.steps // 2)])
    step, (params, opt) = inverse.make_fused_train_step(
        scene0, cam, target, spp=args.spp, max_bounces=4, background=bg,
        seed=0, optimizer=optax.adam(sched),
        trainable=("sph_center",),
        trainable_rows={"sph": (row,)},
        interpret=args.interpret, static=st)
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt, loss = step(params, opt, i)
        if i % 10 == 0 or i == args.steps - 1:
            got = np.asarray(params["sph_center"])[row]
            err = float(np.linalg.norm(got - true_c))
            print(f"step {i:3d}  loss {float(loss):.6f}  err {err:.3f}",
                  flush=True)
    dt = time.perf_counter() - t0
    got = np.asarray(params["sph_center"])[row]
    err = float(np.linalg.norm(got - true_c))
    n_rays = args.size * args.size * args.spp
    print(f"final position error: {err:.3f} (started 1.5); "
          f"{args.steps} steps in {dt:.1f}s "
          f"({n_rays * args.steps / dt / 1e6:.2f} Mrays/s incl. compile "
          "amortization)")
    # untrained rows must not have moved
    others = [r for r in st.sph_rows if r != row]
    drift = np.abs(np.asarray(params["sph_center"])[others]
                   - np.asarray(scene0.sph_center)[others]).max()
    print(f"max untrained-row drift: {drift} (must be 0.0)")


if __name__ == "__main__":
    main()
