"""Probe: classic fused diff kernel step time vs sphere count, with the
surrogate terms toggled, to locate the many-sphere cost (round-4 item 1).

Scene: Cornell walls + ceiling light + N small lambertian spheres (NEE
active, silhouette active) at 200x200 spp=8 mb=6 — the config the round-3
crossover was measured at. (scratch)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tinyraytracer_tpu.diff.params import apply_params, scene_params  # noqa: E402
from tinyraytracer_tpu.models.camera import Camera  # noqa: E402
from tinyraytracer_tpu.models.geometry import Quad, Sphere  # noqa: E402
from tinyraytracer_tpu.models.materials import Lambertian, Light  # noqa: E402
from tinyraytracer_tpu.models.world import World  # noqa: E402
from tinyraytracer_tpu.ops.diffkernel import (  # noqa: E402
    build_diff_static,
    render_value_and_grad,
)

W = H = int(os.environ.get("PROBE_WH", "200"))
SPP = int(os.environ.get("PROBE_SPP", "8"))
MB = int(os.environ.get("PROBE_MB", "6"))


def many_sphere_scene(n: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    world = World()
    world.add_material("red", Lambertian((0.65, 0.05, 0.05)))
    world.add_material("white", Lambertian((0.73, 0.73, 0.73)))
    world.add_material("green", Lambertian((0.12, 0.45, 0.15)))
    world.add_material("light", Light((15.0, 15.0, 15.0)))
    world.add_geometry(Quad((100.0, 0.0, 0.0), (0.0, 100.0, 0.0), (0.0, 0.0, 100.0), "green"))
    world.add_geometry(Quad((0.0, 0.0, 0.0), (0.0, 100.0, 0.0), (0.0, 0.0, 100.0), "red"))
    world.add_geometry(Quad((65.0, 99.99, 60.0), (-30.0, 0.0, 0.0), (0.0, 0.0, -20.0), "light"))
    world.add_geometry(Quad((0.0, 0.0, 0.0), (100.0, 0.0, 0.0), (0.0, 0.0, 100.0), "white"))
    world.add_geometry(Quad((100.0, 100.0, 100.0), (-100.0, 0.0, 0.0), (0.0, 0.0, -100.0), "white"))
    world.add_geometry(Quad((0.0, 0.0, 100.0), (100.0, 0.0, 0.0), (0.0, 100.0, 0.0), "white"))
    for i in range(n):
        c = rng.random(3) * np.array([90.0, 60.0, 90.0]) + np.array([5.0, 4.0, 5.0])
        r = 2.0 + 3.0 * rng.random()
        world.add_material(f"m{i}", Lambertian(tuple(0.2 + 0.7 * rng.random(3))))
        world.add_geometry(Sphere(tuple(c), float(r), f"m{i}"))
    camera = Camera.new(
        focus_distance=140.0, defocus_angle=0.0, position=(50.0, 50.0, -140.0),
        look_at=(50.0, 50.0, 0.0), up=(0.0, 1.0, 0.0), vertical_fov=40.0,
        width=W, height=H,
    )
    return world, camera


def bench(n, nee, sil, extra=None):
    world, cam = many_sphere_scene(n)
    scene = world.build()
    static = build_diff_static(scene)
    params0 = scene_params(scene)
    tgt = jnp.zeros((H, W, 3), jnp.float32)
    kws = dict(spp=SPP, max_bounces=MB, background=(0.001, 0.001, 0.001),
               seed=0, nee=nee, silhouette=sil, packed=False)
    if extra:
        kws.update(extra)

    @jax.jit
    def step(params):
        s = apply_params(scene, params)
        loss, _img, grads = render_value_and_grad(
            s, cam, tgt, static=static, **kws)
        return loss, grads

    t0 = time.perf_counter()
    out = step(params0)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(step(params0))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    rate = W * H * SPP / dt
    print(f"ns={n:4d} nee={int(nee)} sil={int(sil)}: compile {tc:5.1f}s  "
          f"step {dt*1e3:8.1f} ms  {rate/1e6:7.2f} Mrays/s  "
          f"loss {float(out[0]):.6f}", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    packed = None
    if args and args[0] == "packed":
        packed = True
        args = args[1:]
    counts = [int(x) for x in args] or [2, 16, 64, 128]
    for n in counts:
        if packed:
            bench(n, nee=True, sil=True, extra=dict(packed=True))
        else:
            bench(n, nee=True, sil=True)
            bench(n, nee=True, sil=False)
            bench(n, nee=False, sil=False)
