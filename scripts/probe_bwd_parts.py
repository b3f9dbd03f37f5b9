"""Locate the fwd+bwd bottleneck: forward-only vs grad, nee on/off. (scratch)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.ops import trace as trace_ops
from tinyraytracer_tpu.diff.params import scene_params, apply_params
from tinyraytracer_tpu.ops.intersect_pallas import compact_scene

bw, bh, spp, mb = 300, 300, 4, 8
world, camera, kw = presets.cornell_box(width=bw, height=bh)
scene = world.build()
bg = jnp.asarray(kw["background"], jnp.float32)
cs = compact_scene(scene)
pixel_id = jnp.arange(bw * bh, dtype=jnp.uint32)
rays = bw * bh * spp

def timeit(name, f):
    f()  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); f(); ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:42s}: {dt*1e3:8.1f} ms  {rays/dt/1e6:7.2f} Mrays/s")

def render(nee, compact, sil=False):
    return trace_ops.render_pixels(
        scene, camera, pixel_id, spp=spp, max_bounces=mb, background=bg,
        seed=jnp.uint32(0), nee=nee, compact=compact, fuse_spp=True,
        silhouette=sil,
    )

fwd_nee = jax.jit(lambda: jnp.mean(render(True, cs)))
fwd_base = jax.jit(lambda: jnp.mean(render(False, cs)))
fwd_dense = jax.jit(lambda: jnp.mean(render(True, None)))

params = scene_params(scene)

def loss(p, nee, compact, sil):
    s = apply_params(scene, p)
    img = trace_ops.render_pixels(
        s, camera, pixel_id, spp=spp, max_bounces=mb, background=bg,
        seed=jnp.uint32(0), nee=nee, compact=compact, fuse_spp=True,
        silhouette=sil,
    )
    return jnp.mean(img ** 2)

g_nee = jax.jit(lambda p: jax.grad(loss)(p, True, cs, True))
g_nee_nosil = jax.jit(lambda p: jax.grad(loss)(p, True, cs, False))
g_base = jax.jit(lambda p: jax.grad(loss)(p, False, cs, False))

timeit("fwd modular nee+kernel", lambda: jax.block_until_ready(fwd_nee()))
timeit("fwd modular base+kernel", lambda: jax.block_until_ready(fwd_base()))
timeit("fwd modular nee dense", lambda: jax.block_until_ready(fwd_dense()))
timeit("grad base (no nee, no sil)", lambda: jax.block_until_ready(g_base(params)))
timeit("grad nee (no sil)", lambda: jax.block_until_ready(g_nee_nosil(params)))
timeit("grad nee+sil", lambda: jax.block_until_ready(g_nee(params)))
