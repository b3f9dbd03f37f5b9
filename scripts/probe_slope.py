"""Per-bounce in-graph cost: slope of trace() wall time vs max_bounces. (scratch)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.models.camera import generate_rays
from tinyraytracer_tpu.ops import trace as trace_ops
from tinyraytracer_tpu.ops.intersect_pallas import compact_scene
from tinyraytracer_tpu.diff.params import scene_params, apply_params

world, camera, kw = presets.cornell_box(width=300, height=300)
scene = world.build()
cs = compact_scene(scene)
bg = jnp.asarray(kw["background"], jnp.float32)
R = 360_000
pid = jnp.arange(R, dtype=jnp.uint32) % jnp.uint32(90000)
sid = jnp.zeros((R,), jnp.uint32)
seed = jnp.uint32(0)
o, d = generate_rays(camera, pid, sid, seed)
o, d = jax.block_until_ready((o, d))
params = scene_params(scene)

def run(tag, nee, compact, grad):
    times = {}
    for mb in (2, 10):
        if grad:
            def loss(p, o, d):
                s = apply_params(scene, p)
                c = trace_ops.trace(s, o, d, pid, sid, seed, mb, bg,
                                    compact=compact, nee=nee)
                return jnp.mean(c)
            f = jax.jit(lambda p, o, d: jax.grad(loss)(p, o, d))
            args = (params, o, d)
        else:
            f = jax.jit(lambda o, d: trace_ops.trace(
                scene, o, d, pid, sid, seed, mb, bg, compact=compact, nee=nee))
            args = (o, d)
        jax.block_until_ready(f(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(f(*args))
            ts.append(time.perf_counter() - t0)
        times[mb] = min(ts)
    slope = (times[10] - times[2]) / 8.0
    print(f"{tag:28s}: per-bounce {slope*1e3:7.2f} ms  (mb2 {times[2]*1e3:.1f} / mb10 {times[10]*1e3:.1f})", flush=True)

run("fwd kernel-select", False, cs, False)
run("fwd kernel-select +NEE", True, cs, False)
run("grad kernel-select", False, cs, True)
run("grad kernel-select +NEE", True, cs, True)
