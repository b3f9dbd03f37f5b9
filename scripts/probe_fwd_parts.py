"""Bisect modular forward cost per component at R=360k. (scratch)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.models.camera import generate_rays
from tinyraytracer_tpu.ops import intersect as isect
from tinyraytracer_tpu.ops.intersect_pallas import compact_scene, closest_hit_pallas
from tinyraytracer_tpu.ops.scatter import scatter as scatter_op

world, camera, kw = presets.cornell_box(width=300, height=300)
scene = world.build()
cs = compact_scene(scene)
R = 360_000
pid = jnp.arange(R, dtype=jnp.uint32) % jnp.uint32(90000)
sid = jnp.zeros((R,), jnp.uint32)
seed = jnp.uint32(0)
o, d = generate_rays(camera, pid, sid, seed)
o, d = jax.block_until_ready((o, d))

def bench(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s}: {min(ts)*1e3:7.2f} ms", flush=True)

bench("raygen", lambda pid, sid: generate_rays(camera, pid, sid, seed), pid, sid)
bench("select pallas", lambda o, d: closest_hit_pallas(cs, o, d), o, d)
bench("select dense", lambda o, d: isect.closest_select(scene, o, d), o, d)

tj = jax.jit(lambda o, d: closest_hit_pallas(cs, o, d))(o, d)
t_sel, j = jax.block_until_ready(tj)
bench("select_to_record", lambda o, d, t_sel, j: isect.select_to_record(scene, o, d, t_sel, j).t, o, d, t_sel, j)

rec = jax.jit(lambda o, d, t, j: isect.select_to_record(scene, o, d, t, j))(o, d, t_sel, j)
rec = jax.block_until_ready(rec)
bench("scatter", lambda d, rec: scatter_op(d, rec, seed, pid, sid, jnp.uint32(0))[0], d, rec)

# one full bounce body equivalent (select+record+scatter)
def bounce(o, d):
    t_sel, j = closest_hit_pallas(cs, o, d)
    rec = isect.select_to_record(scene, o, d, t_sel, j)
    nd, att, ab = scatter_op(d, rec, seed, pid, sid, jnp.uint32(0))
    return rec.point, nd, att
bench("full bounce (no NEE)", bounce, o, d)
