"""Round-5 large-N probes on the real chip (VERDICT r4 #3 + #4).

1. cfg4b (8000 spheres, 400x225 spp16 mb50) forward through the public
   Renderer: row-streamed dense (r4 baseline ~0.72-1.0 Mrays/s) vs the
   new Morton-ordered chunk-cull streamed path. Target >= 2 Mrays/s.
2. The row-streamed classic DIFF kernel on a cfg4-class scene
   (512 spheres, trainable_rows subset): first-ever fused train step at
   this scale — compile + step time + gradient sanity.
"""

import json
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
from tinyraytracer_tpu.ops.megakernel import MegakernelRenderer

out = {"device": jax.devices()[0].platform}


def bench_fwd(r, spp, mb, n=2):
    r.render(spp=spp, max_bounces=mb, seed=0).block_until_ready()
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        img = r.render(spp=spp, max_bounces=mb, seed=i + 1)
        np.asarray(img).sum()   # forced host read
        ts.append(time.perf_counter() - t0)
    return min(ts)


w, h, spp, mb, n = 400, 225, 16, 50, 8000
world, cam, kw = presets.random_spheres(width=w, height=h, n=n)
scene = world.build()

for name, cull in (("cfg4b_dense_stream", False),
                   ("cfg4b_chunk_cull", True)):
    t0 = time.perf_counter()
    r = MegakernelRenderer(scene, cam, kw["background"], chunk_cull=cull)
    dt = bench_fwd(r, spp, mb)
    out[name + "_rays_per_sec"] = round(w * h * spp / dt, 1)
    out[name + "_wall_s"] = round(dt, 3)
    out[name + "_total_incl_compile_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)

# --- streamed diff kernel at cfg4 class ------------------------------
from tinyraytracer_tpu.diff.inverse import make_fused_train_step
from tinyraytracer_tpu.ops.diffkernel import build_diff_static

w2, h2, spp2, mb2 = 200, 200, 8, 8
world2, cam2, kw2 = presets.random_spheres(width=w2, height=h2, n=512)
scene2 = world2.build()
st2 = build_diff_static(scene2)
target = jnp.zeros((h2, w2, 3), jnp.float32)
t0 = time.perf_counter()
step, (p, o) = make_fused_train_step(
    scene2, cam2, target, spp=spp2, max_bounces=mb2,
    background=kw2["background"], seed=0,
    trainable=("sph_center", "mat_albedo"),
    trainable_rows={"sph": st2.sph_rows[:8]},
)
p, o, loss0 = step(p, o, 0)
jax.block_until_ready((p, o))
out["diff512_compile_s"] = round(time.perf_counter() - t0, 1)
ts = []
for i in range(3):
    t0 = time.perf_counter()
    p, o, loss = step(p, o, i + 1)
    float(loss)
    ts.append(time.perf_counter() - t0)
dt = min(ts)
out["diff512_step_s"] = round(dt, 3)
out["diff512_fwdbwd_rays_per_sec"] = round(w2 * h2 * spp2 / dt, 1)
out["diff512_loss_finite"] = bool(np.isfinite(float(loss)))
g_moved = np.abs(np.asarray(p["sph_center"])
                 - np.asarray(scene2.sph_center)).max(axis=-1)
rows = list(st2.sph_rows[:8])
rest = [r_ for r_ in st2.sph_rows if r_ not in rows]
out["diff512_trained_rows_moved"] = bool((g_moved[rows] > 0).any())
out["diff512_pinned_rows_fixed"] = bool((g_moved[rest] == 0).all())
print(json.dumps(out), flush=True)
