"""512-sphere ALL-geometry-trained fused step (dense streamed surrogates)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.diff.inverse import make_fused_train_step

w, h, spp, mb = 200, 200, 8, 8
world, cam, kw = presets.random_spheres(width=w, height=h, n=512)
scene = world.build()
target = jnp.zeros((h, w, 3), jnp.float32)
out = {"device": jax.devices()[0].platform}
t0 = time.perf_counter()
step, (p, o) = make_fused_train_step(
    scene, cam, target, spp=spp, max_bounces=mb,
    background=kw["background"], seed=0)  # everything trainable: dense
p, o, l0 = step(p, o, 0)
jax.block_until_ready((p, o))
out["compile_s"] = round(time.perf_counter() - t0, 1)
ts = []
for i in range(3):
    t0 = time.perf_counter()
    p, o, loss = step(p, o, i + 1)
    float(loss)
    ts.append(time.perf_counter() - t0)
dt = min(ts)
out["dense512_step_s"] = round(dt, 3)
out["dense512_fwdbwd_rays_per_sec"] = round(w * h * spp / dt, 1)
out["loss_finite"] = bool(np.isfinite(float(loss)))
g = np.abs(np.asarray(p["sph_center"]) - np.asarray(scene.sph_center))
out["sphere_centers_moved_frac"] = round(
    float((g.max(axis=-1) > 0)[np.asarray(scene.sph_valid)].mean()), 3)
print(json.dumps(out))
