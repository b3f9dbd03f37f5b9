"""cfg4b: chunk-cull under LOCKSTEP+early-exit vs regen (coherence test)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.ops.megakernel import MegakernelRenderer

w, h, spp, mb, n = 400, 225, 16, 50, 8000
world, cam, kw = presets.random_spheres(width=w, height=h, n=n)
scene = world.build()
out = {}
for name, kws, env_tile in (
        ("lockstep_ee_cull_t256", dict(regen=False, early_exit=True), 256),
        ("lockstep_ee_cull_t512", dict(regen=False, early_exit=True), 512),
        ("regen_cull_t512", dict(), 512),
):
    os.environ["TINYRT_ROW_CHUNK"] = "256"
    os.environ["TINYRT_ROW_CHUNK_TILE"] = str(env_tile)
    try:
        r = MegakernelRenderer(scene, cam, kw["background"], chunk_cull=True)
        r.render(spp=spp, max_bounces=mb, seed=0, **kws).block_until_ready()
        ts = []
        for i in range(2):
            t0 = time.perf_counter()
            np.asarray(r.render(spp=spp, max_bounces=mb, seed=i + 1, **kws)).sum()
            ts.append(time.perf_counter() - t0)
        out[name] = round(w * h * spp / min(ts) / 1e6, 3)
    except Exception as e:
        out[name] = f"{type(e).__name__}: {e}"[:120]
    print(json.dumps(out), flush=True)
