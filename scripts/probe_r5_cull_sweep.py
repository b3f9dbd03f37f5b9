"""Chunk-cull tuning sweep on cfg4b (8000 spheres)."""
import itertools, json, os, sys, time
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
for chunk, tile in itertools.product((64, 128, 256, 512), (512, 1024)):
    os.environ["TINYRT_ROW_CHUNK"] = str(chunk)
    os.environ["TINYRT_ROW_CHUNK_TILE"] = str(tile)
    try:
        r = MegakernelRenderer(scene, cam, kw["background"], chunk_cull=True)
        r.render(spp=spp, max_bounces=mb, seed=0).block_until_ready()
        ts = []
        for i in range(2):
            t0 = time.perf_counter()
            np.asarray(r.render(spp=spp, max_bounces=mb, seed=i + 1)).sum()
            ts.append(time.perf_counter() - t0)
        out[f"c{chunk}_t{tile}"] = round(w * h * spp / min(ts) / 1e6, 3)
    except Exception as e:
        out[f"c{chunk}_t{tile}"] = f"{type(e).__name__}: {e}"[:90]
    print(json.dumps(out), flush=True)
