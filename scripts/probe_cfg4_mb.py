"""How much of config-4's cost is dead-lane bounces? (scratch probe)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.ops.megakernel import MegakernelRenderer

world, camera, kw = presets.random_spheres(width=1200, height=675)
scene = world.build()
spp = 20
r = MegakernelRenderer(scene, camera, kw["background"])
for mb in (50, 16, 8, 4, 2):
    r.render(spp=spp, max_bounces=mb, seed=0).block_until_ready()
    t0 = time.perf_counter()
    r.render(spp=spp, max_bounces=mb, seed=1).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"mb={mb:3d}: {1200*675*spp/dt/1e6:7.2f} Mrays/s ({dt:.3f}s)")
