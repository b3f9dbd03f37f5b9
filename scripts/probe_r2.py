"""Round-2 probe: current TPU numbers for config 4 + fwd+bwd (scratch)."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.ops.megakernel import MegakernelRenderer
from tinyraytracer_tpu.diff.inverse import make_train_step

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "cfg4"):
    # config 4 at reduced spp (perf per-ray is spp-independent)
    world, camera, kw = presets.random_spheres(width=1200, height=675)
    scene = world.build()
    spp = 20
    r = MegakernelRenderer(scene, camera, kw["background"])
    t0 = time.perf_counter()
    r.render(spp=spp, max_bounces=kw["max_bounces"], seed=0).block_until_ready()
    print(f"cfg4 compile+run: {time.perf_counter()-t0:.1f}s")
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        r.render(spp=spp, max_bounces=kw["max_bounces"], seed=i + 1).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rays = 1200 * 675 * spp
    print(f"cfg4 fwd: {rays/dt/1e6:.2f} Mrays/s  ({dt:.3f}s for spp={spp})")

if which in ("all", "fwdbwd"):
    bw, bh, bspp, bmb = 300, 300, 4, 8
    world2, camera2, kw2 = presets.cornell_box(width=bw, height=bh)
    scene2 = world2.build()
    target = jnp.zeros((bh, bw, 3), jnp.float32)
    t0 = time.perf_counter()
    step, (params, opt_state) = make_train_step(
        scene2, camera2, target, spp=bspp, max_bounces=bmb,
        background=kw2["background"], seed=0,
    )
    params, opt_state, _ = step(params, opt_state, 0)
    jax.block_until_ready((params, opt_state))
    print(f"fwdbwd compile+first: {time.perf_counter()-t0:.1f}s")
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, i + 1)
        jax.block_until_ready((params, opt_state, loss))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"fwdbwd: {bw*bh*bspp/dt/1e6:.3f} Mrays/s  ({dt:.3f}s/step)")
