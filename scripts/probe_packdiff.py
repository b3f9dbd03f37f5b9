"""Probe: packed diff kernel throughput vs tile shape at the BENCH
config (Cornell 300x300 spp=16 mb=8) and vs the classic diff kernel.
Mirrors make_fused_train_step's jit pattern (template closed over,
params traced). (scratch)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tinyraytracer_tpu.diff.params import apply_params, scene_params  # noqa: E402
from tinyraytracer_tpu.models import presets  # noqa: E402
from tinyraytracer_tpu.ops.diffkernel import (  # noqa: E402
    build_diff_static,
    render_value_and_grad,
)

W = H = 300
SPP = 16
MB = 8

world, cam, kw = presets.cornell_box(width=W, height=H)
scene = world.build()
static = build_diff_static(scene)
params0 = scene_params(scene)
tgt = jnp.zeros((H, W, 3), jnp.float32)
kws = dict(spp=SPP, max_bounces=MB, background=kw["background"], seed=0)


def bench(opts, name):
    @jax.jit
    def step(params):
        s = apply_params(scene, params)
        loss, _img, grads = render_value_and_grad(
            s, cam, tgt, static=static, **kws, **opts)
        return loss, grads

    t0 = time.perf_counter()
    loss, grads = step(params0)
    jax.block_until_ready((loss, grads))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(step(params0))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    rate = W * H * SPP / dt
    print(f"{name}: compile {tc:.1f}s  step {dt*1e3:.1f} ms  "
          f"{rate/1e6:.1f} Mrays/s  loss {float(loss):.6f}", flush=True)
    return grads


if len(sys.argv) > 1 and sys.argv[1] == "classic":
    bench(dict(packed=False), "classic (1,256)")
else:
    from tinyraytracer_tpu.ops.diffkernel_packed import (  # noqa: E402
        render_value_and_grad_packed,
    )

    tiles = [(16, 256), (32, 256)]
    if len(sys.argv) > 1:
        tiles = [tuple(int(x) for x in a.split("x")) for a in sys.argv[1:]]

    for t in tiles:
        @jax.jit
        def stepp(params, t=t):
            s = apply_params(scene, params)
            loss, _img, grads = render_value_and_grad_packed(
                s, cam, tgt, static=static, tile=t, **kws)
            return loss, grads

        try:
            t0 = time.perf_counter()
            loss, grads = stepp(params0)
            jax.block_until_ready((loss, grads))
            tc = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(stepp(params0))
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            rate = W * H * SPP / dt
            print(f"packed {t}: compile {tc:.1f}s  step {dt*1e3:.1f} ms  "
                  f"{rate/1e6:.1f} Mrays/s  loss {float(loss):.6f}",
                  flush=True)
        except Exception as e:
            print(f"packed {t}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
