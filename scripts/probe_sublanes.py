"""Does Mosaic waste sublanes on (1,N) arrays inside a Pallas kernel? (scratch)

Times K chained elementwise ops on (1,1024), (8,128), and (8,1024) f32
blocks. If (1,1024) costs the same as (8,1024) (8x the elements), the
(1,N) layout burns 7/8 of the VPU and the ray-state kernels should move
to sublane-packed state.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

K = 2000
GRID = 512  # repeat over grid so wall time is measurable


def make(shape):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        y = x

        def body(i, y):
            y = y * 1.000001 + x
            y = jnp.where(y > 2.0, y - 2.0, y)
            return y

        y = jax.lax.fori_loop(0, K, body, y)
        o_ref[...] = y

    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )
    return jax.jit(f)


for shape in [(1, 1024), (8, 128), (8, 1024), (16, 1024), (1, 8192)]:
    x = jnp.full(shape, 0.5, jnp.float32)
    f = make(shape)
    f(x).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    n = shape[0] * shape[1]
    # 3 VPU ops per chain step (mul-add fused maybe 2; count 3)
    ops = n * K * GRID * 3
    print(f"{str(shape):12s}: {dt*1e3:8.2f} ms  "
          f"{ops/dt/1e12:6.2f} Tops/s", flush=True)
