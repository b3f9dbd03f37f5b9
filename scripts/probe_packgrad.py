"""Probe: gradient scatter-add building blocks for a packed diff kernel.

Tests whether Mosaic lowers, inside one kernel:
  A) (S, L) -> (1, S*L) reshape (sublane->lane relayout) + one-hot MXU
     scatter-add into a small (na, k) table.
  B) per-prim masked lane-reduces with (S, 1) keepdims accumulators.
Reports per-bounce-equivalent timings of each scheme. (scratch)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

S, L = 32, 256
NA = 24
K = 16
GRID = 1024
B = 16      # "bounces" per kernel


def kernel_A(o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0).astype(jnp.float32)
    rowf = jnp.mod(lane + sub, float(NA))
    acc = jnp.zeros((NA, K), jnp.float32)

    def body(b, acc):
        c = lane * 1e-3 + sub + b
        cf = c.reshape(1, S * L)
        rf = rowf.reshape(1, S * L)
        rows = jax.lax.broadcasted_iota(jnp.int32, (NA, S * L), 0)
        onehot = (rows == rf.astype(jnp.int32)).astype(jnp.float32)
        G = jnp.concatenate([cf * (i + 1.0) for i in range(K)], axis=0)
        add = jax.lax.dot_general(
            onehot, G, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + add

    acc = jax.lax.fori_loop(0, B, body, acc)
    o_ref[...] = jnp.pad(acc, ((0, 0), (0, 128 - K)))


def kernel_B(o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0).astype(jnp.float32)
    rowf = jnp.mod(lane + sub, float(NA))
    accs = [jnp.zeros((S, 1), jnp.float32) for _ in range(NA * 2)]

    def body(b, accs):
        c = lane * 1e-3 + sub + b
        out = []
        for p in range(NA):
            m = (rowf == float(p)).astype(jnp.float32)
            mc = m * c
            out.append(accs[2 * p] + jnp.sum(mc, axis=1, keepdims=True))
            out.append(accs[2 * p + 1]
                       + jnp.sum(mc * 2.0, axis=1, keepdims=True))
        return out

    accs = jax.lax.fori_loop(0, B, body, accs)
    tot = jnp.concatenate(accs, axis=1)          # (S, 2*NA)
    o_ref[...] = jnp.pad(jnp.sum(tot, axis=0, keepdims=True),
                         ((0, NA - 1), (0, 128 - 2 * NA)))


def run(name, kern):
    try:
        f = pl.pallas_call(
            kern, grid=(GRID,),
            out_specs=pl.BlockSpec((NA, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NA, 128), jnp.float32))
        g = jax.jit(lambda: f().sum())
        float(g())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(g())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        per = dt / (GRID * B * S * L) * 1e9
        print(f"{name}: {dt*1e3:8.2f} ms  {per:6.3f} ns/lane-bounce",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


run("A reshape+MXU scatter", kernel_A)
run("B masked lane-reduces ", kernel_B)
