"""Probe 2: remaining Mosaic lowering unknowns for the packed diff kernel.

  C) one-hot MXU winner-field gather: onehot (NA, S*L) from rowf, MXU
     (F, NA) x (NA, S*L) -> (F, S*L), then per-row (1, S*L) -> (S, L)
     reshape back to packed layout.
  D) scalar jnp.sum over (S, L) + building an (NA, 8) table from scalars
     via iota-equality selects (soft-shadow grad scatter).
(scratch)
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

S, L = 16, 256
NA = 24
F = 32
GRID = 512
B = 16


def kernel_C(pay_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    rowf = jnp.mod(lane + sub, NA)

    def body(b, acc):
        rf = (rowf + b).reshape(1, S * L) % NA
        rows = jax.lax.broadcasted_iota(jnp.int32, (NA, S * L), 0)
        onehot = (rows == rf).astype(jnp.float32)
        payw = jax.lax.dot_general(
            pay_ref[...], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (F, S*L)
        tot = acc
        for i in range(8):
            fld = payw[i:i + 1, :].reshape(S, L)         # back to packed
            tot = tot + fld
        return tot

    acc = jax.lax.fori_loop(0, B, body, jnp.zeros((S, L), jnp.float32))
    o_ref[...] = acc


def kernel_D(o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    rowf = jnp.mod(lane + sub, NA)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (NA, 128), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (NA, 128), 1)

    def body(b, acc):
        tab = acc
        for p in range(4):                      # "real spheres"
            m = (rowf == p).astype(jnp.float32)
            c = m * (lane.astype(jnp.float32) + b)
            s0 = jnp.sum(c)
            s1 = jnp.sum(c * 2.0)
            s2 = jnp.sum(c * 3.0)
            s3 = jnp.sum(c * 4.0)
            hitp = (row_i == p)
            tab = tab + jnp.where(
                hitp & (col_i == 0), s0,
                jnp.where(hitp & (col_i == 1), s1,
                          jnp.where(hitp & (col_i == 2), s2,
                                    jnp.where(hitp & (col_i == 3), s3,
                                              0.0))))
        return tab

    o_ref[...] = jax.lax.fori_loop(
        0, B, body, jnp.zeros((NA, 128), jnp.float32))[:, :128]


def run(name, kern, with_pay):
    try:
        ins = []
        in_specs = []
        if with_pay:
            ins.append(jnp.ones((F, NA), jnp.float32))
            in_specs.append(pl.BlockSpec((F, NA), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        osh = (S, L) if with_pay else (NA, 128)
        f = pl.pallas_call(
            kern, grid=(GRID,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(osh, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(osh, jnp.float32))
        g = jax.jit(lambda *a: f(*a).sum())
        float(g(*ins))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*ins))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        per = dt / (GRID * B * S * L) * 1e9
        print(f"{name}: {dt*1e3:8.2f} ms  {per:6.3f} ns/lane-bounce",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)


run("C onehot MXU gather + unpack reshape", kernel_C, True)
run("D scalar-sum table build           ", kernel_D, False)
