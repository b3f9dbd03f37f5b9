"""Realistic per-segment layout shootout: (1,TR) rays vs sublane-packed. (scratch)

Simulates one path-segment's op mix per layout:
  A) current: state (1,TR); prim tests (na,TR) broadcast; winner payload
     via one-hot MXU matmul; fixed scatter/RNG chain on (1,TR).
  B) packed:  state (S,L); per-prim unrolled tests with SMEM scalars;
     winner payload via min-chain selects + nm-material select gather;
     fixed chain on (S,L).
Reports ns-per-ray-segment for each.
"""
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

NS, NQ, NM = 8, 16, 8
NA = NS + NQ
B = 64          # segments per kernel invocation
GRID = 4096


def fixed_chain(ox, oy, oz, dx, dy, dz, u):
    # ~representative scatter/RNG mix (~30 elementwise ops incl 2 rsqrt)
    h = u
    for _ in range(6):
        h = h * 747796405.0 + 2891336453.0
        h = jnp.where(h > 1e9, h * 1e-9, h)
    r = jax.lax.rsqrt(jnp.maximum(ox * ox + oy * oy + oz * oz, 1e-9))
    sx, sy, sz = ox * r, oy * r, oz * r
    refl = dx * sx + dy * sy + dz * sz
    nx = dx - 2.0 * refl * sx + h * 1e-10
    ny = dy - 2.0 * refl * sy
    nz = dz - 2.0 * refl * sz
    q = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-9))
    att = jnp.where(refl > 0.0, 0.5, 0.9)
    return nx * q, ny * q, nz * q, att, h


def kernel_A(sc_ref, pay_ref, o_ref):
    TR = o_ref.shape[1]
    ones = jnp.ones((1, TR), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TR), 1).astype(jnp.float32)
    ox, oy, oz = ones * 0.1, ones * 0.2, lane * 1e-3
    dx, dy, dz = ones, ones * 0.5, ones * 0.25
    acc = jnp.zeros((1, TR), jnp.float32)

    def body(b, carry):
        ox, oy, oz, dx, dy, dz, acc = carry
        cx = sc_ref[:, 0:1]
        cy = sc_ref[:, 1:2]
        cz = sc_ref[:, 2:3]
        rad = sc_ref[:, 3:4]
        # (na,TR) candidate test ~ sphere quadratic
        mx = ox - cx
        my = oy - cy
        mz = oz - cz
        hb = mx * dx + my * dy + mz * dz
        c = mx * mx + my * my + mz * mz - rad * rad
        disc = hb * hb - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -hb - sq
        t1 = -hb + sq
        tt = jnp.where(t0 > 1e-3, t0, t1)
        tt = jnp.where((disc > 0.0) & (tt > 1e-3), tt, 3e38)
        best = jnp.min(tt, axis=0, keepdims=True)
        wrow = jnp.argmin(tt, axis=0).reshape(1, TR)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (NA, TR), 0)
        onehot = (row_ids == wrow).astype(jnp.float32)      # (na,TR)
        payw = jax.lax.dot_general(
            pay_ref[...], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (32,TR)
        nxw = payw[0:1]
        alb = payw[1:2]
        ox2, oy2, oz2, att, h = fixed_chain(ox, oy, oz, dx, dy, dz,
                                            best + nxw)
        acc = acc + att * alb
        return (ox2, oy2, oz2, dx * 0.999, dy, dz, acc)

    out = jax.lax.fori_loop(0, B, body, (ox, oy, oz, dx, dy, dz, acc))
    o_ref[...] = out[6]


def kernel_B(sm_ref, o_ref):
    S, L = o_ref.shape
    ones = jnp.ones((S, L), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1).astype(jnp.float32)
    ox, oy, oz = ones * 0.1, ones * 0.2, lane * 1e-3
    dx, dy, dz = ones, ones * 0.5, ones * 0.25
    acc = jnp.zeros((S, L), jnp.float32)

    def body(b, carry):
        ox, oy, oz, dx, dy, dz, acc = carry
        best = jnp.full((S, L), 3e38, jnp.float32)
        nxw = jnp.zeros((S, L), jnp.float32)
        mat = jnp.zeros((S, L), jnp.float32)
        for p in range(NA):
            cx = sm_ref[0, p * 8 + 0]
            cy = sm_ref[0, p * 8 + 1]
            cz = sm_ref[0, p * 8 + 2]
            rad = sm_ref[0, p * 8 + 3]
            mx = ox - cx
            my = oy - cy
            mz = oz - cz
            hb = mx * dx + my * dy + mz * dz
            c = mx * mx + my * my + mz * mz - rad * rad
            disc = hb * hb - c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = -hb - sq
            t1 = -hb + sq
            tt = jnp.where(t0 > 1e-3, t0, t1)
            tt = jnp.where((disc > 0.0) & (tt > 1e-3), tt, 3e38)
            w = tt < best
            best = jnp.where(w, tt, best)
            nxw = jnp.where(w, sm_ref[0, p * 8 + 4], nxw)
            mat = jnp.where(w, sm_ref[0, p * 8 + 5], mat)
        # material gather over nm rows (1 scalar here; 9 in production)
        alb = jnp.zeros((S, L), jnp.float32)
        for m in range(NM):
            wm = mat == float(m)
            alb = jnp.where(wm, sm_ref[0, m * 8 + 6], alb)
        ox2, oy2, oz2, att, h = fixed_chain(ox, oy, oz, dx, dy, dz,
                                            best + nxw)
        acc = acc + att * alb
        return (ox2, oy2, oz2, dx * 0.999, dy, dz, acc)

    out = jax.lax.fori_loop(0, B, body, (ox, oy, oz, dx, dy, dz, acc))
    o_ref[...] = out[6]


def run(name, f, args, rays):
    fn = jax.jit(lambda *a: f(*a).sum())
    float(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(*args))          # host readback forces full completion
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    segs = rays * B * GRID
    print(f"{name:28s}: {dt*1e3:8.2f} ms  {dt/segs*1e9:7.3f} ns/ray-seg  "
          f"({segs/dt/1e6:7.1f} Mseg/s)", flush=True)


sc = jnp.ones((NA, 8), jnp.float32) * 0.5
pay = jnp.ones((32, NA), jnp.float32) * 0.25
smem = jnp.ones((1, NA * 8), jnp.float32) * 0.5

for TR in (1024, 2048):
    f = pl.pallas_call(
        kernel_A, grid=(GRID,),
        in_specs=[pl.BlockSpec((NA, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((32, NA), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TR), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, TR), jnp.float32))
    run(f"A (1,{TR}) mxu-gather", f, (sc, pay), TR)

for S, L in ((8, 128), (8, 256), (8, 512), (16, 128), (16, 256), (32, 256)):
    f = pl.pallas_call(
        kernel_B, grid=(GRID,),
        in_specs=[pl.BlockSpec((1, NA * 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((S, L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32))
    run(f"B ({S},{L}) packed", f, (smem,), S * L)
