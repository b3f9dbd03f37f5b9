"""VPU throughput microbenchmark (VERDICT r4 #2).

utils/sol.py divides hand-audited op counts by the v5e spec sheet's
3.85 Tops/s f32 VPU peak; the Cornell forward then reads 0.278 of
"speed of light", and nobody knows whether the missing 3.6x is kernel
inefficiency or an unreachable denominator. This probe measures what the
VPU ACTUALLY sustains on (32, 256) packed tiles (the forward packed
kernel's layout) for op mixes stepping from pure independent FMAs to the
exact sphere-candidate-test sequence the sol.py model counts as "14 ops".

Each kernel is a fori_loop of `ITERS` iterations over a resident tile;
op counts per iteration are exact by construction. Grid sized so each
run is ~0.3-1 s. Prints one JSON line with Tops/s per mix.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

S, L = 32, 256
ITERS = 2000
GRID = 512


def run_mix(name, body_fn, ops_per_iter, extra_iters=1):
    """body_fn(x, y, z) -> (x, y, z); ops_per_iter exact VPU op count."""

    def kernel(a_ref, o_ref):
        x = a_ref[...]
        y = x * 1.0000001
        z = x * 0.9999999

        def body(i, st):
            x, y, z = st
            for _ in range(extra_iters):
                x, y, z = body_fn(x, y, z)
            return (x, y, z)

        x, y, z = jax.lax.fori_loop(0, ITERS, body, (x, y, z))
        o_ref[...] = x + y + z

    @jax.jit
    def run(a):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((S, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((S, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        )(a)

    a = jnp.ones((S, L), jnp.float32) * 0.5
    run(a).block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(a)).sum()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    total_ops = S * L * ITERS * extra_iters * ops_per_iter * GRID
    return round(total_ops / dt / 1e12, 3), round(dt, 4)


def main():
    out = {"device": jax.devices()[0].platform,
           "tile": f"{S}x{L}", "spec_peak_tops": 3.85}

    # 1. independent FMAs (three parallel chains): the absolute ceiling
    def fma3(x, y, z):
        x = x * 1.0000001 + 0.1
        y = y * 0.9999999 + 0.1
        z = z * 1.0000002 + 0.1
        return x, y, z

    out["fma_tops"], out["fma_s"] = run_mix("fma", fma3, 6, 4)

    # 2. compare+select mix (the winner-fold op class)
    def selmix(x, y, z):
        c = x < y                 # 1
        x = jnp.where(c, x * 1.0000001 + 0.1, y)   # 2 (fma) + 1 (sel)
        y = jnp.maximum(y * 0.9999999, z)          # 1 (mul) + 1 (max)
        z = z + 0.0000001                          # 1
        return x, y, z

    out["select_tops"], out["select_s"] = run_mix("select", selmix, 7, 4)

    # 3. the EXACT sphere candidate test sol.py counts as 14 ops/row
    #    (oc precomputed here as x,y,z stand-ins; counts follow the
    #    audited list: 3 fma half_b, 3 fma + 1 sub c_term, 2 disc,
    #    1 sqrt-max, 2 roots, 2 compares + 2 selects = 14, + 2 fold)
    def sphere(x, y, z):
        half_b = x * 0.3 + y * 0.5 + z * 0.2           # 5 (2 fma + mul)
        c_term = x * x + y * y + z * z - 0.25          # 6
        disc = half_b * half_b - c_term                # 2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))          # 2 (sqrt, max)
        t0 = -half_b - sq                              # 2
        t1 = -half_b + sq                              # 1
        ts = jnp.where(t0 >= 1e-3, t0,
                       jnp.where(t1 >= 1e-3, t1, 3.0e38))  # 4
        ts = jnp.where(disc >= 0.0, ts, 3.0e38)        # 2
        x = jnp.minimum(ts, x + 1.0)                   # 2 (fold)
        return x, y, z

    # audited count for this block: 24 actual scalar ops (the sol.py
    # "14" counts fused fma as 1 and omits the negations)
    out["sphere_tops"], out["sphere_s"] = run_mix("sphere", sphere, 24, 2)
    out["sphere_ops_equiv_14"] = round(
        out["sphere_tops"] * 14.0 / 24.0, 3)

    # 4. transcendental-heavy (shade-chain class: rsqrt, divide, exp/log)
    def transc(x, y, z):
        x = jax.lax.rsqrt(jnp.maximum(x * x + 0.1, 1e-6))   # 4
        y = (y + 1.2) / (x + 2.5)                           # 2
        z = jnp.exp(jnp.log(jnp.maximum(z + 1.5, 1e-6)) * (1.0 / 3.0))  # 4
        return x, y, z

    out["transcendental_tops"], out["transcendental_s"] = run_mix(
        "transc", transc, 10, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
