"""Test (R,3) vs (3,R) vs component-(R,) elementwise bandwidth on TPU. (scratch)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
R = 360_000
K = 40  # chained pseudo-bounce iterations

def chain_r3(a, b):
    def body(i, ab):
        a, b = ab
        c = a * b + 1.0
        d = jnp.where(c > 0.5, c, a)
        n = d / jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1, keepdims=True), 1e-9))
        return (n, c)
    return jax.lax.fori_loop(0, K, body, (a, b))[0]

def chain_3r(a, b):
    def body(i, ab):
        a, b = ab
        c = a * b + 1.0
        d = jnp.where(c > 0.5, c, a)
        n = d / jnp.sqrt(jnp.maximum(jnp.sum(d * d, 0, keepdims=True), 1e-9))
        return (n, c)
    return jax.lax.fori_loop(0, K, body, (a, b))[0]

def chain_comp(ax, ay, az, bx, by, bz):
    def body(i, st):
        ax, ay, az, bx, by, bz = st
        cx, cy, cz = ax * bx + 1.0, ay * by + 1.0, az * bz + 1.0
        dx = jnp.where(cx > 0.5, cx, ax)
        dy = jnp.where(cy > 0.5, cy, ay)
        dz = jnp.where(cz > 0.5, cz, az)
        inv = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-9))
        return (dx * inv, dy * inv, dz * inv, cx, cy, cz)
    return jax.lax.fori_loop(0, K, body, st := (ax, ay, az, bx, by, bz))[0]

key = jax.random.PRNGKey(0)
a3 = jax.random.normal(key, (R, 3)); b3 = a3 + 0.1
a3t = a3.T.copy(); b3t = b3.T.copy()
comps = tuple(a3[:, i].copy() for i in range(3)) + tuple(b3[:, i].copy() for i in range(3))

for name, f, args in [
    ("(R,3) rows", jax.jit(chain_r3), (a3, b3)),
    ("(3,R) cols", jax.jit(chain_3r), (a3t, b3t)),
    ("(R,) comps", jax.jit(chain_comp), comps),
]:
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/K*1e3:7.3f} ms/iter", flush=True)
