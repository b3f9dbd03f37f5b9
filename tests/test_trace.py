"""Bounce-loop semantics tests, pinning the exact rules of the reference's
hot loop (sampler/cpu.rs:39-65): emission accumulation, background on miss,
absorption, and the no-background-on-budget-exhaustion rule."""

import jax
import jax.numpy as jnp
import numpy as np

from tinyraytracer_tpu.models.geometry import Quad, Sphere
from tinyraytracer_tpu.models.materials import Lambertian, Light, Metal
from tinyraytracer_tpu.models.world import World
from tinyraytracer_tpu.ops.trace import trace


def _trace(scene, o, d, max_bounces, background, n=None, seed=0):
    o = jnp.asarray(o, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(d, jnp.float32).reshape(-1, 3)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pid = jnp.arange(o.shape[0], dtype=jnp.uint32)
    return np.asarray(
        trace(
            scene,
            o,
            d,
            pid,
            jnp.uint32(0),
            jnp.uint32(seed),
            max_bounces,
            jnp.asarray(background, jnp.float32),
        )
    )


def test_miss_returns_background():
    w = World()
    w.add_material("m", Lambertian((0.5, 0.5, 0.5)))
    w.add_geometry(Sphere((0, 0, -10), 0.5, "m"))
    scene = w.build()
    c = _trace(scene, [0, 0, 0], [0, 1, 0], 5, (0.2, 0.4, 0.6))
    np.testing.assert_allclose(c[0], [0.2, 0.4, 0.6], atol=1e-6)


def test_direct_light_hit_emission_only():
    """Hitting a Light returns exactly its emission: scatter=None absorbs
    (light.rs:17-19, cpu.rs:55-57) — no background is added after."""
    w = World()
    w.add_material("lamp", Light((3.0, 2.0, 1.0)))
    w.add_geometry(Quad((-1, -1, -1), (2, 0, 0), (0, 2, 0), "lamp"))
    scene = w.build()
    c = _trace(scene, [0, 0, 0], [0, 0, -1], 5, (9.0, 9.0, 9.0))
    np.testing.assert_allclose(c[0], [3.0, 2.0, 1.0], atol=1e-6)


def test_one_diffuse_bounce_to_background():
    """Lambertian bounce then miss: color = albedo * background."""
    w = World()
    w.add_material("m", Lambertian((0.5, 0.25, 1.0)))
    w.add_geometry(Quad((-100, 0, -100), (0, 0, 200), (200, 0, 0), "m"))
    scene = w.build()
    # one bounce off the plane (normal +y) then guaranteed miss upward
    c = _trace(scene, [0, 1, 0], [0, -1, 0], 5, (1.0, 1.0, 1.0), seed=0)
    np.testing.assert_allclose(c[0], [0.5, 0.25, 1.0], atol=1e-5)


def test_budget_exhaustion_adds_no_background():
    """Two parallel mirrors: the ray never escapes; after max_bounces the
    contribution is zero, NOT throughput*background (cpu.rs:47-62)."""
    w = World()
    w.add_material("mirror", Metal((0.9, 0.9, 0.9), 0.0))
    w.add_geometry(Quad((-10, 0, -10), (0, 0, 20), (20, 0, 0), "mirror"))   # n=+y
    w.add_geometry(Quad((-10, 2, -10), (20, 0, 0), (0, 0, 20), "mirror"))   # n=-y
    scene = w.build()
    c = _trace(scene, [0, 1, 0], [0, -1, 0], 6, (5.0, 5.0, 5.0))
    np.testing.assert_allclose(c[0], [0.0, 0.0, 0.0], atol=1e-6)


def test_throughput_attenuation_two_mirror_bounces():
    """Mirror floor then mirror wall then escape: throughput multiplies."""
    w = World()
    w.add_material("m1", Metal((0.8, 0.5, 0.2), 0.0))
    w.add_geometry(Quad((-10, 0, -10), (0, 0, 20), (20, 0, 0), "m1"))  # floor n=+y
    scene = w.build()
    # 45-degree ray bounces once off the floor then flies away
    c = _trace(scene, [-1, 1, 0], [1, -1, 0], 6, (1.0, 1.0, 1.0))
    np.testing.assert_allclose(c[0], [0.8, 0.5, 0.2], atol=1e-5)
    # two diffuse-free mirror hits multiply attenuations: add a far wall
    w2 = World()
    w2.add_material("m1", Metal((0.8, 0.5, 0.2), 0.0))
    w2.add_material("m2", Metal((0.5, 0.5, 0.5), 0.0))
    w2.add_geometry(Quad((-10, 0, -10), (0, 0, 20), (20, 0, 0), "m1"))
    w2.add_geometry(Quad((5, -10, -10), (0, 20, 0), (0, 0, 20), "m2"))  # x=5 wall n=-x... orientation irrelevant for mirror
    scene2 = w2.build()
    c2 = _trace(scene2, [-1, 1, 0], [1, -1, 0], 6, (1.0, 1.0, 1.0))
    np.testing.assert_allclose(c2[0], [0.8 * 0.5, 0.5 * 0.5, 0.2 * 0.5], atol=1e-5)


def test_emission_weighted_by_throughput():
    """Mirror bounce into a light: color = mirror_albedo * emission."""
    w = World()
    w.add_material("mirror", Metal((0.5, 0.5, 0.5), 0.0))
    w.add_material("lamp", Light((4.0, 4.0, 4.0)))
    w.add_geometry(Quad((-10, 0, -10), (0, 0, 20), (20, 0, 0), "mirror"))
    w.add_geometry(Quad((5, -10, -10), (0, 20, 0), (0, 0, 20), "lamp"))
    scene = w.build()
    c = _trace(scene, [-1, 1, 0], [1, -1, 0], 6, (0.0, 0.0, 0.0))
    np.testing.assert_allclose(c[0], [2.0, 2.0, 2.0], atol=1e-5)


def test_trace_is_jittable_and_deterministic():
    w = World()
    w.add_material("m", Lambertian((0.7, 0.7, 0.7)))
    w.add_geometry(Sphere((0, 0, -2), 0.5, "m"))
    scene = w.build()
    o = jnp.zeros((64, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (64, 1))
    pid = jnp.arange(64, dtype=jnp.uint32)
    f = jax.jit(lambda s, o, d: trace(s, o, d, pid, jnp.uint32(0), jnp.uint32(5), 4, jnp.zeros(3)))
    a = np.asarray(f(scene, o, d))
    b = np.asarray(f(scene, o, d))
    np.testing.assert_array_equal(a, b)
