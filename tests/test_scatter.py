"""Material scatter tests: optics math (reflect/refract/Schlick) against
hand values, plus distributional checks per material kind — coverage the
reference lacks entirely (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from tinyraytracer_tpu.models.geometry import Quad, Sphere
from tinyraytracer_tpu.models.materials import (
    Dielectric,
    Lambertian,
    Light,
    Metal,
)
from tinyraytracer_tpu.models.world import World
from tinyraytracer_tpu.ops import intersect as isect
from tinyraytracer_tpu.ops.scatter import reflect, refract, scatter


def test_reflect_hand_values():
    d = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2.0)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = np.asarray(reflect(d, n))
    np.testing.assert_allclose(r[0], np.array([1.0, 1.0, 0.0]) / np.sqrt(2.0), atol=1e-6)


def test_refract_snell_angle():
    """30 degrees in, eta = 1/1.5: sin(theta_t) = sin(30)/1.5."""
    theta_i = np.radians(30.0)
    d = jnp.asarray([[np.sin(theta_i), -np.cos(theta_i), 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    eta = jnp.asarray([[1.0 / 1.5]], jnp.float32)
    out = np.asarray(refract(d, n, eta))[0]
    sin_t = np.sin(theta_i) / 1.5
    np.testing.assert_allclose(out[0], sin_t, atol=1e-6)
    np.testing.assert_allclose(out[1], -np.sqrt(1.0 - sin_t**2), atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-6)


def _scatter_on(material, name="m", d_in=(0.0, -1.0, 0.0), n_rays=20000, seed=0):
    """Hit a big quad at y=0 straight on with `material` and scatter."""
    w = World()
    w.add_material(name, material)
    # u x v = +y: outward normal faces the rays coming from above
    w.add_geometry(Quad((-50.0, 0.0, -50.0), (0, 0, 100), (100, 0, 0), name))
    scene = w.build()
    o = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n_rays, 1))
    d = jnp.tile(jnp.asarray([d_in], jnp.float32), (n_rays, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rec = isect.intersect_scene(scene, o, d)
    assert bool(np.asarray(rec.hit).all())
    pid = jnp.arange(n_rays, dtype=jnp.uint32)
    return rec, scatter(d, rec, jnp.uint32(seed), pid, jnp.uint32(0), jnp.uint32(0))


def test_lambertian_cosine_distribution():
    """dir = n + unit_vector gives a cosine-weighted hemisphere: E[dir.n]
    over the *unnormalized* sum is 1, and after normalization E[cos] = 2/3
    ... statistically: all directions in upper hemisphere, mean cos ~ 2/3."""
    rec, (new_d, att, absorbed) = _scatter_on(Lambertian((0.3, 0.4, 0.5)))
    nd = np.asarray(new_d)
    cos = nd @ np.array([0.0, 1.0, 0.0])
    assert (cos > -1e-6).all()
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01
    np.testing.assert_allclose(np.asarray(att)[0], [0.3, 0.4, 0.5], atol=1e-6)
    assert not np.asarray(absorbed).any()


def test_metal_zero_fuzz_exact_reflection():
    d_in = np.array([1.0, -1.0, 0.0]) / np.sqrt(2.0)
    rec, (new_d, att, absorbed) = _scatter_on(
        Metal((0.8, 0.8, 0.8), 0.0), d_in=tuple(d_in)
    )
    expect = np.array([1.0, 1.0, 0.0]) / np.sqrt(2.0)
    nd = np.asarray(new_d)
    np.testing.assert_allclose(nd[0], expect, atol=1e-5)
    assert np.abs(nd - nd[0:1]).max() < 1e-5  # fuzz=0: all rays identical
    assert not np.asarray(absorbed).any()


def test_metal_fuzz_spread_bounded():
    """fuzz=0.3: scattered dirs lie within asin-ish cone around the mirror
    direction; spread grows with fuzz but stays within fuzz radius."""
    d_in = np.array([1.0, -1.0, 0.0]) / np.sqrt(2.0)
    _, (new_d, _, _) = _scatter_on(Metal((0.8, 0.8, 0.8), 0.3), d_in=tuple(d_in))
    mirror = np.array([1.0, 1.0, 0.0]) / np.sqrt(2.0)
    cos = np.asarray(new_d) @ mirror
    # |offset| <= fuzz -> angle <= asin(0.3) ~ 0.3047 rad
    assert cos.min() > np.cos(np.arcsin(0.3) + 1e-3)
    assert cos.mean() < 1.0 - 1e-4  # actually spread out


def test_dielectric_tir_always_reflects():
    """Hit from inside glass (front_face False -> eta=1.5) at a grazing
    angle beyond the critical angle: every ray must reflect."""
    # sphere of glass, ray from inside hitting at steep angle
    w = World()
    w.add_material("glass", Dielectric((1.0, 1.0, 1.0), 1.5))
    w.add_geometry(Quad((-50.0, 0.0, -50.0), (0, 0, 100), (100, 0, 0), "glass"))
    scene = w.build()
    n_rays = 4096
    # coming from BELOW the quad (inside medium), 80 deg from normal
    theta = np.radians(80.0)
    d_in = np.array([np.sin(theta), np.cos(theta), 0.0])
    o = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n_rays, 1))
    d = jnp.tile(jnp.asarray([d_in], jnp.float32), (n_rays, 1))
    rec = isect.intersect_scene(scene, o, d)
    assert bool(np.asarray(rec.hit).all())
    assert not bool(np.asarray(rec.front_face).any())
    pid = jnp.arange(n_rays, dtype=jnp.uint32)
    new_d, _, _ = scatter(d, rec, jnp.uint32(0), pid, jnp.uint32(0), jnp.uint32(0))
    # reflected: y component flips sign (stays below the surface)
    assert (np.asarray(new_d)[:, 1] < 0).all()


def test_dielectric_normal_incidence_schlick_rate():
    """Normal incidence, eta=1/1.5: Schlick r0 = ((1-eta)/(1+eta))^2 = 0.04;
    ~4% of rays reflect."""
    _, (new_d, att, absorbed) = _scatter_on(
        Dielectric((1.0, 1.0, 1.0), 1.5), n_rays=100_000
    )
    frac_reflected = (np.asarray(new_d)[:, 1] > 0).mean()
    assert abs(frac_reflected - 0.04) < 0.005
    assert not np.asarray(absorbed).any()


def test_light_absorbs():
    _, (new_d, att, absorbed) = _scatter_on(Light((5.0, 5.0, 5.0)), n_rays=16)
    assert np.asarray(absorbed).all()
