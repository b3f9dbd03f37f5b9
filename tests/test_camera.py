"""Camera tests, porting the reference's deterministic asserts
(camera.rs:78-105) and adding ray-direction checks."""

import math

import jax.numpy as jnp
import numpy as np

from tinyraytracer_tpu.models.camera import Camera, generate_rays


def _mk(width=16, height=9):
    return Camera.new(
        focus_distance=1.0,
        defocus_angle=10.0,
        position=(0.0, 0.0, 0.0),
        look_at=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0),
        vertical_fov=90.0,
        width=width,
        height=height,
    )


def test_precomputed_frame_matches_reference():
    """camera.rs:78-105: asserts on the precomputed viewport vectors."""
    cam = _mk()
    aspect = 16.0 / 9.0
    np.testing.assert_allclose(np.asarray(cam.position), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cam.viewport_upper_left), [aspect, 1.0, 1.0], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(cam.forward), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cam.horizontal), [-2.0 * aspect, 0, 0], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(cam.vertical), [0, 2.0, 0], atol=1e-6)


def test_center_ray_points_at_look_at():
    cam = Camera.new(
        focus_distance=3.4,
        defocus_angle=0.0,
        position=(-2.0, 2.0, 1.0),
        look_at=(0.0, 0.0, -1.0),
        up=(0.0, 1.0, 0.0),
        vertical_fov=20.0,
        width=400,
        height=300,
    )
    u = jnp.array([0.5])
    v = jnp.array([0.5])
    disk = jnp.zeros((1, 2))
    o, d = cam.get_ray(u, v, disk)
    np.testing.assert_allclose(np.asarray(o[0]), [-2, 2, 1], atol=1e-6)
    expect = np.array([0.0, 0.0, -1.0]) - np.array([-2.0, 2.0, 1.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(np.asarray(d[0]), expect, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d[0])), 1.0, atol=1e-6)


def test_v_axis_flipped_upper_left_origin():
    """v=0 is the TOP of the image (camera.rs:63-64 subtracts v*vertical)."""
    cam = _mk()
    disk = jnp.zeros((2, 2))
    o, d = cam.get_ray(jnp.array([0.5, 0.5]), jnp.array([0.0, 1.0]), disk)
    d = np.asarray(d)
    assert d[0][1] > d[1][1]  # top ray points higher (+y) than bottom ray


def test_generate_rays_shapes_and_determinism():
    cam = _mk(8, 4)
    pid = jnp.arange(32, dtype=jnp.uint32)
    o1, d1 = generate_rays(cam, pid, jnp.uint32(0), jnp.uint32(7))
    o2, d2 = generate_rays(cam, pid, jnp.uint32(0), jnp.uint32(7))
    assert o1.shape == (32, 3) and d1.shape == (32, 3)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d1), axis=-1), 1.0, atol=1e-5
    )
    # different sample id -> different jitter
    o3, _ = generate_rays(cam, pid, jnp.uint32(1), jnp.uint32(7))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


def test_defocus_disk_origin_spread():
    cam = _mk()
    pid = jnp.arange(4096, dtype=jnp.uint32)
    o, _ = generate_rays(cam, pid, jnp.uint32(0), jnp.uint32(0))
    o = np.asarray(o)
    radius = 1.0 * math.tan(math.radians(10.0) / 2.0)
    dist = np.linalg.norm(o, axis=-1)
    assert dist.max() <= radius + 1e-5
    assert dist.max() > 0.5 * radius  # blur actually applied
