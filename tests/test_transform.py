"""Transform/Ray parity units (math/transform.rs:113-167, ray.rs:29-41)."""

import numpy as np

from tinyraytracer_tpu.models.ray import Ray
from tinyraytracer_tpu.models.transform import Transform


def test_translate():
    t = Transform.translate((1.0, 2.0, 3.0))
    np.testing.assert_allclose(
        np.asarray(t.apply([0.0, 0.0, 0.0])), [1.0, 2.0, 3.0], atol=1e-6
    )


def test_scale():
    t = Transform.scale((2.0, 3.0, 4.0))
    np.testing.assert_allclose(
        np.asarray(t.apply([1.0, 1.0, 1.0])), [2.0, 3.0, 4.0], atol=1e-6
    )


def test_rotations():
    np.testing.assert_allclose(
        np.asarray(Transform.rotate_z(90.0).apply([1.0, 0.0, 0.0])),
        [0.0, 1.0, 0.0], atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(Transform.rotate_x(90.0).apply([0.0, 1.0, 0.0])),
        [0.0, 0.0, 1.0], atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(Transform.rotate_y(90.0).apply([0.0, 0.0, 1.0])),
        [1.0, 0.0, 0.0], atol=1e-6,
    )


def test_composite_t_s_r():
    # T.S.R: rotate first, then scale, then translate (transform.rs:20)
    t = Transform.new((1.0, 0.0, 0.0), (2.0, 2.0, 2.0), (0.0, 0.0, 90.0))
    np.testing.assert_allclose(
        np.asarray(t.apply([1.0, 0.0, 0.0])), [1.0, 2.0, 0.0], atol=1e-5
    )


def test_transform_batched_and_vectors():
    t = Transform.translate((5.0, 0.0, 0.0))
    pts = np.zeros((4, 3), np.float32)
    out = np.asarray(t.apply(pts))
    np.testing.assert_allclose(out[:, 0], 5.0)
    # direction unaffected by translation
    np.testing.assert_allclose(
        np.asarray(t.apply_vector([0.0, 1.0, 0.0])), [0.0, 1.0, 0.0]
    )


def test_ray_at_normalizes():
    r = Ray.new([0.0, 0.0, 0.0], [0.0, 3.0, 0.0])  # non-unit input
    np.testing.assert_allclose(
        np.asarray(r.at(np.float32(2.0))), [0.0, 2.0, 0.0], atol=1e-6
    )


def test_world_typed_extraction():
    from tinyraytracer_tpu.models import materials as mat
    from tinyraytracer_tpu.models.geometry import Quad, Sphere, make_box
    from tinyraytracer_tpu.models.materials import Lambertian, Light
    from tinyraytracer_tpu.models.world import World

    w = World()
    w.add_material("a", Lambertian((1, 0, 0)))
    w.add_material("l", Light((5, 5, 5)))
    w.add_geometry(Sphere((0, 0, 0), 1.0, "a"))
    w.add_geometry(make_box((0, 0, 0), (1, 1, 1), "a"))
    assert len(w.get_geometries(Sphere)) == 1
    assert len(w.get_geometries(Quad)) == 6
    assert set(w.get_materials(mat.LAMBERTIAN)) == {"a"}
    assert set(w.get_materials(mat.LIGHT)) == {"l"}
