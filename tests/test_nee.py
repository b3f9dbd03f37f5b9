"""Next-event estimation: forward consistency + geometry gradients.

The NEE integrator must estimate the same image as the reference-semantics
unidirectional path (it is the same transport, re-weighted), with much
lower variance near small lights — and it is the path that makes geometry
gradients nonzero at all (ops/trace.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyraytracer_tpu.diff import inverse
from tinyraytracer_tpu.diff.params import scene_params
from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.ops import trace as trace_ops


@pytest.fixture(scope="module")
def cornell():
    world, camera, kw = presets.cornell_spheres(width=24, height=24)
    return world.build(), camera, jnp.asarray(kw["background"], jnp.float32)


def test_nee_matches_base_estimator(cornell):
    scene, camera, bg = cornell
    base = trace_ops.render_image(
        scene, camera, spp=96, max_bounces=4, background=bg, seed=5
    )
    nee = trace_ops.render_image(
        scene, camera, spp=96, max_bounces=4, background=bg, seed=5, nee=True
    )
    # Means agree within the base estimator's MC error at this spp.
    b, n = np.asarray(base).mean(), np.asarray(nee).mean()
    assert abs(b - n) / b < 0.05, (b, n)


def test_nee_reduces_variance(cornell):
    """Between-seed pixel variance under NEE must be well below the base
    estimator's (the point of explicit light sampling)."""
    scene, camera, bg = cornell

    def imgs(nee):
        return np.stack([
            np.asarray(trace_ops.render_image(
                scene, camera, spp=4, max_bounces=4, background=bg,
                seed=s, nee=nee,
            ))
            for s in range(4)
        ])

    var_base = imgs(False).var(axis=0).mean()
    var_nee = imgs(True).var(axis=0).mean()
    # ~45% reduction on this scene (its light is large; small-light scenes
    # gain much more) — assert a solid margin below parity.
    assert var_nee < 0.7 * var_base, (var_base, var_nee)


@pytest.mark.heavy
def test_nee_geometry_gradient_matches_fd_boundary_free():
    """On a scene with no visibility boundary in view (camera staring at a
    wall-filling sphere lit by an overhead quad light), the NEE interior
    estimator is the *complete* derivative, so analytic geometry gradients
    must match central finite differences tightly."""
    from tinyraytracer_tpu.models.camera import Camera
    from tinyraytracer_tpu.models.geometry import Quad, Sphere
    from tinyraytracer_tpu.models.materials import Lambertian, Light
    from tinyraytracer_tpu.models.world import World

    world = World()
    world.add_material("ground", Lambertian((0.5, 0.6, 0.7)))
    world.add_material("lamp", Light((10.0, 10.0, 10.0)))
    world.add_geometry(Sphere((0.0, -100.0, 0.0), 100.0, "ground"))
    world.add_geometry(Quad((-2.0, 6.0, -2.0), (4.0, 0.0, 0.0),
                            (0.0, 0.0, 4.0), "lamp"))
    camera = Camera.new(1.0, 0.0, (0.0, 3.0, 0.0), (0.0, 0.0, 0.001),
                        (0.0, 0.0, 1.0), 50.0, 12, 10)
    scene = world.build()
    bg = jnp.asarray((0.0, 0.0, 0.0), jnp.float32)
    target = jnp.zeros((10, 12, 3), jnp.float32)

    def loss_wrt(field, idx, v):
        arr = getattr(scene, field).at[idx].set(v)
        return inverse.render_loss(
            {**scene_params(scene), field: arr}, scene, camera, target,
            spp=4, max_bounces=2, background=bg, seed=jnp.uint32(3), nee=True,
        )

    s_row = int(np.nonzero(np.asarray(scene.sph_valid))[0][0])
    q_row = int(np.nonzero(np.asarray(scene.quad_valid))[0][0])
    for field, idx, eps in (
        ("sph_center", (s_row, 1), 5e-2),
        ("sph_radius", (s_row,), 5e-2),
        # Light-quad vertices (north star: "quad vertices"): the NEE
        # contribution is smooth in the emitter's corner (distance/
        # direction) and edge vectors (area + sample positions + cos θy).
        ("quad_corner", (q_row, 1), 5e-2),
        ("quad_u", (q_row, 0), 5e-2),
        ("quad_v", (q_row, 2), 5e-2),
    ):
        v0 = getattr(scene, field)[idx]
        g = float(jax.grad(lambda v: loss_wrt(field, idx, v))(v0))
        fd = (float(loss_wrt(field, idx, v0 + eps))
              - float(loss_wrt(field, idx, v0 - eps))) / (2 * eps)
        assert np.isfinite(g) and abs(fd) > 1e-6, (field, g, fd)
        assert abs(g - fd) <= 0.08 * abs(fd), (field, g, fd)


def test_nee_sphere_light_unbiased():
    """NEE samples only quad lights; emission from a *sphere*-shaped Light
    reached via a diffuse bounce must therefore still be counted at the hit
    (the emission skip is restricted to NEE-sampled lights). A diffuse
    scene lit solely by a sphere light must agree between nee=True and
    nee=False within MC error."""
    from tinyraytracer_tpu.models.camera import Camera
    from tinyraytracer_tpu.models.geometry import Sphere
    from tinyraytracer_tpu.models.materials import Lambertian, Light
    from tinyraytracer_tpu.models.world import World

    world = World()
    world.add_material("ground", Lambertian((0.6, 0.6, 0.6)))
    world.add_material("ball_light", Light((12.0, 12.0, 12.0)))
    world.add_geometry(Sphere((0.0, -100.0, 0.0), 100.0, "ground"))
    world.add_geometry(Sphere((0.0, 3.0, 0.0), 1.5, "ball_light"))
    camera = Camera.new(1.0, 0.0, (0.0, 2.0, -8.0), (0.0, 1.0, 0.0),
                        (0.0, 1.0, 0.0), 45.0, 24, 24)
    scene = world.build()
    bg = jnp.asarray((0.0, 0.0, 0.0), jnp.float32)

    base = trace_ops.render_image(
        scene, camera, spp=128, max_bounces=4, background=bg, seed=11
    )
    nee = trace_ops.render_image(
        scene, camera, spp=128, max_bounces=4, background=bg, seed=11,
        nee=True,
    )
    b, n = float(np.asarray(base).mean()), float(np.asarray(nee).mean())
    assert b > 0.01  # the sphere light actually lights the scene
    assert abs(b - n) / b < 0.05, (b, n)


@pytest.mark.heavy
def test_nee_geometry_gradients_nonzero(cornell):
    """Geometry grads are exactly zero under the base estimator (radiance
    is a product of discretely-selected constants) and finite, nonzero
    under NEE."""
    scene, camera, bg = cornell
    target = trace_ops.render_image(
        scene, camera, spp=8, max_bounces=3, background=bg, seed=7
    )
    params = scene_params(scene)

    def loss(p, nee):
        # silhouette=False isolates the estimators themselves (the
        # silhouette surrogate adds boundary gradients on top of either).
        return inverse.render_loss(
            p, scene, camera, target, spp=4, max_bounces=3,
            background=bg, seed=jnp.uint32(13), nee=nee, silhouette=False,
        )

    g_base = jax.grad(lambda p: loss(p, False))(params)
    g_nee = jax.grad(lambda p: loss(p, True))(params)
    assert float(jnp.abs(g_base["sph_center"]).max()) == 0.0
    gc = np.asarray(g_nee["sph_center"])
    assert np.isfinite(gc).all()
    assert np.abs(gc).max() > 0.0
    # material grads flow under both
    assert float(jnp.abs(g_base["mat_albedo"]).max()) > 0.0
    assert float(jnp.abs(g_nee["mat_albedo"]).max()) > 0.0
