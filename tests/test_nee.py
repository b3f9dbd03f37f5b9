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
        return inverse.render_loss(
            p, scene, camera, target, spp=4, max_bounces=3,
            background=bg, seed=jnp.uint32(13), nee=nee,
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
