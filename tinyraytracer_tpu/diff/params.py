"""Partition a SceneArrays into differentiable params vs fixed structure.

The north-star capability (BASELINE.json): gradients flow from pixels to
sphere centers/radii, quad corner/edge vectors, and material albedo/fuzz/IOR.
Those are exactly the float leaves of SceneArrays; the int/bool leaves
(material ids, kind codes, validity masks) are discrete structure that
`jax.grad` must not see as differentiable inputs.
"""

from __future__ import annotations

from typing import Dict

import jax

from tinyraytracer_tpu.models.world import SceneArrays

# Differentiable scene-parameter fields (all f32).
FLOAT_FIELDS = (
    "sph_center",
    "sph_radius",
    "quad_corner",
    "quad_u",
    "quad_v",
    "mat_albedo",
    "mat_fuzz",
    "mat_ior",
    "mat_emit",
)

Params = Dict[str, jax.Array]


def scene_params(scene: SceneArrays) -> Params:
    """Extract the differentiable parameter pytree from a scene."""
    return {f: getattr(scene, f) for f in FLOAT_FIELDS}


def apply_params(scene: SceneArrays, params: Params) -> SceneArrays:
    """Rebuild a scene with `params` grafted over the template's floats."""
    return scene.replace(**params)
