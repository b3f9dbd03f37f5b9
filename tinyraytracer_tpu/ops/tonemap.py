"""Gamma correction and quantization (utils/image.rs:92-110).

The reference applies gamma at set_pixel time (image.rs:38-44) and quantizes
with clamp to [0, 0.999] * 255 at save (image.rs:101-110). Both are pure
elementwise maps, jittable and differentiable (gamma)."""

from __future__ import annotations

import jax.numpy as jnp

GAMMA = 2.2  # renderer/imager.rs:40
INTENSITY_MAX = 0.999  # image.rs:104


def gamma_correct(img, gamma: float = GAMMA):
    """c^(1/gamma), with negatives clamped (radiance is non-negative;
    the clamp keeps gradients NaN-free at 0)."""
    return jnp.maximum(img, 0.0) ** (1.0 / gamma)


def to_u8(img_gamma):
    """Quantize gamma-corrected floats to u8 with the reference's clamp
    (image.rs:101-110; Rust `as u8` truncates, as does astype)."""
    return (jnp.clip(img_gamma, 0.0, INTENSITY_MAX) * 255.0).astype(jnp.uint8)
