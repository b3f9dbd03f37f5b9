"""Differentiable rendering: scene-parameter gradients, inverse rendering."""
