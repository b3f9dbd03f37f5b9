"""Compute ops: RNG, intersection, scatter, bounce loop, tonemap, BVH."""
