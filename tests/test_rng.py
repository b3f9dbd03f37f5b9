"""RNG tests: determinism, uniformity, sampler distributions.

The reference RNG is unseedable thread_rng (utils/random.rs:15-18) so it has
no tests; ours is counter-based and fully testable."""

import jax.numpy as jnp
import numpy as np

from tinyraytracer_tpu.ops import rng


def test_deterministic_and_seed_sensitive():
    pid = jnp.arange(1000, dtype=jnp.uint32)
    a = rng.uniform4(jnp.uint32(1), pid, jnp.uint32(0), jnp.uint32(0))
    b = rng.uniform4(jnp.uint32(1), pid, jnp.uint32(0), jnp.uint32(0))
    c = rng.uniform4(jnp.uint32(2), pid, jnp.uint32(0), jnp.uint32(0))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))


def test_uniform_range_and_moments():
    pid = jnp.arange(200_000, dtype=jnp.uint32)
    u1, u2, u3, u4 = rng.uniform4(jnp.uint32(42), pid, jnp.uint32(3), jnp.uint32(5))
    for u in (u1, u2, u3, u4):
        u = np.asarray(u)
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 2e-3
        assert abs(u.var() - 1.0 / 12.0) < 2e-3


def test_streams_decorrelated():
    pid = jnp.arange(100_000, dtype=jnp.uint32)
    a = np.asarray(rng.uniform4(jnp.uint32(0), pid, jnp.uint32(0), jnp.uint32(0))[0])
    b = np.asarray(rng.uniform4(jnp.uint32(0), pid, jnp.uint32(0), jnp.uint32(1))[0])
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.01


def test_unit_sphere_sampler():
    pid = jnp.arange(100_000, dtype=jnp.uint32)
    u1, u2, u3, _ = rng.uniform4(jnp.uint32(9), pid, jnp.uint32(0), jnp.uint32(0))
    v = np.asarray(rng.uniform_in_unit_sphere(u1, u2, u3))
    r = np.linalg.norm(v, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    # uniform in ball: E[r] = 3/4, mean position = 0
    assert abs(r.mean() - 0.75) < 5e-3
    assert np.abs(v.mean(axis=0)).max() < 5e-3
    # r^3 should be uniform -> E[r^3] = 0.5
    assert abs((r**3).mean() - 0.5) < 5e-3


def test_unit_vector_sampler():
    pid = jnp.arange(100_000, dtype=jnp.uint32)
    u1, u2, _, _ = rng.uniform4(jnp.uint32(10), pid, jnp.uint32(0), jnp.uint32(0))
    v = np.asarray(rng.uniform_unit_vector(u1, u2))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert np.abs(v.mean(axis=0)).max() < 5e-3
    # each component of a uniform sphere direction has variance 1/3
    assert np.abs(v.var(axis=0) - 1.0 / 3.0).max() < 5e-3


def test_unit_disk_sampler():
    pid = jnp.arange(100_000, dtype=jnp.uint32)
    u1, u2, _, _ = rng.uniform4(jnp.uint32(11), pid, jnp.uint32(0), jnp.uint32(0))
    p = np.asarray(rng.uniform_in_unit_disk(u1, u2))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    # uniform disk: E[r] = 2/3, E[r^2] = 1/2
    assert abs(r.mean() - 2.0 / 3.0) < 5e-3
    assert abs((r**2).mean() - 0.5) < 5e-3
