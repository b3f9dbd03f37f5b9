"""BVH build + traversal vs the brute-force oracle.

The reference author validated their BVH manually against a brute-force
render (raytracer/output/bruteforce.png); here the equivalence is an
automated gate (SURVEY.md §4/§7 phase 6-7): identical hits, identical
materials, near-identical t, identical gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.models.camera import generate_rays
from tinyraytracer_tpu.ops import bvh as bvh_ops
from tinyraytracer_tpu.ops import intersect as isect


def _scene_rays(name, **kwargs):
    world, camera, kw = presets.PRESETS[name](width=32, height=24, **kwargs)
    scene = world.build()
    pid = jnp.arange(32 * 24, dtype=jnp.uint32)
    o, d = generate_rays(camera, pid, jnp.uint32(0), jnp.uint32(3))
    return scene, o, d


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("cornell_box", {}),
        ("three_spheres", {}),
        ("random_spheres", {"n": 64}),
    ],
)
def test_bvh_matches_bruteforce(name, kwargs):
    scene, o, d = _scene_rays(name, **kwargs)
    bvh = bvh_ops.build_bvh(scene)
    rec_bf = isect.intersect_scene(scene, o, d, exact=True)
    rec_bv = jax.jit(bvh_ops.intersect_scene_bvh)(scene, bvh, o, d)
    np.testing.assert_array_equal(np.asarray(rec_bf.hit), np.asarray(rec_bv.hit))
    hit = np.asarray(rec_bf.hit)
    # Where two surfaces nearly coincide along the ray (tangent contact
    # points, e.g. spheres resting on the big ground sphere), the winner is
    # ambiguous at f32 precision and the two formulas may legitimately
    # disagree; t stays within 1e-4 there. Everywhere else (the vast
    # majority) the winner — and hence every record field — must agree.
    np.testing.assert_allclose(
        np.asarray(rec_bf.t)[hit], np.asarray(rec_bv.t)[hit], rtol=1e-4, atol=1e-4
    )
    ts = isect.sphere_ts(scene, o, d, isect.T_MIN, isect.MISS_T, exact=True)
    tq = isect.quad_ts(scene, o, d, isect.T_MIN, isect.MISS_T)
    j_bf = np.asarray(jnp.argmin(jnp.concatenate([ts, tq], axis=1), axis=1))
    _, j_bv = bvh_ops.traverse(scene, bvh, o, d)
    same = hit & (j_bf == np.asarray(j_bv))
    flip_rate = 1.0 - same.sum() / max(hit.sum(), 1)
    assert flip_rate < 0.05, f"too many winner flips: {flip_rate:.2%}"
    np.testing.assert_array_equal(
        np.asarray(rec_bf.mat_kind)[same], np.asarray(rec_bv.mat_kind)[same]
    )
    # Same winner, same prim_t formula — but the two jit graphs may fuse
    # the arithmetic differently, perturbing t by ~1e-4; the sphere normal
    # (point - center)/radius amplifies that by 1/radius (r=0.2 spheres in
    # the random scene -> ~1e-3).
    np.testing.assert_allclose(
        np.asarray(rec_bf.normal)[same],
        np.asarray(rec_bv.normal)[same],
        rtol=2e-3,
        atol=2e-3,
    )


def test_bvh_gradients_match_bruteforce():
    scene, o, d = _scene_rays("cornell_box")
    bvh = bvh_ops.build_bvh(scene)

    def loss(fn, c, u, rad):
        s = scene.replace(sph_center=c, quad_u=u, sph_radius=rad)
        r = fn(s)
        return jnp.sum(jnp.where(r.hit[:, None], r.point * r.albedo, 0.0))

    args = (scene.sph_center, scene.quad_u, scene.sph_radius)
    g_bf = jax.grad(
        lambda *a: loss(lambda s: isect.intersect_scene(s, o, d, exact=True), *a),
        argnums=(0, 1, 2),
    )(*args)
    g_bv = jax.grad(
        lambda *a: loss(lambda s: bvh_ops.intersect_scene_bvh(s, bvh, o, d), *a),
        argnums=(0, 1, 2),
    )(*args)
    for a, b in zip(g_bf, g_bv):
        assert bool(jnp.isfinite(a).all()) and bool(jnp.isfinite(b).all())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_coplanar_tiebreak_matches_argmin():
    """Cornell's light quad is coplanar with the ceiling: ties must resolve
    to the lowest global primitive index in both paths."""
    scene, o, d = _scene_rays("cornell_box")
    bvh = bvh_ops.build_bvh(scene)
    ts = isect.sphere_ts(scene, o, d, isect.T_MIN, isect.MISS_T, exact=True)
    tq = isect.quad_ts(scene, o, d, isect.T_MIN, isect.MISS_T)
    t_all = jnp.concatenate([ts, tq], axis=1)
    j_bf = np.asarray(jnp.argmin(t_all, axis=1))
    hit = np.asarray(jnp.min(t_all, axis=1)) < float(isect.MISS_T)
    _, j_bv = bvh_ops.traverse(scene, bvh, o, d)
    np.testing.assert_array_equal(j_bf[hit], np.asarray(j_bv)[hit])


def test_threaded_layout_wellformed():
    scene, _, _ = _scene_rays("random_spheres", n=64)
    bvh = bvh_ops.build_bvh(scene)
    m = bvh.node_min.shape[0]
    lp = np.asarray(bvh.leaf_prim)
    hl = np.asarray(bvh.hit_link)
    ml = np.asarray(bvh.miss_link)
    n_leaves = int((lp >= 0).sum())
    assert m == 2 * n_leaves - 1
    # Links always advance (DFS order), so traversal terminates.
    assert (hl > np.arange(m)).all()
    assert (ml > np.arange(m)).all()
    assert (ml <= m).all() and (hl <= m).all()
    nm, nx = np.asarray(bvh.node_min), np.asarray(bvh.node_max)
    assert (nm <= nx).all()
    # Every inner node's box contains its left child's box (DFS next).
    inner = lp < 0
    left = np.arange(m) + 1
    li = left[inner]
    assert (nm[inner] <= nm[li] + 1e-6).all()
    assert (nx[inner] >= nx[li] - 1e-6).all()


def test_native_builder_matches_python():
    from tinyraytracer_tpu.native import runtime

    if not runtime.available():
        from tinyraytracer_tpu.native.build import build

        if not build(verbose=False):
            pytest.skip("native toolchain unavailable")
        runtime._TRIED = False  # force re-probe after fresh build
    rng = np.random.default_rng(42)
    n = 101
    c = (rng.random((n, 3)) * 20).astype(np.float32)
    r = rng.random((n,)).astype(np.float32) + 0.05
    bb_min, bb_max = c - r[:, None], c + r[:, None]
    native = runtime.bvh_build(bb_min, bb_max)
    python = bvh_ops._build_host(bb_min, bb_max, np.arange(n, dtype=np.int32))
    for a, b in zip(native, python):
        np.testing.assert_array_equal(a, b)
