"""Fused differentiable kernel vs the modular autodiff oracle.

ops/diffkernel.py evaluates the training objective (NEE + silhouette
estimator, MSE loss) and its gradients w.r.t. every scene parameter with a
hand-derived in-kernel backward. These tests pin it against
jax.value_and_grad of the modular path (identical estimator + RNG streams):
loss must match to float roundoff and every gradient field to small
relative error. Run in interpret mode (kernel semantics on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Whole module: interpret-mode fused-kernel parity — the heavy tier
# (VERDICT r3 #8). Fast tier: pytest -m 'not heavy'.
pytestmark = pytest.mark.heavy

from tinyraytracer_tpu.diff import inverse
from tinyraytracer_tpu.diff.params import scene_params
from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.models.camera import Camera
from tinyraytracer_tpu.models.geometry import Quad, Sphere
from tinyraytracer_tpu.models.materials import (
    Dielectric,
    Lambertian,
    Light,
    Metal,
)
from tinyraytracer_tpu.models.world import World
from tinyraytracer_tpu.ops import trace as trace_ops
from tinyraytracer_tpu.ops.diffkernel import render_value_and_grad

GRAD_FIELDS = (
    "sph_center", "sph_radius", "quad_corner", "quad_u", "quad_v",
    "mat_albedo", "mat_fuzz", "mat_ior", "mat_emit",
)


def _mixed_world():
    """Lit scene exercising every gradient chain (metal fuzz, dielectric
    ior, quad-light geometry, sphere silhouettes, soft shadows)."""
    w = World()
    w.add_material("ground", Lambertian((0.6, 0.5, 0.4)))
    w.add_material("met", Metal((0.8, 0.8, 0.9), 0.3))
    w.add_material("glass", Dielectric((0.95, 0.95, 0.95), 1.5))
    w.add_material("lamp", Light((10.0, 10.0, 10.0)))
    w.add_geometry(Sphere((0.0, -100.5, -1.0), 100.0, "ground"))
    w.add_geometry(Sphere((-0.7, 0.0, -1.2), 0.5, "met"))
    w.add_geometry(Sphere((0.7, 0.0, -1.2), 0.5, "glass"))
    w.add_geometry(Quad((-1.5, 2.0, -2.5), (3.0, 0.0, 0.0),
                        (0.0, 0.0, 2.0), "lamp"))
    cam = Camera.new(1.0, 0.0, (0.0, 0.3, 1.0), (0.0, 0.0, -1.0),
                     (0.0, 1.0, 0.0), 60.0, 32, 24)
    return w.build(), cam, (0.05, 0.06, 0.08)


def _compare(scene, cam, bg, spp=2, mb=4, rtol=5e-3):
    # rtol covers fp reassociation plus the occasional winner-tie flip
    # between the kernel's and the dense path's screening formulas (a
    # single flipped ray among R shifts a gradient by ~1/R relative).
    bg = jnp.asarray(bg, jnp.float32)
    target = trace_ops.render_image(
        scene, cam, spp=4, max_bounces=mb, background=bg, seed=9, nee=True
    )
    params = scene_params(scene)
    loss_o, grads_o = jax.value_and_grad(inverse.render_loss)(
        params, scene, cam, target, spp=spp, max_bounces=mb,
        background=bg, seed=jnp.uint32(0), nee=True, silhouette=True,
    )
    loss_k, img_k, grads_k = render_value_and_grad(
        scene, cam, target, spp=spp, max_bounces=mb, background=bg,
        seed=0, interpret=True,
    )
    assert abs(float(loss_o) - float(loss_k)) <= 1e-4 * max(
        float(loss_o), 1e-6
    ), (float(loss_o), float(loss_k))
    for k in GRAD_FIELDS:
        a = np.asarray(grads_o[k])
        b = np.asarray(grads_k[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= rtol * scale, (
            k, np.abs(a - b).max(), scale
        )
    return grads_o


def test_matches_oracle_cornell_spheres():
    world, cam, kw = presets.cornell_spheres(width=16, height=16)
    # rtol 0.1: the Cornell light is coplanar with the ceiling, so ulp-level
    # screening differences flip a few z-fight winners per image.
    g = _compare(world.build(), cam, kw["background"], mb=3, rtol=0.1)
    # the scene actually produces geometry gradients (silhouette + NEE)
    assert np.abs(np.asarray(g["sph_center"])).max() > 0.0


def test_matches_oracle_mixed_materials():
    scene, cam, bg = _mixed_world()
    g = _compare(scene, cam, bg, mb=5)
    assert np.abs(np.asarray(g["mat_fuzz"])).max() > 0.0
    assert np.abs(np.asarray(g["mat_ior"])).max() > 0.0


def test_matches_oracle_no_lights():
    """Sky-lit scene: NEE inactive, silhouette still supplies geometry
    gradients; forward must match the plain estimator."""
    world, cam, kw = presets.sphere_ground(32, 24)
    _compare(world.build(), cam, kw["background"], mb=4)


def test_image_matches_modular_nee_render():
    world, cam, kw = presets.cornell_spheres(width=16, height=16)
    scene = world.build()
    bg = jnp.asarray(kw["background"], jnp.float32)
    ref = trace_ops.render_image(
        scene, cam, spp=3, max_bounces=3, background=bg, seed=4, nee=True
    )
    _, img, _ = render_value_and_grad(
        scene, cam, jnp.zeros_like(ref), spp=3, max_bounces=3,
        background=bg, seed=4, interpret=True,
    )
    img = np.asarray(img)
    ref = np.asarray(ref)
    d = np.abs(img - ref)
    rel = d / np.maximum(np.abs(ref), 1e-6)
    # All but the rare tie-flipped samples must agree to roundoff.
    assert d.mean() < 5e-4, d.mean()
    assert (rel > 1e-3).mean() < 0.02, (rel > 1e-3).mean()


def test_packed_sharded_matches_single_device():
    """Data-parallel fused training (mesh over pixel-tile blocks): the
    sharded kernel's image and psum'd gradient tables match the
    single-device packed kernel up to collective summation order."""
    from jax.sharding import Mesh

    from tinyraytracer_tpu.ops.diffkernel_packed import (
        render_value_and_grad_packed,
    )

    world, cam, kw = presets.cornell_spheres(width=16, height=16)
    scene = world.build()
    rng = np.random.RandomState(1)
    target = rng.rand(16, 16, 3).astype(np.float32) * 0.5
    kws = dict(spp=2, max_bounces=3, background=kw["background"], seed=5,
               interpret=True, tile=(8, 128))
    loss_1, img_1, g_1 = render_value_and_grad_packed(
        scene, cam, target, **kws)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("tile", "sample"))
    loss_m, img_m, g_m = render_value_and_grad_packed(
        scene, cam, target, mesh=mesh, **kws)
    assert float(loss_1) == pytest.approx(float(loss_m), rel=1e-6)
    assert np.abs(np.asarray(img_1) - np.asarray(img_m)).max() <= 1e-6
    for k in GRAD_FIELDS:
        a = np.asarray(g_1[k])
        b = np.asarray(g_m[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-5 * scale, (
            k, np.abs(a - b).max(), scale)


def test_fused_step_grad_chunks():
    """make_fused_train_step(grad_chunks=N): the median-of-chunks step runs
    the same sample set as the plain step (chunk c covers spp offsets
    [c*spp/N, (c+1)*spp/N)) and produces finite params; with N=2 the
    median equals the two-chunk mean, so the update direction must agree
    with the plain step's on smooth (albedo) parameters."""
    import optax

    world, cam, kw = presets.cornell_spheres(width=12, height=12)
    scene = world.build()
    rng = np.random.RandomState(7)
    target = rng.rand(12, 12, 3).astype(np.float32) * 0.5
    common = dict(spp=4, max_bounces=2, background=kw["background"], seed=3,
                  interpret=True, optimizer=optax.sgd(1e-2),
                  trainable=("mat_albedo",))
    s1, (p1, o1) = inverse.make_fused_train_step(scene, cam, target,
                                                 **common)
    s2, (p2, o2) = inverse.make_fused_train_step(scene, cam, target,
                                                 grad_chunks=2, **common)
    p1, _, l1 = s1(p1, o1, 0)
    p2, _, l2 = s2(p2, o2, 0)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    d1 = np.asarray(p1["mat_albedo"]) - np.asarray(scene.mat_albedo)
    d2 = np.asarray(p2["mat_albedo"]) - np.asarray(scene.mat_albedo)
    # same samples, mean-of-2 == full mean for a linear-in-samples grad
    # component; allow MC-MSE correlation-term differences
    assert np.sign(d1[np.abs(d1) > 1e-7]).tolist() == np.sign(
        d2[np.abs(d1) > 1e-7]).tolist()
    with pytest.raises(ValueError):
        inverse.make_fused_train_step(scene, cam, target, grad_chunks=3,
                                      **common)


@pytest.mark.parametrize("scene_name", ["cornell_spheres", "mixed"])
def test_packed_matches_classic(scene_name):
    """The sublane-packed kernel (ops/diffkernel_packed.py) is the same
    estimator in an (S, L) layout: image bitwise-equal, every gradient
    field equal to fp-reassociation error (the scatter MXU sums lanes in
    a different order)."""
    from tinyraytracer_tpu.ops.diffkernel_packed import (
        render_value_and_grad_packed,
    )

    if scene_name == "cornell_spheres":
        world, cam, kw = presets.cornell_spheres(width=16, height=16)
        scene, bg = world.build(), kw["background"]
    else:
        scene, cam, bg = _mixed_world()
    rng = np.random.RandomState(0)
    target = rng.rand(cam.height, cam.width, 3).astype(np.float32) * 0.5
    kws = dict(spp=2, max_bounces=3, background=bg, seed=3)
    loss_c, img_c, g_c = render_value_and_grad(
        scene, cam, target, interpret=True, packed=False, **kws)
    loss_p, img_p, g_p = render_value_and_grad_packed(
        scene, cam, target, interpret=True, tile=(8, 128), **kws)
    assert float(loss_c) == pytest.approx(float(loss_p), rel=1e-6)
    assert np.abs(np.asarray(img_c) - np.asarray(img_p)).max() <= 1e-6
    for k in GRAD_FIELDS + ("background",):
        a = np.asarray(g_c[k])
        b = np.asarray(g_p[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-4 * scale, (
            k, np.abs(a - b).max(), scale)


def test_diff_specialization_and_isect_cache_value_preserving(monkeypatch):
    """The fused kernels' material-kind compile-out and the phase-1
    intersection cache must not move the loss, image, or any gradient:
    compare the auto-specialized cached run against (a) flags forced to
    full chains and (b) the cache disabled."""
    from tinyraytracer_tpu.ops import diffkernel as dk
    from tinyraytracer_tpu.ops import diffkernel_packed as dkp
    from tinyraytracer_tpu.ops.diffkernel_packed import (
        render_value_and_grad_packed,
    )

    world, cam, kw = presets.cornell_spheres(width=16, height=16)
    scene, bg = world.build(), kw["background"]
    rng = np.random.RandomState(1)
    target = rng.rand(cam.height, cam.width, 3).astype(np.float32) * 0.5
    kws = dict(spp=2, max_bounces=3, background=bg, seed=3,
               interpret=True, tile=(8, 128))
    base = render_value_and_grad_packed(scene, cam, target, **kws)

    monkeypatch.setattr(dk, "static_kind_flags", lambda st: (True, True))
    full = render_value_and_grad_packed(scene, cam, target, **kws)
    monkeypatch.undo()

    monkeypatch.setattr(dkp, "DIFF_ISECT_CACHE_BYTES", 0)
    nocache = render_value_and_grad_packed(scene, cam, target, **kws)

    for other in (full, nocache):
        # loss and image are bitwise-identical; the gradient TABLES may
        # differ by compiler reassociation (different program variants let
        # XLA tile the one-hot reductions differently) — the math itself
        # contributes exact zeros for the compiled-out terms.
        assert float(base[0]) == float(other[0])
        np.testing.assert_array_equal(np.asarray(base[1]),
                                      np.asarray(other[1]))
        for k in base[2]:
            a = np.asarray(base[2][k])
            b = np.asarray(other[2][k])
            scale = max(np.abs(a).max(), 1e-8)
            assert np.abs(a - b).max() <= 1e-5 * scale, (
                k, np.abs(a - b).max(), scale)


@pytest.mark.parametrize("fuzz_seed", [3, 17])
def test_matches_oracle_random_scene(fuzz_seed):
    """Randomized lit scenes (random prim counts, materials, light
    placement) — the fused kernel's gradients must match the oracle on
    arbitrary scene structure, not just the hand-built fixtures. Keeps a
    quad light so every gradient chain (NEE geometry, soft shadows,
    silhouettes) is live."""
    rng = np.random.RandomState(fuzz_seed)
    w = World()
    w.add_material("lam", Lambertian(tuple(rng.uniform(0.2, 0.8, 3))))
    w.add_material("met", Metal(tuple(rng.uniform(0.2, 0.9, 3)),
                                float(rng.uniform(0.0, 0.6))))
    w.add_material("glass", Dielectric(tuple(rng.uniform(0.7, 1.0, 3)),
                                       float(rng.uniform(1.2, 1.9))))
    w.add_material("lamp", Light(tuple(rng.uniform(4.0, 12.0, 3))))
    w.add_geometry(Sphere((0.0, -100.5, -1.0), 100.0, "lam"))
    names = ["lam", "met", "glass"]
    for _ in range(rng.randint(1, 4)):
        c = rng.uniform(-1.2, 1.2, 3) * np.array([1, 0.4, 1]) + [0, 0, -1.3]
        w.add_geometry(Sphere(tuple(c), float(rng.uniform(0.25, 0.55)),
                              names[rng.randint(3)]))
    if rng.rand() < 0.5:
        w.add_geometry(Quad(tuple(rng.uniform(-1.5, 0.5, 3)),
                            (float(rng.uniform(0.5, 1.5)), 0.0, 0.0),
                            (0.0, 0.0, float(rng.uniform(0.5, 1.5))),
                            names[rng.randint(3)]))
    w.add_geometry(Quad((-1.5, float(rng.uniform(1.5, 2.5)), -2.5),
                        (3.0, 0.0, 0.0), (0.0, 0.0, 2.0), "lamp"))
    cam = Camera.new(1.0, 0.0, (0.0, 0.3, 1.0), (0.0, 0.0, -1.0),
                     (0.0, 1.0, 0.0), 60.0, 24, 16)
    bg = tuple(rng.uniform(0.02, 0.1, 3))
    _compare(w.build(), cam, bg, mb=4, rtol=2e-2)


def test_subset_surrogates_match_dense():
    """surr_rows (VERDICT r3 #1): restricting the boundary-surrogate
    adjoints to a trained row subset.

    - subset == all rows: bit-level match with the dense path (same
      math, gathered layout);
    - strict subset, sky-lit scene (NEE off): the silhouette factor
      log-factorizes per row, so subset rows' gradients are EXACT;
    - strict subset, lit scene: subset rows match dense to ~1% (the
      dropped term is non-listed occluders' soft-shadow cotangents into
      the shared ray chain);
    - the forward loss is identical in every case (the surrogates are
      value-preserving ratios)."""
    world, cam, kw = presets.cornell_spheres(width=16, height=16)
    scene = world.build()
    from tinyraytracer_tpu.ops.diffkernel import build_diff_static

    st = build_diff_static(scene)
    bg = jnp.asarray(kw["background"], jnp.float32)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    kw_c = dict(spp=2, max_bounces=3, background=bg, seed=0, interpret=True)
    l0, _, g0 = render_value_and_grad(scene, cam, target, **kw_c)
    l1, _, g1 = render_value_and_grad(
        scene, cam, target,
        surr_rows={"sph": st.sph_rows, "quad": st.quad_rows}, **kw_c)
    assert float(l0) == float(l1)
    for k in GRAD_FIELDS:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-5 * scale, (k,)
    # strict subset on the lit scene: ~1% on the subset rows
    sub = st.sph_rows[:1]
    l2, _, g2 = render_value_and_grad(
        scene, cam, target, surr_rows={"sph": sub}, **kw_c)
    assert float(l2) == float(l0)
    a = np.asarray(g0["sph_center"])[list(sub)]
    b = np.asarray(g2["sph_center"])[list(sub)]
    assert np.abs(a - b).max() <= 2e-2 * max(np.abs(a).max(), 1e-8)
    # sky-lit (no lights): silhouette-only -> subset rows exact
    world2, cam2, kw2 = presets.random_spheres(width=24, height=16, n=12)
    scene2 = world2.build()
    st2 = build_diff_static(scene2)
    bg2 = jnp.asarray(kw2["background"], jnp.float32)
    t2 = jnp.zeros((16, 24, 3), jnp.float32)
    kw_c2 = dict(spp=2, max_bounces=3, background=bg2, seed=0,
                 interpret=True)
    _, _, g3 = render_value_and_grad(scene2, cam2, t2, **kw_c2)
    sub2 = st2.sph_rows[:3]
    _, _, g4 = render_value_and_grad(
        scene2, cam2, t2, surr_rows={"sph": sub2}, **kw_c2)
    a2 = np.asarray(g3["sph_center"])[list(sub2)]
    b2 = np.asarray(g4["sph_center"])[list(sub2)]
    # analytically exact; a few ulp of fp reassociation (the subset path
    # reduces via the scatter matmul, the dense path via direct concat)
    assert np.abs(a2 - b2).max() <= 1e-6 * max(np.abs(a2).max(), 1e-8)
    # non-listed rows keep their exact pathwise (winner) gradients but
    # lose only surrogate terms — they must remain finite
    rest = [r for r in st2.sph_rows if r not in sub2]
    assert np.isfinite(np.asarray(g4["sph_center"])[rest]).all()


def test_class_scope_matches_explicit_rows():
    """VERDICT r4 #1: class-level surrogate scope. On the config-5 shape
    (sphere geometry trained, quad geometry pinned):

    - classic kernel: {"sph": None, "quad": ()} (full sphere class via
      the dense path, quad class compiled out) must match the explicit
      all-sphere-rows subset {"sph": all rows, "quad": ()} on every
      gradient field (same math; gathered vs dense layout);
    - the packed kernel stays eligible for class scopes and must agree
      with the classic kernel under the same scope;
    - the forward loss is identical with any scope (surrogates are
      value-preserving ratios)."""
    from tinyraytracer_tpu.ops.diffkernel import build_diff_static
    from tinyraytracer_tpu.ops import diffkernel_packed as dkp

    world, cam, kw = presets.cornell_spheres(width=16, height=16)
    scene = world.build()
    st = build_diff_static(scene)
    bg = jnp.asarray(kw["background"], jnp.float32)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    kw_c = dict(spp=2, max_bounces=3, background=bg, seed=0,
                interpret=True)
    scope = {"sph": None, "quad": ()}
    l0, _, g0 = render_value_and_grad(scene, cam, target, **kw_c)
    lc, _, gc = render_value_and_grad(
        scene, cam, target, surr_rows=scope, packed=False, **kw_c)
    le, _, ge = render_value_and_grad(
        scene, cam, target,
        surr_rows={"sph": st.sph_rows, "quad": ()}, packed=False, **kw_c)
    assert float(lc) == float(l0) == float(le)
    for k in GRAD_FIELDS:
        a, b = np.asarray(gc[k]), np.asarray(ge[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-5 * scale, (k,)
    # trained-class rows keep their full dense-path gradients exactly
    np.testing.assert_allclose(
        np.asarray(gc["sph_center"]), np.asarray(g0["sph_center"]),
        rtol=0, atol=2e-2 * max(
            np.abs(np.asarray(g0["sph_center"])).max(), 1e-8))
    # packed kernel: class scopes keep it eligible (no forced classic)
    calls = []
    orig = dkp.render_value_and_grad_packed

    def spy(*a, **k):
        calls.append(k)
        return orig(*a, **k)

    dkp.render_value_and_grad_packed = spy
    try:
        lp, _, gp = render_value_and_grad(
            scene, cam, target, surr_rows=scope, packed=True,
            tile=(8, 128), **kw_c)
    finally:
        dkp.render_value_and_grad_packed = orig
    assert calls and calls[0]["surr_sph"] and not calls[0]["surr_quad"]
    assert float(lp) == pytest.approx(float(lc), rel=1e-6)
    for k in GRAD_FIELDS:
        a, b = np.asarray(gc[k]), np.asarray(gp[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-4 * scale, (k,)


def test_fused_step_auto_scope_from_trainable():
    """make_fused_train_step derives the surrogate scope from
    `trainable` (VERDICT r4 #1): a config-5-shaped fit (sph_center +
    mat_albedo) must produce exactly the update that the explicit
    class-scope kernel call + masked SGD produces."""
    import optax

    world, cam, kw = presets.cornell_spheres(width=12, height=12)
    scene = world.build()
    rng = np.random.RandomState(7)
    target = rng.rand(12, 12, 3).astype(np.float32) * 0.5
    step, (p, o) = inverse.make_fused_train_step(
        scene, cam, target, spp=2, max_bounces=3,
        background=kw["background"], seed=3, interpret=True,
        optimizer=optax.sgd(1e-2),
        trainable=("sph_center", "mat_albedo"),
    )
    p1, _, l1 = step(p, o, 0)
    loss_ref, _img, g_ref = render_value_and_grad(
        scene, cam, target, spp=2, max_bounces=3,
        background=kw["background"], seed=3,
        surr_rows={"sph": None, "quad": ()}, interpret=True)
    assert float(l1) == float(loss_ref)
    for k in ("sph_center", "mat_albedo"):
        expect = np.asarray(getattr(scene, k)) - 1e-2 * np.asarray(g_ref[k])
        np.testing.assert_array_equal(np.asarray(p1[k]), expect)
    # untrained fields must not have moved
    np.testing.assert_array_equal(np.asarray(p1["quad_corner"]),
                                  np.asarray(scene.quad_corner))


def test_streamed_matches_monolithic(monkeypatch):
    """Row-streamed classic kernel (VERDICT r4 #3): with scoped
    surrogates, the chunked candidate sweep / payload gather /
    table accumulation must reproduce the monolithic kernel — loss and
    image bitwise, gradients bitwise except ulp-level reassociation on
    the surrogate-row adds (the streamed mode adds winner and surrogate
    tables in two ref writes instead of one fused add)."""
    from tinyraytracer_tpu.ops.diffkernel import build_diff_static

    world, cam, kw = presets.cornell_spheres(width=16, height=16)
    scene = world.build()
    st = build_diff_static(scene)
    bg = jnp.asarray(kw["background"], jnp.float32)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    kw_c = dict(spp=2, max_bounces=3, background=bg, seed=0,
                interpret=True, packed=False)
    scope = {"sph": st.sph_rows[:1], "quad": ()}
    l0, img0, g0 = render_value_and_grad(
        scene, cam, target, surr_rows=scope, **kw_c)
    monkeypatch.setenv("TINYRT_DIFF_STREAM", "16")  # chunk=16 rows
    l1, img1, g1 = render_value_and_grad(
        scene, cam, target, surr_rows=scope, **kw_c)
    assert float(l0) == float(l1)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    for k in GRAD_FIELDS + ("background",):
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-6 * scale, (k,)


def test_streamed_many_spheres_subset(monkeypatch):
    """The cfg4-class target of streaming: a many-sphere scene with a
    trained-row subset. The streamed kernel must match the monolithic
    classic kernel (which interpret mode can still run — no VMEM
    limit) on every gradient field."""
    from tinyraytracer_tpu.ops.diffkernel import build_diff_static

    world, cam, kw = presets.random_spheres(width=24, height=16, n=48)
    scene = world.build()
    st = build_diff_static(scene)
    bg = jnp.asarray(kw["background"], jnp.float32)
    target = jnp.zeros((16, 24, 3), jnp.float32)
    kw_c = dict(spp=2, max_bounces=3, background=bg, seed=1,
                interpret=True, packed=False)
    scope = {"sph": st.sph_rows[:3], "quad": ()}
    _, img0, g0 = render_value_and_grad(
        scene, cam, target, surr_rows=scope, **kw_c)
    monkeypatch.setenv("TINYRT_DIFF_STREAM", "16")
    _, img1, g1 = render_value_and_grad(
        scene, cam, target, surr_rows=scope, **kw_c)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    for k in GRAD_FIELDS + ("background",):
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-6 * scale, (k,)


def test_streamed_dense_surrogates_match_monolithic(monkeypatch):
    """Round-5 dense-surrogate streaming: with NO surrogate scope at all
    (every class dense), the streamed kernel folds the soft-shadow and
    silhouette sweeps chunk-by-chunk and must match the monolithic
    kernel — loss and image bitwise, every gradient field to fp
    reassociation (the per-chunk lane reductions re-associate the
    per-bounce surrogate sums)."""
    world, cam, kw = presets.cornell_spheres(width=16, height=16)
    scene = world.build()
    bg = jnp.asarray(kw["background"], jnp.float32)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    kw_c = dict(spp=2, max_bounces=3, background=bg, seed=0,
                interpret=True, packed=False)
    l0, img0, g0 = render_value_and_grad(scene, cam, target, **kw_c)
    monkeypatch.setenv("TINYRT_DIFF_STREAM", "16")
    l1, img1, g1 = render_value_and_grad(scene, cam, target, **kw_c)
    assert float(l0) == float(l1)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    for k in GRAD_FIELDS + ("background",):
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-5 * scale, (k,)


def test_streamed_dense_many_spheres(monkeypatch):
    """Dense streaming at the scale it exists for: a many-sphere scene
    with EVERY sphere's geometry trained (no trainable_rows) — the
    monolithic classic kernel is the interpret-mode oracle."""
    world, cam, kw = presets.random_spheres(width=24, height=16, n=40)
    scene = world.build()
    bg = jnp.asarray(kw["background"], jnp.float32)
    target = jnp.zeros((16, 24, 3), jnp.float32)
    kw_c = dict(spp=2, max_bounces=3, background=bg, seed=1,
                interpret=True, packed=False)
    _, img0, g0 = render_value_and_grad(scene, cam, target, **kw_c)
    monkeypatch.setenv("TINYRT_DIFF_STREAM", "16")
    _, img1, g1 = render_value_and_grad(scene, cam, target, **kw_c)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    for k in GRAD_FIELDS + ("background",):
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-5 * scale, (k,)
    # the dense surrogates actually produce geometry signal
    assert np.abs(np.asarray(g1["sph_center"])).max() > 0.0


def test_fused_step_trainable_rows_masks_updates():
    """make_fused_train_step(trainable_rows=...): non-listed geometry
    rows must not move; listed rows must."""
    import optax

    world, cam, kw = presets.cornell_spheres(width=12, height=12)
    scene = world.build()
    from tinyraytracer_tpu.ops.diffkernel import build_diff_static

    st = build_diff_static(scene)
    rng = np.random.RandomState(5)
    target = rng.rand(12, 12, 3).astype(np.float32) * 0.5
    sub = st.sph_rows[:1]
    step, (p, o) = inverse.make_fused_train_step(
        scene, cam, target, spp=2, max_bounces=3,
        background=kw["background"], seed=3, interpret=True,
        optimizer=optax.sgd(1e-2),
        trainable=("sph_center",),
        trainable_rows={"sph": sub},
    )
    p0 = np.asarray(p["sph_center"]).copy()
    p, _, _ = step(p, o, 0)
    p1 = np.asarray(p["sph_center"])
    moved = np.abs(p1 - p0).max(axis=-1)
    assert moved[sub[0]] > 0.0
    rest = [r for r in st.sph_rows if r not in sub]
    assert np.abs(p1[rest] - p0[rest]).max() == 0.0


def test_fused_step_material_only_skips_silhouette():
    """A fit that doesn't train sphere geometry may skip the silhouette
    surrogate: its gradients land only in the masked-out sphere rows, so
    the trained parameters must be bit-identical with it on or off."""
    import optax

    world, cam, kw = presets.cornell_spheres(width=12, height=12)
    scene = world.build()
    rng = np.random.RandomState(5)
    target = rng.rand(12, 12, 3).astype(np.float32) * 0.5
    common = dict(spp=2, max_bounces=3, background=kw["background"],
                  seed=3, interpret=True, optimizer=optax.sgd(1e-2),
                  trainable=("mat_albedo", "mat_emit"))
    s_auto, (p_a, o_a) = inverse.make_fused_train_step(scene, cam, target,
                                                       **common)
    p_a, _, l_a = s_auto(p_a, o_a, 0)
    # reference: force the surrogate on through the raw kernel call and
    # a manual sgd application on the same masked fields
    loss_ref, _img, g_ref = render_value_and_grad(
        scene, cam, target, spp=2, max_bounces=3,
        background=kw["background"], seed=3, silhouette=True,
        interpret=True)
    assert float(l_a) == float(loss_ref)
    for k in ("mat_albedo", "mat_emit"):
        expect = np.asarray(getattr(scene, k)) - 1e-2 * np.asarray(g_ref[k])
        np.testing.assert_array_equal(np.asarray(p_a[k]), expect)


def _n_sphere_world(n, with_light=True):
    w = World()
    w.add_material("white", Lambertian((0.7, 0.7, 0.7)))
    if with_light:
        w.add_material("lamp", Light((8.0, 8.0, 8.0)))
        w.add_geometry(Quad((-1.0, 2.0, -3.0), (2.0, 0.0, 0.0),
                            (0.0, 0.0, 2.0), "lamp"))
    rng = np.random.RandomState(11)
    for i in range(n):
        c = rng.uniform(-3.0, 3.0, 3)
        w.add_geometry(Sphere((float(c[0]), float(c[1]), float(c[2]) - 4.0),
                              0.3, "white"))
    cam = Camera.new(1.0, 0.0, (0.0, 0.0, 1.0), (0.0, 0.0, -1.0),
                     (0.0, 1.0, 0.0), 60.0, 8, 8)
    return w.build(), cam


def test_fused_engine_feasible_matches_routing(monkeypatch):
    """fused_engine_feasible is the single source of truth: wherever it
    says False for an unmeshed scene, render_value_and_grad's own routing
    raises; where it says True, dispatch proceeds (ADVICE r3)."""
    from tinyraytracer_tpu.ops import megakernel as mk
    from tinyraytracer_tpu.ops.diffkernel import (
        build_diff_static, fused_engine_feasible)

    # 20 spheres: over DIFF_PACKED_MAX_SPHERES (auto routes classic),
    # under DIFF_PACKED_MAX_PRIMS. Shrink the classic scoped-VMEM limit
    # (the calibrated-model acceptance bound, _classic_tile) so the
    # classic route is infeasible too.
    from tinyraytracer_tpu.ops import diffkernel as dk

    scene, cam = _n_sphere_world(20)
    st = build_diff_static(scene)
    monkeypatch.setattr(dk, "_SCOPED_LIMIT", 1.0e6)
    assert not fused_engine_feasible(st, mesh=None)
    target = np.zeros((8, 8, 3), np.float32)
    with pytest.raises(ValueError, match="candidate rows"):
        render_value_and_grad(
            scene, cam, target, spp=1, max_bounces=1,
            background=(0.0, 0.0, 0.0), seed=0, static=st)

    # interpret mode has no VMEM constraint: helper says feasible and the
    # same call runs instead of raising
    assert fused_engine_feasible(st, mesh=None, interpret=True)
    loss, img, grads = render_value_and_grad(
        scene, cam, target, spp=1, max_bounces=1,
        background=(0.0, 0.0, 0.0), seed=0, static=st, interpret=True)
    assert np.isfinite(float(loss))

    # mesh-sharded runs follow the SAME per-device limits (the classic
    # kernel has its own mesh path now — no packed pinning): under the
    # shrunken classic cap this 20-sphere scene is infeasible with a
    # mesh too, and interpret lifts it the same way
    assert not fused_engine_feasible(st, mesh=object())
    assert fused_engine_feasible(st, mesh=object(), interpret=True)
    monkeypatch.undo()
    assert fused_engine_feasible(st, mesh=object())


def test_classic_sharded_matches_single_device():
    """Mesh-sharded classic fused kernel (the many-sphere route —
    VERDICT r3 #1: mesh fits must not be pinned to the packed kernel):
    image and psum'd gradient tables match single-device classic."""
    from jax.sharding import Mesh

    # 20 spheres: over DIFF_PACKED_MAX_SPHERES, so auto-routing picks
    # the classic kernel even with a mesh
    scene, cam = _n_sphere_world(20)
    rng = np.random.RandomState(2)
    target = rng.rand(8, 8, 3).astype(np.float32) * 0.5
    kws = dict(spp=2, max_bounces=3, background=(0.02, 0.02, 0.03),
               seed=7, interpret=True, packed=False)
    loss_1, img_1, g_1 = render_value_and_grad(scene, cam, target, **kws)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("tile", "sample"))
    loss_m, img_m, g_m = render_value_and_grad(
        scene, cam, target, mesh=mesh, **kws)
    assert float(loss_1) == pytest.approx(float(loss_m), rel=1e-6)
    assert np.abs(np.asarray(img_1) - np.asarray(img_m)).max() <= 1e-6
    for k in GRAD_FIELDS:
        a = np.asarray(g_1[k])
        b = np.asarray(g_m[k])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-5 * scale, (
            k, np.abs(a - b).max(), scale)
