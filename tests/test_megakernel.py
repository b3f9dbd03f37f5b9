"""Megakernel parity vs the modular renderer (interpret mode on CPU).

The megakernel re-implements raygen + RNG + intersection + scatter +
accumulation inside one Pallas kernel; every formula is written to match
the modular path bit for bit (shared pcg4d streams, same intersection and
scatter arithmetic), so the whole image must agree exactly on scenes
without coplanar-tie degeneracies (on TPU hardware the match was verified
bitwise as well).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tinyraytracer_tpu.models import presets
from tinyraytracer_tpu.ops import megakernel as mk
from tinyraytracer_tpu.ops import trace as trace_ops


@pytest.mark.parametrize("name", ["three_spheres", "sphere_ground"])
def test_megakernel_matches_modular(name):
    world, camera, kw = presets.PRESETS[name](width=16, height=12)
    scene = world.build()
    bg = jnp.asarray(kw["background"], jnp.float32)
    ref = trace_ops.render_image(
        scene, camera, spp=2, max_bounces=3, background=bg, seed=3
    )
    img = mk.render_image_megakernel(
        scene, camera, spp=2, max_bounces=3,
        background=kw["background"], seed=3, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("name", ["three_spheres", "rtiow_sky"])
def test_gradient_sky(name):
    """Round-4 gradient sky ((2,3) [bottom, top] background, the
    reference's output.png artifact class):

    - three_spheres with top==bottom must be BIT-identical to the (3,)
      constant path (the lerp's t*(top-b) term is exactly 0);
    - rtiow_sky: megakernel (both layouts) matches the modular path."""
    world, camera, kw = presets.PRESETS[name](width=16, height=12)
    scene = world.build()
    if name == "three_spheres":
        bgc = jnp.asarray(kw["background"], jnp.float32)
        bg2 = jnp.stack([bgc, bgc])
        ref = trace_ops.render_image(
            scene, camera, spp=2, max_bounces=3, background=bgc, seed=3)
        dup = trace_ops.render_image(
            scene, camera, spp=2, max_bounces=3, background=bg2, seed=3)
        np.testing.assert_array_equal(np.asarray(dup), np.asarray(ref))
        img = mk.render_image_megakernel(
            scene, camera, spp=2, max_bounces=3, background=bg2, seed=3,
            interpret=True)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                                   atol=1e-6)
    else:
        bg = jnp.asarray(kw["background"], jnp.float32)
        assert bg.shape == (2, 3)
        ref = trace_ops.render_image(
            scene, camera, spp=2, max_bounces=4, background=bg, seed=5)
        # the sky must actually vary top-to-bottom in the miss region
        top_row = np.asarray(ref)[0]
        assert top_row.std(axis=0).max() > 1e-3
        for packed in (False, True):
            img = mk.render_image_megakernel(
                scene, camera, spp=2, max_bounces=4,
                background=kw["background"], seed=5, interpret=True,
                packed=packed)
            np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                                       atol=1e-6)


def test_row_chunked_matches_monolithic():
    """Round-4 row-streamed mode (large-N scenes beyond the monolithic
    (NA, TR) candidate matrix's VMEM): the fori-folded candidate sweep +
    chunked payload gather must be BIT-identical to the monolithic
    kernel — the strict-< fold reproduces min + first-index-at-min
    exactly, including clamped tail blocks (60 spheres, chunk 16: four
    blocks minus a 4-row overlap re-test). Verified equal on TPU
    hardware as well (2000 spheres, chunk 256)."""
    world, cam, kw = presets.random_spheres(width=24, height=16, n=60)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, cam, kw["background"], interpret=True)
    mono = r.render(spp=2, max_bounces=5, seed=3)
    ctl = jnp.asarray([[3, 0, 0, 0]], jnp.int32)
    chunk = mk._render_flat(
        r.cs, r.pay, r.cam_vec, ctl, spp=2, max_bounces=5,
        width=24, height=16, interpret=True, regen=True,
        has_met=r.has_met, has_die=r.has_die, sky=r.sky, row_chunk=16)
    np.testing.assert_array_equal(np.asarray(chunk), np.asarray(mono))


def test_regen_edge_budgets():
    """spp=1 and max_bounces=1 exercise the regeneration loop's fold /
    budget boundaries (first-iteration regen, immediate budget kill)."""
    world, camera, kw = presets.three_spheres(width=16, height=12)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, camera, kw["background"], interpret=True)
    for spp, mb in ((1, 4), (2, 1), (1, 1)):
        classic = r.render(spp=spp, max_bounces=mb, seed=2, regen=False)
        regen = r.render(spp=spp, max_bounces=mb, seed=2, regen=True)
        np.testing.assert_array_equal(np.asarray(regen), np.asarray(classic))


def test_explicit_flags_bypass_packed(monkeypatch):
    """Explicit regen/early_exit arguments must run the CLASSIC kernel: the
    packed path has no lockstep mode and would silently drop the flags
    (regression: the auto-select used to reroute regen=True to packed)."""
    import tinyraytracer_tpu.ops.megakernel_packed as mkp

    def _fail(*a, **k):
        raise AssertionError("packed kernel must not run for explicit flags")

    monkeypatch.setattr(mkp, "_render_packed", _fail)
    world, camera, kw = presets.three_spheres(width=16, height=12)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, camera, kw["background"], interpret=True)
    r.render(spp=1, max_bounces=2, seed=0, regen=True)
    r.render(spp=1, max_bounces=2, seed=0, regen=False)
    r.render(spp=1, max_bounces=2, seed=0, early_exit=False)


@pytest.mark.parametrize("name", ["cornell_spheres", "three_spheres"])
def test_regen_matches_classic(name):
    """The sample-regeneration loop (persistent lanes) must be bitwise
    identical to the classic spp x bounce lockstep loop: per lane it runs
    the same op sequence in the same order, only interleaved differently
    (verified bitwise on TPU hardware as well; on v5e regen measured
    3.8x on config 4 and 1.7x on Cornell 600x600)."""
    world, camera, kw = presets.PRESETS[name](width=16, height=12)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, camera, kw["background"], interpret=True)
    classic = r.render(spp=3, max_bounces=4, seed=7, regen=False)
    regen = r.render(spp=3, max_bounces=4, seed=7, regen=True)
    np.testing.assert_array_equal(np.asarray(regen), np.asarray(classic))


@pytest.mark.parametrize(
    "name", ["three_spheres", "cornell_spheres", "sphere_ground"]
)
def test_packed_matches_classic(name):
    """The sublane-packed kernel (ops/megakernel_packed.py) must be bitwise
    identical to the classic regeneration kernel: the RNG is keyed on
    (pixel, sample, bounce) so the lane->pixel assignment is irrelevant,
    the shading math is literally shared (_shade_bounce), and the packed
    min-chain reproduces the classic argmin-first tie-break (verified
    bitwise on TPU v5e as well; measured 1.1-1.3x on BASELINE cfgs 1-3)."""
    world, camera, kw = presets.PRESETS[name](width=20, height=14)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, camera, kw["background"], interpret=True)
    classic = r.render(spp=3, max_bounces=4, seed=7, regen=True, packed=False)
    packed = r.render(spp=3, max_bounces=4, seed=7, packed=True)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(classic))


def test_packed_spp_offset_partitions_samples():
    """spp_offset must address global sample ids in the packed kernel too
    (the sharded sample-axis split depends on it)."""
    world, camera, kw = presets.three_spheres(width=16, height=12)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, camera, kw["background"], interpret=True)
    full = r.render(spp=4, max_bounces=3, seed=5, packed=True)
    a = r.render(spp=2, max_bounces=3, seed=5, spp_offset=0, packed=True)
    b = r.render(spp=2, max_bounces=3, seed=5, spp_offset=2, packed=True)
    np.testing.assert_allclose(
        np.asarray((a + b) / 2.0), np.asarray(full), atol=1e-6
    )


def test_megakernel_sharded_matches_single():
    """Megakernel under shard_map (tile and sample axes) reproduces the
    single-device render (tile-only exactly; sample split within 1 ulp)."""
    from tinyraytracer_tpu.parallel.sharded import make_mesh

    world, camera, kw = presets.three_spheres(width=16, height=12)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, camera, kw["background"], interpret=True)
    ref = r.render(spp=4, max_bounces=3, seed=5)
    tile_only = r.render(spp=4, max_bounces=3, seed=5,
                         mesh=make_mesh(sample_parallel=1))
    np.testing.assert_array_equal(np.asarray(tile_only), np.asarray(ref))
    split = r.render(spp=4, max_bounces=3, seed=5,
                     mesh=make_mesh(sample_parallel=2))
    np.testing.assert_allclose(np.asarray(split), np.asarray(ref), atol=1e-6)


def test_megakernel_spp_offset_partitions_samples():
    """Two offset halves must average to the full-spp render (the sample
    mean is a plain average over global sample ids)."""
    world, camera, kw = presets.sphere_ground(width=16, height=12)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, camera, kw["background"], interpret=True)
    full = r.render(spp=4, max_bounces=3, seed=5)
    a = r.render(spp=2, max_bounces=3, seed=5, spp_offset=0)
    b = r.render(spp=2, max_bounces=3, seed=5, spp_offset=2)
    np.testing.assert_allclose(
        np.asarray((a + b) / 2.0), np.asarray(full), atol=1e-6
    )


@pytest.mark.heavy
def test_material_specialization_bit_identical():
    """Compiling out absent material kinds (has_met/has_die) must be
    exactly value-preserving: a lambertian+light scene (flags auto-derived
    False) renders bit-identically to the same kernel forced to keep the
    full metal+dielectric chains."""
    world, camera, kw = presets.cornell_box(width=16, height=16)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, camera, kw["background"],
                              interpret=True)
    assert (r.has_met, r.has_die) == (False, False)
    spec_packed = r.render(spp=2, max_bounces=3, seed=7, packed=True)
    spec_classic = r.render(spp=2, max_bounces=3, seed=7, regen=True)
    r.has_met = r.has_die = True
    r._packed = None
    full_packed = r.render(spp=2, max_bounces=3, seed=7, packed=True)
    full_classic = r.render(spp=2, max_bounces=3, seed=7, regen=True)
    np.testing.assert_array_equal(np.asarray(spec_packed),
                                  np.asarray(full_packed))
    np.testing.assert_array_equal(np.asarray(spec_classic),
                                  np.asarray(full_classic))


@pytest.mark.heavy
def test_packed_sharded_matches_single():
    """The sharded packed kernel reproduces the single-device packed
    render: tile-only meshes bitwise (placement-invariant RNG), sample
    splits within the 1-ulp mean-of-means reassociation.

    Uses a small (8, 16) tile so the 20x14 image spans FOUR distinct
    tile blocks — different devices own different pixels, so any
    cross-device ordering bug in the sharded recombination (not just a
    per-device math bug) fails the bitwise assertion."""
    import jax.numpy as jnp
    from tinyraytracer_tpu.ops import megakernel_packed as mkp
    from tinyraytracer_tpu.parallel.sharded import make_mesh

    world, camera, kw = presets.cornell_box(width=20, height=14)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, camera, kw["background"],
                              interpret=True)
    tab, prims = mkp.scene_table(r.cs, r.pay)
    ctl = jnp.asarray([[5, 0, 0, 0]], jnp.int32)
    common = dict(spp=4, max_bounces=3, width=20, height=14, prims=prims,
                  s=8, l=16, interpret=True,
                  has_met=r.has_met, has_die=r.has_die)
    ref = mkp._render_packed(tab, r.cam_vec, ctl, **common)
    assert mkp._packed_pixel_arrays(20, 14, 8, 16)[-1] >= 4  # distinct tiles
    tile_only = mkp._render_packed_sharded(
        tab, r.cam_vec, ctl, mesh=make_mesh(sample_parallel=1), **common)
    np.testing.assert_array_equal(np.asarray(tile_only), np.asarray(ref))
    split = mkp._render_packed_sharded(
        tab, r.cam_vec, ctl, mesh=make_mesh(sample_parallel=2), **common)
    np.testing.assert_allclose(np.asarray(split), np.asarray(ref),
                               atol=1e-6)
    # the public route stays covered at the module tile size
    pub = r.render(spp=4, max_bounces=3, seed=5, packed=True,
                   mesh=make_mesh(sample_parallel=1))
    np.testing.assert_array_equal(
        np.asarray(pub),
        np.asarray(r.render(spp=4, max_bounces=3, seed=5, packed=True)))


def test_auto_tile_rays_feasibility():
    """Large scenes shrink the ray tile to keep the (N, TR) candidate
    matrix compilable; beyond the 128-lane floor the helper says
    infeasible (Renderer auto then falls back to the modular BVH path)."""
    cap = mk.MAX_ROWS_X_TILE   # env-overridable; derive expectations
    assert mk.auto_tile_rays(cap // 1024, 1024) == 1024
    assert mk.auto_tile_rays(cap // 1024 + 8, 1024) == 512
    assert mk.auto_tile_rays(cap // 128, 1024) == 128
    assert mk.auto_tile_rays(cap // 128 + 8, 1024) == 0
    # want normalization: non-pow2 / sub-128 overrides stay lane-aligned
    assert mk.auto_tile_rays(8, 192) == 128
    assert mk.auto_tile_rays(8, 64) == 128
    # tile choice does not change pixel values: per-pixel RNG/ops are
    # tile-placement invariant
    world, camera, kw = presets.three_spheres(width=16, height=12)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, camera, kw["background"],
                              interpret=True)
    a = r.render(spp=2, max_bounces=3, seed=5, regen=True, tile_rays=256)
    b = r.render(spp=2, max_bounces=3, seed=5, regen=True, tile_rays=128)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("fuzz_seed", [11, 29, 47])
def test_megakernel_matches_modular_random_scene(fuzz_seed):
    """Randomized mixed scenes (spheres + quads, all four material kinds,
    random camera) — both megakernel layouts must reproduce the modular
    oracle. Broader than the preset-parametrized parity test: exercises
    arbitrary material/geometry mixes, kind specialization with every
    flag combination, and the padded-row compaction at odd counts."""
    from tinyraytracer_tpu.models.camera import Camera
    from tinyraytracer_tpu.models.geometry import Quad, Sphere
    from tinyraytracer_tpu.models.materials import (
        Dielectric, Lambertian, Light, Metal,
    )
    from tinyraytracer_tpu.models.world import World

    rng = np.random.RandomState(fuzz_seed)
    world = World()
    makers = [
        lambda: Lambertian(tuple(rng.uniform(0.1, 0.9, 3))),
        lambda: Metal(tuple(rng.uniform(0.1, 0.9, 3)),
                      float(rng.uniform(0.0, 0.8))),
        lambda: Dielectric(tuple(rng.uniform(0.5, 1.0, 3)),
                           float(rng.uniform(1.1, 2.0))),
        lambda: Light(tuple(rng.uniform(1.0, 4.0, 3))),
    ]
    n_mats = rng.randint(2, 6)
    names = []
    for i in range(n_mats):
        name = f"m{i}"
        world.add_material(name, makers[rng.randint(len(makers))]())
        names.append(name)
    for _ in range(rng.randint(1, 6)):
        c = rng.uniform(-3, 3, 3)
        world.add_geometry(Sphere(tuple(c), float(rng.uniform(0.3, 1.2)),
                                  names[rng.randint(n_mats)]))
    for _ in range(rng.randint(0, 4)):
        world.add_geometry(Quad(tuple(rng.uniform(-3, 3, 3)),
                                tuple(rng.uniform(-2, 2, 3)),
                                tuple(rng.uniform(-2, 2, 3)),
                                names[rng.randint(n_mats)]))
    camera = Camera.new(
        float(rng.uniform(3, 8)), float(rng.uniform(0.0, 1.0)),
        tuple(rng.uniform(-1, 1, 3) + np.array([0, 0, -8])),
        (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 50.0, 16, 12)
    bg = tuple(rng.uniform(0.0, 0.8, 3))
    scene = world.build()
    ref = trace_ops.render_image(
        scene, camera, spp=2, max_bounces=4,
        background=jnp.asarray(bg, jnp.float32), seed=7)
    r = mk.MegakernelRenderer(scene, camera, bg, interpret=True)
    for kwargs in (dict(packed=True), dict(regen=True), dict(regen=False)):
        img = r.render(spp=2, max_bounces=4, seed=7, **kwargs)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                                   atol=1e-6, err_msg=str(kwargs))


def test_render_burst_matches_single():
    """render_burst bakes N seed-renders into one XLA program; each frame
    must be bit-identical to the corresponding single render (the public
    Renderer.render_batch route, VERDICT r4 #6)."""
    world, cam, kw = presets.sphere_ground(16, 12)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, cam, kw["background"], interpret=True)
    burst = np.asarray(r.render_burst(spp=2, max_bounces=3, seeds=[0, 4]))
    for i, s in enumerate((0, 4)):
        single = np.asarray(r.render(spp=2, max_bounces=3, seed=s))
        np.testing.assert_array_equal(burst[i], single)


def test_chunk_cull_matches_streamed():
    """Chunk-granular culling on the row-streamed path (VERDICT r4 #4):
    skipping a block whose AABB no lane enters before its current best
    is EXACT (any member hit t >= the block's slab entry t), so the
    culled render must be bit-identical to the plain streamed sweep."""
    world, cam, kw = presets.random_spheres(width=24, height=16, n=60)
    scene = world.build()
    r = mk.MegakernelRenderer(scene, cam, kw["background"],
                              interpret=True, chunk_cull=True)
    ctl = jnp.asarray([[3, 0, 0, 0]], jnp.int32)
    pay_active, has_sph, has_quad = mk._active_payload(r.cs, r.pay)
    pid, px, py, inv, rp = mk._block_pixel_arrays(24, 16, 128)
    args = (r.cs, pay_active, r.cam_vec, ctl,
            jnp.asarray(pid), jnp.asarray(px), jnp.asarray(py))
    plain = mk._run_kernel(*args, 2, 5, has_sph, has_quad, True,
                           False, None, 128, True, r.has_met,
                           r.has_die, sky=r.sky, row_chunk=16)
    cull = mk._run_kernel(*args, 2, 5, has_sph, has_quad, True,
                          False, None, 128, True, r.has_met,
                          r.has_die, sky=r.sky, row_chunk=16,
                          chunk_aabbs=mk._build_chunk_aabbs(r.cs, 16))
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(cull))
