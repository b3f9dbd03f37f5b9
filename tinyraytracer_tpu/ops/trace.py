"""The wavefront bounce-loop megakernel and full-image render.

The reference's hot path is a per-sample recursive loop over BVH hits and
material scatters on CPU worker tasks (sampler/cpu.rs:39-65). Here the whole
ray batch advances together through a masked `lax.scan` over bounces — the
wavefront formulation — with semantics matched step for step:

  cpu.rs:47      bounce budget: exactly `max_bounces` hit+scatter iterations
  cpu.rs:48      hit t-range (1e-3, inf)
  cpu.rs:49-50   color += throughput * emission on *every* hit
  cpu.rs:52-54   scatter: throughput *= attenuation, ray = scattered ray
  cpu.rs:55-57   absorbed (scatter None, i.e. Light): ray dies
  cpu.rs:58-60   miss: color += throughput * background, ray dies
  (exhausting the budget adds NO background term — cpu.rs:47-62)

The scan is reverse-mode differentiable; `jax.checkpoint` on the body keeps
backward memory at one bounce of residuals (rematerialization trades HBM for
FLOPs, the right TPU trade).

Accumulation over samples (the Imager's mean, renderer/imager.rs:46-51) is a
`lax.scan` over sample rounds, so peak memory is one ray-wavefront regardless
of spp.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from tinyraytracer_tpu.models.camera import Camera, generate_rays
from tinyraytracer_tpu.models.world import SceneArrays
from tinyraytracer_tpu.ops import intersect as isect
from tinyraytracer_tpu.ops.scatter import scatter


def trace(
    scene: SceneArrays,
    origins,
    directions,
    pixel_id,
    sample_id,
    seed,
    max_bounces: int,
    background,
    exact: bool = False,
    remat: bool = True,
    bvh=None,
    compact=None,
    interpret: bool = False,
    nee: bool = False,
):
    """Path-trace a ray wavefront. Returns (R, 3) linear radiance.

    origins/directions: (R,3) with unit directions; pixel_id: (R,) u32;
    sample_id: scalar u32; background: (3,) f32.

    Intersector selection (all three produce identical hits and gradients):
      - default: dense all-primitives test (XLA matmuls);
      - `bvh` (ops.bvh.BVHArrays): threaded BVH traversal — fewer
        intersections for big scenes;
      - `compact` (ops.intersect_pallas.CompactScene): fused Pallas VMEM
        kernel — the fast TPU path (`interpret=True` to run it on CPU).

    `nee=True` switches diffuse light transport to next-event estimation
    (explicit area sampling of quad lights, emission skipped on the
    subsequent diffuse-BSDF light hit to avoid double counting). Same
    expected image, far lower variance near small lights — and, crucially,
    the NEE contribution T·(albedo/pi)·E·cos_x·|cos_y|·A/r² is a *smooth*
    function of scene geometry, so `jax.grad` yields real gradients for
    sphere centers/radii and quad vectors. The default unidirectional
    estimator's per-sample radiance is a product of discretely-selected
    constants: geometry only moves discontinuity boundaries, and its
    pathwise gradient is exactly zero almost everywhere (the reference
    semantics are kept as the parity/default path; visibility-boundary
    terms remain unestimated under NEE — the standard detached-sampling
    bias).
    """
    r = origins.shape[0]
    init = (
        origins,
        directions,
        jnp.ones((r, 3), jnp.float32),   # throughput
        jnp.zeros((r, 3), jnp.float32),  # accumulated color
        jnp.ones((r,), bool),            # alive (reached a scatter)
        jnp.zeros((r,), bool),           # previous bounce was diffuse (NEE)
    )

    def intersect(o, d):
        if compact is not None:
            from tinyraytracer_tpu.ops.intersect_pallas import (
                intersect_scene_compact,
            )

            return intersect_scene_compact(scene, compact, o, d, interpret=interpret)
        if bvh is not None:
            from tinyraytracer_tpu.ops.bvh import intersect_scene_bvh

            return intersect_scene_bvh(scene, bvh, o, d)
        return isect.intersect_scene(scene, o, d, exact=exact)

    def body(carry, bounce):
        o, d, throughput, color, alive, prev_diffuse = carry
        rec = intersect(o, d)

        hit_live = alive & rec.hit
        miss_live = alive & ~rec.hit

        # miss -> background, die (cpu.rs:58-60)
        color = color + jnp.where(
            miss_live[:, None], throughput * background[None, :], 0.0
        )
        # hit -> emission (cpu.rs:49-50). Under NEE the previous *diffuse*
        # bounce already accounted for direct light — but only from the
        # lights NEE samples (quad lights, _nee_contribution). Emission from
        # sphere-shaped lights must still be counted here or their diffuse
        # direct lighting is silently lost (biased darker).
        if nee:
            from tinyraytracer_tpu.models import materials as _mat

            nee_sampled = rec.is_quad & (rec.mat_kind == _mat.LIGHT)
            count_emit = hit_live & ~(prev_diffuse & nee_sampled)
        else:
            count_emit = hit_live
        color = color + jnp.where(count_emit[:, None], throughput * rec.emit, 0.0)

        if nee:
            color = color + _nee_contribution(
                scene, rec, hit_live, throughput, d,
                seed, pixel_id, sample_id, bounce, intersect,
            )

        new_d, attenuation, absorbed = scatter(
            d, rec, seed, pixel_id, sample_id, bounce
        )
        scattered = hit_live & ~absorbed
        throughput = jnp.where(scattered[:, None], throughput * attenuation, throughput)
        o = jnp.where(scattered[:, None], rec.point, o)
        d = jnp.where(scattered[:, None], new_d, d)
        alive = scattered
        from tinyraytracer_tpu.models import materials as mat

        prev_diffuse = scattered & (rec.mat_kind == mat.LAMBERTIAN)
        return (o, d, throughput, color, alive, prev_diffuse), None

    if remat:
        body = jax.checkpoint(body)
    bounces = jnp.arange(max_bounces, dtype=jnp.uint32)
    (_, _, _, color, _, _), _ = jax.lax.scan(body, init, bounces)
    return color


def _nee_contribution(
    scene, rec, hit_live, throughput, d, seed, pixel_id, sample_id, bounce,
    intersect,
):
    """Direct-light term via area sampling of quad lights.

    One light is chosen uniformly among the scene's quad lights per shading
    point; the estimator is weighted by the light count. The shadow test is
    detached (discrete visibility); every other factor differentiates.
    """
    from tinyraytracer_tpu.models import materials as mat
    from tinyraytracer_tpu.ops import rng

    # quad lights (static shapes; mask selects at runtime)
    light_mask = (
        jnp.take(scene.mat_kind, scene.quad_mat) == mat.LIGHT
    ) & scene.quad_valid                                  # (Nq,)
    n_lights = jnp.sum(light_mask.astype(jnp.int32))
    any_light = n_lights > 0

    u1, u2, u3, _ = rng.uniform4(
        seed, pixel_id, sample_id, jnp.uint32(0x40000000) + bounce
    )
    # pick the k-th light, k = floor(u3 * NL): index of the k-th True
    k = jnp.clip(
        (u3 * n_lights.astype(jnp.float32)).astype(jnp.int32), 0,
        jnp.maximum(n_lights - 1, 0),
    )                                                      # (R,)
    cum = jnp.cumsum(light_mask.astype(jnp.int32)) - 1     # (Nq,) 0-based
    # il[r] = first quad index whose cumulative count equals k[r]
    eq = (cum[None, :] == k[:, None]) & light_mask[None, :]
    il = jnp.argmax(eq, axis=1)                            # (R,)

    corner = jnp.take(scene.quad_corner, il, axis=0)
    lu = jnp.take(scene.quad_u, il, axis=0)
    lv = jnp.take(scene.quad_v, il, axis=0)
    l_emit = jnp.take(scene.mat_emit, jnp.take(scene.quad_mat, il), axis=0)

    y = corner + u1[:, None] * lu + u2[:, None] * lv       # point on light
    x = rec.point
    to_l = y - x
    r2 = jnp.sum(to_l * to_l, axis=-1)
    dist = jnp.sqrt(jnp.maximum(r2, 1e-12))
    w = to_l / dist[:, None]                               # unit, x -> y
    ln = jnp.cross(lu, lv)
    area = jnp.sqrt(jnp.maximum(jnp.sum(ln * ln, axis=-1), 1e-24))
    ln_unit = ln / area[:, None]
    cos_x = jnp.sum(rec.normal * w, axis=-1)
    cos_y = jnp.abs(jnp.sum(ln_unit * w, axis=-1))         # double-sided light

    # Only diffuse surfaces get NEE (specular transport stays BSDF-sampled).
    active = (
        hit_live & (rec.mat_kind == mat.LAMBERTIAN) & any_light & (cos_x > 0.0)
    )

    # Detached shadow ray: x (+ epsilon along w) -> y.
    sg = jax.lax.stop_gradient
    srec = intersect(sg(x), sg(w))
    visible = ~(srec.hit & (srec.t < sg(dist) * (1.0 - 1e-3)))

    # Soft-shadow surrogate gradient for SPHERE occluders: the hard
    # visibility above is detached, which silences the strongest positional
    # cue — the sphere's shadow. For each sphere, an analytic soft
    # visibility from the segment-to-center distance is attached as a
    # value-preserving ratio V_soft / stop_grad(V_soft) (forward value is
    # exactly the hard V; backward sees d(log V_soft)/d(center, radius)).
    # This is the practical stand-in for true silhouette edge sampling
    # (SURVEY.md §7 "edge-aware estimator").
    c_all = scene.sph_center                                # (Ns, 3)
    r_all = jnp.take(scene.sph_radius, jnp.arange(c_all.shape[0]))
    cx = c_all[None, :, :] - x[:, None, :]                  # (R, Ns, 3)
    s_along = jnp.sum(cx * w[:, None, :], axis=-1)          # (R, Ns)
    s_clamp = jnp.clip(s_along, 0.0, dist[:, None])
    closest = x[:, None, :] + s_clamp[..., None] * w[:, None, :]
    dsep = jnp.sqrt(
        jnp.maximum(jnp.sum((closest - c_all[None, :, :]) ** 2, axis=-1), 1e-12)
    )
    soft_w = 0.25 * jnp.abs(r_all)[None, :] + 1e-6
    v_soft_i = jax.nn.sigmoid((dsep - jnp.abs(r_all)[None, :]) / soft_w)
    v_soft_i = jnp.where(scene.sph_valid[None, :], v_soft_i, 1.0)
    v_soft = jnp.prod(v_soft_i, axis=-1)                    # (R,)
    v_ratio = v_soft / jnp.maximum(sg(v_soft), 1e-3)

    # f/pdf = (albedo/pi) * E * cos_x * |cos_y| * A * NL / r^2. The 1/r^2
    # term is unbounded for shading points adjacent to the light plane
    # (fireflies + exploding gradients); clamp it — the standard biased
    # stabilization, only active in the near-light sliver.
    geom = cos_x * cos_y * area * n_lights.astype(jnp.float32) / jnp.maximum(
        r2, 1e-12
    )
    geom = jnp.minimum(geom, 16.0 * jnp.pi)
    contrib = (
        throughput
        * rec.albedo
        * l_emit
        * (geom * v_ratio / jnp.pi)[:, None]
    )
    gate = (active & visible)[:, None]
    return jnp.where(gate, contrib, 0.0)


def render_pixels(
    scene: SceneArrays,
    camera: Camera,
    pixel_id,
    *,
    spp: int,
    max_bounces: int,
    background,
    seed,
    exact: bool = False,
    spp_offset=0,
    bvh=None,
    compact=None,
    interpret: bool = False,
    nee: bool = False,
) -> jax.Array:
    """Mean radiance over `spp` jittered samples for the given flat pixel ids.

    This is the fusion of the reference's three pipeline stages
    (pointgen -> sampler -> imager, renderer/renderer.rs:62-78) into one
    compiled program: generation, tracing, and accumulation never leave HBM.
    `pixel_id` may be any subset/shard of the image — the sharding unit.
    """
    background = jnp.asarray(background, jnp.float32)
    seed = jnp.uint32(seed)

    def round_body(acc, s):
        o, d = generate_rays(camera, pixel_id, s, seed)
        c = trace(
            scene, o, d, pixel_id, s, seed, max_bounces, background,
            exact=exact, bvh=bvh, compact=compact, interpret=interpret,
            nee=nee,
        )
        return acc + c, None

    samples = jnp.arange(spp, dtype=jnp.uint32) + jnp.uint32(spp_offset)
    acc, _ = jax.lax.scan(
        round_body, jnp.zeros((pixel_id.shape[0], 3), jnp.float32), samples
    )
    return acc / jnp.float32(spp)


@partial(
    jax.jit,
    static_argnames=("spp", "max_bounces", "exact", "interpret", "nee"),
)
def render_image(
    scene: SceneArrays,
    camera: Camera,
    *,
    spp: int,
    max_bounces: int,
    background,
    seed=0,
    exact: bool = False,
    bvh=None,
    compact=None,
    interpret: bool = False,
    nee: bool = False,
) -> jax.Array:
    """Render the full image. Returns (height, width, 3) linear radiance."""
    w, h = camera.width, camera.height
    pixel_id = jnp.arange(w * h, dtype=jnp.uint32)
    img = render_pixels(
        scene,
        camera,
        pixel_id,
        spp=spp,
        max_bounces=max_bounces,
        background=background,
        seed=seed,
        exact=exact,
        bvh=bvh,
        compact=compact,
        interpret=interpret,
        nee=nee,
    )
    return img.reshape(h, w, 3)
