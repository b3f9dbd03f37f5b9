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
from typing import Optional, Tuple

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
    """
    r = origins.shape[0]
    init = (
        origins,
        directions,
        jnp.ones((r, 3), jnp.float32),   # throughput
        jnp.zeros((r, 3), jnp.float32),  # accumulated color
        jnp.ones((r,), bool),            # alive mask
    )

    def body(carry, bounce):
        o, d, throughput, color, alive = carry
        if compact is not None:
            from tinyraytracer_tpu.ops.intersect_pallas import (
                intersect_scene_compact,
            )

            rec = intersect_scene_compact(scene, compact, o, d, interpret=interpret)
        elif bvh is not None:
            from tinyraytracer_tpu.ops.bvh import intersect_scene_bvh

            rec = intersect_scene_bvh(scene, bvh, o, d)
        else:
            rec = isect.intersect_scene(scene, o, d, exact=exact)

        hit_live = alive & rec.hit
        miss_live = alive & ~rec.hit

        # miss -> background, die (cpu.rs:58-60)
        color = color + jnp.where(
            miss_live[:, None], throughput * background[None, :], 0.0
        )
        # hit -> emission (cpu.rs:49-50)
        color = color + jnp.where(hit_live[:, None], throughput * rec.emit, 0.0)

        new_d, attenuation, absorbed = scatter(
            d, rec, seed, pixel_id, sample_id, bounce
        )
        scattered = hit_live & ~absorbed
        throughput = jnp.where(scattered[:, None], throughput * attenuation, throughput)
        o = jnp.where(scattered[:, None], rec.point, o)
        d = jnp.where(scattered[:, None], new_d, d)
        alive = scattered
        return (o, d, throughput, color, alive), None

    if remat:
        body = jax.checkpoint(body)
    bounces = jnp.arange(max_bounces, dtype=jnp.uint32)
    (_, _, _, color, _), _ = jax.lax.scan(body, init, bounces)
    return color


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
        )
        return acc + c, None

    samples = jnp.arange(spp, dtype=jnp.uint32) + jnp.uint32(spp_offset)
    acc, _ = jax.lax.scan(
        round_body, jnp.zeros((pixel_id.shape[0], 3), jnp.float32), samples
    )
    return acc / jnp.float32(spp)


@partial(
    jax.jit,
    static_argnames=("spp", "max_bounces", "exact", "interpret"),
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
    )
    return img.reshape(h, w, 3)
