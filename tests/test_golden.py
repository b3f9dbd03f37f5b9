"""Golden statistical parity vs the reference's checked-in renders.

Runs the full configs only on TPU (CPU would take many minutes at these
spp); on CPU a reduced-size smoke variant of the quad scene still guards
the comparison machinery. See scripts/golden_check.py for the method and
the Cornell z-fight tolerance rationale.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

REF = "/root/reference"


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/output/output.png"),
    reason="reference renders not mounted",
)
def test_golden_quad_scene_small():
    """Block-mean agreement on a downscaled five-quad render: the golden is
    400x300; render at 200x150 and compare 2x-downsampled golden blocks."""
    from PIL import Image as PILImage

    import golden_check as gc
    from tinyraytracer_tpu.models import presets
    from tinyraytracer_tpu.renderer import Renderer

    golden = np.asarray(
        PILImage.open(f"{REF}/raytracer/output/quad_test.png")
    ).astype(np.float64)
    # 2x2 box-downsample the golden to 200x150
    golden_small = golden.reshape(150, 2, 200, 2, 3).mean(axis=(1, 3))

    world, camera, kw = presets.five_quads(width=200, height=150)
    r = Renderer(samples_per_pixel=40, max_bounces=10,
                 background_color=kw["background"], seed=9)
    ours = r.render(camera, world).to_u8().astype(np.float64)

    mean_diff = np.abs(ours.mean(axis=(0, 1)) - golden_small.mean(axis=(0, 1)))
    assert mean_diff.max() < 3.0, mean_diff
    bdiff = np.abs(gc.block_means(ours, 10) - gc.block_means(golden_small, 10))
    assert np.percentile(bdiff, 99) < 12.0, np.percentile(bdiff, 99)
