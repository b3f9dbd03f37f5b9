"""Probe: measure the classic fused diff kernel's TRUE scoped-VMEM size
across (max_bounces, candidate rows, lane tile) to calibrate the
_classic_tile feasibility model (round-4 item 1: many-sphere scenes at
north-star bounce depths OOM'd the fixed 256-lane tile).

Trick: TINYRT_DIFF_VMEM_CAP=1 makes every Mosaic compile fail with
"Scoped allocation with size <X> and limit ..." — the exact scoped size —
without ever touching the chip. (scratch)
"""
import os
import re
import sys

os.environ["TINYRT_DIFF_VMEM_CAP"] = os.environ.get(
    "TINYRT_DIFF_VMEM_CAP", str(1024 * 1024))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", None)

from probe_manysphere import many_sphere_scene  # noqa: E402
from tinyraytracer_tpu.ops.diffkernel import (  # noqa: E402
    build_diff_static, render_value_and_grad)

SIZE_RE = re.compile(r"[Ss]coped allocation with size ([0-9.]+)([MKG])")


def scoped_mb(n_sph, mb, tr, spp=4, nee=True, sil=True):
    world, cam = many_sphere_scene(n_sph)
    scene = world.build()
    st = build_diff_static(scene)
    tgt = jnp.zeros((cam.height, cam.width, 3), jnp.float32)

    def run():
        return render_value_and_grad(
            scene, cam, tgt, spp=spp, max_bounces=mb,
            background=(0.0, 0.0, 0.0), seed=0, nee=nee, silhouette=sil,
            packed=False, static=st, tile=tr)

    try:
        jax.block_until_ready(jax.jit(run).lower().compile()())
        return None  # fit under the probe cap (shouldn't happen at cap=1MB)
    except Exception as e:  # noqa: BLE001
        m = SIZE_RE.search(str(e))
        if not m:
            raise
        mult = {"K": 1e-3, "M": 1.0, "G": 1e3}[m.group(2)]
        return float(m.group(1)) * mult, st.ns + st.nq


if __name__ == "__main__":
    os.environ.setdefault("PROBE_WH", "16")
    for tr in (256, 128):
        for mb in (6, 12, 20):
            for n in (2, 56, 120):
                out = scoped_mb(n, mb, tr)
                if out is None:
                    print(f"tr={tr} mb={mb:2d} ns={n:3d}: under cap")
                else:
                    size, rows = out
                    print(f"tr={tr} mb={mb:2d} ns={n:3d} rows={rows:3d}: "
                          f"scoped {size:7.2f} MB", flush=True)
