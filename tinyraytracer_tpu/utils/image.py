"""Host-side image container and PNG I/O (utils/image.rs:5-111).

The framebuffer lives on device as a (H, W, 3) f32 array until the very end;
this wrapper only handles the host boundary: gamma, quantization, PNG encode.
PNG encoding prefers the native C++ encoder (native/, the TPU-framework
equivalent of the reference's `image` crate) and falls back to PIL.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from tinyraytracer_tpu.ops import tonemap


class Image:
    """Float image with optional gamma applied at construction, mirroring
    Image::new_with_gamma_correction (image.rs:29-36)."""

    def __init__(self, data: np.ndarray, gamma: Optional[float] = None):
        data = np.asarray(data, np.float32)
        if data.ndim != 3 or data.shape[-1] != 3:
            raise ValueError(f"expected (H, W, 3), got {data.shape}")
        if gamma is not None:
            data = np.maximum(data, 0.0) ** (1.0 / gamma)
        self._data = data

    @staticmethod
    def from_linear(data, gamma: float = tonemap.GAMMA) -> "Image":
        return Image(np.asarray(data), gamma=gamma)

    @property
    def data(self) -> np.ndarray:
        return self._data

    def size(self) -> Tuple[int, int]:
        h, w, _ = self._data.shape
        return (w, h)

    def get_pixel(self, x: int, y: int) -> np.ndarray:
        return self._data[y, x]

    def to_u8(self) -> np.ndarray:
        return np.asarray(
            np.clip(self._data, 0.0, tonemap.INTENSITY_MAX) * 255.0, np.uint8
        )

    def save(self, filename: str) -> None:
        rgb = self.to_u8()
        # Graceful fallback covers a MISSING native encoder only (library
        # unbuilt / import fails); a runtime error from a present encoder is
        # a real defect and must surface — same policy as the native BVH
        # builder (ops/bvh.py:160-164).
        try:
            from tinyraytracer_tpu.native import runtime
        except ImportError:
            runtime = None
        if runtime is not None and runtime.available():
            runtime.write_png(filename, rgb)
            return
        from PIL import Image as PILImage

        PILImage.fromarray(rgb, mode="RGB").save(filename)
