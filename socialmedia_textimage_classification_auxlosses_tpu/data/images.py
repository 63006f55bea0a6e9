"""Image ingest (SURVEY.md section 2.2): decode + resize on host to *uint8*,
normalize on device inside the compiled step.

The reference re-runs PIL decode + HF feature-extractor resize/normalize per
sample per epoch inside DataLoader workers (reference ``datasets.py:154-181``)
and ships float32 pixel tensors to the device. Here images are decoded and
resized once into a uint8 cache (4x less host RAM and host->device traffic);
the (x/255 - mean)/std normalization is a fused elementwise op in the jitted
forward, effectively free next to the patch-embedding conv.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _native_enabled() -> bool:
    """Opt-in native C++ decode+resize (csrc/imgdec.cpp): JPEG rides libjpeg
    DCT scaling so large photos never materialize at full resolution. Not
    bit-identical to PIL full-decode+resize (deviation bounded in
    tests/test_native_imgdec.py), hence opt-in via ``--img_decoder native``
    (sets SMTC_IMG_DECODER)."""
    return os.environ.get("SMTC_IMG_DECODER", "pil") == "native"


def open_image(path_fmt: str, data_id, empty_image: Optional[str] = None,
               on_missing: str = "error"):
    """PIL open with the reference's jpg->png fallback
    (reference datasets.py:164-167)."""
    from PIL import Image

    if empty_image is not None:
        return Image.open(empty_image).convert("RGB")
    path = path_fmt.format(data_id)
    try:
        return Image.open(path).convert("RGB")
    except Exception:
        alt = path_fmt.replace("jpg", "png").format(data_id)
        try:
            return Image.open(alt).convert("RGB")
        except Exception:
            if on_missing == "zeros":
                from PIL import Image as I

                return I.new("RGB", (224, 224))
            raise


def resize_to_u8(img, size: int = 224, center_crop_from: Optional[int] = None) -> np.ndarray:
    """Resize (optionally shorter-side resize + center crop, the torchvision
    CNN recipe, reference utils.py:33-44) to (size, size, 3) uint8."""
    from PIL import Image

    if center_crop_from:
        w, h = img.size
        short = min(w, h)
        nw, nh = int(round(w * center_crop_from / short)), int(round(h * center_crop_from / short))
        img = img.resize((nw, nh), Image.BILINEAR)
        left, top = (nw - size) // 2, (nh - size) // 2
        img = img.crop((left, top, left + size, top + size))
    else:
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def load_pixels_u8(
    path_fmt: str, data_id, size: int = 224, empty_image: Optional[str] = None,
    center_crop_from: Optional[int] = None, on_missing: str = "error",
) -> np.ndarray:
    if (_native_enabled() and empty_image is None
            and center_crop_from is None):
        from .native import native_decode_resize

        # same jpg->png fallback order as open_image (reference
        # datasets.py:164-167); the C++ decoder sniffs the actual format
        for path in (path_fmt.format(data_id),
                     path_fmt.replace("jpg", "png").format(data_id)):
            if os.path.isfile(path):
                px = native_decode_resize(path, size)
                if px is not None:
                    return px
                break  # file exists but native decode failed -> PIL fallback
    return resize_to_u8(
        open_image(path_fmt, data_id, empty_image, on_missing),
        size=size, center_crop_from=center_crop_from,
    )


def normalize_on_device(pixels_u8, mean, std, dtype):
    """uint8 NHWC -> normalized NHWC in compute dtype. Pure jnp; lives inside
    the jitted step so XLA fuses it with the patch conv."""
    import jax.numpy as jnp

    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, 3)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, 3)
    x = pixels_u8.astype(jnp.float32) / 255.0
    return ((x - mean) / std).astype(dtype)
