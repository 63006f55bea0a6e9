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


def vilt_exact_geometry(height: int, width: int, shortest: int = 384,
                        size_divisor: int = 32):
    """HF ``ViltImageProcessor`` output geometry (the reference's per-sample
    preprocessing, reference datasets.py:224-227): shortest edge -> 384
    preserving aspect, longer edge capped at ``int(1333/800*384) = 639``,
    both floored to a multiple of 32. The largest reachable dimension is
    therefore 608 (the ``vilt_canvas`` constant). Degenerate aspect ratios
    that HF would collapse to a zero dimension are clamped to one divisor
    (HF itself crashes there)."""
    longer = int(1333 / 800 * shortest)
    scale = shortest / min(height, width)
    if height < width:
        nh, nw = float(shortest), scale * width
    else:
        nh, nw = scale * height, float(shortest)
    if max(nh, nw) > longer:
        s2 = longer / max(nh, nw)
        nh, nw = nh * s2, nw * s2
    nh, nw = int(nh + 0.5), int(nw + 0.5)
    nh = max(nh // size_divisor * size_divisor, size_divisor)
    nw = max(nw // size_divisor * size_divisor, size_divisor)
    return nh, nw


def vilt_canvas(shortest: int = 384, size_divisor: int = 32) -> int:
    """Smallest static square covering every ``vilt_exact_geometry`` output
    (XLA static shapes vs the reference's pad-to-batch-max collate,
    reference mm_early.py:205-226 — extra area is fully masked)."""
    longer = int(1333 / 800 * shortest)
    return max(longer // size_divisor * size_divisor, shortest)


def vilt_exact_resize_u8(img, shortest: int = 384, size_divisor: int = 32):
    """Aspect-preserving BICUBIC resize per HF ``ViltImageProcessor`` (the
    resample/geometry the reference's ``ViltProcessor`` applies per sample),
    pasted top-left into the fixed uint8 canvas. Returns ``(frame, (h, w))``
    — the true pixel extent drives the patch mask and per-sample
    position-embedding interpolation in models/vilt.py."""
    from PIL import Image

    w, h = img.size
    nh, nw = vilt_exact_geometry(h, w, shortest, size_divisor)
    canvas = vilt_canvas(shortest, size_divisor)
    frame = np.zeros((canvas, canvas, 3), np.uint8)
    frame[:nh, :nw] = np.asarray(img.resize((nw, nh), Image.BICUBIC), np.uint8)
    return frame, (nh, nw)


def normalize_on_device(pixels_u8, mean, std, dtype):
    """uint8 NHWC -> normalized NHWC in compute dtype. Pure jnp; lives inside
    the jitted step so XLA fuses it with the patch conv."""
    import jax.numpy as jnp

    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, 3)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, 3)
    x = pixels_u8.astype(jnp.float32) / 255.0
    return ((x - mean) / std).astype(dtype)
