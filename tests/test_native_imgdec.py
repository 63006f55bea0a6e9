"""Native C++ image decoder (csrc/imgdec.cpp) vs the PIL ingest path.

The native path is opt-in (``--img_decoder native``) because DCT-scaled JPEG
decode is not bit-identical to PIL full-decode + resize (reference decodes
full-scale with PIL per sample, datasets.py:154-181); these tests bound the
deviation: exact on PNG, bit-parity on full-scale JPEG decode, <=2 LSB on the
triangle resize, PSNR >= 45 dB when DCT scaling engages.
"""

import os

import numpy as np
import pytest
from PIL import Image

from socialmedia_textimage_classification_auxlosses_tpu.data import native
from socialmedia_textimage_classification_auxlosses_tpu.data.images import (
    load_pixels_u8, resize_to_u8)

pytestmark = pytest.mark.skipif(
    not native.imgdec_available(),
    reason="native imgdec unavailable (no toolchain or libjpeg/libpng)")


@pytest.fixture
def imgs(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (300, 400, 3), np.uint8)
    png = tmp_path / "a.png"
    jpg = tmp_path / "a.jpg"
    Image.fromarray(arr).save(png)
    Image.fromarray(arr).save(jpg, quality=90)
    return arr, str(png), str(jpg)


def test_png_full_decode_exact(imgs):
    arr, png, _ = imgs
    out = native.native_decode_full(png)
    assert np.array_equal(out, arr)


def test_jpeg_full_decode_matches_pil(imgs):
    """Both decoders run libjpeg JDCT_ISLOW full-scale -> identical bytes."""
    _, _, jpg = imgs
    pil = np.asarray(Image.open(jpg).convert("RGB"))
    out = native.native_decode_full(jpg)
    assert np.array_equal(out, pil)


def test_resize_within_1lsb_of_pil(imgs):
    arr, png, _ = imgs
    ref = resize_to_u8(Image.open(png).convert("RGB"), 224)
    nat = native.native_decode_resize(png, 224)
    assert np.abs(ref.astype(int) - nat.astype(int)).max() <= 2


def test_dct_scaled_decode_psnr(tmp_path):
    """A 3200x2400 JPEG headed for 224px rides libjpeg's 1/8 DCT scaling;
    the result must stay visually identical to PIL full decode + resize."""
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (30, 40, 3), np.uint8)
    big = np.asarray(
        Image.fromarray(base).resize((3200, 2400), Image.BILINEAR), np.uint8)
    jpg = tmp_path / "big.jpg"
    Image.fromarray(big).save(jpg, quality=90)
    ref = resize_to_u8(Image.open(jpg).convert("RGB"), 224).astype(float)
    nat = native.native_decode_resize(str(jpg), 224).astype(float)
    mse = ((ref - nat) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr >= 45.0, psnr


def test_load_pixels_u8_env_switch(imgs, tmp_path, monkeypatch):
    """SMTC_IMG_DECODER=native routes load_pixels_u8 through the C++ decoder
    (identical within resize tolerance), including the jpg->png fallback."""
    arr, _, _ = imgs
    fmt = str(tmp_path / "a.jpg").replace("a.jpg", "{}.jpg")
    ref = load_pixels_u8(fmt, "a", size=224)
    monkeypatch.setenv("SMTC_IMG_DECODER", "native")
    nat = load_pixels_u8(fmt, "a", size=224)
    assert np.abs(ref.astype(int) - nat.astype(int)).max() <= 2
    # jpg->png fallback: only a PNG exists under a .jpg path format
    only_png = tmp_path / "fb"
    only_png.mkdir()
    Image.fromarray(arr).save(only_png / "x.png")
    fmt2 = str(only_png / "{}.jpg")
    ref2 = load_pixels_u8(fmt2, "x", size=224)
    nat2 = load_pixels_u8(fmt2, "x", size=224)
    assert np.abs(ref2.astype(int) - nat2.astype(int)).max() <= 2


def test_cli_flag_publishes_env(monkeypatch):
    import argparse

    from socialmedia_textimage_classification_auxlosses_tpu.cli._common import (
        add_common_args, publish_img_decoder)

    monkeypatch.delenv("SMTC_IMG_DECODER", raising=False)
    p = argparse.ArgumentParser()
    add_common_args(p)
    args = p.parse_args(["--task", "3", "--img_decoder", "native"])
    assert args.img_decoder == "native"
    publish_img_decoder(args)
    assert os.environ["SMTC_IMG_DECODER"] == "native"
    # the pil DEFAULT must RESET the env: a later in-process main() without
    # the flag may not inherit 'native' from an earlier invocation
    publish_img_decoder(p.parse_args(["--task", "3"]))
    assert os.environ["SMTC_IMG_DECODER"] == "pil"


def test_decode_failure_returns_none(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not an image")
    assert native.native_decode_resize(str(bad), 224) is None

