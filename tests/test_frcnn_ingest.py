"""Device-ingest path of the FRCNN detector (models/frcnn.py).

``detect_batch(ingest="device")`` ships ORIGINAL uint8 pixels and resizes
on device with torch ``F.interpolate(bilinear, align_corners=False)``
semantics — the float branch of the reference transform family
(detectron2-style ``ResizeShortestEdge``; the uint8/PIL branch is the
parity default, ``preprocess_image``). Tests: torch parity of the device
resize, identity-resize bitwise-equivalence of the full pipeline, the
PIL-vs-device feature delta bound, and the large-photo fallback."""

import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.models import (
    frcnn as FR,
)


@pytest.mark.parametrize("h0,w0,h1,w1", [
    (17, 23, 31, 42),    # upscale
    (40, 60, 20, 30),    # downscale
    (24, 24, 24, 24),    # identity
    (33, 20, 64, 39),    # mixed, odd sizes
])
def test_device_resize_matches_torch_bilinear(h0, w0, h1, w1):
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h0, w0, 3), np.uint8)
    # bucket-pad the original and use a larger static canvas, as the
    # detector does — the matrices must mask pad rows/cols exactly
    bh, bw = h0 + 7, w0 + 5
    ph, pw = h1 + 9, w1 + 3
    padded = np.zeros((bh, bw, 3), np.uint8)
    padded[:h0, :w0] = img
    out = np.asarray(FR.device_resize_canvas(
        padded, np.asarray([h0, w0], np.int32),
        np.asarray([h1, w1], np.int32), ph, pw))

    t = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
    ref = F.interpolate(t, (h1, w1), mode="bilinear",
                        align_corners=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out[:h1, :w1], ref, rtol=1e-5, atol=1e-3)
    assert np.all(out[h1:] == 0) and np.all(out[:, w1:] == 0)


def _tiny_detector():
    return FR.FrcnnDetector(FR.TINY)


def test_identity_resize_matches_pil_path_exactly():
    """An image already at the target geometry resizes to ITSELF on
    device, so the only difference vs the PIL path is float-vs-uint8
    canvas dtype — results must agree to float tolerance."""
    det = _tiny_detector()
    cfg = det.cfg
    h0 = cfg.min_size
    w0 = cfg.max_size  # exactly the landscape canvas geometry pre-pad
    h1, w1, _, _ = FR.preprocess_geometry(h0, w0, cfg)
    assert (h1, w1) == (h0, w0), "geometry must be identity for this test"
    img = np.random.RandomState(1).randint(0, 255, (h0, w0, 3), np.uint8)
    a = det.detect_batch([img], ingest="pil")[0]
    b = det.detect_batch([img], ingest="device")[0]
    np.testing.assert_allclose(a["roi_features"], b["roi_features"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(a["normalized_boxes"], b["normalized_boxes"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(a["classes"], b["classes"])


def test_pil_vs_device_delta_is_resize_quantization_only():
    """A genuinely-resized image: PIL (uint8-quantized) vs device (float
    bilinear) canvases differ by sub-1/255-scale pixel rounding; the
    downstream ROI features must stay close — the quantified deviation
    bound the --frcnn_ingest docs point at."""
    det = _tiny_detector()
    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 255, (50, 70, 3), np.uint8),
            rng.randint(0, 255, (96, 64, 3), np.uint8)]  # portrait too
    a = det.detect_batch(imgs, ingest="pil")
    b = det.detect_batch(imgs, ingest="device")
    for ra, rb in zip(a, b):
        assert ra["roi_features"].shape == rb["roi_features"].shape
        # random-init tiny detector: features are O(1); the resize delta
        # must not blow past a small fraction of the feature scale
        scale = max(np.abs(ra["roi_features"]).max(), 1e-3)
        delta = np.abs(ra["roi_features"] - rb["roi_features"]).max()
        assert delta < 0.15 * scale, (delta, scale)


def test_large_photo_falls_back_to_pil_bytes():
    """preprocess_image_original refuses photos whose bucketed original
    is no smaller than the canvas — the caller ships the PIL canvas."""
    cfg = FR.TINY
    big = np.zeros((4 * cfg.max_size, 4 * cfg.max_size, 3), np.uint8)
    assert FR.preprocess_image_original(big, cfg) is None
    small = np.zeros((cfg.min_size // 2, cfg.min_size // 2, 3), np.uint8)
    r = FR.preprocess_image_original(small, cfg)
    assert r is not None
    orig, hw0, hw1, (ph, pw), _ = r
    assert orig.nbytes < ph * pw * 3
    # mixed batch (fallback + device) must still produce full results
    det = _tiny_detector()
    outs = det.detect_batch([big[:200, :200], small], ingest="device")
    assert len(outs) == 2
    for o in outs:
        assert o["roi_features"].shape[0] == cfg.max_detections


def test_device_ingest_async_matches_sync():
    det = _tiny_detector()
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 255, (40, 56, 3), np.uint8) for _ in range(3)]
    sync = det.detect_batch(imgs, ingest="device", pad_to=4)
    fetch = det.detect_batch_async(imgs, ingest="device", pad_to=4)
    for s, a in zip(sync, fetch()):
        np.testing.assert_array_equal(s["roi_features"], a["roi_features"])
