"""RPN proposal-budget knobs (``--rpn_pre_topk``/``--rpn_post_topk``).

``apply_topk_overrides`` (models/frcnn.py) is the single seam through which
the cacher, the server, and the perf tool reduce the detector's RPN
pre-NMS sort width and the post-NMS ROI count fed to res5 (the device-time
lever at full geometry). Defaults stay the published VG values (6000/1000
— the reference's external detector, obj_features.py:142-173); these tests
pin the no-op case bitwise and the contract under real reduction."""

import dataclasses

import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.models import (
    frcnn as FR,
)

TINY = FR.TINY


def _image(h=50, w=80, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (h, w, 3), np.uint8)


def test_no_overrides_returns_same_config():
    cfg = FR.FrcnnConfig()
    assert FR.apply_topk_overrides(cfg, None, None) is cfg


def test_override_values_land_in_config():
    cfg = FR.apply_topk_overrides(FR.FrcnnConfig(), 2000, 300)
    assert cfg.rpn_pre_nms_topk == 2000
    assert cfg.rpn_post_nms_topk == 300
    # everything else untouched
    assert cfg.max_detections == FR.FrcnnConfig().max_detections


def test_invalid_budgets_rejected():
    cfg = FR.FrcnnConfig()
    with pytest.raises(ValueError):
        FR.apply_topk_overrides(cfg, 0, None)
    # post-NMS budget below the final selection size can't fill 36 regions
    with pytest.raises(ValueError):
        FR.apply_topk_overrides(cfg, None, cfg.max_detections - 1)
    # a pre cut that starves the default post budget below max_detections
    with pytest.raises(ValueError):
        FR.apply_topk_overrides(cfg, cfg.max_detections - 1, None)


def test_post_budget_clamped_to_pre():
    """post can never exceed pre — the fused path fills its post-sized
    proposal tensor from the pre-topk survivors."""
    cfg = FR.apply_topk_overrides(FR.FrcnnConfig(), 100, None)
    assert cfg.rpn_post_nms_topk == 100
    cfg = FR.apply_topk_overrides(FR.FrcnnConfig(), 200, 500)
    assert cfg.rpn_post_nms_topk == 200


def _total_anchors(det, img):
    canvas, size_hw, _ = FR.preprocess_image(img, det.cfg)
    gh, gw = canvas.shape[0] // det.cfg.stride, canvas.shape[1] // det.cfg.stride
    return gh * gw * det.cfg.num_anchors


def test_pre_topk_at_anchor_count_is_bitwise_noop():
    """pre_topk >= the dense anchor count selects everything — outputs must
    be bitwise identical to the default config (same weights)."""
    det = FR.FrcnnDetector(TINY)
    img = _image()
    n_anch = _total_anchors(det, img)
    assert n_anch <= TINY.rpn_pre_nms_topk  # tiny default already covers it
    cfg2 = FR.apply_topk_overrides(TINY, n_anch, None)
    det2 = FR.FrcnnDetector(cfg2, params=det.params)
    a = det.detect(img)
    b = det2.detect(img)
    np.testing.assert_array_equal(a["roi_features"], b["roi_features"])
    np.testing.assert_array_equal(a["normalized_boxes"],
                                  b["normalized_boxes"])


@pytest.mark.parametrize("pre,post", [(8, None), (None, 8), (8, 8)])
def test_reduced_budget_keeps_output_contract(pre, post):
    """Aggressively pruned budgets still produce the (max_detections,
    feat_dim) contract with sane normalized boxes — the knob trades recall,
    never shape or validity."""
    cfg = FR.apply_topk_overrides(TINY, pre, post)
    det = FR.FrcnnDetector(cfg)
    out = det.detect(_image())
    assert out["roi_features"].shape == (TINY.max_detections, TINY.feat_dim)
    assert out["normalized_boxes"].shape == (TINY.max_detections, 4)
    assert np.all(np.isfinite(out["roi_features"]))
    nb = out["normalized_boxes"]
    assert np.all(nb >= -1e-5) and np.all(nb <= 1.0 + 1e-5)


def test_reduced_post_topk_proposals_are_score_prefix_of_full():
    """Greedy RPN NMS walks boxes in score order and ``max_out`` only
    truncates the walk, so a reduced post-NMS budget must keep EXACTLY the
    top-scoring prefix of the full budget's surviving proposals (same
    weights, same image) — the cut prunes the tail, never reorders."""
    import jax.numpy as jnp

    det_full = FR.FrcnnDetector(TINY)
    cfg_cut = FR.apply_topk_overrides(TINY, None, 6)
    det_cut = FR.FrcnnDetector(cfg_cut, params=det_full.params)
    img = _image(seed=11)
    canvas, size_hw, _ = FR.preprocess_image(img, TINY)
    _, logits, deltas = det_full._stage1(
        det_full.params["stage1"], canvas[None],
        jnp.asarray(np.asarray([size_hw], np.float32)))
    logits = np.asarray(logits)[0]
    deltas = np.asarray(deltas)[0]
    boxes_full, sc_full = det_full._rpn_proposals(logits, deltas, size_hw)
    boxes_cut, sc_cut = det_cut._rpn_proposals(logits, deltas, size_hw)
    k = boxes_cut.shape[0]
    assert k <= 6 and k <= boxes_full.shape[0]
    np.testing.assert_array_equal(boxes_cut, boxes_full[:k])
    np.testing.assert_array_equal(sc_cut, sc_full[:k])
