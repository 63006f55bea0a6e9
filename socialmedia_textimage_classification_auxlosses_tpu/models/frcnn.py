"""Faster-R-CNN object-feature extractor (JAX/Flax, inference path).

The reference computes 36-region ROI features + normalized boxes with the
Hugging Face research-projects LXMERT detector ``GeneralizedRCNN`` loaded
from ``unc-nlp/frcnn-vg-finetuned`` (reference ``models/obj_features.py:
142-173``, ``preprocessing/image_processing.py:18-37``, checkpoint name at
``models/config.py:149``). That ``lxmert_scripts`` package is NOT vendored in
the reference repo (SURVEY.md section 2.1) — this module is a from-scratch
TPU-native reimplementation of the same detector family's inference:

    Caffe-style ResNet-C4 backbone (stride-in-1x1 bottlenecks, frozen BN)
    -> RPN over res4 (anchors sizes 32..512 x ratios 0.5/1/2, stride 16)
    -> exact greedy NMS -> Res5 ROI head over pooled proposals
    -> class scores + class-specific box regression -> per-class NMS
    -> top-``max_detections`` (36) regions:
         roi_features (36, 2048)  — mean-pooled res5 outputs
         normalized_boxes (36, 4) — x0,y0,x1,y1 in [0,1] of the resized image

Staged TPU-first execution, not a translation of the torch detector:

* the dense per-pixel work (backbone + RPN head; ROI pooling + res5 + output
  heads) runs as TWO jitted stages with fully STATIC shapes — fixed padded
  input geometry, ``lax.top_k`` proposal selection, a fixed proposal count
  with a validity mask, and ROI pooling chunked under ``lax.map`` to bound
  HBM;
* the tiny sequential decisions (greedy NMS over score-sorted boxes, the
  final per-class selection) run on host numpy between the stages. The
  detector is an offline cacher — the reference runs it once per dataset
  (obj_features.py:146-147 resumability) — so the design spends the MXU on
  the conv stages and keeps data-dependent control flow out of XLA instead
  of forcing a 6000-iteration sequential suppression loop through ``lax``.

Fidelity notes (the upstream detector code/checkpoint are unavailable in
this hermetic environment; the layout below follows the Detectron2-style
py-bottom-up-attention architecture the unc-nlp checkpoint descends from):

* ROI pooling here is ROIAlign (``aligned=False`` legacy coordinates, fixed
  ``sampling_ratio=2``) — gather-based and static-shaped, the XLA-friendly
  pooler. The original Caffe detector used quantized ROIPool; features from
  the two poolers differ slightly. For bit-parity with reference-produced
  dumps use ``RoiFeatureCache.import_reference_dumps`` (data/cache.py).
* background class column is LAST (Detectron2 convention).
* numerical parity of this implementation is enforced against an
  independent torch twin at small scale (tests/test_frcnn.py), and the
  checkpoint importer is round-tripped through a state dict with the
  published key layout.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.logging import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass(frozen=True)
class FrcnnConfig:
    """Geometry/thresholds of the VG detector (values as published for
    unc-nlp/frcnn-vg-finetuned; shrink for tests)."""

    stem_features: int = 64
    stage_sizes: Tuple[int, ...] = (3, 4, 23)   # res2..res4 (R101-C4)
    res5_blocks: int = 3
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    stride: int = 16                            # res4 stride
    rpn_pre_nms_topk: int = 6000
    rpn_post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_min_box_size: float = 0.0
    box_score_thresh: float = 0.2
    box_nms_thresh: float = 0.5
    max_detections: int = 36
    min_detections: int = 36
    num_classes: int = 1600                     # VG objects (bg column last)
    feat_dim: int = 2048
    pooler_resolution: int = 14
    sampling_ratio: int = 2
    rpn_bbox_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    box_bbox_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    pixel_mean_bgr: Tuple[float, ...] = (102.9801, 115.9465, 122.7754)
    min_size: int = 800
    max_size: int = 1333
    size_divisibility: int = 32
    dtype: str = "float32"

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_sizes) * len(self.anchor_ratios)

    @property
    def res4_features(self) -> int:
        # stem -> 4*stem after res2, doubling per stage
        return self.stem_features * 4 * (2 ** (len(self.stage_sizes) - 1))


TINY = FrcnnConfig(
    stem_features=8, stage_sizes=(1, 1, 1), res5_blocks=1,
    anchor_sizes=(16, 32), anchor_ratios=(1.0,), rpn_pre_nms_topk=64,
    rpn_post_nms_topk=16, max_detections=5, min_detections=5, num_classes=7,
    feat_dim=64, pooler_resolution=4, min_size=64, max_size=96,
    box_score_thresh=0.0,
    # damp decoded shifts so RANDOM-INIT smoke tests keep live proposals
    # regardless of the PRNG draw (an untrained deltas head emits +-50-100;
    # at weights (1,..) every box decodes off-canvas and the detector
    # correctly returns zero regions). Trained checkpoints use the full
    # config; the torch twin shares this cfg so parity is unaffected.
    rpn_bbox_weights=(25.0, 25.0, 12.5, 12.5),
)


def apply_topk_overrides(cfg: "FrcnnConfig", pre_topk=None, post_topk=None):
    """RPN proposal-budget knobs (``--rpn_pre_topk``/``--rpn_post_topk``).

    ``pre_topk`` caps the score-ordered anchor set entering RPN NMS (device
    sort + masked-NMS width); ``post_topk`` caps the ROI count fed to res5 —
    the per-ROI conv stage that dominates device time at full geometry.
    Both default to the published VG-detector values (6000/1000, matching
    the reference's external detector, obj_features.py:142-173); any
    reduction is a speed/recall trade and is logged loudly so cached
    features are never silently built from a pruned proposal set."""
    if pre_topk is None and post_topk is None:
        return cfg
    kw = {}
    if pre_topk is not None:
        if pre_topk < 1:
            raise ValueError(f"rpn_pre_topk must be >= 1, got {pre_topk}")
        kw["rpn_pre_nms_topk"] = int(pre_topk)
    if post_topk is not None:
        if post_topk < cfg.max_detections:
            raise ValueError(
                f"rpn_post_topk {post_topk} < max_detections "
                f"{cfg.max_detections}: the final selection needs at least "
                "that many candidate ROIs")
        kw["rpn_post_nms_topk"] = int(post_topk)
    # the post-NMS budget can never exceed the pre-NMS candidate set (the
    # fused device path sizes its proposal tensor to post and fills it from
    # the pre-topk survivors)
    pre_eff = kw.get("rpn_pre_nms_topk", cfg.rpn_pre_nms_topk)
    post_eff = min(kw.get("rpn_post_nms_topk", cfg.rpn_post_nms_topk),
                   pre_eff)
    if post_eff < cfg.max_detections:
        raise ValueError(
            f"effective rpn_post_topk {post_eff} < max_detections "
            f"{cfg.max_detections}: the final selection needs at least "
            "that many candidate ROIs")
    kw["rpn_post_nms_topk"] = post_eff
    new = dataclasses.replace(cfg, **kw)
    if (new.rpn_pre_nms_topk < cfg.rpn_pre_nms_topk
            or new.rpn_post_nms_topk < cfg.rpn_post_nms_topk):
        logger.warning(
            "FRCNN RPN budget reduced: pre-NMS %d->%d, post-NMS %d->%d — "
            "faster, but a recall trade vs the published detector; "
            "validate on real weights before trusting cached features",
            cfg.rpn_pre_nms_topk, new.rpn_pre_nms_topk,
            cfg.rpn_post_nms_topk, new.rpn_post_nms_topk)
    return new


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class FrozenBN(nn.Module):
    """Inference-frozen batch norm: the four torch buffers live as ordinary
    params (never trained — the detector is an offline feature extractor)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = w * jax.lax.rsqrt(var + self.eps)
        return x * scale.astype(x.dtype) + (b - mean * scale).astype(x.dtype)


class CaffeBottleneck(nn.Module):
    """Detectron ``BottleneckBlock`` with ``stride_in_1x1=True`` (the Caffe
    ResNet quirk: the stage stride sits on the FIRST 1x1 conv)."""

    features: int           # bottleneck width; output is 4x
    strides: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = jnp.dtype(self.dtype)
        s = (self.strides, self.strides)
        y = nn.Conv(self.features, (1, 1), strides=s, use_bias=False,
                    dtype=dt, name="conv1")(x)
        y = nn.relu(FrozenBN(self.features, name="norm1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=dt, name="conv2")(y)
        y = nn.relu(FrozenBN(self.features, name="norm2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=dt,
                    name="conv3")(y)
        y = FrozenBN(self.features * 4, name="norm3")(y)
        if x.shape[-1] != self.features * 4 or self.strides != 1:
            x = nn.Conv(self.features * 4, (1, 1), strides=s, use_bias=False,
                        dtype=dt, name="shortcut")(x)
            x = FrozenBN(self.features * 4, name="shortcut_norm")(x)
        return nn.relu(y + x)


class C4Backbone(nn.Module):
    """Stem + res2..res4 -> the stride-16 feature map the RPN and ROI head
    share (C4 detectors have no FPN)."""

    cfg: FrcnnConfig

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) BGR, mean-subtracted
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = x.astype(dt)
        x = nn.Conv(cfg.stem_features, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=dt, name="stem_conv1")(x)
        x = nn.relu(FrozenBN(cfg.stem_features, name="stem_norm1")(x))
        # caffemaxpool: ceil-mode 3x3/2 maxpool == pad (0,1) each side
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
        for stage, num_blocks in enumerate(cfg.stage_sizes):
            width = cfg.stem_features * (2 ** stage)
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = CaffeBottleneck(width, strides=strides, dtype=cfg.dtype,
                                    name=f"res{stage + 2}_{block}")(x)
        return x


class Res5Head(nn.Module):
    """The res5 stage applied per-ROI (Detectron ``Res5ROIHeads``): pooled
    (P, P) windows -> (P/2, P/2) -> mean pool -> ``feat_dim`` features."""

    cfg: FrcnnConfig

    @nn.compact
    def __call__(self, rois):  # (N, P, P, C4)
        cfg = self.cfg
        width = cfg.feat_dim // 4
        x = rois
        for block in range(cfg.res5_blocks):
            x = CaffeBottleneck(width, strides=2 if block == 0 else 1,
                                dtype=cfg.dtype,
                                name=f"res5_{block}")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (N, feat_dim)


class RpnHead(nn.Module):
    cfg: FrcnnConfig

    @nn.compact
    def __call__(self, fmap):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        a = cfg.num_anchors
        t = nn.relu(nn.Conv(fmap.shape[-1], (3, 3), padding=1, dtype=dt,
                            name="conv")(fmap))
        logits = nn.Conv(a, (1, 1), dtype=jnp.float32,
                         name="objectness_logits")(t)
        deltas = nn.Conv(4 * a, (1, 1), dtype=jnp.float32,
                         name="anchor_deltas")(t)
        return logits, deltas


class BoxPredictor(nn.Module):
    """cls_score (num_classes + background-last) + class-specific box
    regression over the pooled res5 feature."""

    cfg: FrcnnConfig

    @nn.compact
    def __call__(self, feats):  # (N, feat_dim) f32
        cfg = self.cfg
        scores = nn.Dense(cfg.num_classes + 1, name="cls_score")(feats)
        deltas = nn.Dense(cfg.num_classes * 4, name="bbox_pred")(feats)
        return scores, deltas


class FrcnnStage1(nn.Module):
    """Backbone + RPN head (everything dense before proposal selection).

    Input is the RAW padded uint8 RGB canvas; BGR flip + pixel-mean
    subtraction run on device (uint8 crosses the host->device link — 4x
    less than fp32 — and PIL's bilinear resize is uint8-quantized anyway,
    so this is bit-identical to host-side normalization). The pad region
    is re-zeroed from ``size_hw`` to keep Detectron's pad-after-normalize
    semantics (zeros in normalized space, not -mean)."""

    cfg: FrcnnConfig

    @nn.compact
    def __call__(self, images, size_hw):
        # images (B, Hp, Wp, 3) uint8; size_hw (B, 2) per-image valid sizes
        mean = jnp.asarray(self.cfg.pixel_mean_bgr, jnp.float32)
        x = images.astype(jnp.float32)[..., ::-1] - mean
        ph, pw = images.shape[1], images.shape[2]
        row = jnp.arange(ph, dtype=jnp.float32)[None, :, None, None]
        col = jnp.arange(pw, dtype=jnp.float32)[None, None, :, None]
        h = size_hw[:, 0][:, None, None, None]
        w = size_hw[:, 1][:, None, None, None]
        x = jnp.where((row < h) & (col < w), x, 0.0)
        fmap = C4Backbone(self.cfg, name="backbone")(x)
        logits, deltas = RpnHead(self.cfg, name="rpn_head")(fmap)
        return fmap, logits, deltas


class FrcnnStage2(nn.Module):
    """ROIAlign + res5 + output heads over a fixed proposal count.

    Class selection and box decode happen ON DEVICE: only (feats, best
    prob, best class, decoded boxes) cross to the host — the raw
    (N, classes) score and (N, 4*classes) delta tensors are ~32 MB at full
    VG geometry and dominated the warm per-image latency through the
    tunneled link (BASELINE.md round-3 detector numbers)."""

    cfg: FrcnnConfig

    @nn.compact
    def __call__(self, fmap, boxes, size_hw):
        cfg = self.cfg
        pooled = roi_align(fmap, boxes, output_size=cfg.pooler_resolution,
                           spatial_scale=1.0 / cfg.stride,
                           sampling_ratio=cfg.sampling_ratio)
        feats = Res5Head(cfg, name="res5_head")(pooled)
        scores, deltas = BoxPredictor(cfg, name="box_predictor")(feats)
        probs = jax.nn.softmax(scores, axis=-1)[:, :-1]   # background LAST
        cls = jnp.argmax(probs, axis=-1)
        n = boxes.shape[0]
        best = probs[jnp.arange(n), cls]
        dsel = jnp.take_along_axis(
            deltas.reshape(n, cfg.num_classes, 4), cls[:, None, None],
            axis=1)[:, 0]
        det = decode_boxes(boxes, dsel, cfg.box_bbox_weights)
        det = clip_boxes(det, size_hw[0], size_hw[1])
        return feats, best, cls, det


# ---------------------------------------------------------------------------
# Pure geometry (shared by device stages and host selection)
# ---------------------------------------------------------------------------


def generate_anchors(cfg: FrcnnConfig, grid_h: int, grid_w: int) -> np.ndarray:
    """(grid_h * grid_w * A, 4) anchors in x0,y0,x1,y1 image coordinates,
    centered on stride-spaced grid points (Detectron2 zero-offset
    convention), ordered cell-major then anchor."""
    base = []
    for size in cfg.anchor_sizes:
        area = float(size) ** 2
        for ratio in cfg.anchor_ratios:
            w = math.sqrt(area / ratio)
            h = w * ratio
            base.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    base = np.asarray(base, np.float32)                      # (A, 4)
    shifts_x = np.arange(grid_w, dtype=np.float32) * cfg.stride
    shifts_y = np.arange(grid_h, dtype=np.float32) * cfg.stride
    sx, sy = np.meshgrid(shifts_x, shifts_y)                 # (H, W)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def decode_boxes(anchors, deltas, weights, scale_clamp=math.log(1000.0 / 16)):
    """Detectron box transform: anchors + (dx,dy,dw,dh)/weights -> boxes."""
    wx, wy, ww, wh = weights
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(deltas[..., 3] / wh, scale_clamp)
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h],
                     axis=-1)


def clip_boxes(boxes, height, width):
    x0 = jnp.clip(boxes[..., 0], 0, width)
    y0 = jnp.clip(boxes[..., 1], 0, height)
    x1 = jnp.clip(boxes[..., 2], 0, width)
    y1 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float,
               max_out: Optional[int] = None) -> np.ndarray:
    """Exact sequential NMS (torchvision semantics: IoU strictly greater
    than ``thresh`` suppresses). Host numpy — the candidate sets here are
    a few thousand boxes once per image of an offline pass."""
    order = np.argsort(-scores, kind="stable")
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if max_out is not None and len(keep) >= max_out:
            break
        rest = order[1:]
        xx0 = np.maximum(x0[i], x0[rest])
        yy0 = np.maximum(y0[i], y0[rest])
        xx1 = np.minimum(x1[i], x1[rest])
        yy1 = np.minimum(y1[i], y1[rest])
        inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
        union = areas[i] + areas[rest] - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
        order = rest[iou <= thresh]
    return np.asarray(keep, np.int64)


def _pairwise_iou(boxes_a, boxes_b):
    """(A, 4) x (B, 4) -> (A, B) IoU (xyxy; degenerate boxes -> 0)."""
    ax0, ay0, ax1, ay1 = (boxes_a[:, i] for i in range(4))
    bx0, by0, bx1, by1 = (boxes_b[:, i] for i in range(4))
    area_a = jnp.maximum(ax1 - ax0, 0) * jnp.maximum(ay1 - ay0, 0)
    area_b = jnp.maximum(bx1 - bx0, 0) * jnp.maximum(by1 - by0, 0)
    xx0 = jnp.maximum(ax0[:, None], bx0[None])
    yy0 = jnp.maximum(ay0[:, None], by0[None])
    xx1 = jnp.minimum(ax1[:, None], bx1[None])
    yy1 = jnp.minimum(ay1[:, None], by1[None])
    inter = jnp.maximum(xx1 - xx0, 0) * jnp.maximum(yy1 - yy0, 0)
    union = area_a[:, None] + area_b[None] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def nms_keep_device(boxes, alive, thresh: float, max_out: int, group=None,
                    block: int = 64):
    """Exact greedy NMS on device over boxes ALREADY SORTED by score
    descending (dead rows sorted to the back). Semantics identical to
    ``greedy_nms``: a kept box suppresses every later box with IoU strictly
    greater than ``thresh``; the scan stops once ``max_out`` boxes are kept
    (later rows keep their current flag — callers compact in score order and
    cut at ``max_out``, so any uninspected tail rows never surface).

    ``group`` (optional int vector) restricts suppression to same-group
    boxes: one scan over the global score order then decomposes into exactly
    the independent per-group greedy scans — the device form of the staged
    path's per-class NMS loop (``_select_detections``), with no coordinate
    offsetting (bit-exact boxes).

    BLOCKED greedy (TPU-shaped): ``block`` rows per outer ``while_loop``
    step instead of one. Each step (a) resolves exact greedy WITHIN the
    block by the self-suppression fixpoint — iterate
    ``kb <- entry & ~any(j<i: kb[j] & iou>t)`` until stable, which converges
    to the greedy recurrence's unique solution in at most the block's
    suppression-chain depth (by induction: row i is final once rows <i are)
    — then (b) suppresses every later row against the block's kept boxes in
    ONE (block x N) matrix op. A row-at-a-time loop here cost up to 6000
    sequencer-bound iterations per image — ~70 ms/image of the fused
    detector (BASELINE.md round-3b profile); blocking cuts the sequential
    depth ~15x at identical surfaced results.

    Early stop quantises to block boundaries: the processed prefix then
    contains >= ``max_out`` kept rows with exact greedy flags, so the first
    ``max_out`` kept-in-order rows — the only ones callers surface — match
    the row-at-a-time scan exactly (extra tail suppression beyond the stop
    row can only touch rows ranked after the cut). Returns
    ``(keep mask, kept count clamped to max_out)``.
    """
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), bool), jnp.int32(0)
    b = min(block, n)
    pad = (-n) % b
    nb = (n + pad) // b
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    keep0 = jnp.pad(alive, (0, pad))
    group_p = None if group is None else jnp.pad(group, (0, pad),
                                                 constant_values=-1)
    nlive = jnp.sum(alive.astype(jnp.int32))
    tri = jnp.triu(jnp.ones((b, b), bool), k=1)  # [j, i]: j < i suppressors
    rows_all = jnp.arange(n + pad)

    def cond(state):
        blk, _, cnt = state
        return (blk < nb) & (cnt < max_out) & (blk * b < nlive)

    def body(state):
        blk, keep, cnt = state
        start = blk * b
        blk_boxes = jax.lax.dynamic_slice(boxes_p, (start, 0), (b, 4))
        entry = jax.lax.dynamic_slice(keep, (start,), (b,))
        iou_bn = _pairwise_iou(blk_boxes, boxes_p)            # (b, N)
        sup_bn = iou_bn > thresh
        if group_p is not None:
            blk_group = jax.lax.dynamic_slice(group_p, (start,), (b,))
            sup_bn = sup_bn & (blk_group[:, None] == group_p[None])
        sup_bb = jax.lax.dynamic_slice(sup_bn, (0, start), (b, b)) & tri

        def fix_cond(s):
            _, changed = s
            return changed

        def fix_body(s):
            kb, _ = s
            kb2 = entry & ~jnp.any(sup_bb & kb[:, None], axis=0)
            return kb2, jnp.any(kb2 != kb)

        kb, _ = jax.lax.while_loop(fix_cond, fix_body,
                                   (entry, jnp.bool_(True)))
        later = rows_all >= start + b
        sup_later = jnp.any(sup_bn & kb[:, None], axis=0) & later
        keep = jax.lax.dynamic_update_slice(keep, kb, (start,)) & ~sup_later
        return blk + 1, keep, cnt + jnp.sum(kb.astype(jnp.int32))

    _, keep, cnt = jax.lax.while_loop(
        cond, body, (jnp.int32(0), keep0, jnp.int32(0)))
    return keep[:n], jnp.minimum(cnt, max_out)


def _roi_sample_coords(bx, p, s, spatial_scale):
    """Per-ROI bilinear sample coordinates (torchvision aligned=False legacy
    semantics, fixed ``sampling_ratio``). Returns (ys, xs) of shape
    (n, P, S) each — the grid is a Cartesian product (ys independent of the
    x sample index and vice versa), which is what lets the sample average
    factor into separable per-axis interpolation matrices below."""
    x0 = bx[:, 0] * spatial_scale
    y0 = bx[:, 1] * spatial_scale
    x1 = bx[:, 2] * spatial_scale
    y1 = bx[:, 3] * spatial_scale
    roi_w = jnp.maximum(x1 - x0, 1.0)
    roi_h = jnp.maximum(y1 - y0, 1.0)
    # sample positions: start + (bin + (i+0.5)/S) * bin_size
    grid = (jnp.arange(p)[:, None] + (jnp.arange(s)[None] + 0.5) / s)
    ys = y0[:, None, None] + grid[None] * (roi_h / p)[:, None, None]
    xs = x0[:, None, None] + grid[None] * (roi_w / p)[:, None, None]
    return ys, xs


def _interp_axis(coord, size):
    # torchvision semantics: samples below -1 or beyond size contribute 0;
    # in-range coords clamp to [0, size-1]
    valid = (coord >= -1.0) & (coord <= size)
    c = jnp.clip(coord, 0.0, size - 1.0)
    i0 = jnp.floor(c).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    frac = c - i0
    return (i0, i1, jnp.where(valid, 1.0 - frac, 0.0),
            jnp.where(valid, frac, 0.0))


def _interp_matrix(coord, size, s):
    """(n, P, S) sample coordinates -> (n, P, size) interpolation matrix:
    row (n, p) holds the two bilinear taps of each of the S samples, scaled
    1/S (the per-axis half of the bin's sample average). Built by one-hot
    accumulation so coincident taps (clamped edges) sum, exactly like
    gathering both and adding."""
    i0, i1, w0, w1 = _interp_axis(coord, size)
    oh0 = jax.nn.one_hot(i0, size, dtype=w0.dtype)         # (n,P,S,size)
    oh1 = jax.nn.one_hot(i1, size, dtype=w0.dtype)
    return jnp.einsum("nps,npsh->nph", w0 / s, oh0) + jnp.einsum(
        "nps,npsh->nph", w1 / s, oh1)


def roi_align(fmap, boxes, *, output_size: int, spatial_scale: float,
              sampling_ratio: int, chunk: int = 32, impl: str = "mm"):
    """ROIAlign, aligned=False legacy coordinates (torchvision/Detectron
    semantics at fixed ``sampling_ratio``): bilinear samples averaged per
    output bin. ``fmap``: (H, W, C); ``boxes``: (N, 4) x0,y0,x1,y1 in image
    coordinates. Chunked with ``lax.map`` so the per-chunk intermediate
    bounds HBM at full detector scale.

    ``impl="mm"`` (default): the pooling runs as TWO interpolation matmuls
    on the MXU — out[n,py,px,:] = Ky[n,py,:] @ fmap @ Kx[n,px,:]^T with the
    per-bin sample average folded into Ky/Kx. Because the sample grid is a
    Cartesian product, this is algebraically IDENTICAL to sampling then
    averaging (mean_s mean_t sum_hw wy_s[h] wx_t[w] v[h,w] factorises); only
    f32 summation order differs (torch-twin parity at rtol 1e-5,
    tests/test_frcnn.py). The gather form (``impl="gather"``) moved 4
    corner-gathers of (n,P,S,P,S,C) through HBM — ~65% of the fused
    detector's device time at full geometry (BASELINE.md round-3 profile);
    the matmul form rides the MXU at ~1/9 the cost.
    """
    h, w, c = fmap.shape
    p = output_size
    s = sampling_ratio

    def pool_chunk_mm(bx):  # (chunk, 4)
        ys, xs = _roi_sample_coords(bx, p, s, spatial_scale)
        ky = _interp_matrix(ys, h, s)                        # (n,P,H)
        kx = _interp_matrix(xs, w, s)                        # (n,P,W)
        tmp = jnp.einsum("nph,hwc->npwc", ky, fmap)          # (n,P,W,C)
        return jnp.einsum("nqw,npwc->npqc", kx, tmp)         # (n,P,P,C)

    def pool_chunk_gather(bx):  # (chunk, 4)
        ys, xs = _roi_sample_coords(bx, p, s, spatial_scale)
        yi0, yi1, wy0, wy1 = _interp_axis(ys, h)             # (n,P,S)
        xi0, xi1, wx0, wx1 = _interp_axis(xs, w)
        flat = fmap.reshape(h * w, c)

        def gather(yy, xx):                                  # (n,P,S),(n,P,S)
            idx = yy[:, :, :, None, None] * w + xx[:, None, None, :, :]
            return flat[idx.reshape(idx.shape[0], -1)].reshape(
                idx.shape + (c,))                            # (n,P,S,P,S,C)

        wgt = lambda a, b: (a[:, :, :, None, None] * b[:, None, None, :, :])[..., None]
        val = (gather(yi0, xi0) * wgt(wy0, wx0) +
               gather(yi0, xi1) * wgt(wy0, wx1) +
               gather(yi1, xi0) * wgt(wy1, wx0) +
               gather(yi1, xi1) * wgt(wy1, wx1))             # (n,P,S,P,S,C)
        return jnp.mean(val, axis=(2, 4))                    # (n,P,P,C)

    pool_chunk = pool_chunk_mm if impl == "mm" else pool_chunk_gather
    n = boxes.shape[0]
    if n <= chunk:
        return pool_chunk(boxes)
    pad = (-n) % chunk
    padded = jnp.pad(boxes, ((0, pad), (0, 0)))
    out = jax.lax.map(pool_chunk, padded.reshape(-1, chunk, 4))
    return out.reshape(-1, p, p, fmap.shape[-1])[:n]


# ---------------------------------------------------------------------------
# Preprocessing (reference Preprocess: image_processing.py:18-37)
# ---------------------------------------------------------------------------


def preprocess_geometry(h0: int, w0: int, cfg: FrcnnConfig):
    """Resize geometry shared by every ingest path: -> (h1, w1, ph, pw).

    Shortest side to ``min_size`` capped so the longest stays <=
    ``max_size``; static canvas per orientation — (min,max) landscape /
    (max,min) portrait, rounded up to the stride divisor: two jit
    specializations of the detector total instead of one per image shape."""
    scale = cfg.min_size / min(h0, w0)
    if max(h0, w0) * scale > cfg.max_size:
        scale = cfg.max_size / max(h0, w0)
    h1 = max(int(round(h0 * scale)), 1)
    w1 = max(int(round(w0 * scale)), 1)
    div = cfg.size_divisibility

    def rup(v):
        return ((v + div - 1) // div) * div

    ph = rup(cfg.min_size) if w1 >= h1 else rup(cfg.max_size)
    pw = rup(cfg.max_size) if w1 >= h1 else rup(cfg.min_size)
    return h1, w1, ph, pw


def _to_rgb_array(img) -> np.ndarray:
    from PIL import Image

    if isinstance(img, Image.Image):
        return np.asarray(img.convert("RGB"))
    return np.asarray(img)


def preprocess_image(img, cfg: FrcnnConfig):
    """RGB uint8 array -> (padded RAW uint8 RGB canvas (Hp, Wp, 3),
    (resized_h, resized_w), scale_yx original/resized).

    PIL-bilinear host resize — the PARITY path: the reference's detector
    preprocessing (HF research-projects ``processing_image.ResizeShortestEdge``,
    detectron2-style) takes the uint8 branch, which resizes via
    ``PIL.Image.resize(BILINEAR)``. BGR flip + pixel-mean subtraction happen
    ON DEVICE in ``FrcnnStage1`` — the uint8 canvas crosses host->device 4x
    smaller than fp32 and the normalization is bit-identical (PIL's resize
    output is uint8-quantized either way). ``normalize_canvas`` reproduces
    the normalized fp32 canvas host-side for parity harnesses."""
    from PIL import Image

    arr = _to_rgb_array(img)
    h0, w0 = arr.shape[:2]
    h1, w1, ph, pw = preprocess_geometry(h0, w0, cfg)
    resized = np.asarray(
        Image.fromarray(arr).resize((w1, h1), Image.BILINEAR), np.uint8)
    out = np.zeros((ph, pw, 3), np.uint8)
    out[:h1, :w1] = resized
    scale_yx = np.asarray([h0 / h1, w0 / w1], np.float32)
    return out, (h1, w1), scale_yx


def preprocess_image_original(img, cfg: FrcnnConfig, bucket: int = 64):
    """Device-ingest host half: decode only, NO resize — returns
    ``(bucket-padded original uint8 (bh, bw, 3), (h0, w0), (h1, w1),
    (ph, pw), scale_yx)``; ``device_resize_canvas`` finishes on device.

    Originals ship bucket-padded (dims rounded up to ``bucket``) so the
    tiny ingest program compiles once per bucket shape, not per image.
    Returns ``None`` when shipping the original would NOT save bytes over
    the resized canvas (very large photos) — the caller falls back to the
    PIL path for those images."""
    arr = _to_rgb_array(img)
    h0, w0 = arr.shape[:2]
    h1, w1, ph, pw = preprocess_geometry(h0, w0, cfg)
    bh = ((h0 + bucket - 1) // bucket) * bucket
    bw = ((w0 + bucket - 1) // bucket) * bucket
    if bh * bw >= ph * pw:
        return None
    out = np.zeros((bh, bw, 3), np.uint8)
    out[:h0, :w0] = arr
    scale_yx = np.asarray([h0 / h1, w0 / w1], np.float32)
    return out, (h0, w0), (h1, w1), (ph, pw), scale_yx


def _resize_matrix(n_out: int, n_in: int, true_out, true_in, dtype=jnp.float32):
    """(n_out, n_in) dense bilinear interpolation matrix for torch
    ``F.interpolate(mode="bilinear", align_corners=False)`` semantics, with
    RUNTIME true sizes inside static padded dims: rows >= true_out and
    columns >= true_in are zero. Source coords are clamped at 0 and the
    high neighbour at true_in - 1, exactly torch's index rule."""
    i = jnp.arange(n_out, dtype=dtype)
    j = jnp.arange(n_in, dtype=dtype)
    t_in = jnp.asarray(true_in, dtype)
    t_out = jnp.asarray(true_out, dtype)
    src = jnp.maximum((i + 0.5) * (t_in / t_out) - 0.5, 0.0)
    lo = jnp.floor(src)
    frac = src - lo
    hi = jnp.minimum(lo + 1.0, t_in - 1.0)
    k = ((j[None, :] == lo[:, None]) * (1.0 - frac[:, None])
         + (j[None, :] == hi[:, None]) * frac[:, None])
    row_ok = i < t_out
    col_ok = j < t_in
    return k * row_ok[:, None] * col_ok[None, :]


def device_resize_canvas(orig_u8, hw0, hw1, ph: int, pw: int):
    """On-device torch-bilinear resize of a bucket-padded uint8 original
    into the detector's static fp32 canvas (resized image in the top-left,
    zeros elsewhere). The separable kernel runs as two interpolation
    matmuls on the MXU (the mm-ROIAlign factorisation); the matrices are
    computed on device from the RUNTIME true sizes, so ONE compilation per
    (bucket, canvas) shape serves every image in that bucket.

    Semantics: the float branch of the reference transform family —
    detectron2's ``ResizeTransform`` applies ``F.interpolate(bilinear,
    align_corners=False)`` to float inputs (PIL to uint8 ones; that PIL
    path is ``preprocess_image``). Parity vs torch is test-enforced
    (tests/test_frcnn_ingest.py)."""
    bh, bw = orig_u8.shape[0], orig_u8.shape[1]
    ky = _resize_matrix(ph, bh, hw1[0], hw0[0])          # (ph, bh)
    kx = _resize_matrix(pw, bw, hw1[1], hw0[1])          # (pw, bw)
    img = orig_u8.astype(jnp.float32)
    # highest precision: TPU's default f32 dot rounds through bf16 passes,
    # which would cost ~1 LSB of pixel accuracy on this tiny op
    return jnp.einsum("ij,jkc,lk->ilc", ky, img, kx,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def normalize_canvas(canvas, size_hw, cfg: FrcnnConfig):
    """Host-side twin of FrcnnStage1's on-device normalization: uint8 RGB
    canvas -> fp32 BGR mean-subtracted, pad region zeroed (Detectron
    pad-after-normalize semantics). Used by parity tests to feed torch
    references that expect the normalized tensor."""
    x = canvas.astype(np.float32)[..., ::-1] - np.asarray(
        cfg.pixel_mean_bgr, np.float32)
    x[size_hw[0]:, :, :] = 0.0
    x[:, size_hw[1]:, :] = 0.0
    return x


# ---------------------------------------------------------------------------
# Detector orchestration
# ---------------------------------------------------------------------------


class FrcnnDetector:
    """Staged inference orchestrator. ``params`` hold both stages' trees:
    ``{"stage1": ..., "stage2": ...}``."""

    def __init__(self, cfg: FrcnnConfig = FrcnnConfig(), params=None,
                 rng: Optional[jax.Array] = None):
        self.cfg = cfg
        if params is None:
            params = self.init_params(rng if rng is not None
                                      else jax.random.PRNGKey(0))
        self.params = params
        self._stage1 = jax.jit(
            lambda p, im, size_hw: FrcnnStage1(cfg).apply(p, im, size_hw))
        self._stage2 = jax.jit(
            lambda p, fmap, boxes, size_hw: FrcnnStage2(cfg).apply(
                p, fmap, boxes, size_hw))
        self._stage2v = jax.jit(
            lambda p, fmap, boxes, size_hw: jax.vmap(
                lambda f, b, s: FrcnnStage2(cfg).apply(p, f, b, s)
            )(fmap, boxes, size_hw))
        self._gather = jax.jit(lambda f, i: f[i])
        self._gatherv = jax.jit(
            lambda f, i: f[jnp.arange(f.shape[0])[:, None], i])
        self._anchor_cache: Dict[Tuple[int, int], np.ndarray] = {}
        self._fused = jax.jit(self._fused_detect)
        # device-ingest helpers (detect_batch ingest="device"): tiny
        # programs that keep original-resolution pixels on device — one
        # specialization per bucket/canvas shape, all trivial compiles
        self._ingest = jax.jit(device_resize_canvas, static_argnums=(3, 4))
        self._lift = jax.jit(lambda c: c.astype(jnp.float32))
        self._stack = jax.jit(lambda *cs: jnp.stack(cs))
        self._zero_cache: Dict[Tuple[int, int], jax.Array] = {}

    def init_params(self, rng):
        cfg = self.cfg
        k1, k2 = jax.random.split(rng)
        hp = cfg.size_divisibility * 2
        im = jnp.zeros((1, hp, hp, 3), jnp.uint8)
        s1 = FrcnnStage1(cfg).init(k1, im,
                                   jnp.asarray([[hp, hp]], jnp.float32))
        grid = hp // cfg.stride
        fmap = jnp.zeros((grid, grid, cfg.res4_features), jnp.float32)
        boxes = jnp.zeros((4, 4), jnp.float32)
        s2 = FrcnnStage2(cfg).init(k2, fmap, boxes,
                                   jnp.asarray([hp, hp], jnp.float32))
        return {"stage1": s1, "stage2": s2}

    def _anchors(self, grid_h, grid_w):
        key = (grid_h, grid_w)
        if key not in self._anchor_cache:
            self._anchor_cache[key] = generate_anchors(self.cfg, grid_h, grid_w)
        return self._anchor_cache[key]

    def _rpn_proposals(self, logits, deltas, size_hw):
        """Host half of the RPN: top-k decode happened densely; here: score
        ordering, exact greedy NMS 0.7, and the post-NMS cut."""
        cfg = self.cfg
        grid_h, grid_w = logits.shape[:2]
        anchors = self._anchors(grid_h, grid_w)
        scores = np.asarray(logits).reshape(-1)              # (H*W*A,)
        deltas = np.asarray(deltas).reshape(grid_h * grid_w, cfg.num_anchors,
                                            4)
        deltas = deltas.reshape(-1, 4)
        k = min(cfg.rpn_pre_nms_topk, scores.shape[0])
        top = np.argpartition(-scores, k - 1)[:k]
        boxes = np.asarray(decode_boxes(anchors[top], deltas[top],
                                        cfg.rpn_bbox_weights))
        boxes = np.asarray(clip_boxes(boxes, size_hw[0], size_hw[1]))
        ws = boxes[:, 2] - boxes[:, 0]
        hs = boxes[:, 3] - boxes[:, 1]
        alive = (ws > cfg.rpn_min_box_size) & (hs > cfg.rpn_min_box_size)
        boxes, sc = boxes[alive], scores[top][alive]
        keep = greedy_nms(boxes, sc, cfg.rpn_nms_thresh,
                          max_out=cfg.rpn_post_nms_topk)
        return boxes[keep], sc[keep]

    def _select_detections(self, boxes, best, cls):
        """Final per-class selection (host). Softmax, best-class argmax and
        the class-specific box decode/clip already ran ON DEVICE in
        FrcnnStage2; here only the sequential parts remain: per-class greedy
        NMS, global top-36, min-detection backfill (the reference pads to
        exactly ``max_detections``, obj_features.py:157-164)."""
        cfg = self.cfg

        chosen: list = []
        suppressed: list = []
        conf = best >= cfg.box_score_thresh
        for c in np.unique(cls[conf]):
            rows = np.nonzero(conf & (cls == c))[0]
            keep = rows[greedy_nms(boxes[rows], best[rows],
                                   cfg.box_nms_thresh)]
            chosen.extend(keep.tolist())
            suppressed.extend(sorted(set(rows.tolist()) - set(keep.tolist())))
        chosen = sorted(chosen, key=lambda i: -best[i])[: cfg.max_detections]
        if len(chosen) < cfg.min_detections:
            # backfill below threshold / suppressed, highest score first
            rest = [i for i in np.argsort(-best) if i not in set(chosen)]
            chosen = (chosen + rest)[: cfg.min_detections]
        idx = np.asarray(chosen, np.int64)
        return idx, boxes[idx], best[idx], cls[idx]

    def _fused_detect(self, params, canvases, size_hw):
        """ONE jitted dispatch: stage 1 -> device RPN (top-k, decode, greedy
        NMS) -> stage 2 -> device per-class selection -> 36-row outputs.

        Greedy-NMS and final-selection semantics are identical to the staged
        host path (``_rpn_proposals``/``_select_detections``); the per-class
        box NMS becomes ONE group-masked device NMS over the global score
        order — suppression is restricted to same-class boxes, so the scan
        decomposes into exactly the per-class scans (bit-exact coordinates,
        no class offsetting). Only (B, 36, ...) results cross to
        the host: at full VG geometry the staged path shipped ~50 MB of RPN
        tensors per batch through the tunneled link and ran ~1 s of numpy NMS
        (the round-3 profile in BASELINE.md); here nothing leaves the device
        until the final 36 regions.
        """
        cfg = self.cfg
        fmap, logits, deltas = FrcnnStage1(cfg).apply(
            params["stage1"], canvases, size_hw)
        gh, gw = fmap.shape[1], fmap.shape[2]
        anchors = jnp.asarray(self._anchors(gh, gw))
        n_post = cfg.rpn_post_nms_topk

        def rpn_one(lg, dl, sz):
            scores = lg.reshape(-1)
            k = min(cfg.rpn_pre_nms_topk, scores.shape[0])
            sc, idx = jax.lax.top_k(scores, k)
            bx = decode_boxes(anchors[idx], dl.reshape(-1, 4)[idx],
                              cfg.rpn_bbox_weights)
            bx = clip_boxes(bx, sz[0], sz[1])
            alive = (((bx[:, 2] - bx[:, 0]) > cfg.rpn_min_box_size)
                     & ((bx[:, 3] - bx[:, 1]) > cfg.rpn_min_box_size))
            order = jnp.argsort(jnp.where(alive, -sc, jnp.inf), stable=True)
            bx, alive = bx[order], alive[order]
            keep, cnt = nms_keep_device(bx, alive, cfg.rpn_nms_thresh, n_post)
            sel = jnp.argsort(~keep, stable=True)[:n_post]
            mask = jnp.arange(n_post) < cnt
            return jnp.where(mask[:, None], bx[sel], 0.0), cnt

        props, nvalid = jax.vmap(rpn_one)(logits, deltas, size_hw)
        feats, best, cls, det = jax.vmap(
            lambda fm, bxs, sz: FrcnnStage2(cfg).apply(
                params["stage2"], fm, bxs, sz))(fmap, props, size_hw)

        def select_one(feat, best, cls, det, nv, sz):
            n = best.shape[0]
            row_ok = jnp.arange(n) < nv
            conf = row_ok & (best >= cfg.box_score_thresh)
            order = jnp.argsort(jnp.where(conf, -best, jnp.inf), stable=True)
            keep_s, _ = nms_keep_device(det[order], conf[order],
                                        cfg.box_nms_thresh, n,
                                        group=cls[order])
            kept = jnp.zeros(n, bool).at[order].set(keep_s)
            # ranking key: kept rows first (score desc), then backfill rows
            # (below threshold or NMS-suppressed) score desc — the staged
            # path's chosen + rest ordering (_select_detections)
            key = jnp.where(row_ok, best + kept.astype(jnp.float32) * 2.0,
                            -jnp.inf)
            top = jnp.argsort(-key, stable=True)[: cfg.max_detections]
            cnt = jnp.minimum(nv, cfg.max_detections)
            m = jnp.arange(cfg.max_detections) < cnt
            norm = det[top] / jnp.stack([sz[1], sz[0], sz[1], sz[0]])
            return (jnp.where(m[:, None], feat[top], 0.0),
                    jnp.where(m[:, None], norm, 0.0),
                    jnp.where(m, best[top], 0.0),
                    jnp.where(m, cls[top].astype(jnp.int32), -1),
                    cnt)

        return jax.vmap(select_one)(feats, best, cls, det, nvalid, size_hw)

    def detect(self, img) -> Dict[str, np.ndarray]:
        """Raw RGB image (array or PIL) -> dict with ``roi_features``
        (max_detections, feat_dim), ``normalized_boxes`` (max_detections, 4)
        in [0,1] of the resized image, plus scores/classes."""
        return self.detect_batch([img])[0]

    def _dispatch_fused(self, pre, groups, pad_to, n_imgs):
        """Issue the fused computation for every orientation group and return
        the pending device results WITHOUT fetching — JAX dispatch is async,
        so the host is free (to decode the next image chunk) while the chip
        works. ``_finish_fused`` materialises the per-image dicts."""
        pending = []
        for shape, idxs in groups.items():
            bp = len(idxs) if pad_to is None else max(len(idxs), pad_to)
            canv = np.zeros((bp,) + shape, np.uint8)
            sizes = np.ones((bp, 2), np.float32)
            for j, i in enumerate(idxs):
                canv[j] = pre[i][0]
                sizes[j] = pre[i][1]
            pending.append(
                (idxs, self._fused(self.params, canv, jnp.asarray(sizes))))
        return n_imgs, pending

    def _dispatch_fused_device(self, imgs, pad_to, n_imgs):
        """Device-ingest dispatch: host DECODES only; original-resolution
        uint8 pixels cross the link (typically ~3x fewer bytes than the
        resized canvas — the dominant cost on a tunneled chip, BASELINE.md
        h2d probe) and the torch-bilinear resize + canvas assembly run on
        device. Images whose original is not smaller than the canvas fall
        back to the PIL host path (fewer bytes either way)."""
        cfg = self.cfg
        pre = []
        for im in imgs:
            r = preprocess_image_original(im, cfg)
            if r is None:
                canvas, hw1, scale_yx = preprocess_image(im, cfg)
                pre.append(("pil", canvas, hw1, scale_yx))
            else:
                pre.append(("dev",) + r)
        groups: Dict[tuple, list] = {}
        for i, entry in enumerate(pre):
            shape = (entry[1].shape[:2] if entry[0] == "pil"
                     else entry[4])                      # (ph, pw)
            groups.setdefault(shape, []).append(i)
        pending = []
        for (ph, pw), idxs in groups.items():
            bp = len(idxs) if pad_to is None else max(len(idxs), pad_to)
            rows, sizes = [], np.ones((bp, 2), np.float32)
            for j, i in enumerate(idxs):
                e = pre[i]
                if e[0] == "pil":
                    rows.append(self._lift(e[1]))
                    sizes[j] = e[2]
                else:
                    _, orig, hw0, hw1, _, _ = e
                    rows.append(self._ingest(
                        orig, np.asarray(hw0, np.int32),
                        np.asarray(hw1, np.int32), ph, pw))
                    sizes[j] = hw1
            if len(rows) < bp:
                zero = self._zero_cache.get((ph, pw))
                if zero is None:
                    zero = jnp.zeros((ph, pw, 3), jnp.float32)
                    self._zero_cache[(ph, pw)] = zero
                rows += [zero] * (bp - len(rows))
            canv = self._stack(*rows)
            pending.append(
                (idxs, self._fused(self.params, canv, jnp.asarray(sizes))))
        return n_imgs, pending

    @staticmethod
    def _finish_fused(handle) -> list:
        n_imgs, pending = handle
        results: list = [None] * n_imgs
        for idxs, dev in pending:
            feats, boxes, scores, classes, cnts = jax.tree_util.tree_map(
                np.asarray, dev)
            for j, i in enumerate(idxs):
                results[i] = {
                    "roi_features": feats[j],
                    "normalized_boxes": boxes[j],
                    "scores": scores[j],
                    "classes": classes[j].astype(np.int64),
                }
        return results

    def detect_batch_async(self, imgs, pad_to: Optional[int] = None,
                           ingest: str = "pil"):
        """Fused ``detect_batch`` split at the device boundary: preprocess +
        dispatch now, defer the result fetch to the returned zero-arg
        callable. Per-image results are bit-identical to ``detect_batch``
        (same jitted program); the split only lets the caller overlap host
        work (image decode of the NEXT chunk) with device compute — the
        offline cacher's double-buffered build (cli/obj_features.py)."""
        if ingest == "device":
            handle = self._dispatch_fused_device(imgs, pad_to, len(imgs))
            return lambda: self._finish_fused(handle)
        pre = [preprocess_image(im, self.cfg) for im in imgs]
        groups: Dict[tuple, list] = {}
        for i, (canvas, _, _) in enumerate(pre):
            groups.setdefault(canvas.shape, []).append(i)
        handle = self._dispatch_fused(pre, groups, pad_to, len(imgs))
        return lambda: self._finish_fused(handle)

    def detect_batch(self, imgs, pad_to: Optional[int] = None,
                     fused: bool = True, ingest: str = "pil") -> list:
        """Batched inference over a list of raw images. Per-image results are
        identical to single-image ``detect`` — batching only amortizes
        dispatch/tunnel round-trips and fills the MXU at the offline cacher's
        throughput shapes (reference obj_features.py:142-173 runs strictly
        per image).

        ``fused=True`` (default): ONE jitted dispatch per orientation group
        does everything — backbone, RPN decode + greedy NMS, ROI heads,
        per-class selection — and only the final 36-region tensors cross to
        the host (``_fused_detect``). ``fused=False`` keeps the staged path
        (device conv stages, host numpy NMS between them) whose halves are
        parity-tested piecewise against the torch twin.

        ``pad_to`` zero-pads each orientation group to a fixed batch so the
        jitted stages compile at most twice (landscape/portrait) regardless
        of the per-call orientation mix; padded rows are skipped host-side.

        ``ingest="device"`` (fused path only) ships ORIGINAL-resolution
        uint8 pixels and resizes on device with torch-bilinear semantics
        (``device_resize_canvas``) — a documented deviation from the PIL
        parity default (the two resizes differ by PIL's uint8 rounding;
        delta quantified in tests/test_frcnn_ingest.py), ~3x fewer bytes
        over the host->device link."""
        if ingest == "device" and not fused:
            raise ValueError("ingest='device' requires the fused path")
        if fused:
            return self.detect_batch_async(imgs, pad_to, ingest=ingest)()
        cfg = self.cfg
        n = cfg.rpn_post_nms_topk
        pre = [preprocess_image(im, cfg) for im in imgs]
        groups: Dict[tuple, list] = {}
        for i, (canvas, _, _) in enumerate(pre):
            groups.setdefault(canvas.shape, []).append(i)
        results: list = [None] * len(imgs)
        for shape, idxs in groups.items():
            bp = len(idxs) if pad_to is None else max(len(idxs), pad_to)
            canv = np.zeros((bp,) + shape, np.uint8)
            sizes = np.ones((bp, 2), np.float32)
            for j, i in enumerate(idxs):
                canv[j] = pre[i][0]
                sizes[j] = pre[i][1]
            fmap, logits, deltas = self._stage1(
                self.params["stage1"], canv, jnp.asarray(sizes))
            logits_h = np.asarray(logits)
            deltas_h = np.asarray(deltas)
            # fixed proposal count for the jitted stage 2 (pad + mask)
            props = np.zeros((bp, n, 4), np.float32)
            valid = np.zeros(bp, np.int32)
            for j, i in enumerate(idxs):
                p, _ = self._rpn_proposals(logits_h[j], deltas_h[j],
                                           pre[i][1])
                props[j, : p.shape[0]] = p
                valid[j] = p.shape[0]
            feats, best_d, cls_d, det_d = self._stage2v(
                self.params["stage2"], fmap, jnp.asarray(props),
                jnp.asarray(sizes))
            best_h = np.asarray(best_d)
            cls_h = np.asarray(cls_d)
            det_h = np.asarray(det_d)
            # gather ONLY the chosen ROI-feature rows on device (fixed
            # width so the gather jit-caches); the (B, n, feat_dim) feats
            # tensor never crosses to the host
            pad_idx = np.zeros((bp, cfg.max_detections), np.int32)
            sel = []
            for j, i in enumerate(idxs):
                v = int(valid[j])
                chosen = self._select_detections(det_h[j, :v], best_h[j, :v],
                                                 cls_h[j, :v])
                pad_idx[j, : len(chosen[0])] = chosen[0]
                sel.append(chosen)
            feats_sel = np.asarray(self._gatherv(feats,
                                                 jnp.asarray(pad_idx)))
            for j, i in enumerate(idxs):
                idx, boxes, best, cls = sel[j]
                size_hw = pre[i][1]
                norm = boxes / np.asarray([size_hw[1], size_hw[0],
                                           size_hw[1], size_hw[0]],
                                          np.float32)
                out = {
                    "roi_features": feats_sel[j, : len(idx)],
                    "normalized_boxes": norm.astype(np.float32),
                    "scores": best.astype(np.float32),
                    "classes": cls.astype(np.int64),
                }
                # degenerate images can leave fewer proposals than
                # min_detections: zero-pad to the fixed region count (the
                # reference's padding="max_detections" contract,
                # obj_features.py:157-164)
                short = cfg.max_detections - len(idx)
                if short > 0:
                    for k, v2 in out.items():
                        pad = np.zeros((short,) + v2.shape[1:], v2.dtype)
                        out[k] = np.concatenate([v2, pad - (k == "classes")])
                results[i] = out
        return results


# ---------------------------------------------------------------------------
# Checkpoint import (unc-nlp/frcnn-vg-finetuned state-dict layout)
# ---------------------------------------------------------------------------


def _conv_t(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(prefix, sd):
    return {k: np.asarray(sd[f"{prefix}.{k}"], np.float32)
            for k in ("weight", "bias", "running_mean", "running_var")}


def _bottleneck(sd, prefix):
    out = {}
    for conv in ("conv1", "conv2", "conv3"):
        out[conv] = {"kernel": _conv_t(sd[f"{prefix}.{conv}.weight"])}
        out[f"norm{conv[-1]}"] = _bn(f"{prefix}.{conv}.norm", sd)
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = {"kernel": _conv_t(sd[f"{prefix}.shortcut.weight"])}
        out["shortcut_norm"] = _bn(f"{prefix}.shortcut.norm", sd)
    return out


def import_frcnn_state_dict(sd, cfg: FrcnnConfig) -> Dict:
    """torch state dict (Detectron2 naming: ``backbone.stem.conv1`` /
    ``backbone.res{2..4}.{i}`` / ``proposal_generator.rpn_head`` /
    ``roi_heads.res5.{i}`` / ``roi_heads.box_predictor``) -> this module's
    param trees. Tensors arrive as numpy/torch; conv kernels transpose
    OIHW -> HWIO, linear kernels transpose (out,in) -> (in,out)."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    backbone = {
        "stem_conv1": {"kernel": _conv_t(sd["backbone.stem.conv1.weight"])},
        "stem_norm1": _bn("backbone.stem.conv1.norm", sd),
    }
    for stage, num_blocks in enumerate(cfg.stage_sizes):
        name = f"res{stage + 2}"
        for b in range(num_blocks):
            backbone[f"{name}_{b}"] = _bottleneck(sd, f"backbone.{name}.{b}")
    rpn = {
        "conv": {"kernel": _conv_t(sd["proposal_generator.rpn_head.conv.weight"]),
                 "bias": np.asarray(sd["proposal_generator.rpn_head.conv.bias"])},
        "objectness_logits": {
            "kernel": _conv_t(sd["proposal_generator.rpn_head.objectness_logits.weight"]),
            "bias": np.asarray(sd["proposal_generator.rpn_head.objectness_logits.bias"])},
        "anchor_deltas": {
            "kernel": _conv_t(sd["proposal_generator.rpn_head.anchor_deltas.weight"]),
            "bias": np.asarray(sd["proposal_generator.rpn_head.anchor_deltas.bias"])},
    }
    res5 = {f"res5_{b}": _bottleneck(sd, f"roi_heads.res5.{b}")
            for b in range(cfg.res5_blocks)}
    dense = lambda p: {"kernel": np.asarray(sd[f"{p}.weight"]).T,
                       "bias": np.asarray(sd[f"{p}.bias"])}
    predictor = {"cls_score": dense("roi_heads.box_predictor.cls_score"),
                 "bbox_pred": dense("roi_heads.box_predictor.bbox_pred")}
    return {
        "stage1": {"params": {"backbone": backbone, "rpn_head": rpn}},
        "stage2": {"params": {"res5_head": res5,
                              "box_predictor": predictor}},
    }


def load_frcnn(weight_path: str, cfg: FrcnnConfig = FrcnnConfig()):
    """Build a detector from a torch checkpoint file/dir (``pytorch_model
    .bin`` layout of unc-nlp/frcnn-vg-finetuned)."""
    import os

    import torch

    if os.path.isdir(weight_path):
        weight_path = os.path.join(weight_path, "pytorch_model.bin")
    sd = torch.load(weight_path, map_location="cpu")
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    params = import_frcnn_state_dict(sd, cfg)
    det = FrcnnDetector(cfg, params=params)
    logger.info("FRCNN weights imported from %s", weight_path)
    return det
