"""Independent torch twin of the FRCNN inference path (models/frcnn.py).

Used by tests/test_frcnn.py the way tests/ref_harness.py reconstructs the
reference's trainers: the twin carries the published unc-nlp
``pytorch_model.bin`` key layout (``backbone.stem.conv1`` /
``backbone.res{N}.{i}`` / ``proposal_generator.rpn_head`` /
``roi_heads.res5.{i}`` / ``roi_heads.box_predictor``) so its ``state_dict()``
round-trips through ``import_frcnn_state_dict``, and it re-implements the
anchor/decode/NMS/ROIAlign math independently in torch/numpy so the JAX
implementation is cross-checked rather than self-checked.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TFrozenBN(nn.Module):
    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.rand(c) + 0.5)
        self.bias = nn.Parameter(torch.randn(c) * 0.1)
        self.register_buffer("running_mean", torch.randn(c) * 0.1)
        self.register_buffer("running_var", torch.rand(c) + 0.5)
        self.eps = eps

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        shift = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + shift[None, :, None, None]


class TConv(nn.Module):
    """conv + .norm child, mirroring detectron2's Conv2d-with-norm keys."""

    def __init__(self, cin, cout, k, stride=1, pad=0, bias=False, norm=True):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(cout, cin, k, k) * 0.05)
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None
        self.norm = TFrozenBN(cout) if norm else None
        self.stride, self.pad = stride, pad

    def forward(self, x):
        y = F.conv2d(x, self.weight, self.bias, self.stride, self.pad)
        return self.norm(y) if self.norm is not None else y


class TBottleneck(nn.Module):
    def __init__(self, cin, width, stride=1):
        super().__init__()
        self.conv1 = TConv(cin, width, 1, stride=stride)      # stride_in_1x1
        self.conv2 = TConv(width, width, 3, pad=1)
        self.conv3 = TConv(width, width * 4, 1)
        self.shortcut = (TConv(cin, width * 4, 1, stride=stride)
                         if (cin != width * 4 or stride != 1) else None)

    def forward(self, x):
        y = F.relu(self.conv1(x))
        y = F.relu(self.conv2(y))
        y = self.conv3(y)
        s = self.shortcut(x) if self.shortcut is not None else x
        return F.relu(y + s)


class TStem(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = TConv(3, features, 7, stride=2, pad=3)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        return F.max_pool2d(x, 3, stride=2, ceil_mode=True)  # caffemaxpool


class TBackbone(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.stem = TStem(cfg.stem_features)
        cin = cfg.stem_features
        for stage, blocks in enumerate(cfg.stage_sizes):
            width = cfg.stem_features * (2 ** stage)
            seq = nn.Sequential()
            for b in range(blocks):
                seq.add_module(str(b), TBottleneck(
                    cin, width, stride=2 if stage > 0 and b == 0 else 1))
                cin = width * 4
            self.add_module(f"res{stage + 2}", seq)
        self.n_stages = len(cfg.stage_sizes)

    def forward(self, x):
        x = self.stem(x)
        for s in range(self.n_stages):
            x = getattr(self, f"res{s + 2}")(x)
        return x


class TRpnHead(nn.Module):
    def __init__(self, cin, num_anchors):
        super().__init__()
        self.conv = TConv(cin, cin, 3, pad=1, bias=True, norm=False)
        self.objectness_logits = TConv(cin, num_anchors, 1, bias=True, norm=False)
        self.anchor_deltas = TConv(cin, 4 * num_anchors, 1, bias=True, norm=False)

    def forward(self, f):
        t = F.relu(self.conv(f))
        return self.objectness_logits(t), self.anchor_deltas(t)


class TRes5(nn.Sequential):
    def __init__(self, cfg, cin):
        width = cfg.feat_dim // 4
        blocks = [TBottleneck(cin if b == 0 else width * 4, width,
                              stride=2 if b == 0 else 1)
                  for b in range(cfg.res5_blocks)]
        super().__init__(*blocks)


class TBoxPredictor(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cls_score = nn.Linear(cfg.feat_dim, cfg.num_classes + 1)
        self.bbox_pred = nn.Linear(cfg.feat_dim, cfg.num_classes * 4)


class TRoiHeads(nn.Module):
    def __init__(self, cfg, cin):
        super().__init__()
        self.res5 = TRes5(cfg, cin)
        self.box_predictor = TBoxPredictor(cfg)


class TProposalGenerator(nn.Module):
    def __init__(self, cfg, cin):
        super().__init__()
        self.rpn_head = TRpnHead(cin, cfg.num_anchors)


class TwinFrcnn(nn.Module):
    """state_dict-compatible with import_frcnn_state_dict + an independent
    numpy inference pipeline."""

    def __init__(self, cfg):
        super().__init__()
        torch.manual_seed(0)
        self.cfg = cfg
        self.backbone = TBackbone(cfg)
        cin = cfg.res4_features
        self.proposal_generator = TProposalGenerator(cfg, cin)
        self.roi_heads = TRoiHeads(cfg, cin)

    # ---- independent geometry -------------------------------------------

    def anchors(self, gh, gw):
        base = []
        for size in self.cfg.anchor_sizes:
            for ratio in self.cfg.anchor_ratios:
                w = math.sqrt(size * size / ratio)
                h = w * ratio
                base.append((-w / 2, -h / 2, w / 2, h / 2))
        out = []
        for yy in range(gh):
            for xx in range(gw):
                for (a, b, c, d) in base:
                    out.append((xx * self.cfg.stride + a, yy * self.cfg.stride + b,
                                xx * self.cfg.stride + c, yy * self.cfg.stride + d))
        return np.asarray(out, np.float64)

    @staticmethod
    def decode(anchors, deltas, weights):
        wx, wy, ww, wh = weights
        aw = anchors[:, 2] - anchors[:, 0]
        ah = anchors[:, 3] - anchors[:, 1]
        ax = anchors[:, 0] + aw / 2
        ay = anchors[:, 1] + ah / 2
        clamp = math.log(1000.0 / 16)
        cx = ax + deltas[:, 0] / wx * aw
        cy = ay + deltas[:, 1] / wy * ah
        w = aw * np.exp(np.minimum(deltas[:, 2] / ww, clamp))
        h = ah * np.exp(np.minimum(deltas[:, 3] / wh, clamp))
        return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)

    @staticmethod
    def nms(boxes, scores, thresh, max_out=None):
        idx = list(np.argsort(-scores, kind="stable"))
        keep = []
        while idx:
            i = idx.pop(0)
            keep.append(i)
            if max_out and len(keep) >= max_out:
                break
            rem = []
            for j in idx:
                xx0 = max(boxes[i, 0], boxes[j, 0])
                yy0 = max(boxes[i, 1], boxes[j, 1])
                xx1 = min(boxes[i, 2], boxes[j, 2])
                yy1 = min(boxes[i, 3], boxes[j, 3])
                inter = max(xx1 - xx0, 0) * max(yy1 - yy0, 0)
                a_i = max(boxes[i, 2] - boxes[i, 0], 0) * max(boxes[i, 3] - boxes[i, 1], 0)
                a_j = max(boxes[j, 2] - boxes[j, 0], 0) * max(boxes[j, 3] - boxes[j, 1], 0)
                union = a_i + a_j - inter
                iou = inter / union if union > 0 else 0.0
                if iou <= thresh:
                    rem.append(j)
            idx = rem
        return np.asarray(keep, np.int64)

    def roi_align(self, fmap, boxes):
        """aligned=False, fixed sampling_ratio — scalar loops (tiny tests)."""
        cfg = self.cfg
        scale = 1.0 / cfg.stride
        p, s = cfg.pooler_resolution, cfg.sampling_ratio
        c, h, w = fmap.shape
        out = np.zeros((len(boxes), c, p, p), np.float64)

        def bilinear(y, x):
            if y < -1.0 or y > h or x < -1.0 or x > w:
                return np.zeros(c)
            y = min(max(y, 0.0), h - 1.0)
            x = min(max(x, 0.0), w - 1.0)
            y0, x0 = int(np.floor(y)), int(np.floor(x))
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            fy, fx = y - y0, x - x0
            return ((1 - fy) * (1 - fx) * fmap[:, y0, x0] +
                    (1 - fy) * fx * fmap[:, y0, x1] +
                    fy * (1 - fx) * fmap[:, y1, x0] +
                    fy * fx * fmap[:, y1, x1])

        for n, (bx0, by0, bx1, by1) in enumerate(boxes):
            x0, y0, x1, y1 = bx0 * scale, by0 * scale, bx1 * scale, by1 * scale
            bw = max(x1 - x0, 1.0) / p
            bh = max(y1 - y0, 1.0) / p
            for py in range(p):
                for px in range(p):
                    acc = np.zeros(c)
                    for iy in range(s):
                        for ix in range(s):
                            yy = y0 + (py + (iy + 0.5) / s) * bh
                            xx = x0 + (px + (ix + 0.5) / s) * bw
                            acc += bilinear(yy, xx)
                    out[n, :, py, px] = acc / (s * s)
        return out

    # ---- inference -------------------------------------------------------

    @torch.no_grad()
    def detect(self, image_chw: np.ndarray, size_hw):
        cfg = self.cfg
        x = torch.tensor(image_chw, dtype=torch.float32)[None]
        fmap = self.backbone(x)
        logits, deltas = self.proposal_generator.rpn_head(fmap)
        gh, gw = fmap.shape[2], fmap.shape[3]
        anchors = self.anchors(gh, gw)
        # channel layouts: logits (A, H, W) -> cell-major; deltas (4A, H, W)
        scores = logits[0].permute(1, 2, 0).reshape(-1).numpy().astype(np.float64)
        dl = deltas[0].permute(1, 2, 0).reshape(-1, 4).numpy().astype(np.float64)
        k = min(cfg.rpn_pre_nms_topk, len(scores))
        top = np.argpartition(-scores, k - 1)[:k]
        boxes = self.decode(anchors[top], dl[top], cfg.rpn_bbox_weights)
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, size_hw[1])
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, size_hw[0])
        alive = ((boxes[:, 2] - boxes[:, 0] > cfg.rpn_min_box_size) &
                 (boxes[:, 3] - boxes[:, 1] > cfg.rpn_min_box_size))
        boxes, sc = boxes[alive], scores[top][alive]
        keep = self.nms(boxes, sc, cfg.rpn_nms_thresh,
                        max_out=cfg.rpn_post_nms_topk)
        proposals = boxes[keep]

        pooled = self.roi_align(fmap[0].numpy().astype(np.float64), proposals)
        pooled_t = torch.tensor(pooled, dtype=torch.float32)
        feats = self.roi_heads.res5(pooled_t).mean(dim=(2, 3))
        cls_logits = self.roi_heads.box_predictor.cls_score(feats)
        box_deltas = self.roi_heads.box_predictor.bbox_pred(feats)

        probs = torch.softmax(cls_logits, -1).numpy()[:, :-1].astype(np.float64)
        n = len(proposals)
        cls = probs.argmax(1)
        best = probs[np.arange(n), cls]
        dsel = box_deltas.numpy().reshape(n, cfg.num_classes, 4)[
            np.arange(n), cls].astype(np.float64)
        det_boxes = self.decode(proposals, dsel, cfg.box_bbox_weights)
        det_boxes[:, 0::2] = np.clip(det_boxes[:, 0::2], 0, size_hw[1])
        det_boxes[:, 1::2] = np.clip(det_boxes[:, 1::2], 0, size_hw[0])

        chosen = []
        conf = best >= cfg.box_score_thresh
        for c in np.unique(cls[conf]):
            rows = np.nonzero(conf & (cls == c))[0]
            keep_c = rows[self.nms(det_boxes[rows], best[rows],
                                   cfg.box_nms_thresh)]
            chosen.extend(keep_c.tolist())
        chosen = sorted(chosen, key=lambda i: -best[i])[: cfg.max_detections]
        if len(chosen) < cfg.min_detections:
            rest = [i for i in np.argsort(-best) if i not in set(chosen)]
            chosen = (chosen + rest)[: cfg.min_detections]
        idx = np.asarray(chosen, np.int64)
        norm = det_boxes[idx] / np.asarray(
            [size_hw[1], size_hw[0], size_hw[1], size_hw[0]], np.float64)
        return {
            "roi_features": feats.numpy()[idx],
            "normalized_boxes": norm.astype(np.float32),
            "scores": best[idx].astype(np.float32),
            "classes": idx_cls(cls, idx),
            "proposal_idx": idx,
        }


def idx_cls(cls, idx):
    return cls[idx].astype(np.int64)
