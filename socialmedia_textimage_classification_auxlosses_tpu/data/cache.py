"""Offline feature caches (replaces the reference's per-sample ``torch.save``
caches written by ``obj_features.py`` — ``{task}_img_feats/{imgs,vilt}/
input_{id}`` at reference obj_features.py:99-140 and the ``boxes/features``
ROI dumps at :142-173).

Design: one memory-mapped ``pixels.npy`` (N, H, W, 3) uint8 per (task, model
geometry) plus an id index — two files instead of N small pickles, read with
zero deserialisation cost, resumable via a row-validity bitmap.

ROI features for LXMERT are cached the same way: ``features.npy``
(N, boxes, 2048) float16 + ``boxes.npy`` (N, boxes, 4) float32, written
either by importing reference-format dumps or by our grid-feature extractor
(``cli/obj_features.py``).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from ..utils.logging import get_logger
from .images import load_pixels_u8

logger = get_logger(__name__)


class ImageCache:
    """uint8 pixel cache for one (task, image-size) combination."""

    def __init__(self, cache_dir: str, size: int = 224):
        self.cache_dir = cache_dir
        self.size = size
        self.meta_path = os.path.join(cache_dir, "meta.json")
        self.pixels_path = os.path.join(cache_dir, "pixels.npy")
        self.index = {}
        self.valid = None
        self._pixels = None
        self._decode_opts = None  # set by build(); enables decode-on-miss
        if os.path.isfile(self.meta_path):
            with open(self.meta_path) as f:
                meta = json.load(f)
            self.index = {str(k): v for k, v in meta["index"].items()}
            self.size = meta["size"]
            self.valid = np.asarray(meta["valid"], bool)
            if "decode_opts" in meta:
                self._decode_opts = meta["decode_opts"]

    def build(self, ids: Sequence, img_fmt: str, empty_image: Optional[str] = None,
              center_crop_from: Optional[int] = None, on_missing: str = "zeros",
              process_shard: Optional[tuple] = None):
        """Resumable bulk build (reference obj_features resumability via
        done_ids dir scans, obj_features.py:58-60). Ids already cached are
        kept; new ids extend the cache (splits share one cache dir).

        ``process_shard=(index, count)``: multi-host pods decode only every
        count-th id eagerly (round-robin by position) — the full sweep costs
        1/count per host instead of N full sweeps. Rows another host owns
        stay invalid and are decoded lazily on first ``gather`` (shuffled
        epochs may route any id to any host), so correctness never depends
        on the shard assignment. Each host MUST use its own cache directory:
        a shared directory would race last-writer-wins on the memmap/meta,
        and this process's in-memory validity bitmap could then mark rows
        True whose file bytes another host's rebuild zeroed — so shared-dir
        sharded builds are refused outright (builder-marker detection below)
        rather than documented as "repaired on miss"."""
        os.makedirs(self.cache_dir, exist_ok=True)
        shard_idx_pre, shard_cnt_pre = process_shard if process_shard else (0, 1)
        if shard_cnt_pre > 1:
            self._claim_shard_dir(shard_idx_pre)
        ids = [str(x) for x in ids]
        self._decode_opts = {"img_fmt": img_fmt, "empty_image": empty_image,
                             "center_crop_from": center_crop_from,
                             "on_missing": on_missing}
        if self.index and all(i in self.index for i in ids):
            return self
        old_index = dict(self.index)
        old_pixels = np.array(self.pixels) if old_index else None
        old_valid = self.valid if self.valid is not None else np.zeros(0, bool)
        self._pixels = None
        new_ids = [i for i in ids if i not in old_index]
        all_ids = list(old_index.keys()) + new_ids
        n = len(all_ids)
        pixels = np.lib.format.open_memmap(
            self.pixels_path, mode="w+", dtype=np.uint8,
            shape=(n, self.size, self.size, 3),
        )
        valid = np.zeros(n, bool)
        if old_pixels is not None:
            pixels[: len(old_index)] = old_pixels
            valid[: len(old_index)] = old_valid[: len(old_index)]
        shard_idx, shard_cnt = process_shard if process_shard else (0, 1)
        for k, data_id in enumerate(new_ids):
            if shard_cnt > 1 and k % shard_cnt != shard_idx:
                continue  # another host's eager slice; lazily filled if needed
            row = len(old_index) + k
            try:
                pixels[row] = load_pixels_u8(
                    img_fmt, data_id, size=self.size, empty_image=empty_image,
                    center_crop_from=center_crop_from, on_missing="error",
                )
                valid[row] = True
            except Exception:
                if on_missing == "error":
                    raise
                logger.info("failed id %s", data_id)
            if k % 500 == 0:
                logger.info("image cache %d/%d", k, len(new_ids))
        pixels.flush()
        self.index = {data_id: row for row, data_id in enumerate(all_ids)}
        self.valid = valid
        self._write_meta()
        if shard_cnt > 1:
            # a concurrent builder that appeared mid-build may have clobbered
            # our flush — detect and refuse rather than serve blank rows
            self._claim_shard_dir(shard_idx)
        return self

    def _claim_shard_dir(self, shard_idx: int):
        """Mark this directory as owned by process-shard ``shard_idx``; refuse
        if another shard has (ever) built here. A shared directory across
        shards races last-writer-wins on the memmap, which can leave rows
        the local validity bitmap trusts as decoded but whose file bytes are
        zeros — sharded builds therefore require per-host cache dirs."""
        mine = os.path.join(self.cache_dir, f".builder_shard{shard_idx}")
        others = [f for f in os.listdir(self.cache_dir)
                  if f.startswith(".builder_shard") and
                  f != os.path.basename(mine)]
        if others:
            raise RuntimeError(
                f"cache dir {self.cache_dir} was built by process shard(s) "
                f"{sorted(others)}; sharded cache builds require a distinct "
                "per-host cache directory (a shared dir races last-writer-"
                "wins on the pixel memmap and can serve blank images)")
        with open(mine, "w") as f:
            f.write(str(os.getpid()))

    def _write_meta(self):
        with open(self.meta_path, "w") as f:
            json.dump({"index": self.index, "size": self.size,
                       "valid": self.valid.tolist(),
                       "decode_opts": self._decode_opts}, f)

    @property
    def pixels(self):
        if self._pixels is None:
            self._pixels = np.load(self.pixels_path, mmap_mode="r")
        return self._pixels

    def rows(self, ids) -> np.ndarray:
        return np.asarray([self.index[str(i)] for i in ids], np.int64)

    def _fill_missing(self, ids, rows):
        """Decode-on-miss for rows whose eager build belonged to another
        process shard; written back to the memmap so each miss decodes once."""
        opts = self._decode_opts
        if opts is None:
            return  # legacy cache without decode opts: serve zeros as built
        missing = [(str(i), int(r)) for i, r in zip(ids, rows)
                   if not self.valid[r]]
        if not missing:
            return
        self._pixels = None
        pixels = np.load(self.pixels_path, mmap_mode="r+")
        for data_id, row in missing:
            try:
                pixels[row] = load_pixels_u8(
                    opts["img_fmt"], data_id, size=self.size,
                    empty_image=opts.get("empty_image"),
                    center_crop_from=opts.get("center_crop_from"),
                    on_missing="error",
                )
                self.valid[row] = True
            except Exception:
                if opts.get("on_missing") == "error":
                    raise
                logger.info("failed id %s", data_id)
                self.valid[row] = True  # zeros row; don't retry every epoch
        pixels.flush()
        self._write_meta()

    def gather(self, ids) -> np.ndarray:
        rows = self.rows(ids)
        if self.valid is not None and not self.valid[rows].all():
            self._fill_missing(ids, rows)
        return self.pixels[rows]


class RoiFeatureCache:
    """Precomputed object features for the LXMERT path (reference
    ``datasets.py:289-294`` torch.loads two tensors per sample per epoch)."""

    def __init__(self, cache_dir: str, num_boxes: int = 36, feat_dim: int = 2048,
                 feat_dtype=np.float16):
        self.cache_dir = cache_dir
        self.num_boxes = num_boxes
        self.feat_dim = feat_dim
        # our own extractor caches fp16 (space); reference-dump imports keep
        # the dumped fp32 bits so torch.load parity is exact
        self.feat_dtype = np.dtype(feat_dtype)
        self.meta_path = os.path.join(cache_dir, "meta.json")
        self.feat_path = os.path.join(cache_dir, "features.npy")
        self.box_path = os.path.join(cache_dir, "boxes.npy")
        self.index = {}
        if os.path.isfile(self.meta_path):
            with open(self.meta_path) as f:
                meta = json.load(f)
            self.index = {str(k): v for k, v in meta["index"].items()}
            self.num_boxes = meta["num_boxes"]
            self.feat_dim = meta["feat_dim"]
        self._feats = None
        self._boxes = None

    def write(self, ids, features: np.ndarray, boxes: np.ndarray):
        os.makedirs(self.cache_dir, exist_ok=True)
        np.save(self.feat_path, features.astype(self.feat_dtype))
        np.save(self.box_path, boxes.astype(np.float32))
        self.index = {str(i): row for row, i in enumerate(ids)}
        with open(self.meta_path, "w") as f:
            json.dump({"index": self.index, "num_boxes": self.num_boxes,
                       "feat_dim": self.feat_dim}, f)

    @property
    def features(self):
        if self._feats is None:
            self._feats = np.load(self.feat_path, mmap_mode="r")
        return self._feats

    @property
    def boxes(self):
        if self._boxes is None:
            self._boxes = np.load(self.box_path, mmap_mode="r")
        return self._boxes

    def gather(self, ids):
        rows = np.asarray([self.index[str(i)] for i in ids], np.int64)
        return (np.asarray(self.features[rows], np.float32),
                np.asarray(self.boxes[rows], np.float32))

    def import_reference_dumps(self, data_path: str, task_name: str, ids) -> bool:
        """Ingest the reference's per-sample torch dumps
        (``{task}_img_feats/{boxes,features}/``) if present."""
        box_dir = os.path.join(data_path, f"{task_name}_img_feats", "boxes")
        feat_dir = os.path.join(data_path, f"{task_name}_img_feats", "features")
        if not (os.path.isdir(box_dir) and os.path.isdir(feat_dir)):
            return False
        import torch

        feats, boxes, kept = [], [], []
        for data_id in ids:
            fp = os.path.join(feat_dir, f"feat_{data_id}")
            bp = os.path.join(box_dir, f"nbox_{data_id}")
            if not (os.path.isfile(fp) and os.path.isfile(bp)):
                continue
            feats.append(torch.load(fp, map_location="cpu").squeeze(0).numpy())
            boxes.append(torch.load(bp, map_location="cpu").squeeze(0).numpy())
            kept.append(data_id)
        if not kept:
            return False
        self.num_boxes = feats[0].shape[0]
        self.feat_dim = feats[0].shape[1]
        self.feat_dtype = np.dtype(feats[0].dtype)
        self.write(kept, np.stack(feats), np.stack(boxes))
        return True
