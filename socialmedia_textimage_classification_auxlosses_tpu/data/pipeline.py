"""Batch pipeline (L2 back half): fixed-shape, prefetched device batches.

Replaces the reference's per-sample ``Dataset.__getitem__`` + DataLoader
workers (reference ``datasets.py``, SURVEY.md section 3.1 "HOT LOOP"):

* text is normalized + tokenized ONCE per split into padded int32 arrays
  (the reference redoes regex + encode_plus every epoch);
* images come from the uint8 cache (or an in-memory memoised lazy loader) —
  decoded/resized once, normalized on device;
* every batch has the same static shape; the final partial batch is padded
  and carries a ``valid`` row mask (XLA: one compiled step, no retraces);
* ``device_iter`` keeps one batch in flight (device_put is async) so host
  prep overlaps device compute, and shards batches over the mesh data axis.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import numpy as np

from .cache import ImageCache, RoiFeatureCache
from .images import load_pixels_u8
from .prep import SplitArrays


class LazyImageSource:
    """Decode+resize on first touch, memoise in RAM (uint8)."""

    def __init__(self, img_fmt: str, size: int = 224, empty_image=None,
                 center_crop_from=None, on_missing="zeros"):
        self.img_fmt = img_fmt
        self.size = size
        self.empty_image = empty_image
        self.center_crop_from = center_crop_from
        self.on_missing = on_missing
        self._memo: Dict[str, np.ndarray] = {}

    def gather(self, ids) -> np.ndarray:
        out = np.empty((len(ids), self.size, self.size, 3), np.uint8)
        for i, data_id in enumerate(ids):
            key = str(data_id)
            px = self._memo.get(key)
            if px is None:
                try:
                    px = load_pixels_u8(
                        self.img_fmt, data_id, size=self.size,
                        empty_image=self.empty_image,
                        center_crop_from=self.center_crop_from,
                        on_missing=self.on_missing,
                    )
                except Exception:
                    px = np.zeros((self.size, self.size, 3), np.uint8)
                self._memo[key] = px
            out[i] = px
        return out


class ExactViltImageSource:
    """``--vilt_exact_resize``: HF ViltProcessor geometry per sample
    (aspect-preserving resize + fixed masked canvas, images.py
    vilt_exact_resize_u8) instead of the default fixed-square resize.
    ``gather`` returns ``(frames, grid_hw)``; ``returns_grid`` tells the
    pipeline to emit the per-sample patch-grid extents as ``grid_hw``."""

    returns_grid = True

    def __init__(self, img_fmt: str, shortest: int = 384,
                 empty_image=None, on_missing="zeros"):
        from .images import vilt_canvas

        self.img_fmt = img_fmt
        self.shortest = shortest
        self.canvas = vilt_canvas(shortest)
        self.empty_image = empty_image
        self.on_missing = on_missing
        self._memo: Dict[str, tuple] = {}

    def gather(self, ids):
        from .images import open_image, vilt_exact_resize_u8

        frames = np.empty((len(ids), self.canvas, self.canvas, 3), np.uint8)
        grids = np.empty((len(ids), 2), np.int32)
        for i, data_id in enumerate(ids):
            key = str(data_id)
            hit = self._memo.get(key)
            if hit is None:
                try:
                    img = open_image(self.img_fmt, data_id, self.empty_image,
                                     on_missing=self.on_missing)
                    frame, (h, w) = vilt_exact_resize_u8(img, self.shortest)
                except Exception:
                    frame = np.zeros((self.canvas, self.canvas, 3), np.uint8)
                    h = w = self.shortest
                hit = (frame, (h, w))
                self._memo[key] = hit
            frames[i], grids[i] = hit[0], hit[1]
        return frames, grids


@dataclasses.dataclass
class PipelineConfig:
    batch_size: int
    max_length: int = 128
    image_size: int = 224
    with_images: bool = True
    with_text: bool = True
    center_crop_from: Optional[int] = None
    # Sequence-length bucketing (``--bucket_seq``): slice each batch's text
    # arrays to the smallest bucket >= the batch's longest real sequence.
    # Tweets are mostly far below the reference's pad-to-128
    # (reference config.py:57-60); with masked attention this is an EXACT
    # transform — dropped columns are fully padded, contribute exact zeros
    # through the -1e30 mask, and prefix position embeddings are unchanged
    # (per-example logit equality enforced in tests/test_bucketing.py).
    # Batch composition and shuffle order are untouched, so trajectories
    # stay comparable to the unbucketed run up to the exactness above.
    seq_buckets: Optional[tuple] = None
    # Bucket-GROUPED chunked dispatch (``--bucket_group``): stably regroup
    # the epoch's (already shuffled) batches by bucket width so each
    # (K, B, ...) scan chunk holds same-width batches and slices to the
    # PER-BATCH bucket instead of the chunk-global max (which at realistic
    # tweet-length mixes is ~always the full pad — one long tweet in K
    # batches defeats chunk-level bucketing). Batch composition and each
    # batch's contents are unchanged and per-example forward math stays
    # exact (tests/test_bucketing.py); only the batch VISIT ORDER within an
    # epoch deviates (documented in MIGRATION.md). Engages only for
    # shuffled (training) epochs; eval keeps sequential order so artifact
    # row order matches the reference contract.
    bucket_group: bool = False


class SplitPipeline:
    """One split's tokenised arrays + image source -> padded batches."""

    def __init__(
        self,
        split: SplitArrays,
        cfg: PipelineConfig,
        tokenizer=None,
        image_source=None,
        roi_cache: Optional[RoiFeatureCache] = None,
    ):
        self.cfg = cfg
        self.n = len(split)
        self.labels = np.asarray(split.labels, np.float32)
        self.data_ids = split.ids
        self.ids_num = split.ids_num
        self.image_adds = split.image_adds
        self.image_source = image_source
        self.roi_cache = roi_cache
        if cfg.with_text and tokenizer is not None:
            enc = tokenizer(list(split.text))
            self.ids = enc["ids"]
            self.mask = enc["mask"]
            self.token_type_ids = enc.get("token_type_ids")
        else:
            self.ids = self.mask = self.token_type_ids = None

    def __len__(self):
        return self.n

    @property
    def num_batches(self):
        return max(1, -(-self.n // self.cfg.batch_size)) if self.n else 0

    def _bucket_for(self, lmax: int, width: int) -> Optional[int]:
        """Smallest configured bucket >= ``lmax`` (None = no slicing)."""
        for b in sorted(self.cfg.seq_buckets or ()):
            if b >= lmax:
                return min(b, width)
        return None

    def _bucket_len(self, mask_rows) -> Optional[int]:
        if not self.cfg.seq_buckets:
            return None
        return self._bucket_for(int(mask_rows.sum(axis=-1).max()),
                                mask_rows.shape[-1])

    @staticmethod
    def bucket_slice(batch: Dict[str, np.ndarray], length: Optional[int]):
        """Slice the text arrays of a batch (or stacked chunk) to ``length``
        columns. Exact under masked attention: every dropped column is
        padding in every row."""
        if length is None:
            return batch
        out = dict(batch)
        for key in ("ids", "mask", "token_type_ids"):
            if key in out:
                out[key] = out[key][..., :length]
        return out

    def _grouped_order(self, shuffle, rng) -> np.ndarray:
        """Example order with whole batches stably regrouped by bucket width
        (``cfg.bucket_group``). Derived from the GLOBAL mask before any
        per-host row slicing, so every pod host computes the same order."""
        order = np.arange(self.n)
        if shuffle:
            (rng or np.random.RandomState(0)).shuffle(order)
        bs = self.cfg.batch_size
        width = self.mask.shape[-1]
        lens = self.mask.sum(axis=-1)

        def bucket_of(start):
            lmax = int(lens[order[start:start + bs]].max())
            return self._bucket_for(lmax, width) or width

        # Only FULL batches are regrouped; a partial tail batch must stay
        # LAST. The grouped order is re-cut at batch_size boundaries
        # downstream, so a shorter-than-bs group anywhere but the end would
        # shift every later cut and recompose batches across group
        # boundaries — violating the documented "composition unchanged"
        # invariant (the tail is last in the plain epoch too, so keeping it
        # there preserves every batch's membership exactly).
        starts = list(range(0, self.n, bs))
        full = sorted((s for s in starts if s + bs <= self.n),
                      key=bucket_of)  # stable
        tail = [s for s in starts if s + bs > self.n]
        return np.concatenate([order[s:s + bs] for s in full + tail])

    def batches(self, shuffle=False, rng: Optional[np.random.RandomState] = None,
                local_rows=None, bucket=True,
                order=None) -> Iterator[Dict[str, np.ndarray]]:
        """``local_rows=(start, stop)`` materialises only that row range of
        each global batch — the per-host slice on a multi-host pod
        (``MeshPlan.process_rows``). All hosts must pass identically-seeded
        ``rng`` so the global order agrees (the bucket length is likewise
        derived from the GLOBAL batch so every host compiles the same
        shape). ``order`` overrides the example visit order (the
        bucket-grouped chunkers precompute it; shuffle/rng are then
        ignored so the RNG stream is consumed exactly once)."""
        if self.n == 0:
            return
        if order is None:
            order = np.arange(self.n)
            if shuffle:
                (rng or np.random.RandomState(0)).shuffle(order)
        bs = self.cfg.batch_size
        for start in range(0, self.n, bs):
            idx = order[start:start + bs]
            pad = bs - len(idx)
            valid = np.ones(bs, np.float32)
            if pad:
                idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
                valid[len(idx) - pad:] = 0.0
            # bucket length (and the raw global max length, for chunked
            # stacking) derive from the GLOBAL batch, before any per-host
            # row slicing — every pod host must compile the same shape
            gmax = (int(self.mask[idx].sum(axis=-1).max())
                    if self.cfg.seq_buckets and self.mask is not None else None)
            blen = (self._bucket_for(gmax, self.mask.shape[-1])
                    if bucket and gmax is not None else None)
            if local_rows is not None:
                lo, hi = local_rows
                idx = idx[lo:hi]
                valid = valid[lo:hi]
            batch: Dict[str, np.ndarray] = {
                "labels": self.labels[idx],
                "valid": valid,
                "data_id": self.ids_num[idx],
            }
            if self.ids is not None:
                batch["ids"] = self.ids[idx][:, :blen] if blen else self.ids[idx]
                batch["mask"] = self.mask[idx][:, :blen] if blen else self.mask[idx]
                if self.token_type_ids is not None:
                    tt = self.token_type_ids[idx]
                    batch["token_type_ids"] = tt[:, :blen] if blen else tt
            if self.image_source is not None and self.cfg.with_images:
                if getattr(self.image_source, "returns_grid", False):
                    px, grid = self.image_source.gather(
                        [self.data_ids[i] for i in idx])
                    batch["pixel_values"] = px
                    batch["grid_hw"] = grid
                else:
                    batch["pixel_values"] = self.image_source.gather(
                        [self.data_ids[i] for i in idx]
                    )
            if self.roi_cache is not None:
                feats, boxes = self.roi_cache.gather([self.data_ids[i] for i in idx])
                batch["roi_features"] = feats
                batch["roi_boxes"] = boxes
            if self.image_adds is not None:
                batch["image_adds"] = np.asarray(self.image_adds, np.int32)[idx]
            if gmax is not None and not bucket:
                batch["_max_len"] = gmax  # host-only aux for chunked bucketing
            yield batch

    def device_iter(self, shuffle=False, rng=None, mesh_plan=None):
        """Device-put with one batch of lookahead; shards on the data axis
        when a mesh plan is given. On a multi-host pod each process
        materialises only its own rows of the global batch and assembles
        the global array from per-process shards."""
        import jax

        local_rows = None
        if mesh_plan is not None and jax.process_count() > 1:
            local_rows = mesh_plan.process_rows(self.cfg.batch_size)
            put = lambda b: mesh_plan.process_batch(b, self.cfg.batch_size)
        elif mesh_plan is not None:
            put = mesh_plan.shard_batch
        else:
            put = jax.device_put

        multi_host = jax.process_count() > 1

        def put_keep_ids(batch):
            # data_id stays HOST-SIDE int64: device_put under x64-disabled
            # JAX silently truncates int64 -> int32, which corrupts real
            # tweet ids (~1e18) in prediction CSVs and cache keys. The
            # compiled steps never read it. On a pod it must still ride
            # through process_batch — each host holds only its local rows
            # and eval needs the assembled global id column.
            if multi_host:
                return put(batch)
            host = {k: batch.pop(k) for k in ("data_id",) if k in batch}
            out = dict(put(batch))
            out.update(host)
            return out

        pending = None
        for batch in self.batches(shuffle=shuffle, rng=rng,
                                  local_rows=local_rows):
            nxt = put_keep_ids(batch)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending


    def device_iter_chunks(self, chunk_steps: int, shuffle=False, rng=None,
                           mesh_plan=None):
        """``chunk_steps`` consecutive batches stacked into one ``(K, B, ...)``
        device transfer, for the scanned multi-step dispatch
        (``train.steps.make_train_many``): one host->device dispatch per K
        optimizer steps instead of per step. The epoch tail is padded with
        duplicates of the last batch carrying ``step_valid = 0`` (skipped
        inside the scan), so every chunk reuses ONE compiled scan shape.

        On a pod each process stacks only its own rows of each global batch
        and the global ``(K, global_B, ...)`` arrays assemble via
        ``MeshPlan.process_batch_stacked`` — the scanned dispatch composes
        with multi-host input sharding (tests/test_multiprocess.py)."""
        import jax

        multi_host = jax.process_count() > 1
        local_rows = None
        if multi_host:
            if mesh_plan is None:
                raise ValueError("multi-process chunked dispatch needs a "
                                 "mesh plan (process_batch_stacked)")
            local_rows = mesh_plan.process_rows(self.cfg.batch_size)
            put = lambda b: mesh_plan.process_batch_stacked(
                b, self.cfg.batch_size)
        else:
            put = (mesh_plan.shard_batch_stacked if mesh_plan is not None
                   else jax.device_put)

        def stack(chunk):
            k = len(chunk)
            step_valid = np.ones(chunk_steps, np.float32)
            if k < chunk_steps:
                chunk = chunk + [chunk[-1]] * (chunk_steps - k)
                step_valid[k:] = 0.0
            lmaxes = [b.pop("_max_len") for b in chunk if "_max_len" in b]
            out = {key: np.stack([b[key] for b in chunk])
                   for key in chunk[0]}
            out["step_valid"] = step_valid
            if lmaxes:
                # bucket by CHUNK max so every batch in the stacked scan
                # shares one static width; lmaxes are GLOBAL maxima, so pod
                # hosts agree on the width (batches() left arrays unsliced)
                out = self.bucket_slice(
                    out, self._bucket_for(max(lmaxes), out["mask"].shape[-1]))
            return out, k

        def put_keep_ids(batches):
            if multi_host:
                return dict(put(batches))  # global id column assembly
            # see device_iter: data_id never rides through device_put
            host = {k: batches.pop(k) for k in ("data_id",) if k in batches}
            out = dict(put(batches))
            out.update(host)
            return out

        # bucket-grouped dispatch: regroup the (shuffled) epoch's batches by
        # bucket width so each chunk is pure-width and slices to the
        # per-batch bucket; a width change flushes the pending chunk
        # (step_valid-padded) so no chunk mixes widths.
        # KEEP IN SYNC: cli/_build.py VisionCachedPipe.device_iter_chunks
        # repeats this grouped-flush logic over its vision-cached batches
        # (the _grouped_order itself is shared — only the flush loop is
        # mirrored there).
        grouped = bool(self.cfg.bucket_group and self.cfg.seq_buckets
                       and self.mask is not None and shuffle)
        order = self._grouped_order(shuffle, rng) if grouped else None
        full_width = self.mask.shape[-1] if self.mask is not None else None

        def width_of(b):
            return (self._bucket_for(b["_max_len"], full_width) or full_width
                    if grouped and "_max_len" in b else None)

        pending = None
        chunk: list = []
        cur_w = None
        for batch in self.batches(shuffle=shuffle and order is None, rng=rng,
                                  bucket=False, local_rows=local_rows,
                                  order=order):
            w = width_of(batch)
            if chunk and grouped and w != cur_w:
                nxt = stack(chunk)
                chunk = []
                nxt = (put_keep_ids(nxt[0]), nxt[1])
                if pending is not None:
                    yield pending
                pending = nxt
            cur_w = w
            chunk.append(batch)
            if len(chunk) == chunk_steps:
                nxt = stack(chunk)
                chunk = []
                nxt = (put_keep_ids(nxt[0]), nxt[1])
                if pending is not None:
                    yield pending
                pending = nxt
        if chunk:
            nxt = stack(chunk)
            nxt = (put_keep_ids(nxt[0]), nxt[1])
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending


class MMBTBatcher:
    """MMBT-style samples (reference ``MMBT_Dataset``, datasets.py:356-402):
    sentence token ids with the [CLS]/[SEP] ids split off as image start/end
    tokens, plus the torchvision-normalized image. The reference declares the
    dataset but ships no MMBT model or runner (only ``results_dir_mmbt``,
    config.py:135) — this batcher provides the data-side parity so an MMBT
    head can be attached later.
    """

    def __init__(self, split: SplitArrays, tokenizer, image_source,
                 batch_size: int, max_length: int):
        enc = tokenizer(list(split.text))
        self.ids = enc["ids"]
        self.mask = enc["mask"]
        self.split = split
        self.image_source = image_source
        self.batch_size = batch_size
        self.max_length = max_length

    def batches(self):
        n = len(self.split)
        for start in range(0, n, self.batch_size):
            idx = np.arange(start, min(start + self.batch_size, n))
            ids = self.ids[idx]
            yield {
                "image_start_token": ids[:, 0],
                "image_end_token": np.asarray(
                    [row[row.nonzero()][-1] if row.any() else 0 for row in self.mask[idx] * ids]
                ),
                "sentence": ids[:, 1:],
                "sentence_mask": self.mask[idx][:, 1:],
                "image": self.image_source.gather(
                    [self.split.ids[i] for i in idx]
                ),
                "label": self.split.labels[idx],
                "data_id": self.split.ids_num[idx],
            }


def make_image_source(
    img_fmt: str,
    ids=None,
    size: int = 224,
    cache_dir: Optional[str] = None,
    empty_image=None,
    center_crop_from=None,
    use_cache: bool = False,
):
    """Disk-backed uint8 cache when requested (the reference's
    ``--use_saved_features``), memoised lazy loading otherwise. On a
    multi-host pod each process eagerly decodes only its 1/num_processes
    round-robin slice of the id set (misses fill lazily on gather)."""
    if use_cache and cache_dir and ids is not None:
        import jax

        shard = ((jax.process_index(), jax.process_count())
                 if jax.process_count() > 1 else None)
        return ImageCache(cache_dir, size=size).build(
            ids, img_fmt, empty_image=empty_image,
            center_crop_from=center_crop_from, process_shard=shard,
        )
    return LazyImageSource(img_fmt, size=size, empty_image=empty_image,
                           center_crop_from=center_crop_from)
