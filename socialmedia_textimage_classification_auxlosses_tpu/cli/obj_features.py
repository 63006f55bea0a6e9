"""Offline feature cacher (reference ``models/obj_features.py``).

Three modes, mirroring the reference's three preprocessors:
  * ``--mode mm``   -> uint8 image cache for the dual-encoder path
                       (reference preprocess_mm, obj_features.py:99-140)
  * ``--mode vilt`` -> uint8 image cache at ViLT geometry
                       (reference preprocess_vilt, obj_features.py:54-97)
  * ``--mode obj``  -> object features for LXMERT
                       (reference preprocess_obj, obj_features.py:142-173)

The reference's ``obj`` mode runs an external Faster-R-CNN
(``lxmert_scripts``, absent from its repo — SURVEY.md section 2.1). Our
framework provides three object-feature sources (``--obj_source``):

  * ``frcnn`` — the NATIVE detector (models/frcnn.py): raw images ->
    36 ROI features + normalized boxes, weights imported from the
    ``unc-nlp/frcnn-vg-finetuned`` layout at MODEL_DIR_DICT['frcnn']
    (random-init with a loud warning when absent);
  * ``dumps`` — reference-format torch dumps imported into the memmapped
    cache (bit-parity with reference-produced features);
  * ``grid`` — a conv trunk's final 7x7 feature map as 49 pseudo-regions
    (detector-free substitute; trunk weights from MODEL_DIR_DICT['resnet50']).

``auto`` (default) prefers dumps, then the frcnn detector.

    python -m ....cli.obj_features --task 3 --mode obj
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from ..core import config as C
from ..data.cache import ImageCache, RoiFeatureCache
from ..data.images import load_pixels_u8
from ..utils.logging import get_logger

logger = get_logger(__name__)


def extract_grid_features(ids, img_fmt, cache: RoiFeatureCache, tiny=False,
                          batch_size: int = 16, image_size: int = 224,
                          weight_path: str = None):
    """ResNet trunk -> (N, grid*grid, 2048) pseudo-ROI features +
    normalized grid boxes.

    Trunk weights load from ``weight_path`` (default:
    ``MODEL_DIR_DICT['resnet50']``, a torchvision ``.pth``/state-dict dir —
    the reference's detector trunk is likewise pretrained,
    obj_features.py:142-173). Without weights the features are noise; the
    fallback stays usable for smoke tests but WARNS loudly.
    """
    import jax
    import jax.numpy as jnp

    from ..data.images import normalize_on_device
    from ..models import hf_import as H
    from ..models.resnet import ResNet
    from ..models.vision import IMAGE_NORM

    if tiny:
        image_size = 64
    stage_sizes = (1, 1, 1, 1) if tiny else (3, 4, 6, 3)
    model = ResNet(stage_sizes, num_labels=2)
    px0 = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), px0, train=False)
    if not tiny:  # tiny stage sizes can't host resnet50 weights
        if weight_path is None:
            weight_path = C.MODEL_DIR_DICT.get("resnet50", "")
        imported = H.maybe_import_resnet(params, weight_path, "resnet50")
        if imported is params:
            logger.warning(
                "extract_grid_features: no pretrained trunk weights at %r — "
                "grid features will come from a RANDOM-INIT ResNet and are "
                "effectively noise. Provide MODEL_DIR_DICT['resnet50'] "
                "(torchvision resnet50 state dict) or reference FRCNN dumps "
                "for real LXMERT runs.", weight_path)
        else:
            params = imported
            logger.info("grid-feature trunk: imported weights from %s",
                        weight_path)
    mean, std = IMAGE_NORM["imagenet"]

    @jax.jit
    def features_of(p, pixels_u8):
        pixels = normalize_on_device(pixels_u8, mean, std, jnp.float32)
        _, fmap = model.apply(p, pixels, train=False, return_features=True)
        b, h, w, c = fmap.shape
        return fmap.reshape(b, h * w, c)

    ids = [str(i) for i in ids]
    feats_all, boxes_all = [], []
    grid = None
    for start in range(0, len(ids), batch_size):
        chunk = ids[start:start + batch_size]
        pixels = np.stack([
            _safe_pixels(img_fmt, i, image_size) for i in chunk
        ])
        feats = np.asarray(features_of(params, pixels))
        if grid is None:
            grid = int(round(feats.shape[1] ** 0.5))
        feats_all.append(feats)
        if start % (batch_size * 20) == 0:
            logger.info("grid features %d/%d", start, len(ids))
    feats = np.concatenate(feats_all)
    boxes = _grid_boxes(grid)
    boxes = np.tile(boxes[None], (len(ids), 1, 1))
    cache.num_boxes = grid * grid
    cache.feat_dim = feats.shape[-1]
    cache.write(ids, feats, boxes)
    logger.info("wrote %d grid-feature rows to %s", len(ids), cache.cache_dir)
    return cache


def extract_frcnn_features(ids, img_fmt, cache: RoiFeatureCache,
                           weight_path: str = None, tiny: bool = False,
                           dtype: str = "float32", ingest: str = "pil",
                           rpn_pre_topk: int = None,
                           rpn_post_topk: int = None):
    """Native detector path: raw images -> (N, 36, 2048) ROI features +
    (N, 36, 4) normalized boxes (reference preprocess_obj,
    obj_features.py:142-173), resumable at the cache level.

    ``dtype="bfloat16"`` runs the conv trunk (backbone/res5) in bf16 — a
    throughput option for the conv-bound fused path; RPN outputs, box
    decode/NMS, and pooled features stay f32. f32 is the parity default
    (torch-twin tests)."""
    from ..models import frcnn as FR
    from ..data.images import open_image

    cfg = FR.TINY if tiny else FR.FrcnnConfig()
    if dtype != cfg.dtype:
        cfg = dataclasses.replace(cfg, dtype=dtype)
    cfg = FR.apply_topk_overrides(cfg, rpn_pre_topk, rpn_post_topk)
    det = None
    if weight_path is None:
        weight_path = C.MODEL_DIR_DICT.get("frcnn", "")
    try:
        det = FR.load_frcnn(weight_path, cfg)
    except Exception:
        det = FR.FrcnnDetector(cfg)
        logger.warning(
            "extract_frcnn_features: no detector weights at %r — ROI "
            "features come from a RANDOM-INIT detector and are effectively "
            "noise. Provide MODEL_DIR_DICT['frcnn'] "
            "(unc-nlp/frcnn-vg-finetuned pytorch_model.bin) for real LXMERT "
            "runs.", weight_path)
    ids = [str(i) for i in ids]
    feats = np.zeros((len(ids), cfg.max_detections, cfg.feat_dim), np.float32)
    boxes = np.zeros((len(ids), cfg.max_detections, 4), np.float32)
    # Batched double-buffered dispatch: group B images per device round-trip
    # (detect_batch_async pads each canvas-orientation group to B so
    # stage 1/2 compile at most twice) and overlap the NEXT chunk's host
    # decode/resize with the chip's work on the current one — dispatch is
    # async, only the deferred fetch synchronises. Results are bit-identical
    # to the serial loop (same jitted program; tests/test_frcnn.py), vs the
    # reference's strictly per-image synchronous loop (obj_features.py:142-173).
    # B=16 amortises the tunnel dispatch+fetch over more images: measured
    # 74-77 ms/image double-buffered vs 99-100 at B=8 (tests/perf_frcnn.py
    # --pipeline 4 --batch 16, 2026-08-18).
    B = 16

    def _decode_chunk(start):
        chunk = ids[start:start + B]
        imgs, ok = [], []
        for data_id in chunk:
            try:
                imgs.append(open_image(img_fmt, data_id, on_missing="zeros"))
                ok.append(True)
            except Exception:
                imgs.append(None)
                ok.append(False)
                logger.info("failed id %s", data_id)
        return imgs, ok

    def _store(start, ok, fetch):
        try:
            outs = fetch()
        except Exception:
            logger.info("failed batch at %d", start)
            return
        it = iter(outs)
        for j, good in enumerate(ok):
            if not good:
                continue
            out = next(it)
            feats[start + j] = out["roi_features"]
            boxes[start + j] = out["normalized_boxes"]

    pending = None  # (start, ok, deferred-fetch)
    for start in range(0, len(ids), B):
        imgs, ok = _decode_chunk(start)
        try:
            fetch = det.detect_batch_async(
                [im for im in imgs if im is not None], pad_to=B,
                ingest=ingest)
        except Exception:
            logger.info("failed batch at %d", start)
            fetch = None
        if pending is not None:
            _store(*pending)
        pending = (start, ok, fetch) if fetch is not None else None
        if (start // B) % 16 == 0:
            logger.info("frcnn features %d/%d", start, len(ids))
    if pending is not None:
        _store(*pending)
    cache.num_boxes = cfg.max_detections
    cache.feat_dim = cfg.feat_dim
    cache.write(ids, feats, boxes)
    logger.info("wrote %d detector ROI rows to %s", len(ids), cache.cache_dir)
    return cache


def _safe_pixels(img_fmt, data_id, size):
    try:
        return load_pixels_u8(img_fmt, data_id, size=size, on_missing="zeros")
    except Exception:
        logger.info("failed id %s", data_id)
        return np.zeros((size, size, 3), np.uint8)


def _grid_boxes(grid: int) -> np.ndarray:
    xs = np.linspace(0, 1, grid + 1)
    boxes = []
    for r in range(grid):
        for c in range(grid):
            boxes.append([xs[c], xs[r], xs[c + 1], xs[r + 1]])
    return np.asarray(boxes, np.float32)


def main(argv=None):
    from ._common import enable_compile_cache

    enable_compile_cache()   # the full-geometry detector compile is ~2-3 min
    parser = argparse.ArgumentParser(description="offline feature caching")
    parser.add_argument("--task", type=int, choices=[0, 1, 2, 3, 4, 5, 6],
                        required=True)
    parser.add_argument("--mode", type=str, choices=["mm", "vilt", "obj"],
                        default="mm")
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--obj_source", type=str, default="auto",
                        choices=["auto", "frcnn", "dumps", "grid"],
                        help="object-feature source for --mode obj: the "
                             "native FRCNN detector (raw images), imported "
                             "reference dumps, or grid pseudo-regions")
    parser.add_argument("--frcnn_ckpt", type=str, default=None,
                        help="unc-nlp/frcnn-vg-finetuned checkpoint "
                             "(file or dir; default MODEL_DIR_DICT['frcnn'])")
    parser.add_argument("--frcnn_arch", type=str, default="full",
                        choices=["full", "tiny"],
                        help="tiny = smoke-test detector geometry")
    parser.add_argument("--frcnn_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16 = bf16 conv trunk (throughput "
                             "option; f32 is the torch-twin parity default)")
    parser.add_argument("--rpn_pre_topk", type=int, default=None,
                        help="RPN pre-NMS proposal count (default 6000, the "
                             "published VG-detector value). Lower = less "
                             "device sort/NMS work per image; recall knob — "
                             "validate against real weights before trusting "
                             "features from a reduced setting")
    parser.add_argument("--rpn_post_topk", type=int, default=None,
                        help="RPN post-NMS ROI count fed to res5 (default "
                             "1000). THE device-time lever: res5 runs per "
                             "ROI. Lower = faster, fewer candidate regions "
                             "before the final top-36 cut; recall knob like "
                             "--rpn_pre_topk")
    parser.add_argument("--frcnn_ingest", type=str, default="pil",
                        choices=["pil", "device"],
                        help="device = ship ORIGINAL uint8 pixels and "
                             "resize on device (torch-bilinear semantics, "
                             "~3x fewer bytes over a tunneled link; "
                             "tests/test_frcnn_ingest.py quantifies the "
                             "delta). pil = the reference's uint8/PIL "
                             "resize branch (parity default)")
    parser.add_argument("--img_decoder", type=str, default="pil",
                        choices=["pil", "native"],
                        help="image ingest for the mm/vilt cache builds "
                             "(pil = parity default; native = C++ "
                             "DCT-scaled decode, <=2 LSB deviation, "
                             "faster on large photos). The FRCNN "
                             "preprocess always uses PIL (measured faster "
                             "than the scalar C++ resize, BASELINE.md)")
    parser.add_argument("--testing", action="store_true")
    parser.add_argument("--shard", type=str, default=None, metavar="I:N",
                        help="process this 1/N round-robin slice of the ids "
                             "(multi-host pods: run one shard per host; the "
                             "image cache fills misses lazily, the ROI cache "
                             "is merged by re-running unsharded)")
    args = parser.parse_args(argv)
    from ._common import publish_img_decoder

    publish_img_decoder(args)
    shard = None
    if args.shard:
        i, n = (int(x) for x in args.shard.split(":"))
        if not 0 <= i < n:
            parser.error(f"--shard {args.shard}: need 0 <= I < N")
        shard = (i, n)

    import pandas as pd

    task_name = C.TASKS[args.task]
    data_key = pd.read_csv(C.PATH[args.task])
    id_col = "id" if args.task == 5 else "tweet_id"
    ids = data_key[id_col].values
    if args.testing:
        ids = ids[:10]
    img_fmt = C.IMG_FMT[args.task]

    if args.mode == "obj":
        if shard is not None:
            ids = ids[shard[0]::shard[1]]
            cache_dir = f"{C.DATA_PATH}cache/{task_name}_roi_shard{shard[0]}"
        else:
            cache_dir = f"{C.DATA_PATH}cache/{task_name}_roi"
        cache = RoiFeatureCache(cache_dir)
        src = args.obj_source
        if src in ("auto", "dumps") and cache.import_reference_dumps(
                C.DATA_PATH, task_name, ids):
            logger.info("imported reference FRCNN dumps")
        elif src == "dumps":
            parser.error("--obj_source dumps: no reference dumps found under "
                         f"{C.DATA_PATH}{task_name}_img_feats/")
        elif src == "grid":
            extract_grid_features(ids, img_fmt, cache)
        else:  # auto (no dumps) or frcnn: the native detector
            extract_frcnn_features(ids, img_fmt, cache,
                                   weight_path=args.frcnn_ckpt,
                                   tiny=args.frcnn_arch == "tiny",
                                   dtype=args.frcnn_dtype,
                                   ingest=args.frcnn_ingest,
                                   rpn_pre_topk=args.rpn_pre_topk,
                                   rpn_post_topk=args.rpn_post_topk)
    else:
        size = args.image_size or (384 if args.mode == "vilt" else 224)
        tag = f"{task_name}_vilt_u8_{size}" if args.mode == "vilt" else f"{task_name}_u8_{size}"
        ImageCache(f"{C.DATA_PATH}cache/{tag}", size=size).build(
            ids, img_fmt, on_missing="zeros", process_shard=shard,
        )
    logger.info("done")


if __name__ == "__main__":
    main()
