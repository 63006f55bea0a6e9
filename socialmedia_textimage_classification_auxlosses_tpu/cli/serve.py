"""Production serving endpoint for trained late-fusion artifacts.

The reference stops at offline evaluation (its closest thing to serving is
``--load_saved_model`` + CSV dumps, reference ``run_mm_late.py:155-185``);
a production deployment needs an online path. This runner loads a trained
``run_mm_late`` artifact (the same ``{txt}-{img}-{fusion}_task{t}_seed{s}_
{loss_str}_{N}net.pth`` naming contract) and serves HTTP classification:

    python -m ....cli.serve --task 3 --txt_model_name bernice \
        --img_model_name vit --fusion_name attention --port 8473

    POST /classify   {"text": "...", "image_b64": "<base64 bytes>" |
                      "image_path": "p.jpg"}   ->
                     {"prediction": k, "class": "...", "probs": [...],
                      "timing_ms": {"queue": ..., "dispatch": ...}}
    GET  /healthz    liveness + model identity + traffic counters
    GET  /metrics    Prometheus text exposition (requests/errors/windows
                     counters + per-window dispatch latency histogram)

``image_path`` names a server-side file and is therefore DISABLED unless
``--image_root DIR`` confines it (paths resolve inside DIR, regular files
only); ``image_b64`` always works.

TPU-shaped serving, not a per-request loop:

* ONE jitted deterministic forward at a FIXED ``--max_batch`` shape — a
  single compilation, no retrace ever (XLA static shapes);
* requests are micro-batched: the dispatcher collects up to ``--max_batch``
  requests inside a ``--batch_window_ms`` window and answers them with one
  device dispatch (padding rows replicate row 0 and are dropped host-side);
* requests without an image run the reference's empty-image text-only flow
  (zeros canvas — reference ``datasets.py:168-170``);
* ``--quantize w8`` serves with the weight-only int8 kernels (ops/quant.py),
  the 4x weight-memory serving option.

The dataset CSVs are NOT required: the model is built from the static task
registry (``core.config.serving_config``).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import queue
import socket
import sys
import threading
import time

import numpy as np

from ..core import config as C
from ..utils.logging import get_logger
from ._common import (ARCH_PRESETS, artifact_stem, enable_compile_cache,
                      results_dir_for, seed_everything)

logger = get_logger(__name__)


def parse_args(argv=None):
    return build_parser().parse_args(argv)


def build_parser():
    parser = argparse.ArgumentParser(description="serve a trained model")
    parser.add_argument("--model", type=str, default="mm_late",
                        choices=["mm_late", "vilt", "lxmert", "mmbt"],
                        help="model family; mm_late uses --txt/--img/"
                             "--fusion; lxmert runs the NATIVE FRCNN "
                             "detector per request (raw image -> ROI "
                             "features -> classify)")
    parser.add_argument("--frcnn_arch", type=str, default="full",
                        choices=["full", "tiny"],
                        help="(--model lxmert) detector geometry")
    parser.add_argument("--frcnn_ckpt", type=str, default=None,
                        help="(--model lxmert) detector checkpoint")
    parser.add_argument("--frcnn_ingest", type=str, default="pil",
                        choices=["pil", "device"],
                        help="(--model lxmert) device = ship ORIGINAL "
                             "uint8 request pixels and resize on device "
                             "(torch-bilinear; ~3x fewer bytes to a "
                             "tunneled chip). pil = the reference's "
                             "uint8/PIL branch (parity default). NOTE: "
                             "device mode compiles one tiny ingest program "
                             "per new original-size bucket (64px grid) — "
                             "a one-time latency spike per bucket, "
                             "persistent-cached across restarts")
    parser.add_argument("--rpn_pre_topk", type=int, default=None,
                        help="(--model lxmert) RPN pre-NMS proposal count "
                             "(default 6000). Lower = less device sort/NMS "
                             "per request; a recall trade — validate on "
                             "real weights first")
    parser.add_argument("--rpn_post_topk", type=int, default=None,
                        help="(--model lxmert) RPN post-NMS ROI count fed "
                             "to res5 (default 1000) — the per-request "
                             "device-time lever; a recall trade like "
                             "--rpn_pre_topk")
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--img_decoder", type=str, default="pil",
                        choices=["pil", "native"],
                        help="native = C++ in-memory JPEG/PNG decode + "
                             "resize for request images (csrc/imgdec.cpp; "
                             "DCT-scaled JPEG decode, so large photos never "
                             "materialize at full resolution). Applies to "
                             "the square-resize families; the CNN "
                             "center-crop recipe and the lxmert detector "
                             "canvas stay PIL. Falls back to PIL per image "
                             "on any decode failure")
    parser.add_argument("--txt_model_name", type=str, default="bernice",
                        choices=["bert", "bernice", "bertweet", "roberta"])
    parser.add_argument("--img_model_name", type=str, default="vit",
                        choices=["vit", "beit", "deit", "resnet50",
                                 "resnet152"])
    parser.add_argument("--fusion_name", type=str, default="attention",
                        choices=["xatt", "concat", "attention", "concat_cnn",
                                 "aspect-att", "gmu"])
    parser.add_argument("--task", type=int, required=True,
                        choices=[0, 1, 2, 3, 4, 5, 6])
    parser.add_argument("--seed", type=int, default=30,
                        help="seed of the trained artifact (name contract)")
    parser.add_argument("--model_path", type=str, default=None,
                        help="explicit artifact path; default derives the "
                             "run_mm_late naming contract under the results "
                             "dir")
    parser.add_argument("--use_clip_loss", action="store_true",
                        help="artifact was trained with ITC (name contract)")
    parser.add_argument("--use_tim_loss", action="store_true",
                        help="artifact was trained with TIM (name contract)")
    parser.add_argument("--beta_itc", type=float, default=0.1)
    parser.add_argument("--beta_itm", type=float, default=0.1)
    parser.add_argument("--nsamples", type=int, default=-1)
    parser.add_argument("--testing", action="store_true")
    parser.add_argument("--dropout", type=float, default=0.05)
    parser.add_argument("--weight_decay", type=float, default=0.00025)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--attn_impl", type=str, default="auto")
    parser.add_argument("--arch", type=str, default="base",
                        choices=sorted(ARCH_PRESETS))
    parser.add_argument("--scan_layers", action="store_true",
                        help="artifact was trained with --scan_layers "
                             "(stacked scanned-layer param layout — must "
                             "match to deserialize)")
    parser.add_argument("--quantize", type=str, default=None, choices=["w8"])
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8473)
    parser.add_argument("--workers", type=int, default=1,
                        help="SO_REUSEPORT multi-process serving: N full "
                             "service processes bind the SAME port and the "
                             "kernel load-balances connections across them "
                             "— for multi-core hosts where one process's "
                             "GIL bounds handler-side decode/resize "
                             "(BASELINE.md round-4/5 burst analysis). Each "
                             "worker builds its own model/device context; "
                             "on a single shared accelerator keep "
                             "workers=1. Requires an explicit --port")
    parser.add_argument("--_reuse_port", action="store_true",
                        help=argparse.SUPPRESS)
    parser.add_argument("--image_root", type=str, default=None,
                        help="directory that request image_path values are "
                             "confined to; image_path requests are REFUSED "
                             "unless this is set (image_b64 always works)")
    parser.add_argument("--fast_start", action="store_true",
                        help="(--model lxmert) skip the full detector "
                             "warm-up: only the first-request shape is "
                             "compiled up front and other batch/orientation "
                             "shapes compile inside live request windows")
    parser.add_argument("--max_batch", type=int, default=16,
                        help="serving batch (ONE compiled shape)")
    parser.add_argument("--batch_window_ms", type=float, default=5.0,
                        help="micro-batching window: first request opens the "
                             "window, the dispatch ships when it closes or "
                             "the batch fills")
    parser.add_argument("--random_init", action="store_true",
                        help="serve random-init weights (smoke tests only)")
    parser.add_argument("--drain_timeout", type=float, default=10.0,
                        help="seconds SIGTERM waits for in-flight requests "
                             "to finish before the process exits (rolling "
                             "restarts: stop accepting, answer what's "
                             "queued, then die)")
    parser.add_argument("--extra_model", action="append", default=[],
                        metavar="NAME:KEY=VALUE[,KEY=VALUE...]",
                        help="serve an ADDITIONAL model from this process at "
                             "POST /classify/NAME, e.g. --extra_model "
                             "early:model=vilt,arch=base. KEY=VALUE pairs "
                             "override the primary flags for that model "
                             "(model/task/txt_model_name/arch/seed/"
                             "model_path/...). Repeatable. lxmert entries "
                             "SHARE one FRCNN detector per (arch, ckpt); "
                             "each model gets its own micro-batcher, and "
                             "/healthz + /metrics report per-model")
    return parser


# --extra_model keys a spec may override (everything that shapes the model,
# its artifact lookup, or its batching — NOT the shared server plumbing
# like host/port/image_root/drain_timeout)
_SPEC_KEYS = frozenset({
    "model", "task", "txt_model_name", "img_model_name", "fusion_name",
    "arch", "seed", "model_path", "use_clip_loss", "use_tim_loss",
    "beta_itc", "beta_itm", "dropout", "dtype", "attn_impl", "scan_layers",
    "quantize", "max_batch", "batch_window_ms", "random_init", "testing",
    "image_size", "frcnn_arch", "frcnn_ckpt", "frcnn_ingest", "fast_start",
    "nsamples", "rpn_pre_topk", "rpn_post_topk",
})


def parse_model_spec(base_args, spec: str):
    """``NAME:KEY=VALUE,...`` -> (name, args-namespace for that model).

    Values are coerced to the primary flag's type (bools accept 0/1/true/
    false); unknown keys are rejected loudly rather than silently serving
    the wrong artifact."""
    import copy

    name, _, body = spec.partition(":")
    name = name.strip()
    if not name or "/" in name:
        raise SystemExit(f"--extra_model {spec!r}: NAME missing or invalid "
                         "(route segment, no '/')")
    if name == "default":
        # the primary service owns the "default" label in multi-model
        # /metrics and the top level of /healthz; a second "default" would
        # emit duplicate Prometheus series (an invalid exposition)
        raise SystemExit(f"--extra_model {spec!r}: the name 'default' is "
                         "reserved for the primary /classify model")
    args = copy.deepcopy(base_args)
    args.extra_model = []
    # coerce from the DECLARED flag types, not the runtime value: flags
    # whose default is None (e.g. image_size) would otherwise come through
    # as strings and crash the model build
    actions = build_parser()._option_string_actions
    for pair in filter(None, (p.strip() for p in body.split(","))):
        key, eq, raw = pair.partition("=")
        if not eq or key not in _SPEC_KEYS:
            raise SystemExit(
                f"--extra_model {spec!r}: bad override {pair!r} "
                f"(allowed keys: {', '.join(sorted(_SPEC_KEYS))})")
        action = actions["--" + key]
        try:
            if isinstance(getattr(args, key), bool) or (
                    action.const is True and action.nargs == 0):
                val = raw.lower() in ("1", "true", "yes")
            elif action.type is not None:
                val = action.type(raw)
            else:
                val = raw
            if action.choices and val not in action.choices:
                raise ValueError(f"choose from {sorted(action.choices)}")
        except ValueError as e:
            raise SystemExit(
                f"--extra_model {spec!r}: bad value for {key}: {e}")
        setattr(args, key, val)
    return name, args


def _make_detector(args, cache: dict = None):
    """FRCNN detector for --model lxmert serving (fused single-dispatch
    path, models/frcnn.py) — the full raw-image -> ROI -> classify flow the
    reference needs an external torch stack for.

    ``cache`` (multi-model serving) shares ONE detector — weights, compiled
    programs and all — across every lxmert entry with the same
    (arch, ckpt, init): the detector dominates serving memory, and its
    dispatches are thread-safe across the per-model batcher threads."""
    from ..models import frcnn as FR

    pre = getattr(args, "rpn_pre_topk", None)
    post = getattr(args, "rpn_post_topk", None)
    key = (args.frcnn_arch, args.frcnn_ckpt, args.random_init, pre, post)
    if cache is not None and key in cache:
        logger.info("sharing the %s FRCNN detector across models",
                    args.frcnn_arch)
        return cache[key]

    def _store(det):
        if cache is not None:
            cache[key] = det
        return det

    cfg = FR.TINY if args.frcnn_arch == "tiny" else FR.FrcnnConfig()
    cfg = FR.apply_topk_overrides(cfg, pre, post)
    weight_path = args.frcnn_ckpt or C.MODEL_DIR_DICT.get("frcnn", "")
    if args.random_init:
        # smoke mode: random classifier implies a random detector is fine
        return _store(FR.FrcnnDetector(cfg))
    try:
        return _store(FR.load_frcnn(weight_path, cfg))
    except Exception as e:
        # a production endpoint must not silently serve noise ROI features:
        # the classifier weights are strictly validated (load_params), the
        # detector gets the same treatment
        raise SystemExit(
            f"serve: cannot load FRCNN detector weights from {weight_path!r}"
            f" ({e!r}); pass --frcnn_ckpt (unc-nlp/frcnn-vg-finetuned "
            "pytorch_model.bin) or --random_init for smoke runs")


def _serving_roi_cache(detector, cfg):
    """A throwaway ROI cache matching the detector's (num_boxes, feat_dim)
    so the LXMERT build sizes its visual projection to the detector's
    output; rows are zeros for the synthetic registry ids (never read at
    serve time — requests carry live detector features)."""
    import tempfile

    from ..data.cache import RoiFeatureCache

    dc = detector.cfg
    cache = RoiFeatureCache(tempfile.mkdtemp(prefix="smtc_serve_roi_"),
                            num_boxes=dc.max_detections,
                            feat_dim=dc.feat_dim)
    ids = [str(i) for i in cfg.data.tweet_id]
    cache.write(ids,
                np.zeros((len(ids), dc.max_detections, dc.feat_dim),
                         np.float32),
                np.zeros((len(ids), dc.max_detections, 4), np.float32))
    return cache


def build_service(args, detector_cache: dict = None, export_info: dict = None):
    """Model + single fixed-shape jitted predict + request preprocessing.

    Returns ``(predict_batch, meta)`` where ``predict_batch(requests) ->
    list of response dicts`` runs ONE device dispatch for up to
    ``max_batch`` requests. ``detector_cache`` shares FRCNN detectors
    across multi-model services (see ``_make_detector``). ``export_info``
    (a dict, filled in place) receives the raw jitted predict + params +
    batch builder for ``cli/export.py``."""
    import jax
    import jax.numpy as jnp

    from ..data.images import resize_to_u8
    from ..train.checkpoint import load_params
    from ._build import build_mm_late_setup

    family = args.model
    detector = None
    center_crop_from = None
    if family == "mm_late":
        from ._build import CNN_MODELS

        cfg = C.serving_config(args)
        setup = build_mm_late_setup(args, cfg)
        image_size = setup.pipes["test"].cfg.image_size
        if args.img_model_name in CNN_MODELS:
            # match the training recipe: shorter-side 256 then center crop
            # (_build.py image_source_fn for the CNN tower)
            center_crop_from = 256
    else:
        from ._build_early import build_mm_early_setup

        cfg = C.serving_config(args,
                               model_name="vilt" if family == "vilt" else None)
        roi_cache = None
        if family == "lxmert":
            detector = _make_detector(args, detector_cache)
            roi_cache = _serving_roi_cache(detector, cfg)
        setup = build_mm_early_setup(args, cfg, roi_cache=roi_cache)
        image_size = (None if family == "lxmert"
                      else setup.pipes["test"].cfg.image_size)
    tokenizer = setup.tokenizer

    if args.model_path:
        model_path = args.model_path
    else:
        # the trainers' artifact naming contract (mmbt artifacts live in
        # the reference's results_dir_mmbt)
        base = {"mm_late": C.results_dir_mm_late,
                "mmbt": C.results_dir_mmbt}.get(family, C.results_dir_mm_early)
        model_path = (results_dir_for(base, args.testing)
                      + artifact_stem(args, cfg, family) + "net.pth")
    params = setup.params
    if args.random_init:
        logger.warning("serving RANDOM-INIT weights (--random_init)")
    else:
        params = load_params(model_path, setup.params)
        logger.info("loaded %s", model_path)

    forward = setup.forward_fn
    if args.quantize == "w8":
        from ..ops.quant import make_quantized_eval_forward, quantize_w8

        forward = make_quantized_eval_forward(forward)
        params = quantize_w8(params)
        logger.info("w8 serving quantization enabled")
    else:
        # serving bf16 parameter pre-cast (utils/cast.py): the step's own
        # f32->compute-dtype rounding done once, halving resident weight
        # memory and per-step HBM weight reads. Bitwise-exact per family
        # (tests/test_eval_cast.py).
        from ..utils.cast import cast_params_for_eval

        params = cast_params_for_eval(params, args.dtype)

    multilabel = cfg.multilabel
    b = args.max_batch

    @jax.jit
    def _predict(p, batch):
        out = forward(p, batch, None, None, True)
        logits = out["out_cls"].astype(jnp.float32)
        if multilabel:
            return jax.nn.sigmoid(logits)
        return jax.nn.softmax(logits, axis=-1)

    def make_batch(requests):
        """requests -> the fixed-shape device batch dict (text tokenized,
        images resized / detector-featurized, rows past len(requests)
        padded with the reference's placeholder/empty-image flow)."""
        n = len(requests)
        assert 0 < n <= b
        texts = [r[0] for r in requests]
        enc = tokenizer(texts + ["placeholder"] * (b - n))
        batch = {"ids": np.asarray(enc["ids"], np.int32),
                 "mask": np.asarray(enc["mask"], np.int32)}
        if "token_type_ids" in enc:
            batch["token_type_ids"] = np.asarray(enc["token_type_ids"],
                                                 np.int32)
        if detector is not None:
            dc = detector.cfg
            feats = np.zeros((b, dc.max_detections, dc.feat_dim), np.float32)
            boxes = np.zeros((b, dc.max_detections, 4), np.float32)
            with_img = [(i, img) for i, (_, img) in enumerate(requests)
                        if img is not None]
            if with_img:
                # pad to the next power of two so the fused detector
                # compiles at most log2(max_batch)+1 shapes per canvas
                # orientation rather than one per window size
                pad = 1 << (len(with_img) - 1).bit_length()
                outs = detector.detect_batch(
                    [im for _, im in with_img], pad_to=min(pad, b),
                    ingest=getattr(args, "frcnn_ingest", "pil"))
                for (i, _), out in zip(with_img, outs):
                    feats[i] = out["roi_features"]
                    boxes[i] = out["normalized_boxes"]
            batch["roi_features"] = feats
            batch["roi_boxes"] = boxes
        else:
            pixels = np.zeros((b, image_size, image_size, 3), np.uint8)
            for i, (_, img) in enumerate(requests):
                if img is None:
                    # reference empty-image flow for img=None
                    # (datasets.py:168-170)
                    continue
                if isinstance(img, np.ndarray):
                    pixels[i] = img  # --img_decoder native pre-resized
                else:
                    pixels[i] = resize_to_u8(img, image_size,
                                             center_crop_from=center_crop_from)
            batch["pixel_values"] = pixels
        return batch

    def predict_batch(requests):
        """requests: list of (text, image-or-None); one device dispatch
        (plus, for lxmert, the detector's own dispatches)."""
        n = len(requests)
        probs = np.asarray(_predict(params, make_batch(requests)))[:n]
        classes = cfg.classes
        out = []
        for row in probs:
            pred = int(np.argmax(row))
            out.append({
                "prediction": pred,
                "class": classes[pred] if classes else None,
                "probs": [float(v) for v in row],
            })
        return out

    if export_info is not None:
        # cli/export.py: the pieces needed to jax.export the serving graph
        # (fixed-shape jitted predict, resolved weights, batch builder)
        export_info.update(predict=_predict, params=params,
                           make_batch=make_batch, detector=detector,
                           num_labels=cfg.num_labels, classes=cfg.classes)

    native_size = None
    if (getattr(args, "img_decoder", "pil") == "native"
            and detector is None and center_crop_from is None):
        from ..data.native import imgdec_available

        if imgdec_available():
            native_size = image_size
        else:
            logger.warning("--img_decoder native: imgdec build unavailable; "
                           "serving with PIL decode")
    meta = {
        "model": (f"{args.txt_model_name}-{args.img_model_name}-"
                  f"{args.fusion_name}" if family == "mm_late" else family),
        "task": args.task,
        "task_name": cfg.task_name,
        "num_labels": cfg.num_labels,
        "max_batch": b,
        "model_path": None if args.random_init else model_path,
        "native_size": native_size,
        # handler-side resize contract: square families let the HTTP
        # handler thread resize right after decode (PIL releases the GIL
        # during the C resample), so the single dispatcher thread's window
        # cost stays device-only — make_batch accepts either form and its
        # own resize branch stays for direct/inproc callers
        "resize_size": None if detector is not None else image_size,
        "center_crop_from": center_crop_from,
    }
    return predict_batch, meta


class MicroBatcher:
    """Collects concurrent requests into one device dispatch.

    The first queued request opens a window; the dispatcher ships when the
    window closes or ``max_batch`` requests are pending. Callers block on a
    per-request event and get their row of the batched result."""

    # per-window dispatch latency histogram bounds (seconds) for /metrics
    LATENCY_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5)

    def __init__(self, predict_batch, max_batch: int, window_ms: float):
        self._predict = predict_batch
        self._max = max_batch
        self._window = window_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._stop = False
        # served-traffic counters (surfaced on /healthz and /metrics).
        # All writes happen on the single dispatcher thread, under
        # _stats_lock so a scrape sees one consistent window (sum/count/
        # windows agree — the dispatcher holds it only for the counter
        # bump, never the device dispatch).
        self.requests = 0
        self.windows = 0
        self.errors = 0
        self.dispatch_seconds = 0.0
        self.latency_counts = [0] * (len(self.LATENCY_BUCKETS) + 1)  # +Inf
        self._stats_lock = threading.Lock()
        # in-flight accounting for drain(): submit() spans (queue -> answer);
        # handler_started/finished span the WHOLE HTTP handler (JSON parse +
        # image decode before submit, response write after), so SIGTERM
        # drain can't cut off a response or drop a just-accepted request
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        self._thread.start()

    def stats(self) -> dict:
        with self._stats_lock:
            req, w, err = self.requests, self.windows, self.errors
            disp = self.dispatch_seconds
        d = max(w, 1)
        return {"requests": req, "windows": w, "errors": err,
                "mean_batch": round(req / d, 2),
                "mean_dispatch_ms": round(disp / d * 1e3, 2)}

    def snapshot(self) -> dict:
        """One lock-consistent copy of every counter (sum/count/windows
        agree within a scrape)."""
        with self._stats_lock:
            return {"requests": self.requests, "errors": self.errors,
                    "windows": self.windows,
                    "dispatch_seconds": self.dispatch_seconds,
                    "latency_counts": list(self.latency_counts)}

    def prometheus_text(self, meta: dict) -> str:
        """Prometheus text exposition (0.0.4) of the serving counters."""
        return prometheus_text([(None, self, meta)])

    def handler_started(self):
        """Count an HTTP handler from the moment its request is being read
        (before submit) until its response is written (after submit) — the
        drain() window must cover both ends (ADVICE r3)."""
        with self._inflight_lock:
            self._inflight += 1

    def handler_finished(self):
        with self._inflight_lock:
            self._inflight -= 1

    def submit(self, text, image, timeout: float = 600.0):
        if self._stop or not self._thread.is_alive():
            raise RuntimeError("serving dispatcher is not running")
        done = threading.Event()
        slot = {"done": done, "t_submit": time.monotonic()}
        with self._inflight_lock:
            self._inflight += 1
        try:
            self._q.put((text, image, slot))
            if not done.wait(timeout):
                raise RuntimeError("serving dispatch timed out")
            if "error" in slot:
                raise RuntimeError(slot["error"])
            return slot["result"]
        finally:
            with self._inflight_lock:
                self._inflight -= 1

    def drain(self, timeout: float = 10.0) -> bool:
        """Block until every ``submit`` in flight has returned (graceful
        shutdown: callers hold their answer before the process exits).
        Returns False if requests were still pending at the deadline."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._inflight_lock:
                if self._inflight == 0:
                    return True
            time.sleep(0.01)
        with self._inflight_lock:
            return self._inflight == 0

    def close(self):
        self._stop = True
        self._q.put(None)
        self._thread.join(timeout=5)

    def _run(self):
        while not self._stop:
            first = self._q.get()
            if first is None:
                continue
            pending = [first]
            deadline = time.monotonic() + self._window
            while len(pending) < self._max:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    item = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if item is None:
                    break
                pending.append(item)
            t0 = time.monotonic()
            try:
                results = self._predict([(t, im) for t, im, _ in pending])
                dt = time.monotonic() - t0
                i = 0
                while (i < len(self.LATENCY_BUCKETS)
                       and dt > self.LATENCY_BUCKETS[i]):
                    i += 1
                with self._stats_lock:
                    self.windows += 1
                    self.requests += len(pending)
                    self.dispatch_seconds += dt
                    self.latency_counts[i] += 1
                for (_, _, slot), res in zip(pending, results):
                    # per-request tracing: time spent queued for a window
                    # vs inside the device dispatch (answer latency =
                    # queue + dispatch; surfaced in the response so a
                    # client can tell batching delay from model time)
                    res["timing_ms"] = {
                        "queue": round((t0 - slot["t_submit"]) * 1e3, 2),
                        "dispatch": round(dt * 1e3, 2),
                    }
                    slot["result"] = res
                    slot["done"].set()
            except BaseException as e:  # surface to every waiting caller —
                # a dead dispatcher would hang all future submits
                logger.exception("serving dispatch failed for a window of "
                                 "%d requests", len(pending))
                with self._stats_lock:
                    self.errors += len(pending)
                for _, _, slot in pending:
                    slot["error"] = "internal prediction failure"
                    slot["done"].set()
                if not isinstance(e, Exception):
                    raise


def _escape_label(value) -> str:
    """Prometheus text-exposition label escaping: backslash, double quote,
    and newline must be escaped or the scrape is unparsable."""
    return (str(value).replace("\\", r"\\").replace('"', r"\"")
            .replace("\n", r"\n"))


def prometheus_text(services) -> str:
    """Prometheus text exposition (0.0.4) over one or more services.

    ``services``: list of ``(name, batcher, meta)``. Single-model serving
    passes ``name=None`` and the series stay unlabeled (the original
    exposition); multi-model serving labels every series with
    ``model="name"`` so one scrape covers the whole process."""

    def lbl(name, extra=""):
        parts = ([f'model="{_escape_label(name)}"'] if name is not None
                 else [])
        if extra:
            parts.append(extra)
        return "{" + ",".join(parts) + "}" if parts else ""

    snaps = [(name, b.snapshot(), meta) for name, b, meta in services]
    lines = ["# HELP smtc_serving_requests_total classify requests served",
             "# TYPE smtc_serving_requests_total counter"]
    lines += [f"smtc_serving_requests_total{lbl(n)} {s['requests']}"
              for n, s, _ in snaps]
    lines += ["# HELP smtc_serving_errors_total requests failed in dispatch",
              "# TYPE smtc_serving_errors_total counter"]
    lines += [f"smtc_serving_errors_total{lbl(n)} {s['errors']}"
              for n, s, _ in snaps]
    lines += ["# HELP smtc_serving_windows_total device dispatch windows",
              "# TYPE smtc_serving_windows_total counter"]
    lines += [f"smtc_serving_windows_total{lbl(n)} {s['windows']}"
              for n, s, _ in snaps]
    lines += ["# HELP smtc_serving_dispatch_seconds per-window device "
              "dispatch latency",
              "# TYPE smtc_serving_dispatch_seconds histogram"]
    for n, s, _ in snaps:
        cum = 0
        for le, cnt in zip(MicroBatcher.LATENCY_BUCKETS,
                           s["latency_counts"]):
            cum += cnt
            # no backslash inside the f-string expression: that is a
            # SyntaxError before Python 3.12 (PEP 701)
            le_label = lbl(n, 'le="%s"' % le)
            lines.append(f"smtc_serving_dispatch_seconds_bucket"
                         f"{le_label} {cum}")
        cum += s["latency_counts"][-1]
        inf_label = lbl(n, 'le="+Inf"')
        lines.append(f"smtc_serving_dispatch_seconds_bucket"
                     f"{inf_label} {cum}")
        lines.append(f"smtc_serving_dispatch_seconds_sum{lbl(n)} "
                     f"{s['dispatch_seconds']:.6f}")
        lines.append(f"smtc_serving_dispatch_seconds_count{lbl(n)} {cum}")
    lines += ["# HELP smtc_serving_info model identity (value is always 1)",
              "# TYPE smtc_serving_info gauge"]
    for n, _, meta in snaps:
        labels = []
        if n is not None:  # route name + the artifact identity it serves
            labels.append(f'model="{_escape_label(n)}"')
            labels.append(f'artifact="{_escape_label(meta.get("model", ""))}"')
        else:
            labels.append(f'model="{_escape_label(meta.get("model", ""))}"')
        labels.append(f'task="{_escape_label(meta.get("task", ""))}"')
        lines.append(f'smtc_serving_info{{{",".join(labels)}}} 1')
    return "\n".join(lines) + "\n"


def _decode_image(payload, image_root=None, native_size=None):
    """-> PIL Image, or a pre-resized (s, s, 3) uint8 array when the
    native decoder handled the request (``--img_decoder native``)."""
    from PIL import Image

    if payload.get("image_b64"):
        raw = base64.b64decode(payload["image_b64"])
        if native_size:
            from ..data.native import native_decode_resize_mem

            px = native_decode_resize_mem(raw, native_size)
            if px is not None:
                return px  # PIL fallback below on any decode failure
        return Image.open(io.BytesIO(raw)).convert("RGB")
    if payload.get("image_path"):
        # image_path lets any client with HTTP access name a server-side
        # file: confine it to an operator-chosen directory (regular files
        # only — no FIFOs/devices that would hang a handler thread), and
        # refuse it entirely unless --image_root was given
        if not image_root:
            raise ValueError(
                "image_path requests are disabled (start the server with "
                "--image_root to allow them); send image_b64 instead")
        root = os.path.realpath(image_root)
        path = os.path.realpath(os.path.join(root, payload["image_path"]))
        if os.path.commonpath([root, path]) != root:
            raise ValueError("image_path escapes --image_root")
        if not os.path.isfile(path):
            raise ValueError("image_path is not a regular file")
        if native_size:
            from ..data.native import native_decode_resize

            px = native_decode_resize(path, native_size)
            if px is not None:
                return px
        return Image.open(path).convert("RGB")
    return None


def detector_warm_pads(max_batch: int):
    """The detector pad sizes a live window can request: every power of two
    below ``max_batch``, plus ``max_batch`` itself (predict_batch pads the
    per-window image count to the next power of two capped at max_batch)."""
    pads, p = [], 1
    while p < max_batch:
        pads.append(p)
        p <<= 1
    pads.append(max_batch)
    return pads


def warm_service(args, predict_batch):
    """Compile every shape live traffic can request BEFORE accepting it.

    The classifier is ONE fixed (max_batch, ...) program — a single call
    warms it. ``--model lxmert`` additionally runs the FRCNN detector per
    request window, and the detector compiles per (canvas orientation,
    pad size): without warming those, a 2-3 min full-geometry compile lands
    inside a live request window the first time a new batch size or a
    portrait image shows up. Warm them all (persistent compile cache makes
    restarts cheap); ``--fast_start`` keeps the old first-shape-only warm."""
    t0 = time.time()
    if args.model != "lxmert":
        predict_batch([("warmup", None)])
        logger.info("compiled serving shape (batch %d) in %.1fs",
                    args.max_batch, time.time() - t0)
        return
    from PIL import Image

    landscape = Image.fromarray(np.zeros((240, 320, 3), np.uint8))
    portrait = Image.fromarray(np.zeros((320, 240, 3), np.uint8))
    shapes = [(o, k) for o in ("landscape", "portrait")
              for k in detector_warm_pads(args.max_batch)]
    if args.fast_start:
        shapes = shapes[:1]
    for i, (orient, k) in enumerate(shapes):
        img = landscape if orient == "landscape" else portrait
        ts = time.time()
        predict_batch([("warmup", img)] * k)
        logger.info("warm %d/%d: detector %s pad=%d in %.1fs", i + 1,
                    len(shapes), orient, k, time.time() - ts)
    logger.info("compiled serving + detector shapes (batch %d) in %.1fs",
                args.max_batch, time.time() - t0)


def make_server(args, batcher: MicroBatcher, meta, extra_services=None):
    """HTTP server over one primary service plus optional named extras.

    ``extra_services``: dict name -> (batcher, meta) from --extra_model.
    The primary stays at POST /classify (and is named "default" in the
    multi-model /metrics labels); extras route at POST /classify/<name>.
    With no extras the /healthz and /metrics payloads are byte-identical
    to single-model serving."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    extra_services = extra_services or {}

    def scrape_entries():
        if not extra_services:
            return [(None, batcher, meta)]
        return ([("default", batcher, meta)]
                + [(n, b, m) for n, (b, m) in extra_services.items()])

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                # pid identifies the worker under --workers (SO_REUSEPORT)
                health = {"status": "ok", "pid": os.getpid(), **meta,
                          **batcher.stats()}
                if extra_services:
                    health["models"] = {
                        n: {**m, **b.stats()}
                        for n, (b, m) in extra_services.items()}
                self._send(200, health)
            elif self.path == "/metrics":
                body = prometheus_text(scrape_entries()).encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "unknown path"})

        def _route(self):
            if self.path == "/classify":
                return batcher, meta
            name = self.path.removeprefix("/classify/")
            if name != self.path and name in extra_services:
                return extra_services[name]
            return None, None

        def do_POST(self):
            b, m = self._route()
            if b is None:
                self._send(404, {"error": "unknown path"})
                return
            # drain() must see this handler from request read to response
            # write — not just the submit() span (a thread parsing JSON or
            # writing its response was invisible to SIGTERM drain before)
            b.handler_started()
            try:
                self._do_post(b, m)
            finally:
                b.handler_finished()

        def _do_post(self, b, m):
            try:  # malformed request (bad JSON / image bytes) -> 400
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                text = payload.get("text", "")
                image = _decode_image(payload, args.image_root,
                                      m.get("native_size"))
                if m.get("resize_size") and image is not None and not (
                        isinstance(image, np.ndarray)):
                    # resize HERE, in the per-request handler thread (PIL
                    # releases the GIL in the C resample) — not in the one
                    # dispatcher thread, where it would serialize inside
                    # the batch window. Same resize_to_u8 call make_batch
                    # would make: bytes are identical.
                    from ..data.images import resize_to_u8

                    image = resize_to_u8(
                        image, m["resize_size"],
                        center_crop_from=m.get("center_crop_from"))
            except Exception as e:
                self._send(400, {"error": repr(e)})
                return
            try:  # server-side prediction failure -> 500, details in logs
                self._send(200, b.submit(text, image))
            except Exception:
                self._send(500, {"error": "internal prediction failure"})

        def log_message(self, fmt, *a):
            logger.info("http: " + fmt, *a)

    class Server(ThreadingHTTPServer):
        # the stdlib default accept backlog (5) drops connections under
        # bursty clients (observed: ECONNRESET at 16 simultaneous connects
        # on a loaded 1-core host) — size it to the batching design instead
        request_queue_size = 128
        # --workers: every worker binds the same port with SO_REUSEPORT and
        # the kernel load-balances accepted connections. socketserver wires
        # the sockopt from allow_reuse_port only on py>=3.11 — on 3.10 the
        # attribute is silently ignored and the second worker would die
        # with EADDRINUSE, so set the sockopt explicitly in server_bind.
        allow_reuse_port = bool(getattr(args, "_reuse_port", False))

        def server_bind(self):
            if self.allow_reuse_port and sys.version_info < (3, 11):
                if not hasattr(socket, "SO_REUSEPORT"):
                    raise SystemExit(
                        "--workers>1 needs SO_REUSEPORT, which this "
                        "platform's socket module does not expose")
                self.socket.setsockopt(socket.SOL_SOCKET,
                                       socket.SO_REUSEPORT, 1)
            super().server_bind()

    return Server((args.host, args.port), Handler)


def _strip_workers_flag(argv):
    out, skip = [], False
    for tok in argv:
        if skip:
            skip = False
            continue
        if tok == "--workers":
            skip = True
            continue
        if tok.startswith("--workers="):
            continue
        out.append(tok)
    return out


def _supervise_workers(args, argv):
    """--workers N: spawn N full serving processes sharing the port via
    SO_REUSEPORT; this process is a pure supervisor (forwards
    SIGTERM/SIGINT, reaps children, exits with the worst child rc)."""
    import signal
    import subprocess
    import sys

    if args.port == 0:
        raise SystemExit("--workers>1 requires an explicit --port "
                         "(SO_REUSEPORT workers must share one port)")
    base = list(argv) if argv is not None else sys.argv[1:]
    child_argv = _strip_workers_flag(base) + ["--workers", "1",
                                              "--_reuse_port"]
    module = __package__ + ".serve"
    procs = []
    for i in range(args.workers):
        p = subprocess.Popen([sys.executable, "-m", module] + child_argv)
        logger.info("worker %d/%d pid=%d", i + 1, args.workers, p.pid)
        procs.append(p)

    def _forward(signum, frame):
        logger.info("supervisor: forwarding signal %d to %d workers",
                    signum, len(procs))
        for p in procs:
            if p.poll() is None:
                p.send_signal(signum)

    for s in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(s, _forward)
        except ValueError:
            logger.warning("not on the main thread: supervisor signal "
                           "forwarding disabled")
            break
    rc = 0
    for p in procs:
        try:
            rc = max(rc, abs(p.wait()))
        except KeyboardInterrupt:
            _forward(signal.SIGINT, None)
            rc = max(rc, abs(p.wait()))
    return rc


def main(argv=None):
    import signal

    args = parse_args(argv)
    if args.workers > 1:
        return _supervise_workers(args, argv)
    enable_compile_cache()
    seed_everything(args.seed, args=args)
    state = {"server": None, "stopping": False}

    def _graceful(signum, frame):
        # Serving phase: stop the accept loop; in-flight handlers keep
        # running and the finally-block drains them. shutdown() must run
        # OFF the serve_forever thread (it blocks until that loop exits).
        # Build/warm-up phase (no server yet): nothing is in flight — exit
        # now, cleanly, instead of dying on the default handler mid-compile.
        state["stopping"] = True
        srv = state["server"]
        if srv is not None:
            logger.info("signal %d: stopping accept loop and draining",
                        signum)
            threading.Thread(target=srv.shutdown, daemon=True).start()
        else:
            logger.info("signal %d during build/warm-up: exiting", signum)
            raise SystemExit(128 + signum)

    try:
        signal.signal(signal.SIGTERM, _graceful)
    except ValueError:  # signal only works on the main thread (test drivers)
        logger.warning("not on the main thread: SIGTERM drain disabled")

    detector_cache = {}
    predict_batch, meta = build_service(args, detector_cache)
    warm_service(args, predict_batch)
    batcher = MicroBatcher(predict_batch, args.max_batch,
                           args.batch_window_ms)
    extra_services = {}
    for spec in args.extra_model:
        name, margs = parse_model_spec(args, spec)
        if name in extra_services:
            raise SystemExit(f"--extra_model: duplicate name {name!r}")
        logger.info("building extra model %r (%s)", name, spec)
        predict_m, meta_m = build_service(margs, detector_cache)
        warm_service(margs, predict_m)
        extra_services[name] = (MicroBatcher(predict_m, margs.max_batch,
                                             margs.batch_window_ms), meta_m)
    server = make_server(args, batcher, meta, extra_services)
    state["server"] = server
    logger.info("serving %s%s on %s:%d (max_batch=%d, window=%.1fms)",
                meta["model"],
                (" + " + ", ".join(f"/classify/{n}" for n in extra_services)
                 if extra_services else ""),
                args.host, server.server_address[1],
                args.max_batch, args.batch_window_ms)
    all_batchers = [batcher] + [b for b, _ in extra_services.values()]
    try:
        if not state["stopping"]:
            server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        # drain covers the FULL handler span (handler_started/finished wraps
        # do_POST), so when it returns every accepted request has its
        # response written — no post-drain sleep needed
        deadline = time.monotonic() + args.drain_timeout
        for b in all_batchers:
            if not b.drain(timeout=max(0.0, deadline - time.monotonic())):
                logger.warning("drain timeout (%.1fs): exiting with "
                               "requests still in flight",
                               args.drain_timeout)
                break
        for b in all_batchers:
            b.close()
        server.server_close()


if __name__ == "__main__":
    raise SystemExit(main())
