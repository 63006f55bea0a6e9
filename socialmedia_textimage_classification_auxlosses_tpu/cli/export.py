"""Export a trained model's serving graph as a portable StableHLO artifact.

The reference deploys nothing — its endpoint is CSV dumps
(``run_mm_late.py:155-185``). A TPU-native production story needs an
ahead-of-time deployable artifact: this runner lowers the SAME fixed-shape
jitted predict that ``cli/serve.py`` dispatches (weights resolved, eval
dtype cast / ``--quantize w8`` applied, softmax/sigmoid included) through
``jax.export`` and serializes it — weights embedded as module constants —
so a serving fleet can load and run the model with NO Python model code,
any JAX version with a compatible calling convention, on any exported
platform:

    python -m ....cli.export --task 3 --txt_model_name bernice \
        --img_model_name vit --fusion_name attention \
        --out model.stablehlo --platforms cpu,tpu --check

    # consume (no framework code needed):
    from jax import export
    exp = export.deserialize(open("model.stablehlo", "rb").read())
    probs = exp.call(batch)   # batch dict per the .json sidecar

Flags are ``cli.serve``'s model-selection surface (same artifact naming
contract); ``--out`` defaults next to the model artifact. A ``.json``
sidecar records the exact input contract (names, shapes, dtypes, tokenizer
and image preprocessing identity) and the class names.

Scope: the exported module is the DEVICE graph (tokenized ids/mask +
resized pixels -> probabilities). Host-side preprocessing (tokenizer,
image resize) stays in the client — the sidecar names it; for lxmert the
FRCNN detector remains a separate runtime component (its fused program is
itself jittable; export it at a fixed canvas if needed).

``--check`` round-trips: deserialize the written artifact and assert its
output matches the live jitted function on a sample batch (a few ULP:
the deserialized module recompiles, so fusion order may differ).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from ..utils.logging import get_logger
from . import serve as _serve
from ._common import enable_compile_cache

logger = get_logger(__name__)


def parse_args(argv=None):
    # export-only flags here; everything else is serve's flag surface
    import argparse

    ap = argparse.ArgumentParser(
        description="export the serving graph as StableHLO",
        parents=[], add_help=True)
    ap.add_argument("--out", type=str, default=None,
                    help="output path (default: <artifact stem>.stablehlo "
                         "in the results dir)")
    ap.add_argument("--platforms", type=str, default=None,
                    help="comma-separated lowering platforms, e.g. "
                         "cpu,tpu (default: the current JAX backend)")
    ap.add_argument("--check", action="store_true",
                    help="deserialize the written artifact and assert "
                         "ULP-level agreement vs the live jitted predict")
    ap.add_argument("--export_detector", action="store_true",
                    help="(--model lxmert) also export the fused FRCNN "
                         "detector program per canvas orientation at "
                         "--detector_batch — raw padded uint8 canvases + "
                         "per-image valid sizes in, 36-region tensors out "
                         "(<out>.detector.{landscape,portrait}.stablehlo)")
    ap.add_argument("--detector_batch", type=int, default=16,
                    help="fixed batch of the exported detector programs "
                         "(the cacher's dispatch group size)")
    export_args, serve_argv = ap.parse_known_args(argv)
    args = _serve.parse_args(serve_argv)
    return export_args, args


def export_detector(detector, batch: int, platforms=None):
    """Fused single-dispatch FRCNN program -> {orientation: (blob, meta)}.

    Inputs per program: ``canvases`` (batch, Hp, Wp, 3) uint8 RAW RGB
    padded canvases (``preprocess_image`` host half) and ``size_hw``
    (batch, 2) float32 per-image valid (resized_h, resized_w); outputs the
    fused detector's 36-region tensors (roi_features, boxes in image
    coords normalized by the caller contract below, scores, classes,
    valid counts). Weights embedded. One program per canvas orientation
    (landscape/portrait) — exactly the two jit specializations the live
    detector compiles."""
    import jax
    import jax.numpy as jnp

    cfg = detector.cfg
    div = cfg.size_divisibility
    rup = lambda v: ((v + div - 1) // div) * div  # noqa: E731
    out = {}
    for orient, (ph, pw) in (("landscape", (rup(cfg.min_size),
                                            rup(cfg.max_size))),
                             ("portrait", (rup(cfg.max_size),
                                           rup(cfg.min_size)))):
        specs = (jax.ShapeDtypeStruct((batch, ph, pw, 3), jnp.uint8),
                 jax.ShapeDtypeStruct((batch, 2), jnp.float32))
        fn = jax.jit(lambda canv, sizes: detector._fused_detect(
            detector.params, canv, sizes))
        kwargs = {"platforms": platforms} if platforms else {}
        exported = jax.export.export(fn, **kwargs)(*specs)
        out[orient] = (exported.serialize(), {
            "canvas": [batch, ph, pw, 3],
            "inputs": "canvases uint8 RAW RGB (preprocess_image), "
                      "size_hw float32 (batch, 2) valid resized dims",
            "outputs": "roi_features (batch, 36, feat), normalized_boxes, "
                       "scores, classes, valid counts",
            "platforms": list(exported.platforms),
        })
    return out


def export_service(args, platforms=None):
    """-> (serialized bytes, sidecar dict, check_fn, info). ``check_fn``
    re-runs the artifact against the live predict on a sample batch;
    ``info`` carries the live pieces (incl. the detector for
    ``--export_detector``)."""
    import jax

    info = {}
    _serve.build_service(args, export_info=info)
    if info.get("detector") is not None:
        logger.info(
            "lxmert classifier graph exported; pass --export_detector to "
            "also export the fused FRCNN programs (otherwise the detector "
            "stays a runtime component; sidecar records the ROI contract)")
    predict, params = info["predict"], info["params"]
    sample = info["make_batch"]([("stablehlo export sample", None)])
    specs = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
             for k, v in sample.items()}

    # close the resolved weights over the graph: the artifact is
    # self-contained (constants in the module), the only runtime inputs
    # are the request batch tensors
    fn = jax.jit(lambda batch: predict(params, batch))
    kwargs = {}
    if platforms:
        kwargs["platforms"] = platforms
    exported = jax.export.export(fn, **kwargs)(specs)
    blob = exported.serialize()

    sidecar = {
        "format": "jax.export StableHLO",
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "inputs": {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                   for k, v in sample.items()},
        "output": "probabilities (max_batch, num_labels) float32 "
                  "(softmax; sigmoid when multilabel)",
        "num_labels": info["num_labels"],
        "classes": info["classes"],
        "max_batch": args.max_batch,
        "model": args.model,
        "task": args.task,
        "quantize": args.quantize,
        "preprocessing": {
            "text": "framework tokenizer for the configured tower "
                    "(data/tokenizers.py), padded to the shape above",
            "image": ("FRCNN 36-ROI features (models/frcnn.py)"
                      if info.get("detector") is not None else
                      "uint8 RGB square resize to the pixel_values shape "
                      "(data/images.py resize_to_u8); zeros = no image"),
        },
    }

    def check(blob_bytes):
        # the deserialized module recompiles from StableHLO, so XLA may
        # fuse in a different order than the live jit — agreement is a few
        # ULP, not bitwise (observed max 1 ULP on CPU)
        rt = jax.export.deserialize(bytearray(blob_bytes))
        live = np.asarray(predict(params, sample))
        back = np.asarray(rt.call(sample))
        np.testing.assert_allclose(live, back, rtol=1e-5, atol=1e-7)
        return live

    return blob, sidecar, check, info


def main(argv=None):
    export_args, args = parse_args(argv)
    enable_compile_cache()
    platforms = (export_args.platforms.split(",")
                 if export_args.platforms else None)
    blob, sidecar, check, info = export_service(args, platforms)

    out = export_args.out
    if out is None:
        from ..core import config as C
        from ._common import artifact_stem, results_dir_for

        cfg = C.serving_config(
            args, model_name="vilt" if args.model == "vilt" else None)
        base = {"mm_late": C.results_dir_mm_late,
                "mmbt": C.results_dir_mmbt}.get(args.model,
                                                C.results_dir_mm_early)
        out = (results_dir_for(base, args.testing)
               + artifact_stem(args, cfg, args.model) + "serving.stablehlo")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "wb") as f:
        f.write(blob)
    with open(out + ".json", "w") as f:
        json.dump(sidecar, f, indent=1)
    logger.info("wrote %s (%.1f MB) + sidecar", out, len(blob) / 2 ** 20)

    detector_files = []
    if export_args.export_detector:
        if info.get("detector") is None:
            raise SystemExit("--export_detector needs --model lxmert")
        dets = export_detector(info["detector"], export_args.detector_batch,
                               platforms)
        for orient, (dblob, dmeta) in dets.items():
            dpath = f"{out}.detector.{orient}.stablehlo"
            with open(dpath, "wb") as f:
                f.write(dblob)
            with open(dpath + ".json", "w") as f:
                json.dump(dmeta, f, indent=1)
            detector_files.append(dpath)
            logger.info("wrote %s (%.1f MB)", dpath, len(dblob) / 2 ** 20)

    if export_args.check:
        check(open(out, "rb").read())
        logger.info("round-trip check passed: deserialized artifact is "
                    "ULP-identical to the live predict")
    print(json.dumps({"out": out, "bytes": len(blob),
                      "platforms": sidecar["platforms"],
                      "detectors": detector_files,
                      "checked": bool(export_args.check)}))


if __name__ == "__main__":
    sys.exit(main())
