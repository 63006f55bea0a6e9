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
    export_args, serve_argv = ap.parse_known_args(argv)
    args = _serve.parse_args(serve_argv)
    return export_args, args


def export_service(args, platforms=None):
    """-> (serialized bytes, sidecar dict, check_fn). ``check_fn(blob)``
    re-runs the artifact against the live predict on a sample batch."""
    import jax

    info = {}
    _serve.build_service(args, export_info=info)
    if info.get("detector") is not None:
        logger.warning(
            "lxmert export covers the classifier graph; the FRCNN detector "
            "stays a runtime component (sidecar records the ROI contract)")
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

    return blob, sidecar, check


def main(argv=None):
    export_args, args = parse_args(argv)
    enable_compile_cache()
    platforms = (export_args.platforms.split(",")
                 if export_args.platforms else None)
    blob, sidecar, check = export_service(args, platforms)

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

    if export_args.check:
        check(open(out, "rb").read())
        logger.info("round-trip check passed: deserialized artifact is "
                    "ULP-identical to the live predict")
    print(json.dumps({"out": out, "bytes": len(blob),
                      "platforms": sidecar["platforms"],
                      "checked": bool(export_args.check)}))


if __name__ == "__main__":
    sys.exit(main())
