"""Shared CLI plumbing: the reference repeats a near-identical argparse block
and seeding/results-dir logic in each of its four runners (reference
``run_txt.py:19-44``, ``run_img.py:19-44``, ``run_mm_late.py:20-62``,
``run_mm_early.py:19-49``); here it is one module.

All reference flags are preserved verbatim; TPU-runtime flags (``--dtype``,
``--attn_impl``, ``--mesh_data/--mesh_model``, ``--arch``, ``--resume``,
``--profile``) are additions.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

ARCH_PRESETS = {
    "base": {},
    "small": dict(hidden=256, layers=4, heads=4, mlp_dim=512),
    "tiny": dict(hidden=64, layers=2, heads=2, mlp_dim=128),
}


def add_common_args(parser: argparse.ArgumentParser, multimodal: bool = False):
    parser.add_argument("--task", type=int, choices=[0, 1, 2, 3, 4, 5, 6],
                        help="task to run")
    parser.add_argument("--epochs", type=int, default=2, help="number of epochs")
    parser.add_argument("--weight_decay", type=float, default=0.00025,
                        help="weight decay param")
    parser.add_argument("--lr", type=float, default=1e-5, help="learning rate param")
    parser.add_argument("--dropout", type=float, default=0.05, help="dropout param")
    parser.add_argument("--seed", type=int, default=30, help="manual seed")
    parser.add_argument("--testing", action="store_true", help="testing sample")
    parser.add_argument("--save_model", action="store_true", help="save model")
    parser.add_argument("--save_preds", action="store_true", help="eval test")
    parser.add_argument("--use_loss_correction", action="store_true",
                        help="use Loss correction (only for binary cases)")
    if multimodal:
        parser.add_argument("--use_clip_loss", action="store_true",
                            help="use contrastive Loss")
        parser.add_argument("--use_tim_loss", action="store_true", help="use TIM Loss")
        parser.add_argument("--beta_itc", type=float, default=0.1,
                            help="hyperparameter for itc loss")
        parser.add_argument("--beta_itm", type=float, default=0.1,
                            help="hyperparameter for itm loss")
        parser.add_argument("--use_saved_features", action="store_true",
                            help="use preprocessed features")
    # --- TPU-runtime additions ------------------------------------------
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="activation compute dtype")
    parser.add_argument("--attn_impl", type=str, default="auto",
                        choices=["auto", "pallas", "pallas_interpret", "jnp",
                                 "fused", "fused_interpret"],
                        help="attention kernel implementation ('fused' = "
                             "whole QKV+SDPA+out-proj block as one Pallas "
                             "kernel, ops/attn_block.py)")
    parser.add_argument("--opt_moments", type=str, default="f32",
                        choices=["f32", "bf16"],
                        help="AdamW first-moment storage dtype: bf16 halves "
                             "the m-state HBM traffic (the optimizer is "
                             "weight-HBM-bound at batch 8, BASELINE.md); "
                             "loss-trajectory equivalence tested")
    parser.add_argument("--opt_kernel", type=str, default="fused",
                        choices=["fused", "optax"],
                        help="AdamW emission: 'fused' = one-tree_map AdamW "
                             "(identical math to optax.adamw, equivalence-"
                             "tested; one elementwise kernel per leaf — the "
                             "optax chain measured ~2.5 ms/step slower at "
                             "the flagship, BASELINE.md). 'optax' = the "
                             "stock optax.adamw chain")
    parser.add_argument("--tim_reuse_text", action="store_true",
                        help="reuse the primary pass's text-tower "
                             "activations for the TIM rows (a row gather — "
                             "the swap is an in-batch permutation) instead "
                             "of re-encoding. EXACT in eval; during "
                             "training the reused rows share the primary "
                             "pass's dropout masks where the reference "
                             "draws fresh ones (mm_late.py:168-182) — "
                             "deviation documented in BASELINE.md; saves "
                             "the second text pass, the dominant step cost "
                             "at batch 8")
    parser.add_argument("--prng_impl", type=str, default="rbg",
                        choices=["rbg", "threefry"],
                        help="PRNG for dropout/ITM draws: 'rbg' is the "
                             "TPU-native generator (~10%% of the flagship "
                             "step goes to threefry mask generation, "
                             "BASELINE.md ablation); runs stay "
                             "deterministic per seed either way")
    parser.add_argument("--mesh_pipe", type=int, default=1,
                        help="pipeline-parallel stages for the text tower "
                             "(GPipe over the scanned layer stack; requires "
                             "--scan_layers). Note: with dropout > 0, PP "
                             "derives per-layer dropout keys differently "
                             "from the sequential nn.scan stack, so PP runs "
                             "are deterministic per seed but not trajectory-"
                             "comparable to non-PP runs; forward/grad parity "
                             "holds exactly in deterministic mode")
    parser.add_argument("--pp_microbatches", type=int, default=0,
                        help="microbatches per pipeline step (default "
                             "min(4, batch))")
    parser.add_argument("--pp_interleave", type=int, default=1,
                        help="interleaved pipeline levels (circular "
                             "schedule): each stage holds this many "
                             "non-adjacent layer chunks, cutting the GPipe "
                             "bubble by ~the same factor; needs "
                             "microbatches >= stages and layers divisible "
                             "by stages x levels")
    parser.add_argument("--bucket_seq", type=str, nargs="?", const="32,64,96",
                        default=None, metavar="L1,L2,..",
                        help="sequence-length bucketing: slice each batch's "
                             "text arrays to the smallest listed bucket "
                             "covering its longest real sequence (default "
                             "buckets 32,64,96; full max_length stays the "
                             "fallback). EXACT under masked attention — "
                             "same logits, same trajectory, less padded "
                             "compute (tests/test_bucketing.py)")
    parser.add_argument("--bucket_group", action="store_true",
                        help="with --bucket_seq and --steps_per_dispatch>1: "
                             "stably regroup each training epoch's shuffled "
                             "batches by bucket width so every scan chunk "
                             "is pure-width and slices to the per-batch "
                             "bucket (chunk-level bucketing degenerates to "
                             "the full pad at realistic tweet-length "
                             "mixes). Per-example math stays exact; only "
                             "the batch visit order within an epoch "
                             "deviates (MIGRATION.md)")
    parser.add_argument("--mesh_data", type=int, default=None,
                        help="data-parallel mesh axis size (default: all devices)")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="tensor-parallel mesh axis size")
    parser.add_argument("--arch", type=str, default="base",
                        choices=list(ARCH_PRESETS),
                        help="architecture size preset (tiny/small for smoke runs)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialise encoder layers")
    parser.add_argument("--scan_layers", action="store_true",
                        help="lax.scan over encoder layers (smaller HLO / "
                             "faster compiles; random-init only — stacked "
                             "param layout is not weight-import compatible)")
    parser.add_argument("--opt_impl", type=str, default="exact",
                        choices=["exact", "lazy_emb"],
                        help="optimizer implementation: 'exact' is dense "
                             "AdamW (reference parity, utils.py:280-292); "
                             "'lazy_emb' updates only the embedding rows in "
                             "the batch (row-sparse AdamW — same math for "
                             "touched rows, skips decay on untouched rows; "
                             "removes the weight-HBM bottleneck at small "
                             "batch, train/lazy_emb.py)")
    if multimodal:
        parser.add_argument("--cache_vision", action="store_true",
                            help="cache the frozen vision tower's activations "
                                 "per image (first touch computes, later "
                                 "epochs skip the tower entirely; late-fusion "
                                 "transformer towers only)")
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="optimizer steps per device dispatch: >1 scans "
                             "K steps in ONE compiled call (lax.scan over "
                             "stacked batches; bit-identical trajectory, "
                             "tests/test_train_many.py). Hides host->device "
                             "dispatch latency — the datasets are small "
                             "enough that whole epoch chunks fit in HBM")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest Orbax checkpoint")
    parser.add_argument("--ckpt_every", type=int, default=0,
                        help="orbax checkpoint every N steps (0 = off)")
    parser.add_argument("--profile", type=str, default=None,
                        help="write a jax.profiler trace to this directory")
    parser.add_argument("--log_every", type=int, default=10,
                        help="log training metrics every N steps")
    parser.add_argument("--image_size", type=int, default=None,
                        help="override the model's input image size")
    parser.add_argument("--log_jsonl", type=str, default=None,
                        help="append structured per-step/epoch records to this JSONL file")
    parser.add_argument("--img_decoder", type=str, default="pil",
                        choices=["pil", "native"],
                        help="image ingest path: pil (reference-parity "
                             "decode, default) or native (C++ libjpeg/libpng "
                             "with DCT-scaled JPEG decode; faster cache "
                             "builds, ~1 LSB resize deviation)")
    return parser


def publish_img_decoder(args):
    """Publishes --img_decoder to the ingest layer: the decode helpers
    (data/images.py) run deep inside cache builds and pipelines, so the
    switch travels as SMTC_IMG_DECODER rather than threading args. Called
    post-parse by every runner main — unconditionally, so the pil default
    RESETS the env and a '--img_decoder native' invocation cannot leak the
    non-bit-exact decoder into a later in-process main() call."""
    os.environ["SMTC_IMG_DECODER"] = getattr(args, "img_decoder", None) or "pil"


def enable_compile_cache():
    """Point JAX at a persistent compilation cache for every CLI run.

    Full-size model compiles cost 90 s-20 min on a tunneled/shared TPU
    (BASELINE.md operational notes) and users re-run the runners many times
    per experiment sweep; the persistent cache makes every compile after the
    first a disk hit. Opt out with ``SMTC_COMPILE_CACHE=0``; relocate with
    ``SMTC_COMPILE_CACHE_DIR`` (default ``~/.cache/smtc_jax_cache``, or an
    already-exported ``JAX_COMPILATION_CACHE_DIR`` wins)."""
    if os.environ.get("SMTC_COMPILE_CACHE", "1") == "0":
        return
    try:
        import jax

        path = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or os.environ.get("SMTC_COMPILE_CACHE_DIR")
                or os.path.expanduser("~/.cache/smtc_jax_cache"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took real compile time, not just big programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:
        # purely an optimization — a read-only HOME (common in serving
        # containers) must not take the runner down
        import logging

        logging.getLogger(__name__).warning(
            "persistent compile cache disabled: %r", e)


def seed_everything(seed: int, prng_impl: str = None, args=None):
    np.random.seed(seed)
    enable_compile_cache()
    if args is not None:
        publish_img_decoder(args)
    if prng_impl:
        import jax

        # the flag exposes the common short names; JAX's enum spells the
        # counter-based generator "threefry2x32"
        impl = {"threefry": "threefry2x32"}.get(prng_impl, prng_impl)
        jax.config.update("jax_default_prng_impl", impl)


def artifact_stem(args, cfg, family: str = "mm_late") -> str:
    """THE artifact naming contract (reference ``run_mm_late.py:91-96`` /
    ``run_mm_early`` filenames) — single definition shared by the trainers
    and the serving endpoint so artifact resolution can never drift."""
    if family == "mm_late":
        nsamples = getattr(args, "nsamples", -1)
        nsamples_str = "" if nsamples == -1 else f"N{nsamples}_"
        return "{}-{}-{}_task{}_seed{}_{}_{}".format(
            args.txt_model_name, args.img_model_name, args.fusion_name,
            args.task, args.seed, cfg.loss_str, nsamples_str)
    return f"{family}_task{args.task}_seed{args.seed}_{cfg.loss_str}_"


def results_dir_for(base: str, testing: bool) -> str:
    out = base + ("testing/" if testing else "")
    os.makedirs(out, exist_ok=True)
    return out


def seq_buckets_from(args):
    """``--bucket_seq`` string -> sorted tuple of bucket lengths (or None)."""
    raw = getattr(args, "bucket_seq", None)
    if not raw:
        if getattr(args, "bucket_group", False):
            raise SystemExit("--bucket_group requires --bucket_seq")
        return None
    try:
        buckets = tuple(sorted({int(x) for x in str(raw).split(",") if x}))
    except ValueError:
        raise SystemExit(f"--bucket_seq {raw!r}: expected comma-separated ints")
    if not buckets or min(buckets) < 2:
        raise SystemExit(f"--bucket_seq {raw!r}: buckets must be >= 2")
    return buckets


def arch_overrides(args) -> dict:
    return dict(ARCH_PRESETS[args.arch])


def save_predictions_csv(res: dict, path: str):
    """``data_id,label,prediction`` contract (reference run_mm_late.py:117-128)."""
    import pandas as pd

    pd.DataFrame({
        "data_id": list(res["data_id"]),
        "label": [x.tolist() if hasattr(x, "tolist") else x for x in res["labels"]],
        "prediction": [x.tolist() if hasattr(x, "tolist") else x for x in res["predictions"]],
    }).to_csv(path, index=False)


def save_metrics_csv(metrics: dict, path: str):
    import pandas as pd

    pd.DataFrame(metrics).to_csv(path, index=False)
