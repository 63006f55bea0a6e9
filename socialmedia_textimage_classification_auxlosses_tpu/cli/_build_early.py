"""Early-fusion (ViLT / LXMERT) setup builder (reference ``mm_early.py``
``MMEarly_Model`` — tokenizer/processor + model + loaders,
mm_early.py:175-260)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as C
from ..data.cache import RoiFeatureCache
from ..data.images import normalize_on_device
from ..data.pipeline import PipelineConfig, make_image_source
from ..data.prep import prepare_data
from ..data.tokenizers import build_tokenizer
from ..models.lxmert import LxmertClassifier, LxmertConfig, init_lxmert_params
from ..models.text import _load_hf_config
from ..models.vilt import ViltClassifier, init_vilt_params
from ..models.encoder import EncoderConfig
from ..models.vision import IMAGE_NORM
from ..utils.logging import get_logger
from ._build import Setup, _loss_cfg_from, _finish, _make_pipes, make_mesh, _maybe_pp
from ._common import arch_overrides, seq_buckets_from

logger = get_logger(__name__)

VILT_PRESET = dict(vocab_size=30522, type_vocab=2, pad_token_id=0)


def vilt_geometry(model_dir):
    hf = _load_hf_config(model_dir)
    return {
        "patch": hf.get("patch_size", 32),
        "image_size": hf.get("image_size", 384),
    }


def build_mm_early_setup(args, cfg: C.Config, data_splits=None,
                         grid_roi_fallback=True, roi_cache=None) -> Setup:
    model_name = args.model
    model_dir = C.MODEL_DIR_DICT.get(model_name)
    overrides = arch_overrides(args)
    hf = _load_hf_config(model_dir)
    tim_batched = not getattr(args, "tim_two_pass", False)

    hidden = overrides.get("hidden", hf.get("hidden_size", 768))
    layers = overrides.get("layers", hf.get("num_hidden_layers", 12))
    heads = overrides.get("heads", hf.get("num_attention_heads", 12))
    mlp_dim = overrides.get("mlp_dim", hf.get("intermediate_size", 3072))
    vocab = hf.get("vocab_size", VILT_PRESET["vocab_size"])

    tokenizer = build_tokenizer("bert", model_dir, cfg.max_length, vocab)

    if data_splits is None:
        rng = np.random.RandomState(args.seed)
        train, val, test, weights = prepare_data(
            cfg.data, cfg.num_labels, testing=args.testing,
            multilabel=cfg.multilabel, task_name=cfg.task_name, rng=rng,
        )
        data_splits = {"train": train, "val": val, "test": test}
    else:
        weights = data_splits.pop("_weights", None)

    if model_name == "vilt":
        vilt_exact = getattr(args, "vilt_exact_resize", False)
        geo = vilt_geometry(model_dir)
        if args.arch != "base" and not vilt_exact:
            geo = {"patch": 32, "image_size": 64}
        enc_cfg = EncoderConfig(
            vocab_size=vocab, hidden=hidden, layers=layers, heads=heads,
            mlp_dim=mlp_dim,
            max_positions=max(cfg.max_length, hf.get("max_position_embeddings", 40)),
            # backbone dropout follows the checkpoint config, as the
            # reference's ViltModel.from_pretrained does (mm_early.py:52)
            type_vocab=2, ln_style="pre",
            dropout=hf.get("hidden_dropout_prob", 0.1),
            dtype=args.dtype, attn_impl=args.attn_impl,
            remat=getattr(args, "remat", False),
            scan_layers=getattr(args, "scan_layers", False),
        )
        mesh_plan, pp = _maybe_pp(args, cfg,
                                  {"scan_layers": enc_cfg.scan_layers})
        if pp is not None:
            # ViLT's joint encoder is a TransformerStack: the GPipe runner
            # plugs straight into its config (parallel/pp_text.py)
            from ..parallel.pp_text import with_pp_runner

            enc_cfg = with_pp_runner(enc_cfg, pp.mesh, pp.num_micro, pp.num_levels)
        canvas = None
        if vilt_exact:
            # HF ViltProcessor geometry per sample (reference
            # datasets.py:224-227 + mm_early.py:205-226): aspect-preserving
            # resize to a masked static canvas; the position grid stays at
            # the checkpoint's (image_size // patch)^2 layout
            from ..data.images import vilt_canvas

            canvas = vilt_canvas(geo["image_size"])
        model = ViltClassifier(enc_cfg, cfg.num_labels, patch=geo["patch"],
                               image_size=geo["image_size"], dropout=cfg.dropout,
                               tim_batched=tim_batched, canvas_size=canvas)
        L = cfg.max_length
        ids0 = jnp.zeros((2, L), jnp.int32)
        px0 = jnp.zeros((2, canvas or geo["image_size"],
                         canvas or geo["image_size"], 3), jnp.float32)
        params = init_vilt_params(
            model, jax.random.PRNGKey(args.seed), ids0, ids0, ids0, px0,
            grid_hw=(jnp.full((2, 2), geo["image_size"], jnp.int32)
                     if vilt_exact else None))
        from ..models import hf_import as H

        params = H.maybe_import_vilt(params, model_dir, layers,
                                     scan=getattr(args, "scan_layers", False))
        mean, std = IMAGE_NORM["vilt"]
        dtype = jnp.dtype(args.dtype)

        def forward_fn(p, batch, tim_inputs, dropout_rng, deterministic):
            rngs = None if deterministic else {"dropout": dropout_rng}
            pixels = normalize_on_device(batch["pixel_values"], mean, std, dtype)
            return model.apply(
                p, batch["ids"], batch["mask"], batch.get("token_type_ids"),
                pixels, grid_hw=batch.get("grid_hw"),
                tim_ids=None if tim_inputs is None else tim_inputs["ids"],
                tim_mask=None if tim_inputs is None else tim_inputs["mask"],
                tim_token_type_ids=None if tim_inputs is None else tim_inputs["token_type_ids"],
                deterministic=deterministic, rngs=rngs,
            )

        def image_source_fn(split):
            if vilt_exact:
                from ..data.pipeline import ExactViltImageSource

                if getattr(args, "use_saved_features", False):
                    logger.warning("--vilt_exact_resize decodes per sample "
                                   "(memoised); --use_saved_features' fixed-"
                                   "square uint8 cache does not apply")
                return ExactViltImageSource(cfg.img_fmt,
                                            shortest=geo["image_size"])
            return make_image_source(
                cfg.img_fmt, ids=split.ids, size=geo["image_size"],
                use_cache=getattr(args, "use_saved_features", False),
                cache_dir=f"{C.DATA_PATH}cache/{cfg.task_name}_vilt_u8_{geo['image_size']}",
            )

        pipe_cfg = PipelineConfig(batch_size=cfg.batch_size,
                                  max_length=cfg.max_length,
                                  image_size=canvas or geo["image_size"],
                                  seq_buckets=seq_buckets_from(args),
                              bucket_group=getattr(args, "bucket_group", False))
        pipes = _make_pipes(cfg, data_splits, tokenizer, image_source_fn, pipe_cfg)
    elif model_name == "mmbt":
        from ..models.mmbt import MmbtClassifier, init_mmbt_params

        scan = getattr(args, "scan_layers", False)
        enc_cfg = EncoderConfig(
            vocab_size=vocab, hidden=hidden, layers=layers, heads=heads,
            mlp_dim=mlp_dim,
            max_positions=hf.get("max_position_embeddings", 512),
            type_vocab=hf.get("type_vocab_size", 2), ln_style="post",
            dropout=hf.get("hidden_dropout_prob", 0.1),
            dtype=args.dtype, attn_impl=args.attn_impl,
            remat=getattr(args, "remat", False), scan_layers=scan,
        )
        mesh_plan, pp = _maybe_pp(args, cfg, {"scan_layers": scan})
        if pp is not None:
            # the joint encoder is a TransformerStack like ViLT's — the
            # GPipe runner plugs into its config directly
            from ..parallel.pp_text import with_pp_runner

            enc_cfg = with_pp_runner(enc_cfg, pp.mesh, pp.num_micro, pp.num_levels)
        cnn_name = "resnet50" if args.arch != "base" else "resnet152"
        image_size = args.image_size or (64 if args.arch != "base" else 224)
        model = MmbtClassifier(enc_cfg, cfg.num_labels, cnn_name=cnn_name,
                               dropout=cfg.dropout, tim_batched=tim_batched)
        L = cfg.max_length
        ids0 = jnp.zeros((2, L), jnp.int32)
        mask0 = jnp.ones((2, L), jnp.int32)
        px0 = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
        params = init_mmbt_params(model, jax.random.PRNGKey(args.seed),
                                  ids0, mask0, px0)
        from ..models import hf_import as H

        params = H.maybe_import_mmbt(
            params, model_dir, layers,
            cnn_weight_path=C.MODEL_DIR_DICT.get(cnn_name),
            cnn_name=cnn_name, scan=scan)
        mean, std = IMAGE_NORM["mm_cnn"]
        dtype = jnp.dtype(args.dtype)

        def forward_fn(p, batch, tim_inputs, dropout_rng, deterministic):
            rngs = None if deterministic else {"dropout": dropout_rng}
            pixels = normalize_on_device(batch["pixel_values"], mean, std,
                                         dtype)
            tim_kw = {}
            if tim_inputs is not None:
                tim_kw = {"tim_ids": tim_inputs["ids"],
                          "tim_mask": tim_inputs["mask"]}
            if deterministic:
                return model.apply(p, batch["ids"], batch["mask"], pixels,
                                   deterministic=True, **tim_kw)
            out, upd = model.apply(p, batch["ids"], batch["mask"], pixels,
                                   deterministic=False, train=True,
                                   rngs=rngs, mutable=["batch_stats"],
                                   **tim_kw)
            out["batch_stats"] = upd["batch_stats"]
            return out

        def image_source_fn(split):
            return make_image_source(
                cfg.img_fmt, ids=split.ids, size=image_size,
                use_cache=getattr(args, "use_saved_features", False),
                cache_dir=f"{C.DATA_PATH}cache/{cfg.task_name}_mmbt_u8_{image_size}",
            )

        pipe_cfg = PipelineConfig(batch_size=cfg.batch_size,
                                  max_length=cfg.max_length,
                                  image_size=image_size,
                                  seq_buckets=seq_buckets_from(args),
                              bucket_group=getattr(args, "bucket_group", False))
        pipes = _make_pipes(cfg, data_splits, tokenizer, image_source_fn,
                            pipe_cfg)
    else:  # lxmert
        from ..parallel.pp_lxmert import lxmert_stack_pred

        scan = getattr(args, "scan_layers", False)
        mesh_plan, pp = _maybe_pp(args, cfg, {"scan_layers": scan},
                                  stack_pred=lxmert_stack_pred)
        if roi_cache is None:  # serving injects a detector-matched cache
            roi_cache = _ensure_roi_cache(args, cfg, data_splits,
                                          grid_roi_fallback=grid_roi_fallback)
        lx_cfg = LxmertConfig(
            vocab_size=vocab, hidden=hidden, heads=heads, mlp_dim=mlp_dim,
            l_layers=(2 if args.arch != "base" else hf.get("l_layers", 9)),
            r_layers=(1 if args.arch != "base" else hf.get("r_layers", 5)),
            x_layers=(1 if args.arch != "base" else hf.get("x_layers", 5)),
            # backbone dropout follows the checkpoint config, as the
            # reference's LxmertModel.from_pretrained does (mm_early.py:113)
            dropout=hf.get("hidden_dropout_prob", 0.1),
            dtype=args.dtype, attn_impl=args.attn_impl,
            scan_layers=scan,
            pipe_stages=(pp.mesh.shape["pipe"] if pp is not None else 1),
        )
        if pp is not None:
            # Three pipelined segments (lang/vis/cross) over the pipe axis;
            # the cross segment rotates the concatenated [lang ‖ vis] pair
            # (parallel/pp_lxmert.py)
            import dataclasses as _dc

            from ..parallel.pp_lxmert import make_lxmert_pp_runners

            lx_cfg = _dc.replace(
                lx_cfg, pp_runners=make_lxmert_pp_runners(
                    lx_cfg, pp.mesh, pp.num_micro, roi_cache.num_boxes))
        model = LxmertClassifier(lx_cfg, cfg.num_labels, dropout=cfg.dropout,
                                 tim_batched=tim_batched)
        L = cfg.max_length
        ids0 = jnp.zeros((2, L), jnp.int32)
        f0 = jnp.zeros((2, roi_cache.num_boxes, roi_cache.feat_dim), jnp.float32)
        b0 = jnp.zeros((2, roi_cache.num_boxes, 4), jnp.float32)
        params = init_lxmert_params(model, jax.random.PRNGKey(args.seed),
                                    ids0, ids0, ids0, f0, b0)
        from ..models import hf_import as H

        params = H.maybe_import_lxmert(params, model_dir, lx_cfg.l_layers,
                                       lx_cfg.r_layers, lx_cfg.x_layers,
                                       scan=scan,
                                       pipe_stages=lx_cfg.pipe_stages)

        def forward_fn(p, batch, tim_inputs, dropout_rng, deterministic):
            rngs = None if deterministic else {"dropout": dropout_rng}
            return model.apply(
                p, batch["ids"], batch["mask"], batch.get("token_type_ids"),
                batch["roi_features"], batch["roi_boxes"],
                tim_ids=None if tim_inputs is None else tim_inputs["ids"],
                tim_mask=None if tim_inputs is None else tim_inputs["mask"],
                tim_token_type_ids=None if tim_inputs is None else tim_inputs["token_type_ids"],
                deterministic=deterministic, rngs=rngs,
            )

        pipe_cfg = PipelineConfig(batch_size=cfg.batch_size,
                                  max_length=cfg.max_length, with_images=False,
                                  seq_buckets=seq_buckets_from(args),
                              bucket_group=getattr(args, "bucket_group", False))
        pipes = _make_pipes(cfg, data_splits, tokenizer, pipe_cfg=pipe_cfg,
                            roi_cache=roi_cache)

    if model_name == "mmbt":
        from ..train.optim import batch_stats_predicate

        frozen_pred = batch_stats_predicate  # BN stats never decay
    else:
        frozen_pred = None
    return _finish(
        dict(model=model, params=params, forward_fn=forward_fn,
             loss_cfg=_loss_cfg_from(cfg),
             class_weights=None if weights is None else jnp.asarray(weights),
             tokenizer=tokenizer, mesh_plan=mesh_plan, pipes=pipes),
        args, cfg, frozen_pred=frozen_pred,
    )


def _ensure_roi_cache(args, cfg, data_splits, grid_roi_fallback=True) -> RoiFeatureCache:
    """Load precomputed ROI features: reference-format dumps if present, our
    cache if built (``cli/obj_features.py``), else the grid-feature extractor
    on the fly (documented FRCNN substitute)."""
    cache_dir = f"{C.DATA_PATH}cache/{cfg.task_name}_roi"
    cache = RoiFeatureCache(cache_dir)
    all_ids = np.concatenate([np.asarray(s.ids) for s in data_splits.values()])
    if cache.index and all(str(i) in cache.index for i in all_ids):
        return cache
    if cache.import_reference_dumps(C.DATA_PATH, cfg.task_name, all_ids):
        return cache
    if not grid_roi_fallback:
        raise FileNotFoundError(
            f"no ROI features for task {cfg.task_name}; run cli.obj_features"
        )
    from .obj_features import extract_grid_features

    logger.info("building grid ROI features for %d images", len(all_ids))
    extract_grid_features(all_ids, cfg.img_fmt, cache,
                          tiny=(args.arch != "base"))
    return cache
