"""Model-family builders: model + params (+imported weights) + compiled steps
+ pipelines, shared by the CLI runners and the benchmark/entry harnesses.

Each builder returns a ``Setup`` with everything a run needs; the runners
stay thin (argument plumbing + artifact names), mirroring how the reference's
trainer wrapper classes (``TextModel``/``ImageModel``/``MMLate_Model``) own
tokenizer+model+loader construction (reference text_only.py:72-121,
mm_late.py:303-387).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as C
from ..data.images import normalize_on_device
from ..data.pipeline import PipelineConfig, SplitPipeline, make_image_source
from ..data.prep import prepare_data
from ..data.tokenizers import build_tokenizer
from ..models import hf_import as H
from ..models.fusion import MMCnnModel, MMLateModel, init_mm_late_params
from ..models.text import NO_TOKEN_TYPES, build_text_classifier, text_encoder_config
from ..models.vision import (
    CNN_MODELS, IMAGE_NORM, build_vision_classifier,
    vision_encoder_config, vit_geometry,
)
from ..parallel.mesh import MeshPlan, make_mesh_plan
from ..train.optim import (any_of, batch_stats_predicate,
                           feature_extract_predicate, make_optimizer,
                           vision_frozen_predicate, count_params)
from ..train.steps import (LossConfig, make_eval_many, make_eval_step,
                           make_feature_step, make_train_many,
                           make_train_step)
from ..utils.logging import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass
class Setup:
    model: object
    params: dict
    forward_fn: Callable
    loss_cfg: LossConfig
    tx: object
    opt_state: object
    train_step: Callable
    eval_step: Callable
    feature_step: Callable
    tokenizer: object
    mesh_plan: Optional[MeshPlan]
    class_weights: Optional[jnp.ndarray]
    pipes: Dict[str, SplitPipeline]
    image_norm: Optional[tuple] = None
    train_many: Optional[Callable] = None
    eval_many: Optional[Callable] = None


def make_mesh(args) -> MeshPlan:
    return make_mesh_plan(data=getattr(args, "mesh_data", None),
                          model=getattr(args, "mesh_model", 1))


@dataclasses.dataclass
class _PP:
    mesh: object
    num_micro: int
    num_levels: int = 1


def _maybe_pp(args, cfg, overrides, stack_pred=None):
    """(mesh_plan, pp-or-None) for --mesh_pipe: a (data, pipe) mesh whose
    pipe axis carries the scanned layer stack (parallel/pp_text.py)."""
    mesh_pipe = int(getattr(args, "mesh_pipe", 1) or 1)
    if mesh_pipe <= 1:
        return make_mesh(args), None
    from ..parallel.pipeline import make_pp_mesh
    from ..parallel.pp_text import PipeMeshPlan

    if not overrides.get("scan_layers"):
        raise SystemExit("--mesh_pipe requires --scan_layers")
    if (jax.process_count() > 1
            and jax.local_device_count() % mesh_pipe):
        # fail at the CLI surface, not mid-epoch: stage hops must ride ICI,
        # so each host needs whole pipelines (PipeMeshPlan hooks)
        raise SystemExit(
            f"--mesh_pipe {mesh_pipe} does not divide this host's "
            f"{jax.local_device_count()} local devices; multi-host PP "
            "requires whole pipelines per host")
    n_dev = len(jax.devices())
    pp_mesh = make_pp_mesh(pipe=mesh_pipe, data=max(1, n_dev // mesh_pipe))
    # microbatches split each data shard's LOCAL rows
    local_rows = max(1, cfg.batch_size // pp_mesh.shape["data"])
    num_micro = (int(getattr(args, "pp_microbatches", 0) or 0)
                 or min(4, local_rows))
    num_levels = int(getattr(args, "pp_interleave", 1) or 1)
    if num_levels > 1 and num_micro < mesh_pipe:
        raise SystemExit(
            f"--pp_interleave needs microbatches >= stages "
            f"({num_micro} < {mesh_pipe}); raise --pp_microbatches")
    # dropout>0 under --mesh_pipe draws bit-identical masks to the
    # sequential nn.scan stack: the runner receives precomputed per-layer
    # per-site keys reproducing the flax scan split/counter stream
    # (encoder.scan_exact_dropout_site_keys; tests/test_pp_dropout_exact.py)
    logger.info("pipeline parallelism: pipe=%d data=%d microbatches=%d "
                "interleave=%d",
                mesh_pipe, pp_mesh.shape["data"], num_micro, num_levels)
    return (PipeMeshPlan(pp_mesh, stack_pred=stack_pred),
            _PP(pp_mesh, num_micro, num_levels))


def _loss_cfg_from(cfg: C.Config) -> LossConfig:
    return LossConfig(
        num_labels=cfg.num_labels,
        multilabel=cfg.multilabel,
        use_clip_loss=cfg.use_clip_loss,
        use_tim_loss=cfg.use_tim_loss,
        use_iadds_loss=cfg.use_iadds_loss,
        use_loss_correction=cfg.use_loss_correction,
        beta_itc=cfg.beta_itc,
        beta_itm=cfg.beta_itm,
        beta_iadds=cfg.beta_iadds,
        T=tuple(map(tuple, C.T)),
    )


def _finish(setup_kwargs, args, cfg, frozen_pred=None):
    """Optimizer, steps, sharding."""
    loss_cfg = setup_kwargs["loss_cfg"]
    params = setup_kwargs["params"]

    lazy_cfg = None
    if getattr(args, "opt_impl", "exact") == "lazy_emb":
        from ..train.lazy_emb import (LazyEmbConfig, find_word_embedding_path,
                                      init_lazy_state, lazy_emb_predicate)

        path = find_word_embedding_path(params)
        if path is None:
            logger.warning("--opt_impl lazy_emb: no unique word-embedding "
                           "leaf in this model; using exact AdamW")
        else:
            lazy_cfg = LazyEmbConfig(path=path, lr=cfg.lr,
                                     weight_decay=cfg.weight_decay)
            frozen_pred = (any_of(frozen_pred, lazy_emb_predicate(lazy_cfg))
                           if frozen_pred else lazy_emb_predicate(lazy_cfg))
            logger.info("lazy embedding AdamW on %s", "/".join(path))

    mu_dtype = ("bfloat16" if getattr(args, "opt_moments", "f32") == "bf16"
                else None)
    tx = make_optimizer(cfg.lr, cfg.weight_decay, frozen_pred,
                        mu_dtype=mu_dtype,
                        fused=getattr(args, "opt_kernel", "fused") == "fused")
    mesh_plan = setup_kwargs["mesh_plan"]
    if mesh_plan is not None:
        params = mesh_plan.shard_params(params)
    opt_state = tx.init(params)
    if lazy_cfg is not None:
        opt_state = {"tx": opt_state,
                     "lazy_emb": init_lazy_state(params, lazy_cfg)}
    cw = setup_kwargs["class_weights"]
    fwd = setup_kwargs["forward_fn"]
    setup_kwargs.update(
        params=params,
        tx=tx,
        opt_state=opt_state,
        train_step=make_train_step(fwd, loss_cfg, tx, class_weights=cw,
                                   lazy_emb_cfg=lazy_cfg),
        train_many=make_train_many(fwd, loss_cfg, tx, class_weights=cw,
                                   lazy_emb_cfg=lazy_cfg),
        eval_many=make_eval_many(fwd, loss_cfg, class_weights=cw),
        eval_step=make_eval_step(fwd, loss_cfg, class_weights=cw),
        feature_step=make_feature_step(fwd),
    )
    logger.info("model parameters %d (trainable %d)",
                count_params(params),
                count_params(params, trainable_only=True,
                             frozen_predicate=frozen_pred or (lambda *_: False)))
    return Setup(**setup_kwargs)


def _make_pipes(cfg, splits, tokenizer, image_source_fn=None, pipe_cfg=None,
                roi_cache=None):
    pipes = {}
    for name, split in splits.items():
        img_src = image_source_fn(split) if image_source_fn else None
        pipes[name] = SplitPipeline(split, pipe_cfg, tokenizer=tokenizer,
                                    image_source=img_src, roi_cache=roi_cache)
    return pipes


class VisionCachedPipe:
    """Wraps a SplitPipeline, replacing per-step vision-tower recomputation
    with a per-image activation cache.

    The dual encoder's vision tower is FROZEN (reference mm_late.py:67-69),
    so its activations per image are constant for the whole run — yet the
    reference recomputes them every epoch and again for the TIM pass
    (mm_late.py:149-175). Here the first touch of an image runs a
    vision-only jit and memoises (hidden, pooled) host-side in bf16; every
    later epoch feeds the cached activations and the train step contains no
    vision tower at all.
    """

    def __init__(self, inner: SplitPipeline, vision_fn, params):
        self.inner = inner
        self.cfg = inner.cfg
        self.vision_fn = vision_fn
        self.params = params
        self._cache: Dict[str, tuple] = {}
        self.compute_calls = 0  # test/observability hook

    def __len__(self):
        return len(self.inner)

    @property
    def num_batches(self):
        return self.inner.num_batches

    def _features(self, batch):
        ids = [str(i) for i in np.asarray(batch["data_id"])]
        if any(i not in self._cache for i in ids):
            hidden, pooled = self.vision_fn(self.params, batch["pixel_values"])
            hidden = np.asarray(hidden)  # ml_dtypes bf16 stays 2 bytes
            pooled = np.asarray(pooled)
            self.compute_calls += 1
            for row, i in enumerate(ids):
                self._cache[i] = (hidden[row], pooled[row])
        return (np.stack([self._cache[i][0] for i in ids]),
                np.stack([self._cache[i][1] for i in ids]))

    def _with_features(self, batch):
        hidden, pooled = self._features(batch)
        batch["vision_hidden"] = hidden
        batch["vision_pooled"] = pooled
        del batch["pixel_values"]  # the step never touches pixels
        return batch

    def device_iter(self, shuffle=False, rng=None, mesh_plan=None):
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
        pending = None
        for batch in self.inner.batches(shuffle=shuffle, rng=rng,
                                        local_rows=local_rows):
            batch = self._with_features(batch)
            if multi_host:
                nxt = put(batch)  # pods: global id column assembly
            else:
                # data_id stays host-side (int64; see data/pipeline.py)
                host = {k: batch.pop(k) for k in ("data_id",) if k in batch}
                nxt = dict(put(batch))
                nxt.update(host)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    def device_iter_chunks(self, chunk_steps, shuffle=False, rng=None,
                           mesh_plan=None):
        """Chunked (K, B, ...) dispatch with cached vision activations —
        mirrors SplitPipeline.device_iter_chunks (padded tail carries
        step_valid=0; pods stack local rows and assemble the global chunk
        via process_batch_stacked)."""
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

        def emit(chunk):
            k = len(chunk)
            step_valid = np.ones(chunk_steps, np.float32)
            if k < chunk_steps:
                chunk = chunk + [chunk[-1]] * (chunk_steps - k)
                step_valid[k:] = 0.0
            lmaxes = [b.pop("_max_len") for b in chunk if "_max_len" in b]
            out = {key: np.stack([b[key] for b in chunk])
                   for key in chunk[0]}
            out["step_valid"] = step_valid
            if lmaxes:  # chunk-level sequence bucketing (global maxima)
                out = self.inner.bucket_slice(
                    out, self.inner._bucket_for(max(lmaxes),
                                                out["mask"].shape[-1]))
            if multi_host:
                return dict(put(out)), k
            host = {key: out.pop(key) for key in ("data_id",) if key in out}
            dev = dict(put(out))
            dev.update(host)
            return dev, k

        # bucket-grouped dispatch (cfg.bucket_group): same pure-width chunk
        # flushing as SplitPipeline.device_iter_chunks
        inner = self.inner
        grouped = bool(inner.cfg.bucket_group and inner.cfg.seq_buckets
                       and inner.mask is not None and shuffle)
        order = inner._grouped_order(shuffle, rng) if grouped else None
        full_width = inner.mask.shape[-1] if inner.mask is not None else None

        def width_of(b):
            return (inner._bucket_for(b["_max_len"], full_width) or full_width
                    if grouped and "_max_len" in b else None)

        pending = None
        chunk: list = []
        cur_w = None
        for batch in inner.batches(shuffle=shuffle and order is None, rng=rng,
                                   bucket=False, local_rows=local_rows,
                                   order=order):
            w = width_of(batch)
            if chunk and grouped and w != cur_w:
                nxt = emit(chunk)
                chunk = []
                if pending is not None:
                    yield pending
                pending = nxt
            cur_w = w
            chunk.append(self._with_features(batch))
            if len(chunk) == chunk_steps:
                nxt = emit(chunk)
                chunk = []
                if pending is not None:
                    yield pending
                pending = nxt
        if chunk:
            nxt = emit(chunk)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending


def enable_vision_cache(setup: Setup):
    """Swap the mm-late pipes for vision-activation-cached ones
    (``--cache_vision``). Call AFTER any checkpoint import so the cache
    computes from the final (frozen) vision weights. Holds an undonated
    device copy of the vision subtree (~0.3 GB at ViT-base) — the train
    step's donated buffers must not be aliased by the cache's jit."""
    from ..models.fusion import MMLateModel

    mean, std = setup.image_norm
    model = setup.model
    dtype = model.text_cfg.jdtype
    dual = setup.params["params"]["dual"]
    # vision subtree + logit_scale (DualEncoder.setup materialises that
    # param eagerly); undonated copies so train-step buffer donation can't
    # invalidate the cache's inputs
    vparams = {"params": {"dual": jax.tree_util.tree_map(
        jnp.array, {"vision": dual["vision"],
                    "logit_scale": dual["logit_scale"]})}}

    @jax.jit
    def vision_fn(p, pixels_u8):
        px = normalize_on_device(pixels_u8, mean, std, dtype)
        return model.apply(p, px, deterministic=True,
                           method=MMLateModel.encode_vision)

    setup.pipes = {k: VisionCachedPipe(v, vision_fn, vparams)
                   for k, v in setup.pipes.items()}
    logger.info("vision-activation cache enabled (frozen tower)")
    return setup


# ---------------------------------------------------------------------------
# Text-only (reference run_txt.py / text_only.py)
# ---------------------------------------------------------------------------


def build_text_setup(args, cfg: C.Config, data_splits=None, freeze=False) -> Setup:
    from ._common import arch_overrides, seq_buckets_from

    model_name = args.model_name
    model_dir = C.MODEL_DIR_DICT.get(model_name)
    overrides = arch_overrides(args)
    overrides["scan_layers"] = getattr(args, "scan_layers", False)
    enc_cfg = text_encoder_config(
        model_name, model_dir, dtype=args.dtype, attn_impl=args.attn_impl,
        remat=getattr(args, "remat", False), **overrides,
    )
    model = build_text_classifier(
        model_name, cfg.num_labels, model_dir, dropout=cfg.dropout,
        dtype=args.dtype, attn_impl=args.attn_impl,
        remat=getattr(args, "remat", False), **overrides,
    )
    tokenizer = build_tokenizer(model_name, model_dir, cfg.max_length,
                                enc_cfg.vocab_size)

    if data_splits is None:
        rng = np.random.RandomState(args.seed)
        train, val, test, weights = prepare_data(
            cfg.data, cfg.num_labels, testing=args.testing,
            task_name=cfg.task_name, rng=rng,
        )
        data_splits = {"train": train, "val": val, "test": test}
    else:
        weights = data_splits.pop("_weights", None)

    use_tt = model_name not in NO_TOKEN_TYPES
    ids0 = jnp.zeros((2, cfg.max_length), jnp.int32)
    params = model.init(jax.random.PRNGKey(args.seed), ids0, ids0,
                        ids0 if use_tt else None)
    params = H.maybe_import_text_tower(params, model_dir, enc_cfg.layers,
                                       path=("params", "tower"),
                                       scan=overrides["scan_layers"])

    def forward_fn(p, batch, tim_inputs, dropout_rng, deterministic,
                   word_embeds=None, tim_word_embeds=None):
        rngs = None if deterministic else {"dropout": dropout_rng}
        logits = model.apply(
            p, batch["ids"], batch["mask"], batch.get("token_type_ids"),
            deterministic=deterministic, rngs=rngs, word_embeds=word_embeds,
        )
        return {"out_cls": logits}

    mesh_plan, pp = _maybe_pp(args, cfg, overrides)
    if pp is not None:
        # Pipeline-parallel tower: the encoder routes its scanned layer
        # stack through the GPipe runner (EncoderConfig.pp_runner);
        # embeddings/pooler/head and every other flow are untouched.
        from ..parallel.pp_text import with_pp_runner
        from ..models.text import TextClassifier

        model = TextClassifier(
            with_pp_runner(model.cfg, pp.mesh, pp.num_micro, pp.num_levels),
            model.num_labels, head_dropout=model.head_dropout,
            use_pooled=model.use_pooled,
        )

    frozen = (lambda path, x: "tower" in [str(getattr(q, "key", q)) for q in path]) \
        if freeze else None

    pipe_cfg = PipelineConfig(batch_size=cfg.batch_size, max_length=cfg.max_length,
                              with_images=False,
                              seq_buckets=seq_buckets_from(args),
                              bucket_group=getattr(args, "bucket_group", False))
    pipes = _make_pipes(cfg, data_splits, tokenizer, pipe_cfg=pipe_cfg)
    return _finish(
        dict(model=model, params=params, forward_fn=forward_fn,
             loss_cfg=_loss_cfg_from(cfg),
             class_weights=None if weights is None else jnp.asarray(weights),
             tokenizer=tokenizer, mesh_plan=mesh_plan, pipes=pipes),
        args, cfg, frozen_pred=frozen,
    )


# ---------------------------------------------------------------------------
# Image-only (reference run_img.py / image_only.py)
# ---------------------------------------------------------------------------


def build_image_setup(args, cfg: C.Config, data_splits=None) -> Setup:
    from ._common import arch_overrides, seq_buckets_from

    model_name = args.model_name
    model_dir = C.MODEL_DIR_DICT.get(model_name)
    overrides = arch_overrides(args)
    overrides["scan_layers"] = getattr(args, "scan_layers", False)
    is_cnn = model_name in CNN_MODELS

    if is_cnn:
        from ..models.resnet import build_resnet_classifier

        model = build_resnet_classifier(model_name, cfg.num_labels,
                                        dtype=args.dtype,
                                        conv_att=getattr(args, "conv_att", False))
        image_size = getattr(args, "image_size", None) or 224
        norm = IMAGE_NORM["imagenet"]
        center_crop_from = None  # to_tensor_and_normalize resizes directly
    else:
        model = build_vision_classifier(
            model_name, cfg.num_labels, model_dir, dtype=args.dtype,
            attn_impl=args.attn_impl, remat=getattr(args, "remat", False),
            **overrides,
        )
        image_size = vit_geometry(model_name, model_dir)["image_size"]
        norm = IMAGE_NORM[model_name]
        center_crop_from = None
    img_mesh_plan, pp = _maybe_pp(args, cfg, overrides)
    if pp is not None:
        # Pipeline-parallel image tower (ViT/DEiT stacks; BEiT keeps its
        # explicit per-layer rel-pos loop and the CNNs have no stack)
        if is_cnn or model_name == "beit":
            raise SystemExit("--mesh_pipe supports vit/deit towers here")
        from ..parallel.pp_text import with_pp_runner

        model = dataclasses.replace(
            model, cfg=with_pp_runner(model.cfg, pp.mesh, pp.num_micro, pp.num_levels))

    if data_splits is None:
        rng = np.random.RandomState(args.seed)
        train, val, test, weights = prepare_data(
            cfg.data, cfg.num_labels, testing=args.testing,
            task_name=cfg.task_name, rng=rng,
        )
        data_splits = {"train": train, "val": val, "test": test}
    else:
        weights = data_splits.pop("_weights", None)

    px0 = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
    frozen = batch_stats_predicate  # BN stats never decay
    if is_cnn:
        params = model.init(jax.random.PRNGKey(args.seed), px0, train=False)
        params = H.maybe_import_resnet(params, model_dir, model_name)
        if getattr(args, "feature_extract", False):
            frozen = any_of(batch_stats_predicate, feature_extract_predicate)
    else:
        params = model.init(jax.random.PRNGKey(args.seed), px0)
        geo = vit_geometry(model_name, model_dir)
        enc_cfg = vision_encoder_config(model_name, model_dir, dtype=args.dtype,
                                        **overrides)
        if model_name == "beit":
            # BeitEncoder has no scan layout (explicit layer_{i} loop)
            params = H.maybe_import_beit_tower(params, model_dir,
                                               enc_cfg.layers,
                                               path=("params", "tower"))
        else:
            params = H.maybe_import_vision_tower(
                params, model_dir, enc_cfg.layers,
                distilled=(model_name == "deit"),
                path=("params", "tower"),
                scan=overrides["scan_layers"],
            )

    mean, std = norm
    dtype = jnp.dtype(args.dtype)

    # torch train-mode BN updates running stats during fine-tuning
    # (reference image_only.py:54-88); --feature_extract keeps them frozen
    # (the trunk is excluded from the optimizer anyway).
    train_bn = is_cnn and not getattr(args, "feature_extract", False)

    def forward_fn(p, batch, tim_inputs, dropout_rng, deterministic):
        rngs = None if deterministic else {"dropout": dropout_rng}
        pixels = normalize_on_device(batch["pixel_values"], mean, std, dtype)
        if is_cnn:
            if deterministic or not train_bn:
                return {"out_cls": model.apply(p, pixels, train=False)}
            logits, upd = model.apply(p, pixels, train=True,
                                      mutable=["batch_stats"])
            return {"out_cls": logits, "batch_stats": upd["batch_stats"]}
        logits = model.apply(p, pixels, deterministic=deterministic, rngs=rngs)
        return {"out_cls": logits}

    def image_source_fn(split):
        return make_image_source(
            cfg.img_fmt, ids=split.ids, size=image_size,
            center_crop_from=center_crop_from,
            use_cache=getattr(args, "use_saved_features", False),
            cache_dir=f"{C.DATA_PATH}cache/{cfg.task_name}_u8_{image_size}",
        )

    pipe_cfg = PipelineConfig(batch_size=cfg.batch_size, with_text=False,
                              image_size=image_size)
    pipes = _make_pipes(cfg, data_splits, None, image_source_fn, pipe_cfg)
    return _finish(
        dict(model=model, params=params, forward_fn=forward_fn,
             loss_cfg=_loss_cfg_from(cfg),
             class_weights=None if weights is None else jnp.asarray(weights),
             tokenizer=None, mesh_plan=img_mesh_plan, pipes=pipes,
             image_norm=norm),
        args, cfg, frozen_pred=frozen,
    )


# ---------------------------------------------------------------------------
# MM late fusion (reference run_mm_late.py / mm_late.py)
# ---------------------------------------------------------------------------


def build_mm_late_setup(args, cfg: C.Config, data_splits=None) -> Setup:
    from ._common import arch_overrides, seq_buckets_from

    txt_name, img_name = args.txt_model_name, args.img_model_name
    txt_dir = C.MODEL_DIR_DICT.get(txt_name)
    img_dir = C.MODEL_DIR_DICT.get(img_name)
    overrides = arch_overrides(args)
    overrides["scan_layers"] = getattr(args, "scan_layers", False)
    is_cnn = img_name in CNN_MODELS

    text_cfg = text_encoder_config(
        txt_name, txt_dir, dtype=args.dtype, attn_impl=args.attn_impl,
        remat=getattr(args, "remat", False), **overrides,
    )
    use_tt = txt_name not in NO_TOKEN_TYPES
    tokenizer = build_tokenizer(txt_name, txt_dir, cfg.max_length,
                                text_cfg.vocab_size)

    if is_cnn:
        model = MMCnnModel(text_cfg, img_name, cfg.num_labels,
                           fusion_name=args.fusion_name, dropout=cfg.dropout)
        image_size = getattr(args, "image_size", None) or 224
        norm = IMAGE_NORM["mm_cnn"]
        center_crop_from = 256
        geo = None
    else:
        vis_cfg = vision_encoder_config(
            img_name, img_dir, dtype=args.dtype, attn_impl=args.attn_impl,
            remat=getattr(args, "remat", False), **overrides,
        )
        geo = vit_geometry(img_name, img_dir)
        image_size = geo["image_size"]
        norm = IMAGE_NORM[img_name]
        center_crop_from = None
        model = MMLateModel(
            text_cfg, vis_cfg, cfg.num_labels, fusion_name=args.fusion_name,
            dropout=cfg.dropout, patch=geo["patch"], image_size=image_size,
            num_prefix_tokens=geo["num_prefix_tokens"],
            vision_arch=("beit" if img_name == "beit" else "vit"),
        )

    def _text_stack(keys):
        return "text" in keys and any(
            keys[i:i + 2] == ("layers", "layer") for i in range(len(keys)))

    mm_mesh_plan, pp = _maybe_pp(args, cfg, overrides, stack_pred=_text_stack)
    if pp is not None:
        # Pipeline-parallel TEXT tower of the dual encoder (the frozen
        # vision stack stays replicated/sequential): the encoder config's
        # pp_runner routes the scanned text stack through the GPipe
        # shard_map; all heads / TIM / cache paths are untouched.
        if is_cnn:
            raise SystemExit("--mesh_pipe supports transformer text towers")
        from ..parallel.pp_text import with_pp_runner

        model = MMLateModel(
            with_pp_runner(text_cfg, pp.mesh, pp.num_micro, pp.num_levels), vis_cfg,
            cfg.num_labels, fusion_name=args.fusion_name,
            dropout=cfg.dropout, patch=geo["patch"], image_size=image_size,
            num_prefix_tokens=geo["num_prefix_tokens"],
            vision_arch=("beit" if img_name == "beit" else "vit"),
        )

    if data_splits is None:
        rng = np.random.RandomState(args.seed)
        train, val, test, weights = prepare_data(
            cfg.data, cfg.num_labels, testing=args.testing,
            nsamples=getattr(args, "nsamples", -1),
            load_image_adds=cfg.use_iadds_loss, multilabel=cfg.multilabel,
            task_name=cfg.task_name, rng=rng,
        )
        data_splits = {"train": train, "val": val, "test": test}
    else:
        weights = data_splits.pop("_weights", None)

    ids0 = jnp.zeros((2, cfg.max_length), jnp.int32)
    px0 = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
    tt0 = ids0 if use_tt else None
    if is_cnn:
        params = model.init(jax.random.PRNGKey(args.seed), ids0, ids0, px0, tt0)
        params = H.maybe_import_text_tower(params, txt_dir, text_cfg.layers,
                                           path=("params", "text"))
        params = H.maybe_import_resnet(params, img_dir, img_name,
                                       path=("params", "cnn"))
        frozen = batch_stats_predicate
    else:
        params = init_mm_late_params(model, jax.random.PRNGKey(args.seed),
                                     ids0, ids0, px0, tt0)
        params = H.maybe_import_text_tower(params, txt_dir, text_cfg.layers,
                                           path=("params", "dual", "text"),
                                           scan=overrides["scan_layers"])
        if img_name == "beit":
            # BeitEncoder has no scan layout (explicit layer_{i} loop)
            params = H.maybe_import_beit_tower(
                params, img_dir, vis_cfg.layers,
                path=("params", "dual", "vision"))
        else:
            params = H.maybe_import_vision_tower(
                params, img_dir, vis_cfg.layers,
                distilled=(img_name == "deit"),
                path=("params", "dual", "vision"),
                scan=overrides["scan_layers"],
            )
        frozen = vision_frozen_predicate  # reference mm_late.py:67-69

    mean, std = norm
    dtype = jnp.dtype(args.dtype)

    def forward_fn(p, batch, tim_inputs, dropout_rng, deterministic,
                   word_embeds=None, tim_word_embeds=None):
        rngs = None if deterministic else {"dropout": dropout_rng}
        # under --cache_vision the batch carries precomputed vision
        # activations instead of pixels
        pixels = (normalize_on_device(batch["pixel_values"], mean, std, dtype)
                  if "pixel_values" in batch else None)
        if is_cnn:
            if deterministic:
                return model.apply(p, batch["ids"], batch["mask"], pixels,
                                   batch.get("token_type_ids"),
                                   deterministic=True)
            out, upd = model.apply(p, batch["ids"], batch["mask"], pixels,
                                   batch.get("token_type_ids"),
                                   deterministic=False, rngs=rngs, train=True,
                                   mutable=["batch_stats"],
                                   word_embeds=word_embeds)
            out["batch_stats"] = upd["batch_stats"]
            return out
        tim_kw = {}
        if tim_inputs is not None:
            # deterministic (eval) mode: activation reuse is EXACTLY the
            # re-encoding path (tests/test_tim_reuse.py), so it is always on
            # there; during training it is the opt-in --tim_reuse_text
            if deterministic or getattr(args, "tim_reuse_text", False):
                tim_kw = {"tim_src": tim_inputs["src"]}
            else:
                tim_kw = {"tim_ids": tim_inputs["ids"],
                          "tim_mask": tim_inputs["mask"],
                          "tim_token_type_ids": tim_inputs["token_type_ids"],
                          "tim_word_embeds": tim_word_embeds}
        return model.apply(
            p, batch["ids"], batch["mask"], pixels, batch.get("token_type_ids"),
            iadds_task=cfg.use_iadds_loss,
            deterministic=deterministic, rngs=rngs,
            word_embeds=word_embeds,
            vision_hidden=batch.get("vision_hidden"),
            vision_pooled=batch.get("vision_pooled"),
            **tim_kw,
        )

    def image_source_fn(split):
        return make_image_source(
            cfg.img_fmt, ids=split.ids, size=image_size,
            center_crop_from=center_crop_from,
            use_cache=getattr(args, "use_saved_features", False),
            cache_dir=f"{C.DATA_PATH}cache/{cfg.task_name}_u8_{image_size}",
        )

    pipe_cfg = PipelineConfig(batch_size=cfg.batch_size, max_length=cfg.max_length,
                              image_size=image_size,
                              seq_buckets=seq_buckets_from(args),
                              bucket_group=getattr(args, "bucket_group", False))
    pipes = _make_pipes(cfg, data_splits, tokenizer, image_source_fn, pipe_cfg)
    return _finish(
        dict(model=model, params=params, forward_fn=forward_fn,
             loss_cfg=_loss_cfg_from(cfg),
             class_weights=None if weights is None else jnp.asarray(weights),
             tokenizer=tokenizer, mesh_plan=mm_mesh_plan, pipes=pipes,
             image_norm=norm),
        args, cfg, frozen_pred=frozen,
    )
