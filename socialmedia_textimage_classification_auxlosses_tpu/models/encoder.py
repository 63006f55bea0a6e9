"""Shared transformer encoder core.

One stack covers every tower in the framework: BERT/BERTweet (post-LN,
learned absolute positions, token types), RoBERTa/Bernice (post-LN, padded
position offset), ViT/DEiT (pre-LN over patches), ViLT (pre-LN over the
joint text+patch sequence) and the LXMERT language/vision/cross blocks.

TPU notes:
  * attention runs through ``ops.attention.sdpa`` — the fused Pallas kernel
    on TPU, a jnp reference path elsewhere;
  * activations are computed in ``cfg.dtype`` (bfloat16 on TPU) with float32
    parameters and float32 layer-norm statistics;
  * the layer loop optionally rematerialises (``cfg.remat``) to trade HBM for
    FLOPs at larger batch sizes.

Parameter naming follows a flat query/key/value/out + mlp_in/mlp_out scheme;
``models/hf_import.py`` maps Hugging Face checkpoints onto it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import sdpa


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    dropout: float = 0.1
    ln_eps: float = 1e-12
    # position-id construction: RoBERTa-family offsets past pad_token_id.
    pos_offset: int = 0
    pad_token_id: int = 0
    hidden_act: str = "gelu"  # exact (erf) gelu, matching BERT/ViT
    ln_style: str = "post"  # "post" (BERT) or "pre" (ViT)
    dtype: str = "float32"
    attn_impl: str = "auto"
    remat: bool = False
    # lax.scan over layers: one traced layer instead of an unrolled stack —
    # ~L-times smaller HLO (faster compiles) and the layout pipeline
    # parallelism needs (SURVEY.md section 2.3). Param layout gains a leading
    # layer axis, so HF weight import targets the unscanned layout.
    scan_layers: bool = False
    # Pipeline parallelism hook: a callable
    # ``(stacked_layer_params, x, key_mask, rng) -> hidden`` (built by
    # ``parallel.pp_text.make_stack_runner`` — GPipe shard_map over a `pipe`
    # mesh axis). When set (requires scan_layers), TransformerStack routes
    # the layer stack through it at apply time; init still runs nn.scan so
    # the param tree is identical to the non-PP layout.
    pp_runner: object = None

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    def activation(self, x):
        if self.hidden_act == "gelu":
            return jax.nn.gelu(x, approximate=False)
        if self.hidden_act == "gelu_new":
            return jax.nn.gelu(x, approximate=True)
        if self.hidden_act == "relu":
            return jax.nn.relu(x)
        raise ValueError(self.hidden_act)

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


class DenseParams(nn.Module):
    """Kernel+bias with nn.Dense's exact param paths, shapes and inits —
    lets the fused attention path read raw weights while staying
    checkpoint/HF-import compatible with the nn.Dense layout."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class Attention(nn.Module):
    """Multi-head attention over separate query/key-value streams.

    Covers self-attention (q_input is kv_input) and cross-attention
    (LXMERT cross-modal; fusion head) with a key-padding mask.

    ``cfg.attn_impl``:
      * "auto" / "jnp" / "pallas*" — separate projections + ops.attention.sdpa
        (the SDPA-only kernel or the XLA path);
      * "fused" / "fused_interpret" — the whole block (QKV + SDPA + out-proj)
        runs as ONE Pallas kernel for self-attention (ops/attn_block.py);
        cross-attention keeps the sdpa path.
    Both branches share one param tree (DenseParams == nn.Dense layout).
    """

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, q_input, kv_input, key_mask=None, deterministic=True,
                 dropout_rng=None):
        cfg = self.cfg
        dt = cfg.jdtype
        b, lq, _ = q_input.shape
        h = cfg.hidden
        params = {
            name: DenseParams(h, h, name=name)()
            for name in ("query", "key", "value", "out")
        }

        fused = (cfg.attn_impl in ("fused", "fused_interpret")
                 and q_input is kv_input)
        if fused:
            from ..ops.attn_block import attn_block

            (wq, bq), (wk, bk) = params["query"], params["key"]
            (wv, bv), (wo, bo) = params["value"], params["out"]
            out = attn_block(
                q_input.astype(dt), key_mask,
                wq.astype(dt), bq.astype(dt), wk.astype(dt), bk.astype(dt),
                wv.astype(dt), bv.astype(dt), wo.astype(dt), bo.astype(dt),
                heads=cfg.heads,
                impl="fused_interpret" if cfg.attn_impl == "fused_interpret"
                else "fused",
            )
            return _dropout(out, cfg.dropout, deterministic, dropout_rng)

        def dense(name, x):
            kernel, bias = params[name]
            return jnp.dot(x.astype(dt), kernel.astype(dt)) + bias.astype(dt)

        def split(x):
            return x.reshape(b, -1, cfg.heads, cfg.head_dim).transpose(0, 2, 1, 3)

        q = split(dense("query", q_input))
        k = split(dense("key", kv_input))
        v = split(dense("value", kv_input))
        sdpa_impl = ("jnp" if cfg.attn_impl in ("fused", "fused_interpret")
                     else cfg.attn_impl)
        ctx = sdpa(q, k, v, key_mask=key_mask, impl=sdpa_impl)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, lq, cfg.hidden)
        out = dense("out", ctx)
        return _dropout(out, cfg.dropout, deterministic, dropout_rng)


class Mlp(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, deterministic=True, dropout_rng=None):
        cfg = self.cfg
        h = nn.Dense(cfg.mlp_dim, dtype=cfg.jdtype, name="mlp_in")(x)
        h = cfg.activation(h)
        h = nn.Dense(cfg.hidden, dtype=cfg.jdtype, name="mlp_out")(h)
        return _dropout(h, cfg.dropout, deterministic, dropout_rng)


class EncoderLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic=True, site_rngs=None):
        """``site_rngs`` (pipeline-parallel path): explicit per-site dropout
        keys {"attention": key, "mlp": key} overriding ``make_rng`` — the
        PP runner computes them OUTSIDE (encoder.scan_exact_dropout_site_keys)
        so ``--mesh_pipe`` draws bit-identical masks to the nn.scan stack."""
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name=name)
        attn = Attention(cfg, name="attention")
        mlp = Mlp(cfg, name="mlp")
        r = site_rngs or {}
        if cfg.ln_style == "post":  # BERT family
            x = ln("ln_attn")(x + attn(x, x, key_mask, deterministic,
                                       dropout_rng=r.get("attention")))
            x = ln("ln_mlp")(x + mlp(x, deterministic,
                                     dropout_rng=r.get("mlp")))
        else:  # pre-LN, ViT family
            h = ln("ln_attn")(x)
            x = x + attn(h, h, key_mask, deterministic,
                         dropout_rng=r.get("attention"))
            x = x + mlp(ln("ln_mlp")(x), deterministic,
                        dropout_rng=r.get("mlp"))
        return x


class _ScanBody(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, key_mask, deterministic):
        layer_cls = EncoderLayer
        if self.cfg.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
        x = layer_cls(self.cfg, name="layer")(x, key_mask, deterministic)
        return x, None


# The dropout call sites inside one scanned layer, as
# (site name, module path under the scan body, call slot within the body,
#  make_rng calls per body at that path). Used by
# scan_exact_dropout_site_keys to reproduce the
# nn.scan(split_rngs={"dropout": True}) stream for the pipeline-parallel
# runner.
SCAN_DROPOUT_SITES = (
    ("attention", ("layer", "attention", "Dropout_0"), 1, 1),
    ("mlp", ("layer", "mlp", "Dropout_0"), 1, 1),
)

# LXMERT cross-modality scan body (models/lxmert.py::CrossModalityLayer
# under _MaskedXScanBody): the shared cross_attention module fires twice
# per iteration (lang->vis then vis->lang), so its counter advances by 2.
LXMERT_CROSS_DROPOUT_SITES = (
    ("cross_lang", ("layer", "cross_attention", "Dropout_0"), 1, 2),
    ("cross_vis", ("layer", "cross_attention", "Dropout_0"), 2, 2),
    ("lang_self", ("layer", "lang_self", "Dropout_0"), 1, 1),
    ("vis_self", ("layer", "vis_self", "Dropout_0"), 1, 1),
    ("lang_mlp", ("layer", "lang_mlp", "Dropout_0"), 1, 1),
    ("vis_mlp", ("layer", "vis_mlp", "Dropout_0"), 1, 1),
)


def sliced_dropout(x, rate: float, dropout_rng):
    """Rows ``[row0, row0 + x.shape[0])`` of the FULL-batch flax
    ``nn.Dropout`` draw — bit-exact by construction (we draw the full mask
    and slice it; threefry/rbg bits do not depend on sharding). The
    pipeline-parallel runner processes microbatches (possibly of a
    data-sharded batch), while the sequential stack draws one mask over the
    whole batch: slicing the same full draw keeps PP training trajectories
    bitwise-identical (tests/test_pp_dropout_exact.py).

    ``dropout_rng``: (site key, row0, total_rows) — row0 may be traced,
    total_rows is static.

    Cost note: each microbatch tick regenerates the FULL (total_rows, ...)
    bernoulli and keeps its slice, so the RNG work is multiplied by
    num_microbatches x data-shards relative to the sequential stack —
    that is the price of bitwise exactness (jax.random cannot emit a
    row-slice of a draw without computing it). Measured in the PP e2e
    tests this is noise next to the matmuls; if it ever profiles hot,
    precompute the per-layer masks once per step outside the shard_map
    and stream slices in, at (layers, B, T, H) bool memory cost.
    """
    key, row0, nrows = dropout_rng
    keep_prob = 1.0 - rate
    full = jax.random.bernoulli(key, p=keep_prob,
                                shape=(nrows,) + tuple(x.shape[1:]))
    mask = jax.lax.dynamic_slice_in_dim(full, row0, x.shape[0], axis=0)
    return jax.lax.select(mask, x / keep_prob, jnp.zeros_like(x))


def _dropout(x, rate: float, deterministic, dropout_rng):
    """nn.Dropout, or its slice-exact explicit-key equivalent when the PP
    runner supplies ``(key, row0, total_rows)``."""
    if dropout_rng is None:
        return nn.Dropout(rate)(x, deterministic=deterministic)
    if deterministic or rate <= 0.0:
        return x
    return sliced_dropout(x, rate, dropout_rng)


def scan_exact_dropout_site_keys(lazy, suffix_base, layers,
                                 sites=SCAN_DROPOUT_SITES):
    """Per-(layer, site) dropout keys bit-identical to what flax's
    ``nn.scan(split_rngs={"dropout": True})`` hands each iteration's
    ``nn.Dropout`` (verified against flax 0.12 internals and enforced by
    tests/test_pp_dropout_exact.py):

    * the scan lift splits the RAW root key ``split(clone(root), L)`` while
      the LazyRng path suffix is preserved as static metadata — each
      iteration's body sees root_i with the full path suffix intact;
    * ``make_rng`` materialises ``fold_in_static(root_i, suffix + (count,))``
      in ONE hash. The count is a TRACE-TIME Python counter: flax's
      axes_scan traces the scan body once for shapes and once for real, so
      during the real trace the k-th call at a path folds the STATIC count
      ``calls_per_body + k`` — the same for every iteration (per-layer
      distinctness comes from root_i alone). Verified empirically against
      flax 0.12 (text sites fold 2; LXMERT's twice-called cross_attention
      folds 3 then 4).

    Inside one pipeline shard_map trace the layer index is traced (stage =
    ``lax.axis_index``) so nothing static can vary per stage anyway; we
    fold everything here and the PP layer_fn injects the finished keys via
    ``nn.Dropout(rng=...)``.

    ``layers`` must equal the scan LENGTH (for LXMERT's padded stacks, the
    padded length — pad slots also consume splits).
    """
    try:
        from flax.core.scope import LazyRng, _fold_in_static
    except ImportError as e:  # private flax internals (verified on 0.12)
        raise RuntimeError(
            "exact --mesh_pipe dropout keys need flax.core.scope.LazyRng/"
            "_fold_in_static, which this flax version no longer exposes. "
            "Re-derive the scan key stream against the new internals "
            "(models/encoder.py scan_exact_dropout_site_keys; "
            "tests/test_pp_dropout_exact.py certifies the result), or run "
            "--mesh_pipe with dropout=0.") from e

    if not isinstance(lazy, LazyRng):
        lazy = LazyRng.create(lazy)
    roots = jax.random.split(jax.random.clone(lazy.rng), layers)
    base = tuple(lazy.suffix) + tuple(suffix_base)
    return {
        site: jnp.stack([
            _fold_in_static(roots[i], base + path + (cpi + slot,))
            for i in range(layers)
        ])
        for site, path, slot, cpi in sites
    }


class TransformerStack(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic=True):
        if self.cfg.scan_layers:
            if self.cfg.pp_runner is not None and not self.is_initializing():
                stacked = self.variables["params"]["layers"]["layer"]
                rng = None
                if not deterministic and self.cfg.dropout > 0:
                    if "dropout" not in self.scope.rngs:
                        raise ValueError(
                            "dropout>0 with deterministic=False needs a "
                            "'dropout' rng: apply(..., rngs={'dropout': "
                            "key})")
                    # exact nn.scan dropout stream for the PP runner
                    rng = scan_exact_dropout_site_keys(
                        self.scope.rngs["dropout"], ("layers",),
                        self.cfg.layers)
                if key_mask is None:
                    key_mask = jnp.ones(x.shape[:2], jnp.int32)
                return self.cfg.pp_runner(stacked, x, key_mask, rng)
            scan = nn.scan(
                _ScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.cfg.layers,
                in_axes=(nn.broadcast, nn.broadcast),
            )
            x, _ = scan(self.cfg, name="layers")(x, key_mask, deterministic)
            return x
        layer_cls = EncoderLayer
        if self.cfg.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
        for i in range(self.cfg.layers):
            x = layer_cls(self.cfg, name=f"layer_{i}")(x, key_mask, deterministic)
        return x


class Pooler(nn.Module):
    """CLS dense+tanh pooler (BERT/ViT/DEiT convention)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden):
        cls = hidden[:, 0, :]
        return jnp.tanh(nn.Dense(self.cfg.hidden, dtype=self.cfg.jdtype, name="dense")(cls))


class TextEmbeddings(nn.Module):
    """Word + position + (optional) token-type embeddings, LN, dropout."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, ids, token_type_ids=None, attention_mask=None,
                 deterministic=True, word_embeds=None):
        cfg = self.cfg
        if word_embeds is None:
            emb = nn.Embed(cfg.vocab_size, cfg.hidden, dtype=cfg.jdtype,
                           name="word")(ids)
        else:
            # Pre-gathered word embeddings (row-sparse optimizer path,
            # train/lazy_emb.py): the table is never read here, so its dense
            # gradient scatter-add never materialises. ``ids`` still drives
            # the position ids below.
            emb = word_embeds.astype(cfg.jdtype)
        if cfg.pos_offset:
            # RoBERTa-family: positions count non-pad tokens, offset past pad id.
            mask = (ids != cfg.pad_token_id).astype(jnp.int32)
            pos_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
        else:
            pos_ids = jnp.arange(ids.shape[1])[None, :]
        emb = emb + nn.Embed(
            cfg.max_positions, cfg.hidden, dtype=cfg.jdtype, name="position"
        )(pos_ids)
        if cfg.type_vocab:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(ids)
            emb = emb + nn.Embed(
                cfg.type_vocab, cfg.hidden, dtype=cfg.jdtype, name="token_type"
            )(token_type_ids)
        emb = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="ln")(emb)
        return nn.Dropout(cfg.dropout)(emb, deterministic=deterministic)


class BertEncoder(nn.Module):
    """BERT/RoBERTa/Bernice tower: embeddings -> post-LN stack -> pooler.

    Returns (last_hidden, pooled). Covers the reference's three text towers
    (reference text_only.py:27-66) and the dual encoder's text side.
    """

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, ids, attention_mask=None, token_type_ids=None,
                 deterministic=True, word_embeds=None):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(ids)
        x = TextEmbeddings(cfg, name="embeddings")(
            ids, token_type_ids, attention_mask, deterministic,
            word_embeds=word_embeds,
        )
        x = TransformerStack(cfg, name="encoder")(x, attention_mask, deterministic)
        pooled = Pooler(cfg, name="pooler")(x)
        return x, pooled


class PatchEmbeddings(nn.Module):
    """Image -> patch tokens (+CLS, +optional distill token) + pos embeddings."""

    cfg: EncoderConfig
    patch: int = 16
    image_size: int = 224
    channels: int = 3
    num_prefix_tokens: int = 1  # 2 for DEiT (cls + distillation)

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        cfg = self.cfg
        b = pixel_values.shape[0]
        # NCHW input (reference/HF convention) -> NHWC for the conv.
        if pixel_values.shape[1] == self.channels:
            pixel_values = pixel_values.transpose(0, 2, 3, 1)
        x = nn.Conv(
            cfg.hidden,
            kernel_size=(self.patch, self.patch),
            strides=(self.patch, self.patch),
            dtype=cfg.jdtype,
            name="proj",
        )(pixel_values.astype(cfg.jdtype))
        x = x.reshape(b, -1, cfg.hidden)
        prefix = self.param(
            "prefix_tokens",
            nn.initializers.zeros,
            (1, self.num_prefix_tokens, cfg.hidden),
        )
        x = jnp.concatenate([jnp.tile(prefix, (b, 1, 1)).astype(cfg.jdtype), x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, x.shape[1], cfg.hidden),
        )
        x = x + pos.astype(cfg.jdtype)
        return nn.Dropout(cfg.dropout)(x, deterministic=deterministic)


class ViTEncoder(nn.Module):
    """ViT/DEiT tower: patches -> pre-LN stack -> final LN -> CLS pooler.

    ``pooling``: "tanh" (ViT/DEiT pooler), "mean" (BEiT: layer-normed mean of
    patch tokens), or "none".
    """

    cfg: EncoderConfig
    patch: int = 16
    image_size: int = 224
    num_prefix_tokens: int = 1
    pooling: str = "tanh"

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        cfg = self.cfg
        x = PatchEmbeddings(
            cfg,
            patch=self.patch,
            image_size=self.image_size,
            num_prefix_tokens=self.num_prefix_tokens,
            name="embeddings",
        )(pixel_values, deterministic)
        x = TransformerStack(cfg, name="encoder")(x, None, deterministic)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="ln_final")(x)
        if self.pooling == "tanh":
            pooled = Pooler(cfg, name="pooler")(x)
        elif self.pooling == "mean":
            pooled = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="pool_ln")(
                jnp.mean(x[:, self.num_prefix_tokens:, :], axis=1)
            )
        else:
            pooled = x[:, 0, :]
        return x, pooled
