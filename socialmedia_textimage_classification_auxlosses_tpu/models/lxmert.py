"""LXMERT-style cross-modal encoder over precomputed ROI features
(reference ``mm_early.py:105-172``; HF LxmertModel topology).

Language branch (self-attention layers) + vision branch (ROI feature + box
position embeddings, self-attention layers) + cross-modality layers where
each modality cross-attends the other — the cross-modal attention over the
~36 object features is the kernel the north star asks for in Pallas; it runs
through ``ops.attention.sdpa`` like every other attention in the framework.

Head stack per the reference ``Lxmert`` class: crossmodal rep = first
language token -> linear_fusion -> ReLU -> dropout -> cls head
(mm_early.py:132-136); ITC embeddings = masked max-pool over language tokens
and max-pool over vision outputs (mm_early.py:138-143); learnable logit_scale
(init 2.6592); TIM second pass over swapped text (mm_early.py:146-160).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoder import Attention, EncoderConfig, EncoderLayer, Mlp


def pad_layers(n: int, stages: int) -> int:
    """Scan length for ``n`` layers over ``stages`` pipeline stages: padded
    up to a multiple so the stacked layer axis shards evenly; pad layers are
    identity (masked in the scan body / runner)."""
    return -(-n // max(1, stages)) * max(1, stages)


@dataclasses.dataclass(frozen=True)
class LxmertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    heads: int = 12
    mlp_dim: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    l_layers: int = 9
    r_layers: int = 5
    x_layers: int = 5
    visual_feat_dim: int = 2048
    visual_pos_dim: int = 4
    dropout: float = 0.1
    ln_eps: float = 1e-12
    dtype: str = "float32"
    attn_impl: str = "auto"
    # lax.scan over each of the three stacks (lang/vis/cross) — the layout
    # pipeline parallelism needs. LXMERT's 9/5/5 depths rarely divide the
    # stage count, so each stack's scan length pads to a multiple of
    # ``pipe_stages`` with identity pad layers (zero params, output masked).
    scan_layers: bool = False
    pipe_stages: int = 1
    # Pipeline hooks (requires scan_layers): dict with "lang"/"vis" runners
    # ``(stacked, x, key_mask, rng) -> hidden`` and an "x" runner
    # ``(stacked, lang, vis, lang_mask, vis_mask, rng) -> (lang, vis)``
    # (parallel/pp_lxmert.py). Init still runs nn.scan so the param layout
    # is identical with or without the runners.
    pp_runners: object = None

    def encoder_cfg(self, layers: int) -> EncoderConfig:
        return EncoderConfig(
            vocab_size=self.vocab_size, hidden=self.hidden, layers=layers,
            heads=self.heads, mlp_dim=self.mlp_dim,
            max_positions=self.max_positions, type_vocab=self.type_vocab,
            dropout=self.dropout, ln_eps=self.ln_eps, ln_style="post",
            dtype=self.dtype, attn_impl=self.attn_impl,
        )


class CrossModalityLayer(nn.Module):
    """One LXMERT x-layer: bidirectional cross-attention, then per-modality
    self-attention and FFN (post-LN residuals throughout)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, lang, vis, lang_mask, vis_mask, deterministic=True,
                 site_rngs=None):
        """``site_rngs`` (pipeline-parallel path): explicit per-site dropout
        keys overriding ``make_rng`` (see encoder.EncoderLayer.site_rngs);
        the shared cross_attention module is called twice per layer, so it
        takes two keys ("cross_lang"/"cross_vis")."""
        cfg = self.cfg
        r = site_rngs or {}
        ln = lambda name: nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name=name)
        cross = Attention(cfg, name="cross_attention")
        # bidirectional cross-attention with shared weights, INCLUDING the
        # output LayerNorm (LXMERT applies one BertAttOutput both ways)
        ln_cross = ln("ln_cross")
        lang2 = ln_cross(lang + cross(lang, vis, vis_mask, deterministic,
                                      dropout_rng=r.get("cross_lang")))
        vis2 = ln_cross(vis + cross(vis, lang, lang_mask, deterministic,
                                    dropout_rng=r.get("cross_vis")))
        # modality-private self-attention
        lang_self = Attention(cfg, name="lang_self")
        vis_self = Attention(cfg, name="vis_self")
        lang3 = ln("ln_self_l")(lang2 + lang_self(
            lang2, lang2, lang_mask, deterministic,
            dropout_rng=r.get("lang_self")))
        vis3 = ln("ln_self_v")(vis2 + vis_self(
            vis2, vis2, vis_mask, deterministic,
            dropout_rng=r.get("vis_self")))
        # FFNs
        lang4 = ln("ln_mlp_l")(lang3 + Mlp(cfg, name="lang_mlp")(
            lang3, deterministic, dropout_rng=r.get("lang_mlp")))
        vis4 = ln("ln_mlp_v")(vis3 + Mlp(cfg, name="vis_mlp")(
            vis3, deterministic, dropout_rng=r.get("vis_mlp")))
        return lang4, vis4


class VisualFeatEmbeddings(nn.Module):
    """ROI feature + normalized-box position embeddings, averaged
    (LXMERT visual input head)."""

    cfg: EncoderConfig
    visual_feat_dim: int = 2048
    visual_pos_dim: int = 4

    @nn.compact
    def __call__(self, feats, boxes, deterministic=True):
        cfg = self.cfg
        f = nn.Dense(cfg.hidden, dtype=cfg.jdtype, name="feat_proj")(
            feats.astype(cfg.jdtype)
        )
        f = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="feat_ln")(f)
        p = nn.Dense(cfg.hidden, dtype=cfg.jdtype, name="pos_proj")(
            boxes.astype(cfg.jdtype)
        )
        p = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="pos_ln")(p)
        out = (f + p) / 2.0
        return nn.Dropout(cfg.dropout)(out, deterministic=deterministic)


class _MaskedScanBody(nn.Module):
    """One scanned encoder layer with identity pad slots (``i >= n_real``)."""

    cfg: EncoderConfig
    n_real: int

    @nn.compact
    def __call__(self, x, i, key_mask, deterministic):
        out = EncoderLayer(self.cfg, name="layer")(x, key_mask, deterministic)
        return jnp.where(i < self.n_real, out, x), None


class _MaskedXScanBody(nn.Module):
    """One scanned cross-modality layer carrying the (lang, vis) pair."""

    cfg: EncoderConfig
    n_real: int

    @nn.compact
    def __call__(self, carry, i, lang_mask, vis_mask, deterministic):
        lang, vis = carry
        l2, v2 = CrossModalityLayer(self.cfg, name="layer")(
            lang, vis, lang_mask, vis_mask, deterministic)
        keep = i < self.n_real
        return (jnp.where(keep, l2, lang), jnp.where(keep, v2, vis)), None


class LxmertBackbone(nn.Module):
    cfg: LxmertConfig

    def _scan(self, body_cls, name, lcfg, n_real, *args):
        n_pad = pad_layers(n_real, self.cfg.pipe_stages)
        scan = nn.scan(
            body_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=n_pad,
            in_axes=(0,) + (nn.broadcast,) * (len(args) - 1),
        )
        carry, _ = scan(lcfg, n_real, name=name)(
            args[0], jnp.arange(n_pad), *args[1:])
        return carry

    def _segment_dropout_keys(self, deterministic, scan_name, n_real,
                              sites=None):
        """Stacked per-(layer, site) dropout keys for one PP segment,
        bit-identical to the sequential nn.scan stream
        (encoder.scan_exact_dropout_site_keys; length = the PADDED scan
        length, since pad slots consume splits and counter ticks too)."""
        if deterministic or self.cfg.dropout <= 0:
            return None
        from .encoder import SCAN_DROPOUT_SITES, scan_exact_dropout_site_keys

        return scan_exact_dropout_site_keys(
            self.scope.rngs["dropout"], (scan_name,),
            pad_layers(n_real, self.cfg.pipe_stages),
            sites or SCAN_DROPOUT_SITES)

    @nn.compact
    def __call__(self, ids, attention_mask, token_type_ids, visual_feats,
                 visual_pos, deterministic=True):
        from .encoder import TextEmbeddings

        lcfg = self.cfg.encoder_cfg(self.cfg.l_layers)
        lang = TextEmbeddings(lcfg, name="embeddings")(
            ids, token_type_ids, attention_mask, deterministic
        )
        vis = VisualFeatEmbeddings(
            lcfg, self.cfg.visual_feat_dim, self.cfg.visual_pos_dim,
            name="visual_embeddings",
        )(visual_feats, visual_pos, deterministic)

        vis_mask = jnp.ones(vis.shape[:2], jnp.int32)
        cfg = self.cfg
        if cfg.scan_layers and cfg.pp_runners is not None \
                and not self.is_initializing():
            from .encoder import LXMERT_CROSS_DROPOUT_SITES

            run = cfg.pp_runners
            p = self.variables["params"]
            lang = run["lang"](p["lang_layers"]["layer"], lang,
                               attention_mask,
                               self._segment_dropout_keys(
                                   deterministic, "lang_layers", cfg.l_layers))
            vis = run["vis"](p["vis_layers"]["layer"], vis, vis_mask,
                             self._segment_dropout_keys(
                                 deterministic, "vis_layers", cfg.r_layers))
            lang, vis = run["x"](p["x_layers"]["layer"], lang, vis,
                                 attention_mask, vis_mask,
                                 self._segment_dropout_keys(
                                     deterministic, "x_layers", cfg.x_layers,
                                     LXMERT_CROSS_DROPOUT_SITES))
            return lang, vis
        if cfg.scan_layers:
            lang = self._scan(_MaskedScanBody, "lang_layers", lcfg,
                              cfg.l_layers, lang, attention_mask,
                              deterministic)
            vis = self._scan(_MaskedScanBody, "vis_layers", lcfg,
                             cfg.r_layers, vis, vis_mask, deterministic)
            lang, vis = self._scan(_MaskedXScanBody, "x_layers", lcfg,
                                   cfg.x_layers, (lang, vis), attention_mask,
                                   vis_mask, deterministic)
            return lang, vis
        for i in range(self.cfg.l_layers):
            lang = EncoderLayer(lcfg, name=f"lang_layer_{i}")(
                lang, attention_mask, deterministic
            )
        for i in range(self.cfg.r_layers):
            vis = EncoderLayer(lcfg, name=f"vis_layer_{i}")(
                vis, vis_mask, deterministic
            )
        for i in range(self.cfg.x_layers):
            lang, vis = CrossModalityLayer(lcfg, name=f"x_layer_{i}")(
                lang, vis, attention_mask, vis_mask, deterministic
            )
        return lang, vis


class LxmertClassifier(nn.Module):
    """Reference ``Lxmert`` head stack (mm_early.py:105-172)."""

    cfg: LxmertConfig
    num_labels: int
    dropout: float = 0.1
    logit_scale_init: float = 2.6592
    # One 2B-row backbone dispatch for [primary ; TIM-swapped] instead of
    # two sequential B-row passes (reference layout, mm_early.py:146-160):
    # identical per-row math (each row is its own (text, ROI-set) pair), far
    # better MXU fill over the 36-ROI vision branch at the paper's batch
    # sizes. Dropout draws once over 2B rows (same distribution, different
    # stream than two-pass). False restores the reference's two passes.
    tim_batched: bool = True

    def setup(self):
        self.backbone = LxmertBackbone(self.cfg, name="backbone")
        self.linear_fusion = nn.Dense(self.cfg.hidden, dtype=jnp.float32,
                                      name="linear_fusion")
        self.head_dropout = nn.Dropout(self.dropout)
        self.linear = nn.Dense(self.num_labels, dtype=jnp.float32, name="linear")
        self.linear_tim = nn.Dense(2, dtype=jnp.float32, name="linear_tim")
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(self.logit_scale_init, jnp.float32)
        )

    def backbone_outputs(self, ids, attention_mask, token_type_ids,
                         visual_feats, visual_pos, deterministic=True):
        """Raw (language_output, vision_output) — HF ``LxmertModel``'s
        contract, used by cli/verify_imports.py for checkpoint parity."""
        return self.backbone(ids, attention_mask, token_type_ids,
                             visual_feats, visual_pos, deterministic)

    def _head(self, lang, deterministic):
        xt_xv = nn.relu(self.linear_fusion(lang[:, 0, :].astype(jnp.float32)))
        xt_xv = self.head_dropout(xt_xv, deterministic=deterministic)
        return xt_xv

    def __call__(self, ids, attention_mask, token_type_ids, visual_feats,
                 visual_pos, tim_ids=None, tim_mask=None,
                 tim_token_type_ids=None, deterministic=True):
        lang_tim = None
        if tim_ids is not None and self.tim_batched:
            cat = lambda a, b: jnp.concatenate([a, b], axis=0)
            two = lambda a: jnp.concatenate([a, a], axis=0)
            b = ids.shape[0]
            lang2, vis2 = self.backbone(
                cat(ids, tim_ids), cat(attention_mask, tim_mask),
                (None if token_type_ids is None
                 else cat(token_type_ids, tim_token_type_ids)),
                two(visual_feats), two(visual_pos), deterministic)
            lang, lang_tim, vis = lang2[:b], lang2[b:], vis2[:b]
        else:
            lang, vis = self.backbone(ids, attention_mask, token_type_ids,
                                      visual_feats, visual_pos, deterministic)
            if tim_ids is not None:
                lang_tim, _ = self.backbone(tim_ids, tim_mask,
                                            tim_token_type_ids, visual_feats,
                                            visual_pos, deterministic)
        fused = self._head(lang, deterministic)
        out_cls = self.linear(fused)

        # masked max-pool ITC embeddings (mm_early.py:138-143). The reference
        # DETACHES the language states first (``x_t.clone().detach()``,
        # mm_early.py:140 — torch forbids the in-place -1e9 masking on a
        # grad leaf), so ITC's text-side gradient is stopped; the vision
        # side (x_v, no detach) still backprops. Training parity requires
        # mirroring the quirk (tests/test_reference_e2e_parity.py).
        lang_sg = jax.lax.stop_gradient(lang)
        neg = jnp.asarray(-1e9, lang.dtype)
        masked_lang = jnp.where(attention_mask[:, :, None] > 0, lang_sg, neg)
        x_t = jnp.max(masked_lang, axis=1)
        x_v = jnp.max(vis, axis=1)

        out_tim = None
        if lang_tim is not None:
            out_tim = self.linear_tim(lang_tim[:, 0, :].astype(jnp.float32))

        return {
            "out_cls": out_cls,
            "logits_per_text": self.get_logits_per_text(x_t, x_v),
            "out_tim": out_tim,
            "out_iadds": None,
            "mm_features": fused,
        }

    def get_logits_per_text(self, x_t, x_v):
        t = x_t.astype(jnp.float32)
        v = x_v.astype(jnp.float32)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return jnp.exp(self.logit_scale) * (t @ v.T)


def init_lxmert_params(model: LxmertClassifier, rng, ids, mask, token_type_ids,
                       feats, boxes):
    return model.init(rng, ids, mask, token_type_ids, feats, boxes,
                      tim_ids=ids, tim_mask=mask, tim_token_type_ids=token_type_ids)
