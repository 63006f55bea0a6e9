"""Late-fusion multimodal classifier — the paper's main model
(reference ``mm_late.py:50-193``).

Dual encoder + one of four fusion heads + classification/aux heads:

* ``concat``     — CLS_t ⊕ CLS_v -> linear_fusion -> ReLU (mm_late.py:92-96)
* ``attention``  — text queries attend over image tokens (single-head SDPA at
                   full width 768, mm_late.py:98-113). The reference computes
                   the full 128x197 attention then keeps only the CLS row;
                   only query row 0 ever reaches the loss, so we compute just
                   the CLS query — mathematically identical, ~128x less fusion
                   FLOPs. The SDPA runs through the fused Pallas kernel.
* ``aspect-att`` — tanh-scored softmax over the stacked pooled text/image
                   vectors (mm_late.py:115-131)
* ``gmu``        — sigmoid gate over concatenated CLS tokens blends 1536-d
                   projections (mm_late.py:133-144)

Aux heads: ``linear_tim`` (ITM 2-way, second text pass over swapped text —
mm_late.py:168-182) and ``linear_iadds`` (mm_late.py:187-190). The TIM pass
reuses the primary pass's vision features instead of re-running the frozen
vision tower (the reference recomputes it, mm_late.py:170-175 — identical
activations, ~2x the vision FLOPs).

Undefined reference registry names ``XATT``/``CNNImgConcat``
(mm_late.py:42-47) are realised as the working CNN-fusion path ``concat_cnn``
/ ``xatt`` in ``MMCnnModel`` below (ResNet trunk + BERT text tower), per
SURVEY.md section 7 "reference bugs to resolve deliberately".
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import sdpa
from .dual import DualEncoder
from .encoder import BertEncoder, EncoderConfig
from .resnet import ResNet, STAGE_SIZES

FUSION_NAMES = ("concat", "attention", "aspect-att", "gmu")


class FusionHead(nn.Module):
    """The four fusion variants; emits a 768-d fused feature."""

    hidden: int
    fusion_name: str
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, text_hidden, vision_hidden, text_pooled=None,
                 vision_pooled=None):
        h = self.hidden
        fused_dtype = text_hidden.dtype
        if self.fusion_name == "concat":
            cat = jnp.concatenate([text_hidden[:, 0, :], vision_hidden[:, 0, :]], -1)
            return nn.relu(nn.Dense(h, dtype=fused_dtype, name="linear_fusion")(cat))

        if self.fusion_name == "attention":
            # CLS-query cross-attention; single head of full width.
            q = nn.Dense(h, dtype=fused_dtype, name="fc_q")(text_hidden[:, :1, :])
            k = nn.Dense(h, dtype=fused_dtype, name="fc_k")(vision_hidden)
            v = nn.Dense(h, dtype=fused_dtype, name="fc_v")(vision_hidden)
            ctx = sdpa(
                q[:, None], k[:, None], v[:, None],
                scale=h ** -0.5, impl=self.attn_impl,
            )[:, 0, 0, :]
            cat = jnp.concatenate([text_hidden[:, 0, :], ctx], -1)
            return nn.relu(nn.Dense(h, dtype=fused_dtype, name="linear_fusion")(cat))

        if self.fusion_name == "aspect-att":
            stacked = jnp.stack([text_pooled, vision_pooled], axis=1)  # (B, 2, H)
            scores = jnp.tanh(
                nn.Dense(1, dtype=fused_dtype, name="aspect_attention")(stacked)
            )
            weights = nn.softmax(scores.astype(jnp.float32), axis=1).astype(fused_dtype)
            return nn.relu(jnp.sum(weights * stacked, axis=1))

        if self.fusion_name == "gmu":
            cls_t, cls_v = text_hidden[:, 0, :], vision_hidden[:, 0, :]
            t_prime = nn.Dense(2 * h, dtype=fused_dtype, name="gmu_t")(cls_t)
            v_prime = nn.Dense(2 * h, dtype=fused_dtype, name="gmu_v")(cls_v)
            z = nn.sigmoid(jnp.concatenate([cls_t, cls_v], -1))
            mixed = z * t_prime + (1.0 - z) * v_prime
            return nn.relu(nn.Dense(h, dtype=fused_dtype, name="linear_fusion")(mixed))

        raise ValueError(f"unknown fusion {self.fusion_name}")


class MMLateModel(nn.Module):
    """Dual encoder + fusion + cls/tim/iadds heads.

    Forward contract mirrors reference ``MM_Model.forward``
    (mm_late.py:148-193): returns out_cls, logits_per_text, out_tim,
    out_iadds, mm_features.
    """

    text_cfg: EncoderConfig
    vision_cfg: EncoderConfig
    num_labels: int
    fusion_name: str = "concat"
    dropout: float = 0.05
    patch: int = 16
    image_size: int = 224
    num_prefix_tokens: int = 1
    vision_pooling: str = "tanh"
    vision_arch: str = "vit"
    use_token_types: bool = True
    projection_dim: int = 512  # HF VisionTextDualEncoder default

    def setup(self):
        self.dual = DualEncoder(
            self.text_cfg,
            self.vision_cfg,
            patch=self.patch,
            image_size=self.image_size,
            num_prefix_tokens=self.num_prefix_tokens,
            vision_pooling=self.vision_pooling,
            vision_arch=self.vision_arch,
            projection_dim=self.projection_dim,
            name="dual",
        )
        self.fusion = FusionHead(
            self.text_cfg.hidden, self.fusion_name,
            attn_impl=self.text_cfg.attn_impl, name="fusion",
        )
        self.head_dropout = nn.Dropout(self.dropout)
        self.linear_cls = nn.Dense(self.num_labels, dtype=jnp.float32, name="linear_cls")
        self.linear_tim = nn.Dense(2, dtype=jnp.float32, name="linear_tim")
        self.linear_iadds = nn.Dense(2, dtype=jnp.float32, name="linear_iadds")

    def encode_vision(self, pixel_values, deterministic=True):
        """Vision-tower-only forward (for the frozen-tower activation cache:
        the reference recomputes identical vision features every epoch AND
        for the TIM second pass, mm_late.py:149-175)."""
        return self.dual.encode_vision(pixel_values, deterministic)

    def __call__(self, ids, attention_mask, pixel_values, token_type_ids=None,
                 tim_ids=None, tim_mask=None, tim_token_type_ids=None,
                 iadds_task=False, deterministic=True, word_embeds=None,
                 tim_word_embeds=None, vision_hidden=None, vision_pooled=None,
                 tim_src=None):
        b = ids.shape[0]
        use_tim = tim_ids is not None or tim_src is not None
        if tim_ids is not None:
            # Batch the TIM text pass WITH the primary text pass: one tower
            # call over 2B rows instead of two over B (per-sample ops —
            # identical math; 2x the matmul rows keeps the MXU busier at the
            # reference's small batch sizes). Vision runs once and is shared
            # (reference recomputes it, mm_late.py:170-175).
            ids = jnp.concatenate([ids, tim_ids], 0)
            attention_mask = jnp.concatenate([attention_mask, tim_mask], 0)
            if token_type_ids is not None:
                token_type_ids = jnp.concatenate(
                    [token_type_ids, tim_token_type_ids], 0
                )
            if word_embeds is not None:
                word_embeds = jnp.concatenate([word_embeds, tim_word_embeds], 0)
        text_hidden, text_pooled = self.dual.encode_text(
            ids, attention_mask, token_type_ids, deterministic,
            word_embeds=word_embeds,
        )
        if tim_src is not None:
            # ``--tim_reuse_text``: the swapped TIM rows are by construction
            # a permutation of the batch's own rows (train/itm.py), so the
            # second text-tower pass recomputes activations of texts the
            # primary pass just encoded. Reuse them by row gather — the
            # tower runs on B rows instead of 2B (the dominant step cost at
            # batch 8, BASELINE.md ablation). EXACT in deterministic mode;
            # under dropout the reused rows share the primary pass's masks
            # where the reference (mm_late.py:168-182) draws fresh ones —
            # the documented deviation that keeps this flag opt-in.
            text_hidden = jnp.concatenate(
                [text_hidden, jnp.take(text_hidden, tim_src, axis=0)], 0)
            text_pooled = jnp.concatenate(
                [text_pooled, jnp.take(text_pooled, tim_src, axis=0)], 0)
        if vision_hidden is None:
            vision_hidden, vision_pooled = self.dual.encode_vision(
                pixel_values, deterministic
            )
        logits_per_text = self.dual.logits_per_text(
            text_pooled[:b], vision_pooled
        )
        if use_tim:
            vh = jnp.concatenate([vision_hidden, vision_hidden], 0)
            vp = jnp.concatenate([vision_pooled, vision_pooled], 0)
        else:
            vh, vp = vision_hidden, vision_pooled
        fused_all = self.fusion(text_hidden, vh, text_pooled, vp)
        fused = fused_all[:b]
        mm_features = fused
        dropped = self.head_dropout(fused, deterministic=deterministic)
        out_cls = self.linear_cls(dropped.astype(jnp.float32))

        out_tim = None
        if use_tim:
            out_tim = self.linear_tim(fused_all[b:].astype(jnp.float32))

        out_iadds = None
        if iadds_task:
            out_iadds = self.linear_iadds(dropped.astype(jnp.float32))

        return {
            "out_cls": out_cls,
            "logits_per_text": logits_per_text,
            "out_tim": out_tim,
            "out_iadds": out_iadds,
            "mm_features": mm_features,
        }


def init_mm_late_params(model: "MMLateModel", rng, ids, mask, pixel_values,
                        token_type_ids=None):
    """Initialise covering every head (flax creates params lazily; the TIM and
    iadds branches must run once so their heads exist for any later config)."""
    return model.init(
        rng, ids, mask, pixel_values, token_type_ids,
        tim_ids=ids, tim_mask=mask, tim_token_type_ids=token_type_ids,
        iadds_task=True,
    )


class MMCnnModel(nn.Module):
    """CNN-fusion path (the reference's undefined ``concat_cnn``/``xatt``
    registry, mm_late.py:42-47; datasets exist at datasets.py:304-353).

    BERT text tower + ResNet trunk. ``concat_cnn``: CLS ⊕ pooled-conv ->
    linear -> ReLU -> cls head. ``xatt``: text tokens cross-attend over the
    7x7 conv grid projected to 768 (the evident intent of Self_Attn2,
    mm_late.py:214-253), then CLS ⊕ attended -> linear.
    """

    text_cfg: EncoderConfig
    cnn_name: str
    num_labels: int
    fusion_name: str = "concat_cnn"
    dropout: float = 0.05

    def setup(self):
        self.text_tower = BertEncoder(self.text_cfg, name="text")
        self.trunk = ResNet(STAGE_SIZES[self.cnn_name], self.num_labels, name="cnn")
        h = self.text_cfg.hidden
        self.conv_proj = nn.Dense(h, name="conv_proj")
        self.linear_fusion = nn.Dense(h, name="linear_fusion")
        self.linear_cls = nn.Dense(self.num_labels, dtype=jnp.float32, name="linear_cls")
        self.head_dropout = nn.Dropout(self.dropout)

    def __call__(self, ids, attention_mask, pixel_values, token_type_ids=None,
                 deterministic=True, train=False, word_embeds=None):
        text_hidden, text_pooled = self.text_tower(
            ids, attention_mask, token_type_ids, deterministic,
            word_embeds=word_embeds,
        )
        _, fmap = self.trunk(pixel_values, train=train, return_features=True)
        b, fh, fw, c = fmap.shape
        conv_tokens = self.conv_proj(fmap.reshape(b, fh * fw, c).astype(jnp.float32))
        if self.fusion_name == "xatt":
            q = text_hidden[:, :1, :].astype(jnp.float32)
            ctx = sdpa(q[:, None], conv_tokens[:, None], conv_tokens[:, None],
                       scale=q.shape[-1] ** -0.5, impl="jnp")[:, 0, 0, :]
            feat = jnp.concatenate([text_hidden[:, 0, :].astype(jnp.float32), ctx], -1)
        else:  # concat_cnn
            pooled_conv = jnp.mean(conv_tokens, axis=1)
            feat = jnp.concatenate(
                [text_hidden[:, 0, :].astype(jnp.float32), pooled_conv], -1
            )
        fused = nn.relu(self.linear_fusion(feat))
        fused = self.head_dropout(fused, deterministic=deterministic)
        out_cls = self.linear_cls(fused)
        return {"out_cls": out_cls, "text_pooled": text_pooled,
                "mm_features": fused}
