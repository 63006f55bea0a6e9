"""ViLT-style early fusion (reference ``mm_early.py:48-103``; HF ViltModel
semantics).

One pre-LN transformer over the concatenated [text tokens ; image patches]
sequence with modality-type embeddings. Heads per the reference: linear cls
on dropout(CLS), ITC projections + learnable ``logit_scale`` (init 2.6592,
the CLIP default — mm_early.py:49,57), ITC embeddings split from the joint
sequence at the text-length boundary (mm_early.py:73-75), and a second full
joint pass for TIM over swapped text (mm_early.py:78-92).

XLA-static deviation: the reference pads each batch's images to the largest
size via ``pad_and_create_pixel_mask`` (mm_early.py:205-226 — dynamic
shapes); we resize to a fixed square grid at ingest and the ``pixel_mask``
covers the full grid. Text max_length stays 40 (reference config.py:57-58).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .encoder import EncoderConfig, Pooler, TextEmbeddings, TransformerStack


class ViltBackbone(nn.Module):
    cfg: EncoderConfig
    patch: int = 32
    image_size: int = 384

    @nn.compact
    def __call__(self, ids, attention_mask, token_type_ids, pixel_values,
                 pixel_mask=None, deterministic=True):
        cfg = self.cfg
        text_emb = TextEmbeddings(cfg, name="text_embeddings")(
            ids, token_type_ids, attention_mask, deterministic
        )
        b = pixel_values.shape[0]
        if pixel_values.shape[1] == 3:  # NCHW -> NHWC
            pixel_values = pixel_values.transpose(0, 2, 3, 1)
        patches = nn.Conv(
            cfg.hidden, (self.patch, self.patch), strides=(self.patch, self.patch),
            dtype=cfg.jdtype, name="patch_proj",
        )(pixel_values.astype(cfg.jdtype)).reshape(b, -1, cfg.hidden)
        cls_img = self.param("image_cls", nn.initializers.zeros, (1, 1, cfg.hidden))
        patches = jnp.concatenate(
            [jnp.tile(cls_img, (b, 1, 1)).astype(cfg.jdtype), patches], axis=1
        )
        pos = self.param("image_pos", nn.initializers.normal(0.02),
                         (1, patches.shape[1], cfg.hidden))
        patches = patches + pos.astype(cfg.jdtype)

        # modality type embeddings (ViLT token_type: 0 = text, 1 = image)
        mod_emb = nn.Embed(2, cfg.hidden, dtype=cfg.jdtype, name="modality_type")
        text_emb = text_emb + mod_emb(jnp.zeros(ids.shape, jnp.int32))
        patches = patches + mod_emb(jnp.ones(patches.shape[:2], jnp.int32))

        joint = jnp.concatenate([text_emb, patches], axis=1)
        if pixel_mask is None:
            img_mask = jnp.ones(patches.shape[:2], jnp.int32)
        else:
            img_mask = pixel_mask.astype(jnp.int32)
        joint_mask = jnp.concatenate([attention_mask.astype(jnp.int32), img_mask], 1)
        hidden = TransformerStack(cfg, name="encoder")(joint, joint_mask, deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="ln_final")(hidden)
        pooled = Pooler(cfg, name="pooler")(hidden)
        return hidden, pooled


class ViltClassifier(nn.Module):
    """Reference ``ViLT`` head stack (mm_early.py:48-103)."""

    cfg: EncoderConfig
    num_labels: int
    patch: int = 32
    image_size: int = 384
    dropout: float = 0.1
    logit_scale_init: float = 2.6592
    projection_dim: int = 768  # fixed_feat_size (reference config.py:83)
    # Run the primary and TIM joint passes as ONE 2B-row backbone dispatch
    # instead of two sequential B-row passes (the reference's layout,
    # mm_early.py:78-92). Per-row math is identical — each row still sees
    # its own (text, image) pair — but at the paper's batch sizes the
    # doubled batch fills the MXU far better. Dropout masks are drawn once
    # over 2B rows instead of twice over B (same distribution, different
    # stream); set False for the reference's two-pass layout.
    tim_batched: bool = True

    def setup(self):
        self.backbone = ViltBackbone(self.cfg, patch=self.patch,
                                     image_size=self.image_size, name="backbone")
        self.head_dropout = nn.Dropout(self.dropout)
        self.linear = nn.Dense(self.num_labels, dtype=jnp.float32, name="linear")
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(self.logit_scale_init, jnp.float32)
        )
        self.linear_tim = nn.Dense(2, dtype=jnp.float32, name="linear_tim")

    def __call__(self, ids, attention_mask, token_type_ids, pixel_values,
                 pixel_mask=None, tim_ids=None, tim_mask=None,
                 tim_token_type_ids=None, deterministic=True):
        tim_hidden = None
        if tim_ids is not None and self.tim_batched:
            # one 2B-row joint pass: [primary ; TIM-swapped] share the
            # images, each row attends only within itself
            cat = lambda a, b: jnp.concatenate([a, b], axis=0)
            two = lambda a: jnp.concatenate([a, a], axis=0)
            hidden2, _ = self.backbone(
                cat(ids, tim_ids), cat(attention_mask, tim_mask),
                (None if token_type_ids is None
                 else cat(token_type_ids, tim_token_type_ids)),
                two(pixel_values),
                None if pixel_mask is None else two(pixel_mask),
                deterministic)
            b = ids.shape[0]
            hidden, tim_hidden = hidden2[:b], hidden2[b:]
        else:
            hidden, _ = self.backbone(ids, attention_mask, token_type_ids,
                                      pixel_values, pixel_mask, deterministic)
            if tim_ids is not None:
                tim_hidden, _ = self.backbone(tim_ids, tim_mask,
                                              tim_token_type_ids,
                                              pixel_values, pixel_mask,
                                              deterministic)
        cls = hidden[:, 0, :]
        out_cls = self.linear(
            self.head_dropout(cls, deterministic=deterministic).astype(jnp.float32)
        )
        # ITC split at the text-length boundary (mm_early.py:73-75)
        text_seq_len = ids.shape[1]
        x_t = cls
        x_v = hidden[:, text_seq_len, :]

        out_tim = None
        if tim_hidden is not None:
            out_tim = self.linear_tim(tim_hidden[:, 0, :].astype(jnp.float32))

        return {
            "out_cls": out_cls,
            "logits_per_text": self.get_logits_per_text(x_t, x_v),
            "out_tim": out_tim,
            "out_iadds": None,
            "mm_features": cls,
        }

    def get_logits_per_text(self, x_t, x_v):
        """Normalized cosine logits (mm_early.py:96-103). Note: the reference
        declares text/visual projection layers but never applies them in
        ``get_logits_per_text`` — it normalizes the raw joint-sequence
        embeddings. We match that behaviour and omit the dead layers."""
        t = x_t.astype(jnp.float32)
        v = x_v.astype(jnp.float32)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return jnp.exp(self.logit_scale) * (t @ v.T)


def init_vilt_params(model: ViltClassifier, rng, ids, mask, token_type_ids,
                     pixel_values):
    return model.init(rng, ids, mask, token_type_ids, pixel_values,
                      tim_ids=ids, tim_mask=mask, tim_token_type_ids=token_type_ids)
