"""Vision-text dual encoder (reference ``mm_late.py:59-69,148-159``; HF
``VisionTextDualEncoderModel`` semantics).

Text tower (BERT/Bernice/RoBERTa) + vision tower (ViT/BEiT/DEiT), CLIP-style
projections of the pooled outputs to a shared space, learnable temperature,
and ``logits_per_text`` = scaled cosine similarity — the ITC logits come free
from the same forward (reference mm_late.py:159).

The vision tower is frozen during fine-tuning (reference mm_late.py:67-69);
freezing happens in the optimizer mask (``train/optim.py``), not here, so the
module stays a pure function.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .encoder import BertEncoder, EncoderConfig, ViTEncoder


class DualEncoder(nn.Module):
    text_cfg: EncoderConfig
    vision_cfg: EncoderConfig
    patch: int = 16
    image_size: int = 224
    num_prefix_tokens: int = 1
    vision_pooling: str = "tanh"
    vision_arch: str = "vit"  # "vit" (ViT/DEiT topology) or "beit"
    projection_dim: int = 512
    logit_scale_init: float = 2.6592

    def setup(self):
        self.text_tower = BertEncoder(self.text_cfg, name="text")
        if self.vision_arch == "beit":
            from .beit import BeitEncoder

            self.vision_tower = BeitEncoder(
                self.vision_cfg, patch=self.patch, image_size=self.image_size,
                name="vision",
            )
        else:
            self.vision_tower = ViTEncoder(
                self.vision_cfg,
                patch=self.patch,
                image_size=self.image_size,
                num_prefix_tokens=self.num_prefix_tokens,
                pooling=self.vision_pooling,
                name="vision",
            )
        self.text_projection = nn.Dense(
            self.projection_dim, use_bias=False, dtype=jnp.float32, name="text_proj"
        )
        self.visual_projection = nn.Dense(
            self.projection_dim, use_bias=False, dtype=jnp.float32, name="visual_proj"
        )
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(self.logit_scale_init, jnp.float32)
        )

    def encode_text(self, ids, attention_mask=None, token_type_ids=None,
                    deterministic=True, word_embeds=None):
        return self.text_tower(ids, attention_mask, token_type_ids,
                               deterministic, word_embeds=word_embeds)

    def encode_vision(self, pixel_values, deterministic=True):
        return self.vision_tower(pixel_values, deterministic)

    def logits_per_text(self, text_pooled, vision_pooled):
        """Scaled cosine similarity: rows = texts, cols = images. Under a
        data-sharded batch this matmul contracts globally — XLA all-gathers
        the embeddings over ICI, giving global-batch ITC for free."""
        t = self.text_projection(text_pooled.astype(jnp.float32))
        v = self.visual_projection(vision_pooled.astype(jnp.float32))
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return jnp.exp(self.logit_scale) * (t @ v.T)

    def __call__(self, ids, attention_mask, pixel_values, token_type_ids=None,
                 deterministic=True):
        text_hidden, text_pooled = self.encode_text(
            ids, attention_mask, token_type_ids, deterministic
        )
        vision_hidden, vision_pooled = self.encode_vision(pixel_values, deterministic)
        logits = self.logits_per_text(text_pooled, vision_pooled)
        return {
            "text_hidden": text_hidden,
            "text_pooled": text_pooled,
            "vision_hidden": vision_hidden,
            "vision_pooled": vision_pooled,
            "logits_per_text": logits,
        }
