"""ViLT-style early fusion (reference ``mm_early.py:48-103``; HF ViltModel
semantics).

One pre-LN transformer over the concatenated [text tokens ; image patches]
sequence with modality-type embeddings. Heads per the reference: linear cls
on dropout(CLS), ITC projections + learnable ``logit_scale`` (init 2.6592,
the CLIP default — mm_early.py:49,57), ITC embeddings split from the joint
sequence at the text-length boundary (mm_early.py:73-75), and a second full
joint pass for TIM over swapped text (mm_early.py:78-92).

Image preprocessing has two modes:

* default: resize to a fixed square grid at ingest; ``pixel_mask`` covers
  the full grid. (XLA-static simplification of the reference's
  ``pad_and_create_pixel_mask`` collate, mm_early.py:205-226.)
* ``--vilt_exact_resize`` (``canvas_size`` set + ``grid_hw`` in the batch):
  the reference/HF semantics with static shapes — aspect-preserving resize
  onto a fixed masked canvas, per-sample bilinear (align-corners)
  interpolation of the learned position grid to each sample's true patch
  grid, exactly HF ``ViltEmbeddings.visual_embed``'s math. HF's random
  re-sampling of *invalid* patches to pad the sequence is attention-masked
  there and absent here — either way those rows contribute nothing.

Text max_length stays 40 (reference config.py:57-58).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoder import EncoderConfig, Pooler, TextEmbeddings, TransformerStack


def interp_pos_grid(spatial: jnp.ndarray, gh, gw, out_side: int) -> jnp.ndarray:
    """Bilinear align-corners interpolation of a learned ``(gs, gs, D)``
    position grid to a sample's true ``(gh, gw)`` patch extent, laid out on
    the static ``(out_side, out_side)`` canvas grid (rows/cols beyond
    ``(gh, gw)`` are attention-masked). Matches
    ``torch.nn.functional.interpolate(..., mode="bilinear",
    align_corners=True)`` as used by HF ViLT's ``visual_embed``."""
    gs = spatial.shape[0]
    yi = jnp.arange(out_side, dtype=jnp.float32)
    sy = jnp.clip(yi * (gs - 1) / jnp.maximum(gh - 1, 1), 0, gs - 1)
    sx = jnp.clip(yi * (gs - 1) / jnp.maximum(gw - 1, 1), 0, gs - 1)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, gs - 1)
    x1 = jnp.minimum(x0 + 1, gs - 1)
    wy = (sy - y0)[:, None, None]
    wx = (sx - x0)[None, :, None]
    top = spatial[y0][:, x0] * (1 - wx) + spatial[y0][:, x1] * wx
    bot = spatial[y1][:, x0] * (1 - wx) + spatial[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).reshape(out_side * out_side, -1)


class ViltBackbone(nn.Module):
    cfg: EncoderConfig
    patch: int = 32
    image_size: int = 384
    # --vilt_exact_resize: pixel_values arrive on a fixed (canvas, canvas)
    # frame with per-sample true extents in grid_hw; the learned position
    # grid stays at (image_size // patch)^2 + cls (checkpoint layout) and is
    # interpolated per sample
    canvas_size: Optional[int] = None

    @nn.compact
    def __call__(self, ids, attention_mask, token_type_ids, pixel_values,
                 pixel_mask=None, grid_hw=None, deterministic=True):
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
        base_side = self.image_size // self.patch
        pos = self.param("image_pos", nn.initializers.normal(0.02),
                         (1, 1 + base_side * base_side, cfg.hidden))
        exact = self.canvas_size is not None and grid_hw is not None
        if exact:
            out_side = self.canvas_size // self.patch
            gh = jnp.maximum(grid_hw[:, 0] // self.patch, 1)
            gw = jnp.maximum(grid_hw[:, 1] // self.patch, 1)
            spatial = pos[0, 1:].astype(jnp.float32).reshape(
                base_side, base_side, cfg.hidden)
            pos_sp = jax.vmap(
                lambda h, w: interp_pos_grid(spatial, h, w, out_side)
            )(gh, gw)  # (B, out_side^2, D)
            pos_b = jnp.concatenate(
                [jnp.tile(pos[:, :1].astype(jnp.float32), (b, 1, 1)), pos_sp], 1)
            patches = patches + pos_b.astype(cfg.jdtype)
            iy = jnp.arange(out_side)
            grid_mask = ((iy[None, :, None] < gh[:, None, None])
                         & (iy[None, None, :] < gw[:, None, None]))
            img_mask = jnp.concatenate(
                [jnp.ones((b, 1), jnp.int32),
                 grid_mask.reshape(b, -1).astype(jnp.int32)], axis=1)
        else:
            patches = patches + pos.astype(cfg.jdtype)

        # modality type embeddings (ViLT token_type: 0 = text, 1 = image)
        mod_emb = nn.Embed(2, cfg.hidden, dtype=cfg.jdtype, name="modality_type")
        text_emb = text_emb + mod_emb(jnp.zeros(ids.shape, jnp.int32))
        patches = patches + mod_emb(jnp.ones(patches.shape[:2], jnp.int32))

        joint = jnp.concatenate([text_emb, patches], axis=1)
        if exact:
            pass  # img_mask built from grid_hw above
        elif pixel_mask is None:
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
    # --vilt_exact_resize canvas (see ViltBackbone.canvas_size)
    canvas_size: Optional[int] = None

    def setup(self):
        self.backbone = ViltBackbone(self.cfg, patch=self.patch,
                                     image_size=self.image_size,
                                     canvas_size=self.canvas_size,
                                     name="backbone")
        self.head_dropout = nn.Dropout(self.dropout)
        self.linear = nn.Dense(self.num_labels, dtype=jnp.float32, name="linear")
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(self.logit_scale_init, jnp.float32)
        )
        self.linear_tim = nn.Dense(2, dtype=jnp.float32, name="linear_tim")

    def __call__(self, ids, attention_mask, token_type_ids, pixel_values,
                 pixel_mask=None, grid_hw=None, tim_ids=None, tim_mask=None,
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
                None if grid_hw is None else two(grid_hw),
                deterministic)
            b = ids.shape[0]
            hidden, tim_hidden = hidden2[:b], hidden2[b:]
        else:
            hidden, _ = self.backbone(ids, attention_mask, token_type_ids,
                                      pixel_values, pixel_mask, grid_hw,
                                      deterministic)
            if tim_ids is not None:
                tim_hidden, _ = self.backbone(tim_ids, tim_mask,
                                              tim_token_type_ids,
                                              pixel_values, pixel_mask,
                                              grid_hw, deterministic)
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
                     pixel_values, grid_hw=None):
    return model.init(rng, ids, mask, token_type_ids, pixel_values,
                      grid_hw=grid_hw, tim_ids=ids, tim_mask=mask,
                      tim_token_type_ids=token_type_ids)
