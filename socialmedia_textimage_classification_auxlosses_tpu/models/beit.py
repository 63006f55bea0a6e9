"""BEiT vision tower (reference ``image_only.py:30-40`` consumes
``microsoft/beit-base-patch16-224-pt22k-ft22k`` via AutoModel).

True BEiT topology, not a ViT stand-in: no absolute position embeddings,
per-layer Swin-style relative position bias added to the attention scores
(with dedicated cls<->patch / cls<->cls entries), no key-projection bias,
layer-scale residual gains (lambda_1/lambda_2), identity final norm, and the
BEiT pooler = LayerNorm over the mean of the patch tokens.

The relative-position index is a static table computed at trace time, so the
bias gather compiles to one embedding lookup per layer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoder import EncoderConfig, Mlp


def beit_relative_position_index(grid: int) -> np.ndarray:
    """(N, N) index into the relative-position-bias table for N = grid^2 + 1
    tokens (cls first). Matches HF BeitRelativePositionBias."""
    num_rel = (2 * grid - 1) ** 2 + 3
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid),
                                  indexing="ij"))  # (2, g, g)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N-1, N-1)
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += grid - 1
    rel[:, :, 1] += grid - 1
    rel[:, :, 0] *= 2 * grid - 1
    n = grid * grid
    index = np.zeros((n + 1, n + 1), np.int32)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel - 3
    index[0:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index


class BeitAttention(nn.Module):
    """Multi-head self-attention with relative position bias; the key
    projection carries no bias (BEiT convention)."""

    cfg: EncoderConfig
    grid: int

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        b, n, _ = x.shape
        q = nn.Dense(cfg.hidden, dtype=cfg.jdtype, name="query")(x)
        k = nn.Dense(cfg.hidden, use_bias=False, dtype=cfg.jdtype, name="key")(x)
        v = nn.Dense(cfg.hidden, dtype=cfg.jdtype, name="value")(x)

        def split(t):
            return t.reshape(b, n, cfg.heads, cfg.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        num_rel = (2 * self.grid - 1) ** 2 + 3
        table = self.param("rel_pos_table", nn.initializers.zeros,
                           (num_rel, cfg.heads))
        index = jnp.asarray(beit_relative_position_index(self.grid))
        bias = table[index]  # (N, N, heads)
        bias = bias.transpose(2, 0, 1)[None]  # (1, heads, N, N)

        scale = cfg.head_dim ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        scores = scores.astype(jnp.float32) + bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, cfg.hidden)
        out = nn.Dense(cfg.hidden, dtype=cfg.jdtype, name="out")(ctx)
        return nn.Dropout(cfg.dropout)(out, deterministic=deterministic)


class BeitLayer(nn.Module):
    cfg: EncoderConfig
    grid: int
    layer_scale_init: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name=name)
        lam1 = self.param("lambda_1",
                          nn.initializers.constant(self.layer_scale_init),
                          (cfg.hidden,))
        lam2 = self.param("lambda_2",
                          nn.initializers.constant(self.layer_scale_init),
                          (cfg.hidden,))
        x = x + lam1.astype(x.dtype) * BeitAttention(cfg, self.grid, name="attention")(
            ln("ln_attn")(x), deterministic
        )
        x = x + lam2.astype(x.dtype) * Mlp(cfg, name="mlp")(
            ln("ln_mlp")(x), deterministic
        )
        return x


class BeitEncoder(nn.Module):
    """Returns (last_hidden, pooled); pooled = LayerNorm(mean of patch
    tokens) — what the reference's ``pooled_output`` consumes
    (image_only.py:38)."""

    cfg: EncoderConfig
    patch: int = 16
    image_size: int = 224

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        cfg = self.cfg
        b = pixel_values.shape[0]
        if pixel_values.shape[1] == 3:
            pixel_values = pixel_values.transpose(0, 2, 3, 1)
        x = nn.Conv(cfg.hidden, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=cfg.jdtype,
                    name="proj")(pixel_values.astype(cfg.jdtype))
        grid = x.shape[1]
        x = x.reshape(b, -1, cfg.hidden)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)).astype(cfg.jdtype), x], 1)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        for i in range(cfg.layers):
            x = BeitLayer(cfg, grid, name=f"layer_{i}")(x, deterministic)
        pooled = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32,
                              name="pool_ln")(jnp.mean(x[:, 1:, :], axis=1))
        return x, pooled
