"""Pooling / feature helpers (reference ``models/utils.py:46-107,234-243``)
as pure jnp functions usable inside compiled steps."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_mean(x: jax.Array, mask: Optional[jax.Array] = None, axis: int = 1):
    """Mean over ``axis`` counting only unmasked positions
    (reference utils.py:80-92)."""
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = mask[:, : x.shape[axis]].astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1e-9)


def masked_max(x: jax.Array, mask: Optional[jax.Array] = None, axis: int = 1):
    """Max over ``axis`` with masked positions at -inf
    (reference utils.py:95-107)."""
    if mask is None:
        return jnp.max(x, axis=axis)
    m = mask[:, : x.shape[axis]].astype(bool)[..., None]
    neg = jnp.asarray(-1e9, x.dtype)
    return jnp.max(jnp.where(m, x, neg), axis=axis)


def batch_cosine_similarity(x_t: jax.Array, x_v: jax.Array) -> jax.Array:
    """Per-row cosine similarity of two (B, D) feature matrices
    (reference compute_batch_dot_product, utils.py:234-243)."""
    t = x_t / jnp.linalg.norm(x_t, axis=-1, keepdims=True)
    v = x_v / jnp.linalg.norm(x_v, axis=-1, keepdims=True)
    return jnp.sum(t * v, axis=-1)


def conv_kernel_summary(params) -> list:
    """Conv-layer introspection over a flax param tree (reference
    ``get_conv_layers``, utils.py:46-70, prints torchvision conv modules):
    returns (path, kernel shape) for every conv kernel."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys[-1] == "kernel" and hasattr(leaf, "ndim") and leaf.ndim == 4:
            out.append(("/".join(keys), tuple(leaf.shape)))
    return out
