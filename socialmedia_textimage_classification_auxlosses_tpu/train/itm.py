"""ITM (image-text matching / TIM) negative sampling — inside the compiled
step.

The reference swaps each example's text with another in-batch example's with
probability 0.5, using host RNG and a Python loop (reference
``mm_late.py:389-414``, ``mm_early.py:262-293``; label 1 = match,
0 = mismatch; a batch of one is always a match). Here the swap is a pure
function of a PRNG key on index arrays — it traces once and lives inside the
jitted train step (SURVEY.md section 7 "ITM inside jit").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def itm_swap(
    key: jax.Array,
    ids: jax.Array,
    mask: jax.Array,
    token_type_ids: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
    return_src: bool = False,
):
    """Returns (tim_ids, tim_mask, tim_token_type_ids, labels) — plus the
    row-source index ``src`` when ``return_src`` (so the row-sparse embedding
    path can permute pre-gathered embeddings the same way, train/lazy_emb.py).

    * coin-flip per example whether to mismatch (labels: 1=match, 0=mismatch)
    * mismatched examples take the text of a uniformly-chosen *other* example
    * batch of one degenerates to all-match (reference mm_late.py:408-409)
    * with ``valid`` (padded batches), padded rows never swap and are labeled
      match; partners are drawn among all rows — padded partner texts are
      themselves real-shaped buffers and the loss masks padded rows out.
    """
    b = ids.shape[0]
    k_flip, k_partner = jax.random.split(key)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    if b > 1:
        offset = jax.random.randint(k_partner, (b,), 1, b)
        partner = (jnp.arange(b) + offset) % b
    else:
        flip = jnp.zeros((b,), bool)
        partner = jnp.arange(b)
    if valid is not None:
        flip = jnp.logical_and(flip, valid.astype(bool))
    src = jnp.where(flip, partner, jnp.arange(b))
    labels = jnp.where(flip, 0, 1).astype(jnp.int32)
    tim_ids = jnp.take(ids, src, axis=0)
    tim_mask = jnp.take(mask, src, axis=0)
    tim_tt = None if token_type_ids is None else jnp.take(token_type_ids, src, axis=0)
    if return_src:
        return tim_ids, tim_mask, tim_tt, labels, src
    return tim_ids, tim_mask, tim_tt, labels
