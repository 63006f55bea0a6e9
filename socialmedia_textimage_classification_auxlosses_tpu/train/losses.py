"""Losses (L5).

JAX implementations with the exact semantics the reference gets from torch:

* ``weighted_ce``       — ``nn.CrossEntropyLoss(weight)`` over *float one-hot /
                          probability* targets (reference run_mm_late.py:85,
                          mm_late.py:471 ``label.type_as(output)``): per-sample
                          loss ``-sum_c w_c t_c log p_c``, mean over batch.
* ``bce_with_logits``   — ``nn.BCEWithLogitsLoss(pos_weight)`` for the
                          multilabel tasks (reference run_mm_late.py:85).
* ``clip_loss``         — symmetric contrastive CE over the similarity matrix
                          with diagonal targets (reference utils.py:225-231).
                          Under data parallelism the similarity matrix is the
                          *global* batch: embeddings sharded on the data axis
                          are contracted into a BxB matrix, and XLA inserts the
                          all-gather over ICI automatically.
* ``int_ce``            — unweighted CE with integer labels, for the ITM head
                          (reference run_mm_late.py:97 ``tim_loss_fn``).
* ``loss_correction``   — noisy-label transition-matrix correction
                          (reference utils.py:245-276, arXiv 2102.05336),
                          vectorised (the reference loops over the batch).

All losses accept an optional per-sample ``mask`` so a padded final eval batch
(static XLA shapes) contributes nothing; with ``mask=None`` they match torch's
``reduction='mean'`` bit-for-bit in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(per_sample: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(per_sample)
    mask = mask.astype(per_sample.dtype)
    return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def weighted_ce(
    logits: jax.Array,
    targets: jax.Array,
    class_weights: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    reduction: str = "mean",
) -> jax.Array:
    """Cross entropy over probability targets with optional class weights.

    torch semantics for probability targets: ``loss_i = -sum_c w_c t_ic
    log_softmax(x_i)_c``; ``'mean'`` divides by batch size (not by the weight
    sum — that normalisation only applies to class-index targets).
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    w = targets if class_weights is None else targets * class_weights[None, :]
    per_sample = -jnp.sum(w * logp, axis=-1)
    if reduction == "none":
        return per_sample
    return _masked_mean(per_sample, mask)


def int_ce(
    logits: jax.Array,
    labels: jax.Array,
    mask: Optional[jax.Array] = None,
    reduction: str = "mean",
) -> jax.Array:
    """Unweighted CE with integer class labels (torch default semantics)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_sample = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if reduction == "none":
        return per_sample
    return _masked_mean(per_sample, mask)


def bce_with_logits(
    logits: jax.Array,
    targets: jax.Array,
    pos_weight: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """``BCEWithLogitsLoss(pos_weight)``: mean over all elements of
    ``-[w_c y log σ(x) + (1-y) log(1-σ(x))]`` (numerically stable form)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # log σ(x) = -softplus(-x); log(1-σ(x)) = -softplus(x)
    log_p = -jax.nn.softplus(-logits)
    log_not_p = -jax.nn.softplus(logits)
    w = jnp.ones_like(targets) if pos_weight is None else jnp.broadcast_to(pos_weight, targets.shape)
    per_elem = -(w * targets * log_p + (1.0 - targets) * log_not_p)
    per_sample = jnp.mean(per_elem, axis=-1)
    return _masked_mean(per_sample, mask)


def contrastive_loss(logits: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """CE(logits, arange(N)) — one direction of the CLIP objective
    (reference utils.py:225-226). With ``mask`` (padded batch), padded rows
    drop out of the mean and padded columns are excluded as negatives."""
    n = logits.shape[0]
    logits = logits.astype(jnp.float32)
    if mask is not None:
        col_bias = jnp.where(mask > 0, 0.0, _NEG_BIAS)
        logits = logits + col_bias[None, :]
    labels = jnp.arange(n)
    return int_ce(logits, labels, mask=mask)


_NEG_BIAS = -1e9


def clip_loss(similarity: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """Symmetric image-text contrastive loss (reference utils.py:228-231).

    ``similarity`` is logits_per_text: rows = texts, cols = images. With a
    padded batch, ``mask`` removes the padded rows/cols entirely, matching
    the reference's unpadded small final batch.
    """
    caption_loss = contrastive_loss(similarity, mask=mask)
    image_loss = contrastive_loss(similarity.T, mask=mask)
    return (caption_loss + image_loss) / 2.0


def loss_correction(
    T,
    logits: jax.Array,
    targets: jax.Array,
    class_weights: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Binary noisy-label correction (reference utils.py:245-276).

    ``T[i][j] = P(observed j | true i)``. The reference evaluates the
    class-conditional losses with a reduction='none' weighted CE and combines
    them per-sample; here that is a vectorised two-column combine.
    """
    T = jnp.asarray(T, dtype=jnp.float32)
    eneg, one_minus_eneg = T[0][1], T[0][0]
    eplus, one_minus_eplus = T[1][0], T[1][1]
    n = logits.shape[0]
    zeros = jnp.tile(jnp.array([[1.0, 0.0]], jnp.float32), (n, 1))
    ones = jnp.tile(jnp.array([[0.0, 1.0]], jnp.float32), (n, 1))
    loss_zero = weighted_ce(logits, zeros, class_weights, reduction="none")
    loss_one = weighted_ce(logits, ones, class_weights, reduction="none")
    is_one = jnp.argmax(targets, axis=1) == 1
    corrected = jnp.where(
        is_one,
        one_minus_eneg * loss_one - eplus * loss_zero,
        one_minus_eplus * loss_zero - eneg * loss_one,
    ) / (one_minus_eplus - eneg)
    return _masked_mean(corrected, mask)


def combined_loss(
    cls_loss: jax.Array,
    itc_loss: Optional[jax.Array],
    itm_loss: Optional[jax.Array],
    beta_itc: Optional[float],
    beta_itm: Optional[float],
) -> jax.Array:
    """The paper's beta-weighted objective (reference mm_late.py:473-487):

    ``(1 - (β_itc + β_itm)) · CE + β_itc · ITC + β_itm · ITM`` with each term
    dropping out when its flag is off.
    """
    if itc_loss is not None and itm_loss is not None:
        return (1.0 - (beta_itc + beta_itm)) * cls_loss + beta_itc * itc_loss + beta_itm * itm_loss
    if itc_loss is not None:
        return (1.0 - beta_itc) * cls_loss + beta_itc * itc_loss
    if itm_loss is not None:
        return (1.0 - beta_itm) * cls_loss + beta_itm * itm_loss
    return cls_loss
