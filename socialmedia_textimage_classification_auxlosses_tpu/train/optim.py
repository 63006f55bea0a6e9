"""Optimizer setup (reference ``utils.py:280-292`` + the frozen-vision filter
at ``mm_late.py:67-69``).

The reference builds one AdamW param group from ``requires_grad`` params
(lr + weight_decay on everything trainable, including biases/LN — torch
AdamW semantics). Here that is ``optax.adamw`` with a trainability mask:
frozen subtrees (the dual encoder's vision tower) get ``set_to_zero``, so
their params never move and their optimizer state is empty — the optax
equivalent of excluding them from the param group.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def _path_contains(path, token: str) -> bool:
    return any(token in str(getattr(p, "key", p)) for p in path)


def vision_frozen_predicate(path, _) -> bool:
    """Freeze every param under a ``vision`` scope (reference
    mm_late.py:67-69 freezes dual-encoder params whose name contains
    'vision')."""
    return _path_contains(path, "vision")


def batch_stats_predicate(path, _) -> bool:
    """BatchNorm running statistics live in the variables tree; they must
    never receive AdamW weight decay (a zero-grad param still decays)."""
    return _path_contains(path, "batch_stats")


def feature_extract_predicate(path, _) -> bool:
    """``--feature_extract``: freeze the conv trunk, train only the fc head
    (reference image_only.py:54-88)."""
    keys = [str(getattr(p, "key", p)) for p in path]
    return "fc" not in keys


def any_of(*preds):
    return lambda path, x: any(p(path, x) for p in preds)


def fused_adamw(
    lr: float,
    weight_decay: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """AdamW as ONE tree_map (vs optax's scale_by_adam -> add_decayed_weights
    -> scale chain of separate tree traversals).

    Identical math to ``optax.adamw`` — same expressions in the same order,
    trajectory-equivalence-tested (tests/test_fused_adamw.py) — but the whole
    read-modify-write for each leaf (g, m, v, p -> m', v', update) is emitted
    as one fusion candidate, so XLA schedules one elementwise kernel per leaf
    instead of several. Measured on the flagship step (batch 8, v5e): the
    optax chain costs ~5.7 ms/step against a ~3.1 ms HBM-traffic floor
    (BASELINE.md round-3 ablation); this recovers most of the overhead.
    """
    mu_dtype = None if mu_dtype is None else jnp.dtype(mu_dtype)

    def init(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(grads, state, params):
        if params is None:
            raise ValueError("fused_adamw needs params (weight decay)")
        count = optax.safe_int32_increment(state.count)

        def leaf(g, m, v, p):
            # optax.update_moment order: decay*t computed in the moment's
            # own dtype (bf16 mu stays bf16 until the add) — matched for
            # bitwise equivalence under mu_dtype
            m2 = (1.0 - b1) * g + b1 * m
            v2 = (1.0 - b2) * jnp.square(g) + b2 * v
            mhat = m2 / (1.0 - b1 ** count.astype(jnp.float32))
            vhat = v2 / (1.0 - b2 ** count.astype(jnp.float32))
            upd = mhat / (jnp.sqrt(vhat) + eps) + weight_decay * p
            return (m2.astype(mu_dtype or g.dtype), v2, -lr * upd)

        out = jax.tree_util.tree_map(leaf, grads, state.mu, state.nu, params)
        # plain tuples only: multi_transform's MaskedNode placeholders are
        # NamedTuples (empty pytree nodes) and must stay containers
        is_t = lambda x: type(x) is tuple
        m2 = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=is_t)
        v2 = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=is_t)
        upd = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=is_t)
        return upd, optax.ScaleByAdamState(count=count, mu=m2, nu=v2)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float,
    weight_decay: float,
    frozen_predicate: Optional[Callable] = None,
    grad_clip: Optional[float] = None,
    mu_dtype=None,
    fused: bool = False,
) -> optax.GradientTransformation:
    """``mu_dtype='bfloat16'`` stores AdamW's FIRST moment in bf16
    (``--opt_moments bf16``): halves the m-state HBM traffic per step — the
    optimizer update is weight-HBM-bound at the paper's batch sizes
    (BASELINE.md) — while the variance and params stay f32 (the sqrt in the
    update is precision-sensitive; the momentum average is not).
    Loss-trajectory equivalence at tiny scale: tests/test_optim_moments.py.
    ``fused=True`` swaps in the single-tree_map ``fused_adamw`` (identical
    math; tests/test_fused_adamw.py)."""
    if fused:
        adamw = fused_adamw(lr, weight_decay, mu_dtype=mu_dtype)
    else:
        adamw = optax.adamw(learning_rate=lr, weight_decay=weight_decay,
                            b1=0.9, b2=0.999, eps=1e-8, mu_dtype=mu_dtype)
    if grad_clip:
        adamw = optax.chain(optax.clip_by_global_norm(grad_clip), adamw)
    if frozen_predicate is None:
        return adamw

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, x: "frozen" if frozen_predicate(path, x) else "train", params
        )

    return optax.multi_transform(
        {"train": adamw, "frozen": optax.set_to_zero()}, label_fn
    )


def count_params(params, trainable_only=False,
                 frozen_predicate: Optional[Callable] = None) -> int:
    """Total parameter count (the reference prints it, mm_late.py:423)."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if trainable_only and frozen_predicate and frozen_predicate(path, leaf):
            continue
        total += leaf.size
    return total
