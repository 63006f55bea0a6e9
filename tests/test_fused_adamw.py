"""fused_adamw (train/optim.py): one-tree_map AdamW must reproduce
optax.adamw trajectories exactly (same expressions, same order)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
    fused_adamw, make_optimizer, vision_frozen_predicate,
)


def _tree(rng, scale=1.0):
    return {
        "a": {"kernel": jnp.asarray(rng.randn(8, 16) * scale, jnp.float32),
              "bias": jnp.asarray(rng.randn(16) * scale, jnp.float32)},
        "vision": {"kernel": jnp.asarray(rng.randn(4, 4) * scale, jnp.float32)},
    }


def _run(tx, params, grads_seq):
    state = tx.init(params)
    out = []
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
        out.append(params)
    return params, out


def test_fused_matches_optax_bitwise(rng):
    params = _tree(rng)
    grads_seq = [_tree(np.random.RandomState(10 + i), scale=0.1)
                 for i in range(5)]
    ref = optax.adamw(learning_rate=1e-3, weight_decay=2.5e-4,
                      b1=0.9, b2=0.999, eps=1e-8)
    fused = fused_adamw(1e-3, 2.5e-4)
    p_ref, traj_ref = _run(ref, params, grads_seq)
    p_fused, traj_fused = _run(fused, params, grads_seq)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)


def test_fused_bf16_moments_match(rng):
    params = _tree(rng)
    grads_seq = [_tree(np.random.RandomState(20 + i), scale=0.1)
                 for i in range(3)]
    ref = optax.adamw(learning_rate=1e-3, weight_decay=2.5e-4,
                      b1=0.9, b2=0.999, eps=1e-8, mu_dtype=jnp.bfloat16)
    fused = fused_adamw(1e-3, 2.5e-4, mu_dtype="bfloat16")
    p_ref, _ = _run(ref, params, grads_seq)
    p_fused, _ = _run(fused, params, grads_seq)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_make_optimizer_fused_respects_frozen(rng):
    params = _tree(rng)
    grads = _tree(np.random.RandomState(30), scale=0.1)
    tx = make_optimizer(1e-3, 2.5e-4, vision_frozen_predicate, fused=True)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["vision"]["kernel"]),
                                  np.asarray(params["vision"]["kernel"]))
    assert not np.allclose(np.asarray(new["a"]["kernel"]),
                           np.asarray(params["a"]["kernel"]))

    # and matches the unfused masked optimizer
    tx0 = make_optimizer(1e-3, 2.5e-4, vision_frozen_predicate, fused=False)
    u0, _ = tx0.update(grads, tx0.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(optax.apply_updates(params, u0)),
                    jax.tree_util.tree_leaves(new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)
