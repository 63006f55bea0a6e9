"""Train/eval step tests: ITM swap semantics, padded-batch loss equivalence,
frozen-vision optimizer, and a tiny end-to-end MM-late train step with all
aux losses on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import EncoderConfig
from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
    MMLateModel, init_mm_late_params,
)
from socialmedia_textimage_classification_auxlosses_tpu.train import losses as L
from socialmedia_textimage_classification_auxlosses_tpu.train.itm import itm_swap
from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
    make_optimizer, vision_frozen_predicate, count_params,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
    LossConfig, make_train_step, make_eval_step,
)

TINY_TEXT = EncoderConfig(vocab_size=50, hidden=16, layers=1, heads=2, mlp_dim=32,
                          max_positions=16, type_vocab=2, dropout=0.0)
TINY_VISION = EncoderConfig(vocab_size=1, hidden=16, layers=1, heads=2, mlp_dim=32,
                            max_positions=1, type_vocab=0, ln_style="pre", dropout=0.0)


def test_itm_swap_semantics():
    key = jax.random.PRNGKey(0)
    ids = jnp.arange(8 * 4).reshape(8, 4)
    mask = jnp.ones((8, 4), jnp.int32)
    tim_ids, tim_mask, _, labels = itm_swap(key, ids, mask)
    swapped = np.any(np.asarray(tim_ids) != np.asarray(ids), axis=1)
    # label 0 <=> text was swapped with a different example's
    assert np.array_equal(swapped, np.asarray(labels) == 0)
    # swapped rows must come from another row of the batch
    for i in np.where(swapped)[0]:
        assert any(np.array_equal(np.asarray(tim_ids)[i], np.asarray(ids)[j])
                   for j in range(8) if j != i)


def test_itm_swap_batch_of_one():
    key = jax.random.PRNGKey(1)
    ids = jnp.ones((1, 4), jnp.int32)
    _, _, _, labels = itm_swap(key, ids, jnp.ones((1, 4), jnp.int32))
    assert int(labels[0]) == 1  # always match (reference mm_late.py:408-409)


def test_itm_swap_respects_valid_mask():
    key = jax.random.PRNGKey(2)
    ids = jnp.arange(6 * 3).reshape(6, 3)
    valid = jnp.array([1, 1, 1, 1, 0, 0])
    _, _, _, labels = itm_swap(key, ids, jnp.ones((6, 3), jnp.int32), valid=valid)
    assert np.all(np.asarray(labels)[4:] == 1)  # padded rows never mismatch


def test_clip_loss_padded_equals_unpadded(rng):
    sim_small = jnp.array(rng.randn(5, 5), jnp.float32)
    ref = float(L.clip_loss(sim_small))
    # embed in an 8x8 padded similarity matrix
    sim_big = jnp.array(rng.randn(8, 8), jnp.float32)
    sim_big = sim_big.at[:5, :5].set(sim_small)
    mask = jnp.array([1] * 5 + [0] * 3, jnp.float32)
    padded = float(L.clip_loss(sim_big, mask=mask))
    assert abs(ref - padded) < 1e-5


def _tiny_mm_model_and_batch(rng, batch=4, use_tt=True):
    model = MMLateModel(TINY_TEXT, TINY_VISION, num_labels=3,
                        fusion_name="attention", dropout=0.0,
                        patch=8, image_size=16)
    ids = jnp.array(rng.randint(0, 50, (batch, 12)))
    mask = jnp.ones((batch, 12), jnp.int32)
    tt = jnp.zeros((batch, 12), jnp.int32) if use_tt else None
    pixels = jnp.array(rng.randn(batch, 3, 16, 16), jnp.float32)
    labels = jnp.eye(3, dtype=jnp.float32)[rng.randint(0, 3, batch)]
    params = init_mm_late_params(model, jax.random.PRNGKey(0), ids, mask, pixels, tt)
    batch_d = {"ids": ids, "mask": mask, "token_type_ids": tt,
               "pixel_values": pixels, "labels": labels,
               "valid": jnp.ones((batch,), jnp.float32)}
    return model, params, batch_d


def _forward_fn(model):
    def forward(params, batch, tim_inputs, dropout_rng, deterministic):
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        return model.apply(
            params, batch["ids"], batch["mask"], batch["pixel_values"],
            batch.get("token_type_ids"),
            tim_ids=None if tim_inputs is None else tim_inputs["ids"],
            tim_mask=None if tim_inputs is None else tim_inputs["mask"],
            tim_token_type_ids=None if tim_inputs is None else tim_inputs["token_type_ids"],
            deterministic=deterministic, rngs=rngs,
        )
    return forward


def test_mm_late_train_step_all_aux(rng):
    model, params, batch = _tiny_mm_model_and_batch(rng)
    cfg = LossConfig(num_labels=3, use_clip_loss=True, use_tim_loss=True,
                     beta_itc=0.1, beta_itm=0.1)
    tx = make_optimizer(1e-3, 2.5e-4, vision_frozen_predicate)
    opt_state = tx.init(params)
    step = make_train_step(_forward_fn(model), cfg, tx,
                           class_weights=jnp.ones(3), donate=False)

    vision_before = jax.tree_util.tree_leaves(params["params"]["dual"]["vision"])
    p1, opt_state, m1 = step(params, opt_state, batch, jax.random.PRNGKey(1))
    p2, opt_state, m2 = step(p1, opt_state, batch, jax.random.PRNGKey(2))

    for k in ("loss", "cls_loss", "itc_loss", "itm_loss"):
        assert np.isfinite(float(m1[k])), k
    # frozen vision tower: bitwise unchanged
    vision_after = jax.tree_util.tree_leaves(p2["params"]["dual"]["vision"])
    for a, b in zip(vision_before, vision_after):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # text tower must have moved
    t0 = jax.tree_util.tree_leaves(params["params"]["dual"]["text"])[0]
    t2 = jax.tree_util.tree_leaves(p2["params"]["dual"]["text"])[0]
    assert not np.allclose(np.asarray(t0), np.asarray(t2))


def test_mm_late_eval_step_confusion(rng):
    model, params, batch = _tiny_mm_model_and_batch(rng)
    cfg = LossConfig(num_labels=3)
    estep = make_eval_step(_forward_fn(model), cfg, class_weights=jnp.ones(3))
    out = estep(params, batch, jax.random.PRNGKey(0))
    cm = np.asarray(out["cm"])
    assert cm.shape == (3, 3)
    assert cm.sum() == 4  # all four valid rows accounted for
    assert np.isfinite(float(out["loss"]))


def test_fusion_variants_forward(rng):
    for fusion in ("concat", "aspect-att", "gmu"):
        model = MMLateModel(TINY_TEXT, TINY_VISION, num_labels=2,
                            fusion_name=fusion, dropout=0.0, patch=8, image_size=16)
        ids = jnp.array(rng.randint(0, 50, (2, 8)))
        mask = jnp.ones((2, 8), jnp.int32)
        pixels = jnp.array(rng.randn(2, 3, 16, 16), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), ids, mask, pixels)
        out = model.apply(params, ids, mask, pixels)
        assert out["out_cls"].shape == (2, 2)
        assert out["logits_per_text"].shape == (2, 2)


def test_count_params_excludes_frozen(rng):
    model, params, _ = _tiny_mm_model_and_batch(rng)
    total = count_params(params)
    trainable = count_params(params, trainable_only=True,
                             frozen_predicate=vision_frozen_predicate)
    assert trainable < total
