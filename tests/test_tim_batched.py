"""Batched-TIM dispatch parity: ViLT / LXMERT / MMBT run the primary and
TIM-swapped joint passes as ONE 2B-row backbone dispatch (``tim_batched``,
default True) instead of the reference's two sequential B-row passes
(reference ``mm_early.py:78-92,146-160``). Per-row math is identical — each
row still attends only within its own (text, image/ROI) pair — so the
deterministic outputs must match the two-pass layout exactly; only the MXU
fill (and the training-mode dropout stream) changes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
    EncoderConfig,
)

TINY = dict(vocab_size=50, hidden=16, layers=2, heads=2, mlp_dim=32,
            max_positions=20, type_vocab=2, dropout=0.0, dtype="float32")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _assert_outputs_match(batched, twopass):
    for k in ("out_cls", "logits_per_text", "out_tim", "mm_features"):
        a, b = batched[k], twopass[k]
        if a is None:
            assert b is None, k
            continue
        # XLA may tile the 2B-row matmuls differently than the B-row ones,
        # so identical per-row MATH can differ by a float32 ULP or two
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=5e-6, err_msg=k)


def test_vilt_tim_batched_matches_two_pass(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.vilt import (
        ViltClassifier,
    )

    cfg = EncoderConfig(**TINY)
    b = 3
    ids = jnp.asarray(rng.randint(0, 50, (b, 8)), jnp.int32)
    mask = jnp.asarray(rng.rand(b, 8) > 0.2, jnp.int32).at[:, 0].set(1)
    tt = jnp.zeros((b, 8), jnp.int32)
    px = jnp.asarray(rng.randn(b, 32, 32, 3), jnp.float32)
    kw = dict(tim_ids=ids[::-1], tim_mask=mask[::-1],
              tim_token_type_ids=tt, deterministic=True)
    models = [ViltClassifier(cfg, num_labels=3, patch=8, image_size=32,
                             dropout=0.0, tim_batched=tb)
              for tb in (True, False)]
    params = models[0].init(jax.random.PRNGKey(0), ids, mask, tt, px, **kw)
    _assert_outputs_match(models[0].apply(params, ids, mask, tt, px, **kw),
                          models[1].apply(params, ids, mask, tt, px, **kw))


def test_lxmert_tim_batched_matches_two_pass(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.lxmert import (
        LxmertClassifier, LxmertConfig,
    )

    cfg = LxmertConfig(vocab_size=60, hidden=16, heads=2, mlp_dim=32,
                       max_positions=20, l_layers=2, r_layers=1, x_layers=1,
                       visual_feat_dim=8, dropout=0.0, dtype="float32")
    b = 3
    ids = jnp.asarray(rng.randint(0, 60, (b, 9)), jnp.int32)
    mask = jnp.asarray(rng.rand(b, 9) > 0.2, jnp.int32).at[:, 0].set(1)
    tt = jnp.zeros((b, 9), jnp.int32)
    feats = jnp.asarray(rng.randn(b, 5, 8), jnp.float32)
    pos = jnp.asarray(rng.rand(b, 5, 4), jnp.float32)
    kw = dict(tim_ids=ids[::-1], tim_mask=mask[::-1],
              tim_token_type_ids=tt, deterministic=True)
    models = [LxmertClassifier(cfg, num_labels=3, dropout=0.0, tim_batched=tb)
              for tb in (True, False)]
    params = models[0].init(jax.random.PRNGKey(0), ids, mask, tt, feats,
                            pos, **kw)
    _assert_outputs_match(
        models[0].apply(params, ids, mask, tt, feats, pos, **kw),
        models[1].apply(params, ids, mask, tt, feats, pos, **kw))


def test_mmbt_tim_batched_matches_two_pass(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.mmbt import (
        MmbtClassifier,
    )

    model_kw = dict(num_labels=3, cnn_name="resnet50", dropout=0.0)
    enc = EncoderConfig(**{**TINY, "vocab_size": 64, "max_positions": 64})
    b, L = 3, 12
    ids = np.asarray(rng.randint(4, 60, (b, L)), np.int32)
    ids[:, 0] = 1
    ids[:, -1] = 2
    mask = np.ones((b, L), np.int32)
    px = rng.rand(b, 32, 32, 3).astype(np.float32)
    ids, mask, px = jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(px)
    kw = dict(tim_ids=ids[::-1], tim_mask=mask[::-1], deterministic=True)
    models = [MmbtClassifier(enc, tim_batched=tb, **model_kw)
              for tb in (True, False)]
    params = models[0].init(jax.random.PRNGKey(0), ids, mask, px, **kw)
    _assert_outputs_match(models[0].apply(params, ids, mask, px, **kw),
                          models[1].apply(params, ids, mask, px, **kw))


def test_vilt_tim_batched_grads_match(rng):
    """The backward of the batched layout equals the two-pass backward (the
    concat/split is linear): training trajectories are identical wherever
    dropout is off, not just forward values."""
    from socialmedia_textimage_classification_auxlosses_tpu.models.vilt import (
        ViltClassifier,
    )

    cfg = EncoderConfig(**TINY)
    b = 2
    ids = jnp.asarray(rng.randint(0, 50, (b, 8)), jnp.int32)
    mask = jnp.ones((b, 8), jnp.int32)
    tt = jnp.zeros((b, 8), jnp.int32)
    px = jnp.asarray(rng.randn(b, 32, 32, 3), jnp.float32)
    kw = dict(tim_ids=ids[::-1], tim_mask=mask, tim_token_type_ids=tt,
              deterministic=True)
    models = [ViltClassifier(cfg, num_labels=3, patch=8, image_size=32,
                             dropout=0.0, tim_batched=tb)
              for tb in (True, False)]
    params = models[0].init(jax.random.PRNGKey(0), ids, mask, tt, px, **kw)

    def loss(m):
        def f(p):
            out = m.apply(p, ids, mask, tt, px, **kw)
            return (out["out_cls"].sum() + out["out_tim"].sum()
                    + out["logits_per_text"].sum())
        return f

    ga = jax.grad(loss(models[0]))(params)
    gb = jax.grad(loss(models[1]))(params)
    for (path, a), bb in zip(jax.tree_util.tree_leaves_with_path(ga),
                             jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-5, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))


def test_lxmert_tim_batched_grads_match(rng):
    """LXMERT's backward through the 2B-row slice (incl. the ITC
    stop-gradient interaction) equals the two-pass backward."""
    from socialmedia_textimage_classification_auxlosses_tpu.models.lxmert import (
        LxmertClassifier, LxmertConfig,
    )

    cfg = LxmertConfig(vocab_size=60, hidden=16, heads=2, mlp_dim=32,
                       max_positions=20, l_layers=2, r_layers=1, x_layers=1,
                       visual_feat_dim=8, dropout=0.0, dtype="float32")
    b = 2
    ids = jnp.asarray(rng.randint(0, 60, (b, 9)), jnp.int32)
    mask = jnp.ones((b, 9), jnp.int32)
    tt = jnp.zeros((b, 9), jnp.int32)
    feats = jnp.asarray(rng.randn(b, 5, 8), jnp.float32)
    pos = jnp.asarray(rng.rand(b, 5, 4), jnp.float32)
    kw = dict(tim_ids=ids[::-1], tim_mask=mask, tim_token_type_ids=tt,
              deterministic=True)
    models = [LxmertClassifier(cfg, num_labels=3, dropout=0.0, tim_batched=tb)
              for tb in (True, False)]
    params = models[0].init(jax.random.PRNGKey(0), ids, mask, tt, feats,
                            pos, **kw)

    def loss(m):
        def f(p):
            out = m.apply(p, ids, mask, tt, feats, pos, **kw)
            return (out["out_cls"].sum() + out["out_tim"].sum()
                    + out["logits_per_text"].sum())
        return f

    ga = jax.grad(loss(models[0]))(params)
    gb = jax.grad(loss(models[1]))(params)
    for (path, a), bb in zip(jax.tree_util.tree_leaves_with_path(ga),
                             jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-5, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))


def test_mmbt_tim_batched_grads_and_bn_stats_match(rng):
    """MMBT's backward AND the mutable batch_stats update (the CNN trunk
    sees only the B primary rows either way — img_tokens are computed once
    and concatenated) match the two-pass layout under train=True."""
    from socialmedia_textimage_classification_auxlosses_tpu.models.mmbt import (
        MmbtClassifier,
    )

    model_kw = dict(num_labels=3, cnn_name="resnet50", dropout=0.0)
    enc = EncoderConfig(**{**TINY, "vocab_size": 64, "max_positions": 64})
    b, L = 2, 12
    ids = np.asarray(rng.randint(4, 60, (b, L)), np.int32)
    ids[:, 0] = 1
    ids[:, -1] = 2
    mask = np.ones((b, L), np.int32)
    px = rng.rand(b, 32, 32, 3).astype(np.float32)
    ids, mask, px = jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(px)
    kw = dict(tim_ids=ids[::-1], tim_mask=mask, deterministic=True)
    models = [MmbtClassifier(enc, tim_batched=tb, **model_kw)
              for tb in (True, False)]
    variables = models[0].init(jax.random.PRNGKey(0), ids, mask, px, **kw)

    def loss(m):
        def f(p):
            out, upd = m.apply(
                {**p, "batch_stats": variables["batch_stats"]},
                ids, mask, px, tim_ids=ids[::-1], tim_mask=mask,
                deterministic=True, train=True, mutable=["batch_stats"])
            val = (out["out_cls"].sum() + out["out_tim"].sum()
                   + out["logits_per_text"].sum())
            return val, upd
        return f

    p0 = {"params": variables["params"]}
    (va, ua), ga = jax.value_and_grad(loss(models[0]), has_aux=True)(p0)
    (vb, ub), gb = jax.value_and_grad(loss(models[1]), has_aux=True)(p0)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-5)
    # Wider tolerance than the vilt/lxmert grad tests: the untrained
    # ResNet trunk's un-normalized activations (~1e4-1e6) amplify the f32
    # accumulation-order delta between the 2B-row and two-B-row backward
    # tilings (observed up to ~8e-4 relative on CNN BN leaves), and
    # mathematically-zero leaves (attention key bias — softmax is invariant
    # to a per-query constant) are pure noise in BOTH layouts. The test
    # guards the STRUCTURAL invariant — wrong row pairing or a dropped TIM
    # grad path is an order-1 error — so compare per-leaf relative to the
    # GLOBAL gradient magnitude.
    leaves_a = jax.tree_util.tree_leaves_with_path(ga)
    leaves_b = jax.tree_util.tree_leaves(gb)
    gscale = max(float(np.abs(np.asarray(x)).max()) for x in leaves_b)
    for (path, a), bb in zip(leaves_a, leaves_b):
        a, bb = np.asarray(a), np.asarray(bb)
        # per-leaf scale, floored at 1e-5 of the global max so that
        # noise-only leaves don't fail spuriously while real leaves are
        # still held to 2e-3 of their own magnitude
        scale = max(np.abs(a).max(), np.abs(bb).max(), 1e-5 * gscale)
        np.testing.assert_allclose(
            a / scale, bb / scale, rtol=0, atol=2e-3,
            err_msg=jax.tree_util.keystr(path))
    for (path, a), bb in zip(jax.tree_util.tree_leaves_with_path(ua),
                             jax.tree_util.tree_leaves(ub)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-6,
            err_msg="batch_stats " + jax.tree_util.keystr(path))
