"""Row-sparse embedding AdamW (train/lazy_emb.py): exact-AdamW equivalence
when every vocab row is touched, untouched rows stay put otherwise."""

import jax
import jax.numpy as jnp
import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.train.lazy_emb import (
    LazyEmbConfig, find_word_embedding_path, init_lazy_state,
    lazy_emb_predicate,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
    make_optimizer,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
    LossConfig, make_train_step,
)

VOCAB, DIM, NL = 8, 4, 3
LR, WD = 1e-2, 2.5e-4


def _params(rng):
    return {
        "params": {
            "embeddings": {"word": {"embedding":
                jnp.asarray(rng.randn(VOCAB, DIM), jnp.float32)}},
            "head": {"kernel": jnp.asarray(rng.randn(DIM, NL), jnp.float32)},
        }
    }


def _forward(p, batch, tim_inputs, dropout_rng, deterministic):
    emb = p["params"]["embeddings"]["word"]["embedding"][batch["ids"]]
    pooled = emb.mean(axis=1)
    return {"out_cls": pooled @ p["params"]["head"]["kernel"]}


def _batch(ids, rng):
    b = ids.shape[0]
    labels = np.eye(NL, dtype=np.float32)[rng.randint(0, NL, b)]
    return {"ids": jnp.asarray(ids, jnp.int32),
            "mask": jnp.ones_like(jnp.asarray(ids, jnp.int32)),
            "labels": jnp.asarray(labels),
            "valid": jnp.ones((b,), jnp.float32)}


def _cfg(moment_dtype="float32"):
    return LazyEmbConfig(path=("params", "embeddings", "word", "embedding"),
                         lr=LR, weight_decay=WD, moment_dtype=moment_dtype)


def test_lazy_equals_exact_when_all_rows_touched(rng):
    """If the batch covers every vocab id each step, lazy AdamW IS AdamW."""
    loss_cfg = LossConfig(num_labels=NL)
    cw = jnp.ones(NL)
    ids = np.tile(np.arange(VOCAB), (2, 2))  # (2, 16) covers all rows

    p_exact = _params(np.random.RandomState(0))
    tx_e = make_optimizer(LR, WD)
    s_e = tx_e.init(p_exact)
    step_e = make_train_step(_forward, loss_cfg, tx_e, cw, donate=False)

    cfg = _cfg()
    p_lazy = _params(np.random.RandomState(0))
    tx_l = make_optimizer(LR, WD, lazy_emb_predicate(cfg))
    s_l = {"tx": tx_l.init(p_lazy), "lazy_emb": init_lazy_state(p_lazy, cfg)}
    step_l = make_train_step(_forward, loss_cfg, tx_l, cw, donate=False,
                             lazy_emb_cfg=cfg)

    for i in range(4):
        batch = _batch(ids, np.random.RandomState(100 + i))
        key = jax.random.PRNGKey(i)
        p_exact, s_e, m_e = step_e(p_exact, s_e, batch, key)
        p_lazy, s_l, m_l = step_l(p_lazy, s_l, batch, key)
        np.testing.assert_allclose(float(m_e["loss"]), float(m_l["loss"]),
                                   rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_exact),
                    jax.tree_util.tree_leaves(p_lazy)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_untouched_rows_stay_put(rng):
    """Rows absent from the batch keep their values and moments."""
    loss_cfg = LossConfig(num_labels=NL)
    cfg = _cfg()
    p = _params(np.random.RandomState(1))
    before = np.asarray(p["params"]["embeddings"]["word"]["embedding"]).copy()
    tx = make_optimizer(LR, WD, lazy_emb_predicate(cfg))
    state = {"tx": tx.init(p), "lazy_emb": init_lazy_state(p, cfg)}
    step = make_train_step(_forward, loss_cfg, tx, jnp.ones(NL), donate=False,
                           lazy_emb_cfg=cfg)
    ids = np.array([[1, 2, 2, 1], [3, 1, 3, 1]])  # touches rows 1,2,3 only
    p, state, _ = step(p, state, _batch(ids, np.random.RandomState(7)),
                       jax.random.PRNGKey(0))
    after = np.asarray(p["params"]["embeddings"]["word"]["embedding"])
    touched = sorted({1, 2, 3})
    untouched = [i for i in range(VOCAB) if i not in touched]
    np.testing.assert_array_equal(before[untouched], after[untouched])
    for r in touched:
        assert not np.allclose(before[r], after[r])
    mu = np.asarray(state["lazy_emb"]["mu"])
    np.testing.assert_array_equal(mu[untouched], np.zeros_like(mu[untouched]))


def test_bf16_moments_mode_runs(rng):
    cfg = _cfg(moment_dtype="bfloat16")
    p = _params(np.random.RandomState(2))
    tx = make_optimizer(LR, WD, lazy_emb_predicate(cfg))
    state = {"tx": tx.init(p), "lazy_emb": init_lazy_state(p, cfg)}
    step = make_train_step(_forward, LossConfig(num_labels=NL), tx,
                           jnp.ones(NL), donate=False, lazy_emb_cfg=cfg)
    ids = np.array([[0, 1], [2, 3]])
    p2, state, m = step(p, state, _batch(ids, np.random.RandomState(8)),
                        jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert state["lazy_emb"]["mu"].dtype == jnp.bfloat16


def test_find_word_embedding_path():
    tree = {"params": {"dual": {"text": {"embeddings": {"word": {
        "embedding": jnp.zeros((10, 4))}, "position": {
        "embedding": jnp.zeros((5, 4))}}}}}}
    assert find_word_embedding_path(tree) == (
        "params", "dual", "text", "embeddings", "word", "embedding")
    # ambiguous (two word embeddings) -> None
    tree2 = {"a": tree["params"], "b": tree["params"]}
    assert find_word_embedding_path(tree2) is None


def _forward_inject(p, batch, tim_inputs, dropout_rng, deterministic,
                    word_embeds=None, tim_word_embeds=None):
    if word_embeds is None:
        emb = p["params"]["embeddings"]["word"]["embedding"][batch["ids"]]
    else:
        emb = word_embeds
    pooled = emb.mean(axis=1)
    return {"out_cls": pooled @ p["params"]["head"]["kernel"]}


def test_injected_rows_match_exact_adamw(rng):
    """The row-grad path (word_embeds injection — no dense scatter-add) must
    still equal exact AdamW when the batch covers every vocab row."""
    loss_cfg = LossConfig(num_labels=NL)
    cw = jnp.ones(NL)
    ids = np.tile(np.arange(VOCAB), (2, 2))

    p_exact = _params(np.random.RandomState(0))
    tx_e = make_optimizer(LR, WD)
    s_e = tx_e.init(p_exact)
    step_e = make_train_step(_forward_inject, loss_cfg, tx_e, cw, donate=False)

    cfg = _cfg()
    p_inj = _params(np.random.RandomState(0))
    tx_i = make_optimizer(LR, WD, lazy_emb_predicate(cfg))
    s_i = {"tx": tx_i.init(p_inj), "lazy_emb": init_lazy_state(p_inj, cfg)}
    step_i = make_train_step(_forward_inject, loss_cfg, tx_i, cw, donate=False,
                             lazy_emb_cfg=cfg)

    for i in range(4):
        batch = _batch(ids, np.random.RandomState(200 + i))
        key = jax.random.PRNGKey(i)
        p_exact, s_e, m_e = step_e(p_exact, s_e, batch, key)
        p_inj, s_i, m_i = step_i(p_inj, s_i, batch, key)
        np.testing.assert_allclose(float(m_e["loss"]), float(m_i["loss"]),
                                   rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_exact),
                    jax.tree_util.tree_leaves(p_inj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_injected_matches_dense_grad_mode(rng):
    """Injected row-grads and dense-grad gathering are the same math."""
    loss_cfg = LossConfig(num_labels=NL)
    cfg = _cfg()
    cw = jnp.ones(NL)
    ids = np.array([[1, 5, 5, 2], [7, 1, 3, 1]])  # partial coverage

    p_a = _params(np.random.RandomState(3))
    tx_a = make_optimizer(LR, WD, lazy_emb_predicate(cfg))
    s_a = {"tx": tx_a.init(p_a), "lazy_emb": init_lazy_state(p_a, cfg)}
    step_a = make_train_step(_forward_inject, loss_cfg, tx_a, cw, donate=False,
                             lazy_emb_cfg=cfg)  # injected (has word_embeds)

    p_b = _params(np.random.RandomState(3))
    tx_b = make_optimizer(LR, WD, lazy_emb_predicate(cfg))
    s_b = {"tx": tx_b.init(p_b), "lazy_emb": init_lazy_state(p_b, cfg)}
    step_b = make_train_step(_forward, loss_cfg, tx_b, cw, donate=False,
                             lazy_emb_cfg=cfg)  # dense-grad fallback

    for i in range(3):
        batch = _batch(ids, np.random.RandomState(300 + i))
        key = jax.random.PRNGKey(i)
        p_a, s_a, m_a = step_a(p_a, s_a, batch, key)
        p_b, s_b, m_b = step_b(p_b, s_b, batch, key)
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p_a["params"]["embeddings"]["word"]["embedding"]),
        np.asarray(p_b["params"]["embeddings"]["word"]["embedding"]),
        rtol=1e-6, atol=1e-7)


def test_run_txt_lazy_emb_end_to_end(tmp_path, monkeypatch):
    """--opt_impl lazy_emb through the real CLI (run_txt): trains, writes the
    metrics CSV, and the word embedding actually moves."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_task_fixture, patch_task

    from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_txt

    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    run_txt.main(["--model_name", "bert", "--task", "3", "--arch", "tiny",
                  "--dtype", "float32", "--attn_impl", "jnp", "--epochs", "1",
                  "--opt_impl", "lazy_emb"])
    assert os.path.isfile(C.results_dir_txt + "bert_task3_seed30_metrics_val.csv")


def test_run_mm_late_lazy_emb_end_to_end(tmp_path, monkeypatch):
    """Flagship path under lazy_emb: run_mm_late with ITC+TIM (the injected
    row-grad mode drives the TIM concat through tim_word_embeds)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_task_fixture, patch_task

    from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_late

    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    run_mm_late.main([
        "--txt_model_name", "bernice", "--img_model_name", "vit",
        "--fusion_name", "attention", "--task", "3", "--arch", "tiny",
        "--dtype", "float32", "--attn_impl", "jnp", "--epochs", "1",
        "--image_size", "64", "--use_clip_loss", "--use_tim_loss",
        "--opt_impl", "lazy_emb",
    ])
    stem = C.results_dir_mm_late + "bernice-vit-attention_task3_seed30_itc0.1itm0.1_"
    assert os.path.isfile(stem + "metrics_val.csv")
