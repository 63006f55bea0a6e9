"""Pipeline-parallel text classifier (parallel/pp_text.py): functional
forward parity with TextClassifier.apply, gradient parity, and the
run_txt --mesh_pipe CLI end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.models.text import (
    TextClassifier, text_encoder_config,
)
from socialmedia_textimage_classification_auxlosses_tpu.parallel.pipeline import (
    make_pp_mesh,
)
from socialmedia_textimage_classification_auxlosses_tpu.parallel.pp_text import (
    PipeMeshPlan, make_pp_text_forward,
)

from fixtures import make_task_fixture, patch_task


def _tiny_model(use_pooled=False):
    cfg = text_encoder_config(
        "bert", None, dropout=0.0, hidden=16, layers=4, heads=2, mlp_dim=32,
        max_positions=16, vocab_size=50, scan_layers=True, attn_impl="jnp",
    )
    return TextClassifier(cfg, num_labels=3, head_dropout=0.0,
                          use_pooled=use_pooled)


@pytest.mark.parametrize("use_pooled", [False, True])
def test_pp_forward_matches_model_apply(rng, use_pooled):
    model = _tiny_model(use_pooled)
    ids = jnp.array(rng.randint(0, 50, (8, 12)))
    mask = jnp.ones((8, 12), jnp.int32).at[3, 8:].set(0)
    tt = jnp.zeros((8, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, tt)

    mesh = make_pp_mesh(pipe=2, data=4)
    fwd = make_pp_text_forward(model, mesh, num_microbatches=2)
    plan = PipeMeshPlan(mesh)
    p_dev = plan.shard_params(params)
    batch = plan.shard_batch({"ids": ids, "mask": mask,
                              "token_type_ids": tt})

    ref = model.apply(params, ids, mask, tt, deterministic=True)
    out = fwd(p_dev, batch, None, None, True)["out_cls"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pp_gradients_match_model_apply(rng):
    model = _tiny_model()
    ids = jnp.array(rng.randint(0, 50, (8, 12)))
    mask = jnp.ones((8, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask,
                        jnp.zeros_like(ids))
    mesh = make_pp_mesh(pipe=4, data=2)
    fwd = make_pp_text_forward(model, mesh, num_microbatches=4)
    plan = PipeMeshPlan(mesh)
    batch = {"ids": ids, "mask": mask,
             "token_type_ids": jnp.zeros_like(ids)}
    labels = jnp.eye(3, dtype=jnp.float32)[np.arange(8) % 3]

    def loss_pp(p):
        logits = fwd(p, batch, None, None, True)["out_cls"]
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * labels, -1))

    def loss_ref(p):
        logits = model.apply(p, ids, mask, jnp.zeros_like(ids),
                             deterministic=True)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * labels, -1))

    g_pp = jax.grad(loss_pp)(plan.shard_params(params))
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


@pytest.fixture
def task3(tmp_path, monkeypatch):
    from socialmedia_textimage_classification_auxlosses_tpu.core import config as C

    csv_path, img_fmt, _ = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    return tmp_path


def test_run_txt_mesh_pipe_end_to_end(task3):
    """Real CLI: 2-stage pipeline x 4-way data on the virtual 8-CPU mesh."""
    import os

    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_txt

    run_txt.main(["--model_name", "bert", "--task", "3", "--epochs", "1",
                  "--arch", "tiny", "--dtype", "float32", "--attn_impl",
                  "jnp", "--scan_layers", "--mesh_pipe", "2",
                  "--log_every", "1"])
    out = str(task3 / "results" / "results_dir_txt") + "/"
    assert os.path.isfile(out + "bert_task3_seed30_metrics_val.csv")
