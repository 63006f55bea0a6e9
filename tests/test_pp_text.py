"""Pipeline-parallel towers (parallel/pp_text.py + EncoderConfig.pp_runner):
model.apply with the GPipe runner must match the sequential stack — for the
text classifier AND the dual encoder's text side — plus CLI end-to-end runs
with --mesh_pipe."""

import os

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
    PipeMeshPlan, with_pp_runner,
)

from fixtures import run_cli_in_subprocess

TINY = dict(dropout=0.0, hidden=16, layers=4, heads=2, mlp_dim=32,
            max_positions=16, vocab_size=50, scan_layers=True,
            attn_impl="jnp")


def _tiny_cfg():
    return text_encoder_config("bert", None, **TINY)


@pytest.mark.parametrize("use_pooled", [False, True])
def test_pp_text_classifier_matches_sequential(rng, use_pooled):
    cfg = _tiny_cfg()
    model = TextClassifier(cfg, num_labels=3, head_dropout=0.0,
                           use_pooled=use_pooled)
    ids = jnp.array(rng.randint(0, 50, (8, 12)))
    mask = jnp.ones((8, 12), jnp.int32).at[3, 8:].set(0)
    tt = jnp.zeros((8, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, tt)

    mesh = make_pp_mesh(pipe=2, data=4)
    pp_model = TextClassifier(with_pp_runner(cfg, mesh, 2), num_labels=3,
                              head_dropout=0.0, use_pooled=use_pooled)
    plan = PipeMeshPlan(mesh)
    p_dev = plan.shard_params(params)

    ref = model.apply(params, ids, mask, tt, deterministic=True)
    out = pp_model.apply(p_dev, ids, mask, tt, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pp_text_classifier_gradients_match(rng):
    cfg = _tiny_cfg()
    model = TextClassifier(cfg, num_labels=3, head_dropout=0.0)
    ids = jnp.array(rng.randint(0, 50, (8, 12)))
    mask = jnp.ones((8, 12), jnp.int32)
    tt = jnp.zeros_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids, mask, tt)
    mesh = make_pp_mesh(pipe=4, data=2)
    pp_model = TextClassifier(with_pp_runner(cfg, mesh, 4), num_labels=3,
                              head_dropout=0.0)
    plan = PipeMeshPlan(mesh)
    labels = jnp.eye(3, dtype=jnp.float32)[np.arange(8) % 3]

    def loss(m):
        def f(p):
            logits = m.apply(p, ids, mask, tt, deterministic=True)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * labels, -1))
        return f

    g_pp = jax.grad(loss(pp_model))(plan.shard_params(params))
    g_ref = jax.grad(loss(model))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_pp_dual_encoder_text_side(rng):
    """MMLateModel with a pipelined text stack (frozen vision sequential)
    must reproduce the plain model's outputs."""
    from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
        EncoderConfig,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
        MMLateModel, init_mm_late_params,
    )

    text_cfg = _tiny_cfg()
    vis_cfg = EncoderConfig(vocab_size=1, hidden=16, layers=1, heads=2,
                            mlp_dim=32, max_positions=1, type_vocab=0,
                            ln_style="pre", dropout=0.0, attn_impl="jnp")

    def build(tc):
        return MMLateModel(tc, vis_cfg, num_labels=3,
                           fusion_name="attention", dropout=0.0, patch=8,
                           image_size=16)

    model = build(text_cfg)
    ids = jnp.array(rng.randint(0, 50, (8, 12)))
    mask = jnp.ones((8, 12), jnp.int32)
    pixels = jnp.array(rng.randn(8, 3, 16, 16), jnp.float32)
    params = init_mm_late_params(model, jax.random.PRNGKey(0), ids, mask,
                                 pixels)

    mesh = make_pp_mesh(pipe=2, data=4)
    pp_model = build(with_pp_runner(text_cfg, mesh, 2))

    def text_stack(keys):
        return "text" in keys and any(
            keys[i:i + 2] == ("layers", "layer") for i in range(len(keys)))

    plan = PipeMeshPlan(mesh, stack_pred=text_stack)
    p_dev = plan.shard_params(params)

    ref = model.apply(params, ids, mask, pixels, deterministic=True)
    out = pp_model.apply(p_dev, ids, mask, pixels, deterministic=True)
    for k in ("out_cls", "logits_per_text"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)


def test_run_txt_mesh_pipe_end_to_end(tmp_path):
    """Real CLI (subprocess — see fixtures.run_cli_in_subprocess): 2-stage
    pipeline x 4-way data on the virtual 8-CPU mesh."""
    res = run_cli_in_subprocess(
        "run_txt",
        ["--model_name", "bert", "--task", "3", "--epochs", "1",
         "--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
         "--scan_layers", "--mesh_pipe", "2", "--log_every", "1"],
        tmp_path)
    assert os.path.isfile(str(res / "txt_only") +
                          "/bert_task3_seed30_metrics_val.csv")


def test_run_mm_early_vilt_mesh_pipe_end_to_end(tmp_path):
    """ViLT's joint encoder (a TransformerStack) pipelines via the same
    config hook (subprocess — see fixtures.run_cli_in_subprocess).

    4 virtual devices (pipe=2 x data=2), not 8: this is the heaviest PP
    e2e program, and on a 1-core host eight partition threads racing
    compile+execute can miss even a 600 s collective rendezvous window
    (observed twice in full-suite runs, 2026-08-17); four threads keep the
    same pipe x data coverage with half the scheduling pressure."""
    res = run_cli_in_subprocess(
        "run_mm_early",
        ["--model", "vilt", "--task", "3", "--epochs", "1",
         "--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
         "--scan_layers", "--mesh_pipe", "2", "--log_every", "1"],
        tmp_path, n_devices=4)
    out = str(res / "mm_early") + "/"
    found = [f for f in os.listdir(out) if f.endswith("metrics_val.csv")]
    assert found, out


def test_run_txt_mesh_pipe_with_chunked_dispatch(tmp_path):
    """--mesh_pipe composes with --steps_per_dispatch (scan-of-shard_map +
    PipeMeshPlan.shard_batch_stacked; subprocess)."""
    res = run_cli_in_subprocess(
        "run_txt",
        ["--model_name", "bert", "--task", "3", "--epochs", "1",
         "--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
         "--scan_layers", "--mesh_pipe", "2", "--steps_per_dispatch", "2",
         "--log_every", "1"],
        tmp_path, n_devices=4)
    assert os.path.isfile(str(res / "txt_only") +
                          "/bert_task3_seed30_metrics_val.csv")


def test_run_img_mesh_pipe_end_to_end(tmp_path):
    """ViT image tower pipelines via the same hook (subprocess)."""
    res = run_cli_in_subprocess(
        "run_img",
        ["--model_name", "vit", "--task", "3", "--epochs", "1",
         "--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
         "--scan_layers", "--mesh_pipe", "2", "--log_every", "1"],
        tmp_path)
    out = str(res / "img_only") + "/"
    found = [f for f in os.listdir(out) if f.endswith("metrics_val.csv")]
    assert found, out


def test_run_mm_late_mesh_pipe_end_to_end(tmp_path):
    """Flagship runner with the pipelined text tower + aux losses
    (subprocess)."""
    res = run_cli_in_subprocess(
        "run_mm_late",
        ["--txt_model_name", "bert", "--img_model_name", "vit",
         "--fusion_name", "attention", "--task", "3", "--epochs", "1",
         "--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
         "--scan_layers", "--mesh_pipe", "2", "--use_clip_loss",
         "--use_tim_loss", "--log_every", "1"],
        tmp_path)
    out = str(res / "mm_late") + "/"
    found = [f for f in os.listdir(out) if f.endswith("metrics_val.csv")]
    assert found, out


def test_run_txt_mesh_pipe_interleaved_end_to_end(tmp_path):
    """--pp_interleave 2 (circular schedule): 2 stages x 2 levels over the
    4-layer small arch, real CLI in a subprocess."""
    res = run_cli_in_subprocess(
        "run_txt",
        ["--model_name", "bert", "--task", "3", "--epochs", "1",
         "--arch", "small", "--dtype", "float32", "--attn_impl", "jnp",
         "--scan_layers", "--mesh_pipe", "2", "--pp_interleave", "2",
         "--pp_microbatches", "2", "--log_every", "1"],
        tmp_path, n_devices=4)
    assert os.path.isfile(str(res / "txt_only") +
                          "/bert_task3_seed30_metrics_val.csv")


def test_mesh_pipe_dropout_no_warning(tmp_path, monkeypatch, caplog):
    """VERDICT r4 item 6: --mesh_pipe dropout>0 now draws bit-identical
    masks to the nn.scan stack (tests/test_pp_dropout_exact.py), so the old
    trajectory-comparability warning must be GONE at any dropout."""
    import logging

    from socialmedia_textimage_classification_auxlosses_tpu.cli import (
        run_txt)
    from socialmedia_textimage_classification_auxlosses_tpu.cli._build import (
        _maybe_pp)
    from socialmedia_textimage_classification_auxlosses_tpu.core import (
        config as C)
    from fixtures import make_task_fixture, patch_task

    csv_path, img_fmt, _ = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")

    base = ["--model_name", "bert", "--task", "3", "--arch", "tiny",
            "--scan_layers", "--mesh_pipe", "2"]
    for drop in ("0.2", "0.0"):
        args = run_txt.parse_args(base + ["--dropout", drop])
        cfg = C.Config(args)
        caplog.clear()
        with caplog.at_level(logging.WARNING):
            _maybe_pp(args, cfg, {"scan_layers": True})
        hits = [r for r in caplog.records
                if "trajectory-comparable" in r.getMessage()]
        assert not hits, (drop, caplog.text)
