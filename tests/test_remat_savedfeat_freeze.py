"""Remaining flag paths: --remat (identical forward), --use_saved_features
(disk uint8 cache), --freeze (text tower frozen)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
    BertEncoder, EncoderConfig,
)

from fixtures import make_task_fixture, patch_task

FAST = ["--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
        "--epochs", "1", "--log_every", "1"]


def test_remat_forward_matches(rng):
    base = dict(vocab_size=40, hidden=16, layers=2, heads=2, mlp_dim=32,
                max_positions=12, type_vocab=1, dropout=0.0)
    plain = BertEncoder(EncoderConfig(**base))
    remat = BertEncoder(EncoderConfig(remat=True, **base))
    ids = jnp.array(rng.randint(0, 40, (2, 8)))
    mask = jnp.ones((2, 8), jnp.int32)
    params = plain.init(jax.random.PRNGKey(0), ids, mask)
    h1, p1 = plain.apply(params, ids, mask)
    h2, p2 = remat.apply(params, ids, mask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)

    # gradients must match too (remat trades memory, not math)
    def loss(m):
        def f(p):
            h, _ = m.apply(p, ids, mask)
            return jnp.sum(h * h)
        return f
    g1 = jax.grad(loss(plain))(params)
    g2 = jax.grad(loss(remat))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.fixture
def task3(tmp_path, monkeypatch):
    csv_path, img_fmt, _ = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    monkeypatch.setattr(C, "DATA_PATH", str(tmp_path / "cache_root") + "/")
    os.makedirs(str(tmp_path / "cache_root"), exist_ok=True)
    return tmp_path


def test_use_saved_features_builds_disk_cache(task3):
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_late

    run_mm_late.main([
        "--txt_model_name", "bert", "--img_model_name", "vit",
        "--fusion_name", "concat", "--task", "3", "--use_saved_features",
    ] + FAST)
    cache_dir = C.DATA_PATH + "cache/mvsa_u8_224"
    assert os.path.isfile(os.path.join(cache_dir, "pixels.npy"))
    # second run must reuse the cache (mtime unchanged)
    mtime = os.path.getmtime(os.path.join(cache_dir, "pixels.npy"))
    run_mm_late.main([
        "--txt_model_name", "bert", "--img_model_name", "vit",
        "--fusion_name", "concat", "--task", "3", "--use_saved_features",
    ] + FAST)
    assert os.path.getmtime(os.path.join(cache_dir, "pixels.npy")) == mtime


def test_run_txt_freeze_keeps_tower_fixed(task3):
    import argparse

    from socialmedia_textimage_classification_auxlosses_tpu.cli._build import (
        build_text_setup,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli.run_txt import parse_args

    args = parse_args(["--model_name", "bert", "--task", "3"] + FAST)
    cfg = C.Config(args, multimodal=False, txt=True)
    setup = build_text_setup(args, cfg, freeze=True)
    batch = jax.device_put(next(setup.pipes["train"].batches()))
    # snapshot to host BEFORE the step (the jitted step donates its inputs)
    before = [np.asarray(x) for x in
              jax.tree_util.tree_leaves(setup.params["params"]["tower"])]
    head_before = np.asarray(setup.params["params"]["classifier"]["kernel"])
    p2, _, _ = setup.train_step(setup.params, setup.opt_state, batch,
                                jax.random.PRNGKey(0))
    after = jax.tree_util.tree_leaves(p2["params"]["tower"])
    for a, b in zip(before, after):
        assert np.array_equal(a, np.asarray(b))
    # the classification head must still move
    assert not np.array_equal(head_before,
                              np.asarray(p2["params"]["classifier"]["kernel"]))


def test_cache_vision_equivalence(tmp_path, monkeypatch):
    """--cache_vision must not change training results: the frozen vision
    tower's cached activations are the same activations the fused step
    would compute; epochs after the first never re-run the tower."""
    import jax
    import pandas as pd

    from fixtures import make_task_fixture, patch_task
    from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_late

    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3)
    base = ["--txt_model_name", "bert", "--img_model_name", "vit",
            "--fusion_name", "attention", "--task", "3", "--arch", "tiny",
            "--dtype", "float32", "--attn_impl", "jnp", "--epochs", "2",
            "--image_size", "32", "--use_clip_loss", "--use_tim_loss"]
    stem = "bert-vit-attention_task3_seed30_itc0.1itm0.1_"

    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "plain")
    run_mm_late.main(base)
    plain = pd.read_csv(C.results_dir_mm_late + stem + "metrics_val.csv")

    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "cached")
    run_mm_late.main(base + ["--cache_vision"])
    cached = pd.read_csv(C.results_dir_mm_late + stem + "metrics_val.csv")

    for col in ("epoch-1", "epoch-2"):
        # the cache's standalone vision jit fuses differently than the
        # in-step tower -> f32 rounding drift compounds over 2 epochs
        np.testing.assert_allclose(cached[col].values.astype(float),
                                   plain[col].values.astype(float),
                                   rtol=1e-3, atol=1e-5)


def test_cache_vision_with_chunked_dispatch(tmp_path, monkeypatch):
    """--cache_vision composes with --steps_per_dispatch: the cached pipe's
    chunked iterator matches the per-step cached run's metrics exactly."""
    import pandas as pd

    from fixtures import make_task_fixture, patch_task
    from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_late

    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3)
    base = ["--txt_model_name", "bert", "--img_model_name", "vit",
            "--fusion_name", "attention", "--task", "3", "--arch", "tiny",
            "--dtype", "float32", "--attn_impl", "jnp", "--epochs", "2",
            "--image_size", "32", "--use_clip_loss", "--use_tim_loss",
            "--cache_vision"]
    stem = "bert-vit-attention_task3_seed30_itc0.1itm0.1_"

    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "perstep")
    run_mm_late.main(base)
    perstep = pd.read_csv(C.results_dir_mm_late + stem + "metrics_val.csv")

    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "chunked")
    run_mm_late.main(base + ["--steps_per_dispatch", "2"])
    chunked = pd.read_csv(C.results_dir_mm_late + stem + "metrics_val.csv")

    for col in ("epoch-1", "epoch-2"):
        np.testing.assert_allclose(chunked[col].values.astype(float),
                                   perstep[col].values.astype(float),
                                   rtol=1e-6, atol=1e-7)


def test_vision_cache_hits_after_first_epoch(tmp_path, monkeypatch):
    """The vision jit runs once per unique batch, then the cache serves."""
    import jax

    from fixtures import make_task_fixture, patch_task
    from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_late
    from socialmedia_textimage_classification_auxlosses_tpu.cli._build import (
        build_mm_late_setup, enable_vision_cache,
    )

    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "res")
    args = run_mm_late.parse_args([
        "--txt_model_name", "bert", "--img_model_name", "vit",
        "--fusion_name", "attention", "--task", "3", "--arch", "tiny",
        "--dtype", "float32", "--attn_impl", "jnp", "--image_size", "32"])
    cfg = C.Config(args)
    setup = enable_vision_cache(build_mm_late_setup(args, cfg))
    pipe = setup.pipes["train"]
    for _ in pipe.device_iter(shuffle=False):
        pass
    calls_epoch1 = pipe.compute_calls
    assert calls_epoch1 == pipe.num_batches
    for _ in pipe.device_iter(shuffle=False):
        pass
    assert pipe.compute_calls == calls_epoch1  # all cache hits
