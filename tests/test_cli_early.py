"""End-to-end early-fusion CLI tests (ViLT + LXMERT with grid-ROI fallback),
plus the obj_features cacher."""

import os

import numpy as np
import pandas as pd
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.core import config as C

from fixtures import make_task_fixture, patch_task

FAST = ["--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
        "--epochs", "1", "--log_every", "1"]


@pytest.fixture
def task3(tmp_path, monkeypatch):
    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    monkeypatch.setattr(C, "DATA_PATH", str(tmp_path / "cache_root") + "/")
    os.makedirs(str(tmp_path / "cache_root"), exist_ok=True)
    return tmp_path


def test_run_mm_early_vilt(task3):
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_early

    run_mm_early.main([
        "--model", "vilt", "--task", "3", "--use_clip_loss", "--use_tim_loss",
        "--evaltest",
    ] + FAST)
    stem = C.results_dir_mm_early + "vilt_task3_seed30_itc0.1itm0.1_"
    assert os.path.isfile(stem + "metrics_val.csv")
    df = pd.read_csv(stem + "metrics_val.csv")
    assert df["metric"].tolist() == C.metric_names


def test_run_mm_early_lxmert_grid_roi(task3):
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_early

    run_mm_early.main(["--model", "lxmert", "--task", "3", "--use_tim_loss"] + FAST)
    stem = C.results_dir_mm_early + "lxmert_task3_seed30_itm0.1_"
    assert os.path.isfile(stem + "metrics_test.csv")
    # the grid ROI cache was materialised
    assert os.path.isdir(C.DATA_PATH + "cache/mvsa_roi")


def test_obj_features_cacher(task3):
    from socialmedia_textimage_classification_auxlosses_tpu.cli import obj_features

    obj_features.main(["--task", "3", "--mode", "mm", "--image_size", "32"])
    cache_dir = C.DATA_PATH + "cache/mvsa_u8_32"
    assert os.path.isfile(os.path.join(cache_dir, "pixels.npy"))
    assert os.path.isfile(os.path.join(cache_dir, "meta.json"))


def test_tim_two_pass_flag_reaches_model(task3):
    """--tim_two_pass restores the reference's sequential TIM layout
    (mm_early.py:78-92) on the built classifier."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_early
    from socialmedia_textimage_classification_auxlosses_tpu.cli._build_early import (
        build_mm_early_setup)

    for extra, want in ([["--tim_two_pass"], False], [[], True]):
        args = run_mm_early.parse_args(
            ["--model", "vilt", "--task", "3", "--use_tim_loss"] + extra + FAST)
        cfg = C.Config(args, model_name="vilt")
        setup = build_mm_early_setup(args, cfg)
        assert setup.model.tim_batched is want
