"""End-to-end CLI integration tests (SURVEY.md section 4: '--testing-style
runs per CLI on bundled dummy CSVs'): tiny-arch runs through the real runner
mains, checking the reference's artifact contract."""

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
    return tmp_path


def _check_metrics_csv(path, epochs=1):
    assert os.path.isfile(path), path
    df = pd.read_csv(path)
    assert list(df.columns) == ["metric"] + [f"epoch-{i+1}" for i in range(epochs)]
    assert df["metric"].tolist() == C.metric_names
    vals = df[df.metric == "f1_macro"].iloc[0, 1:].astype(float)
    assert ((vals >= 0) & (vals <= 1)).all()


def test_run_txt_end_to_end(task3):
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_txt

    run_txt.main(["--model_name", "bert", "--task", "3", "--save_preds"] + FAST)
    stem = C.results_dir_txt + "bert_task3_seed30"
    _check_metrics_csv(stem + "_metrics_val.csv")
    _check_metrics_csv(stem + "_metrics_test.csv")
    preds = pd.read_csv(stem + "_preds.csv")
    assert list(preds.columns) == ["data_id", "label", "prediction"]
    assert len(preds) == 4  # test split size


def test_run_img_end_to_end(task3):
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_img

    run_img.main(["--model_name", "vit", "--task", "3"] + FAST)
    stem = C.results_dir_img + "vit_task3_seed30"
    _check_metrics_csv(stem + "_metrics_val.csv")


def test_run_mm_late_end_to_end_with_aux(task3):
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_late

    run_mm_late.main([
        "--txt_model_name", "bernice", "--img_model_name", "vit",
        "--fusion_name", "attention", "--task", "3",
        "--use_clip_loss", "--use_tim_loss", "--save_preds", "--save_model",
    ] + FAST)
    stem = C.results_dir_mm_late + "bernice-vit-attention_task3_seed30_itc0.1itm0.1_"
    _check_metrics_csv(stem + "metrics_val.csv")
    _check_metrics_csv(stem + "metrics_test.csv")
    assert os.path.isfile(stem + "net.pth")
    preds = pd.read_csv(stem + "preds.csv")
    assert list(preds.columns) == ["data_id", "label", "prediction"]


def test_run_mm_late_load_saved_model_bf16_precast(task3):
    """The bf16 eval-only path (where the utils/cast.py parameter pre-cast
    actually engages — it is a no-op at f32) trains, saves, reloads and
    evaluates end-to-end with the full artifact contract, deterministically
    across two eval runs."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_late

    base = [
        "--txt_model_name", "bert", "--img_model_name", "vit",
        "--fusion_name", "concat", "--task", "3",
        "--arch", "tiny", "--dtype", "bfloat16", "--attn_impl", "jnp",
        "--epochs", "1", "--log_every", "1",
    ]
    run_mm_late.main(base + ["--save_model"])
    stem = C.results_dir_mm_late + "bert-vit-concat_task3_seed30__"
    run_mm_late.main(base + ["--load_saved_model"])
    first = pd.read_csv(stem + "preds_lm.csv")
    metrics1 = open(stem + "metrics_lm.csv").read()
    run_mm_late.main(base + ["--load_saved_model"])
    second = pd.read_csv(stem + "preds_lm.csv")
    assert list(first.columns) == ["data_id", "label", "prediction"]
    assert (first == second).all().all()
    assert metrics1 == open(stem + "metrics_lm.csv").read()


def test_run_mm_late_load_saved_model(task3):
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_late

    base = [
        "--txt_model_name", "bert", "--img_model_name", "vit",
        "--fusion_name", "concat", "--task", "3",
    ] + FAST
    run_mm_late.main(base + ["--save_model"])
    run_mm_late.main(base + ["--load_saved_model"])
    stem = C.results_dir_mm_late + "bert-vit-concat_task3_seed30__"
    assert os.path.isfile(stem + "metrics_lm.csv")
    assert os.path.isfile(stem + "preds_lm.csv")
    # w8 serving quantization over the same checkpoint: eval must run and
    # keep the prediction CSV contract (logit-closeness bounds in
    # test_quant.py)
    full = pd.read_csv(stem + "preds_lm.csv")
    run_mm_late.main(base + ["--load_saved_model", "--quantize", "w8"])
    quant = pd.read_csv(stem + "preds_lm.csv")
    assert list(quant.columns) == ["data_id", "label", "prediction"]
    assert (quant["data_id"] == full["data_id"]).all()
