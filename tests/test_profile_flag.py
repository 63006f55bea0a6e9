"""--profile writes a jax.profiler trace directory (SURVEY.md section 5
tracing/profiling rebuild)."""

import os

import pytest

from socialmedia_textimage_classification_auxlosses_tpu.core import config as C

from fixtures import make_task_fixture, patch_task


def test_profile_flag_writes_trace(tmp_path, monkeypatch):
    csv_path, img_fmt, _ = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_txt

    trace_dir = str(tmp_path / "trace")
    run_txt.main(["--model_name", "bert", "--task", "3", "--arch", "tiny",
                  "--dtype", "float32", "--attn_impl", "jnp", "--epochs", "1",
                  "--log_every", "1", "--profile", trace_dir])
    # jax.profiler writes plugins/profile/<ts>/*.pb under the trace dir
    found = []
    for root, _, files in os.walk(trace_dir):
        found.extend(files)
    assert found, "profiler trace directory is empty"
