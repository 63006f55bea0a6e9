"""Paper-grid driver tests (cli/run_grid.py): the reference's deliverable is
the EACL tables built from the task x seed x aux-loss grid of runner
invocations (reference README.md:33-38, run_mm_late.py:91-96 artifact
naming); these tests prove the driver plans the grid, runs it end-to-end at
fixture scale, resumes, and aggregates mean+-std tables correctly."""

import os

import numpy as np
import pandas as pd
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.cli import run_grid
from socialmedia_textimage_classification_auxlosses_tpu.core import config as C

from fixtures import make_task_fixture, patch_task

FAST = ["--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
        "--log_every", "1"]


@pytest.fixture
def task3(tmp_path, monkeypatch):
    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    return tmp_path


def _write_metric_csv(path, values_by_epoch):
    """Trainer metric-CSV contract: metric column + epoch-N columns."""
    epochs = len(values_by_epoch)
    rows = {"metric": C.metric_names}
    for e in range(epochs):
        rows[f"epoch-{e+1}"] = [values_by_epoch[e].get(m, 0.5)
                                for m in C.metric_names]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pd.DataFrame(rows).to_csv(path, index=False)


def test_build_plan_dedup_and_naming():
    args = run_grid.parse_args([
        "--families", "txt,mm_late", "--tasks", "3", "--seeds", "30,40",
        "--aux", "none,itc,itm,itc+itm", "--txt", "bernice",
        "--mm_late", "bernice-vit-attention",
    ])
    plan = run_grid.build_plan(args)
    # txt has no aux axis: 1 model x 1 task x 2 seeds; mm_late: 4 aux x 2 seeds
    fams = [r.family for r in plan]
    assert fams.count("txt") == 2
    assert fams.count("mm_late") == 8
    mm = [r for r in plan if r.family == "mm_late" and r.aux == "itc+itm"
          and r.seed == 30][0]
    # the reference's artifact naming contract (run_mm_late.py:91-96)
    assert mm.val_csv.endswith(
        "bernice-vit-attention_task3_seed30_itc0.1itm0.1_metrics_val.csv")
    none = [r for r in plan if r.family == "mm_late" and r.aux == "none"
            and r.seed == 30][0]
    assert none.val_csv.endswith(
        "bernice-vit-attention_task3_seed30__metrics_val.csv")
    txt = [r for r in plan if r.family == "txt"][0]
    assert txt.val_csv.endswith("bernice_task3_seed30_metrics_val.csv")
    # aspect-att fusion keeps its hyphen through the triple split
    args2 = run_grid.parse_args(["--families", "mm_late", "--mm_late",
                                 "bernice-vit-aspect-att", "--tasks", "3",
                                 "--seeds", "30", "--aux", "none"])
    (r2,) = run_grid.build_plan(args2)
    assert "--fusion_name" in r2.argv
    assert r2.argv[r2.argv.index("--fusion_name") + 1] == "aspect-att"


def test_artifact_paths_follow_runner_contract():
    """The grid's done-detection paths must be EXACTLY where the runners
    write: mmbt lives in results_dir_mmbt (run_mm_early.py:63-65) and
    --nsamples adds the N-segment to mm_late stems (_common.artifact_stem)
    — both were hand-rolled wrong before (code-review r4 finding)."""
    args = run_grid.parse_args([
        "--families", "mm_early", "--mm_early", "mmbt", "--tasks", "3",
        "--seeds", "30", "--aux", "itc",
    ])
    (r,) = run_grid.build_plan(args)
    assert r.val_csv.startswith(C.results_dir_mmbt)
    assert r.val_csv.endswith("mmbt_task3_seed30_itc0.1_metrics_val.csv")

    args = run_grid.parse_args([
        "--families", "mm_late", "--mm_late", "bert-vit-concat",
        "--tasks", "3", "--seeds", "30", "--aux", "none",
        "--", "--nsamples", "100", "--testing",
    ])
    (r,) = run_grid.build_plan(args)
    assert "/testing/" in r.val_csv
    assert r.val_csv.endswith(
        "bert-vit-concat_task3_seed30__N100_metrics_val.csv")


def test_aggregate_best_val_selection_and_stats(tmp_path, monkeypatch):
    """Synthetic metric CSVs: the aggregate must pick each run's test column
    at the best-val-f1_macro epoch and compute mean+-std across seeds."""
    patch_task(monkeypatch, C, 3, "unused.csv", "unused/{}.jpg",
               tmp_path / "results")
    args = run_grid.parse_args([
        "--families", "mm_late", "--mm_late", "bernice-vit-attention",
        "--tasks", "3", "--seeds", "30,40", "--aux", "itc",
        "--metrics", "f1_macro",
    ])
    plan = run_grid.build_plan(args)
    assert len(plan) == 2
    # seed 30: val peaks at epoch 2 -> test f1_macro 0.70
    # seed 40: val peaks at epoch 1 -> test f1_macro 0.80
    per_seed_test = {30: 0.70, 40: 0.80}
    val_peak_epoch = {30: 1, 40: 0}
    for run in plan:
        val = [{"f1_macro": 0.2}, {"f1_macro": 0.2}]
        val[val_peak_epoch[run.seed]] = {"f1_macro": 0.9}
        _write_metric_csv(run.val_csv, val)
        test = [{"f1_macro": 0.1}, {"f1_macro": 0.1}]
        test[val_peak_epoch[run.seed]] = {"f1_macro": per_seed_test[run.seed]}
        _write_metric_csv(run.test_csv, test)
    long, tables = run_grid.aggregate(plan, args)
    assert (long.status == "ok").all()
    sel = dict(zip(long.seed, long.sel_epoch))
    assert sel == {30: "epoch-2", 40: "epoch-1"}
    stat = tables["f1_macro"]
    assert len(stat) == 1
    assert np.isclose(stat["mean"].iloc[0], 0.75)
    assert np.isclose(stat["std"].iloc[0], np.std([0.7, 0.8], ddof=1))
    assert int(stat["count"].iloc[0]) == 2
    md = run_grid.render_markdown("f1_macro", stat, "best_val")
    assert "task 3 (mvsa)" in md
    assert "0.7500" in md and "(n=2)" in md

    # --select last takes the final epoch instead
    args_last = run_grid.parse_args([
        "--families", "mm_late", "--mm_late", "bernice-vit-attention",
        "--tasks", "3", "--seeds", "30,40", "--aux", "itc",
        "--metrics", "f1_macro", "--select", "last"])
    long2, tables2 = run_grid.aggregate(plan, args_last)
    assert set(long2.sel_epoch) == {"epoch-2"}
    # seed30 last-epoch test = 0.70 (peak at 2), seed40 last = 0.1
    assert np.isclose(tables2["f1_macro"]["mean"].iloc[0],
                      np.mean([0.70, 0.1]))


def test_aggregate_missing_run_flagged(tmp_path, monkeypatch):
    patch_task(monkeypatch, C, 3, "unused.csv", "unused/{}.jpg",
               tmp_path / "results")
    args = run_grid.parse_args([
        "--families", "txt", "--txt", "bert", "--tasks", "3",
        "--seeds", "30", "--aux", "none"])
    plan = run_grid.build_plan(args)
    long, tables = run_grid.aggregate(plan, args)
    assert list(long.status) == ["missing"]
    assert tables == {} or all(len(t) == 0 for t in tables.values())


def test_grid_end_to_end_fixture_scale(task3):
    """Real runs through the real runner mains at tiny scale: txt + mm_late,
    2 seeds, aux none+itc -> tables exist, resume skips completed runs."""
    out = str(task3 / "results" / "grid") + "/"
    argv = ["--families", "txt,mm_late", "--txt", "bert",
            "--mm_late", "bert-vit-concat", "--tasks", "3",
            "--seeds", "30,40", "--aux", "none,itc", "--epochs", "1",
            "--out", out, "--"] + FAST
    rc = run_grid.main(argv)
    assert rc == 0
    runs = pd.read_csv(out + "grid_runs.csv")
    # 2 txt + 4 mm_late
    assert len(runs) == 6
    assert (runs.status == "ok").all()
    for metric in ("f1_macro", "f1_weighted"):
        stat = pd.read_csv(out + f"grid_table_{metric}.csv")
        # 1 txt config + 2 mm_late aux configs
        assert len(stat) == 3
        assert (stat["count"] == 2).all()
        assert ((stat["mean"] >= 0) & (stat["mean"] <= 1)).all()
        assert os.path.isfile(out + f"grid_table_{metric}.md")
    # resume: all runs skip (artifacts exist) and aggregation still works
    before = {r.val_csv: os.path.getmtime(r.val_csv)
              for r in run_grid.build_plan(run_grid.parse_args(argv))}
    rc2 = run_grid.main(argv)
    assert rc2 == 0
    after = {p: os.path.getmtime(p) for p in before}
    assert before == after  # nothing re-ran


def test_grid_vmap_backend_tables_identical(task3):
    """--seed_backend vmap (VERDICT r4 item 5): each mm_late config's seeds
    run as ONE vmapped sweep with independent per-seed data streams; the
    resulting grid tables must be identical to the sequential backend's
    (same artifacts, same aggregation)."""
    base = ["--families", "mm_late", "--mm_late", "bert-vit-concat",
            "--tasks", "3", "--seeds", "30,40", "--aux", "none",
            "--epochs", "1"]
    out_seq = str(task3 / "results" / "grid_seq") + "/"
    rc = run_grid.main(base + ["--out", out_seq, "--"] + FAST)
    assert rc == 0
    seq_runs = pd.read_csv(out_seq + "grid_runs.csv")
    assert (seq_runs.status == "ok").all()

    # wipe the per-run artifacts so the vmap backend really re-runs them
    plan = run_grid.build_plan(run_grid.parse_args(
        base + ["--out", out_seq, "--"] + FAST))
    for r in plan:
        os.remove(r.val_csv)
        os.remove(r.test_csv)

    out_vm = str(task3 / "results" / "grid_vmap") + "/"
    rc = run_grid.main(base + ["--seed_backend", "vmap",
                               "--out", out_vm, "--"] + FAST)
    assert rc == 0
    vm_runs = pd.read_csv(out_vm + "grid_runs.csv")
    assert (vm_runs.status == "ok").all()
    key = ["family", "model", "task", "aux", "seed"]
    a = seq_runs.sort_values(key).reset_index(drop=True)
    b = vm_runs.sort_values(key).reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    # float columns compare at the sweep's adjudicated vmap tolerance
    # (test_ensemble.py: vmapped batched matmuls legally reassociate
    # reductions; RNG draws are bitwise-equal, floats are not)
    for col in a.columns:
        if a[col].dtype.kind == "f":
            np.testing.assert_allclose(a[col].values, b[col].values,
                                       rtol=5e-3, atol=1e-4, err_msg=col)
        else:
            assert list(a[col]) == list(b[col]), col
    for metric in ("f1_macro", "f1_weighted"):
        sa = pd.read_csv(out_seq + f"grid_table_{metric}.csv")
        sb = pd.read_csv(out_vm + f"grid_table_{metric}.csv")
        num = sa.select_dtypes("number")
        np.testing.assert_allclose(
            num.fillna(-1).to_numpy(float),
            sb[num.columns].fillna(-1).to_numpy(float),
            rtol=5e-3, atol=1e-4, err_msg=metric)


def test_grid_dry_run_prints_plan(capsys):
    rc = run_grid.main([
        "--families", "mm_early", "--mm_early", "vilt,lxmert",
        "--tasks", "3", "--seeds", "30", "--aux", "none,itm", "--dry_run"])
    assert rc == 0
    outl = capsys.readouterr().out.strip().splitlines()
    assert len(outl) == 4
    assert all(l.startswith("mm_early:") for l in outl)
    assert any("--use_tim_loss" in l for l in outl)
