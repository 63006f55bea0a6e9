"""Paper-grid reproduction driver: run the task x seed x aux-loss grid for
all four runner families and aggregate the per-run metric CSVs into the
paper's mean+-std tables.

The reference's deliverable is the EACL 2024 Findings tables, produced by
invoking each runner once per (model config, task, seed, aux-loss setting)
per ``README.md:33-38`` and aggregating the metric-CSV artifacts named per
``run_mm_late.py:91-96``. The reference ships no driver for that grid; this
is it — one command, resumable, emitting per-metric mean+-std tables.

Example (the paper's Ber-ViT-Att block on TIR + MVSA, 3 seeds, the four
aux-loss settings):

    python -m ....cli.run_grid \
        --families mm_late --mm_late bernice-vit-attention \
        --tasks 2,3 --seeds 30,40,50 --aux none,itc,itm,itc+itm \
        --epochs 7 --out results/grid/ \
        -- --bucket_seq --steps_per_dispatch 8

Everything after a literal ``--`` is passed verbatim to every runner
(runtime flags: ``--arch``, ``--dtype``, ``--attn_impl``, ``--testing``,
``--bucket_seq`` ...). Completed runs (metrics_test.csv present) are skipped
unless ``--force``; ``--aggregate_only`` rebuilds tables from existing
artifacts without running anything; ``--dry_run`` prints the plan.

Model selection for the aggregate: for each run, the reported test row is
the epoch with the best validation macro-F1 (``--select best_val``, the
standard protocol for per-epoch metric tables like the reference's); or the
final epoch (``--select last``). Both the per-run selected epoch and the
per-config mean+-std land in ``grid_runs.csv`` / ``grid_table_<metric>.md``.
"""

from __future__ import annotations

import argparse
import itertools
import os
import traceback

import numpy as np
import pandas as pd

from ..core import config as C
from ..utils.logging import get_logger

logger = get_logger(__name__)

FAMILIES = ("txt", "img", "mm_late", "mm_early")
AUX_SETTINGS = {  # token -> (use_clip_loss, use_tim_loss)
    "none": (False, False),
    "itc": (True, False),
    "itm": (False, True),
    "itc+itm": (True, True),
}


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="paper-grid driver: task x seed x aux-loss across all "
                    "four runner families")
    parser.add_argument("--families", type=str, default="mm_late",
                        help="comma list from {txt,img,mm_late,mm_early}")
    parser.add_argument("--tasks", type=str, default="2",
                        help="comma list of task ids (core.config.TASKS)")
    parser.add_argument("--seeds", type=str, default="30,40,50",
                        help="comma list of seeds — N independent runs per "
                             "config, the paper's protocol")
    parser.add_argument("--aux", type=str, default="none,itc,itm,itc+itm",
                        help="comma list from {none,itc,itm,itc+itm}; "
                             "applies to mm_late/mm_early only")
    parser.add_argument("--txt", type=str, default="bernice",
                        help="comma list of text-only models")
    parser.add_argument("--img", type=str, default="vit",
                        help="comma list of image-only models")
    parser.add_argument("--mm_late", type=str, default="bernice-vit-attention",
                        help="comma list of txt-img-fusion triples")
    parser.add_argument("--mm_early", type=str, default="vilt",
                        help="comma list from {vilt,lxmert,mmbt}")
    parser.add_argument("--epochs", type=int, default=7)
    parser.add_argument("--beta_itc", type=float, default=0.1)
    parser.add_argument("--beta_itm", type=float, default=0.1)
    parser.add_argument("--out", type=str, default=None,
                        help="table output dir (default {RES_PATH}grid/)")
    parser.add_argument("--select", type=str, default="best_val",
                        choices=["best_val", "last"],
                        help="which epoch's test metrics represent a run")
    parser.add_argument("--metrics", type=str, default="f1_macro,f1_weighted",
                        help="metrics to emit one markdown table each for")
    parser.add_argument("--seed_backend", default="sequential",
                        choices=["sequential", "vmap"],
                        help="vmap: execute each mm_late config's seeds "
                             "dimension as ONE vmapped program "
                             "(cli/run_seed_sweep with independent per-seed "
                             "data streams — same artifact names/layout, "
                             "~N_seeds x less wall-clock; metrics match "
                             "sequential runs within the sweep's vmap "
                             "float tolerance, tests/test_ensemble.py / "
                             "test_grid.py. Other families and unsupported "
                             "flag sets fall back to sequential runs)")
    parser.add_argument("--force", action="store_true",
                        help="re-run even if the run's metrics CSV exists")
    parser.add_argument("--dry_run", action="store_true",
                        help="print the run plan and exit")
    parser.add_argument("--aggregate_only", action="store_true",
                        help="skip running; rebuild tables from artifacts")
    parser.add_argument("runner_args", nargs=argparse.REMAINDER,
                        help="args after -- go verbatim to every runner")
    args = parser.parse_args(argv)
    if args.runner_args and args.runner_args[0] == "--":
        args.runner_args = args.runner_args[1:]
    for fam in _csv(args.families):
        if fam not in FAMILIES:
            parser.error(f"unknown family {fam!r} (choose from {FAMILIES})")
    for tok in _csv(args.aux):
        if tok not in AUX_SETTINGS:
            parser.error(f"unknown aux setting {tok!r} "
                         f"(choose from {sorted(AUX_SETTINGS)})")
    return args


def _csv(s):
    return [t for t in str(s).split(",") if t]


class Run:
    """One grid cell: a single runner invocation + its artifact locations."""

    def __init__(self, family, model, task, seed, aux, args):
        self.family, self.model, self.task = family, model, int(task)
        self.seed, self.aux = int(seed), aux
        use_itc, use_itm = AUX_SETTINGS[aux]
        self.argv = ["--task", str(task), "--seed", str(seed),
                     "--epochs", str(args.epochs)]
        if family in ("mm_late", "mm_early"):
            if use_itc:
                self.argv += ["--use_clip_loss", "--beta_itc", str(args.beta_itc)]
            if use_itm:
                self.argv += ["--use_tim_loss", "--beta_itm", str(args.beta_itm)]
        if family == "mm_late":
            txt, img, fusion = model.split("-", 2)
            self.argv += ["--txt_model_name", txt, "--img_model_name", img,
                          "--fusion_name", fusion]
        elif family == "mm_early":
            self.argv += ["--model", model]
        else:
            self.argv += ["--model_name", model]
        self.argv += list(args.runner_args)
        # Artifact locations come from the RUNNER's own parse of this argv
        # plus the shared naming contract (_common.artifact_stem /
        # core.config loss_str) — never a re-implementation, so extra
        # runner flags that change names (--nsamples, --testing) and the
        # mmbt results dir (run_mm_early.py results_dir_mmbt) can't drift
        # from what the runner will actually write.
        self.val_csv, self.test_csv = self._artifact_paths(family, model)

    def _artifact_paths(self, family, model):
        from . import run_img, run_mm_early, run_mm_late, run_txt
        from ._common import artifact_stem

        parser = {"txt": run_txt, "img": run_img, "mm_late": run_mm_late,
                  "mm_early": run_mm_early}[family]
        ns = parser.parse_args(self.argv)
        if family in ("txt", "img"):
            base = C.results_dir_txt if family == "txt" else C.results_dir_img
            stem = f"{ns.model_name}_task{ns.task}_seed{ns.seed}_"
        elif family == "mm_late":
            cfg = C.serving_config(ns)
            base = C.results_dir_mm_late
            stem = artifact_stem(ns, cfg, "mm_late")
        else:
            cfg = C.serving_config(ns, model_name=model)
            base = (C.results_dir_mmbt if model == "mmbt"
                    else C.results_dir_mm_early)
            stem = artifact_stem(ns, cfg, model)
        base += "testing/" if getattr(ns, "testing", False) else ""
        return base + stem + "metrics_val.csv", base + stem + "metrics_test.csv"

    @property
    def key(self):  # aggregation group: everything but the seed
        return (self.family, self.model, self.task, self.aux)

    def argv_key(self):
        return tuple(self.argv)

    def __repr__(self):
        return f"{self.family}:{self.model} task{self.task} seed{self.seed} aux={self.aux}"


def build_plan(args):
    """The grid, deduped: txt/img have no aux-loss axis (the reference's
    text/image runners carry no ITC/ITM flags — run_txt.py:19-33), so those
    families contribute one run per (model, task, seed) regardless of
    ``--aux``."""
    plan, seen = [], set()
    for fam in _csv(args.families):
        models = _csv(getattr(args, fam))
        aux_list = _csv(args.aux) if fam in ("mm_late", "mm_early") else ["none"]
        for model, task, aux, seed in itertools.product(
                models, _csv(args.tasks), aux_list, _csv(args.seeds)):
            run = Run(fam, model, task, seed, aux, args)
            dedup = (fam, model, int(task), int(seed), run.argv_key())
            if dedup not in seen:
                seen.add(dedup)
                plan.append(run)
    return plan


def execute(run: Run) -> str:
    """Invoke the family's runner main in-process (shares the persistent
    compile cache across the grid — full-size compiles are minutes on a
    shared chip, cli/_common.enable_compile_cache)."""
    from . import run_img, run_mm_early, run_mm_late, run_txt

    mains = {"txt": run_txt.main, "img": run_img.main,
             "mm_late": run_mm_late.main, "mm_early": run_mm_early.main}
    try:
        mains[run.family](run.argv)
    except SystemExit as e:  # argparse errors inside a runner
        if e.code not in (None, 0):
            return f"exit={e.code}"
        return "ok"
    except Exception:
        logger.error("grid run FAILED: %s\n%s", run, traceback.format_exc())
        return "error"
    return "ok"


def _argv_without_seed(argv):
    out, skip = [], False
    for tok in argv:
        if skip:
            skip = False
            continue
        if tok == "--seed":
            skip = True
            continue
        out.append(tok)
    return out


def execute_vmap(pending, args) -> int:
    """--seed_backend vmap: run each mm_late config's pending seeds as ONE
    vmapped seed sweep (cli/run_seed_sweep — independent per-seed data
    streams, standard per-seed artifact names, so resume/aggregation are
    unchanged). Groups the sweep backend cannot take (other families,
    single seeds, flag sets its parser rejects, or artifact-name drift)
    fall back to sequential runs. Returns the failure count."""
    from . import run_seed_sweep

    failures = 0
    groups: dict = {}
    for run in pending:
        key = (run.family, run.model, run.task, run.aux,
               tuple(_argv_without_seed(run.argv)))
        groups.setdefault(key, []).append(run)

    def run_sequentially(runs):
        nonlocal failures
        for run in runs:
            logger.info("RUN (sequential) %s", run)
            if execute(run) != "ok":
                failures += 1

    for key, runs in groups.items():
        if runs[0].family != "mm_late" or len(runs) < 2:
            run_sequentially(runs)
            continue
        seeds = [r.seed for r in runs]
        argv = _argv_without_seed(runs[0].argv) + [
            "--seeds", ",".join(map(str, seeds))]
        logger.info("RUN (vmap sweep, %d seeds %s): %s",
                    len(seeds), seeds, runs[0])
        try:
            run_seed_sweep.main(argv)
        except SystemExit as e:
            if e.code not in (None, 0):
                logger.warning("seed-sweep backend rejected this flag set "
                               "(exit %s); falling back to sequential",
                               e.code)
                run_sequentially(runs)
                continue
        except Exception:
            logger.error("vmap sweep FAILED: %s\n%s", runs[0],
                         traceback.format_exc())
            run_sequentially(runs)
            continue
        # verify the sweep landed every artifact where the grid expects it
        stragglers = [r for r in runs
                      if not (os.path.isfile(r.test_csv)
                              and os.path.isfile(r.val_csv))]
        if stragglers:
            logger.warning("vmap sweep left %d artifact sets missing; "
                           "running those sequentially", len(stragglers))
            run_sequentially(stragglers)
    return failures


def _read_metric_table(path):
    """metrics CSV (metric x epoch, trainer contract) -> DataFrame indexed
    by metric with epoch-N columns."""
    df = pd.read_csv(path)
    return df.set_index("metric")


def select_epoch(val_csv, select):
    val = _read_metric_table(val_csv)
    epochs = [c for c in val.columns if c.startswith("epoch-")]
    if select == "last" or "f1_macro" not in val.index:
        return epochs[-1]
    row = val.loc["f1_macro", epochs].astype(float)
    return row.idxmax()


def aggregate(runs, args):
    """Per-run selected-epoch test metrics -> long table + per-metric
    mean+-std pivot tables (rows = model config, cols = task)."""
    records = []
    for run in runs:
        if not (os.path.isfile(run.val_csv) and os.path.isfile(run.test_csv)):
            records.append(dict(family=run.family, model=run.model,
                                task=run.task, aux=run.aux, seed=run.seed,
                                status="missing"))
            continue
        epoch = select_epoch(run.val_csv, args.select)
        test = _read_metric_table(run.test_csv)
        if epoch not in test.columns:
            epoch = [c for c in test.columns if c.startswith("epoch-")][-1]
        rec = dict(family=run.family, model=run.model, task=run.task,
                   aux=run.aux, seed=run.seed, status="ok", sel_epoch=epoch)
        for m in test.index:
            rec[m] = float(test.loc[m, epoch])
        records.append(rec)
    long = pd.DataFrame(records)
    tables = {}
    ok = long[long.status == "ok"] if len(long) else long
    for metric in _csv(args.metrics):
        if not len(ok) or metric not in ok.columns:
            continue
        grp = ok.groupby(["family", "model", "aux", "task"])[metric]
        stat = grp.agg(["mean", "std", "count"]).reset_index()
        tables[metric] = stat
    return long, tables


def render_markdown(metric, stat, select):
    """Paper layout: one row per (family, model, aux), one column per task,
    cell = mean +- std (n)."""
    lines = [f"# {metric} — mean ± std over seeds (epoch selection: {select})",
             ""]
    tasks = sorted(stat["task"].unique())
    header = "| model (family, aux) | " + " | ".join(
        f"task {t} ({C.TASKS[t]})" for t in tasks) + " |"
    lines += [header, "|" + "---|" * (len(tasks) + 1)]
    for (fam, model, aux), sub in stat.groupby(["family", "model", "aux"]):
        label = f"{model} [{fam}]" + ("" if aux == "none" else f" +{aux.upper()}")
        cells = []
        for t in tasks:
            row = sub[sub.task == t]
            if not len(row):
                cells.append("—")
            else:
                mean, std, n = (row["mean"].iloc[0], row["std"].iloc[0],
                                int(row["count"].iloc[0]))
                std_s = "" if (n < 2 or np.isnan(std)) else f" ± {std:.4f}"
                cells.append(f"{mean:.4f}{std_s} (n={n})")
        lines.append(f"| {label} | " + " | ".join(cells) + " |")
    return "\n".join(lines) + "\n"


def main(argv=None):
    args = parse_args(argv)
    plan = build_plan(args)
    out_dir = args.out or (C.RES_PATH + "grid/")
    logger.info("grid: %d runs -> %s", len(plan), out_dir)
    if args.dry_run:
        for run in plan:
            print(f"{run.family}: {' '.join(run.argv)}")
        return 0

    failures = 0
    if not args.aggregate_only:
        pending = []
        for i, run in enumerate(plan):
            done = os.path.isfile(run.test_csv) and os.path.isfile(run.val_csv)
            if done and not args.force:
                logger.info("[%d/%d] skip (artifacts exist): %s",
                            i + 1, len(plan), run)
                continue
            pending.append(run)
        if args.seed_backend == "vmap":
            failures = execute_vmap(pending, args)
        else:
            for i, run in enumerate(pending):
                logger.info("[%d/%d] RUN %s", i + 1, len(pending), run)
                status = execute(run)
                if status != "ok":
                    failures += 1

    os.makedirs(out_dir, exist_ok=True)
    long, tables = aggregate(plan, args)
    runs_path = os.path.join(out_dir, "grid_runs.csv")
    long.to_csv(runs_path, index=False)
    logger.info("%s saved (%d runs)", runs_path, len(long))
    for metric, stat in tables.items():
        stat_path = os.path.join(out_dir, f"grid_table_{metric}.csv")
        stat.to_csv(stat_path, index=False)
        md = render_markdown(metric, stat, args.select)
        md_path = os.path.join(out_dir, f"grid_table_{metric}.md")
        with open(md_path, "w") as f:
            f.write(md)
        logger.info("%s saved", md_path)
    missing = int((long.status != "ok").sum()) if len(long) else 0
    if failures or missing:
        logger.warning("grid finished with %d failed runs, %d missing "
                       "artifact sets", failures, missing)
        return 1
    logger.info("Done!")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
