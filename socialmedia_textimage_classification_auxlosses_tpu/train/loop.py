"""Training driver (the reference's per-class ``train``/``eval`` methods —
``mm_late.py:416-638``, ``text_only.py:124-268`` — as one generic loop over
compiled steps).

Observable contract preserved:
  * per-epoch val (and test) eval;
  * metric x epoch CSVs written every 2 epochs and at the last epoch
    (reference mm_late.py:511-527) through ``agg_metrics_val``;
  * eval ``res`` dict with data_id / loss (mean of per-batch losses) /
    predictions / labels;
  * final param save to the reference's filename.

TPU-first behaviour the reference lacks: one compiled step for the whole
update, async dispatch (the host never blocks on the device between steps),
steps/sec + posts/sec logging, optional ``jax.profiler`` traces, and Orbax
mid-training checkpoint/resume.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import numpy as np

from ..utils.logging import get_logger
from .metrics import agg_metrics_val

logger = get_logger(__name__)


class Trainer:
    def __init__(
        self,
        train_step,
        eval_step,
        params,
        opt_state,
        seed: int = 30,
        mesh_plan=None,
        checkpointer=None,
        multilabel: bool = False,
        num_labels: int = 2,
        metric_names: Optional[List[str]] = None,
        log_every: int = 10,
        profile_dir: Optional[str] = None,
        log_jsonl: Optional[str] = None,
        resume: bool = False,
        train_many=None,
        eval_many=None,
        steps_per_dispatch: int = 1,
    ):
        self.train_step = train_step
        # scanned multi-step dispatch (steps.make_train_many/make_eval_many):
        # one device dispatch per `steps_per_dispatch` steps
        self.train_many = train_many
        self.eval_many = eval_many
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        self.eval_step = eval_step
        self.params = params
        self.opt_state = opt_state
        self.root_key = jax.random.PRNGKey(seed)
        self.host_rng = np.random.RandomState(seed)
        self.mesh_plan = mesh_plan
        self.checkpointer = checkpointer
        self.multilabel = multilabel
        self.num_labels = num_labels
        self.metric_names = metric_names or []
        self.log_every = log_every
        self.profile_dir = profile_dir
        self.log_jsonl = log_jsonl
        self.resume = resume
        self.global_step = 0
        self.start_epoch = 0
        # Preemption handling: TPU pods get evicted with SIGTERM; when a
        # checkpointer is configured, fit() installs a handler that requests
        # a final checkpoint + clean exit at the next step boundary (resume
        # with --resume). The reference has no notion of this (its only
        # persistence is the post-training state_dict, mm_late.py:529-531).
        self._preempted = False

    def _write_jsonl(self, record: Dict):
        if not self.log_jsonl:
            return
        import json

        with open(self.log_jsonl, "a") as f:
            f.write(json.dumps(record) + "\n")

    # -- resume -------------------------------------------------------------

    def maybe_resume(self):
        if self.checkpointer is None:
            return
        template = {"params": self.params, "opt_state": self.opt_state,
                    "step": 0, "epoch": 0}
        restored = self.checkpointer.restore_latest(template)
        if restored:
            self.params = restored["params"]
            self.opt_state = restored["opt_state"]
            self.global_step = int(restored["step"])
            self.start_epoch = int(restored["epoch"])

    # -- train --------------------------------------------------------------

    def _install_preempt_handler(self):
        """SIGTERM -> checkpoint-and-exit at the next step boundary (TPU-pod
        preemption). Active only when periodic checkpointing is configured."""
        if self.checkpointer is None:
            return None
        import signal

        def handler(signum, frame):
            logger.warning("SIGTERM received: will checkpoint and exit at "
                           "the next step boundary")
            self._preempted = True

        try:
            return signal.signal(signal.SIGTERM, handler)
        except ValueError:  # not the main thread
            return None

    def _restore_preempt_handler(self, prev):
        if prev is not None:
            import signal

            signal.signal(signal.SIGTERM, prev)

    def _preempt_save(self, epoch):
        if self.checkpointer is None:
            return
        # A periodic save may already cover this exact step — only that case
        # is a benign skip. Any other failure (disk full, Orbax error) must
        # surface loudly: exiting cleanly on a lost final checkpoint would
        # silently discard training progress.
        already = self.checkpointer.manager.latest_step() == self.global_step
        if already:
            logger.info("preemption save skipped (step %d already saved)",
                        self.global_step)
        else:
            self.checkpointer.save(
                self.global_step,
                {"params": self.params, "opt_state": self.opt_state,
                 "step": self.global_step, "epoch": epoch})
        self.checkpointer.wait()
        if self.checkpointer.manager.latest_step() != self.global_step:
            logger.error("preemption checkpoint at step %d FAILED to commit "
                         "(latest on disk: %s)", self.global_step,
                         self.checkpointer.manager.latest_step())
            raise RuntimeError(
                f"preemption checkpoint at step {self.global_step} did not "
                "commit")
        logger.warning("preemption checkpoint saved at step %d "
                       "(resume with --resume)", self.global_step)

    def _fit_epoch_chunked(self, train_pipe, epoch):
        """Epoch via the scanned multi-step dispatch: K optimizer steps per
        device call (steps.make_train_many). Bit-identical trajectory to the
        per-step path — the scan folds the same (root_key, global_step) RNG."""
        seen = 0
        last_metrics = None
        for batches, k_real in train_pipe.device_iter_chunks(
            self.steps_per_dispatch, shuffle=True, rng=self.host_rng,
            mesh_plan=self.mesh_plan,
        ):
            if self._preempted:
                break
            prev_step = self.global_step
            self.params, self.opt_state, metrics = self.train_many(
                self.params, self.opt_state, batches, self.root_key,
                self.global_step,
            )
            self.global_step += k_real
            seen += k_real * int(train_pipe.cfg.batch_size)
            last_metrics = metrics
            if (prev_step // max(self.log_every, 1)
                    != self.global_step // max(self.log_every, 1)):
                # chunk summary: mean over the chunk's real steps
                m = {k: np.asarray(v)[:k_real] for k, v in metrics.items()}
                acc = 100.0 * float(m["correct"].sum()) / max(
                    float(m["n"].sum()), 1.0)
                mean = {k: float(np.mean(v)) for k, v in m.items()
                        if k not in ("correct", "n")}
                logger.info("step %d loss %.4f acc %.2f%% (chunk of %d)",
                            self.global_step, mean["loss"], acc, k_real)
                self._write_jsonl({"kind": "train", "step": self.global_step,
                                   "epoch": epoch, "accuracy": acc, **mean})
            if self.checkpointer is not None and (
                prev_step // self.checkpointer.every_steps
                != self.global_step // self.checkpointer.every_steps
            ):
                self.checkpointer.save(
                    self.global_step,
                    {"params": self.params, "opt_state": self.opt_state,
                     "step": self.global_step, "epoch": epoch},
                )
        return seen, last_metrics

    def _epoch_tail(self, train_pipe, epoch, t_epoch, seen, last_metrics):
        if last_metrics is not None:
            jax.block_until_ready(last_metrics["loss"])
        dt = time.perf_counter() - t_epoch
        nb = train_pipe.num_batches
        logger.info("epoch %d: %.1fs, %.2f steps/s, %.1f posts/s",
                    epoch + 1, dt, nb / dt, seen / dt)
        self._write_jsonl({"kind": "epoch", "epoch": epoch, "seconds": dt,
                           "steps_per_sec": nb / dt, "posts_per_sec": seen / dt})

    def _epoch_eval(self, val_pipe, te_pipe, epoch, epochs, res_val, res_te,
                    val_filename, te_filename):
        """Per-epoch val/test eval + the reference's every-2-epochs CSV cadence
        (mm_late.py:508-527). Appends to res_val/res_te in place."""
        import pandas as pd

        res_val_d = self.evaluate(val_pipe)
        res_val_d["epoch"] = epoch
        res_val.append(res_val_d)
        if val_filename and (epoch % 2 == 0 or epoch == epochs - 1):
            table = agg_metrics_val(res_val, self.metric_names,
                                    self.num_labels, self.multilabel)
            pd.DataFrame(table).to_csv(val_filename, index=False)
            logger.info("%s saved!", val_filename)

        if te_pipe is not None:
            res_te_d = self.evaluate(te_pipe)
            res_te_d["epoch"] = epoch
            res_te.append(res_te_d)
            if te_filename and (epoch % 2 == 0 or epoch == epochs - 1):
                table = agg_metrics_val(res_te, self.metric_names,
                                        self.num_labels, self.multilabel)
                pd.DataFrame(table).to_csv(te_filename, index=False)
                logger.info("%s saved!", te_filename)

    def fit(
        self,
        train_pipe,
        val_pipe,
        epochs: int,
        te_pipe=None,
        val_filename: Optional[str] = None,
        te_filename: Optional[str] = None,
        model_path: Optional[str] = None,
    ):
        # Restore only on explicit opt-in: the reference never auto-resumes
        # (mm_late.py:343-345 is an explicit load), so a rerun into a results
        # dir holding stale checkpoints must start from step 0.
        if self.resume:
            self.maybe_resume()
        res_val: List[Dict] = []
        res_te: List[Dict] = []
        if self.profile_dir:
            jax.profiler.start_trace(self.profile_dir)
        restore_sig = self._install_preempt_handler()
        try:
            for epoch in range(self.start_epoch, epochs):
                logger.info("Epoch: %d", epoch + 1)
                t_epoch = time.perf_counter()
                seen = 0
                last_metrics = None
                if self.train_many is not None and self.steps_per_dispatch > 1:
                    seen, last_metrics = self._fit_epoch_chunked(
                        train_pipe, epoch)
                else:
                    for i, batch in enumerate(
                        train_pipe.device_iter(shuffle=True, rng=self.host_rng,
                                               mesh_plan=self.mesh_plan)
                    ):
                        step_key = jax.random.fold_in(self.root_key,
                                                      self.global_step)
                        self.params, self.opt_state, metrics = self.train_step(
                            self.params, self.opt_state, batch, step_key
                        )
                        self.global_step += 1
                        seen += int(train_pipe.cfg.batch_size)
                        last_metrics = metrics
                        if i % self.log_every == 0:
                            # blocks only on this step's scalars
                            m = {k: float(v) for k, v in metrics.items()}
                            acc = 100.0 * m["correct"] / max(m["n"], 1.0)
                            logger.info(
                                "step %d loss %.4f acc %.2f%%",
                                self.global_step, m["loss"], acc,
                            )
                            self._write_jsonl(
                                {"kind": "train", "step": self.global_step,
                                 "epoch": epoch, "accuracy": acc,
                                 **{k: v for k, v in m.items()
                                    if k not in ("correct", "n")}}
                            )
                        if self.checkpointer is not None:
                            self.checkpointer.maybe_save(
                                self.global_step,
                                {"params": self.params,
                                 "opt_state": self.opt_state,
                                 "step": self.global_step, "epoch": epoch},
                            )
                        if self._preempted:
                            break
                self._epoch_tail(train_pipe, epoch, t_epoch, seen,
                                 last_metrics)
                if self._preempted:
                    self._preempt_save(epoch)
                    break
                self._epoch_eval(val_pipe, te_pipe, epoch, epochs,
                                 res_val, res_te, val_filename, te_filename)
        finally:
            self._restore_preempt_handler(restore_sig)
            if self.profile_dir:
                jax.profiler.stop_trace()
        if model_path:
            from .checkpoint import save_params

            save_params(model_path, self.params)
        if self.checkpointer is not None:
            self.checkpointer.wait()
        return res_val, res_te

    # -- eval ---------------------------------------------------------------

    def evaluate(self, pipe, collect_features=False, feature_step=None) -> Dict:
        """Reference-contract eval result (mm_late.py:534-638): per-batch
        mean loss, stacked predictions/labels/data_ids; confusion counts
        accumulate on device."""
        if (self.eval_many is not None and self.steps_per_dispatch > 1
                and not collect_features):
            return self._evaluate_chunked(pipe)
        losses, preds, targets, data_ids = [], [], [], []
        cm = None
        correct = 0.0
        n = 0.0
        features = []
        for batch in pipe.device_iter(shuffle=False, mesh_plan=self.mesh_plan):
            key = jax.random.fold_in(self.root_key, 10_000_000 + len(losses))
            out = self.eval_step(self.params, batch, key)
            valid = np.asarray(batch["valid"]).astype(bool)
            losses.append(float(out["loss"]))
            preds.append(np.asarray(out["predictions"])[valid])
            targets.append(np.asarray(out["targets"])[valid])
            data_ids.append(np.asarray(batch["data_id"])[valid])
            cm = np.asarray(out["cm"]) if cm is None else cm + np.asarray(out["cm"])
            correct += float(out["correct"])
            n += float(out["n"])
            if collect_features and feature_step is not None:
                feats, _ = feature_step(self.params, batch)
                features.append(np.asarray(feats)[valid])
        eval_loss = float(np.mean(losses)) if losses else float("nan")
        acc = 100.0 * correct / max(n, 1.0)
        logger.info("loss: %.4f acc: %.4f", eval_loss, acc)
        res = {
            "data_id": np.concatenate(data_ids) if data_ids else np.array([]),
            "loss": eval_loss,
            "predictions": np.concatenate(preds) if preds else np.array([]),
            "labels": np.concatenate(targets) if targets else np.array([]),
            "cm": cm,
        }
        if collect_features:
            res["features"] = np.concatenate(features) if features else np.array([])
        return res

    def _evaluate_chunked(self, pipe) -> Dict:
        """Eval via the scanned multi-step dispatch (steps.make_eval_many):
        stateless, so the padded tail is simply sliced off; RNG folds match
        the per-batch path exactly."""
        losses, preds, targets, data_ids = [], [], [], []
        cm = None
        correct = 0.0
        n = 0.0
        idx = 0
        for batches, k_real in pipe.device_iter_chunks(
            self.steps_per_dispatch, shuffle=False,
            mesh_plan=self.mesh_plan,
        ):
            out = self.eval_many(
                self.params,
                {k: v for k, v in batches.items() if k != "step_valid"},
                self.root_key, idx)
            idx += k_real
            valid_all = np.asarray(batches["valid"]).astype(bool)
            ids_all = np.asarray(batches["data_id"])
            o = {k: np.asarray(v) for k, v in out.items()}
            for j in range(k_real):
                valid = valid_all[j]
                losses.append(float(o["loss"][j]))
                preds.append(o["predictions"][j][valid])
                targets.append(o["targets"][j][valid])
                data_ids.append(ids_all[j][valid])
                cm = o["cm"][j] if cm is None else cm + o["cm"][j]
                correct += float(o["correct"][j])
                n += float(o["n"][j])
        eval_loss = float(np.mean(losses)) if losses else float("nan")
        acc = 100.0 * correct / max(n, 1.0)
        logger.info("loss: %.4f acc: %.4f", eval_loss, acc)
        return {
            "data_id": np.concatenate(data_ids) if data_ids else np.array([]),
            "loss": eval_loss,
            "predictions": np.concatenate(preds) if preds else np.array([]),
            "labels": np.concatenate(targets) if targets else np.array([]),
            "cm": cm,
        }
