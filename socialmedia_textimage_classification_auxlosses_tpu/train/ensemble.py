"""Vmapped multi-seed training — N independent fine-tunes as ONE compiled
program.

The paper's protocol runs every config under several seeds (reference
README.md example uses ``--seed 40``; artifact names carry the seed). Here
the whole sweep vmaps over a leading seed axis of (params, opt_state, rng):
same data batches, independent inits, independent dropout/ITM randomness —
the compiled step trains all seeds at once and per-seed artifacts come out
identical in contract to N separate runs.

When to use it — measured on a v5e chip, flagship config (BERT-base-scale
towers, batch 8): the single-seed step is *weight-HBM-bandwidth-bound*
(dense AdamW over a 250k-vocab embedding dominates), so vmapping multiplies
weight traffic and 2 stacked seeds run at 0.76x the aggregate of sequential
runs — at this scale run seeds sequentially. The vmapped sweep wins when the
step is compute- or host-bound instead: small towers (`--arch tiny/small`),
frozen-tower probes, or large per-step batches; it also amortises compile
time and the input pipeline across seeds.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger
from .metrics import agg_metrics_val
from .steps import LossConfig, make_eval_step_fn, make_train_step_fn

logger = get_logger(__name__)


def stack_seed_params(init_fn, seeds: List[int]):
    """Initialise one param tree per seed and stack along a leading axis."""
    trees = [init_fn(jax.random.PRNGKey(s)) for s in seeds]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


class EnsembleTrainer:
    """Multi-seed twin of ``train.loop.Trainer`` (same artifact contract,
    one metrics/preds file set per seed)."""

    def __init__(self, forward_fn, loss_cfg: LossConfig, tx, params_stacked,
                 seeds: List[int], class_weights=None, multilabel=False,
                 num_labels=2, metric_names=None, log_every=10):
        self.seeds = list(seeds)
        self.seed_arr = jnp.asarray(self.seeds)
        self.tx = tx
        self.params = params_stacked
        self.opt_state = jax.vmap(tx.init)(params_stacked)
        self.multilabel = multilabel
        self.num_labels = num_labels
        self.metric_names = metric_names or []
        self.log_every = log_every
        self.host_rng = np.random.RandomState(self.seeds[0])
        self.root_key = jax.random.PRNGKey(0)
        self.global_step = 0

        train_one = make_train_step_fn(forward_fn, loss_cfg, tx, class_weights)
        eval_one = make_eval_step_fn(forward_fn, loss_cfg, class_weights)
        train_v = jax.vmap(train_one, in_axes=(0, 0, None, 0))
        eval_v = jax.vmap(eval_one, in_axes=(0, None, 0))

        def train_step(params, opt_state, batch, key):
            keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(self.seed_arr)
            return train_v(params, opt_state, batch, keys)

        def eval_step(params, batch, key):
            keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(self.seed_arr)
            return eval_v(params, batch, keys)

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self.eval_step = jax.jit(eval_step)

    def fit(self, train_pipe, val_pipe, epochs, te_pipe=None,
            val_filename_fmt: Optional[str] = None,
            te_filename_fmt: Optional[str] = None):
        """``*_fmt`` are format strings with a ``{seed}`` placeholder."""
        import pandas as pd
        import time

        res_val = {s: [] for s in self.seeds}
        res_te = {s: [] for s in self.seeds}
        for epoch in range(epochs):
            logger.info("Epoch: %d (seeds %s)", epoch + 1, self.seeds)
            t0 = time.perf_counter()
            n_steps = 0
            metrics = None
            for batch in train_pipe.device_iter(shuffle=True, rng=self.host_rng):
                key = jax.random.fold_in(self.root_key, self.global_step)
                self.params, self.opt_state, metrics = self.train_step(
                    self.params, self.opt_state, batch, key
                )
                self.global_step += 1
                n_steps += 1
            if metrics is not None:
                jax.block_until_ready(metrics["loss"])
                losses = np.asarray(metrics["loss"])
                logger.info("epoch %d: %.1fs, per-seed loss %s",
                            epoch + 1, time.perf_counter() - t0,
                            np.round(losses, 4).tolist())

            val = self.evaluate(val_pipe)
            for s in self.seeds:
                d = dict(val[s])
                d["epoch"] = epoch
                res_val[s].append(d)
            te = self.evaluate(te_pipe) if te_pipe is not None else None
            if te is not None:
                for s in self.seeds:
                    d = dict(te[s])
                    d["epoch"] = epoch
                    res_te[s].append(d)
            if epoch % 2 == 0 or epoch == epochs - 1:
                for s in self.seeds:
                    if val_filename_fmt:
                        table = agg_metrics_val(res_val[s], self.metric_names,
                                                self.num_labels, self.multilabel)
                        pd.DataFrame(table).to_csv(
                            val_filename_fmt.format(seed=s), index=False)
                    if te is not None and te_filename_fmt:
                        table = agg_metrics_val(res_te[s], self.metric_names,
                                                self.num_labels, self.multilabel)
                        pd.DataFrame(table).to_csv(
                            te_filename_fmt.format(seed=s), index=False)
        return res_val, res_te

    def evaluate(self, pipe) -> Dict[int, Dict]:
        per_seed = {s: {"losses": [], "preds": [], "targets": [], "ids": []}
                    for s in self.seeds}
        for bi, batch in enumerate(pipe.device_iter(shuffle=False)):
            key = jax.random.fold_in(self.root_key, 20_000_000 + bi)
            out = self.eval_step(self.params, batch, key)
            valid = np.asarray(batch["valid"]).astype(bool)
            losses = np.asarray(out["loss"])
            preds = np.asarray(out["predictions"])
            targets = np.asarray(out["targets"])
            ids = np.asarray(batch["data_id"])
            for i, s in enumerate(self.seeds):
                d = per_seed[s]
                d["losses"].append(float(losses[i]))
                d["preds"].append(preds[i][valid])
                d["targets"].append(targets[i][valid])
                d["ids"].append(ids[valid])
        res = {}
        for s in self.seeds:
            d = per_seed[s]
            res[s] = {
                "loss": float(np.mean(d["losses"])) if d["losses"] else float("nan"),
                "predictions": np.concatenate(d["preds"]) if d["preds"] else np.array([]),
                "labels": np.concatenate(d["targets"]) if d["targets"] else np.array([]),
                "data_id": np.concatenate(d["ids"]) if d["ids"] else np.array([]),
            }
        return res

    def params_for_seed(self, seed: int):
        i = self.seeds.index(seed)
        return jax.tree_util.tree_map(lambda x: x[i], self.params)
