"""Vmapped multi-seed training — N independent fine-tunes as ONE compiled
program.

The paper's protocol runs every config under several seeds (reference
README.md example uses ``--seed 40``; artifact names carry the seed). Here
the whole sweep vmaps over a leading seed axis of (params, opt_state, rng):
independent inits, independent dropout/ITM randomness — the compiled step
trains all seeds at once and per-seed artifacts come out identical in
contract to N separate runs.

Two data modes:

* **independent (default, the reference protocol)** — each seed gets its
  own data pipelines (its own ``prepare_data`` subsample draw and its own
  shuffle stream, exactly what seeding at reference ``run_mm_late.py:48-49``
  produces across N separate invocations). Per-step batches are stacked
  along the seed axis and the vmapped step consumes one batch *per seed*;
  RNG roots are per-seed ``PRNGKey(seed)`` with the same ``fold_in``
  schedule as ``train.loop.Trainer``, so the sweep's trajectory matches N
  separate runs (tests/test_ensemble.py equivalence case). If per-seed
  split sizes differ (possible under ``--testing``'s pre-split subsample),
  each epoch truncates to the shortest seed's batch count with a warning.
* **shared** (``pipes`` given as single pipelines) — all seeds see one
  subsample/shuffle stream (the first seed's); only init/dropout/ITM draws
  vary. Cheaper (one input pipeline) but understates per-seed variance vs
  the paper's protocol — the CLI warns loudly (``--shared_data``).

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
                 num_labels=2, metric_names=None, log_every=10,
                 independent_data: bool = False):
        self.seeds = list(seeds)
        self.seed_arr = jnp.asarray(self.seeds)
        self.tx = tx
        self.params = params_stacked
        self.opt_state = jax.vmap(tx.init)(params_stacked)
        self.multilabel = multilabel
        self.num_labels = num_labels
        self.metric_names = metric_names or []
        self.log_every = log_every
        self.independent = bool(independent_data)
        self.host_rng = np.random.RandomState(self.seeds[0])
        # per-seed shuffle streams + RNG roots: exactly what N separate
        # Trainer runs use (loop.py seeds root_key/host_rng from --seed)
        self.host_rngs = [np.random.RandomState(s) for s in self.seeds]
        self.root_keys = jnp.stack([jax.random.PRNGKey(s) for s in self.seeds])
        self.root_key = jax.random.PRNGKey(0)
        self.global_step = 0

        train_one = make_train_step_fn(forward_fn, loss_cfg, tx, class_weights)
        eval_one = make_eval_step_fn(forward_fn, loss_cfg, class_weights)

        if self.independent:
            train_v = jax.vmap(train_one, in_axes=(0, 0, 0, 0))
            eval_v = jax.vmap(eval_one, in_axes=(0, 0, 0))

            def train_step(params, opt_state, batch, step):
                # matches Trainer: step_key = fold_in(PRNGKey(seed), step)
                keys = jax.vmap(jax.random.fold_in, (0, None))(
                    self.root_keys, step)
                return train_v(params, opt_state, batch, keys)

            def eval_step(params, batch, bi):
                # matches Trainer.evaluate: fold_in(root, 10_000_000 + bi)
                keys = jax.vmap(jax.random.fold_in, (0, None))(
                    self.root_keys, 10_000_000 + bi)
                return eval_v(params, batch, keys)
        else:
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

    # -- per-seed batch stacking (independent-data mode) ---------------------

    @staticmethod
    def _stack_batches(batches):
        """Per-seed host batches -> one (S, ...) device batch + host-side id
        stack. ``data_id`` never rides through device_put (int64 ids would
        truncate under x64-disabled JAX — see pipeline.device_iter)."""
        dev = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[{k: v for k, v in b.items() if k != "data_id"} for b in batches])
        ids = (np.stack([np.asarray(b["data_id"]) for b in batches])
               if "data_id" in batches[0] else None)
        return dev, ids

    def _zip_iters(self, pipes, shuffle):
        counts = [p.num_batches for p in pipes]
        if len(set(counts)) > 1:
            logger.warning(
                "independent-data sweep: per-seed split sizes differ "
                "(batches per seed: %s) — each epoch truncates to the "
                "shortest (%d); trajectories equal N separate runs only up "
                "to that step count", counts, min(counts))
        rngs = self.host_rngs if shuffle else [None] * len(pipes)
        return zip(*[p.device_iter(shuffle=shuffle, rng=r)
                     for p, r in zip(pipes, rngs)])

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
            if self.independent:
                for per_seed in self._zip_iters(train_pipe, shuffle=True):
                    batch, _ = self._stack_batches(per_seed)
                    self.params, self.opt_state, metrics = self.train_step(
                        self.params, self.opt_state, batch, self.global_step
                    )
                    self.global_step += 1
                    n_steps += 1
                train_iter = ()
            else:
                train_iter = train_pipe.device_iter(shuffle=True,
                                                    rng=self.host_rng)
            for batch in train_iter:
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
        if self.independent:
            batch_iter = (self._stack_batches(bs)
                          for bs in self._zip_iters(pipe, shuffle=False))
        else:
            batch_iter = ((b, None) for b in pipe.device_iter(shuffle=False))
        for bi, (batch, ids_stack) in enumerate(batch_iter):
            if self.independent:
                out = self.eval_step(self.params, batch, bi)
                valid_s = np.asarray(batch["valid"]).astype(bool)
            else:
                key = jax.random.fold_in(self.root_key, 20_000_000 + bi)
                out = self.eval_step(self.params, batch, key)
                valid = np.asarray(batch["valid"]).astype(bool)
                ids = np.asarray(batch["data_id"])
            losses = np.asarray(out["loss"])
            preds = np.asarray(out["predictions"])
            targets = np.asarray(out["targets"])
            for i, s in enumerate(self.seeds):
                if self.independent:
                    valid = valid_s[i]
                    ids = ids_stack[i]
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
