"""Compiled train / eval steps (SURVEY.md section 7: "the whole train step
(2 encoder passes + fusion + 3 losses + AdamW update) compiles into one
jitted/pjit function").

One generic step factory serves every model family: a ``forward_fn`` closure
produces the model's output dict (``out_cls`` and, for multimodal models,
``logits_per_text`` / ``out_tim`` / ``out_iadds``), and the loss assembly
reproduces the reference's objective selection (reference
``mm_late.py:473-487``, ``run_mm_late.py:85``):

    multilabel -> BCE(pos_weight)         else weighted CE over one-hot floats
    + beta_itc * ITC  + beta_itm * ITM    (down-weighting the CE term)
    | beta_iadds * iadds CE               (legacy, exclusive with the above)
    | loss-correction                     (legacy binary path)

Batches are fixed-shape with a ``valid`` row mask (XLA static shapes; the
padded tail of the last batch contributes nothing). ITM swapping happens
*inside* the step as a pure function of the step RNG. Under a mesh, params
arrive sharded, batches arrive data-sharded, and XLA inserts the psum /
all-gather collectives (gradient reduction, global-batch ITC) over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from . import losses as L
from .itm import itm_swap
from .metrics import confusion_matrix_update, multilabel_counts_update


@dataclasses.dataclass(frozen=True)
class LossConfig:
    num_labels: int
    multilabel: bool = False
    use_clip_loss: bool = False
    use_tim_loss: bool = False
    use_iadds_loss: bool = False
    use_loss_correction: bool = False
    beta_itc: Optional[float] = None
    beta_itm: Optional[float] = None
    beta_iadds: Optional[float] = None
    T: Tuple[Tuple[float, float], ...] = ((0.9, 0.1), (0.1, 0.9))


def _cls_loss(cfg: LossConfig, out_cls, labels, class_weights, valid):
    if cfg.multilabel:
        return L.bce_with_logits(out_cls, labels, pos_weight=class_weights, mask=valid)
    if cfg.use_loss_correction:
        return L.loss_correction(cfg.T, out_cls, labels, class_weights, mask=valid)
    return L.weighted_ce(out_cls, labels, class_weights, mask=valid)


def assemble_loss(cfg: LossConfig, outputs: Dict, batch: Dict, tim_labels,
                  class_weights):
    valid = batch.get("valid")
    cls_loss = _cls_loss(cfg, outputs["out_cls"], batch["labels"], class_weights, valid)
    parts = {"cls_loss": cls_loss}
    itc = itm = None
    if cfg.use_clip_loss:
        itc = L.clip_loss(outputs["logits_per_text"], mask=valid)
        parts["itc_loss"] = itc
    if cfg.use_tim_loss:
        itm = L.int_ce(outputs["out_tim"], tim_labels, mask=valid)
        parts["itm_loss"] = itm
    if cfg.use_iadds_loss and not (cfg.use_clip_loss or cfg.use_tim_loss):
        iadds = L.int_ce(outputs["out_iadds"], batch["image_adds"], mask=valid)
        parts["iadds_loss"] = iadds
        total = (1.0 - cfg.beta_iadds) * cls_loss + cfg.beta_iadds * iadds
    else:
        total = L.combined_loss(cls_loss, itc, itm, cfg.beta_itc, cfg.beta_itm)
    parts["loss"] = total
    return total, parts


def _predictions(cfg: LossConfig, out_cls, labels):
    if cfg.multilabel:
        preds = jnp.round(jax.nn.sigmoid(out_cls)).astype(jnp.int32)
        targets = labels.astype(jnp.int32)
    else:
        preds = jnp.argmax(out_cls, axis=-1).astype(jnp.int32)
        targets = jnp.argmax(labels, axis=-1).astype(jnp.int32)
    return preds, targets


def _accuracy_counts(cfg, preds, targets, valid):
    v = jnp.ones(preds.shape[0], jnp.float32) if valid is None else valid.astype(jnp.float32)
    if cfg.multilabel:
        correct = jnp.sum((preds == targets).astype(jnp.float32) * v[:, None])
        n = jnp.sum(v) * preds.shape[-1]
    else:
        correct = jnp.sum((preds == targets).astype(jnp.float32) * v)
        n = jnp.sum(v)
    return correct, n


def _maybe_tim(cfg: LossConfig, rng, batch):
    if not cfg.use_tim_loss:
        return None, None
    if "tim_src" in batch:
        # injected swap pattern: the pipeline (or a parity harness) supplies
        # the row-source indices and match labels instead of the in-step PRNG
        # draw — used for custom negative-sampling policies and to pin the
        # swap when comparing trajectories against the reference's host-RNG
        # loop (mm_late.py:389-414)
        src = batch["tim_src"]
        tim_labels = batch["tim_labels"].astype(jnp.int32)
        tt = batch.get("token_type_ids")
        tim_ids = jnp.take(batch["ids"], src, axis=0)
        tim_mask = jnp.take(batch["mask"], src, axis=0)
        tim_tt = None if tt is None else jnp.take(tt, src, axis=0)
    else:
        tim_ids, tim_mask, tim_tt, tim_labels, src = itm_swap(
            rng, batch["ids"], batch["mask"], batch.get("token_type_ids"),
            batch.get("valid"), return_src=True,
        )
    return {"ids": tim_ids, "mask": tim_mask, "token_type_ids": tim_tt,
            "src": src}, tim_labels


def make_train_step_fn(
    forward_fn: Callable,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    class_weights=None,
    lazy_emb_cfg=None,
):
    """Unjitted step body — vmappable (see train/ensemble.py) and jittable.

    ``lazy_emb_cfg`` (train/lazy_emb.LazyEmbConfig) switches the word
    embedding to the row-sparse AdamW; the main ``tx`` must label that leaf
    ``set_to_zero`` and ``opt_state`` gains a ``{"tx", "lazy_emb"}`` wrapper.
    When ``forward_fn`` accepts ``word_embeds``/``tim_word_embeds`` the step
    differentiates w.r.t. the *gathered rows* so the dense embedding-gradient
    scatter-add never materialises (~6.8 ms/step on the flagship config,
    BASELINE.md); otherwise it falls back to gathering from the dense grad.
    """
    supports_inject = False
    if lazy_emb_cfg is not None:
        import inspect

        try:
            supports_inject = "word_embeds" in inspect.signature(
                forward_fn).parameters
        except (TypeError, ValueError):
            supports_inject = False

    def _lazy_injected_step(params, opt_state, batch, rng_drop, tim_inputs,
                            tim_labels):
        from .lazy_emb import _get, _set, row_update, unique_ids

        path = lazy_emb_cfg.path
        emb = _get(params, path)
        uids, inv = unique_ids(batch["ids"])
        rows0 = emb[uids].astype(jnp.float32)
        # placeholder keeps the pytree structure; the forward never reads it
        p_small = _set(params, path, jnp.zeros((1,), emb.dtype))

        def loss_fn(p_sm, rows):
            we = rows[inv].reshape(batch["ids"].shape + (rows.shape[-1],))
            tim_we = (None if tim_inputs is None
                      else jnp.take(we, tim_inputs["src"], axis=0))
            outputs = forward_fn(p_sm, batch, tim_inputs, rng_drop, False,
                                 word_embeds=we, tim_word_embeds=tim_we)
            total, parts = assemble_loss(loss_cfg, outputs, batch, tim_labels,
                                         class_weights)
            return total, (outputs, parts)

        (_, (outputs, parts)), (g_sm, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(p_small, rows0)
        tx_state, lazy_state = opt_state["tx"], opt_state["lazy_emb"]
        updates, tx_state = tx.update(g_sm, tx_state, p_small)
        p_small = optax.apply_updates(p_small, updates)
        emb_new, lazy_state = row_update(emb, lazy_state, uids, g_rows,
                                         lazy_emb_cfg)
        params = _set(p_small, path, emb_new)
        return params, {"tx": tx_state, "lazy_emb": lazy_state}, outputs, parts

    def step(params, opt_state, batch, rng):
        rng_drop, rng_itm = jax.random.split(rng)
        tim_inputs, tim_labels = _maybe_tim(loss_cfg, rng_itm, batch)

        if supports_inject:
            params, opt_state, outputs, parts = _lazy_injected_step(
                params, opt_state, batch, rng_drop, tim_inputs, tim_labels)
            preds, targets = _predictions(loss_cfg, outputs["out_cls"],
                                          batch["labels"])
            correct, n = _accuracy_counts(loss_cfg, preds, targets,
                                          batch.get("valid"))
            return params, opt_state, {**parts, "correct": correct, "n": n}

        def loss_fn(p):
            outputs = forward_fn(p, batch, tim_inputs, rng_drop, False)
            total, parts = assemble_loss(loss_cfg, outputs, batch, tim_labels,
                                         class_weights)
            return total, (outputs, parts)

        (_, (outputs, parts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if lazy_emb_cfg is not None:
            from .lazy_emb import lazy_emb_update

            tx_state, lazy_state = opt_state["tx"], opt_state["lazy_emb"]
            updates, tx_state = tx.update(grads, tx_state, params)
            params = optax.apply_updates(params, updates)
            params, lazy_state = lazy_emb_update(params, lazy_state, grads,
                                                 batch["ids"], lazy_emb_cfg)
            opt_state = {"tx": tx_state, "lazy_emb": lazy_state}
        else:
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        # Mutable-BN support: a forward_fn that runs BatchNorm in train mode
        # returns the updated running statistics under "batch_stats"
        # (torch train-mode semantics, reference image_only.py:54-88); they
        # replace the frozen-in-the-optimizer copy here.
        new_bs = outputs.get("batch_stats")
        if new_bs is not None:
            params = {**params, "batch_stats": new_bs}
        preds, targets = _predictions(loss_cfg, outputs["out_cls"], batch["labels"])
        correct, n = _accuracy_counts(loss_cfg, preds, targets, batch.get("valid"))
        metrics = {**parts, "correct": correct, "n": n}
        return params, opt_state, metrics

    return step


def make_train_step(
    forward_fn: Callable,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    class_weights=None,
    donate: bool = True,
    lazy_emb_cfg=None,
):
    """forward_fn(params, batch, tim_inputs, dropout_rng, deterministic)
    -> outputs dict."""
    step = make_train_step_fn(forward_fn, loss_cfg, tx, class_weights,
                              lazy_emb_cfg=lazy_emb_cfg)
    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_train_many(
    forward_fn: Callable,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    class_weights=None,
    donate: bool = True,
    lazy_emb_cfg=None,
):
    """K train steps in ONE device dispatch (``lax.scan`` over stacked
    batches).

    The reference dispatches one optimizer step per host-loop iteration
    (mm_late.py:427-504); under jit the host round-trip is already async,
    but on a remote/tunneled TPU each dispatch still pays host->device
    latency. The datasets here are tiny (3.6-4k posts, SURVEY.md section 6),
    so whole chunks of an epoch fit in HBM: ``many`` scans the *identical*
    step body over a ``(K, B, ...)`` batch stack, giving one dispatch (and
    one compiled while-loop) per K steps.

    Trajectory equivalence with the per-step loop is exact: the scan folds
    ``root_key`` with the same global step index the loop would
    (``fold_in(root_key, step0 + i)``), so scanned and unscanned runs
    produce bit-identical params (tests/test_train_many.py).

    The stacked batch may carry a per-step scalar ``step_valid`` (shape
    ``(K,)``); steps with ``step_valid == 0`` are skipped entirely via
    ``lax.cond`` (params/opt state pass through untouched) — this pads the
    epoch tail to a fixed K so every chunk reuses one compiled scan.
    """
    step = make_train_step_fn(forward_fn, loss_cfg, tx, class_weights,
                              lazy_emb_cfg=lazy_emb_cfg)

    def many(params, opt_state, batches, root_key, step0):
        step_valid = batches.get("step_valid")
        data = {k: v for k, v in batches.items() if k != "step_valid"}
        k_steps = jax.tree_util.tree_leaves(data)[0].shape[0]
        has_padding = step_valid is not None

        def body(carry, xs):
            p, s = carry
            b, i, sv = xs
            key = jax.random.fold_in(root_key, step0 + i)

            def run(args):
                p, s = args
                return step(p, s, b, key)

            if not has_padding:
                p, s, m = run((p, s))
            else:
                # Padded tail steps: the skip branch never traces the model —
                # metric zeros come from eval_shape, params/opt state pass
                # through untouched (so optimizer moments do NOT decay on
                # phantom steps).
                m_shapes = jax.eval_shape(run, (p, s))[2]

                def skip(args):
                    p, s = args
                    zero = jax.tree_util.tree_map(
                        lambda sd: jnp.zeros(sd.shape, sd.dtype), m_shapes)
                    return p, s, zero

                p, s, m = jax.lax.cond(sv > 0, run, skip, (p, s))
            return (p, s), m

        xs = (data, jnp.arange(k_steps),
              step_valid if has_padding
              else jnp.ones((k_steps,), jnp.float32))
        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), xs)
        return params, opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(many, donate_argnums=donate_argnums)


def make_eval_step_fn(forward_fn: Callable, loss_cfg: LossConfig,
                      class_weights=None):
    """Unjitted eval body — vmappable and jittable."""

    def step(params, batch, rng):
        tim_inputs, tim_labels = _maybe_tim(loss_cfg, rng, batch)
        outputs = forward_fn(params, batch, tim_inputs, None, True)
        total, parts = assemble_loss(loss_cfg, outputs, batch, tim_labels,
                                     class_weights)
        preds, targets = _predictions(loss_cfg, outputs["out_cls"], batch["labels"])
        valid = batch.get("valid")
        correct, n = _accuracy_counts(loss_cfg, preds, targets, valid)
        if loss_cfg.multilabel:
            cm = multilabel_counts_update(preds, targets, valid)
        else:
            cm = confusion_matrix_update(preds, targets, loss_cfg.num_labels, valid)
        return {
            **parts,
            "predictions": preds,
            "targets": targets,
            "cm": cm,
            "correct": correct,
            "n": n,
        }

    return step


def make_eval_step(forward_fn: Callable, loss_cfg: LossConfig, class_weights=None):
    """Eval step: deterministic forward (ITM swap still stochastic, as in the
    reference's eval, mm_late.py:565-568), loss, predictions, and on-device
    confusion accumulation."""
    return jax.jit(make_eval_step_fn(forward_fn, loss_cfg, class_weights))


def make_eval_many(forward_fn: Callable, loss_cfg: LossConfig,
                   class_weights=None):
    """K eval steps in one device dispatch (lax.scan over stacked batches).

    Stateless, so padded tail steps need no skipping — the caller slices
    the stacked outputs to the chunk's real step count. The per-step RNG
    matches Trainer.evaluate's convention (fold_in(root, 10_000_000 + i))
    so chunked and per-batch eval draw identical ITM swaps.
    """
    estep = make_eval_step_fn(forward_fn, loss_cfg, class_weights)

    def many(params, batches, root_key, idx0):
        data = {k: v for k, v in batches.items() if k != "step_valid"}
        k_steps = jax.tree_util.tree_leaves(data)[0].shape[0]

        def body(carry, xs):
            b, i = xs
            key = jax.random.fold_in(root_key, 10_000_000 + idx0 + i)
            return carry, estep(params, b, key)

        _, outs = jax.lax.scan(body, None, (data, jnp.arange(k_steps)))
        return outs

    return jax.jit(many)


def make_feature_step(forward_fn: Callable):
    """mm_features extraction (reference mm_late.py:703-739)."""

    def step(params, batch):
        outputs = forward_fn(params, batch, None, None, True)
        return outputs["mm_features"], jnp.argmax(batch["labels"], axis=-1)

    return jax.jit(step)
