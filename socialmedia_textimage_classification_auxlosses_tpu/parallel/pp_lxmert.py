"""Pipeline-parallel LXMERT (``--mesh_pipe`` for ``run_mm_early --model
lxmert``).

The reference runs LXMERT on one CPU device (reference ``mm_early.py:105-172``,
``mm_late.py:30``); here its three stacks — language (9), vision (5) and the
cross-modality layers (5) — each run as a GPipe segment over the ``pipe``
mesh axis, reusing the differentiable shard_map+ppermute schedule of
``parallel/pipeline.py``:

* the lang and vis stacks are ordinary encoder-layer pipelines
  (``make_stack_runner``'s shape, plus pad-slot masking);
* the cross-modality stack carries BOTH streams through the pipe: each hop
  rotates the concatenated ``[lang ‖ vis]`` tensor (and its concatenated
  mask), and the per-stage layer splits it at the static ROI boundary,
  applies ``CrossModalityLayer`` and re-concatenates — so the 36-ROI
  cross-attention (the kernel BASELINE's north star names) runs distributed
  without a hand-written two-stream schedule;
* LXMERT's depths (9/5/5) rarely divide the stage count, so each stack's
  scanned length pads to a multiple (``models/lxmert.py::pad_layers``) and
  pad slots are identity: the runner threads an ``active`` flag with the
  stacked params and keeps the carry unchanged on inactive slots.

Segments run back-to-back: three bubbles of (S-1)/(M+S-1) each instead of
one — the price of keeping each segment homogeneous; fine at the module's
scale and exact in output (parity test-enforced, tests/test_pp_lxmert.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.encoder import EncoderLayer
from ..models.lxmert import CrossModalityLayer
from .pipeline import make_pipelined_stack


def _with_active(stacked, n_real: int):
    """Pair the stacked (padded) layer params with a per-slot active flag;
    the combined tree shards on its leading axis like the params do."""
    n_pad = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return {"p": stacked, "active": jnp.arange(n_pad) < n_real}


def make_encoder_segment_runner(cfg, mesh: Mesh, num_microbatches: int,
                                n_real: int) -> Callable:
    """Pipelined encoder-layer segment with identity pad slots.

    Returns ``runner(stacked, x, key_mask, rng) -> hidden`` for the lang and
    vis stacks (``LxmertConfig.pp_runners['lang'/'vis']``)."""

    def layer_fn(p_one, h, km, rng):
        # rng: dropout context (see pp_text.make_stack_runner) — per-site
        # keys for THIS layer plus the microbatch's row window, injected as
        # explicit (key, row0, nrows) for slice-exact nn.scan-parity masks
        site_rngs = None if rng is None else {
            name: (k, rng["row0"], rng["nrows"])
            for name, k in rng["sites"].items()}
        out = EncoderLayer(cfg).apply({"params": p_one["p"]}, h, km,
                                      rng is None, site_rngs=site_rngs)
        return jnp.where(p_one["active"], out, h)

    run = make_pipelined_stack(layer_fn, mesh,
                               num_microbatches=num_microbatches)

    def runner(stacked, x, key_mask, rng):
        return run(_with_active(stacked, n_real), x, key_mask, rng=rng)

    return runner


def make_cross_segment_runner(cfg, mesh: Mesh, num_microbatches: int,
                              n_real: int, vis_len: int) -> Callable:
    """Pipelined cross-modality segment.

    Returns ``runner(stacked, lang, vis, lang_mask, vis_mask, rng) ->
    (lang, vis)`` (``LxmertConfig.pp_runners['x']``). The two streams ride
    the pipe concatenated on the sequence axis and split at the static ROI
    boundary ``vis_len`` (the language side may vary per ``--bucket_seq``
    width; each width compiles its own schedule like every other bucketed
    program)."""

    def layer_fn(p_one, h, km, rng):
        lang_len = h.shape[1] - vis_len
        lang, vis = h[:, :lang_len], h[:, lang_len:]
        lm, vm = km[:, :lang_len], km[:, lang_len:]
        site_rngs = None if rng is None else {
            name: (k, rng["row0"], rng["nrows"])
            for name, k in rng["sites"].items()}
        l2, v2 = CrossModalityLayer(cfg).apply(
            {"params": p_one["p"]}, lang, vis, lm, vm, rng is None,
            site_rngs=site_rngs)
        out = jnp.concatenate([l2, v2], axis=1)
        return jnp.where(p_one["active"], out, h)

    run = make_pipelined_stack(layer_fn, mesh,
                               num_microbatches=num_microbatches)

    def runner(stacked, lang, vis, lang_mask, vis_mask, rng):
        if vis.shape[1] != vis_len:
            raise ValueError(
                f"cross segment built for {vis_len} ROIs, got {vis.shape[1]}")
        h = jnp.concatenate([lang, vis], axis=1)
        km = jnp.concatenate([lang_mask.astype(jnp.int32),
                              vis_mask.astype(jnp.int32)], axis=1)
        out = run(_with_active(stacked, n_real), h, km, rng=rng)
        lang_len = lang.shape[1]
        return out[:, :lang_len], out[:, lang_len:]

    return runner


def make_lxmert_pp_runners(lx_cfg, mesh: Mesh, num_microbatches: int,
                           vis_len: int) -> dict:
    """``LxmertConfig.pp_runners`` dict for the three segments. ``lx_cfg``:
    the model config WITHOUT runners installed (layer math must match the
    sequential scan); ``vis_len``: ROI count (36 for the reference cache,
    obj_features.py:157-164)."""
    lcfg = lx_cfg.encoder_cfg(lx_cfg.l_layers)
    return {
        "lang": make_encoder_segment_runner(lcfg, mesh, num_microbatches,
                                            lx_cfg.l_layers),
        "vis": make_encoder_segment_runner(lcfg, mesh, num_microbatches,
                                           lx_cfg.r_layers),
        "x": make_cross_segment_runner(lcfg, mesh, num_microbatches,
                                       lx_cfg.x_layers, vis_len),
    }


def lxmert_stack_pred(keys) -> bool:
    """PipeMeshPlan ``stack_pred`` for the LXMERT layout: shard the three
    scanned stacks' leading layer axis over ``pipe``."""
    return any(keys[i].endswith("_layers") and keys[i + 1] == "layer"
               for i in range(len(keys) - 1))
