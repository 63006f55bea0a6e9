"""Pipeline parallelism over the scanned layer stack (GPipe schedule).

The reference is single-device (reference ``mm_late.py:30``) and none of its
models exceed ~300M params, so SURVEY.md section 2.3 marks PP "not needed —
design leaves layers scannable for future PP". This module is that future:
a working pipeline-parallel execution of any stacked-layer transformer
(``EncoderConfig.scan_layers`` layout, params carrying a leading layer axis)
over a ``pipe`` mesh axis.

TPU-native design (jax-ml.github.io/scaling-book pipelining recipe):

* the mesh gains a ``pipe`` axis; each of the S stages holds L/S contiguous
  layers (the stacked param tree is sharded on its leading axis);
* the global batch splits into M microbatches; a ``shard_map`` runs the
  classic GPipe schedule as a ``lax.scan`` over M + S - 1 ticks, each tick
  applying the stage's local layers and handing activations to the next
  stage with a single ``ppermute`` hop over ICI (the key-padding mask
  travels with its microbatch through the same rotation);
* the WHOLE schedule is differentiable: ``jax.grad`` through the scan +
  ppermute yields the reverse pipeline (ppermute transposes to the opposite
  rotation), so the train step needs no hand-written backward schedule;
* bubble fraction is the textbook (S-1)/(M+S-1); pick M >= 4*S where the
  batch allows.

Composes with the ``data`` axis: microbatch rows stay sharded over ``data``
while the layer axis is sharded over ``pipe`` (tests/test_pipeline.py runs a
data=2 x pipe=4 mesh on the virtual-CPU backend and asserts output and
gradient parity with the sequential stack).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _stage_apply(layer_fn: Callable, local_params, x, key_mask, rng,
                 axis_name):
    """Apply this stage's L/S stacked layers sequentially (lax.scan).

    With ``rng`` (training dropout), ``rng`` is a dropout CONTEXT
    ``{"sites": {site: [L, ...] stacked keys}, "row0": traced row offset,
    "nrows": static global batch rows}``: the site keys are precomputed to
    be bit-identical to flax ``nn.scan(split_rngs={'dropout': True})``
    (``encoder.scan_exact_dropout_site_keys``), each layer slices its
    GLOBAL index (stage offset + local position), and row0/nrows let the
    layer draw the FULL-batch dropout mask and slice its microbatch's rows
    — so a dropout>0 PP run draws the SAME masks as the sequential scan
    stack (tests/test_pp_dropout_exact.py). ``layer_fn`` receives
    ``{"sites": {site: key}, "row0": ..., "nrows": ...}`` per layer."""
    n_local = jax.tree_util.tree_leaves(local_params)[0].shape[0]
    if rng is None:
        def body(h, p_one):
            return layer_fn(p_one, h, key_mask, None), None

        out, _ = jax.lax.scan(body, x, local_params)
        return out

    offset = jax.lax.axis_index(axis_name) * n_local

    def body(h, xs):
        p_one, i = xs
        r = dict(rng, sites=jax.tree_util.tree_map(
            lambda a: a[offset + i], rng["sites"]))
        return layer_fn(p_one, h, key_mask, r), None

    out, _ = jax.lax.scan(body, x, (local_params, jnp.arange(n_local)))
    return out


def interleave_layer_order(n_layers: int, nstages: int, num_levels: int):
    """Layer permutation for the interleaved schedule: stage ``s`` must hold
    the chunks {level*S + s for every level} contiguously in its local shard
    (level-major within the stage). ``perm[i]`` = which sequential layer sits
    at stacked position ``i`` after interleaving."""
    npl = n_layers // (nstages * num_levels)
    perm = []
    for s in range(nstages):
        for l in range(num_levels):
            c = l * nstages + s
            perm.extend(range(c * npl, (c + 1) * npl))
    return np.asarray(perm, np.int32)


def _interleaved_pipeline_apply(layer_fn, stacked_params, x, key_mask, rng, *,
                                num_microbatches: int, num_levels: int,
                                axis_name: str, data_axis=None,
                                data_size: int = 1):
    """Circular (interleaved) pipeline for one device's shard — the
    scaling-book bubble reducer: each stage holds ``num_levels``
    non-adjacent layer chunks and every microbatch loops through the ring
    ``num_levels`` times, so the bubble shrinks from (S-1)/(M+S-1) to
    (S-1)/(vM+S-1) per unit of work. Wrapped activations (stage S-1 ->
    stage 0 between levels) ride the SAME ppermute hop the plain schedule
    uses — stage 0 banks them until their next-level slot comes up, which
    needs ``num_microbatches >= nstages`` (write-before-read in the bank).

    Local params: leading axis = num_levels * layers_per_chunk, level-major
    (see interleave_layer_order). ``rng`` is None or the stacked per-site
    dropout keys in ORIGINAL (sequential) layer order — _chunk_apply slices
    them at each chunk's sequential global offset, so trajectories match
    the non-interleaved pipeline (and the nn.scan stack) exactly."""
    s = jax.lax.axis_index(axis_name)
    nstages = jax.lax.psum(1, axis_name)
    m = num_microbatches
    v = num_levels
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    mb = b // m
    micro = x.reshape(m, mb, *x.shape[1:])
    mask_micro = key_mask.reshape(m, mb, *key_mask.shape[1:])
    n_local = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_local % v:
        raise ValueError(f"{n_local} local layers not divisible by "
                         f"{v} interleave levels")
    npl = n_local // v
    # (v, npl, ...) level-major chunks
    chunks = jax.tree_util.tree_map(
        lambda p: p.reshape((v, npl) + p.shape[1:]), stacked_params)

    fwd_perm = [(i, (i + 1) % nstages) for i in range(nstages)]
    nticks = v * m + nstages - 1
    row0_base, nrows = _row_ctx(data_axis, data_size, b)

    def tick(carry, t):
        act, act_mask, outputs, wrap = carry
        # the activation arriving via rotation is stage S-1's output for
        # item t - S; stage 0 banks it for its next level (write BEFORE the
        # read below so m == S stays correct)
        wslot = jnp.clip(t - nstages, 0, v * m - 1) % m
        do_wrap = jnp.logical_and(s == 0, t >= nstages)
        wrap = jax.lax.cond(
            do_wrap,
            lambda w: jax.lax.dynamic_update_slice(
                w, act[None].astype(w.dtype),
                (wslot,) + (0,) * act.ndim),
            lambda w: w,
            wrap,
        )
        # stage s processes item j = t - s at level j // m
        j = jnp.clip(t - s, 0, v * m - 1)
        level = j // m
        t0 = j % m
        inp0 = jnp.where(level == 0, micro[t0], wrap[t0])
        inp = jnp.where(s == 0, inp0, act)
        km = jnp.where(s == 0, mask_micro[t0], act_mask)
        chunk = jax.tree_util.tree_map(
            lambda c: jax.lax.dynamic_index_in_dim(c, level, 0,
                                                   keepdims=False), chunks)
        # sequential global layer offset of (level, stage) chunk
        offset = (level * nstages + s) * npl
        ctx = None
        if rng is not None:
            ctx = {"sites": rng, "row0": row0_base + t0 * mb,
                   "nrows": nrows}
        out = _chunk_apply(layer_fn, chunk, inp, km, ctx, offset)
        # the last stage banks final-level items
        jj = t - (nstages - 1)
        bank = jnp.logical_and(s == nstages - 1,
                               jnp.logical_and(jj >= (v - 1) * m,
                                               jj < v * m))
        oslot = jnp.clip(jj - (v - 1) * m, 0, m - 1)
        outputs = jax.lax.cond(
            bank,
            lambda o: jax.lax.dynamic_update_slice(
                o, out[None].astype(o.dtype),
                (oslot,) + (0,) * out.ndim),
            lambda o: o,
            outputs,
        )
        act_next = jax.lax.ppermute(out, axis_name, fwd_perm)
        mask_next = jax.lax.ppermute(km, axis_name, fwd_perm)
        return (act_next, mask_next, outputs, wrap), None

    act0 = jnp.zeros((mb,) + x.shape[1:], x.dtype)
    mask0 = jnp.zeros((mb,) + key_mask.shape[1:], key_mask.dtype)
    out0 = jnp.zeros((m, mb) + x.shape[1:], x.dtype)
    wrap0 = jnp.zeros((m, mb) + x.shape[1:], x.dtype)
    (_, _, outputs, _), _ = jax.lax.scan(
        tick, (act0, mask0, out0, wrap0), jnp.arange(nticks))
    outputs = jax.lax.psum(
        jnp.where(s == nstages - 1, outputs, jnp.zeros_like(outputs)),
        axis_name,
    )
    return outputs.reshape(b, *x.shape[1:])


def _chunk_apply(layer_fn, chunk_params, x, key_mask, rng, global_offset):
    """Apply one contiguous chunk of layers; each layer slices its
    SEQUENTIAL global index (global_offset + position) out of the stacked
    precomputed per-layer dropout keys (see _stage_apply)."""
    n = jax.tree_util.tree_leaves(chunk_params)[0].shape[0]
    if rng is None:
        def body(h, p_one):
            return layer_fn(p_one, h, key_mask, None), None

        out, _ = jax.lax.scan(body, x, chunk_params)
        return out

    def body(h, xs):
        p_one, i = xs
        r = dict(rng, sites=jax.tree_util.tree_map(
            lambda a: a[global_offset + i], rng["sites"]))
        return layer_fn(p_one, h, key_mask, r), None

    out, _ = jax.lax.scan(body, x, (chunk_params, jnp.arange(n)))
    return out


def _row_ctx(data_axis, data_size, b):
    """(row0_base, nrows_global) for slice-exact dropout: this shard's row
    offset within the GLOBAL logical batch, and the global row count (pjit
    guarantees the sequential stack's one logical mask regardless of
    sharding, so PP slices the same full draw)."""
    if data_axis is None or data_size <= 1:
        return 0, b * max(data_size, 1)
    return jax.lax.axis_index(data_axis) * b, b * data_size


def pipeline_apply(layer_fn, stacked_params, x, key_mask, rng=None, *,
                   num_microbatches: int, axis_name: str = "pipe",
                   data_axis=None, data_size: int = 1):
    """GPipe forward for one device's shard — call INSIDE shard_map.

    ``layer_fn(params_one_layer, h, key_mask, rng) -> h`` applies a single
    layer (``rng`` is None in deterministic mode, else a per-layer dropout
    key). ``stacked_params``: this stage's local shard, leading axis = local
    layers. ``x``: the stage-local batch rows ``(B, T, H)`` (replicated over
    the pipe axis; only stage 0 reads it). ``key_mask``: ``(B, T)`` padding
    mask; it rotates stage-to-stage alongside the activations, since each
    stage processes a microbatch that lags stage 0 by the stage index.
    Returns the final hidden states, replicated over the pipe axis.
    """
    s = jax.lax.axis_index(axis_name)
    nstages = jax.lax.psum(1, axis_name)
    m = num_microbatches
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    mb = b // m
    micro = x.reshape(m, mb, *x.shape[1:])
    mask_micro = key_mask.reshape(m, mb, *key_mask.shape[1:])

    fwd_perm = [(i, (i + 1) % nstages) for i in range(nstages)]
    nticks = m + nstages - 1
    row0_base, nrows = _row_ctx(data_axis, data_size, b)

    def tick(carry, t):
        act, act_mask, outputs = carry
        # stage 0 ingests microbatch t (clamped; ticks >= m feed rows that
        # never reach the banked output window), later stages consume the
        # rotated activations + mask
        t_in = jnp.clip(t, 0, m - 1)
        inp = jnp.where(s == 0, micro[t_in], act)
        km = jnp.where(s == 0, mask_micro[t_in], act_mask)
        ctx = None
        if rng is not None:
            # stage s is processing microbatch t - s (clamped)
            mbi = jnp.clip(t - s, 0, m - 1)
            ctx = {"sites": rng, "row0": row0_base + mbi * mb,
                   "nrows": nrows}
        out = _stage_apply(layer_fn, stacked_params, inp, km, ctx, axis_name)
        # the last stage banks microbatch t - (S-1)
        j = t - (nstages - 1)
        bank = jnp.logical_and(s == nstages - 1, j >= 0)
        outputs = jax.lax.cond(
            bank,
            lambda o: jax.lax.dynamic_update_slice(
                o, out[None].astype(o.dtype),
                (jnp.maximum(j, 0),) + (0,) * out.ndim),
            lambda o: o,
            outputs,
        )
        act_next = jax.lax.ppermute(out, axis_name, fwd_perm)
        mask_next = jax.lax.ppermute(km, axis_name, fwd_perm)
        return (act_next, mask_next, outputs), None

    act0 = jnp.zeros((mb,) + x.shape[1:], x.dtype)
    mask0 = jnp.zeros((mb,) + key_mask.shape[1:], key_mask.dtype)
    out0 = jnp.zeros((m, mb) + x.shape[1:], x.dtype)
    (_, _, outputs), _ = jax.lax.scan(
        tick, (act0, mask0, out0), jnp.arange(nticks))
    # replicate the last stage's banked outputs to every pipe rank
    outputs = jax.lax.psum(
        jnp.where(s == nstages - 1, outputs, jnp.zeros_like(outputs)),
        axis_name,
    )
    return outputs.reshape(b, *x.shape[1:])


def make_pipelined_stack(
    layer_fn: Callable,
    mesh: Mesh,
    *,
    num_microbatches: int,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = "data",
    num_levels: int = 1,
):
    """shard_map-wrapped pipelined layer stack.

    Returns ``run(stacked_params, x, key_mask) -> hidden`` where
    ``stacked_params`` leaves carry a leading layer axis (sharded over
    ``pipe_axis``), ``x`` is ``(B, T, H)`` (rows shardable over
    ``data_axis``), and the output matches the sequential stack.

    ``num_levels > 1`` runs the interleaved (circular) schedule: each stage
    holds ``num_levels`` non-adjacent layer chunks and microbatches loop the
    ring, cutting the bubble by ~``num_levels``. The stacked layer axis is
    re-ordered here (``interleave_layer_order``) so the result still matches
    the sequential stack; at CLI scale this per-step gather is negligible —
    at pod scale pre-permute the params once at sharding time instead.
    Requires ``num_microbatches >= nstages``.
    """
    nstages = mesh.shape[pipe_axis]
    dspec = data_axis if (data_axis and data_axis in mesh.shape) else None

    param_specs = P(pipe_axis)  # leading layer axis sharded over stages
    x_spec = P(dspec)           # rows over data, replicated over pipe
    if num_levels > 1 and num_microbatches < nstages:
        raise ValueError(
            f"interleaved pipeline needs microbatches >= stages "
            f"({num_microbatches} < {nstages}): the wrap bank at stage 0 "
            "must be written before its next-level read")

    dsize = mesh.shape[dspec] if dspec else 1

    def _apply(stacked_params, x, key_mask, rng):
        if num_levels > 1:
            return _interleaved_pipeline_apply(
                layer_fn, stacked_params, x, key_mask, rng,
                num_microbatches=num_microbatches, num_levels=num_levels,
                axis_name=pipe_axis, data_axis=dspec, data_size=dsize)
        return pipeline_apply(
            layer_fn, stacked_params, x, key_mask, rng,
            num_microbatches=num_microbatches, axis_name=pipe_axis,
            data_axis=dspec, data_size=dsize)

    def run(stacked_params, x, key_mask=None, rng=None):
        n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
        if n_layers % (nstages * num_levels):
            raise ValueError(
                f"{n_layers} layers not divisible by {nstages} pipeline "
                f"stages x {num_levels} interleave levels")
        if num_levels > 1:
            perm = jnp.asarray(
                interleave_layer_order(n_layers, nstages, num_levels))
            stacked_params = jax.tree_util.tree_map(
                lambda p: jnp.take(p, perm, axis=0), stacked_params)
            # NOTE: the stacked per-layer dropout keys are NOT permuted —
            # _chunk_apply slices them at the SEQUENTIAL global offset of
            # each (level, stage) chunk, which is already original-order
        if key_mask is None:
            key_mask = jnp.ones(x.shape[:2], jnp.int32)
        if rng is None:
            def inner(stacked_params, x, key_mask):
                return _apply(stacked_params, x, key_mask, None)

            f = shard_map(
                inner, mesh=mesh,
                in_specs=(jax.tree_util.tree_map(lambda _: param_specs,
                                                 stacked_params),
                          x_spec, x_spec),
                out_specs=x_spec,
                check_rep=False,
            )
            return f(stacked_params, x, key_mask)

        def inner_rng(stacked_params, x, key_mask, rng):
            return _apply(stacked_params, x, key_mask, rng)

        f = shard_map(
            inner_rng, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: param_specs,
                                             stacked_params),
                      x_spec, x_spec,
                      jax.tree_util.tree_map(lambda _: P(), rng)),
            out_specs=x_spec,
            check_rep=False,
        )
        return f(stacked_params, x, key_mask, rng)

    return run


def make_pp_mesh(pipe: int, data: int = 1, devices=None) -> Mesh:
    """(data, pipe) mesh; pipe is the minor axis so stage hops ride
    neighbouring ICI links."""
    devices = devices if devices is not None else jax.devices()
    if data * pipe > len(devices):
        raise ValueError(f"mesh {data}x{pipe} exceeds {len(devices)} devices")
    arr = np.asarray(devices[: data * pipe]).reshape(data, pipe)
    return Mesh(arr, ("data", "pipe"))


def shard_stacked_params(mesh: Mesh, stacked_params, pipe_axis: str = "pipe"):
    """Place a stacked-layer param tree with its leading axis over the pipe
    stages (device_put with a NamedSharding per leaf)."""
    sh = NamedSharding(mesh, P(pipe_axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh),
                                  stacked_params)
