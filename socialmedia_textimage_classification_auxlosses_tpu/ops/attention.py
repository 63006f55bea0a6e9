"""Fused scaled-dot-product attention (Pallas TPU kernel + reference path).

This is the hot op of every model in the framework: encoder self-attention
(text 128 tokens, image 197 tokens), the late-fusion text->image
cross-attention head (reference ``mm_late.py:98-113,195-210``), and LXMERT's
cross-modal attention over ROI features (reference ``mm_early.py:121-129``).

Design (see /opt/skills/guides/pallas_guide.md): at these sequence lengths a
whole (Lq, D) x (Lk, D) attention problem fits comfortably in VMEM, so the
kernel runs one grid step per (batch x head), keeps Q/K/V/S entirely on-chip,
and never materialises the (B, H, Lq, Lk) score tensor in HBM — the win over
the unfused XLA path is HBM traffic, not FLOPs. The backward pass is a second
fully-fused kernel (recompute-in-VMEM flash style) wired up via
``jax.custom_vjp``.

The ``sdpa`` entry point dispatches: Pallas on TPU backends, a pure-jnp
reference path elsewhere (CPU tests, interpret-mode parity checks).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Reference (jnp) path — also the numerics oracle for the kernel tests.
# ---------------------------------------------------------------------------


def sdpa_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """softmax(q k^T * scale + mask) v.

    q: (B, H, Lq, D); k, v: (B, H, Lk, D); key_mask: (B, Lk) 1=keep 0=pad.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    scores = scores.astype(jnp.float32)
    if key_mask is not None:
        bias = jnp.where(key_mask[:, None, None, :] > 0, 0.0, _NEG_INF)
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _probs(q, k, mask, scale):
    """q: (H, Lq, D), k: (H, Lk, D), mask: (1, Lk) -> P: (H, Lq, Lk).

    One head-batched MXU contraction instead of per-head matmuls. Matmul
    inputs stay in their native dtype (bf16 on the training path — full MXU
    rate); softmax statistics accumulate in f32.
    """
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask[None, :, :] > 0, s, _NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    """One batch element's attention across ALL heads, fully in VMEM. Only
    the output leaves the chip — no (H, Lq, Lk) score/probability tensor ever
    touches HBM (the backward kernel recomputes it, flash-attention style).
    Head-batched contractions keep the MXU on large tiles; a per-(batch,head)
    grid measured ~15% slower end-to-end at these shapes."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    p = _probs(q, k, mask_ref[0], scale)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale):
    """Backward for one batch element (all heads): recompute P in VMEM, then
    dV = P^T dO; dS = P ∘ (dO V^T - rowsum); dQ = dS K scale; dK = dS^T Q
    scale. All intermediates stay on-chip."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    p = _probs(q, k, mask_ref[0], scale)
    pc = p.astype(do.dtype)
    dv = jax.lax.dot_general(  # (H, Lk, D) = P^T (H, Lq, Lk) @ dO (H, Lq, D)
        pc, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(  # (H, Lq, Lk) = dO @ V^T
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsc = ds.astype(k.dtype)
    dq = jax.lax.dot_general(  # (H, Lq, D) = dS @ K
        dsc, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(  # (H, Lk, D) = dS^T @ Q
        dsc, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _b_spec(h, l, d):
    return pl.BlockSpec((1, h, l, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


# -- Lq-blocked variants (long sequences) ------------------------------------
#
# Above ~256 query tokens the whole-(Lq, Lk) score block outgrows VMEM, so
# the grid gains a query-block axis: K/V stay resident per batch element
# while Q/dO stream in 128-row tiles. Backward accumulates dK/dV across the
# query tiles by revisiting the same output block (TPU grids iterate the
# last axis innermost and sequentially, so the accumulation is race-free).

_Q_BLOCK = 128


def _fwd_kernel_blocked(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]
    p = _probs(q, k_ref[0], mask_ref[0], scale)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel_blocked(q_ref, k_ref, v_ref, mask_ref, do_ref,
                        dq_ref, dk_ref, dv_ref, *, scale):
    j = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    p = _probs(q, k, mask_ref[0], scale)
    pc = p.astype(do.dtype)
    dv = jax.lax.dot_general(
        pc, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsc = ds.astype(k.dtype)
    dq = jax.lax.dot_general(
        dsc, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        dsc, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(j > 0)
    def _accum():
        dk_ref[0] = dk_ref[0] + dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv.astype(dv_ref.dtype)


def _pad_q(x, bq):
    lq = x.shape[2]
    rem = (-lq) % bq
    if rem:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, rem), (0, 0)))
    return x


def _pallas_fwd(q, k, v, key_mask, scale, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    mask = key_mask.astype(jnp.int32)[:, None, :]  # (B, 1, Lk)
    if lq <= 2 * _Q_BLOCK:
        return pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale),
            grid=(b,),
            in_specs=[
                _b_spec(h, lq, d),
                _b_spec(h, lk, d),
                _b_spec(h, lk, d),
                pl.BlockSpec((1, 1, lk), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=_b_spec(h, lq, d),
            out_shape=jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
            interpret=interpret,
        )(q, k, v, mask)
    qp = _pad_q(q, _Q_BLOCK)
    nj = qp.shape[2] // _Q_BLOCK
    qb = lambda: pl.BlockSpec((1, h, _Q_BLOCK, d), lambda i, j: (i, 0, j, 0),
                              memory_space=pltpu.VMEM)
    kvb = lambda: pl.BlockSpec((1, h, lk, d), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_blocked, scale=scale),
        grid=(b, nj),
        in_specs=[
            qb(), kvb(), kvb(),
            pl.BlockSpec((1, 1, lk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qb(),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(qp, k, v, mask)
    return out[:, :, :lq, :]


def _pallas_bwd(q, k, v, key_mask, do, scale, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    mask = key_mask.astype(jnp.int32)[:, None, :]
    if lq <= 2 * _Q_BLOCK:
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_kernel, scale=scale),
            grid=(b,),
            in_specs=[
                _b_spec(h, lq, d),
                _b_spec(h, lk, d),
                _b_spec(h, lk, d),
                pl.BlockSpec((1, 1, lk), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                _b_spec(h, lq, d),
            ],
            out_specs=(_b_spec(h, lq, d), _b_spec(h, lk, d), _b_spec(h, lk, d)),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, lk, d), k.dtype),
                jax.ShapeDtypeStruct((b, h, lk, d), v.dtype),
            ),
            interpret=interpret,
        )(q, k, v, mask, do)
        return dq, dk, dv
    qp = _pad_q(q, _Q_BLOCK)
    dop = _pad_q(do, _Q_BLOCK)  # zero rows -> zero dS -> no dK/dV pollution
    nj = qp.shape[2] // _Q_BLOCK
    qb = lambda: pl.BlockSpec((1, h, _Q_BLOCK, d), lambda i, j: (i, 0, j, 0),
                              memory_space=pltpu.VMEM)
    kvb = lambda: pl.BlockSpec((1, h, lk, d), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_blocked, scale=scale),
        grid=(b, nj),
        in_specs=[
            qb(), kvb(), kvb(),
            pl.BlockSpec((1, 1, lk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            qb(),
        ],
        out_specs=(qb(), kvb(), kvb()),
        out_shape=(
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            # dK/dV accumulate across query tiles: keep f32, cast at the end
            jax.ShapeDtypeStruct((b, h, lk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, lk, d), jnp.float32),
        ),
        interpret=interpret,
    )(qp, k, v, mask, dop)
    return dq[:, :, :lq, :], dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sdpa_pallas(q, k, v, key_mask, scale, interpret):
    return _pallas_fwd(q, k, v, key_mask, scale, interpret)


def _sdpa_pallas_fwd(q, k, v, key_mask, scale, interpret):
    out = _pallas_fwd(q, k, v, key_mask, scale, interpret)
    return out, (q, k, v, key_mask)


def _sdpa_pallas_bwd(scale, interpret, res, do):
    q, k, v, key_mask = res
    dq, dk, dv = _pallas_bwd(q, k, v, key_mask, do, scale, interpret)
    return dq, dk, dv, None


_sdpa_pallas.defvjp(_sdpa_pallas_fwd, _sdpa_pallas_bwd)


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------

# Measured fwd+bwd crossover on a v5e (BASELINE.md round-2 ablation, 100-iter
# timings): XLA wins below ~3e6 score elements per head-group
# (b*lq*lk at h=12 -> 3.6e7 with heads folded in); Pallas wins 23-28% above
# it (e.g. b=96 L=197: 1.71 vs 2.31 ms; b=64 L=256: 1.30 vs 1.80 ms).
_AUTO_MIN_WORK = 3.6e7  # b*h*lq*lk
# Per-step scoped-VMEM budget for the BACKWARD kernel (the binding pair of
# the custom VJP: if the bwd can't fit, auto must not pick pallas for the
# fwd). The chip scopes kernel stack allocations to 16 MB; leave margin for
# double-buffered streaming operands. Measured: at b=64 h=12 l=512 the
# blocked bwd is rejected by the compiler with a 20.25 MB scoped allocation
# ("Ran out of memory in memory space vmem", v5e, 2026-08-17) — the
# estimator below puts that shape at ~15 MB resident + streaming, correctly
# over budget.
_AUTO_MAX_BWD_VMEM = 12 * 1024 * 1024


def _bwd_vmem_bytes(h: int, lq: int, lk: int, d: int,
                    itemsize: int = 2) -> int:
    """Resident bytes per grid step of the backward kernel: the f32
    score-shaped intermediates (p, dp, ds — `_bwd_kernel*`), the Q/dO/dQ
    tiles, whole-Lk K/V, and the dK/dV accumulators (f32 across query tiles
    in the blocked variant, attention.py:280-285)."""
    blocked = lq > 2 * _Q_BLOCK
    block_lq = _Q_BLOCK if blocked else lq
    score = 3 * h * block_lq * lk * 4            # p, dp, ds (f32)
    q_tiles = 3 * h * block_lq * d * itemsize     # q, do, dq
    kv = 2 * h * lk * d * itemsize               # k, v
    dkv = 2 * h * lk * d * (4 if blocked else itemsize)
    return score + q_tiles + kv + dkv


def _auto_impl(b: int, h: int, lq: int, lk: int, d: int = 64) -> str:
    if jax.default_backend() == "cpu":  # no Pallas TPU lowering on host
        return "jnp"
    work = b * h * lq * lk
    fits = _bwd_vmem_bytes(h, lq, lk, d) <= _AUTO_MAX_BWD_VMEM
    # Short-key cross-attention (LXMERT: 128 text queries over 36 ROI keys,
    # reference mm_early.py:121-129): the kernel beats XLA's lane-padded
    # softmax 8-14% at lk=36 for b in {8,16} (BASELINE.md round-3 cross
    # table), independent of the large-work crossover below.
    if lk <= 48 and lq >= 64 and fits:
        return "pallas"
    if work >= _AUTO_MIN_WORK and fits:
        return "pallas"
    return "jnp"


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Fused SDPA. ``impl``: "auto" | "pallas" | "pallas_interpret" | "jnp".

    ``auto`` dispatches per shape from the measured v5e crossover
    (``_auto_impl``): XLA below ~3.6e7 score elements — there the whole
    attention fits XLA's fusion windows and the Pallas call would be a
    fusion barrier for the surrounding projections — and the Pallas kernel
    above it (23-28% faster fwd+bwd at b>=96 L=197 / b>=64 L=256), capped
    by the kernel's VMEM footprint. At the paper's training shapes
    (batch 8, seq <=224) auto therefore resolves to XLA; large-batch
    serving/fine-tune configs get the kernel automatically.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        b, h, lq, d = q.shape
        impl = _auto_impl(b, h, lq, k.shape[2], d)
    if impl == "jnp":
        return sdpa_reference(q, k, v, key_mask, scale)
    if key_mask is None:
        key_mask = jnp.ones((q.shape[0], k.shape[2]), jnp.int32)
    return _sdpa_pallas(q, k, v, key_mask, scale, impl == "pallas_interpret")
