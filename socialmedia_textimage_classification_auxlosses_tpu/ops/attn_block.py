"""Fused attention block: QKV projections + SDPA + out-projection in ONE
Pallas kernel.

The plain SDPA kernel (ops/attention.py) loses to XLA at the paper's training
shapes because the pallas_call is a fusion barrier for the surrounding
projections (BASELINE.md round-2 crossover table). This kernel removes the
barrier by *absorbing* the projections (reference ``mm_late.py:98-113`` run
them as separate Linears):

    attn_out = OutProj( SDPA( x Wq + bq, x Wk + bk, x Wv + bv ) )

per batch element, entirely in VMEM:

* the four weight matrices stay resident across the batch grid (constant
  index_map), read from HBM once per call instead of once per XLA fusion
  window;
* x is read once (the unfused path reads it three times for Q/K/V);
* q/k/v, the per-head (L, L) score matrices, and the context never touch
  HBM.

Mosaic layout constraint: reshapes that split the lane (minor) dimension —
``(L, H) -> (L, heads, d)`` — do not lower on TPU. The kernel therefore
never materialises a heads axis on activations: weights arrive PRE-SPLIT
per head (``Wq: (heads, H, d)``, ``Wo: (heads, d, H)`` — a free XLA reshape
outside), and the kernel statically unrolls over heads with pure 2D MXU
matmuls, accumulating the out-projection head by head.

Backward is a second fully-fused kernel (recompute-in-VMEM, flash style):
it re-derives q/k/v/p per head, runs the SDPA backward, folds the
out-projection and produces ``dx`` on-chip; dq/dk/dv/ctx are banked as
``(B, heads, L, d)`` so the four weight gradients become large clean
matmuls XLA runs at peak — the only extra HBM traffic of the design.

Residual add + LayerNorm + dropout stay outside: they are cheap pointwise
work XLA fuses into neighbours, and dropout must see the train-step RNG.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _head_softmax(s, mask):
    """(L, L) f32 scores -> masked softmax probs, f32."""
    s = jnp.where(mask > 0, s, _NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _qkv_head(x, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, h):
    """One head's q/k/v: (L, H) @ (H, d) + (1, d), activation dtype."""
    dt = x.dtype

    def proj(w_ref, b_ref):
        y = jnp.dot(x, w_ref[h], preferred_element_type=jnp.float32)
        return (y + b_ref[h]).astype(dt)

    return (proj(wq_ref, bq_ref), proj(wk_ref, bk_ref), proj(wv_ref, bv_ref))


def _fwd_kernel(x_ref, mask_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                bv_ref, wo_ref, bo_ref, o_ref, *, heads, scale):
    x = x_ref[0]
    mask = mask_ref[0]  # (1, L)
    acc = jnp.zeros(x.shape, jnp.float32)
    for h in range(heads):
        q, k, v = _qkv_head(x, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                            bv_ref, h)
        s = jax.lax.dot_general(  # (L, L) = Q @ K^T without a transpose op
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = _head_softmax(s, mask)
        ctx = jnp.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(x.dtype)
        acc += jnp.dot(ctx, wo_ref[h], preferred_element_type=jnp.float32)
    o_ref[0] = (acc + bo_ref[...]).astype(o_ref.dtype)


def _bwd_kernel(x_ref, mask_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                bv_ref, wo_ref, bo_ref, do_ref,
                dx_ref, dq_ref, dk_ref, dv_ref, ctx_ref, *, heads, scale):
    x = x_ref[0]
    do = do_ref[0]
    mask = mask_ref[0]
    dx = jnp.zeros(x.shape, jnp.float32)
    for h in range(heads):
        q, k, v = _qkv_head(x, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                            bv_ref, h)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = _head_softmax(s, mask)
        pc = p.astype(do.dtype)
        ctx = jnp.dot(pc, v, preferred_element_type=jnp.float32).astype(x.dtype)
        ctx_ref[0, h] = ctx
        # out-projection backward: dctx = do @ Wo_h^T  ((L,H) @ (H,d))
        dctx = jax.lax.dot_general(
            do, wo_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(do.dtype)
        # SDPA backward, one head in VMEM
        dv = jax.lax.dot_general(  # (L, d) = P^T @ dctx
            pc, dctx, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(  # (L, L) = dctx @ V^T
            dctx, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(k.dtype)
        dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(  # (L, d) = dS^T @ Q
            dsc, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dq_c = dq.astype(x.dtype)
        dk_c = dk.astype(x.dtype)
        dv_c = dv.astype(x.dtype)
        dq_ref[0, h] = dq_c
        dk_ref[0, h] = dk_c
        dv_ref[0, h] = dv_c
        # dx += dq Wq_h^T + dk Wk_h^T + dv Wv_h^T  ((L,d) @ (d,H) via (H,d)^T)
        for g, w_ref in ((dq_c, wq_ref), (dk_c, wk_ref), (dv_c, wv_ref)):
            dx += jax.lax.dot_general(
                g, w_ref[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _fwd_kernel2(x_ref, mask_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                 bv_ref, wo_ref, bo_ref, o_ref, *, heads, scale):
    """Variant 2: full-width (H, H) projection matmuls (full MXU depth),
    per-head score/ctx work on static lane slices of the packed q/k/v."""
    x = x_ref[0]
    mask = mask_ref[0]
    l, hid = x.shape
    d = hid // heads
    dt = x.dtype

    def proj(w_ref, b_ref):
        y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        return (y + b_ref[...]).astype(dt)

    q_all, k_all, v_all = (proj(wq_ref, bq_ref), proj(wk_ref, bk_ref),
                           proj(wv_ref, bv_ref))
    ctx_all = jnp.zeros((l, hid), dt)
    for h in range(heads):
        sl = lambda a: jax.lax.slice(a, (0, h * d), (l, (h + 1) * d))
        q, k, v = sl(q_all), sl(k_all), sl(v_all)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = _head_softmax(s, mask)
        ctx = jnp.dot(p.astype(dt), v,
                      preferred_element_type=jnp.float32).astype(dt)
        ctx_all = jax.lax.dynamic_update_slice(ctx_all, ctx, (0, h * d))
    out = jnp.dot(ctx_all, wo_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (out + bo_ref[...]).astype(o_ref.dtype)


def _bwd_kernel2(x_ref, mask_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                 bv_ref, wo_ref, bo_ref, do_ref,
                 dx_ref, dq_ref, dk_ref, dv_ref, ctx_ref, *, heads, scale):
    x = x_ref[0]
    do = do_ref[0]
    mask = mask_ref[0]
    l, hid = x.shape
    d = hid // heads
    dt = x.dtype

    def proj(w_ref, b_ref):
        y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        return (y + b_ref[...]).astype(dt)

    q_all, k_all, v_all = (proj(wq_ref, bq_ref), proj(wk_ref, bk_ref),
                           proj(wv_ref, bv_ref))
    # dctx = do @ Wo^T, full width
    dctx_all = jax.lax.dot_general(
        do, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    ctx_all = jnp.zeros((l, hid), dt)
    dq_all = jnp.zeros((l, hid), dt)
    dk_all = jnp.zeros((l, hid), dt)
    dv_all = jnp.zeros((l, hid), dt)
    for h in range(heads):
        sl = lambda a: jax.lax.slice(a, (0, h * d), (l, (h + 1) * d))
        q, k, v, dctx = sl(q_all), sl(k_all), sl(v_all), sl(dctx_all)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = _head_softmax(s, mask)
        pc = p.astype(dt)
        ctx = jnp.dot(pc, v, preferred_element_type=jnp.float32).astype(dt)
        dv = jax.lax.dot_general(
            pc, dctx, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            dctx, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(dt)
        dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            dsc, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        upd = jax.lax.dynamic_update_slice
        ctx_all = upd(ctx_all, ctx, (0, h * d))
        dq_all = upd(dq_all, dq.astype(dt), (0, h * d))
        dk_all = upd(dk_all, dk.astype(dt), (0, h * d))
        dv_all = upd(dv_all, dv.astype(dt), (0, h * d))
    ctx_ref[0] = ctx_all
    dq_ref[0] = dq_all
    dk_ref[0] = dk_all
    dv_ref[0] = dv_all
    # dx = dq Wq^T + dk Wk^T + dv Wv^T, full width
    dx = jnp.zeros((l, hid), jnp.float32)
    for g, w_ref in ((dq_all, wq_ref), (dk_all, wk_ref), (dv_all, wv_ref)):
        dx += jax.lax.dot_general(
            g, w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _x_spec(l, h):
    return pl.BlockSpec((1, l, h), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _hd_spec(heads, l, d):
    return pl.BlockSpec((1, heads, l, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _w_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _split_weights(wq, bq, wk, bk, wv, bv, wo, bo, heads):
    """Pre-split per head (outside the kernel, free XLA reshapes):
    Wq/Wk/Wv: (H, H) -> (heads, H, d); biases -> (heads, 1, d);
    Wo: (H, H) -> (heads, d, H); bo -> (1, H)."""
    h = wq.shape[0]
    d = h // heads

    def wsplit(w):
        return w.reshape(h, heads, d).transpose(1, 0, 2)

    def bsplit(b):
        return b.reshape(heads, 1, d)

    return (wsplit(wq), bsplit(bq), wsplit(wk), bsplit(bk), wsplit(wv),
            bsplit(bv), wo.reshape(heads, d, h), bo.reshape(1, h))


def _run_fwd(x, mask, split_ws, heads, scale, interpret):
    b, l, h = x.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale),
        grid=(b,),
        in_specs=[
            _x_spec(l, h),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [_w_spec(w.shape) for w in split_ws],
        out_specs=_x_spec(l, h),
        out_shape=jax.ShapeDtypeStruct((b, l, h), x.dtype),
        interpret=interpret,
    )(x, mask, *split_ws)


def _run_bwd(x, mask, split_ws, do, heads, scale, interpret):
    b, l, h = x.shape
    d = h // heads
    hd = lambda: _hd_spec(heads, l, d)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale),
        grid=(b,),
        in_specs=[
            _x_spec(l, h),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [_w_spec(w.shape) for w in split_ws] + [_x_spec(l, h)],
        out_specs=(_x_spec(l, h), hd(), hd(), hd(), hd()),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, h), x.dtype),
            jax.ShapeDtypeStruct((b, heads, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, heads, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, heads, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, heads, l, d), x.dtype),
        ),
        interpret=interpret,
    )(x, mask, *split_ws, do)
    return outs  # dx, dq, dk, dv, ctx  (head-banked)


def _full_weights(wq, bq, wk, bk, wv, bv, wo, bo):
    h = wq.shape[0]
    return (wq, bq.reshape(1, h), wk, bk.reshape(1, h), wv, bv.reshape(1, h),
            wo, bo.reshape(1, h))


def _run_fwd2(x, mask, full_ws, heads, scale, interpret):
    b, l, h = x.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel2, heads=heads, scale=scale),
        grid=(b,),
        in_specs=[
            _x_spec(l, h),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [_w_spec(w.shape) for w in full_ws],
        out_specs=_x_spec(l, h),
        out_shape=jax.ShapeDtypeStruct((b, l, h), x.dtype),
        interpret=interpret,
    )(x, mask, *full_ws)


def _run_bwd2(x, mask, full_ws, do, heads, scale, interpret):
    b, l, h = x.shape
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel2, heads=heads, scale=scale),
        grid=(b,),
        in_specs=[
            _x_spec(l, h),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [_w_spec(w.shape) for w in full_ws] + [_x_spec(l, h)],
        out_specs=tuple(_x_spec(l, h) for _ in range(5)),
        out_shape=tuple(jax.ShapeDtypeStruct((b, l, h), x.dtype)
                        for _ in range(5)),
        interpret=interpret,
    )(x, mask, *full_ws, do)
    return outs  # dx, dq, dk, dv, ctx  (packed (B, L, H))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _attn_block2(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, heads, scale,
                 interpret):
    full_ws = _full_weights(wq, bq, wk, bk, wv, bv, wo, bo)
    return _run_fwd2(x, mask, full_ws, heads, scale, interpret)


def _attn_block2_fwd(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, heads, scale,
                     interpret):
    full_ws = _full_weights(wq, bq, wk, bk, wv, bv, wo, bo)
    out = _run_fwd2(x, mask, full_ws, heads, scale, interpret)
    return out, (x, mask, wq, bq, wk, bk, wv, bv, wo, bo)


def _attn_block2_bwd(heads, scale, interpret, res, do):
    x, mask, wq, bq, wk, bk, wv, bv, wo, bo = res
    full_ws = _full_weights(wq, bq, wk, bk, wv, bv, wo, bo)
    dx, dq, dk, dv, ctx = _run_bwd2(x, mask, full_ws, do, heads, scale,
                                    interpret)
    h = x.shape[-1]

    def wgrad(a, g):
        return jax.lax.dot_general(
            a.reshape(-1, h), g.reshape(-1, h),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(wq.dtype)

    def bgrad(g):
        return jnp.sum(g.astype(jnp.float32), axis=(0, 1)).astype(bq.dtype)

    return (dx, None, wgrad(x, dq), bgrad(dq), wgrad(x, dk), bgrad(dk),
            wgrad(x, dv), bgrad(dv), wgrad(ctx, do), bgrad(do))


_attn_block2.defvjp(_attn_block2_fwd, _attn_block2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _attn_block(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, heads, scale,
                interpret):
    split_ws = _split_weights(wq, bq, wk, bk, wv, bv, wo, bo, heads)
    return _run_fwd(x, mask, split_ws, heads, scale, interpret)


def _attn_block_fwd(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, heads, scale,
                    interpret):
    split_ws = _split_weights(wq, bq, wk, bk, wv, bv, wo, bo, heads)
    out = _run_fwd(x, mask, split_ws, heads, scale, interpret)
    return out, (x, mask, wq, bq, wk, bk, wv, bv, wo, bo)


def _attn_block_bwd(heads, scale, interpret, res, do):
    x, mask, wq, bq, wk, bk, wv, bv, wo, bo = res
    split_ws = _split_weights(wq, bq, wk, bk, wv, bv, wo, bo, heads)
    dx, dq, dk, dv, ctx = _run_bwd(x, mask, split_ws, do, heads, scale,
                                   interpret)
    b, l, h = x.shape

    def merge(g):  # (B, heads, L, d) -> (B, L, H)
        return g.transpose(0, 2, 1, 3).reshape(b, l, h)

    dq_m, dk_m, dv_m, ctx_m = merge(dq), merge(dk), merge(dv), merge(ctx)

    # Weight gradients: large clean (B*L, H)^T @ (B*L, H) matmuls — XLA runs
    # these at peak; f32 accumulation over the flattened batch.
    def wgrad(a, g):
        return jax.lax.dot_general(
            a.reshape(-1, h), g.reshape(-1, h),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(wq.dtype)

    def bgrad(g):
        return jnp.sum(g.astype(jnp.float32), axis=(0, 1)).astype(bq.dtype)

    return (dx, None, wgrad(x, dq_m), bgrad(dq_m), wgrad(x, dk_m),
            bgrad(dk_m), wgrad(x, dv_m), bgrad(dv_m), wgrad(ctx_m, do),
            bgrad(do))


_attn_block.defvjp(_attn_block_fwd, _attn_block_bwd)


def attn_block_reference(x, key_mask, wq, bq, wk, bk, wv, bv, wo, bo,
                         heads: int, scale: Optional[float] = None):
    """jnp oracle: the same projections + SDPA + out-projection composed
    from XLA ops (numerics match the unfused encoder.Attention path)."""
    from .attention import sdpa_reference

    if scale is None:
        scale = (x.shape[-1] // heads) ** -0.5
    b, l, h = x.shape

    def proj(w, bias):
        y = (jnp.dot(x, w) + bias).reshape(b, l, heads, h // heads)
        return y.transpose(0, 2, 1, 3)

    ctx = sdpa_reference(proj(wq, bq), proj(wk, bk), proj(wv, bv),
                         key_mask=key_mask, scale=scale)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, h)
    return jnp.dot(ctx, wo) + bo


def attn_block(x, key_mask, wq, bq, wk, bk, wv, bv, wo, bo, heads: int,
               scale: Optional[float] = None, impl: str = "fused"):
    """Fused self-attention block.

    x: (B, L, H); key_mask: (B, L) 1=keep; weights: four (H, H) kernels +
    (H,) biases in the flax Dense layout. ``impl``:
      * "fused" / "fused_interpret" — packed-lane variant: full-width
        projection matmuls, per-head score work on static lane slices;
      * "fused_perhead" / "fused_perhead_interpret" — per-head-split
        weights, narrow matmuls (kept for ablation);
      * "jnp" — oracle.
    """
    if scale is None:
        scale = (x.shape[-1] // heads) ** -0.5
    if impl == "jnp":
        return attn_block_reference(x, key_mask, wq, bq, wk, bk, wv, bv, wo,
                                    bo, heads, scale)
    if key_mask is None:
        key_mask = jnp.ones(x.shape[:2], jnp.int32)
    mask = key_mask.astype(jnp.int32)[:, None, :]
    if impl.startswith("fused_perhead"):
        return _attn_block(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, heads,
                           scale, impl.endswith("interpret"))
    return _attn_block2(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, heads,
                        scale, impl.endswith("interpret"))
