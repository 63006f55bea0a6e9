"""Fused attention block: QKV projections + SDPA + out-projection in ONE
Pallas kernel.

The plain SDPA kernel (ops/attention.py) loses to XLA at the paper's training
shapes because the pallas_call is a fusion barrier for the surrounding
projections (BASELINE.md round-2 crossover table). This kernel removes the
barrier by *absorbing* the projections (reference ``mm_late.py:98-113`` run
them as separate Linears):

    attn_out = OutProj( SDPA( x Wq + bq, x Wk + bk, x Wv + bv ) )

per batch element, entirely in VMEM:

* the four (H, H) weight matrices stay resident across the batch grid
  (constant index_map), read from HBM once per call instead of once per
  XLA fusion window;
* x is read once (the unfused path reads it three times for Q/K/V);
* q/k/v, the (heads, L, L) score tensor, and the context never touch HBM.

Backward is a second fully-fused kernel (recompute-in-VMEM, flash style): it
re-derives q/k/v/p, runs the SDPA backward, folds the out-projection and
produces ``dx`` on-chip; the four weight gradients are large clean matmuls
(``x^T dq`` etc.) that XLA runs at peak off the ``dq/dk/dv/ctx``
intermediates the kernel banks — the only extra HBM traffic of the design.

Residual add + LayerNorm + dropout stay outside: they are cheap pointwise
work XLA fuses into neighbours, and dropout must see the train-step RNG.

Layout notes (/opt/skills/guides/pallas_guide.md): all contractions are
head-batched ``dot_general``s on the MXU with f32 accumulation
(``preferred_element_type``); bf16 operands keep full MXU rate; softmax
statistics are f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _split_heads(x, heads):
    """(L, H) -> (heads, L, d)."""
    l, h = x.shape
    return x.reshape(l, heads, h // heads).transpose(1, 0, 2)


def _merge_heads(x):
    """(heads, L, d) -> (L, H)."""
    nh, l, d = x.shape
    return x.transpose(1, 0, 2).reshape(l, nh * d)


def _qkv(x, wq, bq, wk, bk, wv, bv, heads):
    q = jnp.dot(x, wq, preferred_element_type=jnp.float32) + bq
    k = jnp.dot(x, wk, preferred_element_type=jnp.float32) + bk
    v = jnp.dot(x, wv, preferred_element_type=jnp.float32) + bv
    dt = x.dtype
    return (_split_heads(q.astype(dt), heads), _split_heads(k.astype(dt), heads),
            _split_heads(v.astype(dt), heads))


def _probs(q, k, mask, scale):
    """(h, Lq, d) x (h, Lk, d) -> softmax probs (h, Lq, Lk), f32."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask[None, :, :] > 0, s, _NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _ctx(p, v):
    """probs (h, L, L) x v (h, L, d) -> merged context (L, H)."""
    c = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return _merge_heads(c.astype(v.dtype))


def _fwd_kernel(x_ref, mask_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                bv_ref, wo_ref, bo_ref, o_ref, *, heads, scale):
    x = x_ref[0]
    q, k, v = _qkv(x, wq_ref[...], bq_ref[...], wk_ref[...], bk_ref[...],
                   wv_ref[...], bv_ref[...], heads)
    p = _probs(q, k, mask_ref[0], scale)
    ctx = _ctx(p, v)
    out = jnp.dot(ctx, wo_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (out + bo_ref[...]).astype(o_ref.dtype)


def _bwd_kernel(x_ref, mask_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                bv_ref, wo_ref, bo_ref, do_ref,
                dx_ref, dq_ref, dk_ref, dv_ref, ctx_ref, *, heads, scale):
    x = x_ref[0]
    do = do_ref[0]
    q, k, v = _qkv(x, wq_ref[...], bq_ref[...], wk_ref[...], bk_ref[...],
                   wv_ref[...], bv_ref[...], heads)
    p = _probs(q, k, mask_ref[0], scale)
    ctx = _ctx(p, v)
    ctx_ref[0] = ctx.astype(ctx_ref.dtype)
    # out-projection backward: dctx = do Wo^T (contract feature axes)
    dctx = jax.lax.dot_general(
        do, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(do.dtype)
    dctx_h = _split_heads(dctx, heads)
    # SDPA backward (recompute-in-VMEM): dV = P^T dctx; dS = P o (dctx V^T -
    # rowsum); dQ = dS K scale; dK = dS^T Q scale
    pc = p.astype(dctx_h.dtype)
    dv = jax.lax.dot_general(
        pc, dctx_h, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        dctx_h, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsc = ds.astype(k.dtype)
    dq = jax.lax.dot_general(
        dsc, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        dsc, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_m = _merge_heads(dq.astype(x.dtype))
    dk_m = _merge_heads(dk.astype(x.dtype))
    dv_m = _merge_heads(dv.astype(x.dtype))
    dq_ref[0] = dq_m
    dk_ref[0] = dk_m
    dv_ref[0] = dv_m
    # dx = dq Wq^T + dk Wk^T + dv Wv^T, all in VMEM
    dx = jax.lax.dot_general(
        dq_m, wq_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx += jax.lax.dot_general(
        dk_m, wk_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx += jax.lax.dot_general(
        dv_m, wv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _x_spec(l, h):
    return pl.BlockSpec((1, l, h), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _w_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _run_fwd(x, mask, weights, heads, scale, interpret):
    b, l, h = x.shape
    wq, bq, wk, bk, wv, bv, wo, bo = weights
    # biases as (1, H) rows: rank-2 VMEM blocks lay out cleanly on the
    # (sublane, lane) tiling; they broadcast against (L, H) in the kernel
    bq, bk, bv, bo = (z.reshape(1, h) for z in (bq, bk, bv, bo))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale),
        grid=(b,),
        in_specs=[
            _x_spec(l, h),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _w_spec(wq.shape), _w_spec(bq.shape), _w_spec(wk.shape),
            _w_spec(bk.shape), _w_spec(wv.shape), _w_spec(bv.shape),
            _w_spec(wo.shape), _w_spec(bo.shape),
        ],
        out_specs=_x_spec(l, h),
        out_shape=jax.ShapeDtypeStruct((b, l, h), x.dtype),
        interpret=interpret,
    )(x, mask, wq, bq, wk, bk, wv, bv, wo, bo)


def _run_bwd(x, mask, weights, do, heads, scale, interpret):
    b, l, h = x.shape
    wq, bq, wk, bk, wv, bv, wo, bo = weights
    bq, bk, bv, bo = (z.reshape(1, h) for z in (bq, bk, bv, bo))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale),
        grid=(b,),
        in_specs=[
            _x_spec(l, h),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _w_spec(wq.shape), _w_spec(bq.shape), _w_spec(wk.shape),
            _w_spec(bk.shape), _w_spec(wv.shape), _w_spec(bv.shape),
            _w_spec(wo.shape), _w_spec(bo.shape),
            _x_spec(l, h),
        ],
        out_specs=tuple(_x_spec(l, h) for _ in range(5)),
        out_shape=tuple(jax.ShapeDtypeStruct((b, l, h), x.dtype)
                        for _ in range(5)),
        interpret=interpret,
    )(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, do)
    return outs  # dx, dq, dk, dv, ctx


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _attn_block(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, heads, scale,
                interpret):
    return _run_fwd(x, mask, (wq, bq, wk, bk, wv, bv, wo, bo), heads, scale,
                    interpret)


def _attn_block_fwd(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, heads, scale,
                    interpret):
    out = _run_fwd(x, mask, (wq, bq, wk, bk, wv, bv, wo, bo), heads, scale,
                   interpret)
    return out, (x, mask, wq, bq, wk, bk, wv, bv, wo, bo)


def _attn_block_bwd(heads, scale, interpret, res, do):
    x, mask, wq, bq, wk, bk, wv, bv, wo, bo = res
    dx, dq, dk, dv, ctx = _run_bwd(
        x, mask, (wq, bq, wk, bk, wv, bv, wo, bo), do, heads, scale,
        interpret)
    # Weight gradients: large clean (B*L, H)^T @ (B*L, H) matmuls — XLA runs
    # these at peak; f32 accumulation over the flattened batch.
    def wgrad(a, g):
        return jax.lax.dot_general(
            a.reshape(-1, a.shape[-1]), g.reshape(-1, g.shape[-1]),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(wq.dtype)

    def bgrad(g):
        return jnp.sum(g.astype(jnp.float32), axis=(0, 1)).astype(bq.dtype)

    dwq, dwk, dwv = wgrad(x, dq), wgrad(x, dk), wgrad(x, dv)
    dwo = wgrad(ctx, do)
    return (dx, None, dwq, bgrad(dq), dwk, bgrad(dk), dwv, bgrad(dv),
            dwo, bgrad(do))


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
    (H,) biases in the flax Dense layout. ``impl``: "fused" (Pallas TPU
    kernel), "fused_interpret" (CPU-debuggable), "jnp" (oracle).
    """
    if scale is None:
        scale = (x.shape[-1] // heads) ** -0.5
    if impl == "jnp":
        return attn_block_reference(x, key_mask, wq, bq, wk, bk, wv, bv, wo,
                                    bo, heads, scale)
    if key_mask is None:
        key_mask = jnp.ones(x.shape[:2], jnp.int32)
    mask = key_mask.astype(jnp.int32)[:, None, :]
    return _attn_block(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, heads, scale,
                       impl == "fused_interpret")
