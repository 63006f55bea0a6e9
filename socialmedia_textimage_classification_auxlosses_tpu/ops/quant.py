"""Weight-only int8 quantization (w8a16) for the serving path.

The eval/serving step at small batch is weight-HBM-bound (BASELINE.md
roofline: the fp32 master weights stream per forward). Symmetric
per-output-channel int8 storage halves that traffic vs bf16 (4x vs fp32)
while compute stays bf16 on the MXU: inside the jitted step the kernels
dequantize as ``q.astype(bf16) * scale``, which XLA fuses into the consuming
matmul — the int8 tensor is what streams from HBM.

Training is untouched (quantized inference only — the reference has no
quantization story at all; this is a TPU-serving addition). Error bound:
symmetric round-to-nearest gives |w - dq(w)| <= scale/2 = max|w_col|/254
per element, test-enforced along with end-to-end logit closeness
(tests/test_quant.py).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedTree(NamedTuple):
    """Pytree of params with Dense kernels stored int8.

    ``q``: same structure as the original params; quantized leaves are int8,
    everything else unchanged. ``scales``: same structure; per-output-channel
    f32 scales for quantized leaves, scalar 0.0 placeholders elsewhere.
    ``mask`` is NOT carried here (pytree leaves must be arrays) — dequant
    keys off the leaf dtype instead: exactly the int8 leaves dequantize.
    """

    q: Any
    scales: Any


def _is_quantizable(path, leaf, min_elems: int) -> bool:
    keys = [str(getattr(p, "key", p)) for p in path]
    return (keys and keys[-1] == "kernel" and leaf.ndim == 2
            and leaf.size >= min_elems
            and jnp.issubdtype(leaf.dtype, jnp.floating))


def quantize_w8(params, min_elems: int = 1 << 14) -> QuantizedTree:
    """Symmetric per-output-channel int8 quantization of every 2-D Dense
    ``kernel`` leaf with at least ``min_elems`` elements (tiny heads stay
    full precision — no traffic to win there, and the cls head's accuracy
    matters most)."""

    def one(path, leaf):
        if not _is_quantizable(path, leaf, min_elems):
            return leaf, jnp.zeros((), jnp.float32)
        w = np.asarray(leaf, np.float32)
        scale = np.abs(w).max(axis=0, keepdims=True) / 127.0  # (1, out)
        scale = np.where(scale == 0.0, 1.0, scale)
        q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(scale, jnp.float32)

    flat = jax.tree_util.tree_flatten_with_path(params)
    pairs = [one(path, leaf) for path, leaf in flat[0]]
    q = jax.tree_util.tree_unflatten(flat[1], [p[0] for p in pairs])
    scales = jax.tree_util.tree_unflatten(flat[1], [p[1] for p in pairs])
    return QuantizedTree(q=q, scales=scales)


def dequantize(qt: QuantizedTree, dtype=jnp.bfloat16):
    """int8 leaves -> ``q.astype(dtype) * scale`` (XLA fuses the convert and
    multiply into the consuming matmul, so HBM streams the int8 bytes);
    other leaves pass through. Call INSIDE the jitted eval step."""

    def one(q, s):
        if q.dtype == jnp.int8:
            return (q.astype(dtype) * s.astype(dtype)).astype(dtype)
        return q

    return jax.tree_util.tree_map(one, qt.q, qt.scales)


def quantized_bytes(qt: QuantizedTree) -> tuple:
    """(quantized_bytes, original_bytes_f32) over the int8 leaves — the
    weight-streaming saving the serving step buys."""
    qb = ob = 0
    for leaf in jax.tree_util.tree_leaves(qt.q):
        if leaf.dtype == jnp.int8:
            qb += leaf.size
            ob += leaf.size * 4
    return qb, ob


def make_quantized_eval_forward(forward_fn, dtype=jnp.bfloat16):
    """Wrap a trainer ``forward_fn(params, batch, tim, rng, det)`` so it
    accepts a QuantizedTree: dequantization happens inside the compiled
    step. Use with train/steps.make_eval_step / make_eval_many."""

    def fwd(qt, batch, tim_inputs, dropout_rng, deterministic):
        return forward_fn(dequantize(qt, dtype), batch, tim_inputs,
                          dropout_rng, deterministic)

    return fwd
