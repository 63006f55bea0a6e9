"""Microbenchmark: fused attention block vs unfused XLA vs SDPA-only Pallas
(fwd+bwd) at training shapes. Run manually on the TPU:

    python tests/perf_attn_block.py [--shapes b,l ...]

Not collected by pytest (no test_ prefix); results recorded in BASELINE.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.ops.attn_block import (
    attn_block,
)

H, HEADS = 768, 12


def bench_one(b, l, impl, iters=100, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, l, H) * 0.1, dtype)
    mask = jnp.ones((b, l), jnp.int32)
    ws = [jnp.asarray(rng.randn(H, H) / 28.0, dtype) if i % 2 == 0
          else jnp.asarray(rng.randn(H) * 0.01, dtype) for i in range(8)]
    cot = jnp.asarray(rng.randn(b, l, H) * 0.1, dtype)

    if impl == "sdpa_pallas":
        from socialmedia_textimage_classification_auxlosses_tpu.ops.attention import sdpa

        def f(x, ws):
            wq, bq, wk, bk, wv, bv, wo, bo = ws

            def split(y):
                return y.reshape(b, l, HEADS, H // HEADS).transpose(0, 2, 1, 3)

            q = split(jnp.dot(x, wq) + bq)
            k = split(jnp.dot(x, wk) + bk)
            v = split(jnp.dot(x, wv) + bv)
            ctx = sdpa(q, k, v, key_mask=mask, impl="pallas")
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, H)
            return jnp.sum((jnp.dot(ctx, wo) + bo) * cot)
    elif impl == "xla":
        def f(x, ws):
            wq, bq, wk, bk, wv, bv, wo, bo = ws

            def split(y):
                return y.reshape(b, l, HEADS, H // HEADS).transpose(0, 2, 1, 3)

            q = split(jnp.dot(x, wq) + bq)
            k = split(jnp.dot(x, wk) + bk)
            v = split(jnp.dot(x, wv) + bv)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (H // HEADS) ** -0.5
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, H)
            return jnp.sum((jnp.dot(ctx, wo) + bo) * cot)
    else:  # fused
        def f(x, ws):
            out = attn_block(x, mask, *ws, heads=HEADS, impl="fused")
            return jnp.sum(out * cot)

    g = jax.jit(jax.grad(f, argnums=(0, 1)))
    out = g(x, ws)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(x, ws)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def bench_cross(b, lq, lk, impl, iters=100, dtype=jnp.bfloat16):
    """Cross-attention SDPA (fwd+bwd) at lq != lk — LXMERT's cross-modal
    blocks attend 128 text queries over 36 ROI keys (reference
    mm_early.py:121-129); ViLT's joint sequence is ~184."""
    from socialmedia_textimage_classification_auxlosses_tpu.ops.attention import sdpa

    rng = np.random.RandomState(0)
    d = H // HEADS
    q = jnp.asarray(rng.randn(b, HEADS, lq, d) * 0.1, dtype)
    k = jnp.asarray(rng.randn(b, HEADS, lk, d) * 0.1, dtype)
    v = jnp.asarray(rng.randn(b, HEADS, lk, d) * 0.1, dtype)
    mask = jnp.ones((b, lk), jnp.int32)
    cot = jnp.asarray(rng.randn(b, HEADS, lq, d) * 0.1, dtype)

    def f(q, k, v):
        return jnp.sum(sdpa(q, k, v, key_mask=mask, impl=impl) * cot)

    g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))
    out = g(q, k, v)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(q, k, v)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="*", default=["8,128", "16,128",
                                                    "16,197", "32,128",
                                                    "64,197", "96,197"])
    ap.add_argument("--cross", nargs="*", default=None, metavar="B,LQ,LK",
                    help="cross-attention shapes (xla vs pallas SDPA), e.g. "
                         "8,128,36 for LXMERT, 16,184,184 for ViLT joint")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()
    if args.cross:
        print(f"{'b':>4} {'lq':>4} {'lk':>4} {'xla':>8} {'pallas':>8} {'auto':>8}")
        for spec in args.cross:
            b, lq, lk = (int(v) for v in spec.split(","))
            row = [bench_cross(b, lq, lk, impl, iters=args.iters)
                   for impl in ("jnp", "pallas", "auto")]
            print(f"{b:>4} {lq:>4} {lk:>4} {row[0]:>8.3f} {row[1]:>8.3f} "
                  f"{row[2]:>8.3f}")
        return
    print(f"{'b':>4} {'l':>4} {'xla':>8} {'sdpa_pallas':>12} {'fused':>8}")
    for spec in args.shapes:
        b, l = (int(v) for v in spec.split(","))
        row = [bench_one(b, l, impl, iters=args.iters)
               for impl in ("xla", "sdpa_pallas", "fused")]
        print(f"{b:>4} {l:>4} {row[0]:>8.3f} {row[1]:>12.3f} {row[2]:>8.3f}")


if __name__ == "__main__":
    main()
