"""Scratch: Pallas vs XLA SDPA crossover measurement (fwd+bwd) on the TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.ops.attention import (
    sdpa_reference, _sdpa_pallas,
)

H, D = 12, 64


def bench(fn, args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def run(b, lq, lk, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, H, lq, D), dtype)
    k = jnp.asarray(rng.randn(b, H, lk, D), dtype)
    v = jnp.asarray(rng.randn(b, H, lk, D), dtype)
    mask = jnp.ones((b, lk), jnp.int32)
    scale = D ** -0.5

    def loss_x(q, k, v):
        return jnp.sum(sdpa_reference(q, k, v, mask, scale).astype(jnp.float32))

    def loss_p(q, k, v):
        return jnp.sum(_sdpa_pallas(q, k, v, mask, scale, False).astype(jnp.float32))

    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
    try:
        tx = bench(gx, (q, k, v))
    except Exception as e:
        tx = float("nan")
    try:
        tp = bench(gp, (q, k, v))
    except Exception as e:
        tp = float("nan")
    win = "PALLAS" if tp < tx else "xla"
    print(f"b={b:4d} lq={lq:4d} lk={lk:4d}: xla {tx:7.3f} ms  pallas {tp:7.3f} ms  -> {win}",
          flush=True)


for b in (8, 32, 64, 128):
    for l in (128, 197, 256, 384, 512):
        run(b, l, l)
# cross-attention shapes (fusion head: text queries over image keys)
for b in (8, 64):
    run(b, 128, 197)
