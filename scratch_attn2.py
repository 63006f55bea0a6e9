"""De-noise the L=197 (image tokens) column and the big-shape cells."""
import time
import jax, jax.numpy as jnp, numpy as np
from socialmedia_textimage_classification_auxlosses_tpu.ops.attention import (
    sdpa_reference, _sdpa_pallas,
)
H, D = 12, 64

def bench(fn, args, iters=100):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

def run(b, lq, lk):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, H, lq, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, H, lk, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, H, lk, D), jnp.bfloat16)
    mask = jnp.ones((b, lk), jnp.int32)
    scale = D ** -0.5
    gx = jax.jit(jax.grad(lambda q,k,v: jnp.sum(sdpa_reference(q,k,v,mask,scale).astype(jnp.float32)), argnums=(0,1,2)))
    gp = jax.jit(jax.grad(lambda q,k,v: jnp.sum(_sdpa_pallas(q,k,v,mask,scale,False).astype(jnp.float32)), argnums=(0,1,2)))
    tx = bench(gx, (q,k,v)); tp = bench(gp, (q,k,v))
    print(f"b={b:4d} lq={lq:4d} lk={lk:4d}: xla {tx:7.3f}  pallas {tp:7.3f}  -> {'PALLAS' if tp<tx else 'xla'}", flush=True)

for b in (16, 32, 48, 64, 96, 128):
    run(b, 197, 197)
for b in (32, 64, 128):
    run(b, 256, 256)
