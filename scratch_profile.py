"""Scratch: decompose flagship step time on the real TPU (round-2 item 2)."""
import time

import jax
import jax.numpy as jnp
import optax

import __graft_entry__ as G
from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
    make_optimizer, vision_frozen_predicate,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
    LossConfig, make_train_step_fn,
)

BATCH, SEQ, IMG, NL = 8, 128, 224, 4

model, params, batch = G._flagship(arch="base", dtype="bfloat16",
                                   attn_impl="auto", batch=BATCH,
                                   seq_len=SEQ, image_size=IMG, num_labels=NL)
print("init done", flush=True)


def forward_fn(p, b, tim_inputs, dropout_rng, deterministic):
    rngs = None if deterministic else {"dropout": dropout_rng}
    return model.apply(
        p, b["ids"], b["mask"], b["pixel_values"],
        tim_ids=None if tim_inputs is None else tim_inputs["ids"],
        tim_mask=None if tim_inputs is None else tim_inputs["mask"],
        deterministic=deterministic, rngs=rngs,
    )

loss_cfg = LossConfig(num_labels=NL, use_clip_loss=True, use_tim_loss=True,
                      beta_itc=0.1, beta_itm=0.1)
cw = jnp.ones(NL)


def timeit(name, step, *args, steps=20):
    out = step(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(steps):
        out = step(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / steps
    print(f"{name}: {dt*1e3:.2f} ms/step -> {BATCH/dt:.1f} posts/s", flush=True)
    return dt


key = jax.random.PRNGKey(0)

# 1. full current step
tx = make_optimizer(1e-5, 2.5e-4, vision_frozen_predicate)
opt_state = tx.init(params)
step = jax.jit(make_train_step_fn(forward_fn, loss_cfg, tx, cw))
timeit("full step (fp32 moments)", step, params, opt_state, batch, key)

# 2. grads only (no optimizer)
def grads_only(p, b, rng):
    rng_d, rng_i = jax.random.split(rng)
    from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
        _maybe_tim, assemble_loss,
    )
    tim_inputs, tim_labels = _maybe_tim(loss_cfg, rng_i, b)
    def loss_fn(pp):
        out = forward_fn(pp, b, tim_inputs, rng_d, False)
        total, parts = assemble_loss(loss_cfg, out, b, tim_labels, cw)
        return total
    return jax.grad(loss_fn)(p)

gstep = jax.jit(grads_only)
timeit("fwd+bwd only", gstep, params, batch, key)

# 3. freeze embedding too (bounds the lazy-embedding gain)
def frozen_plus_emb(path, x):
    if vision_frozen_predicate(path, x):
        return True
    keys = [str(getattr(p, "key", p)) for p in path]
    return "word" in keys and keys[-1] == "embedding"

tx3 = make_optimizer(1e-5, 2.5e-4, frozen_plus_emb)
opt3 = tx3.init(params)
step3 = jax.jit(make_train_step_fn(forward_fn, loss_cfg, tx3, cw))
timeit("step, word-embedding excluded from AdamW", step3, params, opt3, batch, key)

# 4. bf16 moments for everything
adamw_bf16 = optax.chain(
    optax.scale_by_adam(mu_dtype=jnp.bfloat16),
    optax.add_decayed_weights(2.5e-4),
    optax.scale(-1e-5),
)
def label_fn(p):
    return jax.tree_util.tree_map_with_path(
        lambda path, x: "frozen" if vision_frozen_predicate(path, x) else "train", p)
tx4 = optax.multi_transform({"train": adamw_bf16, "frozen": optax.set_to_zero()}, label_fn)
opt4 = tx4.init(params)
step4 = jax.jit(make_train_step_fn(forward_fn, loss_cfg, tx4, cw))
timeit("step, bf16 mu (nu still fp32)", step4, params, opt4, batch, key)
