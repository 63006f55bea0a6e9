"""Step-time ablation on the flagship config (run manually on the TPU):

    python tests/perf_step_ablation.py [--steps 10]

Times the scanned 10-step dispatch for several step variants to locate the
remaining distance to the matmul roofline. Results recorded in BASELINE.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(variant, steps, seq_len=128):
    import __graft_entry__ as G
    from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
        MMLateModel,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.train.lazy_emb import (
        LazyEmbConfig, find_word_embedding_path, init_lazy_state,
        lazy_emb_predicate,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
        any_of, make_optimizer, vision_frozen_predicate,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
        LossConfig, make_train_many,
    )

    model, params, batch = G._flagship(batch=8, seq_len=seq_len,
                                       image_size=224, num_labels=4)
    vh, vp = jax.jit(lambda p, px: model.apply(
        p, px, deterministic=True, method=MMLateModel.encode_vision))(
            params, batch["pixel_values"])
    batch = {**batch, "vision_hidden": vh, "vision_pooled": vp}
    del batch["pixel_values"]

    deterministic_force = variant == "no_dropout"
    tim_reuse = variant in ("tim_reuse", "fused_tim")

    def forward_fn(p, b, tim_inputs, dropout_rng, deterministic,
                   word_embeds=None, tim_word_embeds=None):
        det = deterministic or deterministic_force
        rngs = None if det else {"dropout": dropout_rng}
        tim_kw = {}
        if tim_inputs is not None:
            if tim_reuse:
                tim_kw = {"tim_src": tim_inputs["src"]}
            else:
                tim_kw = {"tim_ids": tim_inputs["ids"],
                          "tim_mask": tim_inputs["mask"],
                          "tim_word_embeds": tim_word_embeds}
        return model.apply(
            p, b["ids"], b["mask"], None,
            deterministic=det, rngs=rngs,
            word_embeds=word_embeds,
            vision_hidden=b["vision_hidden"],
            vision_pooled=b["vision_pooled"],
            **tim_kw,
        )

    use_aux = variant not in ("ce_only",)
    loss_cfg = LossConfig(num_labels=4, use_clip_loss=use_aux,
                          use_tim_loss=use_aux and variant != "no_tim",
                          beta_itc=0.1, beta_itm=0.1)
    frozen = vision_frozen_predicate
    lazy_cfg = None
    if variant != "dense_opt":
        lazy_cfg = LazyEmbConfig(path=find_word_embedding_path(params),
                                 lr=1e-5, weight_decay=2.5e-4)
        frozen = any_of(frozen, lazy_emb_predicate(lazy_cfg))
    if variant == "no_opt":
        # zero updates for every non-embedding param: isolates the AdamW
        # read-modify-write traffic (fwd+bwd+lazy-emb rows remain)
        import optax

        tx = optax.set_to_zero()
    else:
        tx = make_optimizer(1e-5, 2.5e-4, frozen,
                            fused=variant in ("fused_opt", "fused_tim"))
    opt_state = tx.init(params)
    if lazy_cfg is not None:
        opt_state = {"tx": opt_state,
                     "lazy_emb": init_lazy_state(params, lazy_cfg)}
    many = make_train_many(forward_fn, loss_cfg, tx,
                           class_weights=jnp.ones(4), lazy_emb_cfg=lazy_cfg)
    if variant == "fwd_only":
        # forward + loss only (no grad, no update): bounds the backward +
        # optimizer share of the step from below
        from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
            _maybe_tim, assemble_loss,
        )

        @jax.jit
        def fwd_many(p, _opt, stacked_batches, key, step0):
            def body(carry, xs):
                b, i = xs
                rng = jax.random.fold_in(key, step0 + i)
                rng_drop, rng_itm = jax.random.split(rng)
                tim_inputs, tim_labels = _maybe_tim(loss_cfg, rng_itm, b)
                outputs = forward_fn(p, b, tim_inputs, rng_drop, False)
                total, _parts = assemble_loss(loss_cfg, outputs, b,
                                              tim_labels, jnp.ones(4))
                return carry, total

            n = stacked_batches["ids"].shape[0]
            _, losses = jax.lax.scan(body, 0,
                                     (stacked_batches, jnp.arange(n)))
            return p, _opt, {"loss": losses[-1]}

        many = fwd_many
    stacked = {k: jnp.stack([v] * steps) for k, v in batch.items()}
    return many, params, opt_state, stacked


def measure(variant, steps=10, reps=5, seq_len=128):
    many, params, opt_state, stacked = build(variant, steps, seq_len=seq_len)
    key = jax.random.PRNGKey(0)
    params, opt_state, m = many(params, opt_state, stacked, key, 0)
    jax.block_until_ready(m["loss"])
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        params, opt_state, m = many(params, opt_state, stacked, key,
                                    (r + 1) * steps)
        jax.block_until_ready(m["loss"])
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--prng_impl", default="rbg",
                    choices=["rbg", "threefry"],
                    help="match the bench/CLI default (rbg)")
    ap.add_argument("--variants", nargs="*", default=[
        "full", "no_opt", "no_tim", "ce_only", "no_dropout", "dense_opt"])
    ap.add_argument("--seq_len", type=int, default=128,
                    help="text width (sequence-bucketing table: 32/64/96/128)")
    args = ap.parse_args()
    jax.config.update("jax_default_prng_impl",
                      {"threefry": "threefry2x32"}.get(args.prng_impl,
                                                       args.prng_impl))
    for v in args.variants:
        ms = measure(v, steps=args.steps, seq_len=args.seq_len)
        print(f"{v:>12} seq{args.seq_len}: {ms:7.2f} ms/step  "
              f"({8 / ms * 1e3:6.1f} posts/s)", flush=True)


if __name__ == "__main__":
    main()
