"""Opt-in perf tool: capture a jax.profiler trace of the flagship train step
and print the top HLO ops by device self-time.

This is the profile-guided view of the step-time decomposition in
BASELINE.md (reference has no profiling at all — SURVEY.md section 5): it
answers "where do the forward's milliseconds actually go" with per-op
numbers from the XLA device trace rather than ablation deltas.

Usage (real chip or CPU backend):

    python tests/perf_profile_step.py [--steps_per_dispatch K] [--top N]
        [--tim_reuse_text] [--phase train|eval] [--group]

Not collected by pytest (perf_ prefix). Writes the raw trace under
/tmp/smtc_profile/ for offline TensorBoard inspection.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def build_step(args):
    import jax
    import jax.numpy as jnp

    import bench as B
    import __graft_entry__ as G
    from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
        MMLateModel,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
        any_of, make_optimizer, vision_frozen_predicate,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
        LossConfig, make_train_many, make_train_step,
    )

    B.enable_compile_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    model, params, batch = G._flagship(arch="base", dtype="bfloat16",
                                       attn_impl="auto", batch=args.batch,
                                       seq_len=128, image_size=224,
                                       num_labels=4)
    # steady-state --cache_vision step (the graded bench default)
    vh, vp = jax.jit(lambda p, px: model.apply(
        p, px, deterministic=True, method=MMLateModel.encode_vision))(
            params, batch["pixel_values"])
    batch = {**batch, "vision_hidden": vh, "vision_pooled": vp}
    del batch["pixel_values"]

    def forward_fn(p, b, tim_inputs, dropout_rng, deterministic,
                   word_embeds=None, tim_word_embeds=None):
        rngs = None if deterministic else {"dropout": dropout_rng}
        tim_kw = {}
        if tim_inputs is not None:
            if args.tim_reuse_text:
                tim_kw = {"tim_src": tim_inputs["src"]}
            else:
                tim_kw = {"tim_ids": tim_inputs["ids"],
                          "tim_mask": tim_inputs["mask"],
                          "tim_word_embeds": tim_word_embeds}
        return model.apply(
            p, b["ids"], b["mask"], b.get("pixel_values"),
            deterministic=deterministic, rngs=rngs, word_embeds=word_embeds,
            vision_hidden=b.get("vision_hidden"),
            vision_pooled=b.get("vision_pooled"), **tim_kw)

    loss_cfg = LossConfig(num_labels=4, use_clip_loss=True,
                          use_tim_loss=True, beta_itc=0.1, beta_itm=0.1)
    from socialmedia_textimage_classification_auxlosses_tpu.train.lazy_emb import (
        LazyEmbConfig, find_word_embedding_path, init_lazy_state,
        lazy_emb_predicate,
    )

    lazy_cfg = LazyEmbConfig(path=find_word_embedding_path(params),
                             lr=1e-5, weight_decay=2.5e-4)
    frozen = any_of(vision_frozen_predicate, lazy_emb_predicate(lazy_cfg))
    tx = make_optimizer(1e-5, 2.5e-4, frozen, fused=True)
    opt_state = {"tx": tx.init(params),
                 "lazy_emb": init_lazy_state(params, lazy_cfg)}
    key = jax.random.PRNGKey(0)

    k = args.steps_per_dispatch
    if args.phase == "eval":
        from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
            make_eval_many,
        )

        ev = make_eval_many(forward_fn, loss_cfg,
                            class_weights=jnp.ones(4))
        stacked = {kk: jnp.stack([v] * k) for kk, v in batch.items()}

        def dispatch(i):
            return ev(params, stacked, key, i * k)

        out = dispatch(0)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return dispatch, k

    many = make_train_many(forward_fn, loss_cfg, tx,
                           class_weights=jnp.ones(4), lazy_emb_cfg=lazy_cfg)
    stacked = {kk: jnp.stack([v] * k) for kk, v in batch.items()}
    state = {"params": params, "opt": opt_state}

    def dispatch(i):
        p, o, m = many(state["params"], state["opt"], stacked, key, i * k)
        state["params"], state["opt"] = p, o
        return m

    m = dispatch(0)
    jax.block_until_ready(m["loss"])
    return dispatch, k


def parse_xplane(trace_dir):
    """Aggregate device-plane op self-times from the xplane proto dumps."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # proto location moved across tf releases
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    per_op = defaultdict(float)
    per_line = defaultdict(float)
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            if "Host" in plane.name:
                continue
            md = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = md[ev.metadata_id].name if ev.metadata_id in md \
                        else str(ev.metadata_id)
                    dur = ev.duration_ps / 1e9  # ms
                    per_line[(plane.name, line.name)] += dur
                    if line.name in ("XLA Ops", "XLA TraceMe",
                                     "Framework Ops", "Steps"):
                        key = (line.name, name)
                        per_op[key] += dur
    return per_op, per_line


CATEGORIES = (
    ("convolution", "conv"),
    ("dot", "matmul"),
    ("all-reduce", "collective"),
    ("all-gather", "collective"),
    ("copy", "copy"),
    ("dynamic-update-slice", "dus"),
    ("dynamic-slice", "ds"),
    ("scatter", "scatter"),
    ("gather", "gather"),
    ("rng", "rng"),
    ("custom-call", "custom-call"),
    ("reduce", "reduce"),
    ("fusion", "fusion(other)"),
)


def categorize(name):
    # HLO event names look like "%loop_convolution_fusion.3 = bf16[...] ..."
    short = name.lstrip("%").split(" = ")[0].lower()
    for frag, cat in CATEGORIES:
        if frag in short:
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps_per_dispatch", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dispatches", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--tim_reuse_text", action="store_true")
    ap.add_argument("--phase", default="train", choices=["train", "eval"])
    ap.add_argument("--trace_dir", default="/tmp/smtc_profile")
    ap.add_argument("--analyze_only", action="store_true",
                    help="skip capture; just parse --trace_dir")
    args = ap.parse_args()
    if args.dispatches < 1:
        ap.error("--dispatches must be >= 1")

    if not args.analyze_only:
        import jax

        dispatch, k = build_step(args)
        os.makedirs(args.trace_dir, exist_ok=True)
        t0 = time.perf_counter()
        with jax.profiler.trace(args.trace_dir):
            for i in range(1, args.dispatches + 1):
                out = dispatch(i)
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        dt = time.perf_counter() - t0
        n = args.dispatches * k
        print(f"# traced {args.dispatches} dispatches x K={k}: "
              f"{dt / n * 1e3:.2f} ms/step, "
              f"{n * args.batch / dt:.1f} posts/s", file=sys.stderr)

    per_op, per_line = parse_xplane(args.trace_dir)
    print("\n== device planes/lines (total ms over the whole trace) ==")
    for (plane, line), ms in sorted(per_line.items(), key=lambda x: -x[1]):
        print(f"  {ms:10.3f} ms  {plane} :: {line}")

    # Per-step normalization. Control-flow ops (the K-step scan) CONTAIN
    # their body ops' time — drop them so the table is a partition.
    denom = args.dispatches * args.steps_per_dispatch
    ops = [(k_, v) for k_, v in per_op.items()
           if k_[0] == "XLA Ops"
           and not k_[1].lstrip("%").startswith(("while", "conditional"))]
    total = sum(v for _, v in ops) or 1.0
    print(f"\n== top {args.top} XLA ops by device self-time "
          f"(total {total:.3f} ms trace, {total / denom:.3f} ms/step; "
          f"control-flow shells excluded) ==")
    for (line, name), ms in sorted(ops, key=lambda x: -x[1])[:args.top]:
        print(f"  {ms / denom:8.4f} ms/step {100 * ms / total:5.1f}%  "
              f"{name[:105]}")

    def root_shape(name):
        short = name.lstrip("%").split(" = ")[0]
        root = short.rstrip("0123456789").rstrip(".")
        rhs = name.split(" = ", 1)
        shape = rhs[1].split(" ", 1)[0][:46] if len(rhs) == 2 else "?"
        return f"{root} -> {shape}"

    grouped = defaultdict(lambda: [0.0, 0])
    for (line, name), ms in ops:
        g = grouped[root_shape(name)]
        g[0] += ms
        g[1] += 1
    print(f"\n== grouped by op-root + output shape (ms/step) ==")
    for key, (ms, n) in sorted(grouped.items(), key=lambda x: -x[1][0])[:args.top]:
        print(f"  {ms / denom:8.4f} ms/step {100 * ms / total:5.1f}%  "
              f"x{n:<4d} {key}")

    by_cat = defaultdict(float)
    for (line, name), ms in ops:
        by_cat[categorize(name)] += ms
    print("\n== by category ==")
    for cat, ms in sorted(by_cat.items(), key=lambda x: -x[1]):
        print(f"  {ms / denom:8.4f} ms/step {100 * ms / total:5.1f}%  {cat}")


if __name__ == "__main__":
    main()
