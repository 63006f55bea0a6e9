"""Bucket-GROUPED chunked dispatch (``--bucket_group``): regroup a shuffled
epoch's batches by bucket width so every (K, B, ...) scan chunk is pure-width
and slices to the per-batch bucket. Chunk-level bucketing (the default)
slices to the CHUNK max, which at realistic tweet-length mixes is ~always
the full pad — one long tweet in K batches defeats it (VERDICT.md round-4
item 1). Composition and per-batch contents are unchanged; only the batch
visit order within an epoch deviates (MIGRATION.md)."""

import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.data.pipeline import (
    PipelineConfig, SplitPipeline,
)
from socialmedia_textimage_classification_auxlosses_tpu.data.prep import SplitArrays
from socialmedia_textimage_classification_auxlosses_tpu.data.tokenizers import (
    build_tokenizer,
)


def _split(n=40, num_labels=3, rng=None):
    rng = rng or np.random.RandomState(0)
    texts = []
    for i in range(n):
        # bimodal realistic mix: mostly short, a few long
        words = 2 + (i % 4) if i % 8 else 20 + (i % 5)
        texts.append(" ".join(f"w{i}x{j}" for j in range(words)))
    labels = np.eye(num_labels, dtype=np.float32)[rng.randint(0, num_labels, n)]
    return SplitArrays(
        ids=np.asarray([str(i + 1) for i in range(n)]),
        ids_num=np.arange(1, n + 1).astype(np.int64),
        text=np.asarray(texts, object),
        labels=labels,
    )


def _pipe(bucket_group, seq_buckets=(8, 16), max_length=32, batch_size=4):
    tok = build_tokenizer("bert", None, max_length=max_length, vocab_size=512)
    cfg = PipelineConfig(batch_size=batch_size, max_length=max_length,
                         with_images=False, seq_buckets=seq_buckets,
                         bucket_group=bucket_group)
    return SplitPipeline(_split(), cfg, tokenizer=tok)


def _collect(pipe, K, shuffle=True, seed=7):
    rng = np.random.RandomState(seed)
    return list(pipe.device_iter_chunks(K, shuffle=shuffle, rng=rng))


def test_grouped_chunks_are_pure_width_and_sliced():
    chunks = _collect(_pipe(True), K=3)
    widths = [np.asarray(b["ids"]).shape[-1] for b, _ in chunks]
    assert set(widths) <= {8, 16, 32}
    assert len(set(widths)) >= 2, "mixed-length data must produce >1 width"
    for batches, k_real in chunks:
        mask = np.asarray(batches["mask"])
        w = mask.shape[-1]
        # per-chunk width covers the chunk's real tokens: nothing dropped,
        # and the width is the smallest bucket for the chunk (pure groups)
        lens = mask.sum(axis=-1).max()
        assert lens <= w
        sv = np.asarray(batches["step_valid"])
        assert sv[:k_real].all() and not sv[k_real:].any()


def test_grouped_epoch_composition_unchanged():
    """Every example appears exactly once, and each grouped batch is a
    batch (same row set) from the ungrouped shuffled epoch."""
    plain = _collect(_pipe(False), K=3)
    grouped = _collect(_pipe(True), K=3)

    def batch_id_sets(chunks):
        out = []
        for batches, k_real in chunks:
            ids = np.asarray(batches["data_id"])[:k_real]
            valid = np.asarray(batches["valid"])[:k_real]
            for row_ids, row_valid in zip(ids, valid):
                out.append(frozenset(row_ids[row_valid > 0].tolist()))
        return out

    pb, gb = batch_id_sets(plain), batch_id_sets(grouped)
    assert sorted(map(sorted, pb)) == sorted(map(sorted, gb))
    seen = [i for s in gb for i in s]
    assert sorted(seen) == sorted(set(seen))  # once per epoch
    assert len(seen) == 40


def test_grouped_tail_batch_composition_unchanged():
    """n % batch_size != 0 regression (round-5 review): the partial tail
    batch must stay LAST in the grouped order. The order is re-cut at
    batch_size boundaries downstream, so a mid-sequence short group would
    shift every later cut and recompose batches across group boundaries —
    before the fix, 9/30 shuffle seeds produced batches that existed in
    neither the plain nor the intended regrouped epoch."""
    tok = build_tokenizer("bert", None, max_length=32, vocab_size=512)

    def pipe(bg):
        cfg = PipelineConfig(batch_size=4, max_length=32, with_images=False,
                             seq_buckets=(8, 16), bucket_group=bg)
        return SplitPipeline(_split(n=10), cfg, tokenizer=tok)

    p_plain, p_grp = pipe(False), pipe(True)

    def batch_sets(p, seed):
        out = []
        for batches, k_real in p.device_iter_chunks(
                3, shuffle=True, rng=np.random.RandomState(seed)):
            ids = np.asarray(batches["data_id"])[:k_real]
            valid = np.asarray(batches["valid"])[:k_real]
            for r, v in zip(ids, valid):
                out.append(frozenset(r[v > 0].tolist()))
        return out

    for seed in range(30):
        pb, gb = batch_sets(p_plain, seed), batch_sets(p_grp, seed)
        assert sorted(map(sorted, pb)) == sorted(map(sorted, gb)), seed
        assert len(gb[-1]) == 10 % 4  # the tail batch stays last


def test_grouped_step_counts_match():
    plain = _collect(_pipe(False), K=4)
    grouped = _collect(_pipe(True), K=4)
    assert sum(k for _, k in plain) == sum(k for _, k in grouped) == 10


def test_group_only_when_shuffled():
    """Eval (shuffle=False) keeps sequential order: artifact row order is
    part of the reference CSV contract."""
    pipe = _pipe(True)
    seq_ids = []
    for batches, k_real in pipe.device_iter_chunks(3, shuffle=False):
        ids = np.asarray(batches["data_id"])[:k_real]
        valid = np.asarray(batches["valid"])[:k_real]
        seq_ids += [i for r, v in zip(ids, valid) for i in r[v > 0].tolist()]
    assert seq_ids == list(range(1, 41))


def test_grouped_trains_with_scan_dispatch():
    """The grouped stream feeds make_train_many across its (several) chunk
    widths; loss stays finite and steps advance."""
    import jax
    import jax.numpy as jnp

    from socialmedia_textimage_classification_auxlosses_tpu.models.text import (
        build_text_classifier,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
        make_optimizer,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
        LossConfig, make_train_many,
    )

    model = build_text_classifier("bert", 3, None, dropout=0.0,
                                  dtype="float32", attn_impl="jnp",
                                  vocab_size=512, hidden=32, layers=1,
                                  heads=2, mlp_dim=64)
    pipe = _pipe(True)
    b0 = next(iter(pipe.batches()))
    params = model.init(jax.random.PRNGKey(0), b0["ids"], b0["mask"],
                        b0.get("token_type_ids"), deterministic=True)

    def fwd(p, batch, tim_inputs, dropout_rng, deterministic):
        logits = model.apply(p, batch["ids"], batch["mask"],
                             batch.get("token_type_ids"), deterministic=True)
        return {"out_cls": logits}

    tx = make_optimizer(1e-3, 0.0)
    opt_state = tx.init(params)
    many = make_train_many(fwd, LossConfig(num_labels=3), tx)
    key = jax.random.PRNGKey(0)
    step = 0
    for batches, k_real in _collect(_pipe(True), K=3):
        dev = {k: v for k, v in batches.items() if k != "data_id"}
        params, opt_state, metrics = many(params, opt_state, dev, key, step)
        step += k_real
        assert np.isfinite(np.asarray(metrics["loss"])[:k_real]).all()
    assert step == 10
