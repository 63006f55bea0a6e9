"""Scanned multi-step dispatch (train.steps.make_train_many): bit-identical
trajectory to the per-step loop, padded-tail skipping, and the chunked
pipeline iterator."""

import jax
import jax.numpy as jnp
import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import EncoderConfig
from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
    MMLateModel, init_mm_late_params,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
    make_optimizer, vision_frozen_predicate,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
    LossConfig, make_eval_many, make_train_many, make_train_step,
)

TINY_TEXT = EncoderConfig(vocab_size=50, hidden=16, layers=1, heads=2, mlp_dim=32,
                          max_positions=16, type_vocab=0, dropout=0.0)
TINY_VISION = EncoderConfig(vocab_size=1, hidden=16, layers=1, heads=2, mlp_dim=32,
                            max_positions=1, type_vocab=0, ln_style="pre",
                            dropout=0.0)


def _setup(rng, batch=4, num_steps=5):
    model = MMLateModel(TINY_TEXT, TINY_VISION, num_labels=3,
                        fusion_name="attention", dropout=0.0,
                        patch=8, image_size=16)
    ids = jnp.array(rng.randint(0, 50, (num_steps, batch, 12)))
    mask = jnp.ones((num_steps, batch, 12), jnp.int32)
    pixels = jnp.array(rng.randn(num_steps, batch, 3, 16, 16), jnp.float32)
    labels = jnp.eye(3, dtype=jnp.float32)[rng.randint(0, 3, (num_steps, batch))]
    params = init_mm_late_params(model, jax.random.PRNGKey(0),
                                 ids[0], mask[0], pixels[0])
    stacked = {"ids": ids, "mask": mask, "pixel_values": pixels,
               "labels": labels,
               "valid": jnp.ones((num_steps, batch), jnp.float32)}

    def forward(params, b, tim_inputs, dropout_rng, deterministic):
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        return model.apply(
            params, b["ids"], b["mask"], b["pixel_values"],
            tim_ids=None if tim_inputs is None else tim_inputs["ids"],
            tim_mask=None if tim_inputs is None else tim_inputs["mask"],
            deterministic=deterministic, rngs=rngs,
        )

    cfg = LossConfig(num_labels=3, use_clip_loss=True, use_tim_loss=True,
                     beta_itc=0.1, beta_itm=0.1)
    tx = make_optimizer(1e-3, 2.5e-4, vision_frozen_predicate)
    return model, params, stacked, forward, cfg, tx


def _loop_trajectory(params, tx, stacked, forward, cfg, root_key, step0=0):
    step = make_train_step(forward, cfg, tx, class_weights=jnp.ones(3),
                           donate=False)
    opt_state = tx.init(params)
    k = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    losses = []
    for i in range(k):
        b = {name: v[i] for name, v in stacked.items()}
        key = jax.random.fold_in(root_key, step0 + i)
        params, opt_state, m = step(params, opt_state, b, key)
        losses.append(float(m["loss"]))
    return params, losses


def test_scanned_equals_loop(rng):
    _, params, stacked, forward, cfg, tx = _setup(rng)
    root_key = jax.random.PRNGKey(7)

    p_loop, losses_loop = _loop_trajectory(params, tx, stacked, forward, cfg,
                                           root_key, step0=3)

    many = make_train_many(forward, cfg, tx, class_weights=jnp.ones(3),
                           donate=False)
    p_scan, _, metrics = many(params, tx.init(params), stacked, root_key, 3)

    np.testing.assert_allclose(np.asarray(metrics["loss"]), losses_loop,
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_loop),
                    jax.tree_util.tree_leaves(p_scan)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scanned_skips_padded_tail(rng):
    _, params, stacked, forward, cfg, tx = _setup(rng, num_steps=5)
    root_key = jax.random.PRNGKey(9)

    # loop over only the 3 real steps
    real = {k: v[:3] for k, v in stacked.items()}
    p_loop, losses_loop = _loop_trajectory(params, tx, real, forward, cfg,
                                           root_key)

    # scan over 5 with the last 2 marked invalid: params/opt must pass through
    padded = dict(stacked)
    padded["step_valid"] = jnp.array([1, 1, 1, 0, 0], jnp.float32)
    many = make_train_many(forward, cfg, tx, class_weights=jnp.ones(3),
                           donate=False)
    p_scan, _, metrics = many(params, tx.init(params), padded, root_key, 0)

    np.testing.assert_allclose(np.asarray(metrics["loss"])[:3], losses_loop,
                               rtol=1e-6)
    assert np.all(np.asarray(metrics["loss"])[3:] == 0.0)
    for a, b in zip(jax.tree_util.tree_leaves(p_loop),
                    jax.tree_util.tree_leaves(p_scan)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_id_survives_device_iter(rng):
    """Real tweet ids (~1e18, int64) must NOT ride through device_put —
    x64-disabled JAX silently truncates them to int32 (corrupting
    prediction CSVs). data_id stays a host numpy array."""
    from socialmedia_textimage_classification_auxlosses_tpu.data.pipeline import (
        PipelineConfig, SplitPipeline,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.data.prep import SplitArrays

    big = np.array([1_400_000_000_000_000_001 + i for i in range(4)], np.int64)
    split = SplitArrays(
        ids=np.array([str(i) for i in big]),
        ids_num=big,
        text=np.array(["a", "b", "c", "d"]),
        labels=np.eye(2, dtype=np.float32)[[0, 1, 0, 1]],
    )

    class Tok:
        def __call__(self, texts):
            return {"ids": np.ones((len(texts), 4), np.int32),
                    "mask": np.ones((len(texts), 4), np.int32)}

    pipe = SplitPipeline(split, PipelineConfig(batch_size=4, with_images=False),
                         tokenizer=Tok())
    (batch,) = list(pipe.device_iter(shuffle=False))
    assert batch["data_id"].dtype == np.int64
    np.testing.assert_array_equal(np.asarray(batch["data_id"]), big)
    ((chunk, _k),) = list(pipe.device_iter_chunks(1, shuffle=False))
    assert chunk["data_id"].dtype == np.int64
    np.testing.assert_array_equal(np.asarray(chunk["data_id"][0]), big)


def test_device_iter_chunks_contents(rng):
    """Chunked iterator reproduces the per-batch iterator's contents and pads
    the tail with step_valid=0."""
    from socialmedia_textimage_classification_auxlosses_tpu.data.pipeline import (
        PipelineConfig, SplitPipeline,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.data.prep import SplitArrays

    n = 10
    split = SplitArrays(
        ids=np.array([f"id{i}" for i in range(n)]),
        ids_num=np.arange(n),
        text=np.array([f"tweet {i}" for i in range(n)]),
        labels=np.eye(2, dtype=np.float32)[np.arange(n) % 2],
    )

    class Tok:
        def __call__(self, texts):
            ids = np.arange(len(texts) * 4).reshape(len(texts), 4) % 7
            return {"ids": ids.astype(np.int32),
                    "mask": np.ones((len(texts), 4), np.int32)}

    pipe = SplitPipeline(split, PipelineConfig(batch_size=4, with_images=False),
                         tokenizer=Tok())
    flat = list(pipe.batches(shuffle=False))
    chunks = list(pipe.device_iter_chunks(2, shuffle=False))
    # 10 rows -> 3 batches -> chunks of 2: [2 real], [1 real + 1 pad]
    assert [k for _, k in chunks] == [2, 1]
    first, _ = chunks[0]
    np.testing.assert_array_equal(np.asarray(first["ids"][0]), flat[0]["ids"])
    np.testing.assert_array_equal(np.asarray(first["ids"][1]), flat[1]["ids"])
    tail, k = chunks[1]
    assert np.asarray(tail["step_valid"]).tolist() == [1.0, 0.0]
    np.testing.assert_array_equal(np.asarray(tail["ids"][0]), flat[2]["ids"])


def test_trainer_chunked_equals_per_step(rng, tmp_path):
    """Full Trainer.fit through the chunked dispatch matches the per-step
    path bit for bit (same shuffles, same RNG folds)."""
    from socialmedia_textimage_classification_auxlosses_tpu.data.pipeline import (
        PipelineConfig, SplitPipeline,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.data.prep import SplitArrays
    from socialmedia_textimage_classification_auxlosses_tpu.train.loop import Trainer
    from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
        make_eval_step,
    )

    model = MMLateModel(TINY_TEXT, TINY_VISION, num_labels=2,
                        fusion_name="concat", dropout=0.0, patch=8,
                        image_size=16)
    n = 10

    class Tok:
        def __call__(self, texts):
            r = np.random.RandomState(5)
            ids = r.randint(0, 50, (len(texts), 8))
            return {"ids": ids.astype(np.int32),
                    "mask": np.ones((len(texts), 8), np.int32)}

    class Imgs:
        def gather(self, ids):
            out = np.zeros((len(ids), 16, 16, 3), np.uint8)
            for i, d in enumerate(ids):
                out[i] = (int(str(d)[2:]) * 11) % 255
            return out

    split = SplitArrays(
        ids=np.array([f"id{i}" for i in range(n)]),
        ids_num=np.arange(n),
        text=np.array([f"tweet {i}" for i in range(n)]),
        labels=np.eye(2, dtype=np.float32)[np.arange(n) % 2],
    )
    pcfg = PipelineConfig(batch_size=4, image_size=16)

    def build_trainer(steps_per_dispatch):
        pipe = SplitPipeline(split, pcfg, tokenizer=Tok(), image_source=Imgs())

        def forward(params, b, tim_inputs, dropout_rng, deterministic):
            rngs = ({"dropout": dropout_rng} if dropout_rng is not None
                    else None)
            px = b["pixel_values"].astype(jnp.float32) / 255.0
            if px.shape[-1] == 3:
                px = px.transpose(0, 3, 1, 2)
            return model.apply(params, b["ids"], b["mask"], px,
                               deterministic=deterministic, rngs=rngs)

        cfg = LossConfig(num_labels=2)
        tx = make_optimizer(1e-3, 2.5e-4, vision_frozen_predicate)
        ids0 = jnp.zeros((4, 8), jnp.int32)
        px0 = jnp.zeros((4, 3, 16, 16), jnp.float32)
        params = init_mm_late_params(model, jax.random.PRNGKey(0), ids0,
                                     jnp.ones((4, 8), jnp.int32), px0)
        trainer = Trainer(
            make_train_step(forward, cfg, tx, class_weights=jnp.ones(2),
                            donate=False),
            make_eval_step(forward, cfg, class_weights=jnp.ones(2)),
            params, tx.init(params), seed=11,
            num_labels=2, metric_names=["f1_weighted"],
            train_many=make_train_many(forward, cfg, tx,
                                       class_weights=jnp.ones(2),
                                       donate=False),
            eval_many=make_eval_many(forward, cfg, class_weights=jnp.ones(2)),
            steps_per_dispatch=steps_per_dispatch,
        )
        return trainer, pipe

    t1, pipe1 = build_trainer(1)
    t1.fit(pipe1, pipe1, epochs=2)
    t2, pipe2 = build_trainer(2)
    t2.fit(pipe2, pipe2, epochs=2)

    assert t1.global_step == t2.global_step == 6
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # chunked eval (t2 path) must reproduce per-batch eval exactly
    res1 = t1.evaluate(pipe1)
    res2 = t2.evaluate(pipe2)
    assert abs(res1["loss"] - res2["loss"]) < 1e-6
    np.testing.assert_array_equal(res1["predictions"], res2["predictions"])
    np.testing.assert_array_equal(res1["data_id"], res2["data_id"])
    np.testing.assert_array_equal(res1["cm"], res2["cm"])
