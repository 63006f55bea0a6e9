"""Learnability: the full pipeline+model+step stack must fit a separable toy
task (text tokens correlated with the label) — catches sign errors, dead
gradients, label/pred misalignment that shape tests can't."""

import numpy as np
import pandas as pd
import pytest
import jax

from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
from socialmedia_textimage_classification_auxlosses_tpu.data.pipeline import (
    PipelineConfig, SplitPipeline,
)
from socialmedia_textimage_classification_auxlosses_tpu.data.prep import prepare_data
from socialmedia_textimage_classification_auxlosses_tpu.data.tokenizers import (
    build_tokenizer,
)
from socialmedia_textimage_classification_auxlosses_tpu.models.text import (
    build_text_classifier,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.loop import Trainer
from socialmedia_textimage_classification_auxlosses_tpu.train.optim import make_optimizer
from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
    LossConfig, make_eval_step, make_train_step,
)


def test_text_classifier_learns_separable_task(rng):
    n, num_labels = 96, 2
    words = {0: "awful terrible sad", 1: "great wonderful happy"}
    labels = rng.randint(0, 2, n)
    df = pd.DataFrame({
        "tweet_id": np.arange(n),
        "text": [f"this day was {words[l]} indeed" for l in labels],
        "label": labels,
        "split": ["train"] * 80 + ["val"] * 8 + ["test"] * 8,
    })
    train, val, test, weights = prepare_data(df, num_labels, rng=rng)

    model = build_text_classifier("bert", num_labels, None, dropout=0.0,
                                  dtype="float32", attn_impl="jnp",
                                  hidden=64, layers=2, heads=2, mlp_dim=128)
    tokenizer = build_tokenizer("bert", None, max_length=16, vocab_size=2000)
    pipe_cfg = PipelineConfig(batch_size=16, max_length=16, with_images=False)
    pipes = {k: SplitPipeline(s, pipe_cfg, tokenizer=tokenizer)
             for k, s in (("train", train), ("val", val), ("test", test))}

    import jax.numpy as jnp
    ids0 = jnp.zeros((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0, ids0, ids0)

    def forward_fn(p, batch, tim_inputs, dropout_rng, deterministic):
        rngs = None if deterministic else {"dropout": dropout_rng}
        logits = model.apply(p, batch["ids"], batch["mask"],
                             batch.get("token_type_ids"),
                             deterministic=deterministic, rngs=rngs)
        return {"out_cls": logits}

    cfg = LossConfig(num_labels=num_labels)
    tx = make_optimizer(5e-4, 0.0)
    trainer = Trainer(
        make_train_step(forward_fn, cfg, tx, class_weights=jnp.asarray(weights)),
        make_eval_step(forward_fn, cfg, class_weights=jnp.asarray(weights)),
        params, tx.init(params), seed=0, num_labels=num_labels,
        metric_names=C.metric_names, log_every=100,
    )
    trainer.fit(pipes["train"], pipes["val"], epochs=6)
    res = trainer.evaluate(pipes["test"])
    acc = float(np.mean(res["predictions"] == res["labels"]))
    assert acc >= 0.9, f"model failed to learn a separable task: acc={acc}"
