"""Preemption handling (train/loop.py): SIGTERM while training checkpoints
at the next step boundary, exits cleanly, and --resume continues from it."""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.data.pipeline import (
    PipelineConfig, SplitPipeline,
)
from socialmedia_textimage_classification_auxlosses_tpu.data.prep import SplitArrays
from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import EncoderConfig
from socialmedia_textimage_classification_auxlosses_tpu.models.text import TextClassifier
from socialmedia_textimage_classification_auxlosses_tpu.train.checkpoint import (
    TrainCheckpointer,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.loop import Trainer
from socialmedia_textimage_classification_auxlosses_tpu.train.optim import make_optimizer
from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
    LossConfig, make_eval_step, make_train_step,
)

CFG = EncoderConfig(vocab_size=40, hidden=16, layers=1, heads=2, mlp_dim=32,
                    max_positions=16, type_vocab=0, dropout=0.0)


class Tok:
    def __call__(self, texts):
        r = np.random.RandomState(3)
        return {"ids": r.randint(0, 40, (len(texts), 8)).astype(np.int32),
                "mask": np.ones((len(texts), 8), np.int32)}


def _build(ckpt_dir, resume=False, preempt_after=None):
    model = TextClassifier(CFG, num_labels=2, head_dropout=0.0)
    n = 16
    split = SplitArrays(
        ids=np.array([str(i) for i in range(n)]),
        ids_num=np.arange(n),
        text=np.array([f"t {i}" for i in range(n)]),
        labels=np.eye(2, dtype=np.float32)[np.arange(n) % 2],
    )
    pipe = SplitPipeline(split, PipelineConfig(batch_size=4, with_images=False),
                         tokenizer=Tok())

    def forward(p, b, tim, rng, det):
        return {"out_cls": model.apply(p, b["ids"], b["mask"],
                                       deterministic=True)}

    cfg = LossConfig(num_labels=2)
    tx = make_optimizer(1e-3, 0.0, None)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 8), jnp.int32),
                        jnp.ones((4, 8), jnp.int32))
    ckpt = TrainCheckpointer(str(ckpt_dir), every_steps=100)
    trainer = Trainer(
        make_train_step(forward, cfg, tx, class_weights=jnp.ones(2),
                        donate=False),
        make_eval_step(forward, cfg, class_weights=jnp.ones(2)),
        params, tx.init(params), seed=4, num_labels=2,
        metric_names=["f1_weighted"], checkpointer=ckpt, resume=resume,
    )
    if preempt_after is not None:
        orig = trainer.train_step

        def stepping(*a, **kw):
            out = orig(*a, **kw)
            if trainer.global_step + 1 >= preempt_after:
                # deliver a real SIGTERM to ourselves; the handler installed
                # by fit() must request checkpoint-and-exit
                os.kill(os.getpid(), signal.SIGTERM)
            return out

        trainer.train_step = stepping
    return trainer, pipe


def test_sigterm_checkpoints_and_resumes(tmp_path):
    ckpt_dir = tmp_path / "ckpt"
    t1, pipe1 = _build(ckpt_dir, preempt_after=3)
    t1.fit(pipe1, pipe1, epochs=5)  # would be 20 steps; preempted at 3
    assert t1._preempted
    assert t1.global_step == 3

    # resume continues from the preemption checkpoint
    t2, pipe2 = _build(ckpt_dir, resume=True)
    t2.maybe_resume()
    assert t2.global_step == 3

    # handler restored: SIGTERM outside fit() must use the default again
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL
