"""Multilabel step path + the LXMERT single-image demo."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
    LossConfig, make_eval_step, make_train_step,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.optim import make_optimizer


def test_multilabel_train_and_eval_step(rng):
    """BCE pos-weight objective + rounded-sigmoid predictions
    (reference run_mm_late.py:85 multilabel branch, mm_late.py:500-504)."""
    num_labels = 5

    def forward_fn(params, batch, tim_inputs, dropout_rng, deterministic):
        logits = batch["x"] @ params["w"]
        return {"out_cls": logits}

    w0 = jnp.array(rng.randn(8, num_labels) * 0.1, jnp.float32)
    params = {"w": w0}
    x = jnp.array(rng.randn(16, 8), jnp.float32)
    y = jnp.array(rng.randint(0, 2, (16, num_labels)), jnp.float32)
    batch = {"x": x, "labels": y, "valid": jnp.ones(16)}

    cfg = LossConfig(num_labels=num_labels, multilabel=True)
    tx = make_optimizer(1e-1, 0.0)
    opt_state = tx.init(params)
    step = make_train_step(forward_fn, cfg, tx,
                           class_weights=jnp.ones(num_labels), donate=False)
    losses = []
    for i in range(20):
        params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]  # the objective is learnable

    estep = make_eval_step(forward_fn, cfg, class_weights=jnp.ones(num_labels))
    out = estep(params, batch, jax.random.PRNGKey(0))
    assert out["predictions"].shape == (16, num_labels)
    assert set(np.unique(np.asarray(out["predictions"]))) <= {0, 1}
    assert out["cm"].shape == (num_labels, 4)  # TP/FP/FN/TN per label


def test_demo_lxmert(tmp_path):
    from PIL import Image

    from socialmedia_textimage_classification_auxlosses_tpu.cli import demo_lxmert

    img = tmp_path / "demo.jpg"
    Image.fromarray(np.random.RandomState(0).randint(0, 255, (40, 40, 3),
                                                     np.uint8)).save(img)
    probs = demo_lxmert.main(["--image", str(img), "--text", "hello @user",
                              "--num_labels", "3", "--arch", "tiny"])
    assert probs.shape == (3,)
    assert abs(probs.sum() - 1.0) < 1e-5


def test_demo_lxmert_native_detector(tmp_path):
    """The probe end-to-end through OUR FRCNN (tiny geometry): raw image ->
    detector ROI features -> LXMERT -> prediction."""
    from PIL import Image

    from socialmedia_textimage_classification_auxlosses_tpu.cli import demo_lxmert

    img = tmp_path / "demo.jpg"
    Image.fromarray(np.random.RandomState(1).randint(0, 255, (40, 60, 3),
                                                     np.uint8)).save(img)
    probs = demo_lxmert.main(["--image", str(img), "--text", "hello @user",
                              "--num_labels", "3", "--arch", "tiny",
                              "--obj_source", "frcnn"])
    assert probs.shape == (3,)
    assert abs(probs.sum() - 1.0) < 1e-5
