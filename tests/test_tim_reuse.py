"""--tim_reuse_text: the TIM rows are an in-batch permutation of the primary
text rows (train/itm.py), so reusing the primary pass's text-tower
activations by row gather is EXACTLY the re-encoding path in deterministic
mode; under dropout only the tower masks are shared (documented deviation,
cli/_common.py flag help)."""

import jax
import jax.numpy as jnp
import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.cli._common import (
    ARCH_PRESETS,
)
from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
    MMLateModel, init_mm_late_params,
)
from socialmedia_textimage_classification_auxlosses_tpu.models.text import (
    text_encoder_config,
)
from socialmedia_textimage_classification_auxlosses_tpu.models.vision import (
    vision_encoder_config,
)


def _tiny_model():
    overrides = dict(ARCH_PRESETS["tiny"])
    text_cfg = text_encoder_config("bernice", None, dtype="float32",
                                   attn_impl="jnp", **overrides)
    vis_cfg = vision_encoder_config("vit", None, dtype="float32",
                                    attn_impl="jnp", **overrides)
    return MMLateModel(text_cfg, vis_cfg, num_labels=3,
                       fusion_name="attention", dropout=0.1, patch=8,
                       image_size=16)


def _batch(rng, b=6, seq=10, img=16, vocab=64):
    ids = jnp.asarray(rng.randint(4, vocab, (b, seq)), jnp.int32)
    mask = jnp.ones((b, seq), jnp.int32)
    px = jnp.asarray(rng.rand(b, img, img, 3), jnp.float32)
    return ids, mask, px


def test_deterministic_outputs_identical(rng):
    model = _tiny_model()
    ids, mask, px = _batch(rng)
    params = init_mm_late_params(model, jax.random.PRNGKey(0), ids[:2],
                                 mask[:2], px[:2])
    src = jnp.asarray([2, 1, 0, 3, 5, 4], jnp.int32)
    ref = model.apply(params, ids, mask, px,
                      tim_ids=jnp.take(ids, src, axis=0),
                      tim_mask=jnp.take(mask, src, axis=0),
                      deterministic=True)
    fast = model.apply(params, ids, mask, px, tim_src=src,
                       deterministic=True)
    for k in ("out_cls", "logits_per_text", "out_tim", "mm_features"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(fast[k]))


def test_gradients_identical_deterministic(rng):
    model = _tiny_model()
    ids, mask, px = _batch(rng)
    params = init_mm_late_params(model, jax.random.PRNGKey(0), ids[:2],
                                 mask[:2], px[:2])
    src = jnp.asarray([1, 0, 3, 2, 5, 4], jnp.int32)
    labels = jnp.asarray(np.eye(3, dtype=np.float32)[
        np.asarray(rng.randint(0, 3, 6))])
    tim_labels = jnp.asarray(rng.randint(0, 2, 6), jnp.int32)

    def loss(p, reuse):
        kw = ({"tim_src": src} if reuse else
              {"tim_ids": jnp.take(ids, src, axis=0),
               "tim_mask": jnp.take(mask, src, axis=0)})
        out = model.apply(p, ids, mask, px, deterministic=True, **kw)
        ce = -jnp.mean(jnp.sum(jax.nn.log_softmax(out["out_cls"]) * labels, -1))
        itm = -jnp.mean(jnp.take_along_axis(
            jax.nn.log_softmax(out["out_tim"]), tim_labels[:, None], 1))
        return 0.8 * ce + 0.2 * itm

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fast = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fast)):
        # identical math; the gather-based graph fuses differently, so CPU
        # accumulation order can wiggle the last float digit
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_cli_flag_reaches_model(tmp_path, monkeypatch):
    """run_mm_late --tim_reuse_text trains end-to-end and writes artifacts."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_task_fixture, patch_task
    from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_mm_late

    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    run_mm_late.main([
        "--txt_model_name", "bernice", "--img_model_name", "vit",
        "--fusion_name", "attention", "--task", "3", "--use_tim_loss",
        "--use_clip_loss", "--tim_reuse_text",
        "--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
        "--epochs", "1", "--log_every", "1"])
    stem = (C.results_dir_mm_late +
            "bernice-vit-attention_task3_seed30_itc0.1itm0.1_")
    assert os.path.isfile(stem + "metrics_test.csv")
