"""MMBT (supervised multimodal bitransformer, models/mmbt.py) — the model
the reference's data side points at but never ships (``MMBT_Dataset``,
reference datasets.py:356-402; ``results_dir_mmbt``, config.py:135)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
    EncoderConfig)
from socialmedia_textimage_classification_auxlosses_tpu.models.mmbt import (
    MmbtClassifier, adaptive_avg_pool_rows, init_mmbt_params,
    split_mmbt_inputs)

from fixtures import make_task_fixture, patch_task

TINY = dict(vocab_size=64, hidden=32, layers=2, heads=2, mlp_dim=64,
            max_positions=64, type_vocab=2, dropout=0.0, dtype="float32")


def _tiny_model(num_labels=3):
    return MmbtClassifier(EncoderConfig(**TINY), num_labels,
                          cnn_name="resnet50", dropout=0.0)


def _batch(rng, b=4, L=12, img=32):
    ids = rng.integers(4, 60, (b, L)).astype(np.int32)
    ids[:, 0] = 1  # [CLS]
    lens = rng.integers(4, L, (b,))
    mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.int32)
    ids[np.arange(b), lens - 1] = 2  # [SEP] as last valid token
    ids[mask == 0] = 0
    px = rng.random((b, img, img, 3)).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(px)


def test_adaptive_pool_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.random((2, 7, 5, 3)).astype(np.float32)  # NHWC
    ours = adaptive_avg_pool_rows(jnp.asarray(x), 3)
    ref = torch.nn.AdaptiveAvgPool2d((3, 1))(
        torch.tensor(x).permute(0, 3, 1, 2))  # NCHW -> (2,3,3,1)
    ref = ref.squeeze(-1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6)


def test_split_matches_mmbt_batcher():
    """The in-forward split must produce the reference MMBT_Dataset fields
    exactly as data.pipeline.MMBTBatcher computes them host-side."""
    rng = np.random.default_rng(1)
    ids, mask, _ = _batch(rng)
    start, sentence, smask, end = split_mmbt_inputs(ids, mask)
    ids_np, mask_np = np.asarray(ids), np.asarray(mask)
    # MMBTBatcher semantics (pipeline.py:336-353)
    np.testing.assert_array_equal(np.asarray(start), ids_np[:, 0])
    np.testing.assert_array_equal(np.asarray(sentence), ids_np[:, 1:])
    np.testing.assert_array_equal(np.asarray(smask), mask_np[:, 1:])
    exp_end = np.asarray(
        [row[row.nonzero()][-1] if row.any() else 0
         for row in mask_np * ids_np])
    np.testing.assert_array_equal(np.asarray(end), exp_end)


def test_forward_outputs_and_shapes():
    rng = np.random.default_rng(2)
    ids, mask, px = _batch(rng)
    model = _tiny_model()
    variables = init_mmbt_params(model, jax.random.PRNGKey(0), ids, mask, px)
    out = model.apply(variables, ids, mask, px, tim_ids=ids, tim_mask=mask,
                      deterministic=True)
    assert out["out_cls"].shape == (4, 3)
    assert out["logits_per_text"].shape == (4, 4)
    assert out["out_tim"].shape == (4, 2)
    assert out["mm_features"].shape == (4, TINY["hidden"])
    assert np.all(np.isfinite(np.asarray(out["out_cls"])))


def test_image_tokens_shared_between_primary_and_tim_pass():
    """The TIM pass swaps text only — the image tokens must be identical, so
    a model applied with different tim text but same pixels yields the same
    primary out_cls."""
    rng = np.random.default_rng(3)
    ids, mask, px = _batch(rng)
    model = _tiny_model()
    variables = init_mmbt_params(model, jax.random.PRNGKey(0), ids, mask, px)
    swapped = jnp.roll(ids, 1, axis=0)
    o1 = model.apply(variables, ids, mask, px, tim_ids=ids, tim_mask=mask,
                     deterministic=True)
    o2 = model.apply(variables, ids, mask, px, tim_ids=swapped,
                     tim_mask=jnp.roll(mask, 1, axis=0), deterministic=True)
    np.testing.assert_array_equal(np.asarray(o1["out_cls"]),
                                  np.asarray(o2["out_cls"]))
    assert not np.array_equal(np.asarray(o1["out_tim"]),
                              np.asarray(o2["out_tim"]))


def test_train_step_updates_params_and_bn_stats():
    from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
        LossConfig, make_train_step)
    from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
        batch_stats_predicate, make_optimizer)

    rng = np.random.default_rng(4)
    ids, mask, px = _batch(rng)
    model = _tiny_model()
    variables = init_mmbt_params(model, jax.random.PRNGKey(0), ids, mask, px)

    def forward_fn(p, batch, tim_inputs, dropout_rng, deterministic):
        rngs = None if deterministic else {"dropout": dropout_rng}
        tim_kw = {}
        if tim_inputs is not None:
            tim_kw = {"tim_ids": tim_inputs["ids"],
                      "tim_mask": tim_inputs["mask"]}
        if deterministic:
            return model.apply(p, batch["ids"], batch["mask"],
                               batch["pixel_values"], deterministic=True,
                               **tim_kw)
        out, upd = model.apply(p, batch["ids"], batch["mask"],
                               batch["pixel_values"], deterministic=False,
                               train=True, rngs=rngs,
                               mutable=["batch_stats"], **tim_kw)
        out["batch_stats"] = upd["batch_stats"]
        return out

    loss_cfg = LossConfig(num_labels=3, use_clip_loss=True,
                          use_tim_loss=True, beta_itc=0.1, beta_itm=0.1)
    tx = make_optimizer(1e-3, 1e-4, batch_stats_predicate)
    opt_state = tx.init(variables)
    step = make_train_step(forward_fn, loss_cfg, tx)
    batch = {"ids": ids, "mask": mask, "pixel_values": px,
             "labels": jax.nn.one_hot(jnp.array([0, 1, 2, 0]), 3)}
    # the jitted step donates params/opt_state — snapshot before stepping
    w0 = np.asarray(variables["params"]["backbone"]["img_proj"]["kernel"])
    bn0 = np.asarray(
        variables["batch_stats"]["backbone"]["cnn"]["stem_bn"]["mean"])
    new_vars, opt_state, metrics = step(variables, opt_state, batch,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    w1 = new_vars["params"]["backbone"]["img_proj"]["kernel"]
    assert not np.array_equal(w0, np.asarray(w1))
    bn1 = new_vars["batch_stats"]["backbone"]["cnn"]["stem_bn"]["mean"]
    assert not np.array_equal(bn0, np.asarray(bn1))


@pytest.fixture
def task3(tmp_path, monkeypatch):
    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    monkeypatch.setattr(C, "DATA_PATH", str(tmp_path / "cache_root") + "/")
    os.makedirs(str(tmp_path / "cache_root"), exist_ok=True)
    return tmp_path


def test_run_mm_early_mmbt_end_to_end(task3):
    import pandas as pd

    from socialmedia_textimage_classification_auxlosses_tpu.cli import (
        run_mm_early)

    run_mm_early.main([
        "--model", "mmbt", "--task", "3", "--use_clip_loss", "--use_tim_loss",
        "--evaltest", "--arch", "tiny", "--dtype", "float32",
        "--attn_impl", "jnp", "--epochs", "1", "--log_every", "1",
    ])
    stem = C.results_dir_mmbt + "mmbt_task3_seed30_itc0.1itm0.1_"
    assert os.path.isfile(stem + "metrics_val.csv")
    df = pd.read_csv(stem + "metrics_val.csv")
    assert df["metric"].tolist() == C.metric_names
