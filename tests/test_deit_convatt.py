"""DEiT (distilled ViT) parity + attention-CNN classifier path."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
from socialmedia_textimage_classification_auxlosses_tpu.models import hf_import as H
from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
    EncoderConfig, ViTEncoder,
)

from fixtures import make_task_fixture, patch_task


def test_deit_tower_parity(rng):
    from transformers import DeiTConfig, DeiTModel

    hf_cfg = DeiTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(8)
    hf = DeiTModel(hf_cfg, add_pooling_layer=True).eval()

    cfg = EncoderConfig(vocab_size=1, hidden=32, layers=2, heads=2, mlp_dim=64,
                        max_positions=1, type_vocab=0, ln_style="pre", dropout=0.0)
    model = ViTEncoder(cfg, patch=8, image_size=32, num_prefix_tokens=2)
    pixels = rng.randn(2, 3, 32, 32).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.array(pixels))
    tree = H.import_vit_tower(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()},
        num_layers=2, distilled=True,
    )
    merged = H.merge_tower({"tower": params["params"]}, tree, path=("tower",))
    params = {"params": merged["tower"]}

    hidden, pooled = model.apply(params, jnp.array(pixels))
    with torch.no_grad():
        out = hf(torch.tensor(pixels))
    np.testing.assert_allclose(np.asarray(hidden),
                               out.last_hidden_state.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(), atol=3e-5)


def test_run_img_conv_att(tmp_path, monkeypatch):
    csv_path, img_fmt, _ = make_task_fixture(tmp_path / "data", task=3)
    patch_task(monkeypatch, C, 3, csv_path, img_fmt, tmp_path / "results")
    import os

    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_img

    run_img.main(["--model_name", "resnet50", "--task", "3", "--conv_att",
                  "--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
                  "--epochs", "1", "--log_every", "1", "--image_size", "64"])
    stem = C.results_dir_img + "resnet50_task3_seed30"
    assert os.path.isfile(stem + "_metrics_val.csv")
