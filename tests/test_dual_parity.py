"""Full dual-encoder parity: our DualEncoder under weights imported from a
(random) HF VisionTextDualEncoderModel must reproduce its logits_per_text —
the ITC logits the aux loss consumes (reference mm_late.py:159)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.models.dual import DualEncoder
from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import EncoderConfig
from socialmedia_textimage_classification_auxlosses_tpu.models import hf_import as H

TINY = dict(hidden=32, layers=2, heads=2, mlp_dim=64)


def test_dual_encoder_logits_parity(rng):
    from transformers import (BertConfig, ViTConfig, VisionTextDualEncoderConfig,
                              VisionTextDualEncoderModel)

    text_hf = BertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=40, type_vocab_size=2,
                         hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    vis_hf = ViTConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                       intermediate_size=64, image_size=32, patch_size=8,
                       hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    cfg_hf = VisionTextDualEncoderConfig.from_vision_text_configs(
        vis_hf, text_hf, projection_dim=16)
    torch.manual_seed(3)
    hf = VisionTextDualEncoderModel(cfg_hf).eval()

    text_cfg = EncoderConfig(vocab_size=99, max_positions=40, type_vocab=2,
                             dropout=0.0, **TINY)
    vis_cfg = EncoderConfig(vocab_size=1, max_positions=1, type_vocab=0,
                            ln_style="pre", dropout=0.0, **TINY)
    model = DualEncoder(text_cfg, vis_cfg, patch=8, image_size=32,
                        projection_dim=16)

    ids = rng.randint(0, 99, (4, 10))
    mask = np.ones((4, 10), np.int64)
    tt = np.zeros((4, 10), np.int64)
    pixels = rng.randn(4, 3, 32, 32).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.array(ids), jnp.array(mask),
                        jnp.array(pixels), jnp.array(tt))
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    tree = H.import_dual_encoder(state, text_layers=2, vision_layers=2)
    merged = H.merge_tower({"dual": params["params"]}, tree, path=("dual",))
    params = {"params": merged["dual"]}

    out = model.apply(params, jnp.array(ids), jnp.array(mask), jnp.array(pixels),
                      jnp.array(tt))
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                    token_type_ids=torch.tensor(tt),
                    pixel_values=torch.tensor(pixels))
    np.testing.assert_allclose(
        np.asarray(out["logits_per_text"]), hf_out.logits_per_text.numpy(),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["text_pooled"]),
        hf_out.text_model_output.pooler_output.numpy(), atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["vision_pooled"]),
        hf_out.vision_model_output.pooler_output.numpy(), atol=2e-5,
    )
