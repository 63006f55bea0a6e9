"""Architecture parity: our flax towers vs Hugging Face torch models with the
SAME (randomly initialised) weights, imported through models/hf_import.py.

This pins the architecture bit-for-bit offline — no downloads: the torch
model is built from a config, its state dict saved, imported, and logits
compared (SURVEY.md section 7 "HF weight ingestion" / numerical-parity tests).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
    BertEncoder, EncoderConfig, ViTEncoder,
)
from socialmedia_textimage_classification_auxlosses_tpu.models import hf_import as H

TINY = dict(hidden=32, layers=2, heads=2, mlp_dim=64)


def _np_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_bert_tower_parity(rng):
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    cfg = EncoderConfig(vocab_size=99, max_positions=40, type_vocab=2,
                        dropout=0.0, **TINY)
    model = BertEncoder(cfg)
    ids = rng.randint(0, 99, (3, 10))
    mask = np.ones((3, 10), np.int64)
    mask[:, 7:] = 0
    tt = np.zeros((3, 10), np.int64)

    params = model.init(jax.random.PRNGKey(0), jnp.array(ids), jnp.array(mask), jnp.array(tt))
    tower = H.import_bert_tower(_np_state(hf), num_layers=2)
    merged = H.merge_tower({"tower": params["params"]}, tower, path=("tower",))
    params = {"params": merged["tower"]}

    ours_hidden, ours_pooled = model.apply(
        params, jnp.array(ids), jnp.array(mask), jnp.array(tt)
    )
    with torch.no_grad():
        out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 token_type_ids=torch.tensor(tt))
    # compare non-padded positions (HF computes pad positions too; ours masks
    # them identically in attention so all positions should match)
    np.testing.assert_allclose(
        np.asarray(ours_hidden), out.last_hidden_state.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours_pooled), out.pooler_output.numpy(), atol=2e-5
    )


def test_roberta_tower_parity(rng):
    from transformers import RobertaConfig, RobertaModel

    hf_cfg = RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=42, type_vocab_size=1,
        pad_token_id=1, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    hf = RobertaModel(hf_cfg).eval()

    cfg = EncoderConfig(vocab_size=120, max_positions=42, type_vocab=1,
                        pos_offset=2, pad_token_id=1, dropout=0.0, **TINY)
    model = BertEncoder(cfg)
    ids = rng.randint(2, 120, (2, 9))
    ids[:, -2:] = 1  # right padding with pad_token_id
    mask = np.ones((2, 9), np.int64)
    mask[:, -2:] = 0

    params = model.init(jax.random.PRNGKey(0), jnp.array(ids), jnp.array(mask))
    tower = H.import_bert_tower(_np_state(hf), num_layers=2)
    merged = H.merge_tower({"tower": params["params"]}, tower, path=("tower",))
    params = {"params": merged["tower"]}

    ours_hidden, ours_pooled = model.apply(params, jnp.array(ids), jnp.array(mask))
    with torch.no_grad():
        out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
    keep = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(ours_hidden)[keep], out.last_hidden_state.numpy()[keep], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours_pooled), out.pooler_output.numpy(), atol=2e-5
    )


def test_vit_tower_parity(rng):
    from transformers import ViTConfig, ViTModel

    hf_cfg = ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(2)
    hf = ViTModel(hf_cfg, add_pooling_layer=True).eval()

    cfg = EncoderConfig(vocab_size=1, max_positions=1, type_vocab=0,
                        ln_style="pre", dropout=0.0, **TINY)
    model = ViTEncoder(cfg, patch=8, image_size=32)
    pixels = rng.randn(2, 3, 32, 32).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.array(pixels))
    tower = H.import_vit_tower(_np_state(hf), num_layers=2)
    merged = H.merge_tower({"tower": params["params"]}, tower, path=("tower",))
    params = {"params": merged["tower"]}

    ours_hidden, ours_pooled = model.apply(params, jnp.array(pixels))
    with torch.no_grad():
        out = hf(torch.tensor(pixels))
    np.testing.assert_allclose(
        np.asarray(ours_hidden), out.last_hidden_state.numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours_pooled), out.pooler_output.numpy(), atol=3e-5
    )
