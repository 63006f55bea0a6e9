"""Early-fusion parity: our ViLT/LXMERT backbones vs HF torch models with the
same (random) imported weights."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.models import hf_import as H
from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import EncoderConfig
from socialmedia_textimage_classification_auxlosses_tpu.models.lxmert import (
    LxmertBackbone, LxmertConfig,
)
from socialmedia_textimage_classification_auxlosses_tpu.models.vilt import ViltBackbone


def _np_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_vilt_backbone_parity(rng):
    from transformers import ViltConfig, ViltModel

    hf_cfg = ViltConfig(
        vocab_size=50, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
        max_position_embeddings=20, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(4)
    hf = ViltModel(hf_cfg).eval()

    cfg = EncoderConfig(vocab_size=50, hidden=32, layers=2, heads=2, mlp_dim=64,
                        max_positions=20, type_vocab=2, ln_style="pre", dropout=0.0)
    model = ViltBackbone(cfg, patch=8, image_size=32)

    ids = rng.randint(0, 50, (2, 8))
    mask = np.ones((2, 8), np.int64)
    mask[:, 6:] = 0
    tt = np.zeros((2, 8), np.int64)
    pixels = rng.randn(2, 3, 32, 32).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.array(ids), jnp.array(mask),
                        jnp.array(tt), jnp.array(pixels))
    tree = H.import_vilt(_np_state(hf), num_layers=2)
    merged = H.merge_tower({"backbone": params["params"]}, tree, path=("backbone",))
    params = {"params": merged["backbone"]}

    hidden, pooled = model.apply(params, jnp.array(ids), jnp.array(mask),
                                 jnp.array(tt), jnp.array(pixels))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 token_type_ids=torch.tensor(tt),
                 pixel_values=torch.tensor(pixels))
    ours = np.asarray(hidden)
    theirs = out.last_hidden_state.numpy()
    # HF ViLT's visual_embed PERMUTES patches randomly (multinomial sampling,
    # modeling_vilt visual_embed); the transformer is permutation-equivariant
    # over (patch, pos) pairs, so text tokens, the image CLS and pooled output
    # match exactly while patch tokens match only as a set — compare their sum.
    np.testing.assert_allclose(ours[:, :8], theirs[:, :8], atol=3e-5)
    np.testing.assert_allclose(ours[:, 8], theirs[:, 8], atol=3e-5)
    np.testing.assert_allclose(ours[:, 9:].sum(1), theirs[:, 9:].sum(1), atol=3e-4)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               atol=3e-5)


def test_lxmert_backbone_parity(rng):
    from transformers import LxmertConfig as HFLxmertConfig, LxmertModel

    hf_cfg = HFLxmertConfig(
        vocab_size=60, hidden_size=32, num_attention_heads=2,
        intermediate_size=64, l_layers=2, x_layers=1, r_layers=1,
        visual_feat_dim=16, visual_pos_dim=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(5)
    hf = LxmertModel(hf_cfg).eval()

    cfg = LxmertConfig(vocab_size=60, hidden=32, heads=2, mlp_dim=64,
                       l_layers=2, r_layers=1, x_layers=1, visual_feat_dim=16,
                       dropout=0.0)
    model = LxmertBackbone(cfg)

    ids = rng.randint(0, 60, (2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[:, 5:] = 0
    tt = np.zeros((2, 7), np.int64)
    feats = rng.randn(2, 5, 16).astype(np.float32)
    boxes = rng.rand(2, 5, 4).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.array(ids), jnp.array(mask),
                        jnp.array(tt), jnp.array(feats), jnp.array(boxes))
    tree = H.import_lxmert(_np_state(hf), l_layers=2, r_layers=1, x_layers=1)
    merged = H.merge_tower({"backbone": params["params"]}, tree, path=("backbone",))
    params = {"params": merged["backbone"]}

    lang, vis = model.apply(params, jnp.array(ids), jnp.array(mask),
                            jnp.array(tt), jnp.array(feats), jnp.array(boxes))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 token_type_ids=torch.tensor(tt),
                 visual_feats=torch.tensor(feats), visual_pos=torch.tensor(boxes))
    keep = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(lang)[keep],
                               out.language_output.numpy()[keep], atol=3e-5)
    np.testing.assert_allclose(np.asarray(vis), out.vision_output.numpy(),
                               atol=3e-5)
