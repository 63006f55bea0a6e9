"""Reference-trained early-fusion checkpoint import: ViLT/LXMERT wrapper
state dicts (mm_early.py head stacks) -> our classifiers, with logit parity
against torch re-enactments of the reference forwards."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.models import hf_import as H
from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import EncoderConfig
from socialmedia_textimage_classification_auxlosses_tpu.models.lxmert import (
    LxmertClassifier, LxmertConfig, init_lxmert_params,
)
from socialmedia_textimage_classification_auxlosses_tpu.models.vilt import (
    ViltClassifier, init_vilt_params,
)


class TorchRefVilt(tnn.Module):
    """Reference ViLT wrapper semantics (mm_early.py:48-103)."""

    def __init__(self, num_labels):
        super().__init__()
        from transformers import ViltConfig, ViltModel

        cfg = ViltConfig(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         image_size=32, patch_size=8, max_position_embeddings=20,
                         hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
        self.model = ViltModel(cfg)
        self.linear = tnn.Linear(32, num_labels)
        self.linear_tim = tnn.Linear(32, 2)
        self.logit_scale = tnn.Parameter(torch.ones([]) * 2.6592)

    def forward(self, ids, mask, tt, pixels):
        last_hidden, _ = self.model(input_ids=ids, attention_mask=mask,
                                    token_type_ids=tt, pixel_values=pixels,
                                    return_dict=False)
        out_cls = self.linear(last_hidden[:, 0])
        x_t = last_hidden[:, 0]
        x_v = last_hidden[:, ids.shape[1]]
        t = x_t / x_t.norm(p=2, dim=-1, keepdim=True)
        v = x_v / x_v.norm(p=2, dim=-1, keepdim=True)
        logits = self.logit_scale.exp() * (t @ v.t())
        return out_cls, logits


def test_reference_vilt_checkpoint_parity(rng):
    torch.manual_seed(9)
    ref = TorchRefVilt(num_labels=3).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = EncoderConfig(vocab_size=50, hidden=32, layers=2, heads=2, mlp_dim=64,
                        max_positions=20, type_vocab=2, ln_style="pre", dropout=0.0)
    model = ViltClassifier(cfg, 3, patch=8, image_size=32, dropout=0.0)
    ids = rng.randint(0, 50, (3, 8))
    mask = np.ones((3, 8), np.int64)
    tt = np.zeros((3, 8), np.int64)
    pixels = rng.randn(3, 3, 32, 32).astype(np.float32)
    params = init_vilt_params(model, jax.random.PRNGKey(0), jnp.array(ids),
                              jnp.array(mask), jnp.array(tt), jnp.array(pixels))
    tree = H.import_reference_vilt(state, num_layers=2)
    merged = H.merge_tower({"root": params["params"]}, tree, path=("root",))
    params = {"params": merged["root"]}

    out = model.apply(params, jnp.array(ids), jnp.array(mask), jnp.array(tt),
                      jnp.array(pixels))
    with torch.no_grad():
        t_cls, t_itc = ref(torch.tensor(ids), torch.tensor(mask),
                           torch.tensor(tt), torch.tensor(pixels))
    np.testing.assert_allclose(np.asarray(out["out_cls"]), t_cls.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out["logits_per_text"]),
                               t_itc.numpy(), atol=5e-4)


class TorchRefLxmert(tnn.Module):
    """Reference Lxmert wrapper semantics (mm_early.py:105-172)."""

    def __init__(self, num_labels):
        super().__init__()
        from transformers import LxmertConfig as HFL, LxmertModel

        cfg = HFL(vocab_size=60, hidden_size=32, num_attention_heads=2,
                  intermediate_size=64, l_layers=2, x_layers=1, r_layers=1,
                  visual_feat_dim=16, visual_pos_dim=4,
                  hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
        self.model = LxmertModel(cfg)
        self.linear_fusion = tnn.Linear(32, 32)
        self.linear = tnn.Linear(32, num_labels)
        self.linear_tim = tnn.Linear(32, 2)
        self.logit_scale = tnn.Parameter(torch.ones([]) * 2.6592)

    def forward(self, ids, mask, tt, feats, boxes):
        out = self.model(input_ids=ids, attention_mask=mask,
                         visual_feats=feats, visual_pos=boxes,
                         token_type_ids=tt)
        x_t, x_v = out.language_output, out.vision_output
        fused = torch.relu(self.linear_fusion(x_t[:, 0]))
        out_cls = self.linear(fused)
        expanded = mask.unsqueeze(-1).expand(x_t.size()).float()
        lh = x_t.clone()
        lh[expanded == 0] = -1e9
        max_t = torch.max(lh, 1)[0]
        max_v = torch.max(x_v, 1)[0]
        t = max_t / max_t.norm(p=2, dim=-1, keepdim=True)
        v = max_v / max_v.norm(p=2, dim=-1, keepdim=True)
        logits = self.logit_scale.exp() * (t @ v.t())
        return out_cls, logits


def test_reference_lxmert_checkpoint_parity(rng):
    torch.manual_seed(10)
    ref = TorchRefLxmert(num_labels=3).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = LxmertConfig(vocab_size=60, hidden=32, heads=2, mlp_dim=64,
                       l_layers=2, r_layers=1, x_layers=1, visual_feat_dim=16,
                       dropout=0.0)
    model = LxmertClassifier(cfg, 3, dropout=0.0)
    ids = rng.randint(0, 60, (3, 7))
    mask = np.ones((3, 7), np.int64)
    mask[:, 5:] = 0
    tt = np.zeros((3, 7), np.int64)
    feats = rng.randn(3, 5, 16).astype(np.float32)
    boxes = rng.rand(3, 5, 4).astype(np.float32)
    params = init_lxmert_params(model, jax.random.PRNGKey(0), jnp.array(ids),
                                jnp.array(mask), jnp.array(tt),
                                jnp.array(feats), jnp.array(boxes))
    tree = H.import_reference_lxmert(state, l_layers=2, r_layers=1, x_layers=1)
    merged = H.merge_tower({"root": params["params"]}, tree, path=("root",))
    params = {"params": merged["root"]}

    out = model.apply(params, jnp.array(ids), jnp.array(mask), jnp.array(tt),
                      jnp.array(feats), jnp.array(boxes))
    with torch.no_grad():
        t_cls, t_itc = ref(torch.tensor(ids), torch.tensor(mask),
                           torch.tensor(tt), torch.tensor(feats),
                           torch.tensor(boxes))
    np.testing.assert_allclose(np.asarray(out["out_cls"]), t_cls.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out["logits_per_text"]),
                               t_itc.numpy(), atol=5e-4)
