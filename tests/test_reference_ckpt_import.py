"""Full-model parity under an imported reference-format MM_Model checkpoint:
classification logits, ITC logits and TIM logits must match a torch
re-enactment of the reference forward (mm_late.py:148-193).

The published reference snapshot cannot be imported as code (its utils.py
crashes on ``from config import T``), so the torch side re-enacts the
documented forward with the exact parameter names the reference saves
(torch.save(state_dict), mm_late.py:529-531)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.models import hf_import as H
from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import EncoderConfig
from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
    MMLateModel, init_mm_late_params,
)

TINY = dict(hidden=32, layers=2, heads=2, mlp_dim=64)


class TorchMMLate(tnn.Module):
    """Reference MM_Model semantics with reference parameter names."""

    def __init__(self, num_labels):
        super().__init__()
        from transformers import (BertConfig, ViTConfig,
                                  VisionTextDualEncoderConfig,
                                  VisionTextDualEncoderModel)

        text_cfg = BertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                              num_attention_heads=2, intermediate_size=64,
                              max_position_embeddings=40, type_vocab_size=2,
                              hidden_dropout_prob=0.0,
                              attention_probs_dropout_prob=0.0)
        vis_cfg = ViTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            image_size=32, patch_size=8,
                            hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0)
        cfg = VisionTextDualEncoderConfig.from_vision_text_configs(
            vis_cfg, text_cfg, projection_dim=16)
        self.dual_encoder = VisionTextDualEncoderModel(cfg)
        h = 32
        self.fc_Q = tnn.Linear(h, h)
        self.fc_K = tnn.Linear(h, h)
        self.fc_V = tnn.Linear(h, h)
        self.linear_fusion = tnn.Linear(2 * h, h)
        self.linear_cls = tnn.Linear(h, num_labels)
        self.linear_tim = tnn.Linear(h, 2)
        self.linear_iadds = tnn.Linear(h, 2)
        self.aspectattention = tnn.Linear(h, 1)
        self.linear_gmu_t = tnn.Linear(h, 2 * h)
        self.linear_gmu_v = tnn.Linear(h, 2 * h)

    def fuse(self, x_t, x_v):
        q, k, v = self.fc_Q(x_t), self.fc_K(x_v), self.fc_V(x_v)
        scale = k.size(-1) ** -0.5
        att = torch.softmax(q @ k.transpose(1, 2) * scale, -1) @ v
        cat = torch.cat([x_t[:, 0], att[:, 0]], -1)
        return torch.relu(self.linear_fusion(cat))

    def forward(self, ids, mask, tt, pixels, tim_ids, tim_mask, tim_tt):
        out = self.dual_encoder(input_ids=ids, attention_mask=mask,
                                token_type_ids=tt, pixel_values=pixels)
        fused = self.fuse(out.text_model_output.last_hidden_state,
                          out.vision_model_output.last_hidden_state)
        out_cls = self.linear_cls(fused)
        # reference TIM second pass re-runs the whole dual encoder
        out2 = self.dual_encoder(input_ids=tim_ids, attention_mask=tim_mask,
                                 token_type_ids=tim_tt, pixel_values=pixels)
        fused2 = self.fuse(out2.text_model_output.last_hidden_state,
                           out2.vision_model_output.last_hidden_state)
        out_tim = self.linear_tim(fused2)
        return out_cls, out.logits_per_text, out_tim


def test_reference_mm_late_checkpoint_parity(rng):
    torch.manual_seed(6)
    ref = TorchMMLate(num_labels=3).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    text_cfg = EncoderConfig(vocab_size=99, max_positions=40, type_vocab=2,
                             dropout=0.0, **TINY)
    vis_cfg = EncoderConfig(vocab_size=1, max_positions=1, type_vocab=0,
                            ln_style="pre", dropout=0.0, **TINY)
    model = MMLateModel(text_cfg, vis_cfg, num_labels=3,
                        fusion_name="attention", dropout=0.0, patch=8,
                        image_size=32, projection_dim=16)

    ids = rng.randint(0, 99, (4, 9))
    mask = np.ones((4, 9), np.int64)
    tt = np.zeros((4, 9), np.int64)
    pixels = rng.randn(4, 3, 32, 32).astype(np.float32)
    tim_ids = ids[::-1].copy()

    params = init_mm_late_params(model, jax.random.PRNGKey(0), jnp.array(ids),
                                 jnp.array(mask), jnp.array(pixels),
                                 jnp.array(tt))
    tree = H.import_reference_mm_late(state, text_layers=2, vision_layers=2,
                                      fusion_name="attention")
    merged = H.merge_tower({"root": params["params"]}, tree, path=("root",))
    params = {"params": merged["root"]}

    out = model.apply(params, jnp.array(ids), jnp.array(mask),
                      jnp.array(pixels), jnp.array(tt),
                      tim_ids=jnp.array(tim_ids), tim_mask=jnp.array(mask),
                      tim_token_type_ids=jnp.array(tt))
    with torch.no_grad():
        t_cls, t_itc, t_tim = ref(torch.tensor(ids), torch.tensor(mask),
                                  torch.tensor(tt), torch.tensor(pixels),
                                  torch.tensor(tim_ids), torch.tensor(mask),
                                  torch.tensor(tt))
    np.testing.assert_allclose(np.asarray(out["out_cls"]), t_cls.numpy(),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(out["logits_per_text"]),
                               t_itc.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["out_tim"]), t_tim.numpy(),
                               atol=5e-5)
