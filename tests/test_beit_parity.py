"""True-BEiT parity: our BeitEncoder vs HF BeitModel with imported random
weights (relative position bias, layer scale, no key bias, mean-pool LN
pooler)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.models import hf_import as H
from socialmedia_textimage_classification_auxlosses_tpu.models.beit import (
    BeitEncoder, beit_relative_position_index,
)
from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import EncoderConfig


def test_relative_position_index_matches_hf():
    import os
    os.environ.setdefault("USE_TF", "0")
    from transformers.models.beit.modeling_beit import BeitRelativePositionBias
    from transformers import BeitConfig

    cfg = BeitConfig(hidden_size=32, num_attention_heads=2, image_size=32,
                     patch_size=8)
    hf = BeitRelativePositionBias(cfg, window_size=(4, 4))
    ours = beit_relative_position_index(4)
    theirs = hf.generate_relative_position_index(
        torch.Size((4, 4))).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_beit_tower_parity(rng):
    from transformers import BeitConfig, BeitModel

    hf_cfg = BeitConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
        use_relative_position_bias=True, use_shared_relative_position_bias=False,
        layer_scale_init_value=0.1, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        use_mean_pooling=True,
    )
    torch.manual_seed(7)
    hf = BeitModel(hf_cfg, add_pooling_layer=True).eval()

    cfg = EncoderConfig(vocab_size=1, hidden=32, layers=2, heads=2, mlp_dim=64,
                        max_positions=1, type_vocab=0, ln_style="pre",
                        dropout=0.0)
    model = BeitEncoder(cfg, patch=8, image_size=32)
    pixels = rng.randn(2, 3, 32, 32).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.array(pixels))
    tree = H.import_beit_tower(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, 2
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
