"""Scan-over-layers parity and the MMBT-style batcher."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
    BertEncoder, EncoderConfig,
)


def test_scan_layers_matches_unrolled(rng):
    base = dict(vocab_size=40, hidden=16, layers=3, heads=2, mlp_dim=32,
                max_positions=12, type_vocab=1, dropout=0.0)
    unrolled = BertEncoder(EncoderConfig(**base))
    scanned = BertEncoder(EncoderConfig(scan_layers=True, **base))

    ids = jnp.array(rng.randint(0, 40, (2, 8)))
    mask = jnp.ones((2, 8), jnp.int32)
    p_unrolled = unrolled.init(jax.random.PRNGKey(0), ids, mask)
    p_scanned = scanned.init(jax.random.PRNGKey(1), ids, mask)

    # transplant unrolled layer params into the scanned (stacked) layout
    enc_u = p_unrolled["params"]["encoder"]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves),
        *[enc_u[f"layer_{i}"] for i in range(3)],
    )
    p_s = jax.tree_util.tree_map(lambda x: x, p_scanned)
    p_s["params"]["encoder"] = {"layers": {"layer": stacked}}
    p_s["params"]["embeddings"] = p_unrolled["params"]["embeddings"]
    p_s["params"]["pooler"] = p_unrolled["params"]["pooler"]

    h_u, pool_u = unrolled.apply(p_unrolled, ids, mask)
    h_s, pool_s = scanned.apply(p_s, ids, mask)
    np.testing.assert_allclose(np.asarray(h_u), np.asarray(h_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pool_u), np.asarray(pool_s), atol=1e-6)


def test_mmbt_batcher(rng, tmp_path):
    from socialmedia_textimage_classification_auxlosses_tpu.data.pipeline import (
        MMBTBatcher, LazyImageSource,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.data.prep import SplitArrays
    from socialmedia_textimage_classification_auxlosses_tpu.data.tokenizers import (
        build_tokenizer,
    )
    from PIL import Image
    import os

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    ids = np.arange(5)
    for i in ids:
        Image.fromarray(rng.randint(0, 255, (20, 20, 3), np.uint8)).save(
            img_dir / f"{i}.jpg"
        )
    split = SplitArrays(
        ids=ids, ids_num=ids.astype(np.int64),
        text=np.array([f"tweet {i}" for i in ids], object),
        labels=np.eye(2, dtype=np.float32)[rng.randint(0, 2, 5)],
    )
    tok = build_tokenizer("bert", None, max_length=10, vocab_size=100)
    src = LazyImageSource(str(img_dir / "{}.jpg"), size=16)
    batches = list(MMBTBatcher(split, tok, src, batch_size=2, max_length=10).batches())
    assert len(batches) == 3
    b = batches[0]
    assert b["sentence"].shape == (2, 9)
    assert b["image"].shape == (2, 16, 16, 3)
    assert b["image_start_token"].shape == (2,)


def test_scan_import_matches_unscanned_import(rng):
    """Pretrained import under --scan_layers: importing an HF state dict into
    the scanned layout (hf_import.stack_scan_layers) must give the same
    logits as the unscanned import (round-1 verdict item 9)."""
    import torch
    from transformers import BertConfig, BertModel

    from socialmedia_textimage_classification_auxlosses_tpu.models import (
        hf_import as H,
    )

    layers = 3
    hf = BertModel(BertConfig(
        vocab_size=40, hidden_size=16, num_hidden_layers=layers,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=12, type_vocab_size=1))
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    base = dict(vocab_size=40, hidden=16, layers=layers, heads=2, mlp_dim=32,
                max_positions=12, type_vocab=1, dropout=0.0, attn_impl="jnp")
    ids = jnp.array(rng.randint(0, 40, (2, 8)))
    mask = jnp.ones((2, 8), jnp.int32)

    unrolled = BertEncoder(EncoderConfig(**base))
    p_u = unrolled.init(jax.random.PRNGKey(0), ids, mask)
    p_u = H.merge_tower(p_u, H.import_bert_tower(state, layers), ("params",))

    scanned = BertEncoder(EncoderConfig(scan_layers=True, **base))
    p_s = scanned.init(jax.random.PRNGKey(1), ids, mask)
    tree = H.stack_scan_layers(H.import_bert_tower(state, layers), layers)
    p_s = H.merge_tower(p_s, tree, ("params",))

    h_u, pool_u = unrolled.apply(p_u, ids, mask)
    h_s, pool_s = scanned.apply(p_s, ids, mask)
    np.testing.assert_allclose(np.asarray(h_u), np.asarray(h_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pool_u), np.asarray(pool_s), atol=1e-6)
