"""Text towers + classification heads (reference ``models/text_only.py``).

Four model names, two architectures:
  * ``bert`` / ``bertweet``: BERT tower, head = linear over dropout(CLS)
    (reference text_only.py:27-39; bertweet routes through the same class,
    text_only.py:93-94).
  * ``bernice``: XLM-R-style tower (no token types, offset positions), same
    CLS head (reference text_only.py:41-53).
  * ``roberta``: RoBERTa tower, head over the *pooled* output (reference
    text_only.py:55-66; the reference discards its dropout there — we apply
    it, which is identical in eval mode and the evident intent in train).

Hyperparameters come from presets below; when a local pretrained directory
(``MODEL_DIR_DICT``) holds a ``config.json`` its dimensions win, so imported
HF checkpoints line up exactly.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .encoder import BertEncoder, EncoderConfig

# Architecture presets (dimensions per the public model cards; used when no
# local checkpoint config is available).
TEXT_PRESETS = {
    "bert": dict(vocab_size=30522, max_positions=512, type_vocab=2,
                 pos_offset=0, pad_token_id=0),
    "bertweet": dict(vocab_size=64001, max_positions=130, type_vocab=1,
                     pos_offset=2, pad_token_id=1),
    "roberta": dict(vocab_size=50265, max_positions=514, type_vocab=1,
                    pos_offset=2, pad_token_id=1),
    "bernice": dict(vocab_size=250002, max_positions=514, type_vocab=1,
                    pos_offset=2, pad_token_id=1),
}

# Model names whose tokenizer produces no token_type_ids
# (reference datasets.py:53-55, text_only.py:145-155).
NO_TOKEN_TYPES = {"roberta", "bernice"}


def _load_hf_config(model_dir: Optional[str]) -> dict:
    if model_dir:
        path = os.path.join(model_dir, "config.json")
        if os.path.isfile(path):
            with open(path) as f:
                return json.load(f)
    return {}


def text_encoder_config(
    model_name: str,
    model_dir: Optional[str] = None,
    dtype: str = "float32",
    dropout: float = 0.1,
    attn_impl: str = "auto",
    remat: bool = False,
    **overrides,
) -> EncoderConfig:
    preset = dict(TEXT_PRESETS[model_name])
    hf = _load_hf_config(model_dir)
    if hf:
        preset.update(
            vocab_size=hf.get("vocab_size", preset["vocab_size"]),
            max_positions=hf.get("max_position_embeddings", preset["max_positions"]),
            type_vocab=hf.get("type_vocab_size", preset["type_vocab"]),
            pad_token_id=hf.get("pad_token_id", preset["pad_token_id"]),
        )
        overrides.setdefault("hidden", hf.get("hidden_size", 768))
        overrides.setdefault("layers", hf.get("num_hidden_layers", 12))
        overrides.setdefault("heads", hf.get("num_attention_heads", 12))
        overrides.setdefault("mlp_dim", hf.get("intermediate_size", 3072))
        overrides.setdefault("ln_eps", hf.get("layer_norm_eps", 1e-12))
        # tower dropout follows the checkpoint config, exactly as the
        # reference's AutoModel.from_pretrained does (text_only.py:30);
        # args.dropout only governs the classification head there.
        dropout = hf.get("hidden_dropout_prob", dropout)
    preset.update(overrides)
    return EncoderConfig(
        dropout=dropout, ln_style="post", dtype=dtype, attn_impl=attn_impl,
        remat=remat, **preset,
    )


class TextClassifier(nn.Module):
    """Tower + linear classification head; returns logits.

    ``use_pooled`` selects the RoBERTa head variant (pooled output) vs the
    CLS-of-last-hidden head used by bert/bertweet/bernice.
    """

    cfg: EncoderConfig
    num_labels: int
    head_dropout: float = 0.1
    use_pooled: bool = False

    @nn.compact
    def __call__(self, ids, attention_mask=None, token_type_ids=None,
                 deterministic=True, word_embeds=None):
        hidden, pooled = BertEncoder(self.cfg, name="tower")(
            ids, attention_mask, token_type_ids, deterministic,
            word_embeds=word_embeds,
        )
        feat = pooled if self.use_pooled else hidden[:, 0, :]
        feat = nn.Dropout(self.head_dropout)(feat, deterministic=deterministic)
        return nn.Dense(self.num_labels, dtype=jnp.float32, name="classifier")(
            feat.astype(jnp.float32)
        )


def build_text_classifier(
    model_name: str,
    num_labels: int,
    model_dir: Optional[str] = None,
    dropout: float = 0.1,
    dtype: str = "float32",
    attn_impl: str = "auto",
    remat: bool = False,
    **overrides,
) -> TextClassifier:
    cfg = text_encoder_config(
        model_name, model_dir, dtype=dtype, attn_impl=attn_impl, remat=remat,
        **overrides,
    )
    return TextClassifier(
        cfg, num_labels, head_dropout=dropout, use_pooled=(model_name == "roberta")
    )
