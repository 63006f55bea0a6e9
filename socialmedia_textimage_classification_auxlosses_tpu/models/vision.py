"""Image towers + classification heads (reference ``models/image_only.py``).

* ``vit``  — ViT-base/16: head = linear over the final-LN CLS token
  (reference image_only.py:150-152 uses ``AutoModelForImageClassification``,
  whose classifier reads ``sequence_output[:, 0]``; logits at :209-210).
* ``beit`` — ViT-style tower with BEiT's mean-of-patch-tokens pooling; head =
  linear over the pooled output (reference image_only.py:30-40).
* ``deit`` — distilled ViT (CLS + distillation prefix tokens); head = linear
  over the tanh CLS pooler (reference image_only.py:42-52).
* ``resnet50`` / ``resnet152`` — flax ResNet with a fresh fc head
  (reference image_only.py:54-88), see ``resnet.py``.

``beit`` is the true BEiT architecture (relative position bias, layer scale,
no key bias — ``models/beit.py``, imported below); its pooled output is the
layer-normed mean of patch tokens, matching HF's BeitPooler.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .encoder import EncoderConfig, ViTEncoder

VISION_PRESETS = {
    "vit": dict(patch=16, image_size=224, num_prefix_tokens=1, pooling="tanh"),
    "beit": dict(patch=16, image_size=224, num_prefix_tokens=1, pooling="mean"),
    "deit": dict(patch=16, image_size=224, num_prefix_tokens=2, pooling="tanh"),
}

CNN_MODELS = {"resnet50", "resnet152"}

# Per-model pixel normalization (HF feature-extractor semantics: the
# reference runs ViTFeatureExtractor per sample, datasets.py:88).
IMAGE_NORM = {
    "vit": ([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    "beit": ([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    "deit": ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    "vilt": ([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    # torchvision ImageNet stats (reference utils.py:19-31)
    "imagenet": ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    # reference's custom CNN-fusion stats (utils.py:33-44)
    "mm_cnn": ([0.46777044, 0.44531429, 0.40661017],
               [0.12221994, 0.12145835, 0.14380469]),
}


def _load_hf_config(model_dir: Optional[str]) -> dict:
    if model_dir:
        path = os.path.join(model_dir, "config.json")
        if os.path.isfile(path):
            with open(path) as f:
                return json.load(f)
    return {}


def vision_encoder_config(
    model_name: str,
    model_dir: Optional[str] = None,
    dtype: str = "float32",
    attn_impl: str = "auto",
    remat: bool = False,
    **overrides,
) -> EncoderConfig:
    hf = _load_hf_config(model_dir)
    if hf:
        overrides.setdefault("hidden", hf.get("hidden_size", 768))
        overrides.setdefault("layers", hf.get("num_hidden_layers", 12))
        overrides.setdefault("heads", hf.get("num_attention_heads", 12))
        overrides.setdefault("mlp_dim", hf.get("intermediate_size", 3072))
        overrides.setdefault("ln_eps", hf.get("layer_norm_eps", 1e-12))
        # tower dropout follows the checkpoint config (HF ViT defaults to
        # 0.0), matching the reference's from_pretrained towers.
        overrides.setdefault("dropout", hf.get("hidden_dropout_prob", 0.0))
    overrides.setdefault("ln_eps", 1e-12)
    return EncoderConfig(
        vocab_size=1, max_positions=1, type_vocab=0, ln_style="pre",
        dtype=dtype, attn_impl=attn_impl, remat=remat, **overrides,
    )


def vit_geometry(model_name: str, model_dir: Optional[str] = None) -> dict:
    geo = dict(VISION_PRESETS[model_name])
    hf = _load_hf_config(model_dir)
    if hf:
        geo["patch"] = hf.get("patch_size", geo["patch"])
        geo["image_size"] = hf.get("image_size", geo["image_size"])
    return geo


class BeitClassifier(nn.Module):
    """True-BEiT tower + linear head over the mean-pool pooled output
    (reference image_only.py:30-40)."""

    cfg: EncoderConfig
    num_labels: int
    patch: int = 16
    image_size: int = 224

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        from .beit import BeitEncoder

        _, pooled = BeitEncoder(self.cfg, patch=self.patch,
                                image_size=self.image_size, name="tower")(
            pixel_values, deterministic)
        return nn.Dense(self.num_labels, dtype=jnp.float32, name="classifier")(
            pooled.astype(jnp.float32))


class VisionClassifier(nn.Module):
    """ViT/DEiT tower + head; returns logits."""

    cfg: EncoderConfig
    num_labels: int
    patch: int = 16
    image_size: int = 224
    num_prefix_tokens: int = 1
    pooling: str = "tanh"
    head_on: str = "cls"  # "cls" (vit classifier) or "pooled" (beit/deit)

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        hidden, pooled = ViTEncoder(
            self.cfg,
            patch=self.patch,
            image_size=self.image_size,
            num_prefix_tokens=self.num_prefix_tokens,
            pooling=self.pooling,
            name="tower",
        )(pixel_values, deterministic)
        feat = hidden[:, 0, :] if self.head_on == "cls" else pooled
        return nn.Dense(self.num_labels, dtype=jnp.float32, name="classifier")(
            feat.astype(jnp.float32)
        )


def build_vision_classifier(
    model_name: str,
    num_labels: int,
    model_dir: Optional[str] = None,
    dtype: str = "float32",
    attn_impl: str = "auto",
    remat: bool = False,
    **overrides,
):
    if model_name in CNN_MODELS:
        from .resnet import build_resnet_classifier

        return build_resnet_classifier(model_name, num_labels, dtype=dtype)
    cfg = vision_encoder_config(
        model_name, model_dir, dtype=dtype, attn_impl=attn_impl, remat=remat,
        **overrides,
    )
    geo = vit_geometry(model_name, model_dir)
    if model_name == "beit":
        return BeitClassifier(cfg, num_labels, patch=geo["patch"],
                              image_size=geo["image_size"])
    return VisionClassifier(
        cfg,
        num_labels,
        patch=geo["patch"],
        image_size=geo["image_size"],
        num_prefix_tokens=geo["num_prefix_tokens"],
        pooling=geo["pooling"],
        head_on=("cls" if model_name == "vit" else "pooled"),
    )
