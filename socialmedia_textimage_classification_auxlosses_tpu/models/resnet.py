"""Flax ResNet-50/152 (reference ``models/image_only.py:54-88`` loads
torchvision resnets from local ``.pth`` files and swaps the fc head).

Bottleneck-v1 topology matching torchvision so checkpoints can be mapped by
``hf_import.import_torchvision_resnet``. Convolutions run in ``dtype``
(bfloat16 on TPU — conv lands on the MXU); batch-norm statistics stay f32.

Also provides ``Self_Attn``-style SAGAN conv self-attention (reference
image_only.py:90-120) and the working attention-CNN fusion module that the
reference's ``CNNAtt``/``XATT``/``CNNImgConcat`` registry names point at but
never define (reference image_only.py:143, mm_late.py:42-47) — implemented
here as the evident intent, per SURVEY.md section 7 "reference bugs".
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

STAGE_SIZES = {
    "resnet50": (3, 4, 6, 3),
    "resnet152": (3, 8, 36, 3),
}


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train=False):
        dt = jnp.dtype(self.dtype)
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=dt, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=1, use_bias=False, dtype=dt, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=dt, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=dt, name="down_conv",
            )(x)
            residual = norm("down_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    num_labels: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, pixel_values, train=False, return_features=False):
        dt = jnp.dtype(self.dtype)
        x = pixel_values
        if x.shape[1] == 3:  # NCHW -> NHWC
            x = x.transpose(0, 2, 3, 1)
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=dt, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(64 * 2**stage, strides=strides, dtype=self.dtype,
                               name=f"stage{stage}_block{block}")(x, train)
        feature_map = x  # (B, 7, 7, 2048)
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        logits = nn.Dense(self.num_labels, dtype=jnp.float32, name="fc")(pooled)
        if return_features:
            return logits, feature_map
        return logits


class ConvSelfAttention(nn.Module):
    """SAGAN-style conv self-attention (reference image_only.py:90-120):
    1x1 query/key/value convs, softmax over spatial positions, learnable
    gamma-gated residual."""

    in_dim: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        dt = jnp.dtype(self.dtype)
        b, h, w, c = x.shape
        n = h * w
        q = nn.Conv(self.in_dim // 8, (1, 1), dtype=dt, name="query")(x).reshape(b, n, -1)
        k = nn.Conv(self.in_dim // 8, (1, 1), dtype=dt, name="key")(x).reshape(b, n, -1)
        v = nn.Conv(self.in_dim, (1, 1), dtype=dt, name="value")(x).reshape(b, n, -1)
        energy = jnp.einsum("bqc,bkc->bqk", q, k)
        attn = nn.softmax(energy.astype(jnp.float32), axis=-1).astype(dt)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma.astype(dt) * out + x, attn


class ResNetAttnClassifier(nn.Module):
    """The evident intent of the reference's undefined ``CNNAtt``
    (image_only.py:143): ResNet trunk + conv self-attention over the final
    feature map, then the fc head."""

    stage_sizes: Sequence[int]
    num_labels: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, pixel_values, train=False):
        _, fmap = ResNet(self.stage_sizes, self.num_labels, dtype=self.dtype,
                         name="trunk")(pixel_values, train, return_features=True)
        attended, _ = ConvSelfAttention(fmap.shape[-1], dtype=self.dtype,
                                        name="self_attn")(fmap)
        pooled = jnp.mean(attended, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_labels, dtype=jnp.float32, name="fc")(pooled)


def build_resnet_classifier(model_name: str, num_labels: int, dtype="float32",
                            conv_att: bool = False):
    sizes = STAGE_SIZES[model_name]
    if conv_att:
        return ResNetAttnClassifier(sizes, num_labels, dtype=dtype)
    return ResNet(sizes, num_labels, dtype=dtype)
