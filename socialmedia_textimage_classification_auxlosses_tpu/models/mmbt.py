"""MMBT — supervised multimodal bitransformer (Kiela et al. 2019).

The reference declares the full MMBT data side but ships no model: a
``MMBT_Dataset`` that splits tokenized text into image start/end tokens +
sentence (reference ``datasets.py:356-402``) and a dedicated results
directory (``results_dir_mmbt``, reference ``config.py:135``) — the evident
intent, completed here the same way the undefined ``CNNAtt``/``XATT``
registries were (models/resnet.py, models/fusion.py).

Architecture (per the paper / HF ``MMBTModel`` semantics):

* ResNet trunk -> 7x7x2048 feature map, adaptively average-pooled (torch
  ``AdaptiveAvgPool2d((N,1))`` boundaries) into ``num_image_embeds`` region
  tokens, projected to the text hidden size;
* joint sequence ``[CLS] img_1..img_N [SEP] sentence`` where [CLS]/[SEP]
  come from the reference dataset's ``image_start_token``/``image_end_token``
  fields (the tokenizer's own specials, datasets.py:385-389) and embed
  through the shared word table;
* BERT post-LN encoder over the joint sequence with segment ids 0 for the
  image span and 1 for the sentence (HF MMBT convention), standard position
  embeddings, CLS pooler -> classification head.

Aux-loss surface matches the other fusion families (ViLT pattern,
models/vilt.py): ITC cosine logits with learnable ``logit_scale`` between
the pooled text span and the pooled image span, and a second joint pass
over TIM-swapped sentences (image tokens computed ONCE and reused — the
swap only touches text, so this is exact, unlike the text-tower reuse
deviation documented for mm_late).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .encoder import EncoderConfig, Pooler, TextEmbeddings, TransformerStack
from .resnet import STAGE_SIZES, ResNet


def adaptive_avg_pool_rows(fmap, n_out: int):
    """torch ``AdaptiveAvgPool2d((n_out, 1))`` over an NHWC feature map:
    rows pooled into ``n_out`` (possibly overlapping) bins with the torch
    boundary rule start=floor(i*H/n), end=ceil((i+1)*H/n); columns fully
    averaged. Static Python loop — n_out is a hyperparameter."""
    b, h, w, c = fmap.shape
    cols = fmap.mean(axis=2)  # (b, h, c)
    rows = []
    for i in range(n_out):
        lo = (i * h) // n_out
        hi = -(-((i + 1) * h) // n_out)
        rows.append(cols[:, lo:hi, :].mean(axis=1))
    return jnp.stack(rows, axis=1)  # (b, n_out, c)


class MmbtBackbone(nn.Module):
    cfg: EncoderConfig
    cnn_name: str = "resnet152"
    num_image_embeds: int = 3

    def setup(self):
        cfg = self.cfg
        self.word = nn.Embed(cfg.vocab_size, cfg.hidden, dtype=cfg.jdtype,
                             name="word")
        # num_labels unused — the trunk's fc head is never applied here
        self.trunk = ResNet(STAGE_SIZES[self.cnn_name], 2,
                            dtype=cfg.dtype, name="cnn")
        self.img_proj = nn.Dense(cfg.hidden, dtype=cfg.jdtype,
                                 name="img_proj")
        self.embeddings = TextEmbeddings(cfg, name="embeddings")
        self.encoder = TransformerStack(cfg, name="encoder")
        self.pooler = Pooler(cfg, name="pooler")

    def encode_image(self, pixel_values, train=False):
        """Image region tokens (computed once per step; both the primary and
        the TIM joint pass consume the same tokens)."""
        _, fmap = self.trunk(pixel_values, train=train, return_features=True)
        pooled = adaptive_avg_pool_rows(fmap, self.num_image_embeds)
        return self.img_proj(pooled.astype(self.cfg.jdtype))

    def joint(self, start_ids, sentence_ids, sentence_mask, end_ids,
              img_tokens, deterministic=True):
        """[word(start), img tokens, word(end), word(sentence)] -> encoder.

        Returns (hidden, pooled, n_modal) with n_modal = image span length
        including its [CLS]/[SEP] delimiters."""
        cfg = self.cfg
        b = start_ids.shape[0]
        modal = jnp.concatenate([
            self.word(start_ids[:, None]),
            img_tokens.astype(cfg.jdtype),
            self.word(end_ids[:, None]),
        ], axis=1)
        text = self.word(sentence_ids)
        joint_we = jnp.concatenate([modal, text], axis=1)
        n_modal = modal.shape[1]
        joint_len = joint_we.shape[1]
        # ids only drive position construction inside TextEmbeddings
        # (pos_offset=0 for BERT); segment 0 = image span, 1 = sentence
        pos_driver = jnp.zeros((b, joint_len), jnp.int32)
        token_type = jnp.concatenate([
            jnp.zeros((b, n_modal), jnp.int32),
            jnp.ones((b, joint_len - n_modal), jnp.int32),
        ], axis=1)
        emb = self.embeddings(pos_driver, token_type, None, deterministic,
                              word_embeds=joint_we)
        jmask = jnp.concatenate([
            jnp.ones((b, n_modal), jnp.int32),
            sentence_mask.astype(jnp.int32),
        ], axis=1)
        hidden = self.encoder(emb, jmask, deterministic)
        return hidden, self.pooler(hidden), n_modal


def split_mmbt_inputs(ids, attention_mask):
    """Standard tokenized batch -> the reference ``MMBT_Dataset`` fields
    (datasets.py:378-402): leading [CLS] becomes ``image_start_token``, the
    last valid token ([SEP]) becomes ``image_end_token``, the rest is the
    sentence. Equivalence with data.pipeline.MMBTBatcher is test-enforced."""
    start = ids[:, 0]
    last = jnp.maximum(attention_mask.sum(axis=1).astype(jnp.int32) - 1, 0)
    end = jnp.take_along_axis(ids, last[:, None], axis=1)[:, 0]
    return start, ids[:, 1:], attention_mask[:, 1:], end


class MmbtClassifier(nn.Module):
    """MMBT with the framework's shared trainer contract (out_cls /
    logits_per_text / out_tim outputs, train/steps.py)."""

    cfg: EncoderConfig
    num_labels: int
    cnn_name: str = "resnet152"
    num_image_embeds: int = 3
    dropout: float = 0.05
    logit_scale_init: float = 2.6592  # CLIP default, reference mm_early.py:57
    # One 2B-row joint-encoder dispatch for [primary ; TIM-swapped] (the CNN
    # image tokens are computed once and shared either way): identical
    # per-row math, better MXU fill at the paper's batch sizes; dropout
    # draws once over 2B rows. False restores the sequential two-pass.
    tim_batched: bool = True

    def setup(self):
        self.backbone = MmbtBackbone(self.cfg, cnn_name=self.cnn_name,
                                     num_image_embeds=self.num_image_embeds,
                                     name="backbone")
        self.head_dropout = nn.Dropout(self.dropout)
        self.linear = nn.Dense(self.num_labels, dtype=jnp.float32,
                               name="linear")
        self.logit_scale = self.param(
            "logit_scale",
            lambda k: jnp.asarray(self.logit_scale_init, jnp.float32))
        self.linear_tim = nn.Dense(2, dtype=jnp.float32, name="linear_tim")

    def __call__(self, ids, attention_mask, pixel_values, tim_ids=None,
                 tim_mask=None, deterministic=True, train=False):
        start, sentence, smask, end = split_mmbt_inputs(ids, attention_mask)
        img_tokens = self.backbone.encode_image(pixel_values, train=train)
        tim_pooled = None
        if tim_ids is not None and self.tim_batched:
            cat = lambda a, b: jnp.concatenate([a, b], axis=0)
            t_start, t_sent, t_smask, t_end = split_mmbt_inputs(tim_ids,
                                                                tim_mask)
            b = ids.shape[0]
            hidden2, pooled2, n_modal = self.backbone.joint(
                cat(start, t_start), cat(sentence, t_sent),
                cat(smask, t_smask), cat(end, t_end),
                jnp.concatenate([img_tokens, img_tokens], axis=0),
                deterministic)
            hidden, pooled = hidden2[:b], pooled2[:b]
            tim_pooled = pooled2[b:]
        else:
            hidden, pooled, n_modal = self.backbone.joint(
                start, sentence, smask, end, img_tokens, deterministic)
        out_cls = self.linear(
            self.head_dropout(pooled.astype(jnp.float32),
                              deterministic=deterministic))

        # ITC spans: image tokens (positions 1..N) vs the sentence span,
        # both masked-mean-pooled (the LXMERT pooling convention,
        # models/lxmert.py / reference mm_early.py:138-143)
        x_v = hidden[:, 1:n_modal - 1, :].astype(jnp.float32).mean(axis=1)
        tmask = smask.astype(jnp.float32)[:, :, None]
        text_part = hidden[:, n_modal:, :].astype(jnp.float32)
        x_t = (text_part * tmask).sum(axis=1) / jnp.maximum(
            tmask.sum(axis=1), 1.0)

        out_tim = None
        if tim_ids is not None and tim_pooled is None:
            t_start, t_sent, t_smask, t_end = split_mmbt_inputs(tim_ids,
                                                                tim_mask)
            _, tim_pooled, _ = self.backbone.joint(
                t_start, t_sent, t_smask, t_end, img_tokens, deterministic)
        if tim_pooled is not None:
            out_tim = self.linear_tim(tim_pooled.astype(jnp.float32))

        return {
            "out_cls": out_cls,
            "logits_per_text": self.get_logits_per_text(x_t, x_v),
            "out_tim": out_tim,
            "out_iadds": None,
            "mm_features": pooled.astype(jnp.float32),
        }

    def get_logits_per_text(self, x_t, x_v):
        t = x_t / jnp.linalg.norm(x_t, axis=-1, keepdims=True)
        v = x_v / jnp.linalg.norm(x_v, axis=-1, keepdims=True)
        return jnp.exp(self.logit_scale) * (t @ v.T)


def init_mmbt_params(model: MmbtClassifier, rng, ids, mask, pixel_values):
    return model.init(rng, ids, mask, pixel_values, tim_ids=ids,
                      tim_mask=mask)
