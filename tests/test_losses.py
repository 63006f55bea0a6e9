"""Loss parity vs torch (the reference's loss provider), per SURVEY.md
section 4: ITC/ITM/weighted-CE values against reference-semantics cases."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.train import losses


def _rand(shape, rng, scale=2.0):
    return (rng.randn(*shape) * scale).astype(np.float32)


def test_weighted_ce_matches_torch_soft_targets(rng):
    logits = _rand((8, 4), rng)
    targets = np.zeros((8, 4), np.float32)
    targets[np.arange(8), rng.randint(0, 4, 8)] = 1.0
    w = rng.rand(4).astype(np.float32) + 0.5

    ref = tnn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(targets)
    ).item()
    ours = float(losses.weighted_ce(jnp.array(logits), jnp.array(targets), jnp.array(w)))
    assert abs(ref - ours) < 1e-5


def test_weighted_ce_no_weights(rng):
    logits = _rand((5, 3), rng)
    targets = np.eye(3, dtype=np.float32)[rng.randint(0, 3, 5)]
    ref = tnn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(targets)).item()
    ours = float(losses.weighted_ce(jnp.array(logits), jnp.array(targets)))
    assert abs(ref - ours) < 1e-5


def test_weighted_ce_mask_ignores_padding(rng):
    logits = _rand((6, 3), rng)
    targets = np.eye(3, dtype=np.float32)[rng.randint(0, 3, 6)]
    mask = np.array([1, 1, 1, 1, 0, 0], np.float32)
    full = float(losses.weighted_ce(jnp.array(logits[:4]), jnp.array(targets[:4])))
    masked = float(losses.weighted_ce(jnp.array(logits), jnp.array(targets), mask=jnp.array(mask)))
    assert abs(full - masked) < 1e-6


def test_int_ce_matches_torch(rng):
    logits = _rand((7, 2), rng)
    labels = rng.randint(0, 2, 7)
    ref = tnn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(labels)).item()
    ours = float(losses.int_ce(jnp.array(logits), jnp.array(labels)))
    assert abs(ref - ours) < 1e-5


def test_bce_with_logits_matches_torch(rng):
    logits = _rand((6, 5), rng)
    targets = rng.randint(0, 2, (6, 5)).astype(np.float32)
    pw = rng.rand(5).astype(np.float32) * 3 + 0.1
    ref = tnn.BCEWithLogitsLoss(pos_weight=torch.tensor(pw))(
        torch.tensor(logits), torch.tensor(targets)
    ).item()
    ours = float(losses.bce_with_logits(jnp.array(logits), jnp.array(targets), jnp.array(pw)))
    assert abs(ref - ours) < 1e-5


def test_clip_loss_matches_reference_formula(rng):
    sim = _rand((8, 8), rng)

    def torch_clip(similarity):
        def contrastive(l):
            return F.cross_entropy(l, torch.arange(len(l)))
        s = torch.tensor(similarity)
        return ((contrastive(s) + contrastive(s.t())) / 2.0).item()

    ours = float(losses.clip_loss(jnp.array(sim)))
    assert abs(torch_clip(sim) - ours) < 1e-5


def test_loss_correction_matches_reference_semantics(rng):
    # Reference loss_correction (utils.py:245-276) with reduction='none' CE.
    T = [[0.9, 0.1], [0.1, 0.9]]
    logits = _rand((6, 2), rng)
    targets = np.eye(2, dtype=np.float32)[rng.randint(0, 2, 6)]

    def torch_ref(T, output, label):
        loss_fn = tnn.CrossEntropyLoss(reduction="none")
        Tt = torch.tensor(T)
        eneg, one_minus_eneg = Tt[0][1], Tt[0][0]
        eplus, one_minus_eplus = Tt[1][0], Tt[1][1]
        label_zero = torch.tensor([[1.0, 0.0]] * label.size()[0])
        loss_zero = loss_fn(output, label_zero)
        label_one = torch.tensor([[0.0, 1.0]] * label.size()[0])
        loss_one = loss_fn(output, label_one)
        tgt = torch.argmax(label, dim=1)
        out = torch.zeros(tgt.size()[0])
        for i in range(tgt.size()[0]):
            if tgt[i] == 0:
                out[i] = one_minus_eplus * loss_zero[i] - eneg * loss_one[i]
            else:
                out[i] = one_minus_eneg * loss_one[i] - eplus * loss_zero[i]
            out[i] = out[i] / (one_minus_eplus - eneg)
        return out.mean().item()

    ref = torch_ref(T, torch.tensor(logits), torch.tensor(targets))
    ours = float(losses.loss_correction(T, jnp.array(logits), jnp.array(targets)))
    assert abs(ref - ours) < 1e-5


def test_combined_loss_weighting():
    cls, itc, itm = jnp.float32(1.0), jnp.float32(2.0), jnp.float32(4.0)
    both = float(losses.combined_loss(cls, itc, itm, 0.1, 0.1))
    assert abs(both - (0.8 * 1.0 + 0.1 * 2.0 + 0.1 * 4.0)) < 1e-6
    only_itc = float(losses.combined_loss(cls, itc, None, 0.1, None))
    assert abs(only_itc - (0.9 * 1.0 + 0.1 * 2.0)) < 1e-6
    only_itm = float(losses.combined_loss(cls, None, itm, None, 0.2))
    assert abs(only_itm - (0.8 * 1.0 + 0.2 * 4.0)) < 1e-6
    assert float(losses.combined_loss(cls, None, None, None, None)) == 1.0
