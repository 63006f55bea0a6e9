"""cli/verify_imports: the importer-on-arrival verification command
(VERDICT r3 missing 3). The real stage is rehearsed here with tiny locally
*saved* HF checkpoints (save_pretrained -> real weight files on disk), so
the exact code path that will run on the published unc-nlp/HF artifacts is
proven today; the synthetic stage delegates to the importer-parity suite
and is covered by a plan/parse test (running it re-runs half the repo's
tests — exercised via --stage synthetic in CI-scale runs, not here)."""

import os

import numpy as np
import pytest
import torch

from socialmedia_textimage_classification_auxlosses_tpu.cli import verify_imports as V
from socialmedia_textimage_classification_auxlosses_tpu.core import config as C


def _save_tiny_bert(dir_path):
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    m = BertModel(BertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0))
    m.save_pretrained(dir_path)
    return m


def _save_tiny_vit(dir_path):
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(1)
    m = ViTModel(ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0))
    m.save_pretrained(dir_path)
    return m


def _save_tiny_vilt(dir_path):
    from transformers import ViltConfig, ViltModel

    torch.manual_seed(2)
    m = ViltModel(ViltConfig(
        vocab_size=50, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, image_size=32,
        patch_size=8, max_position_embeddings=20, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0))
    m.save_pretrained(dir_path)
    return m


def test_real_stage_text_tower_against_saved_checkpoint(tmp_path):
    d = str(tmp_path / "BERT-base")
    _save_tiny_bert(d)
    assert V._has_weights(d)
    err = V.check_text_tower("bert", d, atol=1e-4, seq=10)
    assert err <= 1e-4


def test_real_stage_vision_tower_against_saved_checkpoint(tmp_path):
    d = str(tmp_path / "ViT")
    _save_tiny_vit(d)
    err = V.check_vision_tower("vit", d, atol=1e-4)
    assert err <= 1e-4


def test_real_stage_vilt_against_saved_checkpoint(tmp_path):
    d = str(tmp_path / "ViLT")
    _save_tiny_vilt(d)
    err = V.check_vilt(d, atol=1e-4, seq=8)
    assert err <= 1e-4


def test_real_stage_table_and_exit_code(tmp_path, monkeypatch, capsys):
    """main(--stage real): families with weights PASS, absent ones SKIP,
    and the exit code reflects only real failures."""
    d = str(tmp_path / "BERT-base")
    _save_tiny_bert(d)
    monkeypatch.setitem(C.MODEL_DIR_DICT, "bert", d)
    for fam in ("bertweet", "roberta", "bernice", "vit", "beit", "deit",
                "vilt", "lxmert"):
        monkeypatch.setitem(C.MODEL_DIR_DICT, fam,
                            str(tmp_path / "missing" / fam))
    rc = V.main(["--stage", "real", "--atol", "1e-4"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS" in out and "SKIP" in out
    assert out.count("SKIP") == 8


def test_reference_ckpt_check_vilt(tmp_path):
    """A reference-trained ViLT wrapper .pth (the mm_early.py head stack)
    imports cleanly through check_reference_ckpt."""
    import torch.nn as tnn
    from transformers import ViltConfig, ViltModel

    class Wrapper(tnn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(3)
            self.model = ViltModel(ViltConfig(
                vocab_size=50, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64, image_size=32,
                patch_size=8, max_position_embeddings=20))
            self.linear = tnn.Linear(32, 3)
            self.linear_tim = tnn.Linear(32, 2)
            self.logit_scale = tnn.Parameter(torch.ones([]) * 2.6592)

    path = str(tmp_path / "vilt_task3_seed30__net.pth")
    torch.save(Wrapper().state_dict(), path)
    n = V.check_reference_ckpt("vilt", path, atol=1e-4)
    assert n > 0


def test_synthetic_suite_covers_every_importer_family():
    """The synthetic plan must keep covering towers, dual, early fusion,
    reference checkpoints, resnet, and frcnn — and point at test files that
    exist."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    labels = " ".join(l for l, _ in V.SYNTHETIC_SUITE).lower()
    for needle in ("bert", "beit", "dual", "mm_late", "vilt", "resnet", "frcnn"):
        assert needle in labels, needle
    for _, nodeid in V.SYNTHETIC_SUITE:
        assert os.path.isfile(os.path.join(repo, nodeid.split("::")[0])), nodeid
