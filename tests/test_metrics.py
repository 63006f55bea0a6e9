"""Metric parity vs sklearn (same averaging conventions as the reference's
torchmetrics calls, utils.py:294-325)."""

import numpy as np
import jax.numpy as jnp
from sklearn.metrics import f1_score, precision_score, recall_score

from socialmedia_textimage_classification_auxlosses_tpu.train import metrics as M


def _sk(y, y_pred, num_classes, avg):
    labels = list(range(num_classes))
    return {
        "f1": f1_score(y, y_pred, labels=labels, average=avg, zero_division=0),
        "precision": precision_score(y, y_pred, labels=labels, average=avg, zero_division=0),
        "recall": recall_score(y, y_pred, labels=labels, average=avg, zero_division=0),
    }


def test_multiclass_metrics_match_sklearn(rng):
    num_classes = 4
    y = rng.randint(0, num_classes, 100)
    y_pred = rng.randint(0, num_classes, 100)
    cm = np.zeros((num_classes, num_classes))
    np.add.at(cm, (y, y_pred), 1)
    ours = M.metrics_from_confusion(cm)
    for avg in ("weighted", "macro"):
        sk = _sk(y, y_pred, num_classes, avg)
        assert abs(ours[f"f1_{avg}"] - sk["f1"]) < 1e-9
        assert abs(ours[f"precision_{avg}"] - sk["precision"]) < 1e-9
        assert abs(ours[f"recall_{avg}"] - sk["recall"]) < 1e-9


def test_missing_class_zero_division(rng):
    # class 2 never predicted nor true
    y = np.array([0, 0, 1, 1])
    y_pred = np.array([0, 1, 1, 1])
    cm = np.zeros((3, 3))
    np.add.at(cm, (y, y_pred), 1)
    ours = M.metrics_from_confusion(cm)
    sk = _sk(y, y_pred, 3, "macro")
    assert abs(ours["f1_macro"] - sk["f1"]) < 1e-9


def test_confusion_update_jnp_matches_numpy(rng):
    num_classes = 3
    y = rng.randint(0, num_classes, 32)
    p = rng.randint(0, num_classes, 32)
    mask = (rng.rand(32) > 0.3).astype(np.float32)
    cm = np.asarray(
        M.confusion_matrix_update(jnp.array(p), jnp.array(y), num_classes, jnp.array(mask))
    )
    ref = np.zeros((num_classes, num_classes))
    np.add.at(ref, (y, p), mask)
    assert np.allclose(cm, ref)


def test_multilabel_metrics_match_sklearn(rng):
    L = 5
    y = rng.randint(0, 2, (64, L))
    p = rng.randint(0, 2, (64, L))
    counts = np.asarray(M.multilabel_counts_update(jnp.array(p), jnp.array(y)))
    ours = M.metrics_from_multilabel_counts(counts)
    for avg in ("weighted", "macro"):
        assert abs(ours[f"f1_{avg}"] - f1_score(y, p, average=avg, zero_division=0)) < 1e-9


def test_compute_metrics_contract(rng):
    res = {"predictions": rng.randint(0, 3, 50), "labels": rng.randint(0, 3, 50), "loss": 0.5}
    table = M.compute_metrics(res, 3)
    assert table["metric"] == [
        "f1_weighted", "f1_macro", "precision_weighted", "precision_macro",
        "recall_weighted", "recall_macro", "loss",
    ]
    assert len(table["result"]) == 7


def test_agg_metrics_val_epoch_columns(rng):
    names = ["f1_weighted", "f1_macro", "precision_weighted", "precision_macro",
             "recall_weighted", "recall_macro", "loss"]
    res = [
        {"predictions": rng.randint(0, 2, 20), "labels": rng.randint(0, 2, 20),
         "loss": 0.1, "epoch": 0},
        {"predictions": rng.randint(0, 2, 20), "labels": rng.randint(0, 2, 20),
         "loss": 0.2, "epoch": 1},
    ]
    table = M.agg_metrics_val(res, names, 2)
    assert set(table.keys()) == {"metric", "epoch-1", "epoch-2"}
    assert len(table["epoch-1"]) == len(names)
