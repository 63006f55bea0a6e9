"""Data-prep tests: label vectorization, class weights, splits, Config task
registry (reference utils.py:109-217, config.py:6-77)."""

import numpy as np
import pandas as pd
import pytest
from sklearn.utils.class_weight import compute_class_weight

from socialmedia_textimage_classification_auxlosses_tpu.data import prep


def _df(n=40, num_labels=3, rng=None):
    rng = rng or np.random.RandomState(0)
    split = ["train"] * (n - 10) + ["val"] * 5 + ["test"] * 5
    return pd.DataFrame(
        {
            "tweet_id": np.arange(n),
            "text": [f"tweet number {i}" for i in range(n)],
            "label": rng.randint(0, num_labels, n),
            "split": split,
        }
    )


def test_vectorize_labels_onehot():
    y = np.array([0, 2, 1])
    v = prep.vectorize_labels(y, 3)
    assert v.shape == (3, 3)
    assert np.allclose(v, np.eye(3)[[0, 2, 1]])


def test_balanced_class_weights_match_sklearn(rng):
    y = rng.randint(0, 4, 100)
    ours = prep.balanced_class_weights(y, 4)
    ref = compute_class_weight(class_weight="balanced", classes=np.arange(4), y=y)
    assert np.allclose(ours, ref, atol=1e-6)


def test_multilabel_pos_weights():
    y = np.array([[1, 0], [1, 1], [0, 1], [1, 0]], np.float32)
    w = prep.multilabel_pos_weights(y)
    # label 0: count 3 -> (4-3)/3; label 1: count 2 -> (4-2)/2
    assert np.allclose(w, [1 / 3, 1.0], atol=1e-6)


def test_prepare_data_splits(rng):
    df = _df(rng=rng)
    train, val, test, w = prep.prepare_data(df, 3, rng=rng)
    assert len(train) == 30 and len(val) == 5 and len(test) == 5
    assert train.labels.shape == (30, 3)
    assert w.shape == (3,)


def test_prepare_data_testing_subsample(rng):
    df = _df(n=400, rng=rng)
    train, val, test, _ = prep.prepare_data(df, 3, testing=True, rng=rng)
    assert len(train) + len(val) + len(test) == 200


def test_prepare_data_nsamples(rng):
    df = _df(rng=rng)
    train, _, _, _ = prep.prepare_data(df, 3, nsamples=7, rng=rng)
    assert len(train) == 7


def test_prepare_data_random_labels(rng):
    df = _df(rng=rng)
    t1, _, _, _ = prep.prepare_data(df, 3, random_labels=True, rng=np.random.RandomState(1))
    assert t1.labels.shape == (30, 3)
    assert set(np.unique(t1.labels)) <= {0.0, 1.0}


def test_config_task_registry(tmp_path, monkeypatch):
    import argparse
    from socialmedia_textimage_classification_auxlosses_tpu.core import config as C

    # build a tiny data_key CSV for task 3 (mvsa)
    df = _df(n=20, num_labels=3)
    p = tmp_path / "data_key_mvsa.csv"
    df.to_csv(p, index=False)
    monkeypatch.setitem(C.PATH, 3, str(p))

    args = argparse.Namespace(
        task=3, dropout=0.05, weight_decay=2.5e-4, lr=1e-5,
        use_clip_loss=True, use_tim_loss=True, beta_itc=0.1, beta_itm=0.2,
    )
    cfg = C.Config(args, model_name=None, multimodal=True)
    assert cfg.num_labels == 3 and cfg.batch_size == 16
    assert cfg.max_length == 128
    assert cfg.loss_str == "itc0.1itm0.2"
    assert cfg.task_name == "mvsa"

    cfg_vilt = C.Config(args, model_name="vilt", multimodal=True)
    assert cfg_vilt.max_length == 40


def test_config_task2_label_argmax(tmp_path, monkeypatch):
    import argparse
    from socialmedia_textimage_classification_auxlosses_tpu.core import config as C

    n = 12
    rng = np.random.RandomState(0)
    onehot = np.eye(4)[rng.randint(0, 4, n)]
    df = pd.DataFrame({
        "tweet_id": np.arange(n),
        "text": ["t"] * n,
        "image_adds_text_repr": onehot[:, 0],
        "image_adds_text_notrepr": onehot[:, 1],
        "image_notadds_text_repr": onehot[:, 2],
        "image_notadds_text_notrepr": onehot[:, 3],
        "split": ["train"] * 8 + ["val"] * 2 + ["test"] * 2,
    })
    p = tmp_path / "data_key_imgtxt_random.csv"
    df.to_csv(p, index=False)
    monkeypatch.setitem(C.PATH, 2, str(p))

    args = argparse.Namespace(task=2, dropout=0.05, weight_decay=2.5e-4, lr=1e-5,
                              use_clip_loss=False, use_tim_loss=False,
                              beta_itc=0.1, beta_itm=0.1)
    cfg = C.Config(args)
    assert cfg.num_labels == 4 and cfg.batch_size == 8
    assert np.array_equal(cfg.data["label"].values, np.argmax(onehot, axis=1))
