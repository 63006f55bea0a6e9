"""Data preparation (L2 front half).

Split/label/weight logic with the same observable behaviour as the
reference's ``prepare_data`` / ``prepare_text_data`` / ``vectorize_labels*``
(reference ``models/utils.py:109-217``): split by the ``split`` column,
optional 200-row ``--testing`` subsample, optional ``--nsamples`` train cap,
one-hot float label vectorization (or random-label ablation), sklearn-style
balanced class weights (multiclass) / pos-weight (multilabel), optional
``image_adds`` passthrough.

Everything returns numpy; device placement happens later in the batcher.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def vectorize_labels(y: np.ndarray, num_labels: int) -> np.ndarray:
    """Integer class ids -> one-hot float matrix (reference utils.py:109-122)."""
    out = np.zeros((len(y), num_labels), dtype=np.float32)
    out[np.arange(len(y)), np.asarray(y, dtype=np.int64)] = 1.0
    return out


def vectorize_labels_random(n: int, num_labels: int, rng: np.random.RandomState) -> np.ndarray:
    """Random-label ablation (reference utils.py:124-131)."""
    return rng.randint(2, size=(n, num_labels)).astype(np.float32)


def balanced_class_weights(y: np.ndarray, num_labels: int) -> np.ndarray:
    """sklearn ``compute_class_weight("balanced")`` semantics
    (reference utils.py:170-178): n_samples / (n_classes * bincount)."""
    y = np.asarray(y, dtype=np.int64)
    counts = np.bincount(y, minlength=num_labels).astype(np.float64)
    n = len(y)
    with np.errstate(divide="ignore"):
        w = n / (num_labels * counts)
    w[~np.isfinite(w)] = 1.0  # classes absent from train get weight 1
    return w.astype(np.float32)


def multilabel_pos_weights(y: np.ndarray) -> np.ndarray:
    """(N - count) / count per label column (reference utils.py:180-183)."""
    y = np.asarray(y, dtype=np.float64)
    count = y.sum(axis=0)
    with np.errstate(divide="ignore"):
        w = (len(y) - count) / count
    w[~np.isfinite(w)] = 1.0
    return w.astype(np.float32)


@dataclasses.dataclass
class SplitArrays:
    """One split's host-side arrays."""

    ids: np.ndarray        # object array of tweet ids (strings or ints)
    ids_num: np.ndarray    # int64 ids for the CSV contract (data_id column)
    text: np.ndarray       # object array of raw texts
    labels: np.ndarray     # (N, num_labels) float32 one-hot / multilabel
    image_adds: Optional[np.ndarray] = None

    def __len__(self):
        return len(self.text)


def _ids_to_num(ids: np.ndarray, task_name: Optional[str]) -> np.ndarray:
    """Numeric data_id used in prediction CSVs (reference datasets.py:16-21
    per-task id munging; generic tasks pass ids through)."""
    def one(x):
        try:
            if task_name == "poi":
                return float(str(x).split("_")[0])
            if task_name in ("polid", "poladv"):
                return float(str(x)[2:])
            if task_name == "fig":
                return float(str(x).split(".")[0])
            return float(x)
        except (ValueError, TypeError):
            # Non-numeric ids: stable hash so CSVs still have an id column.
            return float(abs(hash(str(x))) % 10**12)

    return np.asarray([one(x) for x in ids], dtype=np.int64)


def prepare_data(
    data,
    num_labels: int,
    testing: bool = False,
    nsamples: int = -1,
    compute_class_weights: bool = True,
    random_labels: bool = False,
    load_image_adds: bool = False,
    vectorize: bool = True,
    multilabel: bool = False,
    task_name: Optional[str] = None,
    rng: Optional[np.random.RandomState] = None,
):
    """Pandas dataframe -> (train, val, test) SplitArrays + class weights.

    Mirrors reference ``prepare_data`` (utils.py:133-200): 200-row testing
    subsample before splitting, nsamples train cap, one-hot vectorization,
    balanced class weights.
    """
    rng = rng or np.random.RandomState(0)
    if testing:
        data = data.sample(min(200, len(data)), random_state=rng)

    cols = ["tweet_id", "text", "label"] + (["image_adds"] if load_image_adds else [])
    train = data[data.split == "train"][cols]
    if nsamples > 0:
        train = train.sample(min(nsamples, len(train)), random_state=rng)
    val = data[data.split == "val"][cols]
    test = data[data.split == "test"][cols]

    def labels_of(df):
        y = df.label.values
        if multilabel:
            return np.asarray([eval(x) if isinstance(x, str) else x for x in y], dtype=np.float32)
        if not vectorize:
            return np.asarray(y)
        if random_labels:
            return vectorize_labels_random(len(y), num_labels, rng)
        return vectorize_labels(y, num_labels)

    splits = {}
    for name, df in (("train", train), ("val", val), ("test", test)):
        splits[name] = SplitArrays(
            ids=df.tweet_id.values,
            ids_num=_ids_to_num(df.tweet_id.values, task_name),
            text=df.text.values,
            labels=labels_of(df),
            image_adds=(df.image_adds.values if load_image_adds else None),
        )

    if compute_class_weights:
        if multilabel:
            class_weights = multilabel_pos_weights(splits["train"].labels)
        else:
            class_weights = balanced_class_weights(
                train.label.values.astype(np.int64), num_labels
            )
    else:
        class_weights = None

    return splits["train"], splits["val"], splits["test"], class_weights


def prepare_text_data(
    tdata_path: str,
    num_labels: int = 2,
    testing: bool = False,
    task_name: Optional[str] = None,
    rng: Optional[np.random.RandomState] = None,
) -> SplitArrays:
    """Text-only MIC eval set (reference utils.py:203-217)."""
    import pandas as pd

    rng = rng or np.random.RandomState(0)
    data_key = pd.read_csv(tdata_path)
    data = data_key[["id", "text", "label"]].rename(columns={"id": "tweet_id"})
    if testing:
        data = data.sample(min(100, len(data)), random_state=rng)
    labels = vectorize_labels(data.label.values, num_labels)
    return SplitArrays(
        ids=data.tweet_id.values,
        ids_num=_ids_to_num(data.tweet_id.values, task_name),
        text=data.text.values,
        labels=labels,
    )
