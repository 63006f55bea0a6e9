"""Offline dataset-key builders (reference
``preprocessing/text_processing.py:16-171``): convert raw dataset releases
into the unified ``data_key_*.csv`` contract (columns
``tweet_id,text,label,split``).

* MHP: merge tweet text + OCR image text, splits from the release's
  train/dev/test files (reference :16-54; sizes 3998/502/500).
* MVSA: read ``valid_pairlist.txt`` + per-id ``.txt`` files, random 80/10/10
  split (reference :57-93; sizes 3608/451/452).
* TIR: CSV repair for rows with embedded commas, random 80/10/10 or id-file
  split (reference :96-171; sizes 3576/447/448).
"""

from __future__ import annotations

import csv
import os
from typing import Optional

import numpy as np
import pandas as pd

from ..utils.logging import get_logger

logger = get_logger(__name__)


def _random_split(n: int, rng: np.random.RandomState):
    """80/10/10 split by index sampling (reference text_processing.py:77-88)."""
    order = rng.permutation(n)
    n_tr, n_dev = int(n * 0.8), int(n * 0.1)
    split = np.empty(n, dtype=object)
    split[order[:n_tr]] = "train"
    split[order[n_tr:n_tr + n_dev]] = "val"
    split[order[n_tr + n_dev:]] = "test"
    return split


def prepare_data_key_mhp(data_path: str, out_path: Optional[str] = None) -> pd.DataFrame:
    raw = os.path.join(data_path, "MHP", "Data", "{}", "dog_whistle_{}.csv")
    frames = []
    for split in ("train", "validation", "test"):
        fname = "dev" if split == "validation" else split
        df = pd.read_csv(raw.format(split.title(), fname), encoding="utf-8")
        text = []
        for _, row in df.iterrows():
            t = row["tweet_text"]
            ocr = row["img_text"]
            text.append(t + ocr if isinstance(ocr, str) else t)
        out = pd.DataFrame({
            "tweet_id": df["image_number"].astype(str),
            "text": text,
            "label": df["Primary_numeric_gt"].astype(int),
            "split": "val" if split == "validation" else split,
        })
        frames.append(out)
    data = pd.concat(frames, ignore_index=True)
    logger.info("MHP split counts: %s", data.split.value_counts().to_dict())
    if out_path:
        data.to_csv(out_path, index=False)
        logger.info("%s saved!", out_path)
    return data


def prepare_data_key_mvsa(data_path: str, out_path: Optional[str] = None,
                          seed: int = 0) -> pd.DataFrame:
    raw = os.path.join(data_path, "MVSA-Single", "data")
    pairlist = os.path.join(data_path, "MVSA-Single", "valid_pairlist.txt")
    rows = []
    with open(pairlist) as f:
        for line in f:
            file_id, label = line.strip().split(",")[:2]
            with open(os.path.join(raw, file_id + ".txt"),
                      encoding="ISO-8859-1") as tf:
                text = tf.readline().encode("utf-8").strip()
            rows.append({"tweet_id": file_id, "text": text, "label": int(label)})
    data = pd.DataFrame(rows)
    data["split"] = _random_split(len(data), np.random.RandomState(seed))
    logger.info("MVSA split counts: %s", data.split.value_counts().to_dict())
    if out_path:
        data.to_csv(out_path, index=False)
        logger.info("%s saved!", out_path)
    return data


def _read_tir_csv(raw_csv: str) -> pd.DataFrame:
    """The TIR release has rows where the tweet text contains unescaped
    commas; re-join the overflow columns (reference text_processing.py:96-116)."""
    rows = []
    with open(raw_csv) as f:
        reader = csv.reader(f, delimiter=",")
        headers = next(reader)
        for row in reader:
            if len(row) > len(headers):
                extra = len(row) - len(headers)
                row = row[:2] + [", ".join(row[2:2 + extra + 1])] + row[2 + extra + 1:]
            rows.append(row)
    data = pd.DataFrame(rows, columns=headers)
    return data.rename(columns={"tweet": "text"}).reset_index()


def prepare_data_key_tir(raw_csv: str, out_path: Optional[str] = None,
                         split_mode: str = "random",
                         split_files_prefix: Optional[str] = None,
                         seed: int = 0) -> pd.DataFrame:
    data = _read_tir_csv(raw_csv)
    if split_mode == "random":
        data["split"] = _random_split(len(data), np.random.RandomState(seed))
    else:
        # id-file split (reference text_processing.py:139-171)
        with open(f"{split_files_prefix}_train.txt") as f:
            train_ids = {x.strip() for x in f}
        with open(f"{split_files_prefix}_test.txt") as f:
            test_ids = {x.strip() for x in f}
        split, not_found = [], []
        for _, row in data.iterrows():
            tid = "T" + str(row["tweet_id"]).strip()
            if tid in train_ids:
                split.append("train")
            elif tid in test_ids:
                split.append("test")
            else:
                not_found.append(tid)
        if not_found:
            raise ValueError(f"{len(not_found)} ids not in split files")
        data["split"] = split
    logger.info("TIR split counts: %s", data.split.value_counts().to_dict())
    if out_path:
        data.to_csv(out_path, index=False)
        logger.info("%s saved!", out_path)
    return data
