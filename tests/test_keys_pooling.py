"""Dataset-key builders + pooling helpers."""

import os

import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.data import keys as K
from socialmedia_textimage_classification_auxlosses_tpu.utils import pooling as P


def test_prepare_data_key_mvsa(tmp_path):
    raw = tmp_path / "MVSA-Single" / "data"
    os.makedirs(raw)
    lines = []
    for i in range(20):
        with open(raw / f"{i}.txt", "w", encoding="ISO-8859-1") as f:
            f.write(f"tweet number {i}\n")
        lines.append(f"{i},{i % 3},0,0\n")
    with open(tmp_path / "MVSA-Single" / "valid_pairlist.txt", "w") as f:
        f.writelines(lines)
    out = tmp_path / "data_key_mvsa.csv"
    df = K.prepare_data_key_mvsa(str(tmp_path), str(out), seed=0)
    assert os.path.isfile(out)
    assert set(df.columns) == {"tweet_id", "text", "label", "split"}
    counts = df.split.value_counts()
    assert counts["train"] == 16 and counts["val"] == 2 and counts["test"] == 2


def test_prepare_data_key_mhp(tmp_path):
    for split, fname in (("Train", "train"), ("Validation", "dev"), ("Test", "test")):
        d = tmp_path / "MHP" / "Data" / split
        os.makedirs(d)
        pd.DataFrame({
            "image_number": [f"{split}_{i}" for i in range(4)],
            "tweet_text": ["hello"] * 4,
            "img_text": ["ocr", np.nan, "x", np.nan],
            "Primary_numeric_gt": [0, 1, 2, 3],
        }).to_csv(d / f"dog_whistle_{fname}.csv", index=False)
    df = K.prepare_data_key_mhp(str(tmp_path))
    assert len(df) == 12
    # OCR text merged when present
    assert df.iloc[0].text == "helloocr"
    assert df.iloc[1].text == "hello"
    assert set(df.split) == {"train", "val", "test"}


def test_prepare_data_key_tir_comma_repair(tmp_path):
    raw = tmp_path / "textimage-data.csv"
    with open(raw, "w") as f:
        f.write("index,tweet_id,tweet,a,b,c,d,e,f\n")
        f.write("0,100,clean tweet,1,0,0,0,1,0\n")
        f.write("1,101,messy, tweet, with, commas,1,0,0,0,1,0\n")
    df = K.prepare_data_key_tir(str(raw), seed=0)
    assert len(df) == 2
    # ", ".join over csv fields that keep their leading spaces — the
    # reference produces the same double-spaced repair (text_processing.py:111)
    assert df[df.tweet_id == "101"].text.iloc[0] == "messy,  tweet,  with,  commas"
    assert "split" in df.columns


def test_masked_mean_max(rng):
    x = jnp.array(rng.randn(2, 5, 4), jnp.float32)
    mask = jnp.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], jnp.float32)
    mm = np.asarray(P.masked_mean(x, mask))
    ref0 = np.asarray(x)[0, :3].mean(axis=0)
    np.testing.assert_allclose(mm[0], ref0, atol=1e-6)
    mx = np.asarray(P.masked_max(x, mask))
    np.testing.assert_allclose(mx[0], np.asarray(x)[0, :3].max(axis=0), atol=1e-6)


def test_batch_cosine_similarity(rng):
    a = jnp.array(rng.randn(4, 8), jnp.float32)
    sim = np.asarray(P.batch_cosine_similarity(a, a))
    np.testing.assert_allclose(sim, np.ones(4), atol=1e-6)
