"""Dummy dataset fixtures (the reference bundles 1-row data_key CSVs + a few
jpgs as its only fixtures — SURVEY.md section 4; ours are generated)."""

import os

import numpy as np
import pandas as pd


def make_images(dir_path, ids, size=32, rng=None):
    from PIL import Image

    rng = rng or np.random.RandomState(0)
    os.makedirs(dir_path, exist_ok=True)
    for i in ids:
        arr = rng.randint(0, 255, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(dir_path, f"{i}.jpg"))


def make_task_fixture(root, task=3, n=24, num_labels=3, rng=None):
    """data_key CSV + images laid out like the reference's data dir."""
    rng = rng or np.random.RandomState(0)
    root = str(root)
    os.makedirs(root, exist_ok=True)
    ids = list(range(1, n + 1))
    splits = ["train"] * (n - 8) + ["val"] * 4 + ["test"] * 4
    texts = [f"tweet number {i} with @user and a link https://t.co/x{i}" for i in ids]
    df = pd.DataFrame({
        "tweet_id": ids,
        "text": texts,
        "label": rng.randint(0, num_labels, n),
        "split": splits,
    })
    if task == 3:
        csv_path = os.path.join(root, "data_key_mvsa.csv")
        img_dir = os.path.join(root, "MVSA-Single", "data")
    elif task == 6:
        csv_path = os.path.join(root, "data_key_msd.csv")
        img_dir = os.path.join(root, "MSD", "dataset_image")
    else:
        raise ValueError(task)
    df.to_csv(csv_path, index=False)
    make_images(img_dir, ids, rng=rng)
    img_fmt = os.path.join(img_dir, "{}.jpg")
    return csv_path, img_fmt, df


def patch_task(monkeypatch, C, task, csv_path, img_fmt, results_root):
    monkeypatch.setitem(C.PATH, task, csv_path)
    monkeypatch.setitem(C.IMG_FMT, task, img_fmt)
    for attr in ("results_dir_txt", "results_dir_img", "results_dir_mm_late",
                 "results_dir_mm_early"):
        monkeypatch.setattr(C, attr, str(results_root) + f"/{attr}/")
    monkeypatch.setattr(C, "DATA_PATH", str(results_root) + "/data/")
