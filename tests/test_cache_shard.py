"""Multi-host image-cache sharding (data/cache.py): each process eagerly
decodes only its round-robin slice; rows owned by other shards fill lazily
on first gather and persist."""

import os

import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.data.cache import ImageCache

from fixtures import make_images


def _make_imgs(tmp_path, n=8, size=16):
    d = tmp_path / "imgs"
    ids = [str(i) for i in range(1, n + 1)]
    rng = np.random.RandomState(7)
    make_images(str(d), ids, size=size, rng=rng)
    return ids, os.path.join(str(d), "{}.jpg")


def test_sharded_build_then_lazy_fill(tmp_path):
    ids, img_fmt = _make_imgs(tmp_path)
    full = ImageCache(str(tmp_path / "full"), size=16).build(ids, img_fmt)

    shard = ImageCache(str(tmp_path / "s0"), size=16).build(
        ids, img_fmt, process_shard=(0, 2))
    # eager slice: ids at even positions decoded, odd positions invalid
    assert shard.valid.sum() == 4
    assert shard.valid[shard.rows([ids[0]])[0]]
    assert not shard.valid[shard.rows([ids[1]])[0]]

    # gather of an un-owned id decodes on miss and matches the full build
    got = shard.gather([ids[1], ids[2]])
    np.testing.assert_array_equal(got, full.gather([ids[1], ids[2]]))
    assert shard.valid[shard.rows([ids[1]])[0]]

    # ... and persists: a fresh handle over the same dir sees the filled row
    reopened = ImageCache(str(tmp_path / "s0"), size=16)
    assert reopened.valid[reopened.rows([ids[1]])[0]]
    np.testing.assert_array_equal(reopened.gather([ids[1]]),
                                  full.gather([ids[1]]))


def test_sharded_union_covers_all(tmp_path):
    ids, img_fmt = _make_imgs(tmp_path)
    s0 = ImageCache(str(tmp_path / "a"), size=16).build(
        ids, img_fmt, process_shard=(0, 2))
    s1 = ImageCache(str(tmp_path / "b"), size=16).build(
        ids, img_fmt, process_shard=(1, 2))
    covered = np.zeros(len(ids), bool)
    for cache in (s0, s1):
        covered |= cache.valid[cache.rows(ids)]
    assert covered.all()


def test_unsharded_build_unchanged(tmp_path):
    ids, img_fmt = _make_imgs(tmp_path)
    cache = ImageCache(str(tmp_path / "c"), size=16).build(ids, img_fmt)
    assert cache.valid.all()
    assert cache.gather(ids).shape == (8, 16, 16, 3)


def test_shared_dir_sharded_build_refused(tmp_path):
    """Two different process shards building in ONE directory must be refused
    (ADVICE r2: last-writer-wins races can serve silently blank images)."""
    import pytest

    ids, img_fmt = _make_imgs(tmp_path)
    shared = str(tmp_path / "shared")
    ImageCache(shared, size=16).build(ids, img_fmt, process_shard=(0, 2))
    with pytest.raises(RuntimeError, match="per-host cache directory"):
        ImageCache(shared, size=16).build(ids, img_fmt, process_shard=(1, 2))
    # same shard rebuilding in its own dir stays allowed (resumable)
    c = ImageCache(shared, size=16).build(ids, img_fmt, process_shard=(0, 2))
    assert c.valid.sum() == 4
