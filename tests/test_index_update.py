"""Incremental index update + compaction (SURVEY §7 index story)."""

import os

import numpy as np
import pytest
from PIL import Image

from mmrs_tpu.index.gallery import (
    GalleryIndex,
    build_index,
    compact_index,
    update_index,
)
from mmrs_tpu.io.dataset import FolderDataset


def _fake_encode(pixels):
    # deterministic per-image "embedding": channel means + noise-free pad
    m = pixels.reshape(pixels.shape[0], -1, 3).mean(axis=1) / 255.0
    out = np.concatenate([m, np.ones((len(m), 5))], axis=1)
    return out / np.linalg.norm(out, axis=1, keepdims=True)


def _add_images(root, cls, color, n, start=0):
    os.makedirs(os.path.join(root, cls), exist_ok=True)
    for i in range(start, start + n):
        arr = np.full((32, 32, 3), color, np.uint8)
        arr[0, 0] = (i % 255, 0, 0)   # unique-ish pixel per file
        Image.fromarray(arr).save(os.path.join(root, cls, f"{cls}{i}.jpg"))


@pytest.fixture()
def index_dir(tmp_path):
    root = str(tmp_path / "data")
    out = str(tmp_path / "idx")
    _add_images(root, "red", (200, 30, 30), 5)
    _add_images(root, "blue", (30, 30, 200), 5)
    build_index(FolderDataset.from_root(root), _fake_encode, out,
                batch_size=4, shard_rows=4)
    return root, out


def test_update_appends_only_new(index_dir):
    root, out = index_dir
    before = GalleryIndex.load(out, mmap=False)
    assert len(before) == 10
    _add_images(root, "red", (200, 30, 30), 3, start=5)
    after = update_index(FolderDataset.from_root(root), _fake_encode, out,
                         batch_size=4, shard_rows=4)
    assert len(after) == 13
    # old rows untouched, in order
    assert after.paths[:10] == before.paths
    np.testing.assert_array_equal(np.asarray(after.embeddings)[:10],
                                  np.asarray(before.embeddings))
    # idempotent: nothing new -> no change
    again = update_index(FolderDataset.from_root(root), _fake_encode, out)
    assert len(again) == 13


def test_compact_drops_missing_and_predicate(index_dir):
    root, out = index_dir
    idx = GalleryIndex.load(out, mmap=False)
    victim = idx.paths[2]
    os.unlink(victim)                          # governance deleted a file
    after = compact_index(out)
    assert len(after) == 9 and victim not in after.paths
    # embeddings still aligned with paths
    np.testing.assert_array_equal(
        np.asarray(after.embeddings)[after.paths.index(idx.paths[0])],
        np.asarray(idx.embeddings)[0])

    n_red = sum(c == "red" for c, p in zip(after.classes, after.paths))
    dropped = compact_index(out, keep=lambda p, c: c != "blue")
    assert len(dropped) == n_red
    assert all(c == "red" for c in dropped.classes)
    # engine still works over the compacted index
    from mmrs_tpu.search.engine import SearchEngine

    eng = SearchEngine(GalleryIndex.load(out))
    hits = eng.query_vectors(np.asarray(dropped.embeddings)[:1], top_k=2)
    assert hits[0][0].path == dropped.paths[0]


def test_update_after_compact_never_overwrites_live_shard(index_dir):
    """Appending after a compaction must mint FRESH shard ids — the old
    positional len(shards) id collided with a surviving shard's file and
    silently destroyed its rows (review repro)."""
    root, out = index_dir
    # drop the first class entirely -> shard ids no longer match positions
    compact_index(out, keep=lambda p, c: c != "blue", drop_missing=False)
    before = GalleryIndex.load(out, mmap=False)
    _add_images(root, "green", (30, 200, 30), 4)
    update_index(FolderDataset.from_root(root), _fake_encode, out)
    after = GalleryIndex.load(out, mmap=False)
    # update re-adds the on-disk blue images (no longer indexed)
    # plus the new green ones
    assert len(after.paths) == len(before.paths) + 4 + 5
    # every pre-compaction row survived, bit-exact
    pos = {p: i for i, p in enumerate(after.paths)}
    for i, p in enumerate(before.paths):
        np.testing.assert_array_equal(after.embeddings[pos[p]],
                                      before.embeddings[i])
    # and no duplicate shard files in the manifest
    import json

    with open(os.path.join(out, "manifest.json")) as f:
        names = [s["data"] for s in json.load(f)["shards"]]
    assert len(names) == len(set(names))


def test_compact_shrinks_ivf_sidecar(index_dir, monkeypatch):
    """`mmrs index compact` keeps the cached ANN sidecar in step: after
    governance deletions the sidecar shrinks in place (saved centroids,
    no k-means) and the next engine start LOADS it instead of
    retraining."""
    import jax.numpy as jnp

    import mmrs_tpu.index.ivf as ivf_mod
    from mmrs_tpu.config import SearchConfig
    from mmrs_tpu.search.engine import SearchEngine

    root, out = index_dir
    cfg = SearchConfig(ann="ivf", ann_clusters=4, ann_nprobe=4,
                       ann_train_iters=2)
    # first engine start trains + caches the sidecar under the index dir
    SearchEngine(GalleryIndex.load(out), cfg, device_dtype=jnp.float32)
    meta = ivf_mod.sidecar_meta(os.path.join(out, "ivf"))
    assert meta is not None and meta["n_total"] == 10

    idx = compact_index(out, keep=lambda p, c: c != "blue",
                        drop_missing=False)
    assert len(idx) == 5
    meta = ivf_mod.sidecar_meta(os.path.join(out, "ivf"))
    assert meta["n_total"] == 5   # shrunk alongside the shards

    def boom(*a, **k):
        raise AssertionError("compacted sidecar must load, not retrain")

    monkeypatch.setattr(ivf_mod, "train_centroids", boom)
    eng = SearchEngine(GalleryIndex.load(out), cfg,
                       device_dtype=jnp.float32)
    assert eng.ivf.n_total == 5
    # _fake_encode gives same-class rows near-identical embeddings, so
    # assert on the class (top-1 may tie within "red"), not the path
    hits = eng.query_vectors(
        jnp.asarray(np.asarray(idx.embeddings)[[3]]), top_k=1)
    assert hits[0][0].cls == "red" and hits[0][0].score > 0.99


def test_compact_skips_stale_sidecar(index_dir, monkeypatch, caplog):
    """A sidecar whose fingerprint does NOT match the pre-compaction
    gallery (e.g. the gallery was re-embedded in place at the same row
    count while ivf/ was left behind) must not be renumbered — its
    cluster assignments belong to the old embedding space. compact must
    skip the shrink and leave the warn-and-retrain path to the next
    engine start (ADVICE r4 medium)."""
    import jax.numpy as jnp

    import mmrs_tpu.index.ivf as ivf_mod
    from mmrs_tpu.config import SearchConfig
    from mmrs_tpu.search.engine import SearchEngine

    root, out = index_dir
    cfg = SearchConfig(ann="ivf", ann_clusters=4, ann_nprobe=4,
                       ann_train_iters=2)
    SearchEngine(GalleryIndex.load(out), cfg, device_dtype=jnp.float32)
    side = os.path.join(out, "ivf")
    meta0 = ivf_mod.sidecar_meta(side)
    assert meta0["n_total"] == 10 and meta0.get("fingerprint")

    # simulate an in-place re-embed at the SAME row count: rewrite every
    # shard's rows with different values, leaving the sidecar behind
    import json

    with open(os.path.join(out, "manifest.json")) as f:
        for s in json.load(f)["shards"]:
            p = os.path.join(out, s["data"])
            np.save(p, -np.asarray(np.load(p)))   # .npy save keeps name
    assert ivf_mod.sidecar_meta(side)["fingerprint"] == meta0["fingerprint"]

    idx = compact_index(out, keep=lambda p, c: c != "blue",
                        drop_missing=False)
    assert len(idx) == 5
    # sidecar untouched (NOT shrunk/restamped) — stale as it should be
    meta1 = ivf_mod.sidecar_meta(side)
    assert meta1["n_total"] == 10
    assert meta1["fingerprint"] == meta0["fingerprint"]
    # next engine start detects the mismatch and retrains cleanly
    calls = {"n": 0}
    real = ivf_mod.train_centroids

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(ivf_mod, "train_centroids", counting)
    eng = SearchEngine(GalleryIndex.load(out), cfg,
                       device_dtype=jnp.float32)
    assert calls["n"] == 1 and eng.ivf.n_total == 5


def test_compact_to_zero_rows_is_soft(index_dir):
    """Deleting EVERY row leaves nothing to index: the sidecar shrink
    must degrade to warn-and-retrain, not crash with IndexError
    (ADVICE r4 low)."""
    import jax.numpy as jnp

    from mmrs_tpu.config import SearchConfig
    from mmrs_tpu.search.engine import SearchEngine

    root, out = index_dir
    cfg = SearchConfig(ann="ivf", ann_clusters=4, ann_nprobe=4,
                       ann_train_iters=2)
    SearchEngine(GalleryIndex.load(out), cfg, device_dtype=jnp.float32)
    idx = compact_index(out, keep=lambda p, c: False, drop_missing=False)
    assert len(idx) == 0
