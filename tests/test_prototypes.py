"""Prototype strategies: shape/normalization contracts and semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

from mmrs_tpu.ops.kmeans import kmeans
from mmrs_tpu.search import prototypes


def _rand_feats(n=16, d=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_mean_prototype_normalized():
    feats = _rand_feats()
    p = np.asarray(prototypes.mean_prototype(jnp.asarray(feats)))
    assert np.linalg.norm(p) == pytest.approx(1.0, abs=1e-5)
    expected = feats.mean(0)
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(p, expected, atol=1e-5)


def test_image_text_prototype_mixes():
    feats = _rand_feats(seed=1)
    text = _rand_feats(1, seed=2)[0]
    p = np.asarray(prototypes.image_text_prototype(jnp.asarray(feats), jnp.asarray(text)))
    v = feats.mean(0); v /= np.linalg.norm(v)
    expected = (v + text) / 2
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(p, expected, atol=1e-5)


def test_robust_mean_drops_outlier():
    # 20 tight shots along e0 + 1 orthogonal outlier along e1. The outlier
    # pulls the plain mean's direction sideways; the robust mean (95th-pct
    # cosine-distance filter, code/search_image.py:295-318) should drop it
    # and stay closer to the true direction.
    rng = np.random.default_rng(3)
    d = 32
    center = np.eye(d)[0]
    tight = center[None, :] + 0.01 * rng.normal(size=(20, d))
    outlier = np.eye(d)[1][None, :]
    feats = np.concatenate([tight, outlier]).astype(np.float32)
    robust = np.asarray(prototypes.robust_mean_prototype(jnp.asarray(feats)))
    plain = np.asarray(prototypes.mean_prototype(jnp.asarray(feats)))
    assert robust @ center > plain @ center
    assert abs(robust @ np.eye(d)[1]) < 0.01


def test_cluster_prototype_majority_and_balance():
    rng = np.random.default_rng(4)
    d = 16
    a = np.eye(d)[0]; b = np.eye(d)[1]
    # 9 shots near a, 1 near b -> minority 10% < 20% -> majority centroid (~a)
    feats = np.concatenate([
        a[None] + 0.01 * rng.normal(size=(9, d)),
        b[None] + 0.01 * rng.normal(size=(1, d)),
    ]).astype(np.float32)
    p = np.asarray(prototypes.cluster_prototype(jnp.asarray(feats)))
    assert p @ a > 0.95
    # 6 vs 4 -> minority 40% >= 20% -> plain mean
    feats2 = np.concatenate([
        a[None] + 0.01 * rng.normal(size=(6, d)),
        b[None] + 0.01 * rng.normal(size=(4, d)),
    ]).astype(np.float32)
    p2 = np.asarray(prototypes.cluster_prototype(jnp.asarray(feats2)))
    mean = feats2.mean(0); mean /= np.linalg.norm(mean)
    np.testing.assert_allclose(p2, mean, atol=1e-4)


def test_kmeans_separates_two_blobs():
    rng = np.random.default_rng(5)
    a = rng.normal(loc=0.0, scale=0.1, size=(50, 8)) + np.array([3.0] + [0] * 7)
    b = rng.normal(loc=0.0, scale=0.1, size=(50, 8)) - np.array([3.0] + [0] * 7)
    x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    cents, assign = kmeans(x, k=2)
    assign = np.asarray(assign)
    # All of blob a in one cluster, all of blob b in the other
    assert len(set(assign[:50])) == 1
    assert len(set(assign[50:])) == 1
    assert assign[0] != assign[50]


@pytest.mark.slow
def test_cluster_scan_prototype():
    rng = np.random.default_rng(6)
    d = 16
    a, b, c = np.eye(d)[0], np.eye(d)[1], np.eye(d)[2]
    # 3 clear blobs -> silhouette should pick k=3; majority = blob a (6 pts)
    feats = np.concatenate([
        a[None] + 0.01 * rng.normal(size=(6, d)),
        b[None] + 0.01 * rng.normal(size=(3, d)),
        c[None] + 0.01 * rng.normal(size=(3, d)),
    ]).astype(np.float32)
    p = np.asarray(prototypes.cluster_scan_prototype(jnp.asarray(feats)))
    # minority fraction 50% >= 20% -> plain-mean fallback per balance rule;
    # either way output is unit-norm and real
    assert np.isfinite(p).all()
    assert np.linalg.norm(p) == pytest.approx(1.0, abs=1e-4)
    # single dominant blob (k_range can't beat k=2 with 9/1 split)
    feats2 = np.concatenate([
        a[None] + 0.01 * rng.normal(size=(9, d)),
        b[None] + 0.01 * rng.normal(size=(1, d)),
    ]).astype(np.float32)
    p2 = np.asarray(prototypes.cluster_scan_prototype(jnp.asarray(feats2)))
    assert p2 @ a > 0.9


def test_build_prototype_dispatch():
    feats = jnp.asarray(_rand_feats())
    with pytest.raises(ValueError):
        prototypes.build_prototype(feats, strategy="nope")
    with pytest.raises(ValueError):
        prototypes.build_prototype(feats, strategy="image_text_mean")


def test_silhouette_ignores_empty_clusters():
    """An empty cluster's mean-distance column must read +inf, not 0 —
    the 0 forced b=0 and s=-1 for every point (sklearn errors on empty
    clusters; we exclude them so the k-scan sees the true score)."""
    import jax.numpy as jnp
    from mmrs_tpu.ops.kmeans import silhouette_score

    rng = np.random.default_rng(0)
    a = rng.normal((0, 0), 0.05, (8, 2))
    b = rng.normal((5, 5), 0.05, (8, 2))
    x = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    assign = jnp.asarray([0] * 8 + [1] * 8)
    s2 = float(silhouette_score(x, assign, 2))
    # same assignment under k=3: cluster 2 is EMPTY; score must match
    s3 = float(silhouette_score(x, assign, 3))
    assert s2 > 0.9                      # well-separated blobs
    assert abs(s3 - s2) < 1e-6
