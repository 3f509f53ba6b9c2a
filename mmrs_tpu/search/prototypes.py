"""K-shot prototype construction strategies.

The reference builds a per-class "reference vector" from k example images
(optionally mixed with the class text embedding) in four ways
(code/search_image.py:119-318); queries then score the gallery against it.
All four are reproduced as small jitted JAX ops:

  - mean:            L2-normalized mean of the shot embeddings.
  - image_text_mean: (mean image embedding + text embedding) / 2
                     (`get_image_text_features`, code/search_image.py:119-140;
                     the `(v+t)/2` mix at :387).
  - cluster:         k-means (k=2) majority-cluster centroid with the 20%%
                     balance rule (`get_cluster_features`,
                     code/search_image.py:185-232): if the minority cluster
                     holds >= 20%% of the shots the split is considered
                     genuine ambiguity and the plain mean is used instead.
  - robust_mean:     drop the top-5%% cosine-distance outliers then re-mean
                     (`outlier_filter`, code/search_image.py:295-318).

Every strategy returns an L2-normalized [D] vector.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from mmrs_tpu.ops.kmeans import kmeans
from mmrs_tpu.ops.normalize import l2_normalize


@jax.jit
def mean_prototype(feats: jnp.ndarray) -> jnp.ndarray:
    """feats [K, D] -> normalized mean [D]."""
    return l2_normalize(jnp.mean(feats.astype(jnp.float32), axis=0))


@jax.jit
def image_text_prototype(feats: jnp.ndarray, text_embed: jnp.ndarray) -> jnp.ndarray:
    """(normalized mean image embed + normalized text embed) / 2, renormalized."""
    v = l2_normalize(jnp.mean(feats.astype(jnp.float32), axis=0))
    t = l2_normalize(text_embed.astype(jnp.float32))
    return l2_normalize((v + t) / 2.0)


@partial(jax.jit, static_argnames=("k",))
def cluster_prototype(
    feats: jnp.ndarray,
    k: int = 2,
    balance_ratio: float = 0.2,
) -> jnp.ndarray:
    """Majority-cluster centroid with the reference's 20% balance rule."""
    feats32 = feats.astype(jnp.float32)
    cents, assign = kmeans(feats32, k=k)
    counts = jnp.sum(jax.nn.one_hot(assign, k, dtype=jnp.float32), axis=0)
    major = jnp.argmax(counts)
    minor_frac = 1.0 - counts[major] / feats32.shape[0]
    plain = jnp.mean(feats32, axis=0)
    proto = jnp.where(minor_frac >= balance_ratio, plain, cents[major])
    return l2_normalize(proto)


@partial(jax.jit, static_argnames=("percentile",))
def robust_mean_prototype(
    feats: jnp.ndarray,
    percentile: float = 95.0,
) -> jnp.ndarray:
    """Outlier-filtered mean: drop shots whose cosine distance to the mean is
    above the given percentile, then re-mean (code/search_image.py:295-318)."""
    feats32 = l2_normalize(feats.astype(jnp.float32), axis=-1)
    center = l2_normalize(jnp.mean(feats32, axis=0))
    dist = 1.0 - feats32 @ center  # cosine distance
    cutoff = jnp.percentile(dist, percentile)
    keep = (dist <= cutoff).astype(jnp.float32)
    total = jnp.maximum(jnp.sum(keep), 1.0)
    robust = jnp.sum(feats32 * keep[:, None], axis=0) / total
    return l2_normalize(robust)


def cluster_scan_prototype(
    feats: jnp.ndarray,
    k_range=(2, 3, 4),
    balance_ratio: float = 0.2,
) -> jnp.ndarray:
    """Silhouette-scanned cluster prototype (`get_text_cluster_features`,
    code/search_image.py:234-293): try k in k_range, keep the clustering
    with the best mean silhouette, then take the majority-cluster centroid
    with the same 20% balance rule."""
    from mmrs_tpu.ops.kmeans import silhouette_score

    feats32 = feats.astype(jnp.float32)
    best_k, best_score = None, -jnp.inf
    for k in k_range:
        if feats32.shape[0] <= k:
            continue
        _, assign = kmeans(feats32, k=k)
        score = float(silhouette_score(feats32, assign, k))
        if score > best_score:
            best_k, best_score = k, score
    if best_k is None:
        return mean_prototype(feats32)
    return cluster_prototype(feats32, k=best_k, balance_ratio=balance_ratio)


def build_prototype(
    feats: jnp.ndarray,
    strategy: str = "mean",
    text_embed: Optional[jnp.ndarray] = None,
    cluster_k: int = 2,
    balance_ratio: float = 0.2,
    outlier_percentile: float = 95.0,
) -> jnp.ndarray:
    """Dispatch over the four reference strategies by name."""
    if strategy == "mean":
        return mean_prototype(feats)
    if strategy == "image_text_mean":
        if text_embed is None:
            raise ValueError("image_text_mean requires text_embed")
        return image_text_prototype(feats, text_embed)
    if strategy == "cluster":
        return cluster_prototype(feats, k=cluster_k, balance_ratio=balance_ratio)
    if strategy == "cluster_scan":
        return cluster_scan_prototype(feats, balance_ratio=balance_ratio)
    if strategy == "robust_mean":
        return robust_mean_prototype(feats, percentile=outlier_percentile)
    raise ValueError(f"unknown prototype strategy {strategy!r}")
