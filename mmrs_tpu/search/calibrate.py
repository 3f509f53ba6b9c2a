"""F1-optimal threshold calibration — vectorized on device.

The reference's "decision layer": per-class similarity-threshold sweeps
maximizing F1. Two grid styles exist in the reference and both are kept:

  - `find_thresholds` (code/search_image.py:58-103): 200-point linspace
    between the min and max observed similarity.
  - `evaluate_thresholds` (CLIP/lab3.py:39-65, CLIP/union_dataset.py:46-61):
    fixed `np.arange(0, 1.001, 0.001)` grid on raw cosine.

The reference evaluates each threshold in a Python loop over all samples
(O(T*N) interpreted); here the whole sweep is ONE broadcasted comparison on
device: sims [N] x thresholds [T] -> boolean [T, N] -> per-threshold TP/FP/FN
reductions. Large N is chunked to bound memory.

Divide-by-zero: the reference's `eval_threshold` (code/search_image.py:48-54)
NaNs on empty buckets while CLIP/lab1.py:114-117 guards; we use guarded math
(SURVEY.md §4 directive).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmrs_tpu.config import CalibrationConfig


@dataclass
class SweepResult:
    thresholds: np.ndarray  # [T]
    precision: np.ndarray   # [T]
    recall: np.ndarray      # [T]
    f1: np.ndarray          # [T]
    best_threshold: float
    best_f1: float
    best_precision: float
    best_recall: float


@partial(jax.jit, static_argnames=("chunk",))
def _sweep_counts(
    sims: jnp.ndarray,        # [N] float
    positives: jnp.ndarray,   # [N] bool
    thresholds: jnp.ndarray,  # [T] float
    chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-threshold (tp, fp, fn) via chunked broadcast; f32 accumulation."""
    n = sims.shape[0]
    t = thresholds.shape[0]
    pad = (-n) % chunk
    sims_p = jnp.pad(sims, (0, pad))
    pos_p = jnp.pad(positives, (0, pad))
    valid = jnp.pad(jnp.ones((n,), jnp.bool_), (0, pad))
    num_chunks = sims_p.shape[0] // chunk

    sims_c = sims_p.reshape(num_chunks, chunk)
    pos_c = pos_p.reshape(num_chunks, chunk)
    val_c = valid.reshape(num_chunks, chunk)

    def body(carry, xs):
        tp, fp, fn = carry
        s, p, v = xs
        pred = (s[None, :] >= thresholds[:, None]) & v[None, :]  # [T, chunk]
        pv = p[None, :] & v[None, :]
        tp = tp + jnp.sum(pred & pv, axis=1)
        fp = fp + jnp.sum(pred & ~p[None, :] & v[None, :], axis=1)
        fn = fn + jnp.sum(~pred & pv, axis=1)
        return (tp, fp, fn), None

    zeros = jnp.zeros((t,), jnp.int32)
    (tp, fp, fn), _ = jax.lax.scan(body, (zeros, zeros, zeros), (sims_c, pos_c, val_c))
    return tp, fp, fn


def sweep(
    sims: np.ndarray,
    positives: np.ndarray,
    thresholds: Optional[np.ndarray] = None,
    config: Optional[CalibrationConfig] = None,
) -> SweepResult:
    """Full threshold sweep; returns per-threshold P/R/F1 and the F1-argmax.

    `sims`: similarity of each sample to the query/prototype.
    `positives`: boolean ground-truth per sample.
    """
    cfg = config or CalibrationConfig()
    sims = np.asarray(sims, dtype=np.float32)
    positives = np.asarray(positives, dtype=bool)
    if thresholds is None:
        thresholds = grid_thresholds(cfg, float(sims.min()),
                                     float(sims.max()))

    tp, fp, fn = _sweep_counts(
        jnp.asarray(sims), jnp.asarray(positives), jnp.asarray(thresholds)
    )
    return result_from_counts(thresholds, tp, fp, fn)


def grid_thresholds(cfg, lo: float, hi: float,
                    scale: float = 1.0) -> np.ndarray:
    """Threshold grid for a sweep (single source of truth — engine.
    sweep_class shares it). linspace spans the observed [lo, hi];
    arange is the reference's ABSOLUTE raw-cosine 0..1 grid
    (CLIP/lab3.py), multiplied by `scale` when the sims being swept are
    logit-scaled (without the scale a 0..1 grid against ~[-100, 100]
    sims degenerates to predict-everything-positive)."""
    if cfg.mode == "linspace":
        return np.linspace(lo, hi, cfg.num_points, dtype=np.float32)
    if cfg.mode == "arange":
        grid = np.arange(0.0, cfg.arange_stop, cfg.arange_step,
                         dtype=np.float32)
        return (grid * scale).astype(np.float32) if scale != 1.0 else grid
    raise ValueError(f"unknown calibration mode {cfg.mode!r}")


def result_from_counts(thresholds, tp, fp, fn) -> SweepResult:
    """Per-threshold (tp, fp, fn) counts -> guarded P/R/F1 + F1-argmax."""
    tp = np.asarray(tp, dtype=np.float64)
    fp = np.asarray(fp, dtype=np.float64)
    fn = np.asarray(fn, dtype=np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1), 0.0)
        recall = np.where(tp + fn > 0, tp / np.maximum(tp + fn, 1), 0.0)
        f1 = np.where(
            precision + recall > 0,
            2 * precision * recall / np.maximum(precision + recall, 1e-12),
            0.0,
        )

    best = int(np.argmax(f1))
    return SweepResult(
        thresholds=np.asarray(thresholds),
        precision=precision,
        recall=recall,
        f1=f1,
        best_threshold=float(thresholds[best]),
        best_f1=float(f1[best]),
        best_precision=float(precision[best]),
        best_recall=float(recall[best]),
    )


def find_thresholds(
    pos_sims: np.ndarray,
    neg_sims: np.ndarray,
    num_points: int = 200,
) -> SweepResult:
    """The `find_thresholds` contract (code/search_image.py:58-103):
    positive-set and negative-set similarities in, 200-point linspace over the
    pooled range, best-F1 threshold out."""
    pos_sims = np.asarray(pos_sims, dtype=np.float32)
    neg_sims = np.asarray(neg_sims, dtype=np.float32)
    sims = np.concatenate([pos_sims, neg_sims])
    positives = np.concatenate(
        [np.ones(len(pos_sims), bool), np.zeros(len(neg_sims), bool)]
    )
    lo, hi = float(sims.min()), float(sims.max())
    thresholds = np.linspace(lo, hi, num_points, dtype=np.float32)
    return sweep(sims, positives, thresholds)


def find_thresholds_overlap(
    pos_sims: np.ndarray,
    neg_sims: np.ndarray,
    points_per_unit: float = 10.0,
) -> SweepResult:
    """The main_custom.py variant (code/main_custom.py:47-50): thresholds
    span only the OVERLAP region [max(min_pos, min_neg), min(max_pos,
    max_neg)] with a density-scaled point count of int(range * 10) —
    meant for logit-scaled (0..100) similarities."""
    pos_sims = np.asarray(pos_sims, dtype=np.float32)
    neg_sims = np.asarray(neg_sims, dtype=np.float32)
    lo = max(float(pos_sims.min()), float(neg_sims.min()))
    hi = min(float(pos_sims.max()), float(neg_sims.max()))
    num = max(int((hi - lo) * points_per_unit), 2)
    sims = np.concatenate([pos_sims, neg_sims])
    positives = np.concatenate(
        [np.ones(len(pos_sims), bool), np.zeros(len(neg_sims), bool)]
    )
    thresholds = np.linspace(lo, hi, num, dtype=np.float32)
    return sweep(sims, positives, thresholds)


def plot_f1_curve(result: SweepResult, target_class: str, out_path: str) -> str:
    """The reference's F1-vs-threshold curve artifact
    (code/search_image.py:87-100, result_{class}_all.jpg)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(9, 9))
    plt.plot(result.thresholds, result.f1)
    plt.scatter(x=result.best_threshold, y=result.best_f1)
    plt.annotate(
        f"threshold:{result.best_threshold:.5f}/f1:{result.best_f1:.5f}",
        xy=(result.best_threshold, result.best_f1),
    )
    plt.xlabel("threshold")
    plt.ylabel("f1_score")
    plt.title(
        f"{target_class}_precision:{result.best_precision:.4f}"
        f"_recall:{result.best_recall:.4f}"
    )
    plt.savefig(out_path)
    plt.close()
    return out_path


def evaluate_thresholds(
    pos_sims: np.ndarray,
    neg_sims: np.ndarray,
    stop: float = 1.001,
    step: float = 0.001,
) -> SweepResult:
    """The `evaluate_thresholds` contract (CLIP/lab3.py:39-65): fixed
    arange(0, 1.001, 0.001) raw-cosine grid."""
    pos_sims = np.asarray(pos_sims, dtype=np.float32)
    neg_sims = np.asarray(neg_sims, dtype=np.float32)
    sims = np.concatenate([pos_sims, neg_sims])
    positives = np.concatenate(
        [np.ones(len(pos_sims), bool), np.zeros(len(neg_sims), bool)]
    )
    thresholds = np.arange(0.0, stop, step, dtype=np.float32)
    return sweep(sims, positives, thresholds)
