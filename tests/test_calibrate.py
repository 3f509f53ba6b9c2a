"""Vectorized threshold sweep vs a literal numpy re-implementation of the
reference semantics (the O(T*N) loop it replaces)."""

import numpy as np
import pytest

from mmrs_tpu.search import calibrate


def _oracle(sims, positives, thresholds):
    """Literal per-threshold loop with guarded P/R/F1."""
    best = (-1.0, None, None, None)
    curves = []
    for t in thresholds:
        pred = sims >= t
        tp = np.sum(pred & positives)
        fp = np.sum(pred & ~positives)
        fn = np.sum(~pred & positives)
        p = tp / (tp + fp) if tp + fp > 0 else 0.0
        r = tp / (tp + fn) if tp + fn > 0 else 0.0
        f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
        curves.append((p, r, f1))
        if f1 > best[0]:
            best = (f1, t, p, r)
    return np.array(curves), best


def test_sweep_matches_oracle():
    rng = np.random.default_rng(42)
    pos = rng.normal(0.6, 0.15, 300).astype(np.float32)
    neg = rng.normal(0.3, 0.15, 700).astype(np.float32)
    sims = np.concatenate([pos, neg])
    positives = np.concatenate([np.ones(300, bool), np.zeros(700, bool)])
    thresholds = np.linspace(sims.min(), sims.max(), 200).astype(np.float32)

    res = calibrate.sweep(sims, positives, thresholds)
    curves, best = _oracle(sims, positives, thresholds)

    np.testing.assert_allclose(res.precision, curves[:, 0], atol=1e-6)
    np.testing.assert_allclose(res.recall, curves[:, 1], atol=1e-6)
    np.testing.assert_allclose(res.f1, curves[:, 2], atol=1e-6)
    assert res.best_f1 == pytest.approx(best[0], abs=1e-6)
    assert res.best_threshold == pytest.approx(best[1], abs=1e-6)


def test_find_thresholds_contract():
    """200-point linspace variant (code/search_image.py:58-103)."""
    pos = np.array([0.8, 0.85, 0.9], np.float32)
    neg = np.array([0.1, 0.2, 0.3], np.float32)
    res = calibrate.find_thresholds(pos, neg)
    assert len(res.thresholds) == 200
    assert res.best_f1 == pytest.approx(1.0)
    assert 0.3 < res.best_threshold <= 0.8


def test_evaluate_thresholds_contract():
    """arange(0, 1.001, 0.001) variant (CLIP/lab3.py:39-65)."""
    pos = np.array([0.8, 0.85, 0.9], np.float32)
    neg = np.array([0.1, 0.2, 0.3], np.float32)
    res = calibrate.evaluate_thresholds(pos, neg)
    assert len(res.thresholds) == 1001
    assert res.best_f1 == pytest.approx(1.0)


def test_sweep_chunking_boundary():
    """N not a multiple of the device chunk must not change results."""
    rng = np.random.default_rng(7)
    n = 8192 + 123
    sims = rng.uniform(0, 1, n).astype(np.float32)
    positives = rng.uniform(0, 1, n) > 0.5
    thresholds = np.linspace(0, 1, 50).astype(np.float32)
    res = calibrate.sweep(sims, positives, thresholds)
    curves, _ = _oracle(sims, positives, thresholds)
    np.testing.assert_allclose(res.f1, curves[:, 2], atol=1e-6)
