"""Metrics vs numpy/sklearn oracles."""

import numpy as np
import pytest

from mmrs_tpu.search import metrics


def test_prf1_from_counts_guarded():
    r = metrics.prf1_from_counts(0, 0, 0)
    assert r.precision == 0.0 and r.recall == 0.0 and r.f1 == 0.0
    r = metrics.prf1_from_counts(5, 5, 0)
    assert r.precision == 0.5 and r.recall == 1.0
    assert r.f1 == pytest.approx(2 * 0.5 / 1.5)


def test_binary_prf1_against_sklearn():
    from sklearn.metrics import precision_recall_fscore_support

    rng = np.random.default_rng(0)
    preds = rng.integers(0, 2, 500)
    labels = rng.integers(0, 2, 500)
    r = metrics.binary_prf1(preds, labels)
    p, rc, f1, _ = precision_recall_fscore_support(
        labels, preds, average="binary", zero_division=0
    )
    assert r.precision == pytest.approx(p, abs=1e-6)
    assert r.recall == pytest.approx(rc, abs=1e-6)
    assert r.f1 == pytest.approx(f1, abs=1e-6)


def test_macro_f1_against_sklearn():
    from sklearn.metrics import f1_score

    rng = np.random.default_rng(1)
    num_classes = 7
    preds = rng.integers(0, num_classes, 1000)
    labels = rng.integers(0, num_classes, 1000)
    ours = metrics.macro_f1(preds, labels, num_classes)
    theirs = f1_score(labels, preds, average="macro",
                      labels=list(range(num_classes)), zero_division=0)
    assert ours == pytest.approx(theirs, abs=1e-6)


def test_topk_accuracy_with_exclusion():
    logits = np.array([
        [0.9, 0.1, 0.0],
        [0.1, 0.8, 0.1],
        [0.2, 0.3, 0.5],
        [0.6, 0.3, 0.1],
    ])
    labels = np.array([0, 1, 0, 2])
    assert metrics.topk_accuracy(logits, labels, topk=1) == pytest.approx(0.5)
    # Exclude class 2: drops sample 3 (wrong anyway) -> 2/3 correct
    acc = metrics.topk_accuracy(logits, labels, topk=1, exclude_class=2)
    assert acc == pytest.approx(2 / 3)


def test_per_class_report():
    preds = [0, 0, 1, 1, 2]
    labels = [0, 1, 1, 1, 2]
    rep = metrics.per_class_report(preds, labels, ["a", "b", "c"])
    assert rep["a"].tp == 1 and rep["a"].fp == 1 and rep["a"].fn == 0
    assert rep["b"].tp == 2 and rep["b"].fn == 1 and rep["b"].fp == 0
    assert rep["c"].f1 == pytest.approx(1.0)


def test_trials_summarize():
    """The bench regression instrument (VERDICT r3 #2): quantiles match
    numpy's linear interpolation, the median is robust to one outlier."""
    import numpy as np

    from mmrs_tpu.utils.trials import measure, summarize

    xs = [3.0, 1.0, 2.0, 10.0, 4.0]
    s = summarize(xs)
    assert s["median"] == np.quantile(xs, 0.5)
    assert s["iqr"] == np.quantile(xs, 0.75) - np.quantile(xs, 0.25)
    assert s["min"] == 1.0 and s["max"] == 10.0 and s["n"] == 5
    assert s["trials"] == sorted(xs)
    assert summarize([7.0])["median"] == 7.0

    it = iter([5.0, 6.0, 7.0])
    m = measure(lambda: next(it), n=3)
    assert m["median"] == 6.0
