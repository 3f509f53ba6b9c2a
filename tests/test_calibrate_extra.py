"""Overlap-variant sweep, F1 plot artifact, orbax checkpoint round-trip."""

import os

import numpy as np
import pytest

from mmrs_tpu.search import calibrate


def test_find_thresholds_overlap_range():
    rng = np.random.default_rng(0)
    pos = rng.normal(60, 5, 200).astype(np.float32)
    neg = rng.normal(40, 5, 200).astype(np.float32)
    res = calibrate.find_thresholds_overlap(pos, neg)
    lo = max(pos.min(), neg.min())
    hi = min(pos.max(), neg.max())
    assert lo <= res.best_threshold <= hi
    assert len(res.thresholds) == max(int((hi - lo) * 10), 2)
    assert res.best_f1 > 0.9


def test_plot_f1_curve(tmp_path):
    pos = np.array([0.8, 0.9], np.float32)
    neg = np.array([0.1, 0.2], np.float32)
    res = calibrate.find_thresholds(pos, neg)
    out = calibrate.plot_f1_curve(res, "lychee", str(tmp_path / "c.jpg"))
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_npz_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from mmrs_tpu.models import checkpoint

    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "nested": {"b": jnp.ones((4,), jnp.bfloat16),
                   "deep": {"c": jnp.asarray(2, jnp.int32)}},
    }
    path = str(tmp_path / "params.npz")
    checkpoint.save_npz(tree, path)
    back = checkpoint.load_npz(path)
    flat1 = jax.tree.leaves(tree)
    flat2 = jax.tree.leaves(back)
    assert len(flat1) == len(flat2)
    for x, y in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from mmrs_tpu.models import checkpoint

    state = {
        "params": {"w": jnp.ones((3, 3), jnp.float32) * 2.5},
        "step": jnp.asarray(7, jnp.int32),
    }
    d = str(tmp_path / "ckpt")
    checkpoint.save_orbax(state, d)
    template = {
        "params": {"w": jnp.zeros((3, 3), jnp.float32)},
        "step": jnp.asarray(0, jnp.int32),
    }
    back = checkpoint.load_orbax(d, template)
    np.testing.assert_allclose(np.asarray(back["params"]["w"]), 2.5)
    assert int(back["step"]) == 7
