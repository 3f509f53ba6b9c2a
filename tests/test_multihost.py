"""Hybrid DCN x ICI mesh helpers (single-process degenerate forms on the
8-device CPU mesh; the DCN grouping itself needs real multi-process pods)."""

import jax
import numpy as np
import pytest

from mmrs_tpu.config import MeshConfig
from mmrs_tpu.parallel.multihost import (
    distributed_init,
    make_hybrid_mesh,
    process_local_rows,
)
from mmrs_tpu.parallel.topk import sharded_cosine_topk


def test_distributed_init_single_process_noop():
    assert distributed_init() is False
    assert jax.process_count() == 1


def test_hybrid_mesh_single_process_matches_flat():
    mesh = make_hybrid_mesh(MeshConfig(model_size=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_hybrid_mesh(MeshConfig())
    assert mesh1.shape == {"data": 8, "model": 1}


def test_hybrid_mesh_validates_model_axis():
    with pytest.raises(ValueError, match="must divide local device count"):
        make_hybrid_mesh(MeshConfig(model_size=3))
    with pytest.raises(ValueError, match="data_size"):
        make_hybrid_mesh(MeshConfig(model_size=2, data_size=8))


def test_process_local_rows_covers_everything():
    mesh = make_hybrid_mesh(MeshConfig())
    a, b = process_local_rows(1000, mesh)
    # single process owns the whole data axis
    assert (a, b) == (0, 1000)


def test_sharded_topk_on_hybrid_mesh():
    """The sharded query path runs unchanged on a hybrid-constructed mesh."""
    mesh = make_hybrid_mesh(MeshConfig(model_size=1))
    rng = np.random.default_rng(0)
    g = rng.normal(size=(1000, 64)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[[3, 997]]
    vals, idxs = sharded_cosine_topk(q, g, k=5, mesh=mesh)
    assert list(np.asarray(idxs)[:, 0]) == [3, 997]


def test_search_hp_on_mesh_matches_single_device():
    """Tip-Adapter HP sweep sharded over the data axis == local sweep."""
    import jax.numpy as jnp

    from mmrs_tpu.adapt.tip_adapter import search_hp
    from mmrs_tpu.config import MeshConfig

    rng = np.random.default_rng(3)
    n, d, c, nk = 64, 16, 4, 20
    feats = rng.normal(size=(n, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    keys = rng.normal(size=(nk, d)).astype(np.float32)
    keys /= np.linalg.norm(keys, axis=1, keepdims=True)
    values = np.eye(c, dtype=np.float32)[rng.integers(0, c, nk)]
    cw = rng.normal(size=(d, c)).astype(np.float32)
    cw /= np.linalg.norm(cw, axis=0, keepdims=True)
    labels = rng.integers(0, c, n)

    ref = search_hp(jnp.asarray(feats), jnp.asarray(keys), jnp.asarray(values),
                    jnp.asarray(cw), labels, c, search_step=(50, 10))
    mesh = make_hybrid_mesh(MeshConfig())
    out = search_hp(jnp.asarray(feats), jnp.asarray(keys), jnp.asarray(values),
                    jnp.asarray(cw), labels, c, search_step=(50, 10),
                    mesh=mesh)
    np.testing.assert_allclose(out.grid, ref.grid, rtol=1e-5, atol=1e-6)
    assert (out.beta, out.alpha) == (ref.beta, ref.alpha)
    # non-divisible beta count exercises the pad path (50 % 8 != 0)
    assert out.grid.shape == (50, 10)
