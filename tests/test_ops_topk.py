"""Pallas cosine_topk and first_match vs XLA/numpy oracles (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mmrs_tpu.ops.allpairs import dedup_groups, first_match
from mmrs_tpu.ops.topk import cosine_topk


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("q,n,d,k", [(4, 100, 32, 5), (3, 5000, 64, 10), (1, 130, 16, 3)])
def test_cosine_topk_matches_xla(q, n, d, k):
    rng = np.random.default_rng(0)
    queries = _norm_rows(rng.normal(size=(q, d))).astype(np.float32)
    gallery = _norm_rows(rng.normal(size=(n, d))).astype(np.float32)

    v_ref, i_ref = cosine_topk(jnp.asarray(queries), jnp.asarray(gallery), k, impl="xla")
    v_pal, i_pal = cosine_topk(jnp.asarray(queries), jnp.asarray(gallery), k,
                               impl="pallas_interpret", tile_n=256)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_cosine_topk_k_larger_than_tile_boundary():
    """Exact duplicates across tile boundaries keep stable distinct indices."""
    rng = np.random.default_rng(1)
    d = 16
    base = _norm_rows(rng.normal(size=(1, d))).astype(np.float32)
    gallery = np.concatenate([
        _norm_rows(rng.normal(size=(300, d))).astype(np.float32),
        base,  # exact dup of the query at index 300
    ])
    v, i = cosine_topk(jnp.asarray(base), jnp.asarray(gallery), 3,
                       impl="pallas_interpret", tile_n=128)
    assert int(np.asarray(i)[0, 0]) == 300
    assert np.asarray(v)[0, 0] == pytest.approx(1.0, abs=1e-5)


def test_first_match_cross_set():
    rng = np.random.default_rng(2)
    d = 24
    test_set = _norm_rows(rng.normal(size=(50, d))).astype(np.float32)
    train = _norm_rows(rng.normal(size=(200, d))).astype(np.float32)
    train[17] = test_set[3]       # leaked
    train[90] = test_set[41]      # leaked

    res = np.asarray(first_match(jnp.asarray(train), jnp.asarray(test_set),
                                 tau=0.999, impl="pallas_interpret", tile=128))
    leaked = np.nonzero(res >= 0)[0].tolist()
    assert leaked == [17, 90]
    assert res[17] == 3 and res[90] == 41

    res_xla = np.asarray(first_match(jnp.asarray(train), jnp.asarray(test_set),
                                     tau=0.999, impl="xla"))
    np.testing.assert_array_equal(res, res_xla)


def test_first_match_intra_keep_first():
    rng = np.random.default_rng(3)
    d = 24
    x = _norm_rows(rng.normal(size=(120, d))).astype(np.float32)
    x[50] = x[10]   # dup of 10
    x[90] = x[10]   # dup of 10 (and of 50)
    x[77] = x[60]   # dup of 60

    res = np.asarray(first_match(jnp.asarray(x), jnp.asarray(x), tau=0.999,
                                 intra=True, impl="pallas_interpret", tile=64))
    assert res[10] == -1 and res[60] == -1
    assert res[50] == 10 and res[90] == 10 and res[77] == 60

    keepers, keeper_of = dedup_groups(res)
    assert 10 in keepers and 60 in keepers
    assert 50 not in keepers and 90 not in keepers
    assert keeper_of[90] == 10 and keeper_of[77] == 60

    res_xla = np.asarray(first_match(jnp.asarray(x), jnp.asarray(x), tau=0.999,
                                     intra=True, impl="xla"))
    np.testing.assert_array_equal(res, res_xla)


def test_first_match_no_matches():
    x = np.eye(8, 16, dtype=np.float32)  # orthogonal rows
    res = np.asarray(first_match(jnp.asarray(x), jnp.asarray(x), tau=0.5,
                                 intra=True, impl="pallas_interpret", tile=64))
    assert (res == -1).all()
