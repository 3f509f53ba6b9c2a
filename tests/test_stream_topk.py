"""Streaming top-k over an on-disk index (bounded-memory capacity mode)."""

import pytest
import numpy as np
import jax.numpy as jnp

from mmrs_tpu.index.stream import streaming_topk
from mmrs_tpu.ops.topk import cosine_topk


def _mk(n, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


@pytest.mark.slow
def test_streaming_matches_oracle(tmp_path):
    n, d, q, k = 30_000, 64, 4, 10
    emb = _mk(n, d)
    queries = _mk(q, d, seed=1)
    emb[29_990] = queries[0]          # hit in the last (ragged) chunk

    mm_path = tmp_path / "idx.npy"
    np.save(mm_path, emb.astype(np.float16))
    mm = np.load(mm_path, mmap_mode="r")

    # oracle on the same f16-rounded data in the same device dtype
    v_ref, i_ref = cosine_topk(
        jnp.asarray(emb.astype(np.float16), jnp.float32),
        jnp.asarray(np.asarray(mm), jnp.float32), k, impl="xla")
    # chunk 8192: 3 full chunks + ragged tail of 5424 rows
    v, i = streaming_topk(mm, emb[[29_990, 5, 9_000, 20_000]],
                          k=k, chunk_rows=8192,
                          device_dtype=jnp.float32, impl="xla")
    assert v.shape == (4, k) and i.shape == (4, k)
    assert i[0, 0] == 29_990
    # global agreement for a query vector present in the gallery
    for qi, row in enumerate([29_990, 5, 9_000, 20_000]):
        assert i[qi, 0] == row

    # full oracle comparison
    vq, iq = streaming_topk(mm, np.asarray(mm[: q]), k=k, chunk_rows=8192,
                            device_dtype=jnp.float32, impl="xla")
    v2, i2 = cosine_topk(jnp.asarray(np.asarray(mm[:q]), jnp.float32),
                         jnp.asarray(np.asarray(mm), jnp.float32),
                         k, impl="xla")
    np.testing.assert_array_equal(iq, np.asarray(i2))
    np.testing.assert_allclose(vq, np.asarray(v2), atol=1e-5)


def test_streaming_tail_smaller_than_k():
    emb = _mk(100, 16)
    v, i = streaming_topk(emb, emb[:2], k=8, chunk_rows=97,
                          device_dtype=jnp.float32, impl="xla")
    # tail chunk has 3 rows < k: sentinels must not leak into the top-8
    assert (i >= 0).all() and (i < 100).all()
    assert i[0, 0] == 0 and i[1, 0] == 1


@pytest.mark.slow
def test_streaming_on_mesh_matches_oracle():
    """Disk-tier streaming composed with the sharded scan (8-dev CPU mesh)."""
    from mmrs_tpu.config import MeshConfig
    from mmrs_tpu.parallel.multihost import make_hybrid_mesh

    mesh = make_hybrid_mesh(MeshConfig())
    n, d, q, k = 5_000, 64, 3, 7
    emb = _mk(n, d)
    queries = emb[[10, 2_500, 4_999]]          # hits incl. the ragged tail
    v_ref, i_ref = cosine_topk(jnp.asarray(queries), jnp.asarray(emb), k,
                               impl="xla")
    # chunk 1024 -> 4 full chunks + ragged 904; 904 % 8 != 0 pads per chunk
    v, i = streaming_topk(emb, queries, k=k, chunk_rows=1024,
                          device_dtype=jnp.float32, impl="xla", mesh=mesh)
    np.testing.assert_array_equal(i, np.asarray(i_ref))
    np.testing.assert_allclose(v, np.asarray(v_ref), atol=1e-5)


def test_streaming_fewer_rows_than_k_uses_minus_one_sentinel():
    """n < k: the invalid slots must carry the unambiguous -1 index (the
    old -offset padding mapped them to global row 0)."""
    emb = _mk(7, 16)
    v, i = streaming_topk(emb, emb[:2], k=10, chunk_rows=32,
                          device_dtype=jnp.float32, impl="xla")
    assert (i[:, :7] >= 0).all()
    assert (i[:, 7:] == -1).all()
    assert np.isneginf(np.asarray(v)[:, 7:]).all()
