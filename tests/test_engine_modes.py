"""SearchEngine modes: sharded mesh path and quantized gallery path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmrs_tpu.config import MeshConfig, SearchConfig
from mmrs_tpu.index.gallery import GalleryIndex
from mmrs_tpu.parallel import make_mesh
from mmrs_tpu.search.engine import SearchEngine


def _make_index(n=512, d=32, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    paths = [f"img{i}.jpg" for i in range(n)]
    classes = [f"c{i % 4}" for i in range(n)]
    return GalleryIndex(emb, paths, classes)


def test_engine_mesh_matches_plain():
    idx = _make_index()
    plain = SearchEngine(idx, SearchConfig(), device_dtype=jnp.float32)
    mesh = make_mesh(MeshConfig())
    sharded = SearchEngine(idx, SearchConfig(), mesh=mesh,
                           device_dtype=jnp.float32)
    q = jnp.asarray(np.asarray(idx.embeddings)[[7, 300]])
    h1 = plain.query_vectors(q, top_k=5)
    h2 = sharded.query_vectors(q, top_k=5)
    for a, b in zip(h1, h2):
        assert [x.path for x in a] == [x.path for x in b]
    assert h1[0][0].path == "img7.jpg"  # self-match first


def test_engine_quantized_mode():
    idx = _make_index(seed=1)
    qz = SearchEngine(idx, SearchConfig(), device_dtype=jnp.float32,
                      quantize=True)
    q = jnp.asarray(np.asarray(idx.embeddings)[[3]])
    hits = qz.query_vectors(q, top_k=3)[0]
    assert hits[0].path == "img3.jpg"  # exact hit survives quantization
    assert hits[0].score == pytest.approx(100.0, abs=1.0)

    with pytest.raises(NotImplementedError):
        SearchEngine(idx, mesh=make_mesh(MeshConfig()), quantize=True)
