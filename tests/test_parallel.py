"""Sharded top-k and ring dedup on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmrs_tpu.config import MeshConfig
from mmrs_tpu.ops.allpairs import first_match
from mmrs_tpu.ops.topk import cosine_topk
from mmrs_tpu.parallel import make_mesh, sharded_cosine_topk, sharded_first_match
from mmrs_tpu.parallel.topk import place_gallery


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(MeshConfig())


def test_mesh_shape(mesh):
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_sharded_topk_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    n, d, k = 4096, 64, 10
    gallery = jnp.asarray(_norm_rows(rng.normal(size=(n, d))).astype(np.float32))
    queries = jnp.asarray(_norm_rows(rng.normal(size=(5, d))).astype(np.float32))

    v_ref, i_ref = cosine_topk(queries, gallery, k, impl="xla")

    g_sharded = place_gallery(gallery, mesh)
    v, i = sharded_cosine_topk(queries, g_sharded, k, mesh, impl="xla")

    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_sharded_topk_duplicate_in_last_shard(mesh):
    rng = np.random.default_rng(1)
    n, d = 1024, 32
    gallery = _norm_rows(rng.normal(size=(n, d))).astype(np.float32)
    query = _norm_rows(rng.normal(size=(1, d))).astype(np.float32)
    gallery[n - 3] = query[0]  # exact hit lives in the last shard

    g_sharded = place_gallery(jnp.asarray(gallery), mesh)
    v, i = sharded_cosine_topk(jnp.asarray(query), g_sharded, 3, mesh, impl="xla")
    assert int(np.asarray(i)[0, 0]) == n - 3
    assert np.asarray(v)[0, 0] == pytest.approx(1.0, abs=1e-5)


def test_sharded_dedup_matches_single_device(mesh):
    rng = np.random.default_rng(2)
    n, d = 512, 32
    x = _norm_rows(rng.normal(size=(n, d))).astype(np.float32)
    # Duplicates crossing shard boundaries (shard size 64):
    x[70] = x[3]      # dup across shards 1->0
    x[130] = x[3]     # chained dup, shard 2
    x[511] = x[200]   # last row dup of shard-3 row
    x[65] = x[64]     # adjacent rows, same shard

    ref = np.asarray(first_match(jnp.asarray(x), jnp.asarray(x), tau=0.999,
                                 intra=True, impl="xla"))

    xs = place_gallery(jnp.asarray(x), mesh)
    out = np.asarray(sharded_first_match(xs, tau=0.999, mesh=mesh, intra=True,
                                         impl="xla"))
    np.testing.assert_array_equal(out, ref)
    assert out[70] == 3 and out[130] == 3 and out[511] == 200 and out[65] == 64


def test_sharded_encoder_matches_single_device(mesh):
    import jax.numpy as jnp

    from mmrs_tpu.parallel.embed import make_sharded_encoder

    d_in, d_out = 12, 16
    w = jnp.asarray(np.random.default_rng(0).normal(size=(3 * 4 * 4, d_out))
                    .astype(np.float32))

    def encode_fn(params, images_u8):
        x = images_u8.astype(jnp.float32).reshape(images_u8.shape[0], -1)
        return x @ params

    enc = make_sharded_encoder(encode_fn, w, mesh, batch_size=16)
    rng = np.random.default_rng(1)
    # ragged batch (10 not divisible by 8) exercises pad+trim
    pixels = rng.integers(0, 255, (10, 4, 4, 3), dtype=np.uint8)
    out = enc(pixels)
    ref = (pixels.astype(np.float32).reshape(10, -1)) @ np.asarray(w)
    np.testing.assert_allclose(out, ref, rtol=1e-4)
    assert out.shape == (10, d_out)


def test_sharded_topk_ragged_rows(mesh):
    """N=1000 on 8 shards (not divisible): pad-and-mask must match the
    single-device oracle, including hits in the ragged tail."""
    rng = np.random.default_rng(4)
    n, d, k = 1000, 32, 10
    gallery = _norm_rows(rng.normal(size=(n, d))).astype(np.float32)
    queries = _norm_rows(rng.normal(size=(3, d))).astype(np.float32)
    gallery[997] = queries[0]  # exact hit in the padded last shard

    v_ref, i_ref = cosine_topk(jnp.asarray(queries), jnp.asarray(gallery),
                               k, impl="xla")

    g_sharded = place_gallery(jnp.asarray(gallery), mesh)
    assert g_sharded.shape[0] == 1000 + (-1000) % 8
    v, i = sharded_cosine_topk(jnp.asarray(queries), g_sharded, k, mesh,
                               impl="xla", n_valid=n)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    assert int(np.asarray(i)[0, 0]) == 997

    # unplaced ragged input pads internally too
    v2, i2 = sharded_cosine_topk(jnp.asarray(queries), jnp.asarray(gallery),
                                 k, mesh, impl="xla")
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))


def test_sharded_topk_k_exceeds_shard_rows(mesh):
    """k larger than rows-per-shard: shards top up with sentinels and the
    merge still returns the exact global top-k."""
    rng = np.random.default_rng(5)
    n, d, k = 41, 16, 10  # 6 rows/shard after padding, k=10 > 6
    gallery = _norm_rows(rng.normal(size=(n, d))).astype(np.float32)
    queries = _norm_rows(rng.normal(size=(2, d))).astype(np.float32)
    v_ref, i_ref = cosine_topk(jnp.asarray(queries), jnp.asarray(gallery),
                               k, impl="xla")
    v, i = sharded_cosine_topk(jnp.asarray(queries), jnp.asarray(gallery),
                               k, mesh, impl="xla")
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_sharded_quantized_topk_matches_single_device(mesh):
    """int8 + mesh compose: sharded quantized top-k == single-device
    quantized top-k (same quantization, same ranks), ragged N."""
    from mmrs_tpu.ops.quant import cosine_topk_quantized, quantize_rows
    from mmrs_tpu.parallel.topk import (
        place_gallery_quantized,
        sharded_cosine_topk_quantized,
    )

    rng = np.random.default_rng(6)
    n, d, k = 1000, 32, 10
    gallery = jnp.asarray(_norm_rows(rng.normal(size=(n, d))).astype(np.float32))
    queries = jnp.asarray(_norm_rows(rng.normal(size=(4, d))).astype(np.float32))

    g_q, scales = quantize_rows(gallery)
    v_ref, i_ref = cosine_topk_quantized(queries, g_q, scales, k, impl="xla")

    g_qs, s_s = place_gallery_quantized(gallery, mesh)
    assert g_qs.shape[0] % 8 == 0 and s_s.shape[0] == g_qs.shape[0]
    v, i = sharded_cosine_topk_quantized(queries, g_qs, s_s, k, mesh,
                                         impl="xla", n_valid=n)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_sharded_dedup_ragged_rows(mesh):
    """N=1000 dedup on 8 shards: internal pad, masked padding columns,
    output sliced back to N."""
    rng = np.random.default_rng(7)
    n = 1000
    x = _norm_rows(rng.normal(size=(n, 16))).astype(np.float32)
    x[999] = x[500]   # dup in the ragged tail
    x[998] = x[0]

    ref = np.asarray(first_match(jnp.asarray(x), jnp.asarray(x), tau=0.999,
                                 intra=True, impl="xla"))
    out = np.asarray(sharded_first_match(jnp.asarray(x), tau=0.999, mesh=mesh,
                                         intra=True, impl="xla"))
    assert out.shape == (n,)
    np.testing.assert_array_equal(out, ref)
    assert out[999] == 500 and out[998] == 0


def test_sharded_dedup_intra_vs_cross_semantics(mesh):
    """intra=False: every row matching ANY row (incl. itself) reports a hit."""
    rng = np.random.default_rng(3)
    x = _norm_rows(rng.normal(size=(256, 16))).astype(np.float32)
    xs = place_gallery(jnp.asarray(x), mesh)
    out = np.asarray(sharded_first_match(xs, tau=0.999, mesh=mesh, intra=False,
                                         impl="xla"))
    np.testing.assert_array_equal(out, np.arange(256))  # self-match
