"""Int8 gallery quantization: error bounds and rank agreement."""

import numpy as np
import pytest
import jax.numpy as jnp

from mmrs_tpu.ops.quant import cosine_topk_quantized, quantize_rows
from mmrs_tpu.ops.topk import cosine_topk


def _norm(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_quantize_rows_roundtrip_error():
    rng = np.random.default_rng(0)
    x = _norm(rng.normal(size=(100, 64))).astype(np.float32)
    q, s = quantize_rows(jnp.asarray(x))
    back = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    err = np.abs(back - x).max()
    assert err < 1.0 / 127  # half-step quantization bound per element


def test_quantized_topk_close_to_exact():
    rng = np.random.default_rng(1)
    d, n, qn = 128, 5000, 4
    gallery = _norm(rng.normal(size=(n, d))).astype(np.float32)
    queries = _norm(rng.normal(size=(qn, d))).astype(np.float32)
    # plant exact hits so the top-1 is unambiguous
    for i in range(qn):
        gallery[100 + i] = queries[i]

    v_ref, i_ref = cosine_topk(jnp.asarray(queries), jnp.asarray(gallery),
                               10, impl="xla")
    gq, s = quantize_rows(jnp.asarray(gallery))
    v_q, i_q = cosine_topk_quantized(jnp.asarray(queries), gq, s, 10,
                                     impl="xla")

    # the fused pallas kernel must agree exactly with the xla int8 path
    v_p, i_p = cosine_topk_quantized(jnp.asarray(queries), gq, s, 10,
                                     impl="pallas_interpret", tile_n=512)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_q))
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_q), atol=1e-5)

    # top-1 exact hits survive quantization
    np.testing.assert_array_equal(np.asarray(i_q)[:, 0],
                                  np.asarray(i_ref)[:, 0])
    # scores within quantization error of exact cosines
    np.testing.assert_allclose(np.asarray(v_q), np.asarray(v_ref), atol=0.02)
    # strong rank agreement in the top-10
    overlap = [
        len(set(np.asarray(i_q)[r]) & set(np.asarray(i_ref)[r]))
        for r in range(qn)
    ]
    assert min(overlap) >= 8
