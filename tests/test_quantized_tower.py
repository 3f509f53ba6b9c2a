"""int8 serving tower: numerics vs the f32 tower + rank preservation.

The int8 path (models/quantize.py + layers._dense_int8) must keep the
embedding geometry: high cosine to the f32 embedding and identical top-k
ranking for well-separated galleries — the same bar the bf16 gate in
eval/parity.py sets for gallery residency.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mmrs_tpu.models import clip
from mmrs_tpu.models.clip import CLIPConfig
from mmrs_tpu.models.configs import CLIP_TEXT_TINY, VIT_TINY
from mmrs_tpu.models.layers import QTensor, dense, quantize_weight
from mmrs_tpu.models.quantize import quantize_clip_visual, quantize_tree

CFG = CLIPConfig(vision=VIT_TINY, text=CLIP_TEXT_TINY)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.key(0), (64, 32)) * 0.05
    qt = quantize_weight(w)
    assert qt.q.dtype == jnp.int8 and qt.s.shape == (32,)
    deq = qt.q.astype(jnp.float32) * qt.s
    err = np.max(np.abs(np.asarray(deq - w)))
    # symmetric per-channel int8: max error <= scale/2 per channel
    assert err <= float(np.max(np.asarray(qt.s))) / 2 + 1e-7


def test_dense_int8_close_to_f32():
    k = jax.random.key(1)
    x = jax.random.normal(k, (4, 10, 64))
    w = jax.random.normal(jax.random.key(2), (64, 32)) * 0.1
    b = jax.random.normal(jax.random.key(3), (32,)) * 0.01
    ref = np.asarray(dense(x, w, b, jnp.float32))
    out = np.asarray(dense(x, quantize_weight(w), b, jnp.float32))
    denom = np.maximum(np.abs(ref), 1.0)
    # dynamic-quant error shrinks ~1/sqrt(K); K=64 here vs 768+ in the
    # towers, so the unit bound is loose and the tower-level cosine gate
    # below is the contract that matters
    assert np.max(np.abs(out - ref) / denom) < 0.06


def test_stacked_qtensor_scans():
    """Per-layer stacked QTensors must slice through lax.scan like arrays."""
    stacked = quantize_weight(
        jax.random.normal(jax.random.key(4), (3, 16, 16)) * 0.1)
    assert stacked.q.shape == (3, 16, 16) and stacked.s.shape == (3, 16)

    def body(h, qt):
        return dense(h, qt, None, jnp.float32), None

    h, _ = jax.lax.scan(body, jnp.ones((2, 16)), stacked)
    assert h.shape == (2, 16) and np.isfinite(np.asarray(h)).all()
    # scan must see each layer's own scale, not a broadcast
    ref = jnp.ones((2, 16))
    for i in range(3):
        ref = dense(ref, QTensor(stacked.q[i], stacked.s[i]),
                    None, jnp.float32)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref), rtol=1e-5)


@pytest.mark.slow
def test_int8_tower_embedding_geometry():
    params = clip.init(jax.random.key(0), CFG)
    qparams = quantize_clip_visual(params)
    imgs = jax.random.normal(jax.random.key(5), (8, 224, 224, 3)) * 0.5

    f32 = np.asarray(clip.encode_image(params, imgs, CFG,
                                       compute_dtype=jnp.float32))
    q8 = np.asarray(clip.encode_image(qparams, imgs, CFG,
                                      compute_dtype=jnp.float32))
    cos = np.sum(f32 * q8, axis=1)          # both L2-normalized
    assert cos.min() > 0.995, cos

    # rank preservation on a well-separated gallery: the int8 query
    # embedding must retrieve the same top-3 as the f32 one
    gal = np.concatenate([f32, np.asarray(
        jax.random.normal(jax.random.key(6), (100, f32.shape[1])))])
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    r_f32 = np.argsort(-(f32 @ gal.T), axis=1)[:, :3]
    r_q8 = np.argsort(-(q8 @ gal.T), axis=1)[:, :3]
    np.testing.assert_array_equal(r_f32[:, 0], r_q8[:, 0])


def test_pipeline_int8_dtype():
    """cfg.model.dtype == 'int8' builds a working quantized serving tower."""
    from mmrs_tpu.config import Config
    from mmrs_tpu.pipeline import build_towers

    cfg = Config()
    cfg.model.image_tower = "vit_tiny"
    cfg.model.dtype = "int8"
    towers = build_towers(cfg)
    assert isinstance(towers.params["visual"]["blocks"]["attn"]["wq"], QTensor)
    imgs = np.random.default_rng(0).integers(
        0, 256, size=(2, 224, 224, 3), dtype=np.uint8)
    out = towers.image_encode(imgs)
    assert out.shape == (2, CFG.vision.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-3)


def test_quantize_tree_leaves_rest_untouched():
    params = clip.init(jax.random.key(0), CFG)
    q = quantize_tree(params["visual"])
    assert isinstance(q["patch_kernel"], QTensor)
    assert isinstance(q["blocks"]["attn"]["wq"], QTensor)
    assert isinstance(q["blocks"]["mlp"]["w2"], QTensor)
    assert not isinstance(q["proj"], QTensor)
    np.testing.assert_array_equal(np.asarray(q["positional_embedding"]),
                                  np.asarray(params["visual"]["positional_embedding"]))
