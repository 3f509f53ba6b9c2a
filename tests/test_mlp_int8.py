"""Fused int8 MLP kernel (ops/mlp_int8.py) vs the XLA int8 oracle.

The kernel replaces the per-layer XLA chain quant -> w1 -> GELU -> quant
-> w2 in the int8 serving towers (r5 VERDICT #1). Interpret mode runs the
exact kernel program on CPU; numerics must match layers._dense_int8 math
(identical int8 quantization decisions, f32 rescale) up to the bf16
output rounding and the kernel's f32-resident GELU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrs_tpu.models.layers import quantize_weight
from mmrs_tpu.ops.mlp_int8 import mlp_int8_fused, mlp_int8_reference


def _setup(m=100, w=256, h=512, seed=0, dtype=jnp.bfloat16):
    k = jax.random.split(jax.random.key(seed), 5)
    x = (jax.random.normal(k[0], (m, w)) * 0.5).astype(dtype)
    w1 = quantize_weight(jax.random.normal(k[1], (w, h)) * 0.02)
    w2 = quantize_weight(jax.random.normal(k[2], (h, w)) * 0.02)
    b1 = jax.random.normal(k[3], (h,)) * 0.01
    b2 = jax.random.normal(k[4], (w,)) * 0.01
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_fused_matches_oracle(act):
    x, w1, b1, w2, b2 = _setup()
    got = mlp_int8_fused(x, w1.q, w1.s, b1, w2.q, w2.s, b2, act=act,
                         tile_m=64, interpret=True)
    want = mlp_int8_reference(x, w1.q, w1.s, b1, w2.q, w2.s, b2, act=act)
    g, w_ = np.asarray(got, np.float32), np.asarray(want, np.float32)
    assert got.shape == want.shape == x.shape
    # identical int8 decisions; bf16 rounding + f32-vs-bf16 GELU residency
    # bound the difference
    denom = max(np.abs(w_).max(), 1e-6)
    assert np.abs(g - w_).max() / denom < 0.02


def test_ragged_m_padding():
    # M not a multiple of the tile: padded rows must not leak into output
    x, w1, b1, w2, b2 = _setup(m=77)
    got = mlp_int8_fused(x, w1.q, w1.s, b1, w2.q, w2.s, b2,
                         tile_m=64, interpret=True)
    want = mlp_int8_reference(x, w1.q, w1.s, b1, w2.q, w2.s, b2)
    assert got.shape == (77, 256)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=0.02)


def test_unaligned_width_rejected():
    x, w1, b1, w2, b2 = _setup(w=256, h=512)
    bad = jnp.zeros((200, 200), jnp.bfloat16)
    with pytest.raises(ValueError, match="multiples of 128"):
        mlp_int8_fused(bad, jnp.zeros((200, 512), jnp.int8), w1.s[:512],
                       b1[:512], w2.q[:512, :200].astype(jnp.int8),
                       w2.s[:200], b2[:200], interpret=True)


def test_tower_integration_mlp_impl():
    """vit.apply(mlp_impl='pallas_interpret') == mlp_impl='xla' within the
    int8-quantization tolerance, on the quantized tiny tower."""
    from mmrs_tpu.models import clip
    from mmrs_tpu.models.clip import CLIPConfig
    from mmrs_tpu.models.configs import CLIP_TEXT_TINY, VIT_TINY
    from mmrs_tpu.models.quantize import quantize_clip_visual

    cfg = CLIPConfig(vision=VIT_TINY, text=CLIP_TEXT_TINY)
    params = quantize_clip_visual(clip.init(jax.random.key(0), cfg))
    img = jax.random.uniform(jax.random.key(1),
                             (4, cfg.vision.image_size,
                              cfg.vision.image_size, 3))
    a = clip.encode_image(params, img, cfg, mlp_impl="xla")
    b = clip.encode_image(params, img, cfg, mlp_impl="pallas_interpret")
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    cos = (a * b).sum(axis=1)   # both L2-normalized
    assert cos.min() > 0.999
