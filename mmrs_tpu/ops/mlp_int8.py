"""Fused int8 transformer MLP: quant -> w1 -> GELU -> quant -> w2, one kernel.

Why (r5 trace receipts, scripts/probe_int8_tower.py): the XLA int8 MLP in
the ViT-B/32 serving batch costs ~5.3 ms/batch — w1 2.67 + w2 1.44 +
dynamic-quant fusions ~0.9 + f32 relayout copies ~0.3 — against a ~1.6 ms
int8-MXU roofline for the two matmuls. XLA can fuse the row-max of the NEXT
quantization into a matmul epilogue, but it still materializes the f32
activations in a batch-in-sublanes layout (copy per layer) and runs the
round/scale passes as separate VPU fusions. Here the whole block stays in
VMEM: the [M, W] tile is quantized in registers, hits the MXU twice, and
only bf16 [M, W] output crosses back to HBM. Weights (w1 int8 2.25 MB +
w2 2.25 MB at ViT-B/32) stay VMEM-resident across grid steps.

Numerics match layers._dense_int8 exactly: per-row symmetric int8 dynamic
activation quant (round-nearest-even), per-out-channel weight scales, f32
rescale + bias, GELU in f32. The reference has no quantized path at all
(torch fp16, code/search_image.py); this is TPU-native headroom on top of
the reference's encode hot loop (CLIP/lab1.py:88).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, o_ref,
            *, act: str):
    x = x_ref[:].astype(jnp.float32)                       # [M, W]
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.round(x / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [M, H] int32
    h = acc.astype(jnp.float32) * sx * s1_ref[:] + b1_ref[:]
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    elif act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        raise ValueError(act)
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                     1e-12) / 127.0
    hq = jnp.round(h / sh).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [M, W] int32
    y = acc2.astype(jnp.float32) * sh * s2_ref[:] + b2_ref[:]
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("act", "tile_m", "interpret"))
def mlp_int8_fused(
    x: jnp.ndarray,            # [M, W] bf16/f32
    w1_q: jnp.ndarray,         # [W, H] int8
    s1: jnp.ndarray,           # [H] f32 per-out-channel scales
    b1: jnp.ndarray,           # [H]
    w2_q: jnp.ndarray,         # [H, W] int8
    s2: jnp.ndarray,           # [W] f32
    b2: jnp.ndarray,           # [W]
    act: str = "quick_gelu",
    tile_m: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """One transformer MLP block on int8 weights, fused end-to-end.

    Returns [M, W] in x.dtype. M is padded to the tile internally; W and H
    must be multiples of 128 (true for every tower config: 768/3072,
    1024/4096, 512/2048).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, w = x.shape
    h = w1_q.shape[1]
    if w % 128 or h % 128:
        raise ValueError(f"W={w} and H={h} must be multiples of 128")
    tile_m = min(tile_m, _round_up(m, 8))
    mp = _round_up(m, tile_m)
    if mp != m:
        x = jnp.zeros((mp, w), x.dtype).at[:m].set(x)

    out = pl.pallas_call(
        functools.partial(_kernel, act=act),
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, w), x.dtype),
        interpret=interpret,
    )(x, w1_q,
      s1.astype(jnp.float32).reshape(1, h), b1.astype(jnp.float32).reshape(1, h),
      w2_q, s2.astype(jnp.float32).reshape(1, w),
      b2.astype(jnp.float32).reshape(1, w))
    return out[:m]


def mlp_int8_reference(x, w1_q, s1, b1, w2_q, s2, b2,
                       act: str = "quick_gelu") -> jnp.ndarray:
    """XLA oracle with the same math (for tests)."""
    from mmrs_tpu.models.layers import QTensor, _dense_int8, quick_gelu, gelu

    h = _dense_int8(x, QTensor(w1_q, s1), b1, jnp.float32)
    h = quick_gelu(h) if act == "quick_gelu" else gelu(h)
    y = _dense_int8(h, QTensor(w2_q, s2), b2, jnp.float32)
    return y.astype(x.dtype)
