"""Fused multi-head attention for short sequences — Pallas TPU kernel.

The ViT towers run attention over tiny sequences (50 tokens for B/32, 257
for L/14) where XLA's generic path is HBM-bound, not FLOP-bound: it
materializes [B,H,T,hd] transposes of q/k/v, the [B,H,T,T] logits, and the
softmax round trips — measured 5.2 ms of the 17.7 ms ViT-B/32 serving
batch on v5e (29% of the tower for ~2% of its FLOPs; see bench notes in
COVERAGE.md).

This kernel keeps everything in the [B, T, W] layout the QKV projections
produce: a grid block loads q/k/v tiles for a few images into VMEM,
splits heads by STATIC column slices (no transposes anywhere), runs the
[T,hd]x[hd,T] score dot + f32 softmax + [T,T]x[T,hd] AV dot per (image,
head) on-chip, and writes the [B, T, W] context back. HBM traffic per
layer drops from ~300 MB to the 4 tensor reads/writes (~86 KB/image).

The reference's torch path is cuDNN SDPA (nn.MultiheadAttention inside
CLIP, e.g. code/test_clip.py via clip.load); this is the TPU-native
equivalent, specialized for the short-sequence regime.

`impl`:
  - "pallas": the fused kernel (TPU)
  - "xla":    einsum reference (oracle + CPU fallback)
  - "auto":   pallas on TPU when shapes qualify, else xla
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, block_b: int):
    w = q_ref.shape[-1]
    hd = w // heads
    for i in range(block_b):
        q = q_ref[i]                                   # [T, W] bf16
        k = k_ref[i]
        v = v_ref[i]
        out_heads = []
        for h in range(heads):
            qh = q[:, h * hd:(h + 1) * hd]             # [T, hd] static slice
            kh = k[:, h * hd:(h + 1) * hd]
            vh = v[:, h * hd:(h + 1) * hd]
            logits = jax.lax.dot_general(               # [T, T] f32
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            out_heads.append(jax.lax.dot_general(       # [T, hd]
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype))
        o_ref[i] = jnp.concatenate(out_heads, axis=-1)  # [T, W]


def _mha_bd_kernel(q_ref, k_ref, v_ref, o_ref, kpack, vpack, *,
                   heads: int, block_b: int):
    """Block-diagonal variant: per image, pack k and v into [H*T, W]
    block-diagonal scratches (plain slice copies, no transposes), then run
    attention as TWO dense [T,W]x... dots at full MXU utilization:

      logits = q . kpack^T   [T, H*T]   (col block h = q_h @ k_h^T — only
                                         head-h rows of kpack are nonzero
                                         in those columns)
      out    = probs . vpack [T, W]     (row block h of vpack carries v_h)

    12x redundant FLOPs (the zero blocks multiply anyway) but the per-head
    [50,64] dots that starve the MXU in the naive kernel become dense
    [50,768]x[768,600] matmuls. Scratches zero once at step 0; the nonzero
    (diagonal) blocks are overwritten per image, zeros stay zero.
    """
    step = pl.program_id(0)
    t = q_ref.shape[1]
    w = q_ref.shape[2]
    hd = w // heads

    @pl.when(step == 0)
    def _zero():
        kpack[:] = jnp.zeros_like(kpack)
        vpack[:] = jnp.zeros_like(vpack)

    for i in range(block_b):
        q = q_ref[i]                                   # [T, W]
        k = k_ref[i]
        v = v_ref[i]
        for h in range(heads):
            kpack[h * t:(h + 1) * t, h * hd:(h + 1) * hd] = \
                k[:, h * hd:(h + 1) * hd]
            vpack[h * t:(h + 1) * t, h * hd:(h + 1) * hd] = \
                v[:, h * hd:(h + 1) * hd]
        logits = jax.lax.dot_general(                  # [T, H*T] f32
            q, kpack[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        blocks = []
        for h in range(heads):                         # blockwise softmax
            lg = logits[:, h * t:(h + 1) * t]
            m = jnp.max(lg, axis=-1, keepdims=True)
            e = jnp.exp(lg - m)
            blocks.append(e / jnp.sum(e, axis=-1, keepdims=True))
        probs = jnp.concatenate(blocks, axis=-1).astype(v.dtype)
        o_ref[i] = jax.lax.dot_general(                # [T, W]
            probs, vpack[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _mha_pallas_bd(q, k, v, heads: int, block_b: int, interpret: bool):
    b, t, w = q.shape
    grid = (b // block_b,)
    spec = pl.BlockSpec((block_b, t, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha_bd_kernel, heads=heads, block_b=block_b),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, w), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((heads * t, w), q.dtype),
            pltpu.VMEM((heads * t, w), q.dtype),
        ],
        interpret=interpret,
    )(q, k, v)


def _mha_pallas(q, k, v, heads: int, block_b: int, interpret: bool):
    b, t, w = q.shape
    grid = (b // block_b,)
    spec = pl.BlockSpec((block_b, t, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha_kernel, heads=heads, block_b=block_b),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, w), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _mha_xla(q, k, v, heads: int):
    b, t, w = q.shape
    hd = w // heads
    q = q.reshape(b, t, heads, hd)
    k = k.reshape(b, t, heads, hd)
    v = v.reshape(b, t, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(q.dtype), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(b, t, w)


def _pick_block_b(b: int, t: int, w: int, itemsize: int = 2) -> int:
    # 4 tensors of [block_b, T, W] must sit in VMEM (~16 MB) with headroom
    budget = 4 * (1 << 20)
    per_img = 4 * t * w * itemsize
    bb = max(1, min(16, budget // per_img))
    while b % bb:
        bb -= 1
    return bb


def mha_short_seq(
    q: jnp.ndarray,        # [B, T, W], scale already folded into q
    k: jnp.ndarray,        # [B, T, W]
    v: jnp.ndarray,        # [B, T, W]
    heads: int,
    impl: str = "auto",
) -> jnp.ndarray:          # [B, T, W]
    """Fused MHA for short sequences; softmax in f32, no HBM transposes.

    NOTE for callers: on this platform a `pallas_call` inside `lax.scan`
    hangs compilation — use a Python-unrolled layer loop when impl is
    "pallas" (see layers.scan_blocks).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _mha_xla(q, k, v, heads)
    interpret = impl.endswith("_interpret")
    # pass the real itemsize: an f32 run budgeted at bf16's 2 bytes
    # doubles the live-block VMEM footprint the heuristic bounds
    block_b = _pick_block_b(*q.shape, q.dtype.itemsize)
    if impl.startswith("pallas_bd"):
        return _mha_pallas_bd(q, k, v, heads, block_b, interpret)
    return _mha_pallas(q, k, v, heads, block_b, interpret)
