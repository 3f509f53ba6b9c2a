"""Fused decode-attention Pallas kernel over the (int8) KV cache.

The 7B verifier's decode step is HBM-bound: every step streams the whole
KV cache once (plus the weights). With the int8 QKVCache the XLA einsum
path keeps the cache int8 ACROSS HBM but materializes int8->bf16 convert
fusions on the way into the two attention dots (~105 ms per 32-step
generate at the cascade's 576-token/batch-16 shape — trace-measured,
COVERAGE.md). The earlier attempt to fix that with int8 x int8 dots was
35% SLOWER (M=1 rows don't tile the MXU's int8 path and the extra
quantize passes outweigh the converts).

This kernel takes the third route VERDICT r2 #1 calls for: one fused pass
per (batch, kv-head-block) that

  - DMAs the raw int8 K and V rows HBM->VMEM once (Pallas double-buffers
    grid blocks, so the streams overlap compute),
  - converts to bf16 IN REGISTERS/VMEM (never materialized to HBM),
  - applies the per-position dequant scales to the [G, S] logits and
    probs (tiny), masks the dead cache tail, softmaxes in f32, and
  - contracts probs @ V to the [G, HD] output.

The cache rides in STACKED over layers ([L, B, KVH, S, HD]) with the
layer index as a SCALAR-PREFETCH operand driving the index map, so the
kernel reads layer li's rows straight out of the full decode-loop cache
— no per-layer slice is ever materialized, and the `layers="fori"`
decode loop needs only ONE compiled kernel instance (32 unrolled
instances hang this platform's compiler; COVERAGE.md).

Decode-only (query length 1; prefill keeps the XLA einsums, which tile
fine at T=chunk). Matches the einsum path bit-for-bit up to f32 softmax
rounding; the exact-equality test runs the kernel in interpreter mode on
CPU and compiled on TPU (tests/test_decode_attention.py).

Reference behavior being accelerated: the greedy decode loop of
code/test_llava.py:27-29 / union_clip_llava2.py:104-130 hosted on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunk_attn_kernel(lyr_ref, pos_ref, q_ref, kq_ref, ks_ref, vq_ref,
                       vs_ref, out_ref, *, hd_scale: float,
                       quantized: bool, kvh_blk: int):
    """Causal chunk attention for one (batch, kv-head-block) tile: C query
    rows per head against the cache's first S slots. The [C, S] f32
    scores/probs live only in VMEM — the XLA prefill path materializes
    them (plus a per-layer cache slice-out) to HBM every layer. Measured
    7B b16 p576 (bench_prefill.py): wins 15% over XLA for UNCHUNKED
    prefill (617 vs 725 ms); loses 6% under chunked pc128 prefill whose
    statically-sliced reads already bound the materializations — see
    COVERAGE.md.

    lyr_ref/pos_ref as in _decode_attn_kernel; pos here is each row's
    CHUNK-START position (query c sits at pos + c, and may attend to
    keys at positions <= pos + c — including its own freshly written
    slot)."""
    del lyr_ref
    g, c = q_ref.shape[2], q_ref.shape[3]
    s = kq_ref.shape[3]
    pos0 = pos_ref[pl.program_id(0)]
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (c, s), 1)
    q_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (c, s), 0)
    mask = key_pos <= q_pos

    for h in range(kvh_blk):                             # static unroll
        k = kq_ref[0, 0, h].astype(jnp.bfloat16)         # [S, HD]
        v = vq_ref[0, 0, h].astype(jnp.bfloat16)
        for gi in range(g):
            q = q_ref[0, h, gi].astype(jnp.bfloat16)     # [C, HD]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [C, S]
            if quantized:
                logits = logits * ks_ref[0, 0, h]        # [1, S] f32
            logits = logits * hd_scale
            logits = jnp.where(mask, logits, -jnp.inf)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            if quantized:
                probs = probs * vs_ref[0, 0, h]
            out_ref[0, h, gi] = jax.lax.dot_general(
                probs.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [C, HD]


def _decode_attn_kernel(lyr_ref, pos_ref, q_ref, kq_ref, ks_ref, vq_ref,
                        vs_ref, out_ref, *, hd_scale: float,
                        quantized: bool, kvh_blk: int):
    """One (batch, kv-head-block) tile: `kvh_blk` heads' q [G, HD] vs
    their cache rows [S, HD]. Blocking several kv-heads per program makes
    each grid step's HBM->VMEM DMA kvh_blk x larger (the per-head slice
    is only S*HD int8 bytes — too small to reach HBM bandwidth alone).

    lyr_ref/pos_ref: scalar-prefetch int32 — the layer being decoded
    (consumed by the index maps, unused here) and per-row query positions
    [B] (the mask covers key_pos <= pos, i.e. the live cache prefix
    including this step's freshly written slot)."""
    del lyr_ref
    g = q_ref.shape[2]
    s = kq_ref.shape[3]
    pos = pos_ref[pl.program_id(0)]
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (g, s), 1)

    for h in range(kvh_blk):                             # static unroll
        q = q_ref[0, h].astype(jnp.bfloat16)             # [G, HD]
        k = kq_ref[0, 0, h].astype(jnp.bfloat16)         # [S, HD] (int8 in)
        # q @ K^T without materializing a transpose: contract the HD axes
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [G, S]
        if quantized:
            logits = logits * ks_ref[0, 0, h]            # [1, S] f32 scales
        logits = logits * hd_scale

        logits = jnp.where(key_pos <= pos, logits, -jnp.inf)

        # f32 softmax, numerically identical to jax.nn.softmax on the
        # masked row (max subtraction; -inf tail contributes exact zeros)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)   # [G, S] f32

        if quantized:
            probs = probs * vs_ref[0, 0, h]              # fold V dequant
        v = vq_ref[0, 0, h].astype(jnp.bfloat16)         # [S, HD]
        out = jax.lax.dot_general(
            probs.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [G, HD]
        out_ref[0, h] = out


@functools.partial(jax.jit, static_argnames=("interpret", "kvh_block",
                                             "kv_limit"))
def chunk_attention(
    q: jnp.ndarray,                  # [B, KVH, G, C, HD] (bf16/f32)
    k_cache: jnp.ndarray,            # [(L,) B, KVH, S, HD] int8 or bf16
    k_scales,                        # [(L,) B, KVH, S] f32 or None (bf16)
    v_cache: jnp.ndarray,
    v_scales,
    pos,                             # int32 chunk-start pos: scalar or [B]
    layer=None,                      # int32 layer index into a stacked
                                     # [L, ...] cache; None = unstacked
    kv_limit: int | None = None,     # STATIC: stream cache[:limit] only
    interpret: bool = False,
    kvh_block: int | None = None,
) -> jnp.ndarray:
    """Fused causal chunk attention over the cache prefix (prefill sibling
    of decode_attention; same stacked-cache scalar-prefetch contract).

    Returns [B, KVH, G, C, HD] f32. `kv_limit` bounds the DMA to the first
    `round128(kv_limit)` cache slots (chunk i of a chunked prefill only
    attends that far — the causal mask makes the 128-alignment slack
    exact zeros)."""
    if layer is None:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        if k_scales is not None:
            k_scales = k_scales[None]
            v_scales = v_scales[None]
        layer = 0
    b, kvh, g, c, hd = q.shape
    s = k_cache.shape[3]
    # block the cache stream at the 128-lane grid; the causal mask zeroes
    # whatever the round-up reads past kv_limit
    s_lim = s if kv_limit is None else min(s, ((kv_limit + 127) // 128) * 128)
    quantized = k_scales is not None
    hd_scale = 1.0 / float(hd) ** 0.5

    if kvh_block is None:
        # same ~768 KB-of-K-per-block heuristic as decode_attention
        per_head = s_lim * hd * k_cache.dtype.itemsize
        kvh_block = max(1, min(kvh, (768 * 1024) // max(per_head, 1)))
    while kvh % kvh_block:
        kvh_block -= 1

    if quantized:
        ks = k_scales[:, :, :, None, :]                  # [L, B, KVH, 1, S]
        vs = v_scales[:, :, :, None, :]
    else:
        ks = jnp.zeros((1, b, kvh, 1, 1), jnp.float32)
        vs = ks
    s_blk = s_lim if quantized else 1

    lyr_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    pos_arr = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1),
                               (b,))

    kernel = functools.partial(_chunk_attn_kernel, hd_scale=hd_scale,
                               quantized=quantized, kvh_blk=kvh_block)
    kb = kvh_block

    def lidx(i, j, lyr, pos):
        del pos
        return (lyr[0], i, j, 0, 0)

    def lidx_scales(i, j, lyr, pos):
        del pos
        return (lyr[0] if quantized else 0, i, j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kvh // kb),
        in_specs=[
            pl.BlockSpec((1, kb, g, c, hd),
                         lambda i, j, lyr, pos: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, 1, kb, s_lim, hd), lidx),
            pl.BlockSpec((1, 1, kb, 1, s_blk), lidx_scales),
            pl.BlockSpec((1, 1, kb, s_lim, hd), lidx),
            pl.BlockSpec((1, 1, kb, 1, s_blk), lidx_scales),
        ],
        out_specs=pl.BlockSpec((1, kb, g, c, hd),
                               lambda i, j, lyr, pos: (i, j, 0, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, c, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * kvh * g * c * s_lim * hd,
            bytes_accessed=2 * b * kvh * s_lim * hd * k_cache.dtype.itemsize,
            transcendentals=b * kvh * g * c * s_lim,
        ),
        interpret=interpret,
    )(lyr_arr, pos_arr, q, k_cache, ks, v_cache, vs)
    return out


@functools.partial(jax.jit, static_argnames=("interpret", "kvh_block"))
def decode_attention(
    q: jnp.ndarray,                  # [B, KVH, G, HD] (bf16/f32)
    k_cache: jnp.ndarray,            # [(L,) B, KVH, S, HD] int8 or bf16
    k_scales,                        # [(L,) B, KVH, S] f32 or None (bf16)
    v_cache: jnp.ndarray,
    v_scales,
    pos,                             # int32 query position: scalar or [B]
    layer=None,                      # int32 layer index into a stacked
                                     # [L, ...] cache; None = unstacked
    interpret: bool = False,
    kvh_block: int | None = None,
) -> jnp.ndarray:
    """Fused single-step attention read over the whole cache.

    Returns [B, KVH, G, HD] f32. `k_scales`/`v_scales` None selects the
    unquantized variant (same fusion, no scale rows). With `layer` set the
    caches are the decode loop's full stacked [L, ...] buffers and the
    index map DMAs only layer `layer`'s rows (scalar prefetch) — nothing
    is sliced or copied on the way in. `kvh_block` heads share one grid
    step (default: ~768 KB of K bytes per block — per-head DMAs are too
    small to reach HBM bandwidth)."""
    if layer is None:                # static: None is a Python constant
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        if k_scales is not None:
            k_scales = k_scales[None]
            v_scales = v_scales[None]
        layer = 0
    b, kvh, g, hd = q.shape
    s = k_cache.shape[3]
    quantized = k_scales is not None
    hd_scale = 1.0 / float(hd) ** 0.5

    if kvh_block is None:
        # ~768 KB of K per block: measured sweet spot on v5e at the 7B
        # cache shape (kvh_block 1/2/4/8/16/32 -> 563/674/706/888/360/454
        # GB/s effective; 8 = 640 KB blocks reaches the HBM roofline,
        # larger blocks thrash VMEM double-buffering)
        per_head = s * hd * k_cache.dtype.itemsize
        kvh_block = max(1, min(kvh, (768 * 1024) // max(per_head, 1)))
    while kvh % kvh_block:
        kvh_block -= 1

    if quantized:
        ks = k_scales[:, :, :, None, :]                  # [L, B, KVH, 1, S]
        vs = v_scales[:, :, :, None, :]
    else:
        # dummy tiny operands keep one kernel signature; never read
        ks = jnp.zeros((1, b, kvh, 1, 1), jnp.float32)
        vs = ks
    s_blk = ks.shape[4]

    lyr_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    # scalar pos (plain decode) or per-row [B] pos (speculative decode,
    # where rows desynchronize)
    pos_arr = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1),
                               (b,))

    kernel = functools.partial(_decode_attn_kernel, hd_scale=hd_scale,
                               quantized=quantized, kvh_blk=kvh_block)
    kb = kvh_block

    def lidx(i, j, lyr, pos):
        del pos
        return (lyr[0], i, j, 0, 0)

    def lidx_scales(i, j, lyr, pos):
        del pos
        # the dummy (unquantized) scales are [1, ...]: always layer 0
        return (lyr[0] if quantized else 0, i, j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kvh // kb),
        in_specs=[
            pl.BlockSpec((1, kb, g, hd), lambda i, j, lyr, pos: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, kb, s, hd), lidx),
            pl.BlockSpec((1, 1, kb, 1, s_blk), lidx_scales),
            pl.BlockSpec((1, 1, kb, s, hd), lidx),
            pl.BlockSpec((1, 1, kb, 1, s_blk), lidx_scales),
        ],
        out_specs=pl.BlockSpec((1, kb, g, hd),
                               lambda i, j, lyr, pos: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * kvh * g * s * hd,
            bytes_accessed=2 * b * kvh * s * hd * k_cache.dtype.itemsize,
            transcendentals=b * kvh * g * s,
        ),
        interpret=interpret,
    )(lyr_arr, pos_arr, q, k_cache, ks, v_cache, vs)
    return out
