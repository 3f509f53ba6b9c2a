"""LLaMA-family decoder with KV cache — the TPU-hosted VLM language model.

The reference runs LLaVA-v1.5-7b (LLaMA-2 decoder) through the `llava`
package on a CUDA GPU in 8-bit (code/test_llava.py:8-13). Here the decoder
is implemented TPU-first so the verifier stage can be hosted on the mesh:

  - stacked-layer params + lax.scan body (single compiled layer);
  - static-shape KV cache [L, B, MAX, KVH, HD] updated with
    dynamic_update_slice — prefill writes the whole prompt, decode steps
    write one position; no dynamic shapes anywhere under jit;
  - greedy (temperature 0) decode via lax.scan over max_new_tokens with a
    finished-mask (matches the reference's decode config,
    code/test_llava.py:27-29);
  - bf16 matmuls, f32 RMSNorm/softmax/rotary;
  - GQA (n_kv_heads <= n_heads) with broadcast instead of repeat.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mmrs_tpu.models.layers import QTensor, _int8_matmul, _quantize_act, matmul

Params = Dict[str, Any]


class QKVCache(NamedTuple):
    """int8 KV cache: values + per-(batch, kv-head, position) f32 scales.

    Decode reads the whole cache every step, so at 7B/batch-8/S=640 the
    bf16 cache is ~2.7 GB of the ~9.6 GB each step streams from HBM.
    Storing int8 halves that; the scales are factored OUT of both
    attention dots (applied to the small [B,KVH,G,T,S] logits/probs
    tensors instead), so the MXU reads raw int8 with the bf16 convert
    fused into the dot — no dequantized copy of the cache is ever
    materialized. The freed HBM also doubles the feasible batch, which
    amortizes the (dominant) weight read. Mirrors the reference's 8-bit
    serving intent (code/test_llava.py:13 load_8bit=True) applied to the
    cache rather than just the weights.
    """

    q: jnp.ndarray                 # int8 [..., B, KVH, S, HD]
    s: jnp.ndarray                 # f32  [..., B, KVH, S]


def _quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 over the head_dim axis. x [B, KVH, T, HD]."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    return jnp.round(x32 / s).astype(jnp.int8), jnp.squeeze(s, -1)


def _cache_write(cache, new: jnp.ndarray, pos_offset) :
    """Insert [B, KVH, T, HD] entries at pos_offset (bf16 or int8 cache).

    `pos_offset` may be a scalar (all rows write at the same slot — prefill
    and plain decode) or a [B] vector (each row writes at its own slot —
    speculative decode, models/speculative.py, where rows accept different
    draft lengths and desynchronize)."""
    per_row = jnp.ndim(pos_offset) == 1
    if isinstance(cache, QKVCache):
        q, s = _quantize_kv(new)
        if per_row:
            return QKVCache(
                jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
                    c, u, (0, p, 0)))(cache.q, q, pos_offset),
                jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
                    c, u, (0, p)))(cache.s, s, pos_offset),
            )
        return QKVCache(
            jax.lax.dynamic_update_slice(cache.q, q, (0, 0, pos_offset, 0)),
            jax.lax.dynamic_update_slice(cache.s, s, (0, 0, pos_offset)),
        )
    new = new.astype(cache.dtype)
    if per_row:
        return jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
            c, u, (0, p, 0)))(cache, new, pos_offset)
    return jax.lax.dynamic_update_slice(
        cache, new, (0, 0, pos_offset, 0))


def _cache_write_layer(cache, new: jnp.ndarray, pos_offset, layer_idx):
    """Insert [B, KVH, T, HD] entries for layer `layer_idx` directly into
    a STACKED [L, B, KVH, S, HD] cache (the `layers="fori"` decode form):
    a single-position dynamic_update_slice on the loop carry, which XLA
    performs in place — no per-layer slice-out/write-back copies."""
    per_row = jnp.ndim(pos_offset) == 1
    if isinstance(cache, QKVCache):
        q, s = _quantize_kv(new)
        if per_row:
            return QKVCache(
                jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
                    c, u[None], (layer_idx, 0, p, 0)),
                    in_axes=(1, 0, 0), out_axes=1)(cache.q, q, pos_offset),
                jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
                    c, u[None], (layer_idx, 0, p)),
                    in_axes=(1, 0, 0), out_axes=1)(cache.s, s, pos_offset),
            )
        return QKVCache(
            jax.lax.dynamic_update_slice(
                cache.q, q[None], (layer_idx, 0, 0, pos_offset, 0)),
            jax.lax.dynamic_update_slice(
                cache.s, s[None], (layer_idx, 0, 0, pos_offset)),
        )
    new = new.astype(cache.dtype)
    if per_row:
        return jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
            c, u[None], (layer_idx, 0, p, 0)),
            in_axes=(1, 0, 0), out_axes=1)(cache, new, pos_offset)
    return jax.lax.dynamic_update_slice(
        cache, new[None], (layer_idx, 0, 0, pos_offset, 0))


def _layer_view(cache, layer_idx):
    """Layer `layer_idx`'s [B, KVH, S, HD] view of a stacked cache (XLA
    fuses the dynamic slice into downstream reads)."""
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0,
                                                 keepdims=False)
    if isinstance(cache, QKVCache):
        return QKVCache(idx(cache.q), idx(cache.s))
    return idx(cache)


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    layers: int = 32
    heads: int = 32
    kv_heads: int = 32
    mlp_dim: int = 11008
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    max_seq: int = 2048

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


# 7B config of llava-v1.5 (LLaMA-2-7B)
LLAMA2_7B = LlamaConfig()

# 1.1B draft-class config (TinyLlama-1.1B layout: same 32k llama tokenizer,
# GQA 32q/4kv). Used as the speculative draft next to the 7B verifier —
# bench_spec.py measured 4.08 ms/draft-step vs 11.28 ms/7B-step at b8, so a
# k=4 round breaks even at per-draft acceptance 0.763 and reaches 1,134
# tok/s at full acceptance (COVERAGE.md).
LLAMA_1B = LlamaConfig(vocab_size=32000, dim=2048, layers=22, heads=32,
                       kv_heads=4, mlp_dim=5632)


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * scale * w.astype(jnp.float32)).astype(dtype)


def _rope(q: jnp.ndarray, k: jnp.ndarray, pos: jnp.ndarray, theta: float):
    """HF-style rotary: rotate_half over contiguous halves. q,k [B,T,H,D]."""
    hd = q.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    freqs = pos.astype(jnp.float32)[:, :, None] * inv[None, None, :]  # [B,T,D/2]
    cos = jnp.cos(freqs)[:, :, None, :]  # [B,T,1,D/2]
    sin = jnp.sin(freqs)[:, :, None, :]
    cos = jnp.concatenate([cos, cos], axis=-1)
    sin = jnp.concatenate([sin, sin], axis=-1)

    def rot(x):
        x32 = x.astype(jnp.float32)
        x1, x2 = x32[..., : hd // 2], x32[..., hd // 2:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return (x32 * cos + rotated * sin).astype(x.dtype)

    return rot(q), rot(k)


def _attn_block(
    h: jnp.ndarray,                 # [B, T, D]
    p: Params,
    cache_k: jnp.ndarray,           # [B, KVH, S, HD] — HEAD-MAJOR, see init_cache
    cache_v: jnp.ndarray,
    pos_offset: jnp.ndarray,        # [] int32 — where this chunk starts
    cfg: LlamaConfig,
    compute_dtype,
    kv_limit: int | None = None,    # STATIC: attend only to cache[:kv_limit]
    decode_attn: str = "xla",       # "pallas": fused cache-read kernel at T=1
    prefill_attn: str = "xla",      # "pallas": fused causal chunk kernel at
                                    # T>1 (ops/decode_attention.chunk_attention)
    layer_idx=None,                 # caches are STACKED [L, ...]; this
                                    # layer's rows are written in place
                                    # and read through fused slices
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b, t, d = h.shape
    nh, kvh, hd = cfg.heads, cfg.kv_heads, cfg.head_dim

    x = rms_norm(h, p["attn_norm"], cfg.norm_eps)
    cd = compute_dtype

    if isinstance(p["wq"], QTensor):
        # int8 serving weights: quantize x once for all three projections
        xq, sx = _quantize_act(x)
        q = _int8_matmul(xq, sx, p["wq"], None, cd)
        k = _int8_matmul(xq, sx, p["wk"], None, cd)
        v = _int8_matmul(xq, sx, p["wv"], None, cd)
    else:
        q = matmul(x, p["wq"], cd)
        k = matmul(x, p["wk"], cd)
        v = matmul(x, p["wv"], cd)
    q = q.reshape(b, t, nh, hd)
    k = k.reshape(b, t, kvh, hd)
    v = v.reshape(b, t, kvh, hd)

    if jnp.ndim(pos_offset) == 1:              # per-row offsets ([B])
        pos = pos_offset[:, None] + jnp.arange(t)[None, :]
    else:
        pos = pos_offset + jnp.arange(t)[None, :]  # [1, T] broadcast over B
    pos = jnp.broadcast_to(pos, (b, t))        # [B, T] query positions
    q, k = _rope(q, k, pos, cfg.rope_theta)

    # head-major cache updates: new keys/values go in as [B, KVH, T, HD]
    # (the transpose is [B,1,KVH,HD]-tiny at decode, one pass at prefill)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if layer_idx is None:
        cache_k = _cache_write(cache_k, k, pos_offset)
        cache_v = _cache_write(cache_v, v, pos_offset)
        view_k, view_v = cache_k, cache_v
    else:
        cache_k = _cache_write_layer(cache_k, k, pos_offset, layer_idx)
        cache_v = _cache_write_layer(cache_v, v, pos_offset, layer_idx)
        view_k = _layer_view(cache_k, layer_idx)
        view_v = _layer_view(cache_v, layer_idx)
    int8_kv = isinstance(cache_k, QKVCache)
    # Chunked prefill passes a STATIC kv_limit covering positions written so
    # far: reads below are sliced to cache[:kv_limit], so chunk i's attention
    # streams O(i·C) cache bytes and materializes [.., T=C, S=kv_limit]
    # logits instead of the full [.., T, S_total] tensor.
    if kv_limit is not None:
        if int8_kv:
            read_k = QKVCache(view_k.q[:, :, :kv_limit],
                              view_k.s[:, :, :kv_limit])
            read_v = QKVCache(view_v.q[:, :, :kv_limit],
                              view_v.s[:, :, :kv_limit])
        else:
            read_k = view_k[:, :, :kv_limit]
            read_v = view_v[:, :, :kv_limit]
    else:
        read_k, read_v = view_k, view_v
    ck = read_k.q if int8_kv else read_k
    cache_slots = ck.shape[2]

    # GQA: group query heads over kv heads. With the HEAD-MAJOR cache the
    # attention einsums' batch dims (b, kvh) lead on the cache side, so the
    # per-step cache reads are contiguous — the [B,S,KVH,HD] layout made
    # XLA read the whole cache strided inside the scoring fusion every
    # decode step (trace-verified; this layout: 7B int8 543 -> measured
    # below, see bench_vlm.py). With an int8 cache the convert-to-bf16 is
    # fused into the dot's operand read and the per-position scale is
    # applied to the [B,KVH,G,T,S] logits afterwards — the cache itself
    # crosses HBM as int8.
    group = nh // kvh
    qg = q.reshape(b, t, kvh, group, hd).transpose(0, 2, 3, 1, 4)
    if decode_attn == "pallas" and t == 1:
        # Fused decode-attention: the kernel streams the raw int8 cache
        # HBM->VMEM once per step and converts in-VMEM — no int8->bf16
        # convert fusions materialize (ops/decode_attention.py).
        from mmrs_tpu.ops.decode_attention import decode_attention

        q1 = qg[:, :, :, 0].astype(jnp.bfloat16)          # [B, KVH, G, HD]
        if layer_idx is not None and kv_limit is None:
            # fori form: the kernel reads THIS layer's rows straight out
            # of the stacked cache (scalar-prefetch index map, no slice)
            if int8_kv:
                out = decode_attention(q1, cache_k.q, cache_k.s,
                                       cache_v.q, cache_v.s, pos_offset,
                                       layer=layer_idx)
            else:
                out = decode_attention(q1, cache_k, None, cache_v, None,
                                       pos_offset, layer=layer_idx)
        elif int8_kv:
            out = decode_attention(q1, read_k.q, read_k.s,
                                   read_v.q, read_v.s, pos_offset)
        else:
            out = decode_attention(q1, read_k, None, read_v, None,
                                   pos_offset)
        out = out[:, :, :, None, :].astype(cd)            # [B,KVH,G,1,HD]
    elif prefill_attn == "pallas" and t > 1:
        # Fused causal chunk attention: scores/probs stay in VMEM and the
        # stacked cache streams raw (no per-layer slice-out squeeze copy —
        # 39 ms of the 7B p576 prefill in the XLA form, trace-measured).
        from mmrs_tpu.ops.decode_attention import chunk_attention

        qb = qg.astype(jnp.bfloat16)                      # [B,KVH,G,T,HD]
        if layer_idx is not None:
            if int8_kv:
                out = chunk_attention(qb, cache_k.q, cache_k.s,
                                      cache_v.q, cache_v.s, pos_offset,
                                      layer=layer_idx, kv_limit=kv_limit)
            else:
                out = chunk_attention(qb, cache_k, None, cache_v, None,
                                      pos_offset, layer=layer_idx,
                                      kv_limit=kv_limit)
        elif int8_kv:
            out = chunk_attention(qb, view_k.q, view_k.s,
                                  view_v.q, view_v.s, pos_offset,
                                  kv_limit=kv_limit)
        else:
            out = chunk_attention(qb, view_k, None, view_v, None,
                                  pos_offset, kv_limit=kv_limit)
        out = out.astype(cd)                              # [B,KVH,G,T,HD]
    else:
        logits = jnp.einsum("bkgth,bksh->bkgts", qg, ck.astype(cd),
                            preferred_element_type=jnp.float32)
        if int8_kv:
            logits = logits * read_k.s[:, :, None, None, :]
        logits = logits / jnp.sqrt(jnp.float32(hd))

        # causal + validity mask over the cache timeline (cache may be
        # sized below cfg.max_seq — greedy_generate right-sizes it). `pos`
        # is the [B, T] query-position grid, so per-row offsets mask
        # correctly too.
        key_pos = jnp.arange(cache_slots)[None, None, :]  # [1, 1, CACHE]
        mask = key_pos <= pos[:, :, None]                 # [B, T, CACHE]
        logits = jnp.where(mask[:, None, None, :, :], logits, -jnp.inf)

        probs = jax.nn.softmax(logits, axis=-1)
        if int8_kv:
            # fold V's dequant scale into the (small) probs tensor, in f32
            # straight off the softmax so no extra materialization
            probs = probs * read_v.s[:, :, None, None, :]
            cv = read_v.q
        else:
            cv = read_v
        probs = probs.astype(cd)
        out = jnp.einsum("bkgts,bksh->bkgth", probs, cv.astype(cd),
                         preferred_element_type=jnp.float32).astype(cd)
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, t, d)
    attn = matmul(out, p["wo"], cd)
    h = h + attn

    x = rms_norm(h, p["mlp_norm"], cfg.norm_eps)
    if isinstance(p["w_gate"], QTensor):
        xq, sx = _quantize_act(x)
        gate = _int8_matmul(xq, sx, p["w_gate"], None, jnp.float32)
        up = _int8_matmul(xq, sx, p["w_up"], None, jnp.float32)
    else:
        gate = matmul(x, p["w_gate"], cd, out_dtype=jnp.float32)
        up = matmul(x, p["w_up"], cd, out_dtype=jnp.float32)
    inner = (jax.nn.silu(gate) * up).astype(cd)
    down = matmul(inner, p["w_down"], cd)
    return h + down, cache_k, cache_v


def init_cache(cfg: LlamaConfig, batch: int, dtype=jnp.bfloat16,
               seq_len: int | None = None):
    """KV cache [L, B, KVH, S, HD] — HEAD-MAJOR so decode's attention
    einsums read it contiguously (batch dims lead). `seq_len` (default
    cfg.max_seq) lets callers size the cache to the actual request: decode
    attention scans the WHOLE cache every step, so a 512-slot cache behind
    a 128-token request wastes 4x the KV bandwidth.

    `dtype=jnp.int8` builds a quantized QKVCache (values + per-position
    f32 scales): half the KV bytes per decode step and per HBM-resident
    request — see QKVCache."""
    s = seq_len or cfg.max_seq
    shape = (cfg.layers, batch, cfg.kv_heads, s, cfg.head_dim)
    if dtype == jnp.int8:
        def one():
            return QKVCache(jnp.zeros(shape, jnp.int8),
                            jnp.zeros(shape[:-1], jnp.float32))
        return one(), one()
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def init_cache_layers(cfg: LlamaConfig, batch: int, dtype=jnp.bfloat16,
                      seq_len: int | None = None):
    """Per-layer KV cache: a list of `layers` (k, v) pairs, each its own
    [B, KVH, S, HD] buffer, for the UNROLLED layer loop (`layers="unroll"`).

    Why it exists: with the stacked cache scanned through lax.scan's
    xs->ys, XLA cannot alias the input cache to the output stack — the
    trace on the v5e showed the FULL cache copied once per forward call
    (~2 ms per GB per step) plus per-layer dynamic-slice/update-slice
    materialization, ~36% of the 7B decode step at 576-token prompts.
    Separate per-layer buffers carried through the decode scan update
    in place (dynamic_update_slice on a carry aliases), and the unrolled
    loop indexes the stacked weights statically (offset views, no copy).
    """
    s = seq_len or cfg.max_seq
    shape = (batch, cfg.kv_heads, s, cfg.head_dim)
    if dtype == jnp.int8:
        def one():
            return QKVCache(jnp.zeros(shape, jnp.int8),
                            jnp.zeros(shape[:-1], jnp.float32))
    else:
        def one():
            return jnp.zeros(shape, dtype)
    return [(one(), one()) for _ in range(cfg.layers)]


def forward(
    params: Params,
    embeds: jnp.ndarray,            # [B, T, D] already-embedded inputs
    cache: Tuple[jnp.ndarray, jnp.ndarray],
    pos_offset,                     # scalar int32, or [B] per-row offsets
    cfg: LlamaConfig,
    compute_dtype=jnp.bfloat16,
    kv_limit: int | None = None,    # static: attend to cache[:kv_limit] only
    last_logit_only: bool = False,  # lm_head on the final position only
    decode_attn: str = "xla",       # "pallas": fused cache-read at T=1
    prefill_attn: str = "xla",      # "pallas": fused causal chunk at T>1
    layers: str = "auto",           # "fori": in-place stacked-cache loop
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Returns (logits [B, T, V], updated cache). Embedding-level input so
    LLaVA can splice image tokens into the sequence.

    Cache forms: a `(stacked_k, stacked_v)` pair runs the layer body as
    one lax.scan (single compiled layer, fast compile); a LIST of
    per-layer (k, v) pairs (init_cache_layers) runs an UNROLLED Python
    loop with static weight indexing — bigger HLO, but the per-layer
    cache buffers update in place with no xs->ys copies (see
    init_cache_layers for the measured cost of the scanned form).
    `layers="fori"` (stacked cache only) runs the layer body under
    lax.fori_loop with the stacked cache in the CARRY, updated by
    dynamic_update_index_in_dim — in-place like the unrolled form but a
    single compiled layer body, which matters when the body holds a
    Pallas call (32 unrolled kernel instances hang the compiler)."""
    pos_offset = jnp.asarray(pos_offset, jnp.int32)

    if layers == "fori" and not isinstance(cache, list):
        cache_k, cache_v = cache

        def body(li, carry):
            h, ck_all, cv_all = carry
            layer_p = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, li, 0,
                                                       keepdims=False),
                params["blocks"])
            # the STACKED caches pass straight through: writes are
            # single-position in-place updates at (li, ..., pos) and
            # reads go through fused layer slices / the scalar-prefetch
            # Pallas kernel — no per-layer slice-out/write-back copies
            # (measured: the copy form loses 12% at the 7B p576 shape)
            h, ck_all, cv_all = _attn_block(
                h, layer_p, ck_all, cv_all, pos_offset, cfg,
                compute_dtype, kv_limit=kv_limit, decode_attn=decode_attn,
                prefill_attn=prefill_attn, layer_idx=li)
            return (h, ck_all, cv_all)

        h, cache_k, cache_v = jax.lax.fori_loop(
            0, cfg.layers, body,
            (embeds.astype(compute_dtype), cache_k, cache_v))
        new_cache = (cache_k, cache_v)
    elif isinstance(cache, list):
        h = embeds.astype(compute_dtype)
        new_cache = []
        for i, (ck, cv) in enumerate(cache):
            layer_p = jax.tree.map(lambda a, i=i: a[i], params["blocks"])
            h, ck, cv = _attn_block(h, layer_p, ck, cv, pos_offset, cfg,
                                    compute_dtype, kv_limit=kv_limit,
                                    decode_attn=decode_attn,
                                    prefill_attn=prefill_attn)
            new_cache.append((ck, cv))
    else:
        cache_k, cache_v = cache

        def body(h, xs):
            layer_p, ck, cv = xs
            h, ck, cv = _attn_block(h, layer_p, ck, cv, pos_offset, cfg,
                                    compute_dtype, kv_limit=kv_limit,
                                    decode_attn=decode_attn,
                                    prefill_attn=prefill_attn)
            return h, (ck, cv)

        h, new_cache = jax.lax.scan(
            body, embeds.astype(compute_dtype),
            (params["blocks"], cache_k, cache_v),
        )
    if last_logit_only:
        h = h[:, -1:, :]
    h = rms_norm(h, params["final_norm"], cfg.norm_eps)
    logits = matmul(h, params["lm_head"], compute_dtype,
                    out_dtype=jnp.float32)
    return logits, new_cache


def embed_tokens(params: Params, tokens: jnp.ndarray) -> jnp.ndarray:
    return params["embed"][tokens]


def prefill(
    params: Params,
    prompt_embeds: jnp.ndarray,     # [B, T, D]
    cfg: LlamaConfig,
    cache_len: int,
    compute_dtype=jnp.bfloat16,
    kv_dtype=None,
    layers: str = "scan",
    prefill_chunk: int | None = None,
    prefill_attn: str = "xla",
):
    """Build a right-sized cache and run the prompt through it. Returns
    (last-position logits [B, 1, V], cache). Shared by greedy_generate and
    speculative_generate — see greedy_generate for the prefill_chunk
    semantics."""
    b, t, _ = prompt_embeds.shape
    make_cache = init_cache_layers if layers == "unroll" else init_cache
    cache = make_cache(cfg, b, kv_dtype or compute_dtype, seq_len=cache_len)
    if prefill_chunk is not None and t > prefill_chunk:
        c = prefill_chunk
        for s0 in range(0, t, c):
            piece = prompt_embeds[:, s0:s0 + c]
            # round the read window up to the cache's 64-slot granularity
            # so chunk sizes off the 128-lane grid still tile cleanly
            lim = min(cache_len, ((s0 + piece.shape[1] + 63) // 64) * 64)
            # last_logit_only on EVERY chunk: a [B,1,vocab] head per chunk
            # is noise; only the final chunk's logits are consumed
            logits, cache = forward(params, piece, cache, s0, cfg,
                                    compute_dtype, kv_limit=lim,
                                    last_logit_only=True, layers=layers,
                                    prefill_attn=prefill_attn)
    else:
        logits, cache = forward(params, prompt_embeds, cache, 0, cfg,
                                compute_dtype, last_logit_only=True,
                                layers=layers, prefill_attn=prefill_attn)
    return logits, cache


def greedy_generate(
    params: Params,
    prompt_embeds: jnp.ndarray,     # [B, T, D]
    cfg: LlamaConfig,
    max_new_tokens: int = 32,
    eos_token: int = 2,
    compute_dtype=jnp.bfloat16,
    kv_dtype=None,
    layers: str = "scan",
    prefill_chunk: int | None = None,
    decode_window: int | None = None,
    early_stop: bool = False,
    decode_attn: str = "xla",
    prefill_attn: str = "xla",
) -> jnp.ndarray:
    """Greedy decode (temperature 0, the reference verifier's config).
    Returns [B, max_new_tokens] int32, EOS-padded after finish.

    `early_stop=True` decodes via lax.while_loop and halts as soon as all
    batch rows have emitted `eos_token` (bit-identical output — the
    skipped steps would only have produced the EOS padding).

    `kv_dtype=jnp.int8` serves with a quantized KV cache (half the KV
    bytes per step; see QKVCache); default is the compute dtype.
    `layers="unroll"` trades compile time for zero cache-copy decode
    steps (see init_cache_layers).
    `prefill_chunk=C` runs the prompt through the network C tokens at a
    time with STATICALLY-sliced cache reads: chunk i attends to
    cache[:(i+1)·C], so prefill's attention-logits materialization is
    bounded at [B,KVH,G,C,(i+1)C] f32 (triangular total) instead of one
    [.., T, S] tensor, and the LM head runs on the final position only
    instead of all T prompt positions (a [B,T,vocab] f32 save).
    `decode_attn="pallas"` routes the T=1 decode steps through the fused
    Pallas cache-read attention kernel (ops/decode_attention.py): the
    int8 cache streams HBM->VMEM raw with the bf16 convert in-VMEM —
    prefill and any T>1 forward keep the XLA einsums.
    `prefill_attn="pallas"` routes the T>1 prefill chunks through the
    fused causal chunk-attention kernel (chunk_attention): the [C, S]
    f32 scores/probs stay in VMEM and the stacked cache streams raw.
    `decode_window=W` splits the decode scan into segments of W steps;
    segment j reads cache[:round64(t+(j+1)·W)] (STATIC per segment), so
    decode steps early in a long generation (the reference verifier runs
    max_new_tokens=512, code/test_llava.py:29) stream only the live cache
    prefix instead of the full right-sized cache every step."""
    b, t, _ = prompt_embeds.shape
    if t + max_new_tokens > cfg.max_seq:
        # dynamic_update_slice would clamp silently and corrupt the cache
        raise ValueError(
            f"prompt ({t}) + max_new_tokens ({max_new_tokens}) exceeds "
            f"max_seq ({cfg.max_seq})"
        )
    # right-size the cache to this request (rounded to 64 to bound the
    # number of distinct compiled shapes); decode reads the whole cache
    # every step, so slack slots are pure KV-bandwidth waste
    cache_len = min(cfg.max_seq, ((t + max_new_tokens + 63) // 64) * 64)
    logits, cache = prefill(params, prompt_embeds, cfg, cache_len,
                            compute_dtype, kv_dtype, layers, prefill_chunk,
                            prefill_attn)
    next_tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    finished = next_tok == eos_token

    def make_step(kv_limit):
        def step(carry, _):
            tok, cache, pos, finished = carry
            emb = embed_tokens(params, tok[:, None])
            logits, cache = forward(params, emb, cache, pos, cfg,
                                    compute_dtype, kv_limit=kv_limit,
                                    decode_attn=decode_attn, layers=layers)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, eos_token, nxt)
            finished = finished | (nxt == eos_token)
            return (nxt, cache, pos + 1, finished), tok
        return step

    carry = (next_tok, cache, jnp.asarray(t, jnp.int32), finished)

    if decode_window is None or decode_window >= max_new_tokens:
        segments = [(0, max_new_tokens, None)]
    else:
        w = decode_window
        segments = []
        for s0 in range(0, max_new_tokens, w):
            steps = min(w, max_new_tokens - s0)
            # segment writes positions [t+s0, t+s0+steps); each step also
            # reads its own fresh write, so the window must cover
            # t+s0+steps slots
            lim = min(cache_len, ((t + s0 + steps + 63) // 64) * 64)
            if lim >= cache_len:
                lim = None  # whole cache — one compiled form, no slice
            segments.append((s0, steps, lim))

    if not early_stop:
        pieces = []
        for _, steps, lim in segments:
            carry, toks = jax.lax.scan(make_step(lim), carry, None,
                                       length=steps)
            pieces.append(toks)
        if len(pieces) == 1:
            return jnp.transpose(pieces[0], (1, 0))  # [B, max_new_tokens]
        return jnp.transpose(jnp.concatenate(pieces, axis=0), (1, 0))

    # early_stop: a while_loop per segment stops decoding as soon as EVERY
    # sequence has emitted eos_token — the verifier's yes/no answers finish
    # in ~3 of their max_new=8 steps, so the device skips the tail. The
    # output buffer starts EOS-filled, which is exactly the scan path's
    # post-finish padding, so outputs are bit-identical.
    out_buf = jnp.full((b, max_new_tokens), eos_token, jnp.int32)
    for s0, steps, lim in segments:
        step = make_step(lim)

        def cond(state, end=s0 + steps):
            i, carry_, _ = state
            return (i < end) & ~jnp.all(carry_[3])

        def body(state, step=step):
            i, carry_, buf = state
            buf = jax.lax.dynamic_update_slice(buf, carry_[0][:, None],
                                               (0, i))
            carry_, _ = step(carry_, None)
            return (i + 1, carry_, buf)

        _, carry, out_buf = jax.lax.while_loop(
            cond, body, (jnp.asarray(s0, jnp.int32), carry, out_buf))
    return out_buf


def init(key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 10)
    s = 0.02
    L, D, M = cfg.layers, cfg.dim, cfg.mlp_dim
    kvd = cfg.kv_heads * cfg.head_dim

    def nrm(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    blocks = {
        "attn_norm": jnp.ones((L, D), dtype),
        "wq": nrm(ks[0], (L, D, D)),
        "wk": nrm(ks[1], (L, D, kvd)),
        "wv": nrm(ks[2], (L, D, kvd)),
        "wo": nrm(ks[3], (L, D, D)),
        "mlp_norm": jnp.ones((L, D), dtype),
        "w_gate": nrm(ks[4], (L, D, M)),
        "w_up": nrm(ks[5], (L, D, M)),
        "w_down": nrm(ks[6], (L, M, D)),
    }
    return {
        "embed": nrm(ks[7], (cfg.vocab_size, D)),
        "blocks": blocks,
        "final_norm": jnp.ones((D,), dtype),
        "lm_head": nrm(ks[8], (D, cfg.vocab_size)),
    }
