"""Shared transformer building blocks (functional, MXU-friendly).

Design rules (TPU-first, see /opt/skills/guides/pallas_guide.md):
  - matmuls run in the compute dtype (bf16 by default) with f32 accumulation
    via `preferred_element_type`;
  - LayerNorm and softmax run in f32 regardless of compute dtype;
  - per-layer parameters are STACKED along a leading layer axis so the whole
    transformer body is one `lax.scan` — a single compiled layer, minimal
    compile time, and XLA can pipeline weight prefetch.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


class QTensor(NamedTuple):
    """int8 weight + per-output-channel f32 scale (w ~= q * s).

    v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS vs
    197 TFLOPS), so the serving towers can trade one elementwise
    dynamic-quantization pass per matmul for half the MXU time. A NamedTuple
    is already a pytree, so stacked per-layer QTensors scan like plain
    arrays and ship through jit argument trees unchanged.
    """

    q: jnp.ndarray                 # int8 [..., K, N]
    s: jnp.ndarray                 # f32  [..., N]


def quantize_weight(w: jnp.ndarray) -> QTensor:
    """Per-output-channel symmetric int8 quantization of a [..., K, N] kernel."""
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)      # [..., 1, N]
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.round(w32 / s).astype(jnp.int8)
    return QTensor(q, jnp.squeeze(s, -2))


class QTensor4(NamedTuple):
    """int4 weight (two nibbles per int8 byte) + per-(K-group, out-channel)
    scales (w ~= unpack(packed) * s[group]).

    Decode is weight-bandwidth-bound (the 7B int8 stream is 6.9 GB/step,
    NEXT.md #4), so int4 halves the HBM bytes that set the decode floor.
    Group-wise scales along the contraction dim (AWQ/GPTQ convention,
    default 128) keep the quantization usable where one per-channel scale
    cannot. Rows 2i/2i+1 of the logical [K, N] kernel pack into byte row i
    (low/high nibble); the dot runs bf16 after an in-VMEM unpack — the MXU
    rate is not the bottleneck, the weight stream is."""

    packed: jnp.ndarray            # int8 [..., K//2, N]
    s: jnp.ndarray                 # f32/bf16 [..., K//G, N]


def quantize_weight_int4(w: jnp.ndarray, group: int = 128) -> QTensor4:
    """Symmetric int4 (-7..7) group quantization of a [..., K, N] kernel."""
    w32 = jnp.asarray(w, jnp.float32)
    k = w32.shape[-2]
    if k % (2 * group) and k != group:
        raise ValueError(f"K={k} must be a multiple of 2*group={2*group}")
    g = w32.reshape(*w32.shape[:-2], k // group, group, w32.shape[-1])
    amax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)    # [..., K/G, 1, N]
    s = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(g / s), -7, 7).astype(jnp.int8)
    q = q.reshape(*w32.shape[:-2], k, w32.shape[-1])
    lo = q[..., 0::2, :] & 0xF
    hi = q[..., 1::2, :] & 0xF
    packed = jnp.left_shift(hi, 4) | lo
    return QTensor4(packed.astype(jnp.int8), jnp.squeeze(s, -2))


def unpack_int4(kernel: QTensor4, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dequantized [..., K, N] kernel. Under jit XLA fuses this into the
    consuming dot's operand read where it can; the packed form is what
    crosses HBM."""
    b = kernel.packed
    lo = jnp.right_shift(jnp.left_shift(b, 4), 4)         # sign-extended
    hi = jnp.right_shift(b, 4)                            # arithmetic
    kh = b.shape[-2]
    n = b.shape[-1]
    w = jnp.stack([lo, hi], axis=-2)                      # [..., K/2, 2, N]
    w = w.reshape(*b.shape[:-2], kh * 2, n)
    groups = kernel.s.shape[-2]
    w = w.reshape(*b.shape[:-2], groups, (kh * 2) // groups, n)
    w = w.astype(dtype) * kernel.s[..., :, None, :].astype(dtype)
    return w.reshape(*b.shape[:-2], kh * 2, n)


def _quantize_act(x: jnp.ndarray):
    """Dynamic per-row symmetric int8 quantization of activations.

    The f32 upcast feeding both the reduce and the round looks like a
    relayout-copy source in traces, but a reduce-on-own-dtype variant
    measured NEUTRAL on chip (interleaved A/B, scripts/probe_quantfix_ab:
    16.09 vs 16.05 ms/batch median) — XLA fuses the upcast either way;
    the copies the trace blames on this line belong to the projection
    operands (fixed by the head-outermost layout in `attention`)."""
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                     1e-12) / 127.0
    return jnp.round(x32 / sx).astype(jnp.int8), sx


def _int8_matmul(xq: jnp.ndarray, sx: jnp.ndarray, kernel: QTensor, bias,
                 compute_dtype: jnp.dtype) -> jnp.ndarray:
    acc = jax.lax.dot_general(
        xq, kernel.q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * kernel.s.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(compute_dtype)


def _dense_int8(x: jnp.ndarray, kernel: QTensor, bias,
                compute_dtype: jnp.dtype) -> jnp.ndarray:
    """Dynamic per-row activation quant -> int8 MXU matmul -> rescale."""
    xq, sx = _quantize_act(x)
    return _int8_matmul(xq, sx, kernel, bias, compute_dtype)


def matmul(x: jnp.ndarray, kernel, compute_dtype: jnp.dtype,
           out_dtype=None) -> jnp.ndarray:
    """Bias-free matmul dispatching on QTensor vs plain kernels.

    Accumulates in f32 (int32 for int8 kernels) and returns `out_dtype`
    (default: compute_dtype). The LLaMA/LLaVA stack routes its projections
    through this so int8 serving weights (models/quantize.py) drop in —
    decode is weight-bandwidth-bound, so halving the bytes ~doubles
    tokens/s at small batch.
    """
    out_dtype = out_dtype or compute_dtype
    if isinstance(kernel, QTensor):
        xq, sx = _quantize_act(x)
        acc = jax.lax.dot_general(
            xq, kernel.q, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * sx
                * kernel.s.astype(jnp.float32)).astype(out_dtype)
    if isinstance(kernel, QTensor4):
        w = unpack_int4(kernel, compute_dtype)
        return jax.lax.dot_general(
            x.astype(compute_dtype), w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
    return jnp.dot(
        x.astype(compute_dtype), kernel.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def dense(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None,
          compute_dtype: jnp.dtype) -> jnp.ndarray:
    if isinstance(kernel, QTensor):
        return _dense_int8(x, kernel, bias, compute_dtype)
    y = jnp.dot(
        x.astype(compute_dtype),
        kernel.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(compute_dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """OpenAI CLIP activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x.astype(jnp.float32)).astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def _mask_hb(mask: jnp.ndarray) -> jnp.ndarray:
    """Additive mask in the caller contract ([B, H, Q, K]-broadcastable)
    re-axised for the head-outermost [H, B, Q, K] logits: 4-D masks swap
    their two leading axes (bert's [B,1,1,T] -> [1,B,1,T], the causal
    [1,1,T,T] is unchanged); <=2-D masks broadcast the same either way."""
    m = mask.astype(jnp.float32)
    return m.transpose(1, 0, 2, 3) if m.ndim == 4 else m


def attention(
    x: jnp.ndarray,             # [B, T, W]
    p: Params,                  # {wq, wk, wv, wo: [W, W]; bq, bk, bv, bo: [W]}
    heads: int,
    mask: jnp.ndarray | None,   # additive f32 mask broadcastable to [B, H, Q, K]
    compute_dtype: jnp.dtype,
    attn_impl: str = "xla",     # "xla" | "pallas" | "pallas_interpret"
) -> jnp.ndarray:
    b, t, w = x.shape
    hd = w // heads
    cd = compute_dtype
    # 1/sqrt(d) folded into q BEFORE the score matmul (one [H,B,T,hd]
    # multiply instead of a [B,H,T,T] f32 multiply).
    scale = jnp.asarray(1.0 / np.sqrt(hd), cd)

    # HEAD-OUTERMOST projections: einsum btw,whd->hbtd asks the matmul for
    # the [H,B,T,hd] output whose two MAJOR dims are the score einsum's
    # batch dims — the layout a standard batched matmul wants — so layout
    # assignment keeps the operand copies cheap. r2 measured the head-major
    # bhtd form at +6.8% over naive reshape; r5 re-traced and found bhtd
    # still paying 2.6-2.9 ms/batch of {0,3,2,1}->{3,2,1,0} operand copies
    # in the ViT-B/32 scan; hbtd is +5-6% over bhtd for BOTH dtypes
    # (scripts/probe_attn_layouts.py: bf16 16.96->16.02 ms/batch, int8
    # 16.52->15.73 on v5e).
    int8 = isinstance(p["wq"], QTensor)

    if attn_impl != "xla" and mask is None:
        # fused short-seq kernel (wins from T~257 up): it wants the natural
        # [B, T, W] layout, so project with plain dense (no head-major)
        from mmrs_tpu.ops.attention import mha_short_seq

        if int8:
            xq, sx = _quantize_act(x)
            q = _int8_matmul(xq, sx, p["wq"], p["bq"], cd)
            k = _int8_matmul(xq, sx, p["wk"], p["bk"], cd)
            v = _int8_matmul(xq, sx, p["wv"], p["bv"], cd)
        else:
            q = dense(x, p["wq"], p["bq"], cd)
            k = dense(x, p["wk"], p["bk"], cd)
            v = dense(x, p["wv"], p["bv"], cd)
        out = mha_short_seq(q * scale, k, v, heads, impl=attn_impl)
        return dense(out, p["wo"], p["bo"], cd)

    if int8:
        # quantize the (shared) layer input once for all three projections
        xq, sx = _quantize_act(x)
        sxh = sx.reshape(1, b, t, 1)

        def proj(kernel: QTensor, bias):
            acc = jnp.einsum(
                "btw,whd->hbtd", xq, kernel.q.reshape(w, heads, hd),
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * sxh
                 * kernel.s.astype(jnp.float32)
                 .reshape(heads, 1, 1, hd))
            return y + bias.astype(jnp.float32).reshape(heads, 1, 1, hd)
    else:
        xc = x.astype(cd)

        def proj(kernel, bias):
            y = jnp.einsum("btw,whd->hbtd", xc,
                           kernel.astype(cd).reshape(w, heads, hd),
                           preferred_element_type=jnp.float32)
            return y + bias.astype(jnp.float32).reshape(heads, 1, 1, hd)

    q = proj(p["wq"], p["bq"]).astype(cd) * scale        # [H, B, T, hd]
    k = proj(p["wk"], p["bk"]).astype(cd)
    v = proj(p["wv"], p["bv"]).astype(cd)

    logits = jnp.einsum("hbtd,hbsd->hbts", q, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + _mask_hb(mask)
    # Softmax in the compute dtype: with bf16 serving this removes the
    # [H,B,T,T] f32 materialization (measured 10.3k -> 12.7k img/s for
    # ViT-B/32; embedding cosine to the f32 tower unchanged at 0.99995).
    # f32 compute keeps f32 softmax, so CPU parity tests see the exact
    # reference math.
    probs = jax.nn.softmax(logits.astype(cd), axis=-1)
    out = jnp.einsum("hbts,hbsd->hbtd", probs, v,
                     preferred_element_type=jnp.float32).astype(cd)
    if int8:
        # per-(b,t)-row dynamic quant needs the W-contiguous layout; one
        # transpose here replaces the three the projections used to pay
        out = out.transpose(1, 2, 0, 3).reshape(b, t, w)
        return dense(out, p["wo"], p["bo"], cd)
    wo = p["wo"].astype(cd).reshape(heads, hd, w)
    y = jnp.einsum("hbtd,hdw->btw", out, wo,
                   preferred_element_type=jnp.float32)
    return (y + p["bo"].astype(jnp.float32)).astype(cd)


def mlp(x: jnp.ndarray, p: Params, act, compute_dtype: jnp.dtype,
        mlp_impl: str = "xla") -> jnp.ndarray:
    if mlp_impl != "xla" and isinstance(p["w1"], QTensor):
        # one fused Pallas kernel: quant -> int8 w1 -> GELU -> quant ->
        # int8 w2, everything in VMEM (ops/mlp_int8.py). Measured 0.38 vs
        # 0.44 ms/layer for XLA's form at the ViT-B/32 serving batch, but
        # END-TO-END it LOSES (16.71 vs 15.7-16.1 ms/batch on chip):
        # pallas_call inside lax.scan hangs Mosaic here, and the unrolled
        # Python-loop tower forfeits more scan pipelining than the kernel
        # saves at 12 layers. Kept opt-in for deeper towers; default xla.
        from mmrs_tpu.ops.mlp_int8 import mlp_int8_fused

        b, t, w = x.shape
        act_name = "quick_gelu" if act is quick_gelu else "gelu"
        y = mlp_int8_fused(
            x.reshape(b * t, w).astype(compute_dtype),
            p["w1"].q, p["w1"].s, p["b1"], p["w2"].q, p["w2"].s, p["b2"],
            act=act_name,
            interpret=(mlp_impl == "pallas_interpret"))
        return y.reshape(b, t, p["w2"].q.shape[-1])
    h = dense(x, p["w1"], p["b1"], compute_dtype)
    h = act(h)
    return dense(h, p["w2"], p["b2"], compute_dtype)


def pre_ln_block(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    mask: jnp.ndarray | None,
    act,
    compute_dtype: jnp.dtype,
    attn_impl: str = "xla",
    mlp_impl: str = "xla",
) -> jnp.ndarray:
    """CLIP-style pre-LayerNorm residual block."""
    x = x + attention(layer_norm(x, p["ln1_scale"], p["ln1_bias"]), p["attn"],
                      heads, mask, compute_dtype, attn_impl)
    x = x + mlp(layer_norm(x, p["ln2_scale"], p["ln2_bias"]), p["mlp"],
                act, compute_dtype, mlp_impl)
    return x


def scan_blocks(
    x: jnp.ndarray,
    stacked: Params,            # every leaf has leading layer axis L
    heads: int,
    mask: jnp.ndarray | None,
    act,
    compute_dtype: jnp.dtype,
    unroll: int = 1,
    attn_impl: str = "xla",
    mlp_impl: str = "xla",
) -> jnp.ndarray:
    """Run all transformer blocks over stacked per-layer params.

    Default: one lax.scan (single compiled layer, minimal compile time).
    With a Pallas attention or MLP impl the layers run as a Python loop
    over static slices of the stacked params instead — on this platform a
    pallas_call inside lax.scan hangs Mosaic compilation, and the serving
    towers are shallow enough (12-24 layers) that the unrolled graph
    compiles fine.
    """
    if attn_impl.startswith("pallas") or mlp_impl.startswith("pallas"):
        n_layers = jax.tree.leaves(stacked)[0].shape[0]
        h = x
        for i in range(n_layers):
            layer = jax.tree.map(lambda a: a[i], stacked)
            h = pre_ln_block(h, layer, heads, mask, act, compute_dtype,
                             attn_impl, mlp_impl)
        return h

    def body(h, layer_params):
        return pre_ln_block(h, layer_params, heads, mask, act,
                            compute_dtype, attn_impl=attn_impl), None

    out, _ = jax.lax.scan(body, x, stacked, unroll=unroll)
    return out


def init_block_params(key, layers: int, width: int, mlp_ratio: int = 4,
                      dtype=jnp.float32) -> Params:
    """Random init of stacked pre-LN block params (for tests / from-scratch)."""
    ks = jax.random.split(key, 8)
    s = 0.02
    hidden = width * mlp_ratio

    def nrm(k, shape):
        return (jax.random.normal(k, (layers, *shape)) * s).astype(dtype)

    def zeros(shape):
        return jnp.zeros((layers, *shape), dtype)

    def ones(shape):
        return jnp.ones((layers, *shape), dtype)

    return {
        "ln1_scale": ones((width,)), "ln1_bias": zeros((width,)),
        "ln2_scale": ones((width,)), "ln2_bias": zeros((width,)),
        "attn": {
            "wq": nrm(ks[0], (width, width)), "bq": zeros((width,)),
            "wk": nrm(ks[1], (width, width)), "bk": zeros((width,)),
            "wv": nrm(ks[2], (width, width)), "bv": zeros((width,)),
            "wo": nrm(ks[3], (width, width)), "bo": zeros((width,)),
        },
        "mlp": {
            "w1": nrm(ks[4], (width, hidden)), "b1": zeros((hidden,)),
            "w2": nrm(ks[5], (hidden, width)), "b2": zeros((width,)),
        },
    }
