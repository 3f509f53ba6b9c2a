"""Probe attention formulations to kill the q/k/v layout copies (r5 #1).

Trace receipts (scripts/probe_int8_tower.py): the int8 ViT-B/32 body pays
2.9 ms/batch of bf16[224,12,50,64] {0,3,2,1}->{3,2,1,0} operand copies on
q/k/v plus 1.1 ms of f32 relayout copies feeding _quantize_act; bf16 pays
2.6 ms of the same qkv copies. The projections' epilogues emit batch-in-
lanes layouts the score matmul's emitter won't consume. Each variant here
re-expresses the einsum chain so layout assignment can agree end-to-end;
the probe times the FULL embed per variant on the real chip.

Run: python scripts/probe_attn_layouts.py [bf16|int8] [v0 v1 v2 ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import mmrs_tpu.models.layers as L
from mmrs_tpu.models.layers import QTensor, _quantize_act, dense


def _attention_variant(variant: str):
    def attention(x, p, heads, mask, compute_dtype, attn_impl="xla"):
        b, t, w = x.shape
        hd = w // heads
        cd = compute_dtype
        scale = jnp.asarray(1.0 / np.sqrt(hd), cd)
        int8 = isinstance(p["wq"], QTensor)

        if variant == "v1":
            # natural [B,T,H,d]: plain dense + reshape (bitcast), einsums
            # carry the head batch dim in position 2 on both operands
            if int8:
                xq, sx = _quantize_act(x)
                q = L._int8_matmul(xq, sx, p["wq"], p["bq"], cd)
                k = L._int8_matmul(xq, sx, p["wk"], p["bk"], cd)
                v = L._int8_matmul(xq, sx, p["wv"], p["bv"], cd)
            else:
                q = dense(x, p["wq"], p["bq"], cd)
                k = dense(x, p["wk"], p["bk"], cd)
                v = dense(x, p["wv"], p["bv"], cd)
            q = (q * scale).reshape(b, t, heads, hd)
            k = k.reshape(b, t, heads, hd)
            v = v.reshape(b, t, heads, hd)
            logits = jnp.einsum("bthd,bshd->bhts", q, k,
                                preferred_element_type=jnp.float32)
            if mask is not None:
                logits = logits + mask.astype(jnp.float32)
            probs = jax.nn.softmax(logits.astype(cd), axis=-1)
            out = jnp.einsum("bhts,bshd->bthd", probs, v,
                             preferred_element_type=jnp.float32).astype(cd)
            return dense(out.reshape(b, t, w), p["wo"], p["bo"], cd)

        if variant == "v2":
            # head-OUTERMOST [H,B,T,d]: batch dims are the two major dims,
            # the physical layout a standard batched matmul wants
            if int8:
                xq, sx = _quantize_act(x)
                sxh = sx.reshape(1, b, t, 1)

                def proj(kernel, bias):
                    acc = jnp.einsum(
                        "btw,whd->hbtd", xq, kernel.q.reshape(w, heads, hd),
                        preferred_element_type=jnp.int32)
                    y = (acc.astype(jnp.float32) * sxh
                         * kernel.s.astype(jnp.float32).reshape(
                             heads, 1, 1, hd))
                    return y + bias.astype(jnp.float32).reshape(
                        heads, 1, 1, hd)
            else:
                xc = x.astype(cd)

                def proj(kernel, bias):
                    y = jnp.einsum("btw,whd->hbtd", xc,
                                   kernel.astype(cd).reshape(w, heads, hd),
                                   preferred_element_type=jnp.float32)
                    return y + bias.astype(jnp.float32).reshape(
                        heads, 1, 1, hd)

            q = proj(p["wq"], p["bq"]).astype(cd) * scale
            k = proj(p["wk"], p["bk"]).astype(cd)
            v = proj(p["wv"], p["bv"]).astype(cd)
            logits = jnp.einsum("hbtd,hbsd->hbts", q, k,
                                preferred_element_type=jnp.float32)
            if mask is not None:
                logits = logits + mask.astype(jnp.float32)
            probs = jax.nn.softmax(logits.astype(cd), axis=-1)
            out = jnp.einsum("hbts,hbsd->hbtd", probs, v,
                             preferred_element_type=jnp.float32).astype(cd)
            if int8:
                out = out.transpose(1, 2, 0, 3).reshape(b, t, w)
                return dense(out, p["wo"], p["bo"], cd)
            wo = p["wo"].astype(cd).reshape(heads, hd, w)
            y = jnp.einsum("hbtd,hdw->btw", out, wo,
                           preferred_element_type=jnp.float32)
            return (y + p["bo"].astype(jnp.float32)).astype(cd)

        if variant == "v3":
            # fused QKV: one [W, 3W] int8/bf16 matmul (3x fewer act-quant
            # passes in int8; one epilogue instead of three), then v1 math
            wq, wk, wv = p["wq"], p["wk"], p["wv"]
            if int8:
                qkv_k = QTensor(jnp.concatenate([wq.q, wk.q, wv.q], axis=1),
                                jnp.concatenate([wq.s, wk.s, wv.s], axis=0))
            else:
                qkv_k = jnp.concatenate([wq, wk, wv], axis=1)
            bias = jnp.concatenate([p["bq"], p["bk"], p["bv"]], axis=0)
            qkv = dense(x, qkv_k, bias, cd)                # [B, T, 3W]
            q = qkv[..., :w] * scale
            k = qkv[..., w:2 * w]
            v = qkv[..., 2 * w:]
            q = q.reshape(b, t, heads, hd)
            k = k.reshape(b, t, heads, hd)
            v = v.reshape(b, t, heads, hd)
            logits = jnp.einsum("bthd,bshd->bhts", q, k,
                                preferred_element_type=jnp.float32)
            if mask is not None:
                logits = logits + mask.astype(jnp.float32)
            probs = jax.nn.softmax(logits.astype(cd), axis=-1)
            out = jnp.einsum("bhts,bshd->bthd", probs, v,
                             preferred_element_type=jnp.float32).astype(cd)
            return dense(out.reshape(b, t, w), p["wo"], p["bo"], cd)

        if variant == "v4":
            # fused QKV projection + head-outermost score math: one
            # [W, 3W] matmul emitting [3H, B, T, d] directly
            wq, wk, wv = p["wq"], p["wk"], p["wv"]
            bias3 = jnp.concatenate(
                [p["bq"], p["bk"], p["bv"]], axis=0).reshape(
                    3 * heads, 1, 1, hd)
            if int8:
                qk = jnp.concatenate([wq.q, wk.q, wv.q], axis=1)
                sk = jnp.concatenate([wq.s, wk.s, wv.s], axis=0)
                xq, sx = _quantize_act(x)
                acc = jnp.einsum(
                    "btw,whd->hbtd", xq, qk.reshape(w, 3 * heads, hd),
                    preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32) * sx.reshape(1, b, t, 1)
                     * sk.astype(jnp.float32).reshape(3 * heads, 1, 1, hd))
                qkv = (y + bias3.astype(jnp.float32)).astype(cd)
            else:
                qkv = jnp.einsum(
                    "btw,whd->hbtd", x.astype(cd),
                    jnp.concatenate([wq, wk, wv], axis=1).astype(cd)
                    .reshape(w, 3 * heads, hd),
                    preferred_element_type=jnp.float32)
                qkv = (qkv + bias3.astype(jnp.float32)).astype(cd)
            q = qkv[:heads] * scale
            k = qkv[heads:2 * heads]
            v = qkv[2 * heads:]
            logits = jnp.einsum("hbtd,hbsd->hbts", q, k,
                                preferred_element_type=jnp.float32)
            if mask is not None:
                logits = logits + mask.astype(jnp.float32)
            probs = jax.nn.softmax(logits.astype(cd), axis=-1)
            out = jnp.einsum("hbts,hbsd->hbtd", probs, v,
                             preferred_element_type=jnp.float32).astype(cd)
            if int8:
                out = out.transpose(1, 2, 0, 3).reshape(b, t, w)
                return dense(out, p["wo"], p["bo"], cd)
            wo = p["wo"].astype(cd).reshape(heads, hd, w)
            y = jnp.einsum("hbtd,hdw->btw", out, wo,
                           preferred_element_type=jnp.float32)
            return (y + p["bo"].astype(jnp.float32)).astype(cd)

        raise ValueError(variant)

    return attention


def run(int8: bool, variants):
    sys.path.insert(0, "/root/repo")
    from scripts.probe_int8_tower import build

    orig = L.attention
    results = {}
    for v in variants:
        if v != "v0":
            L.attention = _attention_variant(v)
        try:
            embed, params, img = build(int8)
            np.asarray(embed(params, img)[0, 0], np.float32)   # compile
            # pipelined timing (CLAUDE.md: never per-call block timing)
            for _ in range(2):
                np.asarray(embed(params, img)[0, 0], np.float32)
            t0 = time.perf_counter()
            out = None
            for _ in range(24):
                out = embed(params, img)
            np.asarray(out[0, 0], np.float32)
            total = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(embed(params, img)[0, 0], np.float32)
            single = time.perf_counter() - t0
            per = (total - single) / 23
            results[v] = per
            tag = "int8" if int8 else "bf16"
            print(f"{tag} {v}: {per*1e3:.2f} ms/batch "
                  f"({224/per:.0f} img/s)", flush=True)
        finally:
            L.attention = orig
    return results


if __name__ == "__main__":
    args = sys.argv[1:]
    dt = args[0] if args else "int8"
    variants = args[1:] or ["v0", "v1", "v2", "v3"]
    run(dt == "int8", variants)
