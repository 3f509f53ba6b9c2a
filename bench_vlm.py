"""VLM verifier decode benchmark: greedy tokens/sec, bf16 vs int8 weights.

Measures the llava-v1.5-7b decoder config (LLAMA2_7B) that the cascade
verifier actually serves, plus the 1.1B proxy for roofline context. The
whole prefill+decode loop runs inside ONE jit (lax.scan), so the tunnel
RTT is paid once per generate call.

Weights are random and generated ON DEVICE (13.5 GB must not cross the
tunnel, and the host is a single core); values don't affect step timing.
Decode at small batch is weight-bandwidth-bound: int8 serving weights
(models/quantize.py — same scheme the reference uses via load_8bit=True,
code/test_llava.py:13) halve the bytes per step.
"""

from __future__ import annotations

import gc
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mmrs_tpu.models import llama
from mmrs_tpu.models.layers import QTensor
from mmrs_tpu.models.llama import LLAMA2_7B, LlamaConfig


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_Q_KEYS = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head"}


def device_params(cfg: LlamaConfig, int8: bool, seed=0):
    """Random llama params generated on device, bf16 or int8-quantized."""
    L, D, M = cfg.layers, cfg.dim, cfg.mlp_dim
    kvd = cfg.kv_heads * cfg.head_dim
    shapes = {
        "embed": (cfg.vocab_size, D),
        "blocks": {
            "attn_norm": (L, D),
            "wq": (L, D, D), "wk": (L, D, kvd), "wv": (L, D, kvd),
            "wo": (L, D, D),
            "mlp_norm": (L, D),
            "w_gate": (L, D, M), "w_up": (L, D, M), "w_down": (L, M, D),
        },
        "final_norm": (D,),
        "lm_head": (D, cfg.vocab_size),
    }

    i = [seed * 1000]

    def gen(name, shape):
        i[0] += 1
        key = jax.random.key(i[0])
        if int8 and name in _Q_KEYS:
            q = jax.jit(lambda k: jax.random.randint(
                k, shape, -127, 128, jnp.int8))(key)
            s = jnp.full(shape[:-2] + shape[-1:], 0.0002, jnp.float32)
            return QTensor(q, s)
        if len(shape) > 1:
            return jax.jit(lambda k: jax.random.normal(
                k, shape, jnp.bfloat16) * 0.02)(key)
        return jnp.ones(shape, jnp.bfloat16)

    def walk(node, prefix=""):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        return gen(prefix, node)

    params = walk(shapes)
    jax.block_until_ready(params)
    return params


def bench_decode(cfg, params, label, batch, prompt_len, new_tokens, reps=5,
                 kv_dtype=None, layers="scan", prefill_chunk=None,
                 decode_window=None, decode_attn="xla", prefill_attn="xla"):
    n_bytes = sum(x.nbytes for x in jax.tree.leaves(params))
    log(f"[{label}] params on device: {n_bytes/1e9:.2f} GB")

    @jax.jit
    def gen(params, tokens):
        embeds = llama.embed_tokens(params, tokens)
        return llama.greedy_generate(params, embeds, cfg,
                                     max_new_tokens=new_tokens, eos_token=-1,
                                     kv_dtype=kv_dtype, layers=layers,
                                     prefill_chunk=prefill_chunk,
                                     decode_window=decode_window,
                                     decode_attn=decode_attn,
                                     prefill_attn=prefill_attn)

    tokens = jax.random.randint(jax.random.key(1), (batch, prompt_len),
                                3, 31000, jnp.int32)
    t0 = time.perf_counter()
    np.asarray(gen(params, tokens))
    log(f"[{label}] compile+first: {time.perf_counter()-t0:.1f}s")

    ts = []
    for i in range(reps):
        tk = jax.random.randint(jax.random.key(2 + i), (batch, prompt_len),
                                3, 31000, jnp.int32)
        t0 = time.perf_counter()
        np.asarray(gen(params, tk))
        ts.append(time.perf_counter() - t0)
    from mmrs_tpu.utils.trials import fmt, summarize

    dist = summarize([t - 0.027 for t in ts])  # tunnel RTT per fetch
    med = dist["median"]
    tps = batch * new_tokens / med
    step_ms = med / new_tokens * 1e3
    log(fmt(f"[{label}] decode run", dist, "s")
        + f" -> median {tps:.0f} tokens/s (batch {batch}), "
        f"{step_ms:.2f} ms/step incl. prefill amortized "
        f"(best-run {batch * new_tokens / dist['min']:.0f} tok/s)")
    return tps


def run(cfg, label, int8, batch, kv_dtype=None, prompt_len=64, params=None,
        keep_params=False, layers="scan", prefill_chunk=None,
        new_tokens=64, decode_window=None, decode_attn="xla",
        prefill_attn="xla"):
    owns = params is None
    if owns:
        params = device_params(cfg, int8)
    try:
        tps = round(bench_decode(cfg, params, label, batch, prompt_len,
                                 new_tokens, kv_dtype=kv_dtype, layers=layers,
                                 prefill_chunk=prefill_chunk,
                                 decode_window=decode_window,
                                 decode_attn=decode_attn,
                                 prefill_attn=prefill_attn), 1)
        return (tps, params) if keep_params else tps
    except Exception as e:
        log(f"[{label}] failed:", repr(e))
        return (None, params) if keep_params else None
    finally:
        if owns and not keep_params:
            for leaf in jax.tree.leaves(params):
                leaf.delete()
            gc.collect()


def free(params):
    for leaf in jax.tree.leaves(params):
        leaf.delete()
    gc.collect()


def main() -> None:
    out = {"metric": "vlm_greedy_decode", "unit": "tokens/sec"}

    cfg7 = LlamaConfig(max_seq=1024)         # LLAMA2_7B dims, short cache
    assert (cfg7.dim, cfg7.layers) == (LLAMA2_7B.dim, LLAMA2_7B.layers)
    out["llama7b_int8_bs8"], p7 = run(cfg7, "7B int8", True, 8,
                                      keep_params=True)
    # int8 KV cache: half the per-step KV bytes at the same batch...
    out["llama7b_int8_kv8_bs8"] = run(cfg7, "7B int8+kv8", True, 8,
                                      kv_dtype=jnp.int8, params=p7)
    # ...and the freed HBM admits 2x the batch over the cascade's real
    # ~640-token multimodal prompt shape (576 image tokens + text)
    out["llama7b_int8_kv8_bs16_p576"] = run(
        cfg7, "7B int8+kv8 b16 p576", True, 16, kv_dtype=jnp.int8,
        prompt_len=576, params=p7)
    out["llama7b_int8_bs8_p576"] = run(
        cfg7, "7B int8 b8 p576", True, 8, prompt_len=576, params=p7)
    # unrolled layer loop: per-layer cache buffers update in place in the
    # decode scan's carry — removes the full-cache copy + slice
    # materialization the stacked-cache lax.scan pays every step (~36% of
    # the p576 step, trace-measured; see llama.init_cache_layers)
    out["llama7b_int8_kv8_unroll_bs16_p576"] = run(
        cfg7, "7B int8+kv8 unroll b16 p576", True, 16, kv_dtype=jnp.int8,
        prompt_len=576, params=p7, layers="unroll")
    # + chunked causal prefill: 128-token chunks with statically-sliced
    # cache reads bound the prefill's f32 attention-logits tensor and skip
    # the [B,576,vocab] LM head (last position only)
    out["llama7b_int8_kv8_unroll_pc128_bs16_p576"] = run(
        cfg7, "7B int8+kv8 unroll pc128 b16 p576", True, 16,
        kv_dtype=jnp.int8, prompt_len=576, params=p7, layers="unroll",
        prefill_chunk=128)
    # fori layer loop: the stacked cache rides the loop CARRY and each
    # layer's rows update in place (single-position dynamic_update_slice
    # at (li, ..., pos)) — in-place like unroll but ONE compiled layer
    # body (seconds to compile vs ~3 min unrolled) and no per-layer
    # buffer list. pc64 is the r3 chunk-size sweep optimum (smaller
    # chunks shrink the materialized f32 attention tensors faster than
    # they grow the weight re-streaming: prefill-only 516/532/581/603/
    # 644/720 ms at pc64/96/128/192/288/none). The measured-fast
    # serving config: 667 tok/s (653 at pc128).
    out["llama7b_int8_kv8_fori_pc64_bs16_p576"] = run(
        cfg7, "7B int8+kv8 fori pc64 b16 p576", True, 16,
        kv_dtype=jnp.int8, prompt_len=576, params=p7, layers="fori",
        prefill_chunk=64)
    # + segment-sliced decode reads at the reference verifier's long-
    # generation config (max_new_tokens=512, code/test_llava.py:29):
    # early decode segments stream only the live cache prefix. (No
    # prefill_chunk here — the 64-token prompt is below the chunk size,
    # so chunked prefill would be a no-op.)
    out["llama7b_int8_kv8_unroll_dw128_bs8_p64_new512"] = run(
        cfg7, "7B int8+kv8 unroll dw128 b8 p64 new512", True, 8,
        kv_dtype=jnp.int8, params=p7, layers="unroll",
        new_tokens=512, decode_window=128)
    free(p7)
    # bf16 7B = 13.5 GB: batch 2 like the cascade's verify stage
    out["llama7b_bf16_bs2"] = run(cfg7, "7B bf16", False, 2)

    cfg1 = LlamaConfig(vocab_size=32000, dim=2048, layers=22, heads=32,
                       kv_heads=4, mlp_dim=5632, max_seq=512)
    out["llama1b_bf16_bs8"] = run(cfg1, "1.1B bf16", False, 8)
    out["llama1b_int8_bs8"] = run(cfg1, "1.1B int8", True, 8)

    out["value"] = (out.get("llama7b_int8_kv8_bs8")
                    or out["llama7b_int8_bs8"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
