"""A/B the Pallas causal chunk-attention prefill vs the XLA einsum path.

Isolates prefill cost (max_new_tokens=1: prefill + one decode step) and
then runs the full 7B serving config (int8+kv8, fori, pc128, b16, p576)
both ways. The XLA chunked prefill materializes the [B,KVH,G,C,S] f32
logits/probs plus a per-layer stacked-cache slice-out every layer;
chunk_attention keeps both in VMEM (ops/decode_attention.py).
"""

from __future__ import annotations

import json
import sys

import jax.numpy as jnp

from bench_vlm import device_params, free, run
from mmrs_tpu.models.llama import LlamaConfig, LLAMA2_7B


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    out = {"metric": "vlm_prefill_ab", "unit": "tokens/sec"}
    cfg7 = LlamaConfig(max_seq=1024)
    assert (cfg7.dim, cfg7.layers) == (LLAMA2_7B.dim, LLAMA2_7B.layers)
    p7 = device_params(cfg7, True)

    common = dict(kv_dtype=jnp.int8, prompt_len=576, params=p7,
                  layers="fori", prefill_chunk=128)
    # prefill-dominated: one decode step after the 576-token prompt
    for pa in ("xla", "pallas"):
        out[f"prefill_only_{pa}_b16_p576"] = run(
            cfg7, f"7B prefill-only {pa} b16 p576", True, 16,
            new_tokens=1, prefill_attn=pa, **common)
    # the full serving config (new_tokens=64 default)
    for pa in ("xla", "pallas"):
        out[f"serving_{pa}_b16_p576"] = run(
            cfg7, f"7B serving {pa} b16 p576", True, 16,
            prefill_attn=pa, **common)
    # unchunked prefill (single 576-row chunk) — the kernel's best case
    # for DMA amortization, the XLA path's worst f32-materialization case
    for pa in ("xla", "pallas"):
        out[f"nochunk_{pa}_b16_p576"] = run(
            cfg7, f"7B nochunk {pa} b16 p576", True, 16, new_tokens=1,
            prefill_attn=pa, **dict(common, prefill_chunk=None))
    # chunk-size sweep (XLA path): smaller chunks shrink the materialized
    # f32 attention tensors, more chunks re-stream the 6.88 GB weights —
    # pc64 measured optimal (516 ms; see COVERAGE.md for the full sweep)
    for pc in (64, 192):
        out[f"prefill_only_xla_pc{pc}_b16_p576"] = run(
            cfg7, f"7B prefill-only xla pc{pc} b16 p576", True, 16,
            new_tokens=1, prefill_attn="xla",
            **dict(common, prefill_chunk=pc))
    free(p7)
    out["value"] = out.get("serving_pallas_b16_p576")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
