"""VLM verifier decode benchmark: greedy tokens/sec on a 1.1B decoder.

Secondary benchmark (the headline lives in bench.py). Sizes follow a
TinyLlama-class config; the whole prefill+decode loop runs inside ONE jit
(lax.scan), so the tunnel RTT is paid once per generate call.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mmrs_tpu.models import llama
from mmrs_tpu.models.llama import LlamaConfig


def main() -> None:
    cfg = LlamaConfig(vocab_size=32000, dim=2048, layers=22, heads=32,
                      kv_heads=4, mlp_dim=5632, max_seq=512)
    batch, prompt_len, new_tokens = 8, 64, 64

    print("init params (host numpy)...", file=sys.stderr, flush=True)
    import ml_dtypes

    rng = np.random.default_rng(0)

    def nrm(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * 0.02).astype(
            ml_dtypes.bfloat16)

    L, D, M = cfg.layers, cfg.dim, cfg.mlp_dim
    kvd = cfg.kv_heads * cfg.head_dim
    params = {
        "embed": nrm(cfg.vocab_size, D),
        "blocks": {
            "attn_norm": np.ones((L, D), ml_dtypes.bfloat16),
            "wq": nrm(L, D, D), "wk": nrm(L, D, kvd), "wv": nrm(L, D, kvd),
            "wo": nrm(L, D, D),
            "mlp_norm": np.ones((L, D), ml_dtypes.bfloat16),
            "w_gate": nrm(L, D, M), "w_up": nrm(L, D, M),
            "w_down": nrm(L, M, D),
        },
        "final_norm": np.ones((D,), ml_dtypes.bfloat16),
        "lm_head": nrm(D, cfg.vocab_size),
    }
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    print("params on device", file=sys.stderr, flush=True)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"{n_params/1e9:.2f}B params", file=sys.stderr, flush=True)

    @jax.jit
    def gen(params, tokens):
        embeds = llama.embed_tokens(params, tokens)
        return llama.greedy_generate(params, embeds, cfg,
                                     max_new_tokens=new_tokens, eos_token=-1)

    tokens = jax.random.randint(jax.random.key(1), (batch, prompt_len),
                                3, 31000, jnp.int32)
    t0 = time.perf_counter()
    out = gen(params, tokens)
    _ = np.asarray(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    ts = []
    for i in range(5):
        tk = jax.random.randint(jax.random.key(2 + i), (batch, prompt_len),
                                3, 31000, jnp.int32)
        t0 = time.perf_counter()
        out = gen(params, tk)
        _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts) - 0.027  # tunnel RTT
    tps = batch * new_tokens / best
    step_ms = best / new_tokens * 1e3
    print(f"decode: {tps:.0f} tokens/s (batch {batch}), "
          f"{step_ms:.2f} ms/step incl. prefill amortized",
          file=sys.stderr, flush=True)
    import json

    print(json.dumps({"metric": "llama1b_greedy_decode", "value": round(tps, 1),
                      "unit": "tokens/sec", "batch": batch}))


if __name__ == "__main__":
    main()
