"""Speculative decoding mechanics benchmark: 7B target + 1.1B draft.

With random weights the measured acceptance rate is meaningless (two
unrelated random models rarely agree), so alongside the measured tok/s
this bench reports the MECHANICS — seconds per speculation round (k draft
steps + one k+1-token target verify) vs seconds per plain decode step —
and derives the implied tokens/s as a function of per-draft acceptance
probability alpha:

    E[tokens/round] = sum_{i=0..k-1} alpha^i + alpha^k   (accepted + bonus)
    tok/s(alpha)    = E[tokens/round] / round_seconds

Real acceptance needs real weights (the verifier's yes/no answers are
exactly the regime where a small draft agrees often); the break-even
alpha printed below is what the draft must clear on real checkpoints.

Run: python bench_spec.py  (one real TPU chip; ~10 min of compiles cold)
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench_vlm import device_params, free, log
from mmrs_tpu.models import llama
from mmrs_tpu.models.llama import LlamaConfig
from mmrs_tpu.models.speculative import speculative_generate

CFG7 = LlamaConfig(max_seq=1024)
CFG1 = dataclasses.replace(llama.LLAMA_1B, max_seq=1024)


def main() -> None:
    k = int(sys.argv[sys.argv.index("--k") + 1]) if "--k" in sys.argv else 4
    batch, prompt_len, new_tokens = 8, 64, 64
    kw = dict(kv_dtype=jnp.int8, layers="fori")

    p7 = device_params(CFG7, True)
    p1 = device_params(CFG1, True, seed=7)

    tok = jax.random.randint(jax.random.key(1), (batch, prompt_len),
                             3, 31000, jnp.int32)

    @jax.jit
    def plain(p, tok):
        e = llama.embed_tokens(p, tok)
        return llama.greedy_generate(p, e, CFG7, max_new_tokens=new_tokens,
                                     eos_token=-1, **kw)

    @jax.jit
    def spec(pt, pd, tok):
        return speculative_generate(
            pt, pd, llama.embed_tokens(pt, tok), llama.embed_tokens(pd, tok),
            CFG7, CFG1, max_new_tokens=new_tokens, draft_tokens=k,
            eos_token=-1, return_stats=True, **kw)

    def best_seconds(fn, *args, reps=4):
        np.asarray(fn(*args))                     # compile + first
        ts = []
        for i in range(reps):
            t2 = jax.random.randint(jax.random.key(5 + i),
                                    (batch, prompt_len), 3, 31000, jnp.int32)
            t0 = time.perf_counter()
            np.asarray(fn(*args[:-1], t2))
            ts.append(time.perf_counter() - t0)
        return min(ts) - 0.027                    # tunnel RTT

    t0 = time.perf_counter()
    plain_s = best_seconds(plain, p7, tok)
    log(f"plain 7B greedy: {batch*new_tokens/plain_s:.0f} tok/s "
        f"({plain_s/new_tokens*1e3:.2f} ms/step) "
        f"[compile+bench {time.perf_counter()-t0:.0f}s]")

    # measured speculative run (random-weight acceptance — a floor)
    t0 = time.perf_counter()
    got, stats = spec(p7, p1, tok)
    got = np.asarray(got)
    log(f"spec compile+first: {time.perf_counter()-t0:.0f}s")
    # Random-weight acceptance varies wildly per input (greedy loops on
    # random models can fall into shared attractors and accept every
    # draft), so keep each run's (seconds, rounds) PAIRED — reporting
    # min(time) next to another run's stats would be incoherent.
    runs = []
    for i in range(3):
        t2 = jax.random.randint(jax.random.key(9 + i), (batch, prompt_len),
                                3, 31000, jnp.int32)
        t0 = time.perf_counter()
        o2, s2 = spec(p7, p1, t2)
        np.asarray(o2)
        secs = time.perf_counter() - t0 - 0.027
        rr = int(np.asarray(s2["rounds"]))
        em = int(np.asarray(s2["emitted"]).sum())
        runs.append((secs, rr, em))
        log(f"run {i}: {secs*1e3:.0f} ms, {rr} rounds, {em} tokens "
            f"({em/max(rr*batch,1):.2f} tok/round/row of max {k+1}, "
            f"{em/secs:.0f} tok/s)")
    spec_s, rounds, emitted = min(runs)          # fastest run, own stats
    spec_tps = emitted / spec_s
    tokens_per_round = emitted / max(rounds * batch, 1)
    measured_round_ms = spec_s / max(rounds, 1) * 1e3

    # exactness gate on chip: same tokens as plain greedy
    want = np.asarray(plain(p7, tok))
    agree = float((got == want).mean())
    log(f"on-chip exactness vs plain greedy: {agree:.4f}")

    # mechanics: time one draft step and one k+1 verify in isolation by
    # differencing k: rounds(k) - rounds(k-? ) is noisy, so measure the
    # components directly with the same shapes instead.
    cache_len = ((prompt_len + new_tokens + k + 63) // 64) * 64

    @jax.jit
    def draft_steps(p, tok):
        lg, cache = llama.prefill(p, llama.embed_tokens(p, tok), CFG1,
                                  cache_len, jnp.bfloat16, jnp.int8,
                                  "fori")
        cur = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        pos = jnp.full((batch,), prompt_len, jnp.int32)

        def body(c, j):
            cur, cache = c
            lg, cache = llama.forward(p, llama.embed_tokens(p, cur[:, None]),
                                      cache, pos + j, CFG1, jnp.bfloat16,
                                      layers="fori")
            return (jnp.argmax(lg[:, -1], -1).astype(jnp.int32), cache), cur

        (cur, _), toks = jax.lax.scan(body, (cur, cache),
                                      jnp.arange(64, dtype=jnp.int32))
        return toks

    @jax.jit
    def verify_steps(p, tok):
        lg, cache = llama.prefill(p, llama.embed_tokens(p, tok), CFG7,
                                  cache_len, jnp.bfloat16, jnp.int8,
                                  "fori")
        cur = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        pos = jnp.full((batch,), prompt_len, jnp.int32)
        seq0 = jnp.broadcast_to(cur[:, None], (batch, k + 1))

        def body(c, j):
            seq, cache = c
            lg, cache = llama.forward(p, llama.embed_tokens(p, seq), cache,
                                      pos + j, CFG7, jnp.bfloat16,
                                      layers="fori")
            return (jnp.argmax(lg, -1).astype(jnp.int32), cache), seq[:, 0]

        (_, _), toks = jax.lax.scan(body, (seq0, cache),
                                    jnp.arange(16, dtype=jnp.int32))
        return toks

    dsteps = best_seconds(draft_steps, p1, tok, reps=3)
    draft_ms = dsteps / 64 * 1e3
    vsteps = best_seconds(verify_steps, p7, tok, reps=3)
    verify_ms = vsteps / 16 * 1e3
    round_ms = k * draft_ms + verify_ms
    plain_ms = plain_s / new_tokens * 1e3

    def tps_at(alpha):
        e_tokens = sum(alpha ** i for i in range(k)) + alpha ** k
        return batch * e_tokens / (round_ms / 1e3)

    # alpha where spec == plain
    lo, hi = 0.0, 1.0
    for _ in range(40):
        mid = (lo + hi) / 2
        if tps_at(mid) < batch / (plain_ms / 1e3):
            lo = mid
        else:
            hi = mid
    breakeven = (lo + hi) / 2

    free(p7)
    free(p1)
    out = {
        "metric": "speculative_decode_7b_with_1b_draft",
        "unit": "tokens/sec",
        "k": k, "batch": batch,
        "plain_ms_per_token": round(plain_ms, 2),
        "draft_ms_per_step": round(draft_ms, 2),
        "verify_ms_per_round": round(verify_ms, 2),
        "round_ms": round(round_ms, 2),
        "measured_spec_tokens_per_s": round(spec_tps, 1),
        "measured_tokens_per_round": round(tokens_per_round, 2),
        "measured_round_ms": round(measured_round_ms, 2),
        "exactness_vs_plain": agree,
        "breakeven_alpha": round(breakeven, 3),
        "tok_per_s_at_alpha": {str(a): round(tps_at(a), 0)
                               for a in (0.5, 0.7, 0.8, 0.9, 1.0)},
        "value": round(tps_at(0.8), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
