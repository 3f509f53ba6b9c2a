"""VERDICT r4 #8: where do the "24.5 ms/step" at 7B p576/b16 actually go?

The quoted ms/step (bench_vlm) AMORTIZES PREFILL over the 64 generated
tokens: at pc64 the measured prefill-only is ~516 ms (COVERAGE.md chunk
sweep), i.e. ~8 ms of every "decode step" is really prefill share. This
probe separates the two with a two-point slope fit — time generate() at
N1 and N2 new tokens; slope = pure decode ms/step, intercept = prefill +
fixed overhead — then traces one generate per-op so the residual decode
gap vs the ~11.5 ms weights+KV roofline is attributed to named ops
(convert fusions, cache dynamic_update_slice, attention) instead of
guessed. Serving config throughout: int8 weights + int8 KV, fori layers,
prefill_chunk=64 (the `mmrs cascade` fast path; reference workload is
code/test_llava.py:13 load_8bit=True + union_clip_llava2.py survivors).

Run on the real chip: python scripts/probe_decode_gap.py [--trace]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench_vlm import device_params, log  # noqa: E402
from mmrs_tpu.models import llama  # noqa: E402
from mmrs_tpu.models.llama import LlamaConfig, LLAMA2_7B  # noqa: E402

RTT = 0.027  # tunnel fetch round-trip (CLAUDE.md)


def timed_gen(cfg, params, batch, prompt_len, new_tokens, reps=3,
              trace_dir=None):
    @jax.jit
    def gen(params, tokens):
        embeds = llama.embed_tokens(params, tokens)
        return llama.greedy_generate(
            params, embeds, cfg, max_new_tokens=new_tokens, eos_token=-1,
            kv_dtype=jnp.int8, layers="fori", prefill_chunk=64)

    tokens = jax.random.randint(jax.random.key(1), (batch, prompt_len),
                                3, 31000, jnp.int32)
    t0 = time.perf_counter()
    np.asarray(gen(params, tokens))
    log(f"  [n={new_tokens}] compile+first: {time.perf_counter()-t0:.1f}s")

    if trace_dir is not None:
        from mmrs_tpu.utils.profiling import profile_to
        with profile_to(trace_dir):
            np.asarray(gen(params, tokens))

    ts = []
    for i in range(reps):
        tk = jax.random.randint(jax.random.key(2 + i), (batch, prompt_len),
                                3, 31000, jnp.int32)
        t0 = time.perf_counter()
        np.asarray(gen(params, tk))
        ts.append(time.perf_counter() - t0 - RTT)
    med = sorted(ts)[len(ts) // 2]
    log(f"  [n={new_tokens}] median {med*1e3:.1f} ms "
        f"(all: {['%.0f' % (t*1e3) for t in ts]})")
    return med


def main() -> None:
    do_trace = "--trace" in sys.argv
    cfg = LlamaConfig(max_seq=1024)
    assert (cfg.dim, cfg.layers) == (LLAMA2_7B.dim, LLAMA2_7B.layers)
    params = device_params(cfg, int8=True)
    n_bytes = sum(x.nbytes for x in jax.tree.leaves(params))
    log(f"params on device: {n_bytes/1e9:.2f} GB")

    for batch, plen, tag in ((16, 576, "serving p576/b16"),
                             (8, 64, "roofline-check p64/b8")):
        log(f"== {tag} ==")
        n1, n2 = 16, 80
        t1 = timed_gen(cfg, params, batch, plen, n1)
        trace_dir = f"/tmp/decode_gap_{batch}_{plen}" if (
            do_trace and plen == 576) else None
        t2 = timed_gen(cfg, params, batch, plen, n2, trace_dir=trace_dir)
        step = (t2 - t1) / (n2 - n1)
        prefill = t1 - n1 * step
        amort = (t2 / n2) * 1e3
        log(f"  -> pure decode {step*1e3:.2f} ms/step | prefill+fixed "
            f"{prefill*1e3:.0f} ms | amortized-over-{n2} {amort:.2f} ms/step")
        # weights+KV roofline at 819 GB/s HBM: int8 weights ~6.74 GB +
        # int8 KV (L * 2 * B * S * kv_heads * head_dim bytes, S ~ plen+n2/2)
        w = sum(x.q.nbytes for x in jax.tree.leaves(
            params, is_leaf=lambda x: hasattr(x, "q")) if hasattr(x, "q"))
        s_mid = plen + n2 // 2
        kv = cfg.layers * 2 * batch * s_mid * cfg.kv_heads * cfg.head_dim
        roof = (w + kv) / 819e9 * 1e3
        log(f"  -> roofline {roof:.2f} ms/step (weights {w/1e9:.2f} GB + "
            f"KV {kv/1e9:.2f} GB) | decode gap x{step*1e3/roof:.2f}")

        if trace_dir:
            from mmrs_tpu.utils.profiling import trace_op_table
            rows = trace_op_table(trace_dir, top=40)
            tot = sum(r[1] for r in rows)
            log(f"  per-op device table (n={n2} gen, total {tot:.0f} ms):")
            for name, ms in rows[:30]:
                log(f"    {ms:9.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
