"""Profile the 7B decode loop: per-op device time at b16 p576 pc64 fori.

Pure decode runs ~15.9 ms/step vs the 11.7 ms weights+KV HBM roofline
(bench_vlm; prefill amortization removed). This prints the decode
while-loop's fusion breakdown to itemize the ~4 ms/step gap before any
guessing (CLAUDE.md rule)."""

from __future__ import annotations

import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench_vlm import device_params
from mmrs_tpu.models import llama
from mmrs_tpu.models.llama import LlamaConfig
from mmrs_tpu.utils.profiling import profile_to, trace_op_table


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    new_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = LlamaConfig(max_seq=1024)
    params = device_params(cfg, True)
    b, p = 16, 576

    @jax.jit
    def gen(params, tokens):
        emb = llama.embed_tokens(params, tokens)
        return llama.greedy_generate(
            params, emb, cfg, max_new_tokens=new_tokens, eos_token=-1,
            kv_dtype=jnp.int8, layers="fori", prefill_chunk=64)

    tokens = jax.random.randint(jax.random.key(1), (b, p), 3, 31000,
                                jnp.int32)
    np.asarray(gen(params, tokens))          # compile
    t0 = time.perf_counter()
    np.asarray(gen(params, tokens))
    wall = time.perf_counter() - t0 - 0.027
    log(f"generate wall: {wall*1e3:.1f} ms for prefill + {new_tokens} steps")

    d = tempfile.mkdtemp()
    with profile_to(d):
        np.asarray(gen(params, tokens))
    flat = trace_op_table(d, top=45)
    for name, ms in flat:
        print(f"{ms:10.2f} ms  {name}")

    # itemize each big while's BODY (prefill chunk loop + decode loop)
    # via interval containment — the flat table can't attribute fusions
    whiles = [n for n, ms in flat if n.startswith("while.") and ms > 100]
    for w in whiles:
        print(f"\n=== ops inside {w} (per-generate totals; decode loop "
              f"= /{new_tokens} per step) ===")
        for name, ms in trace_op_table(d, top=25, within=w):
            print(f"{ms:10.2f} ms  {name}")


if __name__ == "__main__":
    main()
