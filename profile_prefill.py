"""Profile the 7B verifier prefill: per-op device time at b16 p576.

The cascade's verify packs run max_new=8 with early stop (~4 decode
steps), so prefill is the dominant verifier cost (564 ms vs ~60 ms of
decode per pack at the serving config). Aggregate int8 dot throughput
is ~216 TFLOP/s vs the v5e's ~394 int8 peak — this prints where the
rest goes before any guessing (CLAUDE.md rule; the same table found the
ViT transpose copies)."""

from __future__ import annotations

import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from bench_vlm import device_params
from mmrs_tpu.models import llama
from mmrs_tpu.models.llama import LLAMA2_7B, LlamaConfig
from mmrs_tpu.utils.profiling import profile_to, trace_op_table


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    pa = sys.argv[2] if len(sys.argv) > 2 else "xla"
    cfg = LlamaConfig(max_seq=1024)
    assert cfg.dim == LLAMA2_7B.dim
    params = device_params(cfg, True)
    b, p = 16, 576

    @jax.jit
    def pf(params, tokens):
        emb = llama.embed_tokens(params, tokens)
        logits, cache = llama.prefill(
            params, emb, cfg, 640, jnp.bfloat16, jnp.int8, "fori",
            chunk if chunk > 0 else None, prefill_attn=pa)
        return logits

    tokens = jax.random.randint(jax.random.key(1), (b, p), 3, 31000,
                                jnp.int32)
    np.asarray(pf(params, tokens))          # compile
    import time
    t0 = time.perf_counter()
    for _ in range(3):
        out = pf(params, tokens)
    np.asarray(out)
    log(f"prefill wall: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms "
        f"(chunk={chunk}, prefill_attn={pa})")

    d = tempfile.mkdtemp()
    with profile_to(d):
        np.asarray(pf(params, tokens))
    for name, ms in trace_op_table(d, top=30):
        print(f"{ms:10.2f} ms  {name}")


if __name__ == "__main__":
    main()
