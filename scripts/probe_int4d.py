"""Probe 5: block-size sweep for the i32-masked dual-dot int4 kernel.

probe_int4c: time scales with GRID STEPS (~2.9 us/step), not bytes —
bn=256 -> 0.93x vs int8 but bn=512 -> 1.8x. Sweep bn over divisors of N
(lane-aligned) on the two 7B decode shapes, with the int8 QTensor stream
re-timed IN THE SAME PROCESS for a fair ratio (the baseline swings
288-573 GB/s across processes). Also B=1 latency case.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import pipelined_seconds  # noqa: E402
from scripts.probe_int4c import masked_dual_i32, pack_words, quant_rows  # noqa: E402
from mmrs_tpu.models.layers import QTensor, matmul  # noqa: E402

L = 8
G = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_int8(B, K, N, x):
    q8 = jax.jit(lambda k: jax.random.randint(
        k, (L, K, N), -127, 128, jnp.int8))(jax.random.key(1))
    s8 = jnp.full((L, N), 2e-4, jnp.float32)

    @jax.jit
    def f(x, q8, s8):
        out = jnp.zeros((B, N), jnp.float32)
        for i in range(L):
            out = out + matmul(x, QTensor(q8[i], s8[i]), jnp.bfloat16,
                               jnp.float32)
        return out[0, :8]

    xs = [x * (1 + i * 1e-3) for i in range(4)]
    return pipelined_seconds(lambda xx: f(xx, q8, s8), xs * 6,
                             lambda r: np.asarray(r[0], np.float32)) / L


def time_int4(B, K, N, x, bn):
    p4 = jax.jit(lambda k: jax.random.randint(
        k, (L, K // 8, N), -2**31, 2**31 - 1, jnp.int32))(jax.random.key(2))
    s4 = jnp.full((L, K // G, N), 1e-3, jnp.float32)
    fn = functools.partial(masked_dual_i32, group=G, bn=bn)

    @jax.jit
    def f(x, p4, s4):
        xq, sx = quant_rows(x)
        out = jnp.zeros((B, N), jnp.float32)
        for i in range(L):
            out = out + fn(xq, sx, p4[i], s4[i])
        return out[0, :8]

    xs = [x * (1 + i * 1e-3) for i in range(4)]
    return pipelined_seconds(lambda xx: f(xx, p4, s4), xs * 6,
                             lambda r: np.asarray(r[0], np.float32)) / L


def main():
    log(f"devices: {jax.devices()}")
    for B, K, N, bns in [
        (16, 4096, 11008, (256, 688, 1376, 2752, 5504)),
        (16, 11008, 4096, (256, 512, 1024, 2048, 4096)),
        (1, 4096, 11008, (1376, 2752, 5504)),
    ]:
        x = jax.random.normal(jax.random.key(0), (B, K), jnp.bfloat16)
        per8 = time_int8(B, K, N, x)
        print(f"[B{B} {K}x{N}] int8: {per8*1e6:.1f} us -> "
              f"{K*N/per8/1e9:.0f} GB/s", flush=True)
        nb = K * N // 2 + (K // G) * N * 4
        for bn in bns:
            if N % bn:
                continue
            try:
                per = time_int4(B, K, N, x, bn)
                print(f"[B{B} {K}x{N}] int4 bn{bn}: {per*1e6:.1f} us -> "
                      f"{nb/per/1e9:.0f} GB/s packed; {per8/per:.2f}x vs int8",
                      flush=True)
            except Exception as e:
                print(f"[B{B} {K}x{N}] int4 bn{bn}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
