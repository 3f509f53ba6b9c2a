"""Go/no-go probe for int4 decode weights (NEXT.md #4's remaining lever).

Decode is weight-bandwidth-bound: the 7B int8 weights are 6.9 GB/step of
HBM traffic. int4 halves that IF the packed form actually crosses HBM
packed and the unpack/dequant fuses into the dot's operand read. Three
candidates at the 7B MLP shape (the biggest weight stream), batch 16:

  a. int8 baseline      — QTensor path (int8 x int8 MXU dot)
  b. jnp.int4 weights   — native dtype; does XLA keep it packed in HBM?
  c. manual nibble pack — two int4 per int8 byte, unpacked with shifts
                          and dequantized per 128-group, bf16 dot

Per-matmul times vs the byte roofline decide whether an int4 weight
format (or a Pallas unpack-dot kernel) is worth building. Prints one
line per candidate to stdout.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import pipelined_seconds  # noqa: E402

K, N = 4096, 11008     # 7B MLP gate/up shape
B = 16                 # decode batch
GROUP = 128
HBM_GBPS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def report(tag, per_s, nbytes):
    gbps = nbytes / per_s / 1e9
    print(f"{tag}: {per_s*1e6:.1f} us/matmul, weight bytes {nbytes/1e6:.0f}"
          f" MB -> {gbps:.0f} GB/s effective ({gbps/HBM_GBPS*100:.0f}% of"
          f" peak)", flush=True)


def main():
    log(f"devices: {jax.devices()}")
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (K, N), jnp.float32) / 32.0

    # -- a. int8 baseline (the shipped QTensor path) -------------------------
    from mmrs_tpu.models.layers import QTensor, quantize_weight, matmul

    qt = jax.device_put(quantize_weight(w))

    @jax.jit
    def f_int8(x, qt):
        return matmul(x, qt, jnp.bfloat16)

    xs = [x * (1 + i * 1e-3) for i in range(4)]
    per = pipelined_seconds(lambda xx: f_int8(xx, qt), xs * 8,
                            lambda r: np.asarray(r[0, 0], np.float32))
    report("int8_qtensor", per, K * N)

    # -- b. native jnp.int4 --------------------------------------------------
    try:
        w4 = jax.device_put(
            jnp.clip(jnp.round(jnp.asarray(w) * 127), -8, 7).astype(jnp.int4))
        s4 = jnp.float32(1.0 / 127)

        @jax.jit
        def f_int4(x, w4):
            return (jax.lax.dot_general(
                x, w4.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * s4).astype(jnp.bfloat16)

        per = pipelined_seconds(lambda xx: f_int4(xx, w4), xs * 8,
                                lambda r: np.asarray(r[0, 0], np.float32))
        report("native_int4", per, K * N // 2)
    except Exception as e:
        print(f"native_int4: FAILED {e!r}", flush=True)

    # -- c. manual nibble pack + group scales --------------------------------
    # pack rows pairwise: byte = (hi << 4) | (lo & 0xF); group scales along K
    wq = np.clip(np.round(np.asarray(w) * 15), -8, 7).astype(np.int8)
    lo = wq[0::2] & 0xF
    hi = wq[1::2] & 0xF
    packed = jax.device_put(jnp.asarray((hi << 4) | lo, jnp.int8))  # [K/2, N]
    gscale = jax.device_put(
        jnp.ones((K // GROUP, N), jnp.bfloat16) / 15.0)

    @jax.jit
    def f_packed(x, packed, gscale):
        b = packed.astype(jnp.int8)
        lo = jnp.left_shift(b, 4)
        lo = jnp.right_shift(lo, 4)                      # sign-extended low
        hi = jnp.right_shift(b, 4)                       # arithmetic high
        w = jnp.stack([lo, hi], axis=1).reshape(K, N)    # interleave rows
        w = w.reshape(K // GROUP, GROUP, N).astype(jnp.bfloat16)
        w = (w * gscale[:, None, :]).reshape(K, N)
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    per = pipelined_seconds(lambda xx: f_packed(xx, packed, gscale), xs * 8,
                            lambda r: np.asarray(r[0, 0], np.float32))
    report("packed_nibble_xla", per, K * N // 2 + (K // GROUP) * N * 2)

    # correctness spot check of the unpack (vs numpy reference)
    ref = (wq.astype(np.float32).reshape(K // GROUP, GROUP, N)
           * (np.ones((K // GROUP, 1, N), np.float32) / 15.0)).reshape(K, N)
    got = np.asarray(f_packed(x, packed, gscale), np.float32)
    want = np.asarray(x, np.float32) @ ref
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    print(f"packed unpack correctness: rel err {err:.4f}", flush=True)

    # -- d. decode-shape sanity: time 3 MLP mats back to back ----------------
    t0 = time.perf_counter()


if __name__ == "__main__":
    main()
