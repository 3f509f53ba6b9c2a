"""Probe 2: Pallas unpack-dot kernel for int4 decode weights.

probe_int4.py showed XLA cannot fuse the nibble unpack into the dot (6x
slower, full bf16 weight materialized) and native jnp.int4 device_put
crashes on this platform. This probes the remaining candidate: a Pallas
kernel that DMAs the PACKED bytes HBM->VMEM, unpacks + dequantizes
per 128-group in VMEM, and dots against the decode activations.

Methodology per CLAUDE.md: never per-call timing — loop L stacked layers
INSIDE one jit (python-unrolled over slices of a stacked [L, K/2, N]
buffer, like the decode weight stream) and compare against the shipped
int8 QTensor path over [L, K, N]. Effective GB/s = streamed bytes / time.

Packing = halves layout: byte row i holds logical rows i (lo nibble) and
i + K/2 (hi nibble); group scales g in [0, K/G) split as lo -> g,
hi -> g + K/(2G). No interleave needed in-kernel.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, ".")
from bench import pipelined_seconds  # noqa: E402

K, N = 4096, 11008
B = 16
GROUP = 128
L = 8                     # stacked layers streamed per jit call
BN = 256                  # N tile per grid step
HBM_GBPS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pack_halves(w_q: np.ndarray) -> np.ndarray:
    """[K, N] int8 in [-7,7] -> [K/2, N] packed bytes (halves layout)."""
    k = w_q.shape[0]
    lo = w_q[: k // 2] & 0xF
    hi = w_q[k // 2:] & 0xF
    return ((hi << 4) | lo).astype(np.int8)


def _kernel(x_ref, p_ref, s_ref, o_ref, *, groups_half: int, group: int):
    """One [B, BN] output tile: x [B, K] @ unpack(p [K/2, BN]) * s [K/G, BN]."""
    acc = jnp.zeros((x_ref.shape[0], o_ref.shape[1]), jnp.float32)
    for g in range(groups_half):
        # Mosaic can't legalize int8 vector shifts (arith.shli on i8) —
        # unpack via i32, where shifts lower fine.
        b = p_ref[g * group:(g + 1) * group, :].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(b, 28), 28).astype(jnp.bfloat16)
        hi = jnp.right_shift(b, 4).astype(jnp.bfloat16)
        w_lo = lo * s_ref[g, :][None, :].astype(jnp.bfloat16)
        w_hi = hi * s_ref[g + groups_half, :][None, :].astype(jnp.bfloat16)
        x_lo = x_ref[:, g * group:(g + 1) * group]
        x_hi = x_ref[:, groups_half * group + g * group:
                     groups_half * group + (g + 1) * group]
        acc += jax.lax.dot_general(
            x_lo, w_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            x_hi, w_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:, :] = acc.astype(o_ref.dtype)


def int4_matmul(x, packed, scales, bn=BN):
    k2, n = packed.shape
    groups_half = k2 // GROUP
    kern = functools.partial(_kernel, groups_half=groups_half, group=GROUP)
    return pl.pallas_call(
        kern,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((x.shape[0], 2 * k2), lambda j: (0, 0)),
            pl.BlockSpec((k2, bn), lambda j: (0, j)),
            pl.BlockSpec((scales.shape[0], bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((x.shape[0], bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n), jnp.bfloat16),
    )(x, packed, scales)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # correctness on small shape first (interpret=False on-chip, tiny)
    ks, ns, ls = 512, 512, 1
    wq = rng.integers(-7, 8, (ks, ns), dtype=np.int8)
    s = (rng.random((ks // GROUP, ns), dtype=np.float32) + 0.5) / 15.0
    x = (rng.random((B, ks), dtype=np.float32) - 0.5).astype(jnp.bfloat16)
    packed = jax.device_put(jnp.asarray(pack_halves(wq)))
    sd = jax.device_put(jnp.asarray(s))
    xd = jax.device_put(jnp.asarray(x))
    got = np.asarray(jax.jit(int4_matmul)(xd, packed, sd), np.float32)
    sref = np.repeat(s, GROUP, axis=0)
    want = np.asarray(x, np.float32) @ (wq.astype(np.float32) * sref)
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    print(f"kernel correctness (512x512): rel err {rel:.4f}", flush=True)
    assert rel < 0.05, "kernel unpack wrong"

    # --- streaming comparison: L stacked layers inside one jit -------------
    from mmrs_tpu.models.layers import QTensor, matmul

    key = jax.random.key(0)
    x = jax.random.normal(key, (B, K), jnp.bfloat16)

    # int8 stacked stream
    q8 = jax.jit(lambda k: jax.random.randint(
        k, (L, K, N), -127, 128, jnp.int8))(jax.random.key(1))
    s8 = jnp.full((L, N), 2e-4, jnp.float32)

    @jax.jit
    def f_int8(x, q8, s8):
        y = x
        out = jnp.zeros((B, N), jnp.float32)
        for i in range(L):
            out = out + matmul(y, QTensor(q8[i], s8[i]), jnp.bfloat16,
                               jnp.float32)
        return out[0, :8]

    xs = [x * (1 + i * 1e-3) for i in range(4)]
    per = pipelined_seconds(lambda xx: f_int8(xx, q8, s8), xs * 6,
                            lambda r: np.asarray(r[0], np.float32)) / L
    nbytes8 = K * N
    print(f"int8_stream: {per*1e6:.1f} us/matmul -> "
          f"{nbytes8/per/1e9:.0f} GB/s ({nbytes8/per/1e9/HBM_GBPS*100:.0f}%"
          f" of peak)", flush=True)

    # int4 packed stacked stream
    p4 = jax.jit(lambda k: jax.random.randint(
        k, (L, K // 2, N), -128, 128, jnp.int8))(jax.random.key(2))
    s4 = jnp.full((L, K // GROUP, N), 1e-3, jnp.float32)

    @jax.jit
    def f_int4(x, p4, s4):
        out = jnp.zeros((B, N), jnp.float32)
        for i in range(L):
            out = out + int4_matmul(x, p4[i], s4[i]).astype(jnp.float32)
        return out[0, :8]

    per4 = pipelined_seconds(lambda xx: f_int4(xx, p4, s4), xs * 6,
                             lambda r: np.asarray(r[0], np.float32)) / L
    nbytes4 = K * N // 2 + (K // GROUP) * N * 4
    print(f"int4_pallas: {per4*1e6:.1f} us/matmul -> "
          f"{nbytes4/per4/1e9:.0f} GB/s ({nbytes4/per4/1e9/HBM_GBPS*100:.0f}%"
          f" of peak); speedup vs int8 {per/per4:.2f}x", flush=True)


if __name__ == "__main__":
    main()
