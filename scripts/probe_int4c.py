"""Probe 4: masked dual int8 dots with the nibble masks done at i32 width.

probe_int4b measured the dual-dot trick exact but VPU-bound on the two
int8 ANDs (per-half upper bound 0.91x vs int8; grouped 0.62x).  On-chip
`pltpu.bitcast(i32[R,C], int8) -> i8[4R,C]` maps word row r byte k (LSB
first) to byte row 4r+k (verified by a pattern probe), i.e. it is a free
reinterpretation of contiguous K-major bytes.  So: ship the packed plane
as int32 words (4 byte-rows per word), AND with 0x0F0F0F0F / 0xF0F0F0F0
at i32 rate (4 bytes per VPU op instead of 1), bitcast to int8, dot.

Same methodology: L=8 stacked layers inside one jit vs the shipped int8
QTensor stream.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bench import pipelined_seconds  # noqa: E402

K, N = 4096, 11008
B = 16
L = 8
BN = 256
G = 256                  # logical group size along K

W_LO = 0x0F0F0F0F
W_HI = -252645136        # 0xF0F0F0F0 as int32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def quant_rows(x):
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                     1e-12) / 127.0
    return jnp.round(x32 / sx).astype(jnp.int8), sx


def pack_words(wq: np.ndarray) -> np.ndarray:
    """[K, N] int4 codes in [-7,7] -> [K/8, N] int32 words.

    Byte row i (halves layout: lo nibble = logical row i offset-8, hi
    nibble = logical row i + K/2 signed) sits at word row i//4 byte i%4.
    """
    k = wq.shape[0]
    lo = (wq[: k // 2].astype(np.int16) + 8) & 0xF
    hi = wq[k // 2:].astype(np.int16) & 0xF
    by = ((hi << 4) | lo).astype(np.uint8)            # [K/2, N]
    k2, n = by.shape
    w = by.reshape(k2 // 4, 4, n).astype(np.uint32)
    return (w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16)
            | (w[:, 3] << 24)).view(np.int32)


def _kernel(xq_ref, rs_ref, p_ref, s_ref, o_ref, *, gh: int, gb: int):
    """One [B, BN] tile. gh groups per half, gb byte rows per group."""
    acc = jnp.zeros((xq_ref.shape[0], o_ref.shape[1]), jnp.float32)
    gw = gb // 4                                       # word rows per group
    for g in range(gh):
        w32 = p_ref[g * gw:(g + 1) * gw, :]
        wlo = pltpu.bitcast(w32 & W_LO, jnp.int8)      # w_lo + 8
        whi = pltpu.bitcast(w32 & W_HI, jnp.int8)      # 16 * w_hi
        xlo = xq_ref[:, g * gb:(g + 1) * gb]
        xhi = xq_ref[:, gh * gb + g * gb: gh * gb + (g + 1) * gb]
        dlo = jax.lax.dot_general(
            xlo, wlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        dhi = jax.lax.dot_general(
            xhi, whi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        acc += (dlo - 8.0 * rs_ref[:, g][:, None]) * s_ref[g, :][None, :]
        acc += dhi * (s_ref[gh + g, :][None, :] / 16.0)
    o_ref[:, :] = acc


def masked_dual_i32(xq, sx, packed32, scales, group=G, bn=BN):
    kw, n = packed32.shape                             # kw = K/8 word rows
    k2 = kw * 4
    gb = group
    gh = k2 // gb
    rs = jnp.sum(xq.reshape(xq.shape[0], 2, gh, gb).astype(jnp.int32),
                 axis=3)[:, 0, :].astype(jnp.float32)
    kern = functools.partial(_kernel, gh=gh, gb=gb)
    out = pl.pallas_call(
        kern,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((xq.shape[0], 2 * k2), lambda j: (0, 0)),
            pl.BlockSpec((xq.shape[0], gh), lambda j: (0, 0)),
            pl.BlockSpec((kw, bn), lambda j: (0, j)),
            pl.BlockSpec((2 * gh, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((xq.shape[0], bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((xq.shape[0], n), jnp.float32),
    )(xq, rs, packed32, scales)
    return out * sx


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # correctness, small shape
    ks, ns = 1024, 512
    wq = rng.integers(-7, 8, (ks, ns), dtype=np.int8)
    s = ((rng.random((ks // G, ns)) + 0.5) / 15.0).astype(np.float32)
    x = ((rng.random((B, ks)) - 0.5)).astype(np.float32)
    packed = jax.device_put(jnp.asarray(pack_words(wq)))
    sd = jax.device_put(jnp.asarray(s))
    xq, sx = quant_rows(jnp.asarray(x))
    sref = np.repeat(s, G, axis=0)
    want = (np.asarray(xq, np.float32) @ (wq.astype(np.float32) * sref)
            * np.asarray(sx, np.float32))
    got = np.asarray(jax.jit(masked_dual_i32)(xq, sx, packed, sd),
                     np.float32)
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    print(f"masked_dual_i32 correctness (1024x512): rel err {rel:.5f}",
          flush=True)
    assert rel < 2e-2

    # ---- streaming: L stacked layers in one jit ----------------------------
    from mmrs_tpu.models.layers import QTensor, matmul

    x = jax.random.normal(jax.random.key(0), (B, K), jnp.bfloat16)
    q8 = jax.jit(lambda k: jax.random.randint(
        k, (L, K, N), -127, 128, jnp.int8))(jax.random.key(1))
    s8 = jnp.full((L, N), 2e-4, jnp.float32)

    @jax.jit
    def f_int8(x, q8, s8):
        out = jnp.zeros((B, N), jnp.float32)
        for i in range(L):
            out = out + matmul(x, QTensor(q8[i], s8[i]), jnp.bfloat16,
                               jnp.float32)
        return out[0, :8]

    xs = [x * (1 + i * 1e-3) for i in range(4)]
    per8 = pipelined_seconds(lambda xx: f_int8(xx, q8, s8), xs * 6,
                             lambda r: np.asarray(r[0], np.float32)) / L
    print(f"int8_stream: {per8*1e6:.1f} us/matmul -> "
          f"{K*N/per8/1e9:.0f} GB/s", flush=True)

    p4 = jax.jit(lambda k: jax.random.randint(
        k, (L, K // 8, N), -2**31, 2**31 - 1, jnp.int32))(jax.random.key(2))

    def stream(fn, scales, tag, nbytes):
        @jax.jit
        def f(x, p4, scales):
            xq, sx = quant_rows(x)
            out = jnp.zeros((B, N), jnp.float32)
            for i in range(L):
                out = out + fn(xq, sx, p4[i], scales[i])
            return out[0, :8]

        try:
            per = pipelined_seconds(lambda xx: f(xx, p4, scales), xs * 6,
                                    lambda r: np.asarray(r[0], np.float32)) / L
            print(f"{tag}: {per*1e6:.1f} us/matmul -> "
                  f"{nbytes/per/1e9:.0f} GB/s; speedup vs int8 "
                  f"{per8/per:.2f}x", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    s4 = jnp.full((L, K // G, N), 1e-3, jnp.float32)
    nb = K * N // 2 + (K // G) * N * 4
    stream(masked_dual_i32, s4, "masked_dual_i32_g256", nb)
    stream(functools.partial(masked_dual_i32, bn=512), s4,
           "masked_dual_i32_g256_bn512", nb)
    s4w = jnp.full((L, 2, N), 1e-3, jnp.float32)
    stream(functools.partial(masked_dual_i32, group=K // 2),
           s4w, "masked_dual_i32_perhalf", K * N // 2 + 2 * N * 4)


if __name__ == "__main__":
    main()
