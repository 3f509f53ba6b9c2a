"""Probe 3: int4 decode weights via MASKED DUAL INT8 DOTS (MXU as unpacker).

probe_int4_pallas.py measured the straight unpack-dequant-dot kernel at
221 GB/s — VPU-bound on the i32 nibble unpack (~10 ops/byte at 4x vector
expansion) vs the int8 stream's 959 GB/s. This probes the arithmetic
trick that removes the unpack entirely:

  pack byte b = ((w_hi & 0xF) << 4) | ((w_lo + 8) & 0xF),  w in [-7, 7]
  b & 0x0F  (int8) == w_lo + 8          (offset code, 1..15)
  b & 0xF0  (int8) == 16 * w_hi         (exact: 16*[-8..7] fits int8)

so with int8 activations xq (per-row dynamic quant, the QTensor recipe):

  xq @ (b & 0x0F) == xq @ w_lo + 8 * rowsum(xq)      } two int8 MXU dots
  xq @ (b & 0xF0) == 16 * (xq @ w_hi)                } + 1 AND per byte

Group scales apply per group-dot (einsum over a groups axis). Candidates:
  e. XLA grouped einsum (does the AND fuse into the dot operand read?)
  f. Pallas kernel, logical group 256 (fits K=4096 and K=11008)
  g. Pallas kernel, per-half-channel scales (2 big dots — upper bound)

All timed as L=8 stacked layers inside one jit (the decode stream shape),
vs the shipped int8 QTensor path.
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
L = 8
BN = 256
G = 256                  # logical group size along K
PEAK_GBPS = 1200.0

# Python ints so Pallas kernels don't capture device constants; -16 is
# 0xF0 as int8 and stays in-range under jnp's weak int promotion.
M_LO = 0x0F
M_HI = -16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def quant_rows(x):
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                     1e-12) / 127.0
    return jnp.round(x32 / sx).astype(jnp.int8), sx


def pack_offset_halves(wq: np.ndarray) -> np.ndarray:
    """[K, N] int4 codes in [-7,7] -> [K/2, N] bytes: lo offset-8, hi signed."""
    k = wq.shape[0]
    lo = (wq[: k // 2].astype(np.int16) + 8) & 0xF
    hi = wq[k // 2:].astype(np.int16) & 0xF
    return (((hi << 4) | lo).astype(np.uint8)).view(np.int8)


# ---------------------------------------------------------------- candidates

def xla_masked_dual(xq, sx, packed, scales):
    """packed [K/2, N], scales [K/G, N] f32. Grouped einsum in plain XLA.

    One byte row per lo-half logical row, so a logical group of G rows is
    G byte rows; each half holds K/(2G) groups and hi groups follow all lo
    groups in the scale table."""
    k2, n = packed.shape
    gh = k2 // G                              # groups per half
    lo = (packed & M_LO)                      # w_lo + 8
    hi = (packed & M_HI)                      # 16 * w_hi
    xg = xq.reshape(B, 2, gh, G)              # [B, half, g, G]
    log_ = jnp.concatenate([lo, hi], axis=0)  # [K, N] logical rows
    wg = log_.reshape(2, gh, G, n)
    acc = jax.lax.dot_general(
        xg, wg, (((3,), (2,)), ((1, 2), (0, 1))),
        preferred_element_type=jnp.int32)     # [half, g, B, N]
    sg = scales.reshape(2, gh, n)
    rs = jnp.sum(xg.astype(jnp.int32), axis=3)            # [B, 2, gh]
    lo_part = (acc[0].astype(jnp.float32)
               - 8.0 * rs[:, 0].T[:, :, None]) * sg[0][:, None, :]
    hi_part = acc[1].astype(jnp.float32) * (sg[1][:, None, :] / 16.0)
    out = jnp.sum(lo_part + hi_part, axis=0)               # [B, N]
    return out * sx


def _dual_kernel(xq_ref, rs_ref, p_ref, s_ref, o_ref, *, gh: int, gb: int):
    """One [B, BN] tile. gh groups per half, gb = byte rows per group."""
    acc = jnp.zeros((xq_ref.shape[0], o_ref.shape[1]), jnp.float32)
    for g in range(gh):
        bg = p_ref[g * gb:(g + 1) * gb, :]
        wlo = bg & M_LO
        whi = bg & M_HI
        xlo = xq_ref[:, g * gb:(g + 1) * gb]
        xhi = xq_ref[:, gh * gb + g * gb: gh * gb + (g + 1) * gb]
        dlo = jax.lax.dot_general(
            xlo, wlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        dhi = jax.lax.dot_general(
            xhi, whi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        s_lo = s_ref[g, :][None, :]
        s_hi = s_ref[gh + g, :][None, :]
        acc += (dlo - 8.0 * rs_ref[:, g][:, None]) * s_lo
        acc += dhi * (s_hi / 16.0)
    o_ref[:, :] = acc


def pallas_masked_dual(xq, sx, packed, scales, group=G, bn=BN):
    k2, n = packed.shape
    gb = group                     # byte rows per group == logical G
    gh = k2 // gb
    rs = jnp.sum(xq.reshape(B, 2, gh, gb).astype(jnp.int32),
                 axis=3)[:, 0, :].astype(jnp.float32)      # lo half rowsums
    kern = functools.partial(_dual_kernel, gh=gh, gb=gb)
    out = pl.pallas_call(
        kern,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((B, 2 * k2), lambda j: (0, 0)),
            pl.BlockSpec((B, gh), lambda j: (0, 0)),
            pl.BlockSpec((k2, bn), lambda j: (0, j)),
            pl.BlockSpec((2 * gh, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
    )(xq, rs, packed, scales)
    return out * sx


# --------------------------------------------------------------------- main

def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # correctness, small shape, both candidates
    ks, ns = 1024, 512
    wq = rng.integers(-7, 8, (ks, ns), dtype=np.int8)
    s = ((rng.random((ks // G, ns)) + 0.5) / 15.0).astype(np.float32)
    x = ((rng.random((B, ks)) - 0.5)).astype(np.float32)
    packed = jax.device_put(jnp.asarray(pack_offset_halves(wq)))
    sd = jax.device_put(jnp.asarray(s))
    xq, sx = quant_rows(jnp.asarray(x))
    sref = np.repeat(s, G, axis=0)
    # reference uses the SAME quantized activations (isolates the trick)
    want = (np.asarray(xq, np.float32) @ (wq.astype(np.float32) * sref)
            * np.asarray(sx, np.float32))
    for name, fn in [("xla_masked", xla_masked_dual),
                     ("pallas_masked", pallas_masked_dual)]:
        got = np.asarray(jax.jit(fn)(xq, sx, packed, sd), np.float32)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        print(f"{name} correctness (1024x512): rel err {rel:.5f}", flush=True)
        assert rel < 2e-2, name

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
        k, (L, K // 2, N), -128, 128, jnp.int8))(jax.random.key(2))

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
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    s4 = jnp.full((L, K // G, N), 1e-3, jnp.float32)
    nb = K * N // 2 + (K // G) * N * 4
    stream(xla_masked_dual, s4, "xla_masked_dual_g256", nb)
    stream(pallas_masked_dual, s4, "pallas_masked_dual_g256", nb)
    # upper bound: one scale per half (2 big dots per tile)
    s4w = jnp.full((L, 2, N), 1e-3, jnp.float32)
    stream(functools.partial(pallas_masked_dual, group=K // 2),
           s4w, "pallas_masked_dual_perhalf", K * N // 2 + 2 * N * 4)


if __name__ == "__main__":
    main()
