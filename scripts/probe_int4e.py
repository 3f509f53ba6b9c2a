"""Probe 6: restructure the int4 dual-dot kernel around FEWER, BIGGER dots.

probe_int4d: per-group dots are launch-bound — K=11008's 43 groups run
0.67x vs int8 even with i32 masks. Two candidates that keep one or two
MXU calls per block:

  A. batched dot_general over the group axis (full group scales kept):
     xg [gh, B, gb] x wg [gh, gb, bn] -> [gh, B, bn], scales applied in
     the f32 epilogue. Works only if Mosaic lowers batched dots well.
  B. rank-1 factorized group scales s[g,n] ~= s_k[g] * s_n[n]: fold
     s_k into the activations BEFORE dynamic quantization, then the
     kernel is exactly the per-half form — two big int8 dots + two i32
     masks per block, per-channel epilogue. Same cost structure as the
     int8 QTensor path on half the bytes.

Both timed as L=8 stacked layers in one jit on both 7B decode shapes,
int8 QTensor baseline re-timed in-process.
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
from scripts.probe_int4c import pack_words, quant_rows  # noqa: E402
from mmrs_tpu.models.layers import QTensor, matmul  # noqa: E402

L = 8
G = 128
W_LO = 0x0F0F0F0F
W_HI = -252645136


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------- A: batched dot

def _kern_batched(xg_ref, rs_ref, p_ref, s_ref, o_ref, *, gh: int, gb: int):
    w32 = p_ref[:, :]                                  # [kw, bn]
    kw, bn = w32.shape
    wlo = pltpu.bitcast(w32 & W_LO, jnp.int8).reshape(gh, gb, bn)
    whi = pltpu.bitcast(w32 & W_HI, jnp.int8).reshape(gh, gb, bn)
    xlo = xg_ref[0]                                    # [gh, B, gb]
    xhi = xg_ref[1]
    dlo = jax.lax.dot_general(
        xlo, wlo, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    dhi = jax.lax.dot_general(
        xhi, whi, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    s = s_ref[:, :]                                    # [2gh, bn]
    lo = (dlo - 8.0 * rs_ref[0][:, :, None]) * s[:gh][:, None, :]
    hi = dhi * (s[gh:][:, None, :] / 16.0)
    o_ref[:, :] = jnp.sum(lo + hi, axis=0)


def batched_dual(xq, sx, packed32, scales, group=G, bn=512):
    kw, n = packed32.shape
    k2 = kw * 4
    gb = group
    gh = k2 // gb
    b = xq.shape[0]
    xg = xq.reshape(b, 2, gh, gb).transpose(1, 2, 0, 3)   # [2, gh, B, gb]
    rs = jnp.sum(xg.astype(jnp.int32), axis=3).astype(jnp.float32)  # [2,gh,B]
    kern = functools.partial(_kern_batched, gh=gh, gb=gb)
    out = pl.pallas_call(
        kern,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((2, gh, b, gb), lambda j: (0, 0, 0, 0)),
            pl.BlockSpec((2, gh, b), lambda j: (0, 0, 0)),
            pl.BlockSpec((kw, bn), lambda j: (0, j)),
            pl.BlockSpec((2 * gh, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
    )(xg, rs, packed32, scales)
    return out * sx


# ------------------------------------------------- B: rank-1 folded scales

def _kern_r1(xq_ref, rs_ref, p_ref, s_ref, o_ref):
    w32 = p_ref[:, :]
    wlo = pltpu.bitcast(w32 & W_LO, jnp.int8)
    whi = pltpu.bitcast(w32 & W_HI, jnp.int8)
    k2 = wlo.shape[0]
    xlo = xq_ref[:, :k2]
    xhi = xq_ref[:, k2:]
    dlo = jax.lax.dot_general(
        xlo, wlo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    dhi = jax.lax.dot_general(
        xhi, whi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    sn = s_ref[0, :][None, :]
    o_ref[:, :] = (dlo - 8.0 * rs_ref[:, :1]) * sn + dhi * (sn / 16.0)


def rank1_dual(x, packed32, sk, sn, bn=512):
    """x bf16 [B, K]; sk f32 [K] (per-row factor, pre-fold); sn f32 [N]."""
    kw, n = packed32.shape
    xs = x.astype(jnp.float32) * sk[None, :]
    xq, sx = quant_rows(xs)
    rs = jnp.sum(xq[:, : kw * 4].astype(jnp.int32), axis=1,
                 keepdims=True).astype(jnp.float32)
    out = pl.pallas_call(
        _kern_r1,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((xq.shape[0], kw * 8), lambda j: (0, 0)),
            pl.BlockSpec((xq.shape[0], 1), lambda j: (0, 0)),
            pl.BlockSpec((kw, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((xq.shape[0], bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((xq.shape[0], n), jnp.float32),
    )(xq, rs, packed32, sn[None, :])
    return out * sx


# --------------------------------------------------------------------- main

def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # correctness: A on (1024, 512); B vs its own rank-1 semantics
    ks, ns, B = 1024, 512, 16
    wq = rng.integers(-7, 8, (ks, ns), dtype=np.int8)
    s = ((rng.random((ks // G, ns)) + 0.5) / 15.0).astype(np.float32)
    x = ((rng.random((B, ks)) - 0.5)).astype(np.float32)
    packed = jax.device_put(jnp.asarray(pack_words(wq)))
    sd = jax.device_put(jnp.asarray(s))
    xq, sx = quant_rows(jnp.asarray(x))
    sref = np.repeat(s, G, axis=0)
    want = (np.asarray(xq, np.float32) @ (wq.astype(np.float32) * sref)
            * np.asarray(sx, np.float32))
    try:
        got = np.asarray(jax.jit(batched_dual)(xq, sx, packed, sd), np.float32)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        print(f"A batched_dual correctness: rel err {rel:.5f}", flush=True)
    except Exception as e:
        print(f"A batched_dual FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # B correctness: sk/sn from the true group scales (rank-1 fit: sn =
    # mean over g, sk = 1 here since synthetic s is iid — just verify the
    # kernel math, not the fit quality).
    sk = np.ones(ks, np.float32)
    sn = s.mean(axis=0).astype(np.float32)
    xd = jnp.asarray(x.astype(np.float32), jnp.bfloat16)
    got = np.asarray(jax.jit(rank1_dual)(
        xd, packed, jnp.asarray(sk), jnp.asarray(sn)), np.float32)
    xs2, sx2 = quant_rows(xd.astype(jnp.float32) * 1.0)
    want_r1 = (np.asarray(xs2, np.float32)
               @ (wq.astype(np.float32) * np.repeat(sn[None, :], ks, 0))
               * np.asarray(sx2, np.float32))
    rel = np.abs(got - want_r1).max() / max(np.abs(want_r1).max(), 1e-9)
    print(f"B rank1_dual correctness (vs rank-1 semantics): rel err "
          f"{rel:.5f}", flush=True)
    assert rel < 2e-2

    # ------------------------------------------------------------- timing
    for B_, K, N in [(16, 4096, 11008), (16, 11008, 4096), (1, 4096, 11008)]:
        x = jax.random.normal(jax.random.key(0), (B_, K), jnp.bfloat16)
        q8 = jax.jit(lambda k: jax.random.randint(
            k, (L, K, N), -127, 128, jnp.int8))(jax.random.key(1))
        s8 = jnp.full((L, N), 2e-4, jnp.float32)

        @jax.jit
        def f8(x, q8, s8):
            out = jnp.zeros((B_, N), jnp.float32)
            for i in range(L):
                out = out + matmul(x, QTensor(q8[i], s8[i]), jnp.bfloat16,
                                   jnp.float32)
            return out[0, :8]

        xs = [x * (1 + i * 1e-3) for i in range(4)]
        per8 = pipelined_seconds(lambda xx: f8(xx, q8, s8), xs * 6,
                                 lambda r: np.asarray(r[0], np.float32)) / L
        print(f"[B{B_} {K}x{N}] int8: {per8*1e6:.1f} us -> "
              f"{K*N/per8/1e9:.0f} GB/s", flush=True)

        p4 = jax.jit(lambda k: jax.random.randint(
            k, (L, K // 8, N), -2**31, 2**31 - 1, jnp.int32))(
                jax.random.key(2))
        nb4 = K * N // 2

        # A
        s4 = jnp.full((L, K // G, N), 1e-3, jnp.float32)
        for bn in (256, 512):
            if N % bn:
                continue

            def fa(x, p4, s4, bn=bn):
                xq, sx = quant_rows(x)
                out = jnp.zeros((B_, N), jnp.float32)
                for i in range(L):
                    out = out + batched_dual(xq, sx, p4[i], s4[i], bn=bn)
                return out[0, :8]

            try:
                per = pipelined_seconds(
                    lambda xx: jax.jit(fa)(xx, p4, s4), xs * 6,
                    lambda r: np.asarray(r[0], np.float32)) / L
                print(f"[B{B_} {K}x{N}] A batched bn{bn}: {per*1e6:.1f} us "
                      f"-> {nb4/per/1e9:.0f} GB/s packed; {per8/per:.2f}x",
                      flush=True)
            except Exception as e:
                print(f"[B{B_} {K}x{N}] A batched bn{bn}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

        # B
        skv = jnp.ones((K,), jnp.float32)
        snv = jnp.full((L, N), 1e-3, jnp.float32)
        for bn in (512, 1024):
            if N % bn:
                continue

            def fb(x, p4, snv, bn=bn):
                out = jnp.zeros((B_, N), jnp.float32)
                for i in range(L):
                    out = out + rank1_dual(x, p4[i], skv, snv[i], bn=bn)
                return out[0, :8]

            try:
                per = pipelined_seconds(
                    lambda xx: jax.jit(fb)(xx, p4, snv), xs * 6,
                    lambda r: np.asarray(r[0], np.float32)) / L
                print(f"[B{B_} {K}x{N}] B rank1 bn{bn}: {per*1e6:.1f} us -> "
                      f"{nb4/per/1e9:.0f} GB/s packed; {per8/per:.2f}x",
                      flush=True)
            except Exception as e:
                print(f"[B{B_} {K}x{N}] B rank1 bn{bn}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
