"""Fused Pallas causal chunk attention == the XLA prefill einsums.

The prefill sibling of test_decode_attention.py: `chunk_attention` runs
C query rows per head against the cache prefix with the [C, S] f32
scores/probs held in VMEM. CPU runs the kernel in interpreter mode; the
on-chip gate is `mmrs parity` / bench_vlm on the real TPU.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmrs_tpu.models import llama
from mmrs_tpu.models.llama import LlamaConfig, _quantize_kv
from mmrs_tpu.ops.decode_attention import chunk_attention

CFG = LlamaConfig(vocab_size=96, dim=64, layers=2, heads=4, kv_heads=2,
                  mlp_dim=128, max_seq=64)


def _random_cache(rng, b, kvh, s, hd, quantized):
    k = jnp.asarray(rng.normal(size=(b, kvh, s, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, kvh, s, hd)), jnp.float32)
    if not quantized:
        return k.astype(jnp.bfloat16), None, v.astype(jnp.bfloat16), None
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    return kq, ks, vq, vs


def _xla_reference(q, kq, ks, vq, vs, pos):
    """The einsum prefill path from llama._attn_block (T>1)."""
    cd = jnp.bfloat16
    b, kvh, g, t, hd = q.shape
    s = kq.shape[2]
    logits = jnp.einsum("bkgth,bksh->bkgts", q.astype(cd), kq.astype(cd),
                        preferred_element_type=jnp.float32)
    if ks is not None:
        logits = logits * ks[:, :, None, None, :]
    logits = logits / jnp.sqrt(jnp.float32(hd))
    qpos = (jnp.asarray(pos, jnp.int32).reshape(-1, 1)
            + jnp.arange(t)[None, :])                    # [B or 1, T]
    qpos = jnp.broadcast_to(qpos, (b, t))
    key_pos = jnp.arange(s)[None, None, :]
    mask = key_pos <= qpos[:, :, None]                   # [B, T, S]
    logits = jnp.where(mask[:, None, None, :, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    if vs is not None:
        probs = probs * vs[:, :, None, None, :]
    return jnp.einsum("bkgts,bksh->bkgth", probs.astype(cd),
                      vq.astype(cd), preferred_element_type=jnp.float32)


@pytest.mark.parametrize("quantized", [True, False])
@pytest.mark.parametrize("pos", [0, 5, 56])
def test_kernel_matches_einsum(quantized, pos):
    rng = np.random.default_rng(0)
    b, kvh, g, t, hd, s = 2, 2, 2, 8, 64, 64
    q = jnp.asarray(rng.normal(size=(b, kvh, g, t, hd)), jnp.bfloat16)
    kq, ks, vq, vs = _random_cache(rng, b, kvh, s, hd, quantized)

    ref = np.asarray(_xla_reference(q, kq, ks, vq, vs, pos), np.float32)
    out = np.asarray(chunk_attention(q, kq, ks, vq, vs, pos,
                                     interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("quantized", [True, False])
def test_kernel_stacked_layer(quantized):
    """layer=i reads layer i's rows straight out of a stacked [L, ...]
    cache (the fori/chunked-prefill serving form)."""
    rng = np.random.default_rng(1)
    L, b, kvh, g, t, hd, s = 3, 2, 2, 2, 4, 64, 64
    qs, caches = [], []
    for _ in range(L):
        qs.append(jnp.asarray(rng.normal(size=(b, kvh, g, t, hd)),
                              jnp.bfloat16))
        caches.append(_random_cache(rng, b, kvh, s, hd, quantized))
    kq = jnp.stack([c[0] for c in caches])
    vq = jnp.stack([c[2] for c in caches])
    ks = jnp.stack([c[1] for c in caches]) if quantized else None
    vs = jnp.stack([c[3] for c in caches]) if quantized else None
    for i in range(L):
        want = np.asarray(chunk_attention(qs[i], *caches[i], 9,
                                          interpret=True))
        got = np.asarray(chunk_attention(qs[i], kq, ks, vq, vs, 9,
                                         layer=jnp.int32(i),
                                         interpret=True))
        np.testing.assert_array_equal(got, want)


def test_kernel_kv_limit_bounds_stream():
    """kv_limit slices the DMA to round128(limit) slots; garbage past the
    limit (poisoned here) must contribute exactly nothing."""
    rng = np.random.default_rng(2)
    b, kvh, g, t, hd, s = 1, 2, 1, 8, 64, 256
    q = jnp.asarray(rng.normal(size=(b, kvh, g, t, hd)), jnp.bfloat16)
    kq, ks, vq, vs = _random_cache(rng, b, kvh, s, hd, True)
    pos = 120                                            # rows at 120..127
    lim = 128
    ref = np.asarray(chunk_attention(q, kq[:, :, :lim], ks[:, :, :lim],
                                     vq[:, :, :lim], vs[:, :, :lim], pos,
                                     interpret=True))
    # poison everything past the limit, including NaN scales
    kq2 = kq.at[:, :, lim:].set(127)
    vq2 = vq.at[:, :, lim:].set(-127)
    ks2 = ks.at[:, :, lim:].set(jnp.nan)
    vs2 = vs.at[:, :, lim:].set(jnp.nan)
    out = np.asarray(chunk_attention(q, kq2, ks2, vq2, vs2, pos,
                                     kv_limit=lim, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_kernel_per_row_positions():
    """[B] chunk-start vector == stacking per-row scalar-pos calls."""
    rng = np.random.default_rng(3)
    b, kvh, g, t, hd, s = 3, 2, 2, 4, 64, 64
    q = jnp.asarray(rng.normal(size=(b, kvh, g, t, hd)), jnp.bfloat16)
    kq, ks, vq, vs = _random_cache(rng, b, kvh, s, hd, True)
    pos = jnp.asarray([0, 17, 50], jnp.int32)
    out = np.asarray(chunk_attention(q, kq, ks, vq, vs, pos,
                                     interpret=True))
    for i in range(b):
        sl = lambda x: x[i:i + 1]
        want = np.asarray(chunk_attention(
            q[i:i + 1], sl(kq), sl(ks), sl(vq), sl(vs), int(pos[i]),
            interpret=True))
        np.testing.assert_array_equal(out[i:i + 1], want)


def _interp_chunk(monkeypatch):
    import mmrs_tpu.ops.decode_attention as da

    orig = da.chunk_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(da, "chunk_attention", interp)


@pytest.mark.parametrize("kv_dtype", [
    pytest.param(jnp.int8, marks=pytest.mark.slow), None])
def test_greedy_generate_pallas_prefill_matches_xla(monkeypatch, kv_dtype):
    """End-to-end greedy decode with prefill_attn='pallas' (interpreted)
    produces the exact token stream of the einsum path."""
    params = llama.init(jax.random.key(0), CFG)
    rng = np.random.default_rng(4)
    prompt = jnp.asarray(rng.integers(3, 90, (2, 9)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)

    ref = np.asarray(llama.greedy_generate(
        params, embeds, CFG, max_new_tokens=6, eos_token=-1,
        kv_dtype=kv_dtype))
    _interp_chunk(monkeypatch)
    out = np.asarray(llama.greedy_generate(
        params, embeds, CFG, max_new_tokens=6, eos_token=-1,
        kv_dtype=kv_dtype, prefill_attn="pallas"))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_greedy_generate_pallas_prefill_composes_with_serving_form(
        monkeypatch):
    """prefill_attn='pallas' + chunked prefill + fori layers + pallas
    decode (the full serving combination) == plain scan decode."""
    import mmrs_tpu.ops.decode_attention as da

    params = llama.init(jax.random.key(1), CFG)
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(3, 90, (2, 9)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)

    ref = np.asarray(llama.greedy_generate(
        params, embeds, CFG, max_new_tokens=6, eos_token=-1,
        kv_dtype=jnp.int8))
    _interp_chunk(monkeypatch)
    orig = da.decode_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(da, "decode_attention", interp)
    out = np.asarray(llama.greedy_generate(
        params, embeds, CFG, max_new_tokens=6, eos_token=-1,
        kv_dtype=jnp.int8, prefill_attn="pallas", decode_attn="pallas",
        layers="fori", prefill_chunk=4))
    np.testing.assert_array_equal(out, ref)
