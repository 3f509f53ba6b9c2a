"""Fused Pallas decode-attention == the XLA einsum path, token for token.

CPU runs the kernel in interpreter mode (the only Pallas mode the CPU
backend supports); on-chip equality is asserted by `mmrs parity` /
bench_vlm's gate on the real TPU.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmrs_tpu.models import llama
from mmrs_tpu.models.llama import LlamaConfig, QKVCache, _quantize_kv
from mmrs_tpu.ops.decode_attention import decode_attention

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
    """The einsum path from llama._attn_block, decode case (T=1)."""
    cd = jnp.bfloat16
    b, kvh, g, hd = q.shape
    s = kq.shape[2]
    qg = q.astype(cd)[:, :, :, None, :]                  # [B,KVH,G,1,HD]
    logits = jnp.einsum("bkgth,bksh->bkgts", qg, kq.astype(cd),
                        preferred_element_type=jnp.float32)
    if ks is not None:
        logits = logits * ks[:, :, None, None, :]
    logits = logits / jnp.sqrt(jnp.float32(hd))
    key_pos = jnp.arange(s)[None, :]
    mask = key_pos <= jnp.asarray(pos)[None]
    logits = jnp.where(mask[None, None, None, :, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    if vs is not None:
        probs = probs * vs[:, :, None, None, :]
    out = jnp.einsum("bkgts,bksh->bkgth", probs.astype(cd), vq.astype(cd),
                     preferred_element_type=jnp.float32)
    return out[:, :, :, 0, :]


@pytest.mark.parametrize("quantized", [True, False])
@pytest.mark.parametrize("pos", [0, 5, 63])
def test_kernel_matches_einsum(quantized, pos):
    rng = np.random.default_rng(0)
    b, kvh, g, hd, s = 2, 2, 2, 64, 64
    q = jnp.asarray(rng.normal(size=(b, kvh, g, hd)), jnp.bfloat16)
    kq, ks, vq, vs = _random_cache(rng, b, kvh, s, hd, quantized)

    ref = np.asarray(_xla_reference(q, kq, ks, vq, vs, pos), np.float32)
    out = np.asarray(decode_attention(q, kq, ks, vq, vs, pos,
                                      interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("quantized", [True, False])
def test_kernel_per_row_positions(quantized):
    """[B] pos vector (speculative decode: rows desynchronize) == stacking
    per-row scalar-pos calls."""
    rng = np.random.default_rng(5)
    b, kvh, g, hd, s = 3, 2, 2, 64, 64
    q = jnp.asarray(rng.normal(size=(b, kvh, g, hd)), jnp.bfloat16)
    kq, ks, vq, vs = _random_cache(rng, b, kvh, s, hd, quantized)
    pos = jnp.asarray([2, 31, 63], jnp.int32)

    out = np.asarray(decode_attention(q, kq, ks, vq, vs, pos,
                                      interpret=True))
    for i in range(b):
        sl = lambda x: None if x is None else x[i:i + 1]
        want = np.asarray(decode_attention(
            q[i:i + 1], sl(kq), sl(ks), sl(vq), sl(vs), int(pos[i]),
            interpret=True))
        np.testing.assert_array_equal(out[i:i + 1], want)


@pytest.mark.slow
def test_speculative_generate_pallas_matches_greedy():
    """speculative_generate routes its T=1 draft steps through the kernel
    with per-row positions; output must still equal plain greedy."""
    import mmrs_tpu.ops.decode_attention as da
    from mmrs_tpu.models.speculative import speculative_generate

    params = llama.init(jax.random.key(2), CFG)
    dparams = llama.init(jax.random.key(3), CFG)
    rng = np.random.default_rng(4)
    prompt = jnp.asarray(rng.integers(3, 90, (2, 9)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)

    ref = np.asarray(llama.greedy_generate(
        params, embeds, CFG, max_new_tokens=8, eos_token=-1,
        kv_dtype=jnp.int8))

    orig = da.decode_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    da.decode_attention = interp
    try:
        out = np.asarray(speculative_generate(
            params, dparams, embeds, llama.embed_tokens(dparams, prompt),
            CFG, CFG, max_new_tokens=8, draft_tokens=3, eos_token=-1,
            kv_dtype=jnp.int8, decode_attn="pallas"))
    finally:
        da.decode_attention = orig
    np.testing.assert_array_equal(out, ref)


def test_kernel_masks_dead_tail():
    """Cache slots beyond pos contribute exactly nothing (garbage there)."""
    rng = np.random.default_rng(1)
    b, kvh, g, hd, s = 1, 1, 1, 64, 64
    q = jnp.asarray(rng.normal(size=(b, kvh, g, hd)), jnp.bfloat16)
    kq, ks, vq, vs = _random_cache(rng, b, kvh, s, hd, True)
    pos = 7
    out1 = np.asarray(decode_attention(q, kq, ks, vq, vs, pos,
                                       interpret=True))
    # poison the dead tail
    kq2 = kq.at[:, :, pos + 1:].set(127)
    vq2 = vq.at[:, :, pos + 1:].set(-127)
    ks2 = ks.at[:, :, pos + 1:].set(1e6)
    vs2 = vs.at[:, :, pos + 1:].set(1e6)
    out2 = np.asarray(decode_attention(q, kq2, ks2, vq2, vs2, pos,
                                       interpret=True))
    np.testing.assert_array_equal(out1, out2)


@pytest.mark.parametrize("kv_dtype", [jnp.int8, None])
def test_greedy_generate_pallas_decode_matches_xla(kv_dtype):
    """End-to-end greedy decode with decode_attn='pallas' (interpreted)
    produces the exact token stream of the einsum path."""
    import mmrs_tpu.ops.decode_attention as da

    params = llama.init(jax.random.key(0), CFG)
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(3, 90, (2, 9)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)

    ref = np.asarray(llama.greedy_generate(
        params, embeds, CFG, max_new_tokens=6, eos_token=-1,
        kv_dtype=kv_dtype))

    # route the kernel through interpreter mode on CPU
    orig = da.decode_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    da.decode_attention = interp
    try:
        out = np.asarray(llama.greedy_generate(
            params, embeds, CFG, max_new_tokens=6, eos_token=-1,
            kv_dtype=kv_dtype, decode_attn="pallas"))
    finally:
        da.decode_attention = orig
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_greedy_generate_pallas_composes_with_fori_layers():
    """pallas decode + layers='fori' (in-place stacked-cache loop — the
    7B serving form, one compiled kernel instance) == plain scan decode."""
    import mmrs_tpu.ops.decode_attention as da

    params = llama.init(jax.random.key(4), CFG)
    rng = np.random.default_rng(6)
    prompt = jnp.asarray(rng.integers(3, 90, (2, 9)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)

    ref = np.asarray(llama.greedy_generate(
        params, embeds, CFG, max_new_tokens=6, eos_token=-1,
        kv_dtype=jnp.int8))

    orig = da.decode_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    da.decode_attention = interp
    try:
        out = np.asarray(llama.greedy_generate(
            params, embeds, CFG, max_new_tokens=6, eos_token=-1,
            kv_dtype=jnp.int8, decode_attn="pallas", layers="fori",
            prefill_chunk=4))
    finally:
        da.decode_attention = orig
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_greedy_generate_pallas_composes_with_fast_options():
    """pallas decode + unroll + chunked prefill + decode_window +
    early_stop == plain scan decode."""
    import mmrs_tpu.ops.decode_attention as da

    params = llama.init(jax.random.key(1), CFG)
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(3, 90, (2, 9)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)

    ref = np.asarray(llama.greedy_generate(
        params, embeds, CFG, max_new_tokens=6, eos_token=-1,
        kv_dtype=jnp.int8))

    orig = da.decode_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    da.decode_attention = interp
    try:
        out = np.asarray(llama.greedy_generate(
            params, embeds, CFG, max_new_tokens=6, eos_token=-1,
            kv_dtype=jnp.int8, decode_attn="pallas", layers="unroll",
            prefill_chunk=4, decode_window=4, early_stop=True))
    finally:
        da.decode_attention = orig
    np.testing.assert_array_equal(out, ref)
