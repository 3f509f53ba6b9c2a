"""Speculative greedy decoding: output-exactness vs plain greedy decode.

The core guarantee (models/speculative.py): for greedy decoding, the
speculative output equals `llama.greedy_generate` of the TARGET model for
ANY draft model — the draft only changes speed. These tests run tiny
models in f32 on CPU where the argmax comparison is deterministic.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmrs_tpu.models import llama
from mmrs_tpu.models.llama import LlamaConfig, _cache_write
from mmrs_tpu.models.speculative import speculative_generate

TCFG = LlamaConfig(vocab_size=101, dim=64, layers=2, heads=4, kv_heads=2,
                   mlp_dim=128, max_seq=96)
DCFG = LlamaConfig(vocab_size=101, dim=32, layers=1, heads=2, kv_heads=1,
                   mlp_dim=64, max_seq=96)


@pytest.fixture(scope="module")
def models():
    tparams = llama.init(jax.random.key(0), TCFG, jnp.float32)
    dparams = llama.init(jax.random.key(7), DCFG, jnp.float32)
    return tparams, dparams


def _greedy(tparams, prompt, max_new, eos=-1, **kw):
    embeds = llama.embed_tokens(tparams, prompt)
    return np.asarray(llama.greedy_generate(
        tparams, embeds, TCFG, max_new_tokens=max_new, eos_token=eos,
        compute_dtype=jnp.float32, **kw))


def _spec(tparams, dparams, prompt, max_new, k, eos=-1, **kw):
    te = llama.embed_tokens(tparams, prompt)
    de = llama.embed_tokens(dparams, prompt)
    return np.asarray(speculative_generate(
        tparams, dparams, te, de, TCFG, DCFG, max_new_tokens=max_new,
        draft_tokens=k, eos_token=eos, compute_dtype=jnp.float32, **kw))


def test_identical_draft_accepts_everything(models):
    """Draft == target: every draft token is the target's own argmax, so
    each round must emit k+1 tokens and the output must match greedy."""
    tparams, _ = models
    prompt = jax.random.randint(jax.random.key(1), (2, 7), 3, 100, jnp.int32)
    want = _greedy(tparams, prompt, 12)
    got = np.asarray(speculative_generate(
        tparams, tparams, llama.embed_tokens(tparams, prompt),
        llama.embed_tokens(tparams, prompt), TCFG, TCFG,
        max_new_tokens=12, draft_tokens=3, eos_token=-1,
        compute_dtype=jnp.float32))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [
    pytest.param(1, marks=pytest.mark.slow),
    3,
    pytest.param(5, marks=pytest.mark.slow),
])
def test_any_draft_matches_greedy(models, k):
    """An unrelated random draft model must still yield the target's exact
    greedy output at every speculation depth."""
    tparams, dparams = models
    prompt = jax.random.randint(jax.random.key(2), (3, 9), 3, 100, jnp.int32)
    want = _greedy(tparams, prompt, 14)
    got = _spec(tparams, dparams, prompt, 14, k)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_eos_desync_rows(models):
    """Rows finishing at different times (per-row positions, frozen rows,
    EOS padding) still match greedy exactly. EOS is picked from the greedy
    output so at least one row genuinely stops early."""
    tparams, dparams = models
    prompt = jax.random.randint(jax.random.key(3), (3, 6), 3, 100, jnp.int32)
    free = _greedy(tparams, prompt, 16)
    eos = int(free[0, 3])          # row 0 will finish after ~4 tokens
    want = _greedy(tparams, prompt, 16, eos=eos)
    got = _spec(tparams, dparams, prompt, 16, 4, eos=eos)
    np.testing.assert_array_equal(got, want)
    assert (want[0, 4:] == eos).all()     # the early-stop actually fired


@pytest.mark.slow
def test_compose_unroll_int8kv_prefill_chunk(models):
    """Speculation composes with the serving options: unrolled layers,
    int8 KV cache, chunked prefill."""
    tparams, dparams = models
    prompt = jax.random.randint(jax.random.key(4), (2, 10), 3, 100,
                                jnp.int32)
    kw = dict(kv_dtype=jnp.int8, layers="unroll", prefill_chunk=4)
    want = _greedy(tparams, prompt, 12, **kw)
    got = _spec(tparams, dparams, prompt, 12, 3, **kw)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_compose_fori_int8kv_prefill_chunk(models):
    """The CLI's measured-fast serving config (layers='fori' + int8 KV +
    chunked prefill — what --draft-checkpoint actually runs) keeps the
    exact-greedy guarantee."""
    tparams, dparams = models
    prompt = jax.random.randint(jax.random.key(8), (2, 9), 3, 100,
                                jnp.int32)
    kw = dict(kv_dtype=jnp.int8, layers="fori", prefill_chunk=4)
    want = _greedy(tparams, prompt, 12, **kw)
    got = _spec(tparams, dparams, prompt, 12, 3, **kw)
    np.testing.assert_array_equal(got, want)


def test_whole_generate_jits(models):
    """One jit around the full speculative generate (the serving form)."""
    tparams, dparams = models
    prompt = jax.random.randint(jax.random.key(5), (2, 8), 3, 100, jnp.int32)

    @jax.jit
    def gen(tp, dp, tok):
        return speculative_generate(
            tp, dp, llama.embed_tokens(tp, tok), llama.embed_tokens(dp, tok),
            TCFG, DCFG, max_new_tokens=10, draft_tokens=3, eos_token=-1,
            compute_dtype=jnp.float32)

    got = np.asarray(gen(tparams, dparams, prompt))
    want = _greedy(tparams, prompt, 10)
    np.testing.assert_array_equal(got, want)


def test_return_stats(models):
    """Stats: identical draft accepts everything (max utilization), and
    emitted counts match the visible output."""
    tparams, dparams = models
    prompt = jax.random.randint(jax.random.key(6), (2, 7), 3, 100,
                                jnp.int32)
    k, max_new = 3, 12
    out, stats = speculative_generate(
        tparams, tparams, llama.embed_tokens(tparams, prompt),
        llama.embed_tokens(tparams, prompt), TCFG, TCFG,
        max_new_tokens=max_new, draft_tokens=k, eos_token=-1,
        compute_dtype=jnp.float32, return_stats=True)
    rounds = int(stats["rounds"])
    emitted = np.asarray(stats["emitted"])
    # identical draft: every round emits k+1 tokens per row
    assert rounds == -(-(max_new - 1) // (k + 1))  # ceil after the g0 token
    assert (emitted == max_new).all()
    assert out.shape == (2, max_new)


def test_per_row_cache_write_matches_scalar():
    """[B] pos_offset writes each row at its own slot (bf16 + int8)."""
    b, kvh, s, hd = 3, 2, 16, 4
    new = jax.random.normal(jax.random.key(0), (b, kvh, 2, hd), jnp.float32)
    starts = jnp.asarray([0, 5, 13], jnp.int32)

    for dtype in (jnp.float32, jnp.int8):
        if dtype == jnp.int8:
            from mmrs_tpu.models.llama import QKVCache
            cache = QKVCache(jnp.zeros((b, kvh, s, hd), jnp.int8),
                             jnp.zeros((b, kvh, s), jnp.float32))
        else:
            cache = jnp.zeros((b, kvh, s, hd), jnp.float32)
        got = _cache_write(cache, new, starts)
        for i in range(b):
            row = jax.tree.map(lambda a: a[i:i + 1], cache)
            want = _cache_write(row, new[i:i + 1], starts[i])
            np.testing.assert_array_equal(
                np.asarray(jax.tree.leaves(got)[0][i]),
                np.asarray(jax.tree.leaves(want)[0][0]))
            if dtype == jnp.int8:
                np.testing.assert_array_equal(
                    np.asarray(got.s[i]), np.asarray(want.s[0]))


def test_guards(models):
    tparams, dparams = models
    prompt = jnp.ones((1, 4), jnp.int32)
    te = llama.embed_tokens(tparams, prompt)
    de = llama.embed_tokens(dparams, prompt)
    with pytest.raises(ValueError, match="max_seq"):
        speculative_generate(tparams, dparams, te, de, TCFG, DCFG,
                             max_new_tokens=1000)
    bad = LlamaConfig(vocab_size=7, dim=32, layers=1, heads=2, kv_heads=1,
                      mlp_dim=64, max_seq=96)
    with pytest.raises(ValueError, match="vocab"):
        speculative_generate(tparams, dparams, te, de, TCFG, bad)


def test_full_acceptance_uses_ideal_round_count(models):
    """With draft == target every proposal must be accepted, so the round
    count equals ceil((max_new - 1) / (k + 1)). The review reproduced
    14-20 rounds instead of the ideal 12 before the draft-cache backfill
    (the slot at pos+k stayed zero-KV after each fully-accepted round,
    degrading later proposals)."""
    tparams, _ = models
    rng = np.random.default_rng(11)
    prompt = jnp.asarray(rng.integers(3, 90, (2, 7)), jnp.int32)
    emb = llama.embed_tokens(tparams, prompt)
    k, max_new = 3, 24
    out, stats = speculative_generate(
        tparams, tparams, emb, emb, TCFG, TCFG, max_new_tokens=max_new,
        draft_tokens=k, eos_token=-1, compute_dtype=jnp.float32,
        return_stats=True)
    ref = _greedy(tparams, prompt, max_new)
    np.testing.assert_array_equal(np.asarray(out), ref)
    ideal = -(-(max_new - 1) // (k + 1))
    assert int(stats["rounds"]) == ideal, (int(stats["rounds"]), ideal)
