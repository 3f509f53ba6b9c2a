"""SURVEY §5 race/sanitizer story: the reference is single-threaded with no
shared mutable state; our equivalent is JAX's functional purity plus these
CI passes that run representative paths under jax.debug_nans (traps NaNs
the moment any op produces one) and jax.enable_checks (internal jaxpr /
avals invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture()
def strict():
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_enable_checks", True)
    yield
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_enable_checks", False)


@pytest.mark.slow
def test_tower_forward_nan_free(strict):
    from mmrs_tpu.models import clip
    from mmrs_tpu.models.clip import CLIPConfig
    from mmrs_tpu.models.configs import CLIP_TEXT_TINY, VIT_TINY

    cfg = CLIPConfig(vision=VIT_TINY, text=CLIP_TEXT_TINY)
    params = clip.init(jax.random.key(0), cfg)
    imgs = jax.random.normal(jax.random.key(1), (2, 224, 224, 3)) * 0.5
    out = clip.encode_image(params, imgs, cfg, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
    toks = jnp.ones((2, cfg.text.context_length), jnp.int32)
    out = clip.encode_text(params, toks, cfg, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_llama_decode_nan_free(strict):
    from mmrs_tpu.models import llama
    from mmrs_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig(vocab_size=64, dim=32, layers=2, heads=4, kv_heads=2,
                      mlp_dim=64, max_seq=32)
    params = llama.init(jax.random.key(0), cfg)
    emb = llama.embed_tokens(params, jnp.arange(6)[None, :] % 64)
    toks = llama.greedy_generate(params, emb, cfg, max_new_tokens=4,
                                 compute_dtype=jnp.float32)
    assert np.asarray(toks).shape == (1, 4)


def test_calibration_sweep_nan_free(strict):
    from mmrs_tpu.search.calibrate import find_thresholds

    rng = np.random.default_rng(0)
    res = find_thresholds(rng.normal(1.0, 0.1, 50).astype(np.float32),
                          rng.normal(0.0, 0.1, 200).astype(np.float32))
    assert np.isfinite(res.best_f1)
