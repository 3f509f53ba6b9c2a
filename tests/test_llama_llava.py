"""LLaMA decoder + LLaVA VLM: HF parity (random tiny weights) and decode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mmrs_tpu.models import llama, llava
from mmrs_tpu.models.configs import VITConfig
from mmrs_tpu.models.llama import LlamaConfig

LCFG = LlamaConfig(vocab_size=128, dim=64, layers=2, heads=4, kv_heads=2,
                   mlp_dim=128, max_seq=64)


@pytest.fixture(scope="module")
def hf_llama_pair():
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=LCFG.vocab_size,
        hidden_size=LCFG.dim,
        num_hidden_layers=LCFG.layers,
        num_attention_heads=LCFG.heads,
        num_key_value_heads=LCFG.kv_heads,
        intermediate_size=LCFG.mlp_dim,
        max_position_embeddings=LCFG.max_seq,
        rms_norm_eps=LCFG.norm_eps,
        rope_theta=LCFG.rope_theta,
        attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    from mmrs_tpu.models.convert import state_dict_to_numpy

    sd = state_dict_to_numpy(model.state_dict())
    params = llava.hf_llama(sd, LCFG)
    return model, params


def test_llama_forward_parity(hf_llama_pair):
    model, params = hf_llama_pair
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, LCFG.vocab_size, (2, 10)).astype(np.int64)

    with torch.no_grad():
        t_logits = model(input_ids=torch.from_numpy(tokens)).logits.numpy()

    cache = llama.init_cache(LCFG, 2, jnp.float32)
    embeds = llama.embed_tokens(params, jnp.asarray(tokens, jnp.int32))
    j_logits, _ = llama.forward(params, embeds, cache, 0, LCFG,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits,
                               atol=5e-4, rtol=5e-4)


def test_llama_kv_cache_consistency(hf_llama_pair):
    """Prefill then 1-token decode must equal full-sequence forward."""
    _, params = hf_llama_pair
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, LCFG.vocab_size, (1, 9)), jnp.int32)

    cache = llama.init_cache(LCFG, 1, jnp.float32)
    full_logits, _ = llama.forward(
        params, llama.embed_tokens(params, tokens), cache, 0, LCFG,
        compute_dtype=jnp.float32)

    cache = llama.init_cache(LCFG, 1, jnp.float32)
    pre_logits, cache = llama.forward(
        params, llama.embed_tokens(params, tokens[:, :8]), cache, 0, LCFG,
        compute_dtype=jnp.float32)
    step_logits, _ = llama.forward(
        params, llama.embed_tokens(params, tokens[:, 8:9]), cache, 8, LCFG,
        compute_dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                               np.asarray(full_logits[:, 8]),
                               atol=1e-4, rtol=1e-4)


def test_greedy_generate_matches_hf(hf_llama_pair):
    model, params = hf_llama_pair
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, LCFG.vocab_size, (1, 6)).astype(np.int64)

    with torch.no_grad():
        t_out = model.generate(
            torch.from_numpy(prompt), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        ).numpy()[0, 6:]

    embeds = llama.embed_tokens(params, jnp.asarray(prompt, jnp.int32))
    j_out = np.asarray(llama.greedy_generate(
        params, embeds, LCFG, max_new_tokens=8, eos_token=-1,
        compute_dtype=jnp.float32))[0]
    np.testing.assert_array_equal(j_out, t_out)


def test_int8_kv_cache_numerics(hf_llama_pair):
    """int8 KV cache: logits track the f32-cache forward closely, and the
    prefill+decode split stays self-consistent (quantize-on-write is the
    same whether a position was written during prefill or decode)."""
    _, params = hf_llama_pair
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(3, LCFG.vocab_size, (2, 12)), jnp.int32)
    embeds = llama.embed_tokens(params, tokens)

    ref_logits, _ = llama.forward(
        params, embeds, llama.init_cache(LCFG, 2, jnp.float32), 0, LCFG,
        compute_dtype=jnp.float32)
    q_logits, _ = llama.forward(
        params, embeds, llama.init_cache(LCFG, 2, jnp.int8), 0, LCFG,
        compute_dtype=jnp.float32)

    ref = np.asarray(ref_logits).reshape(-1, LCFG.vocab_size)
    q = np.asarray(q_logits).reshape(-1, LCFG.vocab_size)
    cos = (ref * q).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(q, axis=-1))
    assert cos.min() > 0.999, cos.min()
    # int8 quantization error must not reorder the greedy choice here
    assert (ref.argmax(-1) == q.argmax(-1)).mean() >= 0.9

    # split consistency: prefill 8 + decode 1 == full forward at pos 8
    ck = llama.init_cache(LCFG, 2, jnp.int8)
    _, ck = llama.forward(params, embeds[:, :8], ck, 0, LCFG,
                          compute_dtype=jnp.float32)
    step_logits, _ = llama.forward(params, embeds[:, 8:9], ck, 8, LCFG,
                                   compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                               np.asarray(q_logits[:, 8]),
                               atol=1e-4, rtol=1e-4)


def test_greedy_generate_int8_kv_matches_greedy(hf_llama_pair):
    """greedy_generate(kv_dtype=int8) produces (near-)identical tokens."""
    _, params = hf_llama_pair
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(3, LCFG.vocab_size, (2, 6)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)
    ref = np.asarray(llama.greedy_generate(
        params, embeds, LCFG, max_new_tokens=8, eos_token=-1,
        compute_dtype=jnp.float32))
    q = np.asarray(llama.greedy_generate(
        params, embeds, LCFG, max_new_tokens=8, eos_token=-1,
        compute_dtype=jnp.float32, kv_dtype=jnp.int8))
    assert (ref == q).mean() >= 0.85, (ref, q)


@pytest.mark.slow
def test_greedy_generate_unrolled_layers_matches_scan(hf_llama_pair):
    """layers="unroll" (per-layer cache buffers, in-place decode updates)
    is numerically identical to the stacked-cache lax.scan form."""
    _, params = hf_llama_pair
    rng = np.random.default_rng(6)
    prompt = jnp.asarray(rng.integers(3, LCFG.vocab_size, (2, 5)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)
    for kv_dtype in (None, jnp.int8):
        ref = np.asarray(llama.greedy_generate(
            params, embeds, LCFG, max_new_tokens=6, eos_token=-1,
            compute_dtype=jnp.float32, kv_dtype=kv_dtype))
        for lyr in ("unroll", "fori"):
            got = np.asarray(llama.greedy_generate(
                params, embeds, LCFG, max_new_tokens=6, eos_token=-1,
                compute_dtype=jnp.float32, kv_dtype=kv_dtype, layers=lyr))
            np.testing.assert_array_equal(got, ref, err_msg=lyr)


@pytest.mark.slow
def test_greedy_generate_chunked_prefill_matches_full(hf_llama_pair):
    """prefill_chunk=C (statically kv-sliced chunked prefill) reproduces the
    one-shot prefill exactly, for both cache forms and int8 KV, including a
    chunk size that does not divide the prompt length. The 70-token prompt
    forces a 128-slot cache so early chunks read a STRICT 64-slot slice
    (kv_limit < cache_len), not a whole-cache no-op."""
    _, params = hf_llama_pair
    cfg = LlamaConfig(vocab_size=LCFG.vocab_size, dim=LCFG.dim,
                      layers=LCFG.layers, heads=LCFG.heads,
                      kv_heads=LCFG.kv_heads, mlp_dim=LCFG.mlp_dim,
                      max_seq=256)
    rng = np.random.default_rng(7)
    prompt = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 70)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)
    ref = np.asarray(llama.greedy_generate(
        params, embeds, cfg, max_new_tokens=6, eos_token=-1,
        compute_dtype=jnp.float32))
    for kv_dtype in (None, jnp.int8):
        want = ref if kv_dtype is None else np.asarray(llama.greedy_generate(
            params, embeds, cfg, max_new_tokens=6, eos_token=-1,
            compute_dtype=jnp.float32, kv_dtype=kv_dtype))
        for lyr in ("scan", "unroll", "fori"):
            got = np.asarray(llama.greedy_generate(
                params, embeds, cfg, max_new_tokens=6, eos_token=-1,
                compute_dtype=jnp.float32, kv_dtype=kv_dtype, layers=lyr,
                prefill_chunk=32))
            np.testing.assert_array_equal(got, want, err_msg=f"{kv_dtype} {lyr}")


@pytest.mark.slow
def test_greedy_generate_decode_window_matches_full(hf_llama_pair):
    """decode_window=W (segment-sliced decode cache reads) reproduces the
    full-cache decode scan exactly for scan/unroll layers and bf16/int8 KV,
    including a window that does not divide max_new_tokens. The 10-token
    prompt + 150 new tokens force a 192-slot cache, so the first segments
    read strict 64/128-slot slices."""
    _, params = hf_llama_pair
    cfg = LlamaConfig(vocab_size=LCFG.vocab_size, dim=LCFG.dim,
                      layers=LCFG.layers, heads=LCFG.heads,
                      kv_heads=LCFG.kv_heads, mlp_dim=LCFG.mlp_dim,
                      max_seq=256)
    rng = np.random.default_rng(8)
    prompt = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 10)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)
    for kv_dtype in (None, jnp.int8):
        want = np.asarray(llama.greedy_generate(
            params, embeds, cfg, max_new_tokens=150, eos_token=-1,
            compute_dtype=jnp.float32, kv_dtype=kv_dtype))
        for lyr in ("scan", "unroll"):
            got = np.asarray(llama.greedy_generate(
                params, embeds, cfg, max_new_tokens=150, eos_token=-1,
                compute_dtype=jnp.float32, kv_dtype=kv_dtype, layers=lyr,
                decode_window=64))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"{kv_dtype} {lyr}")


@pytest.mark.slow
def test_greedy_generate_early_stop_matches_scan(hf_llama_pair):
    """early_stop=True (while_loop halting when all rows hit EOS) is
    bit-identical to the scan decode, both when EOS never fires (eos=-1)
    and when it fires mid-generation (eos = a token the model actually
    emits, so the loop exits early and the EOS-filled buffer must equal
    the scan's post-finish padding). Covers unroll + int8 KV +
    decode_window composition."""
    _, params = hf_llama_pair
    rng = np.random.default_rng(9)
    prompt = jnp.asarray(rng.integers(3, LCFG.vocab_size, (2, 6)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)
    ref = np.asarray(llama.greedy_generate(
        params, embeds, LCFG, max_new_tokens=10, eos_token=-1,
        compute_dtype=jnp.float32))
    # a token both rows emit (row 0's 4th generated token is as good as
    # any); using it as EOS makes every row finish before max_new
    eos = int(ref[0, 3])
    for kv_dtype in (None, jnp.int8):
        for lyr in ("scan", "unroll"):
            for dw in (None, 4):
                for eos_token in (-1, eos):
                    want = np.asarray(llama.greedy_generate(
                        params, embeds, LCFG, max_new_tokens=10,
                        eos_token=eos_token, compute_dtype=jnp.float32,
                        kv_dtype=kv_dtype, layers=lyr))
                    got = np.asarray(llama.greedy_generate(
                        params, embeds, LCFG, max_new_tokens=10,
                        eos_token=eos_token, compute_dtype=jnp.float32,
                        kv_dtype=kv_dtype, layers=lyr, decode_window=dw,
                        early_stop=True))
                    np.testing.assert_array_equal(
                        got, want, err_msg=f"{kv_dtype} {lyr} dw={dw} "
                                           f"eos={eos_token}")


@pytest.mark.slow
def test_greedy_generate_eos_padding(hf_llama_pair):
    _, params = hf_llama_pair
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(3, LCFG.vocab_size, (1, 4)), jnp.int32)
    embeds = llama.embed_tokens(params, prompt)
    # pick the model's own first greedy token as "EOS" -> everything padded
    first = int(np.asarray(llama.greedy_generate(
        params, embeds, LCFG, 1, eos_token=-1, compute_dtype=jnp.float32))[0, 0])
    out = np.asarray(llama.greedy_generate(
        params, embeds, LCFG, 6, eos_token=first, compute_dtype=jnp.float32))[0]
    assert (out == first).all()


@pytest.mark.slow
def test_llava_generate_splices_image():
    vcfg = VITConfig(image_size=32, patch_size=8, width=48, layers=3, heads=4,
                     embed_dim=32)
    cfg = llava.LLaVAConfig(vision=vcfg, lm=LCFG)
    params = llava.init(jax.random.key(0), cfg)

    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    pre = jnp.asarray([[1, 5, 9]], jnp.int32)
    post = jnp.asarray([[7, 8]], jnp.int32)

    img_emb = llava.encode_images(params, images, cfg, jnp.float32)
    assert img_emb.shape == (1, 16, LCFG.dim)  # 16 patches, CLS dropped

    out = llava.generate(params, images, pre, post, cfg, max_new_tokens=4,
                         eos_token=-1, compute_dtype=jnp.float32)
    assert out.shape == (1, 4)
    # a different image must change the decode path inputs
    img2 = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    emb2 = llava.encode_images(params, img2, cfg, jnp.float32)
    assert not np.allclose(np.asarray(img_emb), np.asarray(emb2))


def test_llava_hf_converter_roundtrip():
    """Converter layout check against a tiny HF LlavaForConditionalGeneration."""
    try:
        from transformers import (
            CLIPVisionConfig, LlavaConfig as HFLlavaConfig,
            LlavaForConditionalGeneration, LlamaConfig as HFLlamaConfig,
        )
    except ImportError:
        pytest.skip("no Llava in this transformers")

    vcfg = VITConfig(image_size=32, patch_size=8, width=48, layers=2, heads=4,
                     embed_dim=32)
    hf_cfg = HFLlavaConfig(
        vision_config=CLIPVisionConfig(
            hidden_size=48, intermediate_size=192, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            hidden_act="quick_gelu",
        ),
        text_config=HFLlamaConfig(
            vocab_size=LCFG.vocab_size, hidden_size=LCFG.dim,
            num_hidden_layers=LCFG.layers, num_attention_heads=LCFG.heads,
            num_key_value_heads=LCFG.kv_heads, intermediate_size=LCFG.mlp_dim,
            tie_word_embeddings=False,
        ),
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    torch.manual_seed(1)
    model = LlavaForConditionalGeneration(hf_cfg).eval()
    from mmrs_tpu.models.convert import state_dict_to_numpy

    # RAW state dict: hf_llava must normalize whichever key layout this
    # transformers version emits (the >=4.52 layout hoists the UNTIED
    # lm_head to the top level — dropping it silently ties the logits to
    # the embeddings, the bug this test pins)
    sd = state_dict_to_numpy(model.state_dict())
    cfg = llava.LLaVAConfig(vision=vcfg, lm=LCFG)
    params = llava.hf_llava(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["lm"]["lm_head"]),
        model.state_dict()["lm_head.weight"].numpy().T
        if "lm_head.weight" in model.state_dict()
        else model.state_dict()["language_model.lm_head.weight"].numpy().T)
    assert not np.allclose(np.asarray(params["lm"]["lm_head"]),
                           np.asarray(params["lm"]["embed"]).T)

    rng = np.random.default_rng(5)
    images = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        pv = torch.from_numpy(images.transpose(0, 3, 1, 2))
        t_feats = model.get_image_features(
            pixel_values=pv, vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
        if isinstance(t_feats, (list, tuple)):
            t_feats = t_feats[0]
        t_feats = t_feats.numpy()
        if t_feats.ndim == 2:   # some versions return [N_patches, D] flat
            t_feats = t_feats[None]

    j_feats = np.asarray(
        llava.encode_images(params, jnp.asarray(images), cfg, jnp.float32)
    )
    np.testing.assert_allclose(j_feats, t_feats, atol=5e-4, rtol=5e-4)
