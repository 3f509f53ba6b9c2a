"""Golden parity: our JAX towers vs randomly-initialized torch/HF models.

The reference's smoke tests record known-good outputs (code/test_clip.py:18
comment). Without network access we can't load pretrained weights, so parity
is proven structurally: build a small HF CLIPModel / BertForSequenceClassification
offline from a config (random init), convert the state dict with
mmrs_tpu.models.convert, and assert our f32 forward matches torch's to
tight tolerance. Converting real ViT-B/32 weights is then just a larger
instance of the same mapping.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mmrs_tpu.models import bert, clip, convert, text_transformer, vit
from mmrs_tpu.models.configs import BertConfig, TextConfig, VITConfig

VCFG = VITConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4, embed_dim=32)
TCFG = TextConfig(vocab_size=128, context_length=16, width=64, layers=2, heads=4, embed_dim=32)


@pytest.fixture(scope="module")
def hf_clip_pair():
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config={
            "vocab_size": TCFG.vocab_size,
            "hidden_size": TCFG.width,
            "intermediate_size": TCFG.width * 4,
            "num_hidden_layers": TCFG.layers,
            "num_attention_heads": TCFG.heads,
            "max_position_embeddings": TCFG.context_length,
            "hidden_act": "quick_gelu",
            "eos_token_id": TCFG.vocab_size - 1,
            "bos_token_id": TCFG.vocab_size - 2,
            "pad_token_id": 0,
            "attention_dropout": 0.0,
        },
        vision_config={
            "hidden_size": VCFG.width,
            "intermediate_size": VCFG.width * 4,
            "num_hidden_layers": VCFG.layers,
            "num_attention_heads": VCFG.heads,
            "image_size": VCFG.image_size,
            "patch_size": VCFG.patch_size,
            "hidden_act": "quick_gelu",
            "attention_dropout": 0.0,
        },
        projection_dim=VCFG.embed_dim,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    sd = convert.state_dict_to_numpy(model.state_dict())
    params = convert.hf_clip(sd, VCFG, TCFG)
    return model, params


def test_vision_tower_parity(hf_clip_pair):
    model, params = hf_clip_pair
    rng = np.random.default_rng(0)
    images = rng.normal(size=(3, VCFG.image_size, VCFG.image_size, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()

    j_out = np.asarray(
        vit.apply(params["visual"], jnp.asarray(images), VCFG, compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-4)


def test_text_tower_parity(hf_clip_pair):
    model, params = hf_clip_pair
    rng = np.random.default_rng(1)
    # Tokens: ids < eos everywhere, one EOS per row so HF's eos-pooling and
    # our argmax-pooling select the same position.
    b, t = 4, TCFG.context_length
    tokens = rng.integers(1, TCFG.vocab_size - 2, size=(b, t))
    eot_pos = rng.integers(3, t, size=(b,))
    for i, p in enumerate(eot_pos):
        tokens[i, p] = TCFG.vocab_size - 1
        tokens[i, p + 1:] = 0
    tokens = tokens.astype(np.int64)

    with torch.no_grad():
        t_out = model.get_text_features(input_ids=torch.from_numpy(tokens)).numpy()

    j_out = np.asarray(
        text_transformer.apply(
            params["text"], jnp.asarray(tokens, jnp.int32), TCFG,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-4)


def test_zeroshot_probs_parity(hf_clip_pair):
    """End-to-end test_clip.py contract: softmax(100 * cosine)."""
    model, params = hf_clip_pair
    rng = np.random.default_rng(2)
    images = rng.normal(size=(1, VCFG.image_size, VCFG.image_size, 3)).astype(np.float32)
    tokens = np.zeros((3, TCFG.context_length), np.int64)
    tokens[:, 0] = TCFG.vocab_size - 2
    tokens[:, 1] = rng.integers(1, 100, 3)
    tokens[:, 2] = TCFG.vocab_size - 1

    with torch.no_grad():
        i_t = model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2)))
        t_t = model.get_text_features(input_ids=torch.from_numpy(tokens))
        i_t = i_t / i_t.norm(dim=-1, keepdim=True)
        t_t = t_t / t_t.norm(dim=-1, keepdim=True)
        probs_t = (100.0 * i_t @ t_t.T).softmax(dim=-1).numpy()

    from mmrs_tpu.models.clip import CLIPConfig as MyCfg, zeroshot_probs
    mycfg = MyCfg(vision=VCFG, text=TCFG)
    i_j = clip.encode_image(params, jnp.asarray(images), mycfg, compute_dtype=jnp.float32)
    t_j = clip.encode_text(params, jnp.asarray(tokens, jnp.int32), mycfg,
                           compute_dtype=jnp.float32)
    probs_j = np.asarray(zeroshot_probs(i_j, t_j))
    np.testing.assert_allclose(probs_j, probs_t, atol=1e-4)


def test_bert_taiyi_parity():
    from transformers import BertConfig as HFBertConfig, BertForSequenceClassification

    bcfg = BertConfig(
        vocab_size=200, hidden_size=64, layers=2, heads=4,
        intermediate_size=128, max_position_embeddings=32, num_labels=24,
    )
    hf_cfg = HFBertConfig(
        vocab_size=bcfg.vocab_size,
        hidden_size=bcfg.hidden_size,
        num_hidden_layers=bcfg.layers,
        num_attention_heads=bcfg.heads,
        intermediate_size=bcfg.intermediate_size,
        max_position_embeddings=bcfg.max_position_embeddings,
        num_labels=bcfg.num_labels,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        classifier_dropout=0.0,
    )
    torch.manual_seed(1)
    model = BertForSequenceClassification(hf_cfg).eval()
    params = convert.hf_bert_classifier(
        convert.state_dict_to_numpy(model.state_dict()), bcfg
    )

    rng = np.random.default_rng(3)
    tokens = rng.integers(1, bcfg.vocab_size, size=(3, 12)).astype(np.int64)
    mask = np.ones_like(tokens)
    mask[0, 9:] = 0  # padded row

    with torch.no_grad():
        t_out = model(
            input_ids=torch.from_numpy(tokens),
            attention_mask=torch.from_numpy(mask),
        ).logits.numpy()

    j_out = np.asarray(
        bert.apply(params, jnp.asarray(tokens, jnp.int32),
                   jnp.asarray(mask, jnp.int32), bcfg, compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(j_out, t_out, atol=3e-4, rtol=3e-4)


@pytest.mark.slow
def test_openai_checkpoint_format_roundtrip():
    """The OpenAI `clip` package layout converts to identical params as HF
    (same math), verified by building an OpenAI-style state dict from the HF
    one and comparing a forward pass."""
    from transformers import CLIPConfig, CLIPModel

    # Tiny model again, but exercise the in_proj_{weight,bias} fused-QKV path.
    torch.manual_seed(2)
    vcfg, tcfg = VCFG, TCFG
    cfgs = CLIPConfig(
        text_config=dict(
            vocab_size=tcfg.vocab_size, hidden_size=tcfg.width,
            intermediate_size=tcfg.width * 4, num_hidden_layers=tcfg.layers,
            num_attention_heads=tcfg.heads,
            max_position_embeddings=tcfg.context_length,
            hidden_act="quick_gelu", eos_token_id=tcfg.vocab_size - 1,
        ),
        vision_config=dict(
            hidden_size=vcfg.width, intermediate_size=vcfg.width * 4,
            num_hidden_layers=vcfg.layers, num_attention_heads=vcfg.heads,
            image_size=vcfg.image_size, patch_size=vcfg.patch_size,
            hidden_act="quick_gelu",
        ),
        projection_dim=vcfg.embed_dim,
    )
    model = CLIPModel(cfgs).eval()
    hf_sd = convert.state_dict_to_numpy(model.state_dict())

    # Synthesize the OpenAI layout from the HF tensors.
    oai = {
        "visual.conv1.weight": hf_sd["vision_model.embeddings.patch_embedding.weight"],
        "visual.class_embedding": hf_sd["vision_model.embeddings.class_embedding"],
        "visual.positional_embedding": hf_sd["vision_model.embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": hf_sd["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": hf_sd["vision_model.pre_layrnorm.bias"],
        "visual.ln_post.weight": hf_sd["vision_model.post_layernorm.weight"],
        "visual.ln_post.bias": hf_sd["vision_model.post_layernorm.bias"],
        "visual.proj": hf_sd["visual_projection.weight"].T,
        "token_embedding.weight": hf_sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": hf_sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": hf_sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": hf_sd["text_model.final_layer_norm.bias"],
        "text_projection": hf_sd["text_projection.weight"].T,
        "logit_scale": hf_sd["logit_scale"],
    }
    for tower, prefix in [("vision_model.encoder", "visual.transformer"),
                          ("text_model.encoder", "transformer")]:
        for i in range(2):
            g = lambda n: hf_sd[f"{tower}.layers.{i}.{n}"]
            qw, kw, vw = (g("self_attn.q_proj.weight"), g("self_attn.k_proj.weight"),
                          g("self_attn.v_proj.weight"))
            qb, kb, vb = (g("self_attn.q_proj.bias"), g("self_attn.k_proj.bias"),
                          g("self_attn.v_proj.bias"))
            oai[f"{prefix}.resblocks.{i}.attn.in_proj_weight"] = np.concatenate([qw, kw, vw], 0)
            oai[f"{prefix}.resblocks.{i}.attn.in_proj_bias"] = np.concatenate([qb, kb, vb], 0)
            oai[f"{prefix}.resblocks.{i}.attn.out_proj.weight"] = g("self_attn.out_proj.weight")
            oai[f"{prefix}.resblocks.{i}.attn.out_proj.bias"] = g("self_attn.out_proj.bias")
            oai[f"{prefix}.resblocks.{i}.ln_1.weight"] = g("layer_norm1.weight")
            oai[f"{prefix}.resblocks.{i}.ln_1.bias"] = g("layer_norm1.bias")
            oai[f"{prefix}.resblocks.{i}.ln_2.weight"] = g("layer_norm2.weight")
            oai[f"{prefix}.resblocks.{i}.ln_2.bias"] = g("layer_norm2.bias")
            oai[f"{prefix}.resblocks.{i}.mlp.c_fc.weight"] = g("mlp.fc1.weight")
            oai[f"{prefix}.resblocks.{i}.mlp.c_fc.bias"] = g("mlp.fc1.bias")
            oai[f"{prefix}.resblocks.{i}.mlp.c_proj.weight"] = g("mlp.fc2.weight")
            oai[f"{prefix}.resblocks.{i}.mlp.c_proj.bias"] = g("mlp.fc2.bias")

    p_hf = convert.hf_clip(hf_sd, vcfg, tcfg)
    p_oai = convert.openai_clip(oai, vcfg, tcfg)

    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.normal(size=(2, vcfg.image_size, vcfg.image_size, 3))
                         .astype(np.float32))
    out_hf = np.asarray(vit.apply(p_hf["visual"], images, vcfg, compute_dtype=jnp.float32))
    out_oai = np.asarray(vit.apply(p_oai["visual"], images, vcfg, compute_dtype=jnp.float32))
    np.testing.assert_allclose(out_hf, out_oai, atol=1e-5)
