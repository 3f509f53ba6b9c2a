"""Release-layout drop-in: fake checkpoints in the EXACT published file
layouts prove `mmrs parity --release DIR` runs the whole gate end-to-end,
so the day real weights land requires zero code (VERDICT r2 Next #3).

Layouts synthesized here:
  - OpenAI `ViT-B-32.pt`: a real TorchScript archive (what clip.load
    downloads, code/test_clip.py:6)
  - HF CLIPModel dir: transformers save_pretrained, SHARDED safetensors
  - Taiyi BertForSequenceClassification dir + vocab.txt
  - llava original (liuhaotian) layout: sharded pytorch_model bins +
    index json + tokenizer.model (code/test_llava.py:8-13)
  - bpe_simple_vocab_16e6.txt.gz merges file
"""

import gzip
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from mmrs_tpu.models import release  # noqa: E402


# --------------------------------------------------------------------------
# synthesis helpers
# --------------------------------------------------------------------------

class _Container(nn.Module):
    def forward(self):
        return 1


def module_from_flat(flat):
    """Nested torch module whose state_dict has exactly `flat`'s keys —
    scripting it yields an archive in the OpenAI release format."""
    root = _Container()
    for name, arr in flat.items():
        parts = name.split(".")
        m = root
        for p in parts[:-1]:
            if not hasattr(m, p) or not isinstance(getattr(m, p), nn.Module):
                m.add_module(p, nn.Module())
            m = getattr(m, p)
        m.register_parameter(
            parts[-1], nn.Parameter(torch.tensor(np.ascontiguousarray(arr))))
    return root


def _blocks_flat(prefix, layers, width, mlp, rng):
    out = {}
    for i in range(layers):
        p = f"{prefix}.resblocks.{i}"
        out[f"{p}.ln_1.weight"] = rng.normal(size=width).astype(np.float32)
        out[f"{p}.ln_1.bias"] = rng.normal(size=width).astype(np.float32)
        out[f"{p}.ln_2.weight"] = rng.normal(size=width).astype(np.float32)
        out[f"{p}.ln_2.bias"] = rng.normal(size=width).astype(np.float32)
        out[f"{p}.attn.in_proj_weight"] = rng.normal(
            size=(3 * width, width)).astype(np.float32) * 0.05
        out[f"{p}.attn.in_proj_bias"] = rng.normal(
            size=3 * width).astype(np.float32) * 0.05
        out[f"{p}.attn.out_proj.weight"] = rng.normal(
            size=(width, width)).astype(np.float32) * 0.05
        out[f"{p}.attn.out_proj.bias"] = rng.normal(
            size=width).astype(np.float32) * 0.05
        out[f"{p}.mlp.c_fc.weight"] = rng.normal(
            size=(mlp, width)).astype(np.float32) * 0.05
        out[f"{p}.mlp.c_fc.bias"] = rng.normal(size=mlp).astype(np.float32)
        out[f"{p}.mlp.c_proj.weight"] = rng.normal(
            size=(width, mlp)).astype(np.float32) * 0.05
        out[f"{p}.mlp.c_proj.bias"] = rng.normal(size=width).astype(np.float32)
    return out


def openai_flat_state(width=64, patch=16, grid=2, layers=2, embed=32,
                      t_width=64, t_layers=2, vocab=49408, ctx=77, seed=0):
    rng = np.random.default_rng(seed)
    flat = {
        "visual.conv1.weight": rng.normal(
            size=(width, 3, patch, patch)).astype(np.float32) * 0.05,
        "visual.class_embedding": rng.normal(size=width).astype(np.float32),
        "visual.positional_embedding": rng.normal(
            size=(grid * grid + 1, width)).astype(np.float32) * 0.02,
        "visual.ln_pre.weight": np.ones(width, np.float32),
        "visual.ln_pre.bias": np.zeros(width, np.float32),
        "visual.ln_post.weight": np.ones(width, np.float32),
        "visual.ln_post.bias": np.zeros(width, np.float32),
        "visual.proj": rng.normal(size=(width, embed)).astype(np.float32) * 0.05,
        "token_embedding.weight": rng.normal(
            size=(vocab, t_width)).astype(np.float32) * 0.02,
        "positional_embedding": rng.normal(
            size=(ctx, t_width)).astype(np.float32) * 0.02,
        "ln_final.weight": np.ones(t_width, np.float32),
        "ln_final.bias": np.zeros(t_width, np.float32),
        "text_projection": rng.normal(
            size=(t_width, embed)).astype(np.float32) * 0.05,
        "logit_scale": np.float32(np.log(100.0)),
    }
    flat.update(_blocks_flat("visual.transformer", layers, width, 4 * width, rng))
    flat.update(_blocks_flat("transformer", t_layers, t_width, 4 * t_width, rng))
    return flat


def llava_original_flat(dim=32, layers=2, heads=4, kv_heads=2, mlp=64,
                        vocab=300, v_width=48, v_patch=8, v_grid=2,
                        v_layers=2, seed=1):
    rng = np.random.default_rng(seed)

    def r(*shape, s=0.05):
        return rng.normal(size=shape).astype(np.float32) * s

    hd = dim // heads
    flat = {
        "model.embed_tokens.weight": r(vocab, dim),
        "model.norm.weight": np.ones(dim, np.float32),
        "lm_head.weight": r(vocab, dim),
        "model.mm_projector.0.weight": r(dim, v_width),
        "model.mm_projector.0.bias": r(dim),
        "model.mm_projector.2.weight": r(dim, dim),
        "model.mm_projector.2.bias": r(dim),
    }
    for i in range(layers):
        p = f"model.layers.{i}"
        flat[f"{p}.input_layernorm.weight"] = np.ones(dim, np.float32)
        flat[f"{p}.post_attention_layernorm.weight"] = np.ones(dim, np.float32)
        flat[f"{p}.self_attn.q_proj.weight"] = r(dim, dim)
        flat[f"{p}.self_attn.k_proj.weight"] = r(kv_heads * hd, dim)
        flat[f"{p}.self_attn.v_proj.weight"] = r(kv_heads * hd, dim)
        flat[f"{p}.self_attn.o_proj.weight"] = r(dim, dim)
        flat[f"{p}.mlp.gate_proj.weight"] = r(mlp, dim)
        flat[f"{p}.mlp.up_proj.weight"] = r(mlp, dim)
        flat[f"{p}.mlp.down_proj.weight"] = r(dim, mlp)
    vt = "model.vision_tower.vision_tower"
    flat[f"{vt}.vision_model.embeddings.patch_embedding.weight"] = \
        r(v_width, 3, v_patch, v_patch)
    flat[f"{vt}.vision_model.embeddings.class_embedding"] = r(v_width)
    flat[f"{vt}.vision_model.embeddings.position_embedding.weight"] = \
        r(v_grid * v_grid + 1, v_width)
    flat[f"{vt}.vision_model.pre_layrnorm.weight"] = np.ones(v_width, np.float32)
    flat[f"{vt}.vision_model.pre_layrnorm.bias"] = np.zeros(v_width, np.float32)
    flat[f"{vt}.vision_model.post_layernorm.weight"] = np.ones(v_width, np.float32)
    flat[f"{vt}.vision_model.post_layernorm.bias"] = np.zeros(v_width, np.float32)
    for i in range(v_layers):
        p = f"{vt}.vision_model.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            flat[f"{p}.{ln}.weight"] = np.ones(v_width, np.float32)
            flat[f"{p}.{ln}.bias"] = np.zeros(v_width, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            flat[f"{p}.self_attn.{proj}.weight"] = r(v_width, v_width)
            flat[f"{p}.self_attn.{proj}.bias"] = r(v_width)
        flat[f"{p}.mlp.fc1.weight"] = r(4 * v_width, v_width)
        flat[f"{p}.mlp.fc1.bias"] = r(4 * v_width)
        flat[f"{p}.mlp.fc2.weight"] = r(v_width, 4 * v_width)
        flat[f"{p}.mlp.fc2.bias"] = r(v_width)
    return flat


def write_sharded_bins(d, flat, n_shards=2):
    """pytorch_model-0000X-of-0000Y.bin + pytorch_model.bin.index.json."""
    keys = sorted(flat)
    per = (len(keys) + n_shards - 1) // n_shards
    weight_map = {}
    for s in range(n_shards):
        shard_keys = keys[s * per:(s + 1) * per]
        name = f"pytorch_model-{s + 1:05d}-of-{n_shards:05d}.bin"
        torch.save({k: torch.tensor(np.ascontiguousarray(flat[k]))
                    for k in shard_keys}, os.path.join(d, name))
        for k in shard_keys:
            weight_map[k] = name
    with open(os.path.join(d, "pytorch_model.bin.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": 0},
                   "weight_map": weight_map}, f)


def write_sp_model(path):
    from mmrs_tpu.models.sentencepiece import Piece, serialize_model

    pieces = [Piece("<unk>", 0.0, 2), Piece("<s>", 0.0, 3),
              Piece("</s>", 0.0, 3)]
    pieces += [Piece(f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
    score = -1.0
    for text in ["▁a", "▁the", "ye", "yes", "▁yes", "no", "▁no"] + \
            list("▁abcdefghijklmnopqrstuvwxyz.?!'"):
        pieces.append(Piece(text, score, 1))
        score -= 1.0
    with open(path, "wb") as f:
        f.write(serialize_model(pieces))


def write_bpe_gz(path):
    from mmrs_tpu.models.tokenizer import CLIPTokenizer

    words = ["diagram", "dog", "cat", "photo", "lychee", "guitar", "shirt",
             "a", "of", "the", "hello", "world", "yes", "no", "image",
             "contain", "does", "this"]
    merges = CLIPTokenizer.synthetic(words).bpe_ranks
    lines = ["#version: 0.2"] + [" ".join(m) for m in
                                 sorted(merges, key=merges.get)]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def test_safetensors_roundtrip(tmp_path):
    p = str(tmp_path / "t.safetensors")
    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.normal(size=(3, 4)).astype(np.float32),
        "b": np.arange(6, dtype=np.int64).reshape(2, 3),
        "c": rng.normal(size=(5,)).astype(np.float16),
        "d": np.array([1, 2, 255], np.uint8),
    }
    release.write_safetensors(p, tensors)
    out = release.read_safetensors(p)
    np.testing.assert_array_equal(out["a"], tensors["a"])
    np.testing.assert_array_equal(out["b"], tensors["b"])
    # f16 is widened to f32 at the boundary
    assert out["c"].dtype == np.float32
    np.testing.assert_allclose(out["c"], tensors["c"].astype(np.float32))
    np.testing.assert_array_equal(out["d"], tensors["d"])


@pytest.fixture(scope="module")
def openai_pt(tmp_path_factory):
    d = tmp_path_factory.mktemp("openai")
    flat = openai_flat_state()
    path = str(d / "ViT-B-32.pt")
    torch.jit.save(torch.jit.script(module_from_flat(flat)), path)
    write_bpe_gz(str(d / "bpe_simple_vocab_16e6.txt.gz"))
    return path, flat


def test_openai_torchscript_archive(openai_pt):
    from mmrs_tpu.models.convert import openai_clip

    path, flat = openai_pt
    rm = release.load_release_model(path)
    assert rm.kind == "openai_clip"
    v, t = rm.config.vision, rm.config.text
    assert (v.image_size, v.patch_size, v.width, v.layers, v.heads,
            v.embed_dim) == (32, 16, 64, 2, 1, 32)
    assert (t.vocab_size, t.context_length, t.width, t.layers) == \
        (49408, 77, 64, 2)
    # conversion identical to feeding the state dict straight through
    direct = openai_clip(flat, v, t)
    np.testing.assert_array_equal(
        np.asarray(rm.params["visual"]["patch_kernel"]),
        np.asarray(direct["visual"]["patch_kernel"]))
    np.testing.assert_array_equal(
        np.asarray(rm.params["text"]["blocks"]["attn"]["wq"]),
        np.asarray(direct["text"]["blocks"]["attn"]["wq"]))
    assert rm.extras.get("clip_bpe", "").endswith(".gz")


@pytest.fixture(scope="module")
def hf_clip_dir(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    d = str(tmp_path_factory.mktemp("hfclip") / "clip-vit-tiny-patch16")
    cfg = transformers.CLIPConfig(
        projection_dim=32,
        vision_config={"hidden_size": 64, "num_hidden_layers": 2,
                       "num_attention_heads": 4, "image_size": 32,
                       "patch_size": 16, "intermediate_size": 128,
                       "hidden_act": "quick_gelu"},
        text_config={"hidden_size": 48, "num_hidden_layers": 2,
                     "num_attention_heads": 4, "vocab_size": 200,
                     "max_position_embeddings": 24,
                     "intermediate_size": 96, "hidden_act": "quick_gelu"},
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg)
    # tiny shard size forces the model.safetensors.index.json sharded layout
    model.save_pretrained(d, max_shard_size="200KB")
    return d, model


def test_hf_clip_sharded_safetensors_dir(hf_clip_dir):
    from mmrs_tpu.models.convert import hf_clip, state_dict_to_numpy

    d, model = hf_clip_dir
    names = os.listdir(d)
    assert "model.safetensors.index.json" in names, names  # really sharded
    rm = release.load_release_model(d)
    assert rm.kind == "hf_clip"
    v, t = rm.config.vision, rm.config.text
    assert (v.width, v.layers, v.heads, v.image_size, v.patch_size,
            v.embed_dim) == (64, 2, 4, 32, 16, 32)
    assert (t.width, t.layers, t.vocab_size, t.context_length) == \
        (48, 2, 200, 24)
    direct = hf_clip(state_dict_to_numpy(model.state_dict()), v, t)
    np.testing.assert_allclose(
        np.asarray(rm.params["visual"]["proj"], np.float32),
        np.asarray(direct["visual"]["proj"], np.float32), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rm.params["text"]["blocks"]["mlp"]["w1"], np.float32),
        np.asarray(direct["text"]["blocks"]["mlp"]["w1"], np.float32),
        atol=1e-6)


def test_taiyi_bert_dir(tmp_path):
    transformers = pytest.importorskip("transformers")
    d = str(tmp_path / "Taiyi-CLIP-Roberta-tiny")
    cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, num_labels=16)
    torch.manual_seed(0)
    model = transformers.BertForSequenceClassification(cfg)
    model.save_pretrained(d, safe_serialization=False)  # pytorch_model.bin
    with open(os.path.join(d, "vocab.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                           "a", "b", "c", "the", "##s", "荔", "枝"]))
    rm = release.load_release_model(d)
    assert rm.kind == "taiyi_bert"
    assert rm.config.hidden_size == 32 and rm.config.layers == 2
    assert rm.config.num_labels == 16  # derived from classifier.weight
    assert rm.extras.get("bert_vocab", "").endswith("vocab.txt")
    assert np.asarray(rm.params["classifier_kernel"]).shape == (32, 16)


def test_llava_original_sharded_dir(tmp_path):
    d = str(tmp_path / "llava-v1.5-tiny")
    os.makedirs(d)
    flat = llava_original_flat()
    write_sharded_bins(d, flat, n_shards=2)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"model_type": "llava",
                   "architectures": ["LlavaLlamaForCausalLM"],
                   "hidden_size": 32, "num_hidden_layers": 2,
                   "num_attention_heads": 4, "num_key_value_heads": 2,
                   "intermediate_size": 64, "vocab_size": 300,
                   "max_position_embeddings": 128, "rms_norm_eps": 1e-5,
                   "mm_hidden_size": 48,
                   "mm_vision_tower": "openai/clip-vit-large-patch14-336"},
                  f)
    write_sp_model(os.path.join(d, "tokenizer.model"))
    rm = release.load_release_model(d)
    assert rm.kind == "llava"
    assert (rm.config.lm.dim, rm.config.lm.layers, rm.config.lm.kv_heads) \
        == (32, 2, 2)
    # vision tower derived from the state dict (config.json has no
    # vision_config in the original layout)
    assert (rm.config.vision.width, rm.config.vision.patch_size,
            rm.config.vision.image_size) == (48, 8, 16)
    assert rm.extras.get("sp_model", "").endswith("tokenizer.model")
    # the params are usable: one greedy decode step on the converted tree
    import jax
    import jax.numpy as jnp

    from mmrs_tpu.models import llava as llava_m

    out = llava_m.generate(
        rm.params,
        jax.random.normal(jax.random.key(0),
                          (1, rm.config.vision.image_size,
                           rm.config.vision.image_size, 3)),
        jnp.asarray([[1, 5, 6]], jnp.int32),
        jnp.asarray([[7, 8]], jnp.int32),
        rm.config, max_new_tokens=3, eos_token=2,
        compute_dtype=jnp.float32)
    assert np.asarray(out).shape == (1, 3)


@pytest.mark.slow
def test_scan_pack_and_cli_release_gate(openai_pt, tmp_path, capsys):
    """The whole drop-in flow: a pack directory -> `mmrs parity --release`
    runs smoke + int8 + tokenizer differential and reports every section."""
    from PIL import Image

    from mmrs_tpu.cli.main import main

    pt_path, _ = openai_pt
    pack = os.path.dirname(pt_path)
    img = str(tmp_path / "CLIP.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8).astype(
        np.uint8)).save(img)

    with pytest.raises(SystemExit) as exc:
        main(["parity", "--release", pack, "--image", img])
    rc = exc.value.code
    report = json.loads(capsys.readouterr().out)
    rel = report["release"]
    assert rel["found_models"] == {"openai_clip": pt_path}
    assert "clip_bpe" in rel["found_tokenizers"]
    assert "smoke" in rel and len(rel["smoke"]["probs"]) == 3
    assert abs(sum(rel["smoke"]["probs"]) - 1.0) < 1e-3
    assert "int8_tower" in rel and "min_cosine_vs_f32" in rel["int8_tower"]
    bpe = rel["clip_bpe_differential"]
    assert bpe["ok"] or "skipped" in bpe, bpe
    if "skipped" not in bpe:
        assert bpe["checked"] > 0 and bpe["mismatches"] == []
    # random weights cannot hit the recorded golden probs: the gate must
    # REPORT that honestly (smoke ok False -> exit 1), not crash
    assert rel["smoke"]["ok"] is False and rc == 1


def test_sp_differential_on_real_proto(tmp_path):
    from mmrs_tpu.eval.parity import sp_differential

    p = str(tmp_path / "tokenizer.model")
    write_sp_model(p)
    out = sp_differential(p)
    assert out["ok"], out
    if "skipped" not in out:
        assert out["checked"] > 0


def test_bert_vocab_differential(tmp_path):
    from mmrs_tpu.eval.parity import bert_vocab_differential

    p = str(tmp_path / "vocab.txt")
    chars = sorted(set("一张荔枝的图片吉他羽毛球拍包子恤中文abcdefghijklm"
                       "nopqrstuvwxyz0123456789"))
    with open(p, "w", encoding="utf-8") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                          + chars + ["##" + c for c in chars
                                     if not _is_cjk_ch(c)]))
    out = bert_vocab_differential(p)
    assert out["ok"], out


def _is_cjk_ch(c):
    return 0x4E00 <= ord(c) <= 0x9FFF


def test_llava_modern_hf_layout_dir(tmp_path):
    """transformers >= 4.52 layout ('model.'-prefixed tree, UNTIED lm_head
    hoisted to the top level): the release loader must keep the real
    lm_head instead of silently tying it to the embeddings."""
    try:
        from transformers import (
            CLIPVisionConfig, LlavaConfig as HFLlavaConfig,
            LlavaForConditionalGeneration, LlamaConfig as HFLlamaConfig,
        )
    except ImportError:
        pytest.skip("no Llava in this transformers")
    import torch

    hf_cfg = HFLlavaConfig(
        vision_config=CLIPVisionConfig(
            hidden_size=48, intermediate_size=192, num_hidden_layers=2,
            num_attention_heads=4, image_size=16, patch_size=8,
            projection_dim=32),
        text_config=HFLlamaConfig(
            vocab_size=300, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, tie_word_embeddings=False),
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    torch.manual_seed(3)
    model = LlavaForConditionalGeneration(hf_cfg).eval()
    sdk = list(model.state_dict().keys())
    if not any(k.startswith("model.") for k in sdk):
        pytest.skip("this transformers still emits the old llava layout")

    d = str(tmp_path / "llava-hf-tiny")
    os.makedirs(d)
    flat = {k: v.numpy() for k, v in model.state_dict().items()}
    write_sharded_bins(d, flat, n_shards=2)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"model_type": "llava",
                   "architectures": ["LlavaForConditionalGeneration"],
                   "vision_config": hf_cfg.vision_config.to_dict(),
                   "text_config": hf_cfg.text_config.to_dict()}, f)
    write_sp_model(os.path.join(d, "tokenizer.model"))

    rm = release.load_release_model(d)
    assert rm.kind == "llava"
    assert (rm.config.lm.dim, rm.config.lm.kv_heads) == (32, 2)
    np.testing.assert_array_equal(
        np.asarray(rm.params["lm"]["lm_head"]),
        model.state_dict()["lm_head.weight"].numpy().T)
    assert not np.allclose(np.asarray(rm.params["lm"]["lm_head"]),
                           np.asarray(rm.params["lm"]["embed"]).T)
