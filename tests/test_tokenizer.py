"""Tokenizers: CLIP BPE vs the HF fast tokenizer algorithm (when buildable
offline) and contract tests; BERT WordPiece vs transformers' BertTokenizer."""

import numpy as np
import pytest

from mmrs_tpu.models.tokenizer import (
    BertWordPieceTokenizer,
    CLIPTokenizer,
    bytes_to_unicode,
)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_clip_tokenizer_layout():
    tok = CLIPTokenizer.synthetic(["hello", "world"], context_length=16)
    out = tok(["hello world", "a photo of hello"])
    assert out.shape == (2, 16)
    assert (out[:, 0] == tok.sot).all()
    # EOT present exactly once per row and is the max id (EOT-pooling contract)
    for row in out:
        nz = row[row != 0]
        assert nz[-1] == tok.eot
        assert nz.max() == tok.eot
    # merged words encode to single tokens
    ids = tok.encode("hello")
    assert len(ids) == 1


def test_clip_tokenizer_truncation():
    tok = CLIPTokenizer.synthetic([], context_length=8)
    long_text = "x " * 50
    out = tok([long_text], truncate=True)
    assert out.shape == (1, 8)
    assert out[0, -1] == tok.eot
    with pytest.raises(ValueError):
        tok([long_text], truncate=False)


def test_clip_tokenizer_roundtrip():
    tok = CLIPTokenizer.synthetic(["photo"], context_length=32)
    ids = tok.encode("a photo of 2 cats!")
    assert tok.decode(ids) == "a photo of 2 cats !"


def test_clip_bpe_matches_hf_algorithm():
    """Build an HF CLIPTokenizer offline from OUR synthetic vocab/merges and
    compare token streams — proves the BPE algorithm is identical."""
    transformers = pytest.importorskip("transformers")
    import json, tempfile, os

    ours = CLIPTokenizer.synthetic(["photo", "cat", "dog"], context_length=32)
    with tempfile.TemporaryDirectory() as d:
        vocab_file = os.path.join(d, "vocab.json")
        merges_file = os.path.join(d, "merges.txt")
        with open(vocab_file, "w") as f:
            json.dump(ours.encoder, f)
        with open(merges_file, "w") as f:
            f.write("#version: 0.2\n")
            for pair, _rank in sorted(ours.bpe_ranks.items(), key=lambda kv: kv[1]):
                f.write(" ".join(pair) + "\n")
        hf = transformers.CLIPTokenizer(
            vocab_file, merges_file,
            bos_token="<|startoftext|>", eos_token="<|endoftext|>",
            unk_token="<|endoftext|>", pad_token="<|endoftext|>",
        )
        for text in ["a photo of a cat", "dog!", "the CAT and the dog",
                     "a photo of 2 dogs, one cat",
                     # the reference's literal EN retrieval prompts:
                     # f"a photo of {cls}" (/root/reference/CLIP/lab1.py:56)
                     # over its class list (code/union_clip_llava2.py:
                     # 153-158) — hyphens and case exercise the pre-BPE
                     # regex split
                     "a photo of T-shirt", "a photo of guitar",
                     "a photo of badminton-racket", "a photo of baozi",
                     "a photo of lychee"]:
            theirs = hf(text, add_special_tokens=False)["input_ids"]
            assert ours.encode(text) == theirs, text


@pytest.fixture()
def zh_vocab():
    # covers the reference's CN class names (union_clip_llava2.py:144-152,
    # lab_chinese.py pairs) — 拍 and 驴 are deliberately ABSENT so the
    # [UNK] path is exercised on a real prompt
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
            "一", "张", "猫", "的", "图", "片", "狗",
            "photo", "##graph", "ph", "##oto", "a",
            "恤", "吉", "他", "包", "子", "荔", "枝",
            "羽", "毛", "球", "狼", "猞", "猁", "瓷", "器",
            "水", "墨", "画", "油", "t", "##t", "T"]
    return {t: i for i, t in enumerate(toks)}


def test_wordpiece_cjk_split(zh_vocab):
    tok = BertWordPieceTokenizer(zh_vocab, max_length=16)
    ids, mask = tok("一张猫的图片")
    assert ids[0, 0] == zh_vocab["[CLS]"]
    n = mask[0].sum()
    assert ids[0, n - 1] == zh_vocab["[SEP]"]
    middle = [int(t) for t in ids[0, 1:n - 1]]
    assert middle == [zh_vocab[c] for c in "一张猫的图片"]


def test_wordpiece_matches_transformers(zh_vocab, tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab_path = tmp_path / "vocab.txt"
    with open(vocab_path, "w", encoding="utf-8") as f:
        for t, _ in sorted(zh_vocab.items(), key=lambda kv: kv[1]):
            f.write(t + "\n")
    hf = transformers.BertTokenizer(str(vocab_path))
    ours = BertWordPieceTokenizer(zh_vocab, max_length=32)
    # the reference's literal Taiyi prompts f"一张{cls}的图片"
    # (/root/reference/code/union_clip_llava2.py:127-152 CN classes,
    # CLIP-Chinese/lab_chinese.py pairs): T恤 crosses the Latin/CJK
    # boundary, 羽毛球拍 hits an out-of-vocab char ([UNK] path)
    ref_prompts = [f"一张{cls}的图片"
                   for cls in ("T恤", "吉他", "羽毛球拍", "包子", "荔枝",
                               "狗", "猫", "瓷器", "水墨画", "油画")]
    for text in ["一张猫的图片", "photograph", "a photo", "狗猫",
                 "unknownword 猫",
                 # accent stripping (HF lowercases + NFD-drops Mn),
                 # control-char cleanup, tab/newline whitespace, and the
                 # 100-char wordpiece cap — all review-flagged gaps
                 "phötó", "a\tphoto\nof \x00猫", "PHOTO",
                 "w" * 150 + " 猫"] + ref_prompts:
        theirs = hf(text)["input_ids"]
        ids, mask = ours(text)
        n = mask[0].sum()
        assert [int(t) for t in ids[0, :n]] == theirs, text
