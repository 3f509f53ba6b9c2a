"""SentencePiece reader + SP-BPE tokenizer on a hand-built model."""

import pytest

from mmrs_tpu.models.sentencepiece import (
    SPACE,
    Piece,
    SentencePieceBPE,
    parse_model,
    serialize_model,
)


def _tiny_model():
    pieces = [
        Piece("<unk>", 0.0, 2),
        Piece("<s>", 0.0, 3),
        Piece("</s>", 0.0, 3),
    ]
    # byte pieces for fallback
    for b in range(256):
        pieces.append(Piece(f"<0x{b:02X}>", -100.0, 6))
    # characters
    for ch in ["a", "c", "t", "o", SPACE]:
        pieces.append(Piece(ch, -10.0, 1))
    # merges with scores (higher = merged earlier)
    pieces.append(Piece("ca", -1.0, 1))
    pieces.append(Piece("cat", -0.5, 1))
    pieces.append(Piece(SPACE + "cat", -0.2, 1))
    pieces.append(Piece(SPACE + "a", -1.5, 1))
    return pieces


@pytest.fixture()
def tok(tmp_path):
    blob = serialize_model(_tiny_model())
    p = tmp_path / "tok.model"
    p.write_bytes(blob)
    return SentencePieceBPE.from_file(str(p))


def test_roundtrip_serialization():
    pieces = _tiny_model()
    back = parse_model(serialize_model(pieces))
    assert len(back) == len(pieces)
    assert back[0].text == "<unk>" and back[0].type == 2
    assert back[-1].text == SPACE + "a"
    assert back[-1].score == pytest.approx(-1.5)


def test_encode_merges_to_best_pieces(tok):
    ids = tok.encode("cat", add_bos=False)
    # "▁cat" exists with the best score -> single piece
    assert ids == [tok.vocab[SPACE + "cat"]]

    ids2 = tok.encode("a cat", add_bos=False)
    assert ids2 == [tok.vocab[SPACE + "a"], tok.vocab[SPACE + "cat"]]


def test_bos_and_decode(tok):
    ids = tok.encode("a cat")
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == "a cat"


def test_byte_fallback_unknown_chars(tok):
    ids = tok.encode("caté", add_bos=False)
    text = tok.decode(ids)
    assert text == "caté"   # é came back through byte pieces
    # the unknown char used byte pieces, not <unk>
    assert tok.unk_id not in ids


def test_verifier_protocol(tok):
    # matches the TPULLaVAVerifier tokenizer protocol
    assert isinstance(tok.encode("hi cat"), list)
    assert isinstance(tok.decode(tok.encode("hi cat")), str)
