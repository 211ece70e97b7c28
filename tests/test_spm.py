"""Tests for the self-contained SentencePiece reader/encoder
(tts_tpu/frontend/spm.py).

No sentencepiece library exists in this environment, so the tests build
ModelProto binaries by hand (protobuf wire format is stable and documented)
and check the two encoders against hand-computed segmentations. When the
real library is available these same binaries load in it unchanged — the
builder mirrors sentencepiece_model.proto field numbers exactly.
"""
from __future__ import annotations

import struct

import pytest

from tts_tpu.frontend.spm import SentencePieceModel

# ------------------------------------------------------------ proto builder


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _str_field(field: int, s: str) -> bytes:
    raw = s.encode("utf-8")
    return _tag(field, 2) + _varint(len(raw)) + raw


def _float_field(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _varint_field(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _piece(piece: str, score: float, typ: int = 1) -> bytes:
    body = _str_field(1, piece) + _float_field(2, score)
    if typ != 1:
        body += _varint_field(3, typ)
    return _tag(1, 2) + _varint(len(body)) + body


def build_model(pieces: list[tuple[str, float, int]],
                model_type: int = 2,
                unk_id: int = 0,
                normalizer: str = "identity",
                add_dummy_prefix: bool = True,
                byte_fallback: bool = False) -> bytes:
    data = b"".join(_piece(p, s, t) for p, s, t in pieces)
    trainer = (_varint_field(3, model_type) + _varint_field(40, unk_id)
               + (_varint_field(35, 1) if byte_fallback else b""))
    data += _tag(2, 2) + _varint(len(trainer)) + trainer
    norm = (_str_field(1, normalizer)
            + _varint_field(3, 1 if add_dummy_prefix else 0))
    data += _tag(3, 2) + _varint(len(norm)) + norm
    return data


UNK = ("<unk>", 0.0, 2)
BOS = ("<s>", 0.0, 3)
EOS = ("</s>", 0.0, 3)
WS = "▁"

# ------------------------------------------------------------------- loading


def test_load_vocab_roundtrip():
    m = SentencePieceModel.from_bytes(build_model(
        [UNK, BOS, EOS, (WS + "HELLO", -1.0, 1), ("LO", -2.0, 1)]))
    assert len(m) == 5
    assert m.piece_to_id(WS + "HELLO") == 3
    assert m.id_to_piece(4) == "LO"
    assert m.unk_id == 0
    assert m.piece_to_id("missing") == 0
    assert m.model_type == 2


def test_unk_id_from_piece_type_when_field_absent():
    # no trainer_spec at all -> unk found by piece type
    data = b"".join(_piece(p, s, t)
                    for p, s, t in [BOS, UNK, (WS, -1.0, 1)])
    m = SentencePieceModel.from_bytes(data)
    assert m.unk_id == 1


def test_unknown_fields_skipped():
    # append an unknown length-delimited field (200) and varint field (201)
    data = build_model([UNK, (WS + "A", -1.0, 1)])
    data += _tag(200, 2) + _varint(3) + b"xyz" + _tag(201, 0) + _varint(7)
    m = SentencePieceModel.from_bytes(data)
    assert m.piece_to_id(WS + "A") == 1


# ----------------------------------------------------------------------- BPE


def _bpe(pieces, text, **kw):
    m = SentencePieceModel.from_bytes(build_model(pieces, model_type=2, **kw))
    return m.encode_as_pieces(text), m


def test_bpe_merge_order_by_score():
    # "abc": bc (score -0.5) merges before ab (-1.0); abc completes
    pieces = [UNK, (WS, -10.0, 1), ("a", -5.0, 1), ("b", -5.0, 1),
              ("c", -5.0, 1), ("ab", -1.0, 1), ("bc", -0.5, 1),
              ("abc", -2.0, 1)]
    segs, m = _bpe(pieces, "abc", add_dummy_prefix=False)
    assert segs == ["abc"]
    # merge trace matters when the final merge is impossible: drop "abc"
    pieces2 = [p for p in pieces if p[0] != "abc"]
    segs2, _ = _bpe(pieces2, "abc", add_dummy_prefix=False)
    assert segs2 == ["a", "bc"]  # bc won the first merge; a+bc not in vocab


def test_bpe_leftmost_tie_break():
    # two disjoint merges with equal score: leftmost applies first; with
    # "aa" -> "aaaa" chain this decides the result for odd runs
    pieces = [UNK, ("a", -5.0, 1), ("aa", -1.0, 1)]
    segs, _ = _bpe(pieces, "aaaaa", add_dummy_prefix=False)
    assert segs == ["aa", "aa", "a"]


def test_bpe_dummy_prefix_and_whitespace_escape():
    pieces = [UNK, (WS, -3.0, 1), ("HE", -2.0, 1), (WS + "HE", -1.0, 1),
              ("L", -4.0, 1)]
    m = SentencePieceModel.from_bytes(build_model(pieces, model_type=2))
    assert m.encode_as_pieces("HEL") == [WS + "HE", "L"]
    # ids: unknown surface maps to unk_id
    assert m.encode("HELZ") == [3, 4, 0]


def test_bpe_unknown_byte_fallback():
    pieces = [UNK, (WS, -3.0, 1), ("A", -1.0, 1)] + [
        (f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
    m = SentencePieceModel.from_bytes(build_model(
        pieces, model_type=2, byte_fallback=True, add_dummy_prefix=False))
    # "é" = 0xC3 0xA9 in UTF-8
    ids = m.encode("Aé")
    assert ids[0] == 2
    assert [m.id_to_piece(i) for i in ids[1:]] == ["<0xC3>", "<0xA9>"]
    assert m.decode(ids) == "Aé"


# ------------------------------------------------------------------- unigram


def test_unigram_viterbi_prefers_total_score():
    # "ab": pieces a(-1)+b(-1) total -2 beats ab(-2.5); flip scores to check
    pieces = [UNK, ("a", -1.0, 1), ("b", -1.0, 1), ("ab", -2.5, 1)]
    m = SentencePieceModel.from_bytes(build_model(
        pieces, model_type=1, add_dummy_prefix=False))
    assert m.encode_as_pieces("ab") == ["a", "b"]
    pieces = [UNK, ("a", -2.0, 1), ("b", -2.0, 1), ("ab", -2.5, 1)]
    m = SentencePieceModel.from_bytes(build_model(
        pieces, model_type=1, add_dummy_prefix=False))
    assert m.encode_as_pieces("ab") == ["ab"]


def test_unigram_consecutive_unknowns_merge():
    pieces = [UNK, ("x", -1.0, 1)]
    m = SentencePieceModel.from_bytes(build_model(
        pieces, model_type=1, add_dummy_prefix=False))
    # "x??x" -> x, ?? (one unk), x
    ids = m.encode("x✓✗x")
    assert ids == [1, 0, 1]
    assert m.encode_as_pieces("x✓✗x") == ["x", "✓✗", "x"]


def test_unigram_no_unk_edge_where_single_char_piece_exists():
    # even with a terrible score, the in-vocab single char is used (matching
    # unigram_model.cc: the unk node exists only without a single-char match)
    pieces = [UNK, ("x", -100.0, 1), ("y", -1.0, 1)]
    m = SentencePieceModel.from_bytes(build_model(
        pieces, model_type=1, add_dummy_prefix=False))
    assert m.encode("xy") == [1, 2]


# -------------------------------------------------------------- normalization


def test_nfkc_normalizer_folds_spaces_and_controls():
    pieces = [UNK, (WS, -3.0, 1), ("A", -1.0, 1), ("B", -1.0, 1)]
    m = SentencePieceModel.from_bytes(build_model(
        pieces, model_type=2, normalizer="nmt_nfkc"))
    # U+00A0 nbsp folds to space; \n folds to space; runs collapse
    assert (m.encode_as_pieces("A \nB")
            == [WS, "A", WS, "B"])


def test_decode_strips_dummy_prefix_and_unescapes():
    # trained BPE vocabs contain every intermediate merge product; include
    # the chain chars -> ▁H -> ▁HI and ▁Y -> ▁YO -> ▁YOU
    chars = [(c, -10.0, 1) for c in WS + "HIYOU"]
    merges = [(WS + "H", -3.0, 1), (WS + "HI", -1.0, 1),
              (WS + "Y", -3.0, 1), (WS + "YO", -2.0, 1),
              (WS + "YOU", -1.0, 1)]
    m = SentencePieceModel.from_bytes(
        build_model([UNK] + chars + merges, model_type=2))
    ids = m.encode("HI YOU")
    assert [m.id_to_piece(i) for i in ids] == [WS + "HI", WS + "YOU"]
    assert m.decode(ids) == "HI YOU"


# ------------------------------------------------- IndexTTS tokenizer wiring


def test_indextts_tokenizer_uses_spm_reader(tmp_path):
    from tts_tpu.frontend.indextts_text import IndexTTSTokenizer

    # a vocab covering the CJK-uppercased surface of "hello world!" with
    # full merge chains (as a trained BPE vocab would have)
    chars = [(c, -10.0, 1) for c in WS + "HELOWRD!"]
    merges = [("HE", -4.0, 1), ("HEL", -3.0, 1), ("HELL", -2.5, 1),
              ("HELLO", -2.0, 1), (WS + "HELLO", -1.0, 1),
              ("WO", -4.0, 1), ("WOR", -3.0, 1), ("WORL", -2.5, 1),
              ("WORLD", -2.0, 1), (WS + "WORLD", -1.0, 1)]
    pieces = [UNK, BOS, EOS] + chars + merges
    path = tmp_path / "bpe.model"
    path.write_bytes(build_model(pieces, model_type=2))
    tok = IndexTTSTokenizer(bpe_model_path=str(path))
    assert tok.sp is not None           # loaded without sentencepiece
    toks = tok.tokenize("hello world!")
    assert toks == [WS + "HELLO", WS + "WORLD", "!"]
    ids = tok.encode("hello world!")
    want = [tok.sp.piece_to_id(WS + "HELLO"),
            tok.sp.piece_to_id(WS + "WORLD"), tok.sp.piece_to_id("!")]
    assert ids.tolist() == [want]


def test_indextts_tokenizer_missing_model_still_raises(tmp_path):
    from tts_tpu.frontend.indextts_text import IndexTTSTokenizer

    with pytest.raises(Exception):
        IndexTTSTokenizer(bpe_model_path=str(tmp_path / "nope.model"))


def test_invalid_model_bytes_raise(tmp_path):
    with pytest.raises(ValueError, match="ModelProto"):
        SentencePieceModel.from_bytes(b"")          # no pieces
    with pytest.raises(ValueError, match="ModelProto"):
        SentencePieceModel.from_bytes(b"\xff\xff\xff\xff\x0f garbage")


def test_text_cannot_inject_control_tokens():
    """A surface spelling a CONTROL piece ('</s>') must resolve to unk,
    never to the control id — otherwise user text injects EOS and stops
    downstream AR decode early."""
    pieces = [UNK, ("<s>", 0.0, 3), ("</s>", 0.0, 3), ("a", -1.0, 1),
              ("b", -1.0, 1)]
    for mt in (1, 2):   # unigram and BPE
        m = SentencePieceModel.from_bytes(build_model(
            pieces, model_type=mt, add_dummy_prefix=False))
        ids = m.encode("a</s>b")
        assert 2 not in ids and 1 not in ids
        assert ids[0] == 3 and ids[-1] == 4
        assert m.unk_id in ids
