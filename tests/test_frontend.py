"""Text frontends: pinyin/jieba conversion, CJK tokenization, number
normalization, duration heuristic — golden token/behavior tests (the
host-side pieces the reference pins by example runs)."""
import numpy as np
import pytest

from tts_tpu.frontend.f5_text import convert_char_to_pinyin, f5_duration, text_to_ids
from tts_tpu.frontend.indextts_text import (
    IndexTTSTokenizer,
    normalize_text,
    split_sentences,
    tokenize_by_cjk_char,
)
from tts_tpu.frontend.normalize import normalize_numbers


def test_pinyin_ascii_segmentation():
    """ASCII path matches the reference policy (word-boundary spaces,
    chars split) regardless of pypinyin availability."""
    chars = convert_char_to_pinyin(["Hello world"])[0]
    assert chars[0] == "H"
    assert " " in chars
    assert "".join(chars) == "Hello world"


def test_text_to_ids_unknown_is_zero():
    vocab = {"a": 5, "b": 7}
    ids = text_to_ids(["a", "x", "b"], vocab)
    np.testing.assert_array_equal(ids, [[5, 0, 7]])


def test_f5_duration_heuristic():
    """Reference formula (F5-TTS-ONNX-Inference.py:227-231): byte lengths
    with 3x weight on zh pause punctuation."""
    ref_len, dur = f5_duration(24000 * 4, "abcd", "abcdabcd", hop=256)
    assert ref_len == 24000 * 4 // 256 + 1
    assert dur == ref_len + int(ref_len / 4 * 8)
    # pause punctuation adds 3 per char to the byte count
    _, dur_p = f5_duration(24000 * 4, "abcd", "abcd。", hop=256)
    assert dur_p == ref_len + int(ref_len / 4 * (4 + 3 + 3))


def test_cjk_tokenize_roundtrip():
    out = tokenize_by_cjk_char("你好世界是 hello world 的中文")
    assert out == "你 好 世 界 是 HELLO WORLD 的 中 文"


def test_normalize_numbers_golden():
    cases = {
        "I have 3 cats": "I have three cats",
        "born in 1984": "born in nineteen eighty four",
        "the 3rd of 12": "the third of twelve",
        "50% off $12.50": "fifty percent off twelve dollars fifty cents",
        "pi is 3.14": "pi is three point one four",
    }
    for inp, expect in cases.items():
        assert normalize_numbers(inp) == expect


def test_indextts_normalize_applies_numbers_and_punct():
    assert normalize_text("It costs $5!") == "It costs five dollars!"
    assert normalize_text("你好，世界！") == "你好,世界!"


def test_sentence_split_bounds():
    tok = IndexTTSTokenizer()
    toks = tok.tokenize("one. two. three three three three!")
    sents = split_sentences(toks, max_tokens=12)
    assert all(len(s) <= 12 for s in sents)
    assert sum(len(s) for s in sents) == len(toks)
