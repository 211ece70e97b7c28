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
    with pytest.warns(RuntimeWarning):
        tok = IndexTTSTokenizer(allow_degraded=True)
    toks = tok.tokenize("one. two. three three three three!")
    sents = split_sentences(toks, max_tokens=12)
    assert all(len(s) <= 12 for s in sents)
    assert sum(len(s) for s in sents) == len(toks)


def test_voxcpm_clean_markdown_and_normalize():
    from tts_tpu.frontend.voxcpm_text import (clean_markdown,
                                              normalize_voxcpm_text,
                                              replace_blank)

    md = "# Title\n[link](http://x) and `code` \n- item\n```\nblock\n```"
    out = clean_markdown(md)
    assert "```" not in out and "#" not in out and "(http" not in out
    assert "link" in out and "item" in out

    # English: number expansion + markdown stripped
    assert normalize_voxcpm_text("**5** cats") == "**five** cats" or \
        "five cats" in normalize_voxcpm_text("5 cats")
    # Chinese: value-reading numerals, CJK spacing dropped
    zh = normalize_voxcpm_text("你好 世界 123")
    assert "一百二十三" in zh and "你好" in zh
    # space survives only between two ascii word chars (reference
    # text_normalize.py:112-120)
    assert replace_blank("你 好 ab cd") == "你好ab cd"


def test_voxcpm_char_tokenizer_wrapper():
    from tts_tpu.frontend.voxcpm_text import CharTokenizerWrapper

    class FakeTok:
        vocab = {"你好": 7, "你": 1, "好": 2, "▁hi": 3}

        def tokenize(self, text):
            # pretend the BPE merges 你好 into one token
            out = []
            if "你好" in text:
                out.append("你好")
                text = text.replace("你好", "")
            if "hi" in text:
                out.append("▁hi")
            return out

        def convert_tokens_to_ids(self, toks):
            return [self.vocab.get(t, 0) for t in toks]

    w = CharTokenizerWrapper(FakeTok())
    assert w.tokenize("你好 hi") == ["你", "好", "▁hi"]
    assert w("你好 hi") == [1, 2, 3]


def test_indextts_pinyin_and_name_protection():
    from tts_tpu.frontend.indextts_text import normalize_text

    # pinyin tones survive normalization; jqx + u/ü finals -> v and
    # uppercased (reference correct_pinyin :722-733: xuan4 -> XVAN4)
    out = normalize_text("这个字念 xuan4 和 ju2 还有 hao3")
    assert "XVAN4" in out and "JV2" in out and "HAO3" in out

    # interpunct names survive normalization as a unit (the char map then
    # rewrites the interpunct, as the reference does post-restore :710);
    # digits nearby still expand
    out = normalize_text("克里斯托弗·诺兰拍了3部电影")
    assert "克里斯托弗-诺兰" in out and "三" in out

    # english contraction expansion (reference :655)
    assert "it is" in normalize_text("it's fine").lower()


def test_indextts_pinyin_substring_safe():
    """Per-match substitution: a syllable containing a shorter protected
    syllable as a substring (an1 in pan1) must survive intact."""
    from tts_tpu.frontend.indextts_text import normalize_text

    out = normalize_text("请读 an1 然后读 pan1")
    assert "AN1" in out and "PAN1" in out and "pAN1" not in out


# ----------------------------------------------------- degradation policy

def _has_pypinyin() -> bool:
    try:
        import pypinyin  # noqa: F401
        return True
    except ImportError:
        return False


def test_f5_chinese_raises_without_pypinyin():
    """Strict by default: Chinese text without pypinyin must NOT silently
    produce wrong token ids (VERDICT r1 item 7)."""
    if _has_pypinyin():
        pytest.skip("pypinyin installed — degraded path unreachable")
    with pytest.raises(RuntimeError, match="pypinyin"):
        convert_char_to_pinyin(["你好"])


def test_f5_chinese_degraded_optin_warns():
    if _has_pypinyin():
        pytest.skip("pypinyin installed — degraded path unreachable")
    import tts_tpu.frontend.f5_text as m

    m._warned_pinyin_fallback = False
    with pytest.warns(RuntimeWarning, match="pypinyin"):
        chars = convert_char_to_pinyin(["你好"], allow_degraded=True)[0]
    assert chars == [" ", "你", " ", "好"]


@pytest.mark.skipif(not _has_pypinyin(), reason="pypinyin not installed")
def test_f5_pinyin_golden_token_ids():
    """Golden TONE3 ids — activates automatically once pypinyin exists,
    pinning parity with the upstream frontend (Export_F5.py:229-265)."""
    chars = convert_char_to_pinyin(["你好。"])[0]
    assert chars == [" ", "ni3", " ", "hao3", "。"]
    chars = convert_char_to_pinyin(["我是一名学生"])[0]
    assert chars[1::2] == ["wo3", "shi4", "yi4", "ming2", "xue2", "sheng5"]


def test_indextts_tokenizer_raises_without_model():
    with pytest.raises(RuntimeError, match="char-level fallback"):
        IndexTTSTokenizer()


def test_indextts_tokenizer_invalid_model_raises(tmp_path):
    """Without the sentencepiece wheel the self-contained reader
    (frontend/spm.py) handles real .model files; an unparseable one must
    still fail loudly rather than silently degrade."""
    try:
        import sentencepiece  # noqa: F401
        pytest.skip("sentencepiece installed — reader path unreachable")
    except ImportError:
        pass
    fake = tmp_path / "bpe.model"
    fake.write_bytes(b"")
    with pytest.raises(ValueError, match="ModelProto"):
        IndexTTSTokenizer(str(fake))


def test_indextts_explicit_vocab_is_not_degraded():
    """A caller-supplied vocab is intentional — no raise, no warning."""
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")
        tok = IndexTTSTokenizer(vocab={"A": 3, "▁": 4})
    ids = tok.convert_tokens_to_ids(["A", "▁", "zz"])
    assert ids == [3, 4, 1]


def test_f5_duration_pause_policy_deviation():
    """Explicit policy: the reference's re.findall("。，、；：？！") matches
    only the full 7-char literal (never, in practice); we deliberately use
    a character class so each pause mark weighs 3 bytes (upstream F5's
    intent). This test pins both facts."""
    import re

    # the reference's literal pattern never fires on normal text
    assert re.findall("。，、；：？！", "你好。世界，再见！") == []
    # ours weighs each mark: without punctuation the formulas agree
    ref_len, d_plain = f5_duration(24000, "abcd", "abcd")
    _, d_punct = f5_duration(24000, "abcd", "abcd。，")
    assert d_punct > d_plain
    # byte parity when no pause punctuation present (reference-identical)
    assert d_plain == ref_len + int(ref_len / 4 * 4)
