"""Self-contained tokenizer.json reader: golden ids, wheel
cross-validation, and the no-`regex` fallback scanner.

The reference needs HF AutoTokenizer for Kani/Qwen ids
(Kani_TTS/Export_Kani_TTS.py:982-983, Qwen_TTS/Export_Qwen_TTS_ONNX.py
:636-638); `frontend/hf_tokenizer.py` must produce the same ids from the
raw tokenizer.json with no wheels. Fixtures are real `tokenizers`-built
files covering the three config families the six models use: Qwen2-style
(Split regex + ByteLevel), GPT-2-style (ByteLevel use_regex), and
Llama-style (Prepend/Replace normalizer + byte_fallback BPE + template
post-processor).
"""
import builtins
import json
import os

import numpy as np
import pytest

from tts_tpu.frontend.hf_tokenizer import (
    _KNOWN_SCANNERS,
    HFTokenizer,
    _scan_gpt2_family,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
BATTERY = [
    "Hello world!",
    "jenny: speak this sentence aloud, please.",
    "What's here? I'll do it. We've DONE 42% of #3 items...",
    "  leading and trailing  ",
    "newlines\nand\r\n  spaces   matter",
    "你好世界，这是一个测试。",
    "mixed 中文 and english 123",
    "<|im_start|>assistant\nhello<|im_end|>",
    "numbers 1234567890 split",
    "tabs\tand\ttabs",
    "",
    "a",
    " ",
    "don't",
    "e.g. i.e.  etc.",
    "emoji 🙂 test",
]
NAMES = ["qwen2_style", "gpt2_style", "llama_style"]


@pytest.fixture(scope="module")
def golden():
    with open(os.path.join(FIXTURES, "hf_tokenizer_golden.json"),
              encoding="utf-8") as f:
        return json.load(f)


@pytest.mark.parametrize("name", NAMES)
def test_golden_ids(name, golden):
    tok = HFTokenizer.load(os.path.join(FIXTURES, f"{name}.json"))
    for text, want in golden[name].items():
        assert tok.encode(text) == want, f"{name}: {text!r}"


@pytest.mark.parametrize("name", NAMES)
def test_cross_validate_wheel(name):
    tokenizers = pytest.importorskip("tokenizers")
    ref = tokenizers.Tokenizer.from_file(
        os.path.join(FIXTURES, f"{name}.json"))
    mine = HFTokenizer.load(os.path.join(FIXTURES, f"{name}.json"))
    for text in BATTERY:
        assert mine.encode(text) == ref.encode(text).ids, f"{text!r}"


def test_fallback_scanner_matches_regex_wheel():
    regex = pytest.importorskip("regex")
    import random

    random.seed(7)
    alphabet = list("abXZ 09.,!?'\n\r\t你¿ñ🙂½") + ["'s", "'LL", "\r\n"]
    for _ in range(500):
        s = "".join(random.choice(alphabet)
                    for _ in range(random.randint(0, 20)))
        for pattern, kw in _KNOWN_SCANNERS.items():
            assert regex.findall(pattern, s) == _scan_gpt2_family(s, **kw), \
                repr(s)


@pytest.mark.parametrize("name", NAMES)
def test_encode_without_regex_wheel(name, golden, monkeypatch):
    """Hide the `regex` wheel: the known-pattern scanner must give the
    exact same ids."""
    real_import = builtins.__import__

    def no_regex(mod, *a, **kw):
        if mod == "regex":
            raise ImportError("regex hidden for test")
        return real_import(mod, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_regex)
    tok = HFTokenizer.load(os.path.join(FIXTURES, f"{name}.json"))
    for text, want in golden[name].items():
        assert tok.encode(text) == want, f"{name} (no regex): {text!r}"


def test_call_convention_and_decode():
    tok = HFTokenizer.load(os.path.join(FIXTURES, "qwen2_style.json"))
    out = tok("Hello world!", return_tensors="np")
    assert out["input_ids"].shape[0] == 1
    assert out["input_ids"].dtype == np.int64
    ids = out["input_ids"][0].tolist()
    assert tok.decode(ids) == "Hello world!"
    # specials skipped on decode by default
    text = "<|im_start|>hi there<|im_end|>"
    assert tok.decode(tok.encode(text)) == "hi there"


def test_llama_template_and_byte_fallback():
    tok = HFTokenizer.load(os.path.join(FIXTURES, "llama_style.json"))
    bos = tok.encode("hello")[0]
    assert tok.id_to_token[bos] == "<s>"
    # no specials when asked
    assert tok.encode("hello", add_special_tokens=False)[0] != bos
    # a char absent from the vocab must byte-fallback, not unk
    ids = tok.encode("Ωmega", add_special_tokens=False)
    toks = tok.convert_ids_to_tokens(ids)
    assert any(t.startswith("<0x") for t in toks)
    assert tok.decode(ids).lstrip() == "Ωmega"


def test_from_pretrained_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="tokenizer.json"):
        HFTokenizer.from_pretrained(str(tmp_path))
