"""F5-TTS text frontend: jieba segmentation + pinyin conversion + char ids.

Behavioral contract from the reference
(/root/reference/F5_TTS/Export_F5.py:229-277 convert_char_to_pinyin /
list_str_to_idx, F5-TTS-ONNX-Inference.py:227-231 duration heuristic). Host
Python — runs before the jitted pipeline, pinned by golden token-id tests.

pypinyin is optional in this environment. When it is absent, Chinese text
CANNOT be converted to the TONE3 pinyin tokens the F5 vocab expects, so the
degraded raw-char path is opt-in (`allow_degraded=True`) and warns; the
default raises so real checkpoints never silently get wrong token ids.
"""
from __future__ import annotations

import re
import warnings

import numpy as np

__all__ = ["convert_char_to_pinyin", "text_to_ids", "f5_duration"]

_CUSTOM_TRANS = str.maketrans({";": ",", "“": '"', "”": '"', "‘": "'", "’": "'"})
# character class: each pause mark adds 3 to the byte-length estimate.
#
# DELIBERATE PARITY DEVIATION (tested in test_frontend.py): the reference
# passes the bare 7-char string "。，、；：？！" to re.findall
# (F5-TTS-ONNX-Inference.py:227-231), which matches only the literal
# 7-character sequence — i.e. effectively never — so its pause weighting is
# dead code. Upstream F5's own heuristic uses a character class; we follow
# the intent: each individual pause mark weighs 3 bytes. For text without
# pause punctuation the two formulas agree exactly; with it, our
# max_duration is larger (more natural pacing for Chinese text).
_ZH_PAUSE_PUNC = r"[。，、；：？！]"


def _is_chinese(c: str) -> bool:
    return "㄀" <= c <= "鿿"


_warned_pinyin_fallback = False


def _lazy_pinyin(seg: str, allow_degraded: bool = False) -> list[str]:
    try:
        from pypinyin import Style, lazy_pinyin

        return lazy_pinyin(seg, style=Style.TONE3, tone_sandhi=True)
    except ImportError:
        if not allow_degraded:
            raise RuntimeError(
                "pypinyin is not installed: Chinese text cannot be converted"
                " to the TONE3 pinyin tokens the F5 vocab expects (reference"
                " Export_F5.py:249), so token ids would silently differ."
                " Install pypinyin, or pass allow_degraded=True to fall back"
                " to raw characters (audible quality loss on zh text)."
            ) from None
        global _warned_pinyin_fallback
        if not _warned_pinyin_fallback:
            warnings.warn(
                "pypinyin unavailable — degrading Chinese text to raw chars;"
                " F5 token ids will NOT match the upstream frontend",
                RuntimeWarning, stacklevel=3)
            _warned_pinyin_fallback = True
        return list(seg)


def convert_char_to_pinyin(text_list: list[str], polyphone: bool = True,
                           allow_degraded: bool = False) -> list[list[str]]:
    """Same segmentation policy as the reference (Export_F5.py:229-265):
    jieba-cut, pure-ASCII segments char-split with word-boundary spaces,
    pure-CJK segments converted to TONE3 pinyin with a space before each
    Chinese char, mixed segments handled per char."""
    import jieba

    if not jieba.dt.initialized:
        jieba.default_logger.setLevel(50)
        jieba.initialize()

    final = []
    for text in text_list:
        chars: list[str] = []
        text = text.translate(_CUSTOM_TRANS)
        for seg in jieba.cut(text):
            seg_bytes = len(seg.encode("utf-8"))
            if seg_bytes == len(seg):                  # pure ascii/symbols
                if chars and seg_bytes > 1 and chars[-1] not in " :'\"":
                    chars.append(" ")
                chars.extend(seg)
            elif polyphone and seg_bytes == 3 * len(seg):   # pure CJK
                seg_py = _lazy_pinyin(seg, allow_degraded)
                for i, c in enumerate(seg):
                    if _is_chinese(c):
                        chars.append(" ")
                    chars.append(seg_py[i])
            else:                                      # mixed
                for c in seg:
                    if ord(c) < 256:
                        chars.extend(c)
                    elif _is_chinese(c):
                        chars.append(" ")
                        chars.extend(_lazy_pinyin(c, allow_degraded))
                    else:
                        chars.append(c)
        final.append(chars)
    return final


def text_to_ids(chars: list[str], vocab: dict[str, int]) -> np.ndarray:
    """char list -> (1, T) int32 ids; unknown chars -> 0
    (Export_F5.py:269-277)."""
    return np.array([[vocab.get(c, 0) for c in chars]], dtype=np.int32)


def f5_duration(ref_audio_samples: int, ref_text: str, gen_text: str,
                hop: int = 256, speed: float = 1.0) -> tuple[int, int]:
    """(ref_signal_len, max_duration) — the reference's byte-length duration
    heuristic with pause-punctuation weighting
    (F5-TTS-ONNX-Inference.py:227-231)."""
    ref_len = len(ref_text.encode("utf-8")) + 3 * len(re.findall(_ZH_PAUSE_PUNC, ref_text))
    gen_len = len(gen_text.encode("utf-8")) + 3 * len(re.findall(_ZH_PAUSE_PUNC, gen_text))
    ref_signal_len = ref_audio_samples // hop + 1
    max_duration = ref_signal_len + int(ref_signal_len / max(ref_len, 1) * gen_len / speed)
    return ref_signal_len, max_duration
