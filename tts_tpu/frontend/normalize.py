"""Text normalization: number/ordinal/percent/year expansion.

The reference delegates this to tn/WeTextProcessing/inflect
(IndexTTS/Export_IndexTTS.py:589-806, VoxCPM modeling_modified/
text_normalize.py:11-184) — none of which exist in this environment. This
is a self-contained English (+ basic Chinese digit) normalizer covering the
cases TTS text actually hits: cardinals, ordinals, decimals, percents,
years, currency, and digit strings.
"""
from __future__ import annotations

import re

__all__ = ["normalize_numbers", "normalize_text"]

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALE = [(10 ** 9, "billion"), (10 ** 6, "million"), (1000, "thousand"),
          (100, "hundred")]
_ORD_SPECIAL = {"one": "first", "two": "second", "three": "third",
                "five": "fifth", "eight": "eighth", "nine": "ninth",
                "twelve": "twelfth"}
_ZH_DIGITS = "零一二三四五六七八九"


def _int_to_words(n: int) -> str:
    if n < 0:
        return "minus " + _int_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] + ("" if r == 0 else " " + _ONES[r])
    for value, name in _SCALE:
        if n >= value:
            head, rest = divmod(n, value)
            out = _int_to_words(head) + " " + name
            if rest:
                out += " " + _int_to_words(rest)
            return out
    return str(n)


def _ordinal_words(n: int) -> str:
    words = _int_to_words(n)
    head, _, last = words.rpartition(" ")
    if last in _ORD_SPECIAL:
        last = _ORD_SPECIAL[last]
    elif last.endswith("y"):
        last = last[:-1] + "ieth"
    else:
        last = last + "th"
    return (head + " " + last).strip()


def _year_words(n: int) -> str:
    """1984 -> nineteen eighty four; 2005 -> two thousand five."""
    if 1000 <= n <= 1999 or 2100 <= n <= 9999:
        hi, lo = divmod(n, 100)
        if lo == 0:
            return _int_to_words(hi) + " hundred"
        lo_w = _int_to_words(lo) if lo >= 10 else "oh " + _ONES[lo]
        return _int_to_words(hi) + " " + lo_w
    return _int_to_words(n)


def _num_token_to_words(tok: str) -> str:
    if "." in tok:
        whole, frac = tok.split(".", 1)
        frac_words = " ".join(_ONES[int(c)] for c in frac if c.isdigit())
        whole_w = _int_to_words(int(whole)) if whole else "zero"
        return f"{whole_w} point {frac_words}"
    return _int_to_words(int(tok))


def normalize_numbers(text: str) -> str:
    """Expand numeric patterns to words (English)."""
    # currency: $12.50 -> twelve dollars fifty cents
    def currency(m):
        whole = int(m.group(1).replace(",", ""))
        out = _int_to_words(whole) + (" dollar" if whole == 1 else " dollars")
        if m.group(2):
            cents = int(m.group(2))
            out += " " + _int_to_words(cents) + (
                " cent" if cents == 1 else " cents")
        return out

    text = re.sub(r"\$([\d,]+)(?:\.(\d{2}))?", currency, text)
    # percents
    text = re.sub(r"(\d+(?:\.\d+)?)%",
                  lambda m: _num_token_to_words(m.group(1)) + " percent",
                  text)
    # ordinals: 3rd, 21st
    text = re.sub(r"\b(\d+)(?:st|nd|rd|th)\b",
                  lambda m: _ordinal_words(int(m.group(1))), text)
    # years: standalone 4-digit 1100-2099
    text = re.sub(r"\b(1[1-9]\d{2}|20\d{2})\b",
                  lambda m: _year_words(int(m.group(1))), text)
    # thousands separators then plain numbers
    text = re.sub(r"\b\d{1,3}(?:,\d{3})+\b",
                  lambda m: _int_to_words(int(m.group(0).replace(",", ""))),
                  text)
    text = re.sub(r"\d+(?:\.\d+)?",
                  lambda m: _num_token_to_words(m.group(0)), text)
    return text


def _zh_number(m) -> str:
    return "".join(_ZH_DIGITS[int(c)] for c in m.group(0))


def normalize_text(text: str, language: str = "en") -> str:
    """Full normalization entry point: number expansion + whitespace
    cleanup. language='zh' reads digits digit-by-digit in Chinese."""
    if language == "zh":
        text = re.sub(r"\d+", _zh_number, text)
    else:
        text = normalize_numbers(text)
    return re.sub(r"\s+", " ", text).strip()
