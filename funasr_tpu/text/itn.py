"""Inverse text normalization (ITN), rule-based.

The reference ships a ~39k-LoC pynini grammar package
(fun_text_processing/inverse_text_normalization) compiled to FSTs consumed
by the C++ runtime's itn-processor.  This module provides the serving-path
capability (the websocket `itn` flag / AutoModel `use_itn`) as readable
rules for the high-frequency classes: cardinal numbers, decimals, percents,
and negative numbers for Chinese and English.  Grammar coverage expands per
language over time; unknown patterns pass through unchanged.
"""

from __future__ import annotations

import re
from typing import List

_ZH_DIGITS = {"零": 0, "一": 1, "二": 2, "两": 2, "三": 3, "四": 4, "五": 5,
              "六": 6, "七": 7, "八": 8, "九": 9}
_ZH_UNITS = {"十": 10, "百": 100, "千": 1000}
_ZH_BIG = {"万": 10**4, "亿": 10**8}
_ZH_NUM_CHARS = "".join(_ZH_DIGITS) + "".join(_ZH_UNITS) + "".join(_ZH_BIG)


def _zh_section_to_int(s: str) -> int:
    """Parse a section below 万: e.g. 三千五百二十一 -> 3521, 十五 -> 15."""
    total, cur = 0, 0
    for ch in s:
        if ch in _ZH_DIGITS:
            cur = _ZH_DIGITS[ch]
        elif ch in _ZH_UNITS:
            total += (cur if cur else 1) * _ZH_UNITS[ch]
            cur = 0
    return total + cur


def _zh_to_int(s: str) -> int:
    """Full cardinal incl. 万/亿 sections."""
    total = 0
    for big_char in ("亿", "万"):
        if big_char in s:
            head, s = s.split(big_char, 1)
            total = (total + _zh_to_int(head)) * _ZH_BIG[big_char]
    return total + _zh_section_to_int(s)


def _zh_digits_seq(s: str) -> str:
    return "".join(str(_ZH_DIGITS[c]) for c in s)


def _zh_number_repl(m: re.Match) -> str:
    s = m.group(0)
    if len(s) == 1 and s in ("零",):
        return s
    # pure digit strings (e.g. phone-like 一三五...) read digit-by-digit
    if all(c in _ZH_DIGITS for c in s) and len(s) >= 4 and "零" not in s[:1]:
        # only if no unit chars; 4+ digits-in-a-row means a digit sequence
        return _zh_digits_seq(s)
    if all(c in _ZH_DIGITS for c in s) and len(s) > 1:
        return _zh_digits_seq(s)
    try:
        return str(_zh_to_int(s))
    except Exception:
        return s


def _itn_zh(text: str) -> str:
    num = f"[{_ZH_NUM_CHARS}]+"
    # percent: 百分之X -> X%
    def pct(m):
        val = _zh_number_repl(re.match(num, m.group(1)))
        return f"{_fmt_zh_value(m.group(1))}%"
    text = re.sub(f"百分之({num}(?:点[{''.join(_ZH_DIGITS)}]+)?)",
                  lambda m: f"{_fmt_zh_value(m.group(1))}%", text)
    # decimal: X点YZ
    text = re.sub(
        f"({num})点([{''.join(_ZH_DIGITS)}]+)",
        lambda m: f"{_zh_to_int(m.group(1))}.{_zh_digits_seq(m.group(2))}",
        text,
    )
    # negative
    text = re.sub(f"负({num})", lambda m: f"-{_zh_to_int(m.group(1))}", text)
    # plain cardinals (3+ chars or containing units, to leave 一个/二人 alone)
    def card(m):
        s = m.group(0)
        if len(s) == 1:
            return s
        return _zh_number_repl(m)
    text = re.sub(num, card, text)
    return text


def _fmt_zh_value(s: str) -> str:
    if "点" in s:
        a, b = s.split("点", 1)
        return f"{_zh_to_int(a)}.{_zh_digits_seq(b)}"
    return str(_zh_to_int(s))


_EN_ONES = {w: i for i, w in enumerate(
    ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
     "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
     "sixteen", "seventeen", "eighteen", "nineteen"])}
_EN_TENS = {"twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
            "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90}
_EN_SCALE = {"hundred": 100, "thousand": 1000, "million": 10**6,
             "billion": 10**9}
_EN_WORDS = set(_EN_ONES) | set(_EN_TENS) | set(_EN_SCALE) | {"and"}


def _en_words_to_int(words: List[str]) -> int:
    total, cur = 0, 0
    for w in words:
        if w == "and":
            continue
        if w in _EN_ONES:
            cur += _EN_ONES[w]
        elif w in _EN_TENS:
            cur += _EN_TENS[w]
        elif w == "hundred":
            cur = max(cur, 1) * 100
        else:  # thousand/million/billion
            total += max(cur, 1) * _EN_SCALE[w]
            cur = 0
    return total + cur


def _itn_en(text: str) -> str:
    tokens = text.split(" ")
    out: List[str] = []
    i = 0
    while i < len(tokens):
        j = i
        span: List[str] = []
        while j < len(tokens) and tokens[j].lower() in _EN_WORDS:
            span.append(tokens[j].lower())
            j += 1
        # trim leading/trailing 'and'
        while span and span[0] == "and":
            span.pop(0); i += 1
        while span and span[-1] == "and":
            span.pop(); j -= 1
        meaningful = [w for w in span if w != "and"]
        if len(meaningful) >= 2 or (len(meaningful) == 1
                                    and meaningful[0] in _EN_TENS):
            val = _en_words_to_int(span)
            suffix = ""
            if j < len(tokens) and tokens[j].lower() == "percent":
                suffix = "%"
                j += 1
            out.append(str(val) + suffix)
            i = j
        else:
            out.append(tokens[i])
            i += 1
    return " ".join(out)


def inverse_normalize(text: str, lang: str = "zh") -> str:
    """Spoken-form -> written-form for numbers/decimals/percents."""
    if lang.startswith("zh"):
        return _itn_zh(text)
    if lang.startswith("en"):
        return _itn_en(text)
    return text
