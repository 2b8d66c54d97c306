"""Forward-TN semiotic classes beyond numbers: date, time, fraction,
telephone, electronic, range/roman/serial/abbreviation.

Matches the reference's tagger sets class-for-class
(fun_text_processing/text_normalization/<lang>/taggers/):

- en: date, fraction, electronic, telephone, range, roman, serial,
  abbreviation (+ time);
- de, es: date, fraction, electronic, telephone, time;
- ru: date, electronic, telephone, time (the reference ru dir carries no
  fraction tagger).

Like the ITN package, these are readable rule passes rather than pynini
FSTs; per-language word tables mirror the reference's data/ tsv tables
(e.g. de electronic/symbols.tsv ".  punkt").  Each ``apply_*`` runs
BEFORE the generic cardinal/decimal passes in tn.py so digit spans keep
their class readings.
"""

from __future__ import annotations

import re
from typing import List

# --------------------------------------------------------------- tables

_EN_MONTHS = ["january", "february", "march", "april", "may", "june",
              "july", "august", "september", "october", "november",
              "december"]
_DE_MONTHS = ["januar", "februar", "märz", "april", "mai", "juni",
              "juli", "august", "september", "oktober", "november",
              "dezember"]
_ES_MONTHS = ["enero", "febrero", "marzo", "abril", "mayo", "junio",
              "julio", "agosto", "septiembre", "octubre", "noviembre",
              "diciembre"]
# genitive month names (reference ru/data/months) — "5 января"
_RU_MONTHS = ["января", "февраля", "марта", "апреля", "мая", "июня",
              "июля", "августа", "сентября", "октября", "ноября",
              "декабря"]

# electronic symbol words (reference data/electronic/symbols.tsv heads)
_E_SYMBOLS = {
    "en": {".": "dot", "-": "dash", "_": "underscore", "@": "at",
           "/": "slash", ":": "colon", "#": "hash", "+": "plus"},
    "de": {".": "punkt", "-": "bindestrich", "_": "unterstrich",
           "@": "at", "/": "slash", ":": "doppelpunkt", "#": "raute",
           "+": "plus"},
    "es": {".": "punto", "-": "guión", "_": "barra baja", "@": "arroba",
           "/": "barra", ":": "dos puntos", "#": "almohadilla",
           "+": "más"},
    "ru": {".": "точка", "-": "тире", "_": "нижнее подчеркивание",
           "@": "собака", "/": "слэш", ":": "двоеточие", "#": "решетка",
           "+": "плюс"},
}


def _num(lang: str):
    from funasr_tpu.text import tn

    return {"en": tn.num_to_en, "de": tn.num_to_de, "es": tn.num_to_es,
            "ru": tn.num_to_ru}[lang]


def _digit_words(lang: str) -> List[str]:
    n = _num(lang)
    return [n(i) for i in range(10)]


def _en_ordinal_words(n: int) -> str:
    from funasr_tpu.text.tn import num_to_en

    irr = {"one": "first", "two": "second", "three": "third",
           "five": "fifth", "eight": "eighth", "nine": "ninth",
           "twelve": "twelfth"}
    words = num_to_en(n).split(" ")
    last = words[-1]
    if last in irr:
        words[-1] = irr[last]
    elif last.endswith("y"):
        words[-1] = last[:-1] + "ieth"
    else:
        words[-1] = last + "th"
    return " ".join(words)


def en_year(n: int) -> str:
    """Reference en date-year graph readings: 1984 -> nineteen eighty
    four, 2012 -> twenty twelve, 2005 -> two thousand five, 1900 ->
    nineteen hundred, 2000 -> two thousand."""
    from funasr_tpu.text.tn import num_to_en

    if n < 1000 or n > 2999:
        return num_to_en(n)
    hi, lo = divmod(n, 100)
    if lo == 0:
        if hi % 10 == 0:  # 2000, 1000
            return num_to_en(n)
        return f"{num_to_en(hi)} hundred"
    if 2000 < n < 2010:
        return f"two thousand {num_to_en(lo)}"
    if lo < 10:
        return f"{num_to_en(hi)} oh {num_to_en(lo)}"
    return f"{num_to_en(hi)} {num_to_en(lo)}"


def de_year(n: int) -> str:
    """German year reading: 1984 -> neunzehnhundertvierundachtzig;
    2000+ read as plain cardinals."""
    from funasr_tpu.text.tn import num_to_de

    if 1100 <= n < 2000:
        hi, lo = divmod(n, 100)
        head = num_to_de(hi) + "hundert"
        return head if lo == 0 else head + num_to_de(lo)
    return num_to_de(n)


# ---------------------------------------------------------- electronic

_EMAIL_RE = re.compile(
    r"\b([A-Za-z0-9._%+-]+)@([A-Za-z0-9.-]+\.[A-Za-z]{2,})\b")
_URL_RE = re.compile(
    r"\b((?:https?://)?www\.[A-Za-z0-9.-]+\.[A-Za-z]{2,}(?:/\S*)?)")


def _spell(s: str, lang: str) -> str:
    """Reference electronic reading: every character spelled — letters
    individually, digits as number words, symbols via the language's
    symbols.tsv words (en example: cdf1@abc.edu -> c d f one at a b c
    dot e d u)."""
    dw = _digit_words(lang)
    sym = _E_SYMBOLS[lang]
    out = []
    for ch in s:
        if ch.isdigit():
            out.append(dw[int(ch)])
        elif ch in sym:
            out.append(sym[ch])
        elif ch.isalpha():
            out.append(ch.lower())
    return " ".join(out)


def apply_electronic(text: str, lang: str) -> str:
    text = _EMAIL_RE.sub(
        lambda m: f"{_spell(m.group(1), lang)} {_E_SYMBOLS[lang]['@']} "
                  f"{_spell(m.group(2), lang)}", text)
    text = _URL_RE.sub(lambda m: _spell(m.group(1).split("://")[-1], lang),
                       text)
    return text


# ----------------------------------------------------------- telephone

_TEL_RE = re.compile(
    r"(?<!\d)(\+\d{1,3}[ -])?(\(?\d{3}\)?[ -]\d{3}[ -]\d{2,4})(?!\d)")


def apply_telephone(text: str, lang: str) -> str:
    dw = _digit_words(lang)
    plus = {"en": "plus", "de": "plus", "es": "más", "ru": "плюс"}[lang]

    def read(m):
        parts = []
        if m.group(1):
            parts.append(plus)
            parts.extend(dw[int(c)] for c in m.group(1) if c.isdigit())
        parts.extend(dw[int(c)] for c in m.group(2) if c.isdigit())
        return " ".join(parts)

    return _TEL_RE.sub(read, text)


# ---------------------------------------------------------------- date

_ISO_RE = re.compile(r"\b(1[6-9]\d\d|20\d\d)-(0?[1-9]|1[0-2])"
                     r"-(0?[1-9]|[12]\d|3[01])\b")
_DMY_DOT_RE = re.compile(r"\b(0?[1-9]|[12]\d|3[01])\.(0?[1-9]|1[0-2])"
                         r"\.(1[6-9]\d\d|20\d\d)\b")
_DMY_SLASH_RE = re.compile(r"\b(0?[1-9]|[12]\d|3[01])/(0?[1-9]|1[0-2])"
                           r"/(1[6-9]\d\d|20\d\d)\b")
_EN_MONTH_RE = re.compile(
    r"\b(jan(?:uary|\.)?|feb(?:ruary|\.)?|mar(?:ch|\.)?|apr(?:il|\.)?|may|"
    r"jun(?:e|\.)?|jul(?:y|\.)?|aug(?:ust|\.)?|sep(?:tember|t?\.)?|"
    r"oct(?:ober|\.)?|nov(?:ember|\.)?|dec(?:ember|\.)?)\s+"
    r"(\d{1,2})(?:st|nd|rd|th)?(?:,?\s+(\d{4}))?\b", re.IGNORECASE)
# year tokens must not sit inside a decimal ("11,2006" de / "3.1984" en)
_YEAR_RE = re.compile(r"(?<![\d.,])(1[6-9]\d\d|20\d\d)(s?)(?![\d.,])")


def _en_month_idx(tok: str) -> int:
    t = tok.rstrip(".").lower()[:3]
    return ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug",
            "sep", "oct", "nov", "dec"].index(t)


_DECADE_RE = re.compile(r"\b(mid-)?(1[6-9]\d\d|20\d\d)s\b",
                        re.IGNORECASE)

# words that mark a following bare 1600-2099 number as a year
_EN_YEAR_CUES = frozenset((
    "in", "since", "by", "from", "until", "till", "of", "circa", "around",
    "after", "before", "between", "and", "to", "during", "through", "early",
    "late", "mid", "year", "c", "ca",
))


def apply_decades_en(text: str) -> str:
    """Decades BEFORE the measure pass ('1990s' must not read as
    'nineteen ninety seconds'): 1990s -> nineteen nineties,
    mid-1990s -> mid nineteen nineties."""
    def dec(m):
        y = en_year(int(m.group(2)))
        y = (y[:-1] + "ies") if y.endswith("y") else y + "s"
        return ("mid " if m.group(1) else "") + y

    return _DECADE_RE.sub(dec, text)


def apply_date_en(text: str) -> str:
    def iso(m):
        y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
        return f"{_EN_MONTHS[mo - 1]} {_en_ordinal_words(d)} {en_year(y)}"

    text = _ISO_RE.sub(iso, text)

    def mdy(m):
        mo = _en_month_idx(m.group(1))
        out = f"{_EN_MONTHS[mo]} {_en_ordinal_words(int(m.group(2)))}"
        if m.group(3):
            out += f" {en_year(int(m.group(3)))}"
        return out

    text = _EN_MONTH_RE.sub(mdy, text)

    def year(m):
        y = int(m.group(1))
        if m.group(2):  # decades (normally consumed by apply_decades_en)
            base = en_year(y)
            return (base[:-1] + "ies") if base.endswith("y") \
                else base + "s"
        # date-vs-cardinal disambiguation (the reference weights the en
        # date tagger against cardinal with FST weights): read a bare
        # 1600-2099 number as a year only under a date cue — a preceding
        # preposition/month word or sentence-final position.  Otherwise
        # leave the digits for the cardinal pass ("2023 attendees",
        # "room 1984" must not become year readings).
        before = m.string[: m.start()].rstrip()
        prev = re.split(r"[^A-Za-z.']+", before)[-1].rstrip(".").lower() \
            if before else ""
        after = m.string[m.end():].lstrip()
        sentence_final = after == "" or after[0] in ".?!"
        is_month = prev[:3] in ("jan", "feb", "mar", "apr", "may", "jun",
                                "jul", "aug", "sep", "oct", "nov", "dec")
        if prev in _EN_YEAR_CUES or is_month or sentence_final:
            return en_year(y)
        return m.group(0)

    return _YEAR_RE.sub(year, text)


def apply_date_de(text: str) -> str:
    from funasr_tpu.text.tn import num_to_de

    def dmy(m):
        d, mo, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        ir = {1: "erster", 3: "dritter", 7: "siebter", 8: "achter"}
        day = ir.get(d, num_to_de(d) + ("ter" if d < 20 else "ster"))
        return f"{day} {_DE_MONTHS[mo - 1]} {de_year(y)}"

    text = _DMY_DOT_RE.sub(dmy, text)
    return _YEAR_RE.sub(lambda m: de_year(int(m.group(1))) + m.group(2),
                        text)


def apply_date_es(text: str) -> str:
    from funasr_tpu.text.tn import num_to_es

    def dmy(m):
        d, mo, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        day = "primero" if d == 1 else num_to_es(d)
        return f"{day} de {_ES_MONTHS[mo - 1]} de {num_to_es(y)}"

    for pat in (_DMY_SLASH_RE, _DMY_DOT_RE):
        text = pat.sub(dmy, text)
    return text


# neuter ordinals for day-of-month readings ("пятое января")
_RU_DAY_ORD = {1: "первое", 2: "второе", 3: "третье", 4: "четвёртое",
               5: "пятое", 6: "шестое", 7: "седьмое", 8: "восьмое",
               9: "девятое", 10: "десятое", 11: "одиннадцатое",
               12: "двенадцатое", 13: "тринадцатое", 14: "четырнадцатое",
               15: "пятнадцатое", 16: "шестнадцатое", 17: "семнадцатое",
               18: "восемнадцатое", 19: "девятнадцатое",
               20: "двадцатое", 30: "тридцатое"}
# genitive ordinal for the year's final word ("...двенадцатого года")
_RU_YEAR_ORD = {"один": "первого", "два": "второго", "три": "третьего",
                "четыре": "четвёртого", "пять": "пятого",
                "шесть": "шестого", "семь": "седьмого",
                "восемь": "восьмого", "девять": "девятого",
                "десять": "десятого", "одиннадцать": "одиннадцатого",
                "двенадцать": "двенадцатого",
                "тринадцать": "тринадцатого",
                "четырнадцать": "четырнадцатого",
                "пятнадцать": "пятнадцатого",
                "шестнадцать": "шестнадцатого",
                "семнадцать": "семнадцатого",
                "восемнадцать": "восемнадцатого",
                "девятнадцать": "девятнадцатого",
                "двадцать": "двадцатого", "тридцать": "тридцатого",
                "сорок": "сорокового", "пятьдесят": "пятидесятого",
                "шестьдесят": "шестидесятого",
                "семьдесят": "семидесятого",
                "восемьдесят": "восьмидесятого",
                "девяносто": "девяностого"}


def _ru_day_ord(d: int) -> str:
    if d in _RU_DAY_ORD:
        return _RU_DAY_ORD[d]
    return "двадцать " + _RU_DAY_ORD[d - 20]


def apply_date_ru(text: str) -> str:
    from funasr_tpu.text.tn import num_to_ru

    def dmy(m):
        d, mo, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        ywords = num_to_ru(y).split(" ")
        if ywords[-1] in _RU_YEAR_ORD:
            ywords[-1] = _RU_YEAR_ORD[ywords[-1]]
            ytxt = " ".join(ywords) + " года"
        else:
            ytxt = " ".join(ywords)  # round years: keep the cardinal
        return f"{_ru_day_ord(d)} {_RU_MONTHS[mo - 1]} {ytxt}"

    return _DMY_DOT_RE.sub(dmy, text)


# ---------------------------------------------------------------- time

_TIME_RE = re.compile(r"\b([01]?\d|2[0-3]):([0-5]\d)\b")


def apply_time(text: str, lang: str) -> str:
    num = _num(lang)

    def t(m):
        h, mi = int(m.group(1)), int(m.group(2))
        if lang == "en":
            if mi == 0:
                return f"{num(h)} o'clock"
            if mi < 10:
                return f"{num(h)} oh {num(mi)}"
            return f"{num(h)} {num(mi)}"
        if lang == "de":
            if mi == 0:
                return f"{num(h)} uhr"
            return f"{num(h)} uhr {num(mi)}"
        if lang == "es":
            if mi == 0:
                return f"{num(h)} en punto"
            return f"{num(h)} {num(mi)}"
        return f"{num(h)} {num(mi)}"  # ru

    return _TIME_RE.sub(t, text)


# ------------------------------------------------------------ fraction

_FRAC_RE = re.compile(r"\b(?:(\d+) )?(\d+)/(\d+)\b")

_ES_FRAC = {2: "medio", 3: "tercio", 4: "cuarto", 5: "quinto",
            6: "sexto", 7: "séptimo", 8: "octavo", 9: "noveno",
            10: "décimo"}


def _en_frac_unit(den: int, plural: bool) -> str:
    if den == 2:
        return "halves" if plural else "half"
    if den == 4:
        return "quarters" if plural else "quarter"
    w = _en_ordinal_words(den)
    return w + "s" if plural else w


def _de_frac_unit(den: int) -> str:
    from funasr_tpu.text.tn import num_to_de

    if den == 2:
        return "halb"
    if den == 3:
        return "drittel"
    if den == 7:
        return "siebtel"
    w = num_to_de(den)
    return w + ("stel" if den >= 20 else "tel")


def apply_fraction(text: str, lang: str) -> str:
    num = _num(lang)

    def f(m):
        whole, nu, de_ = m.group(1), int(m.group(2)), int(m.group(3))
        if de_ == 0:
            return m.group(0)
        if lang == "en":
            frac = f"{num(nu)} {_en_frac_unit(de_, nu != 1)}"
            conj = "and"
        elif lang == "de":
            frac = f"{num(nu)} {_de_frac_unit(de_)}"
            conj = "und"
        else:  # es
            unit = _ES_FRAC.get(de_)
            if unit is None:
                unit = num(de_) + "avo"
            if nu != 1:
                unit += "s"
            frac = f"{num(nu)} {unit}"
            conj = "y"
        if whole:
            return f"{num(int(whole))} {conj} {frac}"
        return frac

    return _FRAC_RE.sub(f, text)


# ------------------------------------------------- en range/roman/etc.

_RANGE_RE = re.compile(r"(?<![\w-])(\d+)\s*-\s*(\d+)(?![\w-])")
_PLUS_RE = re.compile(r"\b(\d+)\s*\+\s*(\d+)\b")
_APPROX_RE = re.compile(r"~\s*(\d+)")
_MID_RE = re.compile(r"\bmid-(\d{4})(s?)\b", re.IGNORECASE)


def apply_range_en(text: str) -> str:
    """Reference en range tagger: N-M -> 'N to M' (years read as years),
    N+M -> 'N plus M', ~N -> 'approximately N', mid-1990s -> 'mid
    nineteen nineties'."""
    from funasr_tpu.text.tn import num_to_en

    def mid(m):
        y = en_year(int(m.group(1)))
        if m.group(2):
            y = (y[:-1] + "ies") if y.endswith("y") else y + "s"
        return f"mid {y}"

    text = _MID_RE.sub(mid, text)

    def rng(m):
        a, b = int(m.group(1)), int(m.group(2))
        if 1600 <= a <= 2099 and (1600 <= b <= 2099 or b < 100):
            return f"{en_year(a)} to " + (
                en_year(b) if b >= 100 else num_to_en(b))
        return f"{num_to_en(a)} to {num_to_en(b)}"

    text = _RANGE_RE.sub(rng, text)
    text = _PLUS_RE.sub(
        lambda m: f"{num_to_en(int(m.group(1)))} plus "
                  f"{num_to_en(int(m.group(2)))}", text)
    return _APPROX_RE.sub(
        lambda m: f"approximately {num_to_en(int(m.group(1)))}", text)


_ROMAN_VAL = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500,
              "M": 1000}
_ROMAN_BODY = (r"(M{0,3})(CM|CD|D?C{0,3})(XC|XL|L?X{0,3})"
               r"(IX|IV|V?I{0,3})")
# bare roman tokens convert only in the SAFE alphabet {I,V,X} (II, IV,
# XIV, ...) — L/C/D/M combinations collide with ordinary caps words and
# abbreviations (DC, XL, CD, MC, MIX); the reference resolves those with
# FST weights against the word graph, here they need a cue word
_ROMAN_SAFE_RE = re.compile(r"\b(?=[IVX]{2,}\b)" + _ROMAN_BODY + r"\b")
# "chapter IV", "part XL", ... — the cue word licenses any numeral; the
# cue matches case-insensitively but the numeral itself must be
# UPPERCASE (a lowercase 'mix'/'dix' after a cue is a word, not a number)
_ROMAN_CUE_RE = re.compile(
    r"\b((?i:chapter|part|act|section|volume|book|page|appendix|class|"
    r"type|war|phase|stage|title|article))\s+(?=[IVXLCDM]{2,}\b)"
    + _ROMAN_BODY + r"\b")


def roman_to_int(s: str) -> int:
    total = 0
    for i, c in enumerate(s):
        v = _ROMAN_VAL[c]
        if i + 1 < len(s) and _ROMAN_VAL[s[i + 1]] > v:
            total -= v
        else:
            total += v
    return total


def apply_roman_en(text: str) -> str:
    from funasr_tpu.text.tn import num_to_en

    def cue(m):
        s = "".join(m.groups()[1:])
        if not s:
            return m.group(0)
        return f"{m.group(1)} {num_to_en(roman_to_int(s))}"

    text = _ROMAN_CUE_RE.sub(cue, text)

    def safe(m):
        s = "".join(m.groups())
        if not s:
            return m.group(0)
        return num_to_en(roman_to_int(s))

    return _ROMAN_SAFE_RE.sub(safe, text)


_SERIAL_RE = re.compile(r"\b([A-Za-z]{1,3})(\d{1,4})\b|"
                        r"\b(\d{1,4})([A-Za-z]{1,3})\b")
_ABBR_RE = re.compile(r"\b([A-Z]{2,5})\b")
# letter-by-letter abbreviations: caps tokens with no vowel are read as
# letters (TV, FBI, WWW); vowel-bearing caps tokens only via whitelist —
# the reference's weighted FST lets ordinary words (THIS, GREAT) and
# word-acronyms (NATO) win, which a rule pass approximates this way
_ABBR_WHITELIST = {"USA", "IBM", "ID", "EU", "UK", "US", "AI", "IO",
                   "AM", "PM", "IE", "EG", "IP", "UI", "OS", "IQ",
                   "FBI", "CIA", "IRS", "DIY", "FYI", "CEO", "CFO",
                   "CTO", "CPU", "GPU", "API", "URL", "USB",
                   "UN", "UAE", "IPO", "ISO", "IDE", "NYC"}
# Y counts as a vowel here: MY/WHY/GYM-style caps words must pass
# through, not spell out
_VOWELS = set("AEIOUY")


def apply_serial_en(text: str) -> str:
    """C24 -> c twenty four; 12b -> twelve b (reference serial tagger:
    mixed alphanumerics read letters spelled + numbers as cardinals)."""
    from funasr_tpu.text.tn import num_to_en

    def s(m):
        if m.group(1) is not None:
            letters, digits = m.group(1), m.group(2)
            return " ".join(list(letters.lower())) + " " \
                + num_to_en(int(digits))
        digits, letters = m.group(3), m.group(4)
        return num_to_en(int(digits)) + " " \
            + " ".join(list(letters.lower()))

    return _SERIAL_RE.sub(s, text)


def apply_abbreviation_en(text: str) -> str:
    """Letter-read abbreviations spell out (reference abbreviation
    tagger); vowel-bearing caps words (THIS, NATO) pass through — see
    _ABBR_WHITELIST note."""
    def a(m):
        t = m.group(1)
        if t in _ABBR_WHITELIST or not (set(t) & _VOWELS):
            return " ".join(t.lower())
        return t

    return _ABBR_RE.sub(a, text)
