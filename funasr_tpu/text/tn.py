"""Forward text normalization (TN): written -> spoken form (reference
fun_text_processing/text_normalization — the forward direction of the
pynini grammar package; used to prepare training transcripts and TTS-style
inputs).

Rule coverage mirrors the ITN module: cardinals, decimals, percents,
negatives for zh and en; unknown patterns pass through.
"""

from __future__ import annotations

import re
from typing import List

_ZH_DIG = "零一二三四五六七八九"
_ZH_UNITS = ["", "十", "百", "千"]
_ZH_BIG = ["", "万", "亿"]


def _zh_section(n: int) -> str:
    """0..9999 -> chinese reading (no leading 零 cleanup here)."""
    if n == 0:
        return ""
    out = []
    digits = [int(c) for c in str(n)]
    L = len(digits)
    zero_pending = False
    for i, d in enumerate(digits):
        unit = _ZH_UNITS[L - 1 - i]
        if d == 0:
            zero_pending = True
            continue
        if zero_pending and out:
            out.append("零")
        zero_pending = False
        out.append(_ZH_DIG[d] + unit)
    return "".join(out)


def num_to_zh(n: int) -> str:
    if n < 0:
        return "负" + num_to_zh(-n)
    if n == 0:
        return "零"
    # split into 万-base sections, most significant first
    secs: List[int] = []
    while n > 0:
        secs.append(n % 10000)
        n //= 10000
    secs.reverse()
    parts: List[str] = []
    for i, sec in enumerate(secs):
        big = _ZH_BIG[len(secs) - 1 - i]
        if sec == 0:
            continue
        txt = _zh_section(sec) + big
        # a lower section starting below its full width needs a bridging 零
        if parts and sec < 1000:
            txt = "零" + txt
        parts.append(txt)
    s = "".join(parts)
    # 一十X -> 十X at the very front (10..19)
    if s.startswith("一十"):
        s = s[1:]
    return s


def _zh_digits(s: str) -> str:
    return "".join(_ZH_DIG[int(c)] for c in s)


def normalize_zh(text: str) -> str:
    text = _tn_measure_zh(text)
    # percents: 45.5% -> 百分之四十五点五
    def pct(m):
        body = m.group(1)
        if "." in body:
            a, b = body.split(".", 1)
            return f"百分之{num_to_zh(int(a))}点{_zh_digits(b)}"
        return f"百分之{num_to_zh(int(body))}"

    text = re.sub(r"(\d+(?:\.\d+)?)%", pct, text)
    # times: 12:25 -> 十二点二十五分, 9:05:30 adds 秒.  Out-of-range
    # fields (1:50 odds, 3:99 scores, 25:00) are not clock times and pass
    # through untouched.
    def tm(m):
        h, mi, se = m.group(1), m.group(2), m.group(3)
        if int(h) > 23 or int(mi) > 59 or (se and int(se) > 59):
            return m.group(0)
        s = f"{num_to_zh(int(h))}点"
        if int(mi):
            s += ("零" if mi[0] == "0" else "") + num_to_zh(int(mi)) + "分"
        elif se:
            s += "零分"  # 9:00:30 must keep the minute slot unambiguous
        else:
            s += "钟"
        if se:
            s += f"{num_to_zh(int(se))}秒"
        return s

    # \b fails between CJK (word chars) and digits: use digit lookarounds
    text = re.sub(r"(?<!\d)(\d{1,2}):(\d{2})(?::(\d{2}))?(?!\d)", tm, text)
    # decimals
    text = re.sub(
        r"(\d+)\.(\d+)",
        lambda m: f"{num_to_zh(int(m.group(1)))}点{_zh_digits(m.group(2))}",
        text)
    # negatives
    text = re.sub(r"-(\d+)", lambda m: f"负{num_to_zh(int(m.group(1)))}", text)
    # very long digit strings (phone numbers etc.) read digit by digit
    text = re.sub(r"\d{11,}", lambda m: _zh_digits(m.group(0)), text)
    # plain cardinals
    text = re.sub(r"\d+", lambda m: num_to_zh(int(m.group(0))), text)
    return text


_EN_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
            "eight", "nine", "ten", "eleven", "twelve", "thirteen",
            "fourteen", "fifteen", "sixteen", "seventeen", "eighteen",
            "nineteen"]
_EN_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty",
            "seventy", "eighty", "ninety"]


def num_to_en(n: int) -> str:
    if n < 0:
        return "minus " + num_to_en(-n)
    if n < 20:
        return _EN_ONES[n]
    if n < 100:
        t = _EN_TENS[n // 10]
        return t if n % 10 == 0 else f"{t} {_EN_ONES[n % 10]}"
    if n < 1000:
        head = f"{_EN_ONES[n // 100]} hundred"
        return head if n % 100 == 0 else f"{head} {num_to_en(n % 100)}"
    for scale, name in ((10**9, "billion"), (10**6, "million"),
                        (10**3, "thousand")):
        if n >= scale:
            head = f"{num_to_en(n // scale)} {name}"
            return head if n % scale == 0 else f"{head} {num_to_en(n % scale)}"
    return str(n)


def normalize_en(text: str) -> str:
    from funasr_tpu.text import tn_classes as TC

    text = TC.apply_decades_en(text)  # before measure ('1990s' != 1990 s)
    text = _tn_measure_latin(text, _EN_MEASURE_RE, _EN_MEASURE)
    # semiotic classes before the generic number passes (reference en
    # tagger set: date/fraction/electronic/telephone/range/roman/serial/
    # abbreviation — tn_classes.py)
    text = TC.apply_electronic(text, "en")
    text = TC.apply_telephone(text, "en")
    text = TC.apply_date_en(text)
    text = TC.apply_range_en(text)
    text = TC.apply_fraction(text, "en")
    text = TC.apply_time(text, "en")

    def pct(m):
        body = m.group(1)
        if "." in body:
            a, b = body.split(".", 1)
            digits = " ".join(_EN_ONES[int(c)] for c in b)
            return f"{num_to_en(int(a))} point {digits} percent"
        return f"{num_to_en(int(body))} percent"

    text = re.sub(r"(\d+(?:\.\d+)?)%", pct, text)
    # money: $25 -> twenty five dollars, $5.20 -> five dollars and
    # twenty cents; singular for 1 ("one dollar", "one cent"); fractions
    # that aren't exactly two digits read as decimals ("$5.2" -> five
    # point two dollars)
    def money(m):
        whole = num_to_en(int(m.group(1)))
        unit = "dollar" if int(m.group(1)) == 1 else "dollars"
        frac = m.group(2)
        if frac and len(frac) == 2:
            cents = num_to_en(int(frac))
            cunit = "cent" if int(frac) == 1 else "cents"
            return f"{whole} {unit} and {cents} {cunit}"
        if frac:
            digits = " ".join(_EN_ONES[int(c)] for c in frac)
            return f"{whole} point {digits} dollars"
        return f"{whole} {unit}"

    text = re.sub(r"\$(\d+)(?:\.(\d+))?", money, text)
    # ordinals: 21st -> twenty first (ordinalize the last cardinal word)
    _ORD_IRREG = {"one": "first", "two": "second", "three": "third",
                  "five": "fifth", "eight": "eighth", "nine": "ninth",
                  "twelve": "twelfth"}

    def ordinal(m):
        words = num_to_en(int(m.group(1))).split(" ")
        last = words[-1]
        if last in _ORD_IRREG:
            words[-1] = _ORD_IRREG[last]
        elif last.endswith("y"):
            words[-1] = last[:-1] + "ieth"
        else:
            words[-1] = last + "th"
        return " ".join(words)

    text = re.sub(r"\b(\d+)(?:st|nd|rd|th)\b", ordinal, text)
    text = re.sub(
        r"(\d+)\.(\d+)",
        lambda m: f"{num_to_en(int(m.group(1)))} point "
                  + " ".join(_EN_ONES[int(c)] for c in m.group(2)),
        text)
    text = re.sub(r"-(\d+)", lambda m: f"minus {num_to_en(int(m.group(1)))}",
                  text)
    text = TC.apply_serial_en(text)
    text = re.sub(r"\d+", lambda m: num_to_en(int(m.group(0))), text)
    text = TC.apply_roman_en(text)
    text = TC.apply_abbreviation_en(text)
    return text




# ---------------------------------------------------------------- German
# (reference fun_text_processing/text_normalization/de/)

_DE_ONES = ["null", "eins", "zwei", "drei", "vier", "fünf", "sechs",
            "sieben", "acht", "neun", "zehn", "elf", "zwölf", "dreizehn",
            "vierzehn", "fünfzehn", "sechzehn", "siebzehn", "achtzehn",
            "neunzehn"]
_DE_TENS = ["", "", "zwanzig", "dreißig", "vierzig", "fünfzig", "sechzig",
            "siebzig", "achtzig", "neunzig"]


def num_to_de(n: int) -> str:
    if n < 0:
        return "minus " + num_to_de(-n)
    if n < 13:
        return _DE_ONES[n]
    if n < 20:
        return _DE_ONES[n]
    if n < 100:
        tens = _DE_TENS[n // 10]
        if n % 10 == 0:
            return tens
        one = "ein" if n % 10 == 1 else _DE_ONES[n % 10]
        return f"{one}und{tens}"
    if n < 1000:
        head = ("ein" if n // 100 == 1 else _DE_ONES[n // 100]) + "hundert"
        return head if n % 100 == 0 else head + num_to_de(n % 100)
    if n < 10**6:
        head = ("ein" if n // 1000 == 1
                else num_to_de(n // 1000)) + "tausend"
        return head if n % 1000 == 0 else head + num_to_de(n % 1000)
    for scale, one, many in ((10**9, "eine milliarde", "milliarden"),
                             (10**6, "eine million", "millionen")):
        if n >= scale:
            q = n // scale
            head = one if q == 1 else f"{num_to_de(q)} {many}"
            return head if n % scale == 0 \
                else f"{head} {num_to_de(n % scale)}"
    return str(n)


def normalize_de(text: str) -> str:
    from funasr_tpu.text import tn_classes as TC

    text = _tn_measure_latin(text, _DE_MEASURE_RE, _DE_MEASURE)
    # reference de tagger set: date/fraction/electronic/telephone/time
    text = TC.apply_electronic(text, "de")
    text = TC.apply_telephone(text, "de")
    text = TC.apply_date_de(text)
    text = TC.apply_fraction(text, "de")
    text = TC.apply_time(text, "de")

    def pct(m):
        body = m.group(1).replace(",", ".")
        if "." in body:
            a, b = body.split(".", 1)
            digits = " ".join(_DE_ONES[int(c)] for c in b)
            return f"{num_to_de(int(a))} komma {digits} prozent"
        return f"{num_to_de(int(body))} prozent"

    text = re.sub(r"(\d+(?:[.,]\d+)?) ?%", pct, text)
    # money: €11,04 / 11,04 € -> elf euro und vier cent
    def money(m):
        whole = num_to_de(int(m.group(1)))
        frac = m.group(2)
        if frac:
            return f"{whole} euro und {num_to_de(int(frac))} cent"
        return f"{whole} euro"

    text = re.sub(r"€ ?(\d+)(?:,(\d{2}))?", money, text)
    text = re.sub(r"(\d+)(?:,(\d{2}))? ?€", money, text)
    # ordinals: "3." before a word -> "dritter"
    _DE_ORD_IRREG = {1: "erster", 3: "dritter", 7: "siebter", 8: "achter"}

    def ordinal(m):
        n = int(m.group(1))
        if n in _DE_ORD_IRREG:
            return _DE_ORD_IRREG[n]
        return num_to_de(n) + ("ster" if n >= 20 else "ter")

    text = re.sub(r"\b(\d+)\.(?= [a-zäöüA-ZÄÖÜ])", ordinal, text)
    # decimals: 11,2006 -> elf komma zwei null null sechs
    text = re.sub(
        r"(\d+),(\d+)",
        lambda m: f"{num_to_de(int(m.group(1)))} komma "
                  + " ".join(_DE_ONES[int(c)] for c in m.group(2)),
        text)
    text = re.sub(r"-(\d+)",
                  lambda m: f"minus {num_to_de(int(m.group(1)))}", text)
    text = re.sub(r"\d+", lambda m: num_to_de(int(m.group(0))), text)
    return text


# --------------------------------------------------------------- Spanish
# (reference fun_text_processing/text_normalization/es/)

_ES_ONES = ["cero", "uno", "dos", "tres", "cuatro", "cinco", "seis",
            "siete", "ocho", "nueve", "diez", "once", "doce", "trece",
            "catorce", "quince", "dieciséis", "diecisiete", "dieciocho",
            "diecinueve", "veinte", "veintiuno", "veintidós", "veintitrés",
            "veinticuatro", "veinticinco", "veintiséis", "veintisiete",
            "veintiocho", "veintinueve"]
_ES_TENS = ["", "", "", "treinta", "cuarenta", "cincuenta", "sesenta",
            "setenta", "ochenta", "noventa"]
_ES_HUNDREDS = ["", "ciento", "doscientos", "trescientos",
                "cuatrocientos", "quinientos", "seiscientos",
                "setecientos", "ochocientos", "novecientos"]


def num_to_es(n: int) -> str:
    if n < 0:
        return "menos " + num_to_es(-n)
    if n < 30:
        return _ES_ONES[n]
    if n < 100:
        tens = _ES_TENS[n // 10]
        return tens if n % 10 == 0 else f"{tens} y {_ES_ONES[n % 10]}"
    if n == 100:
        return "cien"
    if n < 1000:
        head = _ES_HUNDREDS[n // 100]
        return head if n % 100 == 0 else f"{head} {num_to_es(n % 100)}"
    if n < 10**6:
        q = n // 1000
        head = "mil" if q == 1 else f"{num_to_es(q)} mil"
        return head if n % 1000 == 0 else f"{head} {num_to_es(n % 1000)}"
    q = n // 10**6
    head = "un millón" if q == 1 else f"{num_to_es(q)} millones"
    return head if n % 10**6 == 0 else f"{head} {num_to_es(n % 10**6)}"


def normalize_es(text: str) -> str:
    from funasr_tpu.text import tn_classes as TC

    text = _tn_measure_latin(text, _ES_MEASURE_RE, _ES_MEASURE)
    # reference es tagger set: date/fraction/electronic/telephone/time
    text = TC.apply_electronic(text, "es")
    text = TC.apply_telephone(text, "es")
    text = TC.apply_date_es(text)
    text = TC.apply_fraction(text, "es")
    text = TC.apply_time(text, "es")

    def pct(m):
        body = m.group(1).replace(",", ".")
        if "." in body:
            a, b = body.split(".", 1)
            digits = " ".join(_ES_ONES[int(c)] for c in b)
            return f"{num_to_es(int(a))} coma {digits} por ciento"
        return f"{num_to_es(int(body))} por ciento"

    text = re.sub(r"(\d+(?:[.,]\d+)?) ?%", pct, text)

    def money(m):
        whole = num_to_es(int(m.group(1)))
        unit = "dólar" if int(m.group(1)) == 1 else "dólares"
        frac = m.group(2)
        if frac:
            cu = "céntimo" if int(frac) == 1 else "céntimos"
            return f"{whole} {unit} y {num_to_es(int(frac))} {cu}"
        return f"{whole} {unit}"

    text = re.sub(r"\$ ?(\d+)(?:[.,](\d{2}))?", money, text)
    text = re.sub(
        r"(\d+),(\d+)",
        lambda m: f"{num_to_es(int(m.group(1)))} coma "
                  + " ".join(_ES_ONES[int(c)] for c in m.group(2)),
        text)
    text = re.sub(
        r"(\d+)\.(\d+)",
        lambda m: f"{num_to_es(int(m.group(1)))} punto "
                  + " ".join(_ES_ONES[int(c)] for c in m.group(2)),
        text)
    text = re.sub(r"-(\d+)",
                  lambda m: f"menos {num_to_es(int(m.group(1)))}", text)
    text = re.sub(r"\d+", lambda m: num_to_es(int(m.group(0))), text)
    return text


# --------------------------------------------------------------- Russian
# (reference fun_text_processing/text_normalization/ru/)

_RU_ONES = ["ноль", "один", "два", "три", "четыре", "пять", "шесть",
            "семь", "восемь", "девять", "десять", "одиннадцать",
            "двенадцать", "тринадцать", "четырнадцать", "пятнадцать",
            "шестнадцать", "семнадцать", "восемнадцать", "девятнадцать"]
_RU_TENS = ["", "", "двадцать", "тридцать", "сорок", "пятьдесят",
            "шестьдесят", "семьдесят", "восемьдесят", "девяносто"]
_RU_HUNDREDS = ["", "сто", "двести", "триста", "четыреста", "пятьсот",
                "шестьсот", "семьсот", "восемьсот", "девятьсот"]


def _ru_thousand_quant(q: int) -> str:
    # тысяча agrees with the count: 1 тысяча, 2-4 тысячи, 5+ тысяч
    words = num_to_ru(q).split(" ")
    last = q % 10
    if q % 100 in (11, 12, 13, 14):
        unit = "тысяч"
    elif last == 1:
        words[-1] = "одна"
        unit = "тысяча"
    elif last == 2:
        words[-1] = "две"
        unit = "тысячи"
    elif last in (3, 4):
        unit = "тысячи"
    else:
        unit = "тысяч"
    head = "" if q == 1 else " ".join(words) + " "
    return ("одна " if q == 1 else head) + unit


def num_to_ru(n: int) -> str:
    if n < 0:
        return "минус " + num_to_ru(-n)
    if n < 20:
        return _RU_ONES[n]
    if n < 100:
        tens = _RU_TENS[n // 10]
        return tens if n % 10 == 0 else f"{tens} {_RU_ONES[n % 10]}"
    if n < 1000:
        head = _RU_HUNDREDS[n // 100]
        return head if n % 100 == 0 else f"{head} {num_to_ru(n % 100)}"
    if n < 10**6:
        head = _ru_thousand_quant(n // 1000)
        return head if n % 1000 == 0 else f"{head} {num_to_ru(n % 1000)}"
    q = n // 10**6
    if q % 10 == 1 and q % 100 != 11:
        unit = "миллион"
    elif q % 10 in (2, 3, 4) and q % 100 not in (12, 13, 14):
        unit = "миллиона"
    else:
        unit = "миллионов"
    head = f"{num_to_ru(q)} {unit}"
    return head if n % 10**6 == 0 else f"{head} {num_to_ru(n % 10**6)}"


def normalize_ru(text: str) -> str:
    from funasr_tpu.text import tn_classes as TC

    text = _tn_measure_ru(text)
    # reference ru tagger set: date/electronic/telephone/time (no
    # fraction tagger in the ru dir)
    text = TC.apply_electronic(text, "ru")
    text = TC.apply_telephone(text, "ru")
    text = TC.apply_date_ru(text)
    text = TC.apply_time(text, "ru")

    def pct(m):
        body = m.group(1).replace(",", ".")
        if "." in body:
            a, b = body.split(".", 1)
            digits = " ".join(_RU_ONES[int(c)] for c in b)
            return f"{num_to_ru(int(a))} запятая {digits} процентов"
        return f"{num_to_ru(int(body))} процентов"

    text = re.sub(r"(\d+(?:[.,]\d+)?) ?%", pct, text)

    def money(m):
        n = int(m.group(1))
        last = n % 10
        if n % 100 in (11, 12, 13, 14):
            unit = "рублей"
        elif last == 1:
            unit = "рубль"
        elif last in (2, 3, 4):
            unit = "рубля"
        else:
            unit = "рублей"
        return f"{num_to_ru(n)} {unit}"

    text = re.sub(r"(\d+) руб\.", money, text)
    text = re.sub(
        r"(\d+),(\d+)",
        lambda m: f"{num_to_ru(int(m.group(1)))} запятая "
                  + " ".join(_RU_ONES[int(c)] for c in m.group(2)),
        text)
    text = re.sub(r"-(\d+)",
                  lambda m: f"минус {num_to_ru(int(m.group(1)))}", text)
    text = re.sub(r"\d+", lambda m: num_to_ru(int(m.group(0))), text)
    return text




# --------------------------------------------------------------- measure
# Forward measure verbalization (reference text_normalization/*/taggers/
# measure.py): the unit token is rewritten to its spoken noun and the
# number is left for the language's existing cardinal/decimal passes
# ("12 kg" -> "12 kilograms" -> "twelve kilograms").
_EN_MEASURE = {  # abbr -> (singular, plural)
    "kg": ("kilogram", "kilograms"), "km": ("kilometer", "kilometers"),
    "cm": ("centimeter", "centimeters"), "mm": ("millimeter",
                                                "millimeters"),
    "mg": ("milligram", "milligrams"), "ha": ("hectare", "hectares"),
    "hz": ("hertz", "hertz"), "kw": ("kilowatt", "kilowatts"),
    "hp": ("horsepower", "horsepower"), "min": ("minute", "minutes"),
    "ml": ("milliliter", "milliliters"), "db": ("decibel", "decibels"),
    "mi": ("mile", "miles"), "ft": ("foot", "feet"),
    "°C": ("degree celsius", "degrees celsius"),
    "°F": ("degree fahrenheit", "degrees fahrenheit"),
    "km/h": ("kilometer per hour", "kilometers per hour"),
    "mph": ("mile per hour", "miles per hour"),
    "g": ("gram", "grams"), "t": ("ton", "tons"), "l": ("liter", "liters"),
    "s": ("second", "seconds"), "h": ("hour", "hours"),
    "m": ("meter", "meters"),
}
_ZH_MEASURE = {"°C": "摄氏度", "°F": "华氏度", "kg": "千克", "km": "千米",
               "cm": "厘米", "mm": "毫米", "mg": "毫克", "ha": "公顷",
               "m²": "平方米", "m³": "立方米", "ml": "毫升", "g": "克",
               "t": "吨", "l": "升", "m": "米"}
_DE_MEASURE = {"kg": ("kilogramm", "kilogramm"),
               "km": ("kilometer", "kilometer"),
               "cm": ("zentimeter", "zentimeter"),
               "mm": ("millimeter", "millimeter"),
               "g": ("gramm", "gramm"), "t": ("tonne", "tonnen"),
               "l": ("liter", "liter"), "m": ("meter", "meter"),
               "h": ("stunde", "stunden"), "min": ("minute", "minuten"),
               "s": ("sekunde", "sekunden"),
               "°C": ("grad celsius", "grad celsius")}
_ES_MEASURE = {"kg": ("kilogramo", "kilogramos"),
               "km": ("kilómetro", "kilómetros"),
               "cm": ("centímetro", "centímetros"),
               "g": ("gramo", "gramos"), "l": ("litro", "litros"),
               "m": ("metro", "metros"), "h": ("hora", "horas"),
               "min": ("minuto", "minutos"), "s": ("segundo", "segundos"),
               "°C": ("grado celsius", "grados celsius")}
_RU_MEASURE = {  # abbr -> (1, 2-4, 5+) declensions
    "кг": ("килограмм", "килограмма", "килограммов"),
    "км": ("километр", "километра", "километров"),
    "см": ("сантиметр", "сантиметра", "сантиметров"),
    "мм": ("миллиметр", "миллиметра", "миллиметров"),
    "г": ("грамм", "грамма", "граммов"),
    "т": ("тонна", "тонны", "тонн"),
    "л": ("литр", "литра", "литров"),
    "м": ("метр", "метра", "метров"),
    "ч": ("час", "часа", "часов"),
    "мин": ("минута", "минуты", "минут"),
    "с": ("секунда", "секунды", "секунд"),
}


def _measure_pattern(units):
    alt = "|".join(re.escape(u) for u in sorted(units, key=len,
                                                reverse=True))
    return re.compile(rf"(\d+(?:[.,]\d+)?) ?({alt})(?![a-zA-Z°²³/])")


_EN_MEASURE_RE = _measure_pattern(_EN_MEASURE)
_ZH_MEASURE_RE = _measure_pattern(_ZH_MEASURE)
_DE_MEASURE_RE = _measure_pattern(_DE_MEASURE)
_ES_MEASURE_RE = _measure_pattern(_ES_MEASURE)
_RU_MEASURE_RE = re.compile(
    r"(\d+(?:[.,]\d+)?) ?("
    + "|".join(re.escape(u) for u in sorted(_RU_MEASURE, key=len,
                                            reverse=True))
    + r")(?![а-яa-zA-Z])")


def _tn_measure_latin(text, pat, units):
    def repl(m):
        num = m.group(1)
        sing, plur = units[m.group(2)]
        one = num == "1"
        return f"{num} {sing if one else plur}"

    return pat.sub(repl, text)


def _tn_measure_zh(text):
    return _ZH_MEASURE_RE.sub(
        lambda m: f"{m.group(1)}{_ZH_MEASURE[m.group(2)]}", text)


def _tn_measure_ru(text):
    def repl(m):
        num = m.group(1)
        forms = _RU_MEASURE[m.group(2)]
        if "," in num or "." in num:
            word = forms[1]  # decimals read the 2-4 form (две целых ...)
        else:
            n = int(num)
            if n % 100 in (11, 12, 13, 14):
                word = forms[2]
            elif n % 10 == 1:
                word = forms[0]
            elif n % 10 in (2, 3, 4):
                word = forms[1]
            else:
                word = forms[2]
        return f"{num} {word}"

    return _RU_MEASURE_RE.sub(repl, text)


def normalize(text: str, lang: str = "zh") -> str:
    lang = lang.lower()
    if lang.startswith("zh"):
        return normalize_zh(text)
    if lang.startswith("en"):
        return normalize_en(text)
    if lang.startswith("de"):
        return normalize_de(text)
    if lang.startswith("es"):
        return normalize_es(text)
    if lang.startswith("ru"):
        return normalize_ru(text)
    return text
