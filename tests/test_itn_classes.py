"""Per-language semiotic class ITN fixtures.

Expected outputs are derived from the reference grammar docstrings and
data files (fun_text_processing/inverse_text_normalization/<lang>/
taggers/*.py "e.g." lines, verbalizers, and data/*.tsv): date, time,
money, ordinal, decimal and fraction coverage for the ten languages that
previously only had cardinals+percents.
"""

import pytest

from funasr_tpu.text.itn import inverse_normalize as inv

CASES = [
    # --- en/zh measure (taggers/measure.py + data/measurements*.tsv)
    ("en", "minus twelve kilograms", "-12 kg"),
    ("en", "one hundred kilometers per hour", "100 km/h"),
    ("en", "thirty five degrees celsius", "35 °C"),
    ("en", "five minutes later", "5 min later"),
    ("zh", "今天三十五摄氏度", "今天35°C"),
    ("zh", "负五摄氏度", "-5°C"),
    ("zh", "三点五千克", "3.5kg"),
    # --- en/zh telephone (taggers/telephone.py: docstring examples)
    ("en", "one two three one two three five six seven eight",
     "123-123-5678"),
    ("en", "one two three dot one double three dot o dot four o",
     "123.133.0.40"),
    ("zh", "我的电话是幺三八零零幺三八零零零", "我的电话是13800138000"),
    # --- en/zh electronic (taggers/electronic.py + data/electronic/)
    ("en", "j o h n at g mail dot com", "john@gmail.com"),
    ("en", "w w w dot example dot com", "www.example.com"),
    ("zh", "网址是baidu点com", "网址是baidu.com"),
    # --- en time (taggers/time.py docstring examples)
    ("en", "twelve thirty", "12:30"),
    ("en", "five thirty p m", "5:30 p.m."),
    ("en", "two o eight", "2:08"),
    ("en", "half past two", "2:30"),
    ("en", "quarter to two", "1:45"),
    ("en", "quarter past two", "2:15"),
    ("en", "twelve past one", "1:12"),
    # --- en year (taggers/date.py year graph)
    ("en", "nineteen eighty four", "1984"),
    ("en", "twenty twenty", "2020"),
    ("en", "twenty oh nine", "2009"),
    ("en", "nineteen hundred", "1900"),
    ("en", "two thousand twenty three", "2023"),
    # --- whitelist (data/whitelist.tsv inverted; shared zh/en)
    ("en", "misses smith met mister jones", "mrs. smith met mr. jones"),
    ("en", "call me a s a p", "call me ASAP"),
    # ordinal-ones tails only compound with tens/scale heads
    ("en", "one second please", "1 s please"),
    ("en", "twenty second place", "22nd place"),
    ("en", "wait a second", "wait a second"),
    # --- secondary-language measure/telephone/electronic
    # (inverse_text_normalization/<lang>/taggers/{measure,telephone,
    # electronic}.py + data/measurements*.tsv)
    ("de", "minus elf kilogramm", "-11 kg"),
    ("de", "drei stunden", "3 h"),
    ("de", "null eins sieben sechs drei drei drei vier vier", "017633344"),
    ("de", "beispiel punkt de", "beispiel.de"),
    ("es", "doce kilómetros", "12 km"),
    ("es", "juan arroba gmail punto com", "juan@gmail.com"),
    ("es", "veinte por ciento", "20%"),
    ("es", "doce por ciento", "12%"),
    ("fr", "douze kilogrammes", "12 kg"),
    ("fr", "exemple point fr", "exemple.fr"),
    ("pt", "doze quilômetros", "12 km"),
    ("pt", "doze por cento", "12%"),
    ("ru", "два килограмма", "2 кг"),
    ("ru", "пять километров", "5 км"),
    ("id", "dua belas kilometer", "12 km"),
    ("vi", "mười hai ki lô mét", "12 km"),
    ("ja", "三十五キロメートル", "35km"),
    ("ko", "공일공일이삼사오육칠팔", "01012345678"),
    # --- German (de/taggers/{date,time,money,decimal,fraction}.py)
    ("de", "vierzehnter januar", "14. Jan."),
    ("de", "vierundzwanzigster juli zwei tausend dreizehn", "24. Jul. 2013"),
    ("de", "zweiter dritter", "02.03."),
    ("de", "dritter", "3."),
    ("de", "viertel vor zwölf", "11:45 Uhr"),
    ("de", "viertel nach zwölf", "12:15 Uhr"),
    ("de", "halb zwölf", "11:30 Uhr"),
    ("de", "drei nach zwölf", "12:03 Uhr"),
    ("de", "dreizehn uhr zehn", "13:10 Uhr"),
    ("de", "acht uhr", "8 Uhr"),
    ("de", "elf euro und vier cent", "€11,04"),
    ("de", "elf komma zwei null null sechs", "11,2006"),
    ("de", "ein halb", "1/2"),
    ("de", "ein ein halb", "1 1/2"),
    # --- Spanish (es/taggers/{date,time,money,ordinal,decimal}.py)
    ("es", "primero de enero", "1 de enero"),
    ("es", "segunda guerra mundial", "2.ª guerra mundial"),
    ("es", "la una y diez", "la 1:10"),
    ("es", "la una con diez", "la 1:10"),
    ("es", "las dos menos cuarto", "la 1:45"),
    ("es", "doce dólares y cinco céntimos", "$12,05"),
    ("es", "uno coma dos seis", "1,26"),
    ("es", "uno punto dos seis", "1.26"),
    # --- French (fr/taggers/{date,ordinal,decimal,fraction}.py)
    ("fr", "le vingt quatre juillet deux mille treize",
     "le 24 juillet 2013"),
    ("fr", "premier", "1er"),
    ("fr", "troisième", "3ème"),
    ("fr", "vingt-troisième", "23ème"),
    ("fr", "trois heures vingt", "3 h 20"),
    ("fr", "un virgule deux six", "1,26"),
    ("fr", "un et demi", "1 1/2"),
    ("fr", "demi", "1/2"),
    # --- Portuguese (pt/taggers/{date,time,money,ordinal,decimal}.py)
    ("pt", "primeiro de janeiro", "1 de janeiro"),
    ("pt", "doze dólares e cinco centavos", "$12,05"),
    ("pt", "um vírgula dois seis", "1,26"),
    ("pt", "quinze pras duas", "1:45"),
    ("pt", "quinze pro meio dia", "11:45"),
    ("pt", "segunda", "2ª"),
    # --- Russian (ru/taggers/{decimals,date,money,time,ordinal}.py)
    ("ru", "три целых две десятых", "3,2"),
    ("ru", "пятое января", "5 января"),
    ("ru", "два часа пятнадцать минут", "02:15"),
    ("ru", "два рубля", "2 руб."),
    ("ru", "второй", "2"),
    # --- Japanese (ja/data: currency.tsv ドル->$ etc.)
    ("ja", "三時二十分", "3:20"),
    ("ja", "三時半", "3:30"),
    ("ja", "百二十円", "¥120"),
    ("ja", "五ドル", "$5"),
    ("ja", "第三", "第3"),
    # --- Korean (ko/data/time/hours.tsv: native hours; currency.tsv)
    ("ko", "두시 삼십분", "2:30"),
    ("ko", "열두시 오분", "12:05"),
    ("ko", "오만 원", "₩50000"),
    ("ko", "두 번째", "2번째"),
    # --- Indonesian
    ("id", "kedua", "ke-2"),
    ("id", "kedua puluh", "ke-20"),
    ("id", "pertama", "ke-1"),
    ("id", "jam dua lewat lima belas", "2:15"),
    ("id", "setengah delapan", "7:30"),
    ("id", "seratus rupiah", "Rp100"),
    # --- Vietnamese (vi/taggers/{fraction,money}.py)
    ("vi", "thứ hai", "thứ 2"),
    ("vi", "thứ nhất", "thứ 1"),
    ("vi", "ba giờ hai mươi phút", "3:20"),
    ("vi", "ba giờ rưỡi", "3:30"),
    ("vi", "hai phần ba", "2/3"),
    ("vi", "một chín chín chín", "1999"),
    ("vi", "mười hai đô la mỹ", "$12"),
    # --- Tagalog
    ("tl", "ikalawa", "ika-2"),
    ("tl", "alas dos y medya", "2:30"),
    ("tl", "alas tres", "3:00"),
    ("tl", "sampu piso", "₱10"),
]


@pytest.mark.parametrize("lang,src,want", CASES,
                         ids=[f"{l}-{s[:24]}" for l, s, _ in CASES])
def test_itn_class(lang, src, want):
    assert inv(src, lang) == want


def test_passthrough_unknown():
    assert inv("hello welt", "de") == "hello welt"
    assert inv("x y z", "xx") == "x y z"


# ------------------------------------------------------------ forward TN

TN_CASES = [
    ("de", "23", "dreiundzwanzig"),
    ("de", "100", "einhundert"),
    ("de", "1020", "eintausendzwanzig"),
    ("de", "11,2006", "elf komma zwei null null sechs"),
    ("de", "€11,04", "elf euro und vier cent"),
    ("de", "3. januar", "dritter januar"),
    ("es", "23", "veintitrés"),
    ("es", "101", "ciento uno"),
    ("es", "1001", "mil uno"),
    ("es", "$12,05", "doce dólares y cinco céntimos"),
    ("es", "1,26", "uno coma dos seis"),
    ("ru", "23", "двадцать три"),
    ("ru", "1001", "одна тысяча один"),
    ("ru", "2000", "две тысячи"),
    ("ru", "3,2", "три запятая два"),
    ("ru", "2 руб.", "два рубля"),
]


@pytest.mark.parametrize("lang,src,want", TN_CASES,
                         ids=[f"tn-{l}-{s[:16]}" for l, s, _ in TN_CASES])
def test_tn(lang, src, want):
    from funasr_tpu.text.tn import normalize

    assert normalize(src, lang) == want


@pytest.mark.parametrize("lang,written", [
    ("de", "€11,04"), ("de", "11,2006"), ("es", "$12,05"),
    ("ru", "2 руб."),
])
def test_tn_itn_roundtrip(lang, written):
    from funasr_tpu.text.tn import normalize

    assert inv(normalize(written, lang), lang) == written


@pytest.mark.parametrize("src,want", [
    # the year pass must yield to cardinal phrases continuing past
    # "hundred" (regression: '1900 and 84')
    ("nineteen hundred and eighty four", "1984"),
    ("nineteen hundred fifty", "1950"),
    ("nineteen hundred and fifty dollars", "$1950"),
    ("nineteen hundred", "1900"),
])
def test_en_year_vs_cardinal_boundary(src, want):
    assert inv(src, "en") == want


@pytest.mark.parametrize("src,want", [
    # money outranks date/time (reference classify weights): the year and
    # time pre-passes must not steal spans a currency word follows
    ("nineteen hundred dollars", "$1900"),
    ("nineteen hundred percent", "1900%"),
    ("two fifteen p m", "2:15 p.m."),   # explicit am/pm stays a time
    ("five thirty p m", "5:30 p.m."),
])
def test_en_money_outranks_time_and_year(src, want):
    assert inv(src, "en") == want


def test_en_bare_time_before_currency_not_time():
    # "two fifteen dollars" must not become "2:15 dollars"
    assert ":" not in inv("two fifteen dollars", "en")


def test_whitelist_applies_in_secondary_languages():
    # every reference grammar carries the whitelist tagger with the same
    # (English-abbreviation) table
    assert inv("mister schmidt hat elf kilogramm", "de") \
        == "mr. schmidt hat 11 kg"


TN_MEASURE_CASES = [
    # forward measure (text_normalization/*/taggers/measure.py): unit
    # verbalized, number through the existing cardinal/decimal passes
    ("en", "12 kg", "twelve kilograms"),
    ("en", "1 kg", "one kilogram"),
    ("en", "35 °C", "thirty five degrees celsius"),
    ("en", "100 km/h", "one hundred kilometers per hour"),
    ("zh", "35°C", "三十五摄氏度"),
    ("zh", "3.5千克", "三点五千克"),
    ("de", "11 kg", "elf kilogramm"),
    ("de", "3 h", "drei stunden"),
    ("es", "12 km", "doce kilómetros"),
    ("ru", "2 кг", "два килограмма"),
    ("ru", "21 км", "двадцать один километр"),  # 1-declension
    ("ru", "5 км", "пять километров"),
]


@pytest.mark.parametrize("lang,src,want", TN_MEASURE_CASES,
                         ids=[f"tnm-{l}-{s}" for l, s, _ in TN_MEASURE_CASES])
def test_tn_measure(lang, src, want):
    from funasr_tpu.text.tn import normalize

    assert normalize(src, lang) == want


@pytest.mark.parametrize("lang,written", [
    ("en", "12 kg"), ("en", "35 °C"), ("de", "11 kg"), ("ru", "5 км"),
])
def test_tn_measure_itn_roundtrip(lang, written):
    from funasr_tpu.text.tn import normalize

    assert inv(normalize(written, lang), lang) == written


TN_CLASS_CASES = [
    # --- en (reference en taggers: date, fraction, electronic,
    # telephone, range, roman, serial, abbreviation + time)
    ("en", "2012-01-05", "january fifth twenty twelve"),
    ("en", "jan. 5, 2012", "january fifth twenty twelve"),
    ("en", "in 1984", "in nineteen eighty four"),
    ("en", "the 1990s", "the nineteen nineties"),
    ("en", "mid-1990s", "mid nineteen nineties"),
    ("en", "23 4/5", "twenty three and four fifths"),
    ("en", "1/2", "one half"),
    ("en", "3/4", "three quarters"),
    ("en", "123-456-7890",
     "one two three four five six seven eight nine zero"),
    ("en", "cdf1@abc.edu", "c d f one at a b c dot e d u"),
    ("en", "pages 2-14", "pages two to fourteen"),
    ("en", "~5", "approximately five"),
    ("en", "2+3", "two plus three"),
    ("en", "chapter IV", "chapter four"),
    ("en", "part XL", "part forty"),         # cue word licenses L/C/D/M
    ("en", "II and XIV", "two and fourteen"),  # safe {I,V,X} alphabet
    # L/C/D/M caps without a cue are NOT roman numbers; they spell as
    # abbreviations (letter-read), never as cardinals
    ("en", "Washington DC is cold", "Washington d c is cold"),
    ("en", "size XL shirt", "size x l shirt"),
    ("en", "model C24", "model c twenty four"),
    ("en", "the FBI and the TV", "the f b i and the t v"),
    ("en", "THIS IS GREAT", "THIS IS GREAT"),  # caps words pass through
    ("en", "made in the USA", "made in the u s a"),
    ("en", "the NATO summit", "the NATO summit"),  # word-acronym stays
    ("en", "at 12:30", "at twelve thirty"),
    ("en", "at 9:05", "at nine oh five"),
    # --- de (reference de taggers: date, fraction, electronic,
    # telephone, time)
    ("de", "am 05.01.2012", "am fünfter januar zweitausendzwölf"),
    ("de", "im jahr 1984", "im jahr neunzehnhundertvierundachtzig"),
    ("de", "3/4", "drei viertel"),
    ("de", "info@beispiel.de",
     "i n f o at b e i s p i e l punkt d e"),
    ("de", "um 12:30", "um zwölf uhr dreißig"),
    # --- es
    ("es", "el 05/01/2012", "el cinco de enero de dos mil doce"),
    ("es", "3/4", "tres cuartos"),
    ("es", "juan@correo.es",
     "j u a n arroba c o r r e o punto e s"),
    ("es", "a las 12:30", "a las doce treinta"),
    # --- ru (reference ru dir has no fraction tagger)
    ("ru", "05.01.2012", "пятое января две тысячи двенадцатого года"),
    ("ru", "ivan@mail.ru", "i v a n собака m a i l точка r u"),
    ("ru", "в 12:30", "в двенадцать тридцать"),
]


@pytest.mark.parametrize("lang,src,want", TN_CLASS_CASES,
                         ids=[f"tnc-{l}-{s}" for l, s, _ in TN_CLASS_CASES])
def test_tn_semiotic_classes(lang, src, want):
    from funasr_tpu.text.tn import normalize

    assert normalize(src, lang) == want


@pytest.mark.parametrize("lang,written,spoken_lang", [
    # spoken form produced by TN converts back to the written form by ITN
    ("en", "2:30", "en"),
    ("en", "3.14", "en"),
])
def test_tn_class_itn_roundtrip(lang, written, spoken_lang):
    from funasr_tpu.text.itn import inverse_normalize
    from funasr_tpu.text.tn import normalize

    spoken = normalize(written, lang)
    assert inverse_normalize(spoken, spoken_lang) == written


@pytest.mark.parametrize("src", [
    "see chapter iv for details",   # lowercase numerals stay words
    "section mix",
    "OH MY GOD", "WHY NOT",         # Y-vowel caps words pass through
])
def test_en_tn_class_guards_no_false_positive(src):
    from funasr_tpu.text.tn import normalize

    assert normalize(src, "en") == src


def test_kws_det_raises_on_absent_keyword():
    from funasr_tpu.metrics.kws_det import compute_det

    rows = [("u1", {"x": 0.4}, "没有关键词", 2.0)]
    with pytest.raises(ValueError, match="never occurs"):
        compute_det(rows, ["x"])


def test_tokenize_field_from_start(tmp_path):
    from funasr_tpu.bin.tokenize_text import field2slice

    assert field2slice("-3") == slice(None, 3)
    with pytest.raises(SystemExit):
        field2slice("a-b")
