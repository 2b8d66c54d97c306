"""ITN rules + monotonic aligner tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.text.itn import inverse_normalize
from funasr_tpu.models.monotonic_aligner.model import MonotonicAligner


@pytest.mark.parametrize("spoken,written", [
    ("三千五百二十一", "3521"),
    ("一万二千三百四十五", "12345"),
    ("两百零五", "205"),
    ("百分之五十", "50%"),
    ("三点一四", "3.14"),
    ("负十五", "-15"),
    ("十五个人", "15个人"),
    ("一个人", "一个人"),  # single digits stay spoken
    # semiotic classes beyond cardinals (reference
    # inverse_text_normalization/zh/taggers/)
    ("千分之五", "5‰"),
    ("负百分之三点五", "-3.5%"),
    ("三分之二", "2/3"),
    ("五分之负一", "-1/5"),
    ("一九九八年", "1998年"),
    ("二零二四年三月五号", "2024年3月5号"),
    ("十二月二十五日", "12月25日"),
    ("三点半", "3:30"),
    ("八点钟", "8:00"),
    ("十二点二十五分", "12:25"),
    ("九点零五分三十秒", "9:05:30"),
    ("三点一四", "3.14"),  # decimal survives the time rules
    ("三块五", "3.5元"),
    ("十块三毛", "10.3元"),
    ("三块五毛二", "3.52元"),
    ("第三十五", "第35"),
    ("第三", "第3"),
    ("第三点五名", "第3.5名"),
    ("负三点五", "-3.5"),
])
def test_itn_zh(spoken, written):
    assert inverse_normalize(spoken, "zh") == written


@pytest.mark.parametrize("spoken,written", [
    ("twenty one dollars", "$21"),
    ("three hundred and five", "305"),
    ("one thousand two hundred", "1200"),
    ("fifty percent done", "50% done"),
    ("one of them", "one of them"),  # lone small number stays
    # semiotic classes beyond cardinals (reference
    # inverse_text_normalization/en/taggers/)
    ("three point one four", "3.14"),
    ("minus three point five percent", "-3.5%"),
    ("five percent", "5%"),
    ("twenty-five dollars", "$25"),
    ("five dollars and twenty cents", "$5.20"),
    ("two hundred euros", "€200"),
    ("the twenty first of may", "the 21st of may"),
    ("one hundredth", "100th"),
    ("twentieth century", "20th century"),
    ("first of all", "first of all"),  # lone small ordinal stays
    ("negative forty", "-40"),
    # review regressions: connectors preserved, idiom hyphens kept,
    # ordinal after a bridging 'and', decimal-head money
    ("rock and roll", "rock and roll"),
    ("a fifty-fifty chance", "a fifty-fifty chance"),
    ("one-two punch", "one-two punch"),
    ("forty-second street", "42nd street"),
    ("two thousand and tenth", "2010th"),
    ("three hundred and twentieth", "320th"),
    ("two point five dollars and ten cents", "$2.5 and ten cents"),
])
def test_itn_en(spoken, written):
    assert inverse_normalize(spoken, "en") == written


def test_itn_connectors_preserved_other_langs():
    assert inverse_normalize("perros y gatos", "es") == "perros y gatos"
    assert inverse_normalize("pain et beurre", "fr") == "pain et beurre"


def test_monotonic_aligner(rng):
    model = MonotonicAligner(
        input_size=24,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=5, dropout_rate=0.0),
        predictor_conf=dict(idim=16, upsample_times=3, dropout=0.0),
    )
    B, T = 2, 30
    speech = jnp.asarray(rng.standard_normal((B, T, 24)), jnp.float32)
    slens = jnp.array([T, T - 8])
    text = jnp.zeros((B, 6), jnp.int32)
    tlens = jnp.array([6, 4])
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        speech, slens, text, tlens)
    loss, stats = model.apply(params, speech, slens, text, tlens,
                              deterministic=True)
    assert np.isfinite(float(loss))

    us_alphas, us_peaks = model.apply(params, speech, slens,
                                      jnp.array([6, 4]), method=model.align)
    # forced alignment: exactly token_num fires (up to the eps boundary)
    counts = np.asarray(us_peaks).sum(-1)
    np.testing.assert_array_equal(counts, [6, 4])


# ------------------------------------------------- multi-language ITN
from funasr_tpu.text.itn import inverse_normalize as _inv


def test_itn_japanese():
    assert _inv("三千五百二十一", "ja") == "3521"
    assert _inv("一億二千万", "ja") == "120000000"


def test_itn_korean():
    assert _inv("삼천오백이십일", "ko") == "3521"
    assert _inv("오십 퍼센트", "ko") == "50%"


def test_itn_spanish():
    assert _inv("tengo treinta y cinco años", "es") == "tengo 35 años"
    assert _inv("dos mil veintitrés", "es") == "2023"


def test_itn_french():
    assert _inv("il y a vingt cinq chats", "fr") == "il y a 25 chats"
    assert _inv("deux mille vingt trois", "fr") == "2023"


def test_itn_german():
    assert _inv("einundzwanzig", "de") == "21"
    assert _inv("dreihundertfünfundzwanzig", "de") == "325"
    assert _inv("zweitausenddreiundzwanzig", "de") == "2023"
    # ordinary words untouched
    assert _inv("hallo welt", "de") == "hallo welt"


def test_itn_portuguese():
    assert _inv("tenho trinta e cinco anos", "pt") == "tenho 35 anos"
    assert _inv("dois mil e vinte e três", "pt") == "2023"
    assert _inv("cinquenta porcento", "pt") == "50%"


def test_itn_russian():
    assert _inv("двадцать три", "ru") == "23"
    assert _inv("две тысячи двадцать три", "ru") == "2023"
    assert _inv("пятьдесят процентов", "ru") == "50%"


def test_itn_indonesian():
    assert _inv("dua puluh tiga", "id") == "23"
    assert _inv("seratus dua puluh lima", "id") == "125"
    assert _inv("dua ribu dua puluh tiga", "id") == "2023"
    assert _inv("lima puluh persen", "id") == "50%"
    assert _inv("dua belas", "id") == "12"


def test_itn_vietnamese():
    assert _inv("hai mươi ba", "vi") == "23"
    assert _inv("một trăm lẻ năm", "vi") == "105"
    assert _inv("hai nghìn không trăm hai mươi ba", "vi") == "2023"
    assert _inv("năm mươi phần trăm", "vi") == "50%"
    # ordinary words untouched
    assert _inv("xin chào", "vi") == "xin chào"


def test_itn_tagalog():
    assert _inv("dalawampu at tatlo", "tl") == "23"
    assert _inv("dalawang daan", "tl") == "200"
    assert _inv("limampu porsyento", "tl") == "50%"


def test_itn_unknown_language_passthrough():
    assert _inv("habari ya dunia arobaini", "sw") == "habari ya dunia arobaini"


# ----------------------------------------------------- forward TN (zh/en)
from funasr_tpu.text.tn import normalize as _tn
from funasr_tpu.text.itn import inverse_normalize as _itn_rt


def test_tn_zh_cardinals():
    assert _tn("3521", "zh") == "三千五百二十一"
    assert _tn("10", "zh") == "十"
    assert _tn("105", "zh") == "一百零五"
    assert _tn("120000000", "zh") == "一亿二千万"
    assert _tn("45%", "zh") == "百分之四十五"
    assert _tn("3.14", "zh") == "三点一四"
    assert _tn("-7", "zh") == "负七"


def test_tn_en_cardinals():
    assert _tn("21", "en") == "twenty one"
    assert _tn("325", "en") == "three hundred twenty five"
    # year-range numbers read as YEARS only under a date cue (preceding
    # preposition/month or sentence-final) — the reference disambiguates
    # date-vs-cardinal with weighted FSTs; quantity contexts stay cardinal
    assert _tn("2023", "en") == "twenty twenty three"
    assert _tn("in 2023", "en") == "in twenty twenty three"
    assert _tn("2023 attendees", "en") == \
        "two thousand twenty three attendees"
    assert _tn("room 1984 is open", "en") == \
        "room one thousand nine hundred eighty four is open"
    assert _tn("4127", "en") == "four thousand one hundred twenty seven"
    assert _tn("50%", "en") == "fifty percent"
    assert _tn("3.14", "en") == "three point one four"


@pytest.mark.parametrize("written,lang,spoken,roundtrip", [
    ("在12:25开会", "zh", "在十二点二十五分开会", True),
    ("8:00", "zh", "八点钟", True),
    ("9:05:30", "zh", "九点零五分三十秒", True),
    ("9:00:30", "zh", "九点零分三十秒", True),
    ("$1.01", "en", "one dollar and one cent", True),
    ("$5.20", "en", "five dollars and twenty cents", True),
    ("the 21st time", "en", "the twenty first time", True),
    # lone small ordinals stay spoken on the ITN side by policy
    ("the 12th", "en", "the twelfth", False),
    ("the 30th", "en", "the thirtieth", True),
    ("$25", "en", "twenty five dollars", True),
    ("$5.20", "en", "five dollars and twenty cents", True),
])
def test_tn_classes(written, lang, spoken, roundtrip):
    from funasr_tpu.text.tn import normalize as _tn2
    assert _tn2(written, lang) == spoken
    if roundtrip:  # the ITN direction recovers the written form exactly
        assert _itn_rt(spoken, lang) == written


def test_tn_itn_roundtrip():
    # single chars stay spoken by design (一个/八点 would break)
    for n in ("42", "305", "3521", "40005"):
        assert _itn_rt(_tn(n, "zh"), "zh") == n
