"""Deep text-normalization goldens, EN + ZH.

Case families mirror the reference's tn/WeTextProcessing/inflect pipelines
(IndexTTS/Export_IndexTTS.py:589-806, VoxCPM text_normalize.py:11-184):
dates, clock times, phone numbers / digit strings, currency with scale
words, percents, fractions, units/measures, temperatures, ranges,
negatives, value-reading Chinese numerals with 万/亿 grouping.
"""
from tts_tpu.frontend.normalize import (
    _int_to_zh,
    normalize_numbers,
    zh_normalize_numbers,
)


def _check(cases, fn):
    for inp, expect in cases.items():
        got = fn(inp)
        assert got == expect, f"{inp!r}: {got!r} != {expect!r}"


# ------------------------------------------------------------------ English

def test_en_dates():
    _check({
        "2024-01-05": "january fifth twenty twenty four",
        "on 2024/1/5 we met": "on january fifth twenty twenty four we met",
        "7/4/1776": "july fourth seventeen seventy six",
    }, normalize_numbers)
    # invalid month/day must NOT produce a month name (falls through to
    # fraction/year reading)
    out = normalize_numbers("99/99/2024 is not a date")
    assert "january" not in out and "2024" not in out


def test_en_times():
    _check({
        "at 3:30": "at three thirty",
        "12:05": "twelve oh five",
        "5:00": "five o'clock",
        "9:15 pm": "nine fifteen p m",
        "6:00 AM": "six a m",
        "1:02:30": "one oh two and thirty seconds",
    }, normalize_numbers)


def test_en_phone_numbers():
    _check({
        "+1-800-555-0199":
            "plus one, eight zero zero, five five five, zero one nine nine",
        "call 555-0199": "call five five five, zero one nine nine",
    }, normalize_numbers)


def test_en_long_digit_strings():
    _check({
        "id 1234567": "id one two three four five six seven",
    }, normalize_numbers)


def test_en_currency():
    _check({
        "$12.50": "twelve dollars fifty cents",
        "$1": "one dollar",
        "$0.01": "zero dollars one cent",
        "$3 million": "three million dollars",
        "$5.2 billion": "five point two billion dollars",
        "€5": "five euros",
        "£1": "one pound",
        "¥100": "one hundred yuans",
    }, normalize_numbers)


def test_en_percent_and_fractions():
    _check({
        "50%": "fifty percent",
        "3.5%": "three point five percent",
        "1/2 cup": "one half cup",
        "3/4 done": "three quarters done",
        "2/5 of them": "two fifths of them",
        "1/8": "one eighth",
    }, normalize_numbers)


def test_en_units_and_degrees():
    _check({
        "5km away": "five kilometers away",
        "1kg of rice": "one kilogram of rice",
        "60mph wind": "sixty miles per hour wind",
        "2.5GHz": "two point five gigahertz",
        "30°C outside": "thirty degrees celsius outside",
        "98.6°F": "ninety eight point six degrees fahrenheit",
        "45° angle": "forty five degrees angle",
    }, normalize_numbers)


def test_en_ranges_negatives_misc():
    _check({
        "5-10 people": "five to ten people",
        "-4 outside": "minus four outside",
        "No. 7 seed": "number seven seed",
        ".5 left": "point five left",
        "1,234,567 views": "one million two hundred thirty four thousand"
                           " five hundred sixty seven views",
    }, normalize_numbers)


def test_en_existing_goldens_still_hold():
    _check({
        "I have 3 cats": "I have three cats",
        "born in 1984": "born in nineteen eighty four",
        "the 3rd of 12": "the third of twelve",
        "50% off $12.50": "fifty percent off twelve dollars fifty cents",
        "pi is 3.14": "pi is three point one four",
    }, normalize_numbers)


# ------------------------------------------------------------------ Chinese

def test_zh_cardinal_value_reading():
    assert _int_to_zh(0) == "零"
    assert _int_to_zh(10) == "十"
    assert _int_to_zh(14) == "十四"
    assert _int_to_zh(110) == "一百一十"
    assert _int_to_zh(105) == "一百零五"
    assert _int_to_zh(1005) == "一千零五"
    assert _int_to_zh(123) == "一百二十三"
    assert _int_to_zh(120034) == "十二万零三十四"
    assert _int_to_zh(200000000) == "二亿"
    assert _int_to_zh(100000001) == "一亿零一"


def test_zh_numbers_in_text():
    _check({
        "我有123个苹果": "我有一百二十三个苹果",
        "第5名": "第五名",
        "3.14是圆周率": "三点一四是圆周率",
    }, zh_normalize_numbers)


def test_zh_dates():
    _check({
        "2024-01-05出发": "二零二四年一月五日出发",
        "1984年出生": "一九八四年出生",
        "3月8日": "三月八日",
    }, zh_normalize_numbers)


def test_zh_times():
    _check({
        "3:30见": "三点三十分见",
        "5:00整": "五点整整",
        "12:05:09": "十二点五分九秒",
    }, zh_normalize_numbers)


def test_zh_phones():
    _check({
        "打13812345678": "打幺三八幺二三四五六七八",
        "热线400-123-4567": "热线四零零幺二三四五六七",
    }, zh_normalize_numbers)


def test_zh_currency():
    _check({
        "¥12.5": "十二点五元",
        "￥100": "一百元",
        "$8": "八美元",
    }, zh_normalize_numbers)


def test_zh_percent_fraction():
    _check({
        "提高50%": "提高百分之五十",
        "上涨3.5%": "上涨百分之三点五",
        "3/4的人": "四分之三的人",
        "千分之3是3‰": "千分之三是千分之三",
    }, zh_normalize_numbers)


def test_zh_temperature_range_negative():
    _check({
        "今天30°C": "今天三十摄氏度",
        "5-10分钟": "五到十分钟",
        "气温 -5度": "气温 负五度",
    }, zh_normalize_numbers)


def test_zh_long_ids_digit_wise():
    """Generic long digit strings read digit-by-digit with 一 (幺 is
    reserved for phone-number patterns, as in tn)."""
    assert zh_normalize_numbers("编号123456789012") == \
        "编号一二三四五六七八九零一二"


def test_zh_no_digits_untouched():
    assert zh_normalize_numbers("你好，世界！") == "你好，世界！"


def test_year_range_not_read_as_phone():
    from tts_tpu.frontend.normalize import normalize_numbers

    out = normalize_numbers("The 1980-1990 era")
    assert out == "The nineteen eighty to nineteen ninety era"
    # adjacent independent 4-digit numbers are not a phone either
    out2 = normalize_numbers("In 1999 2000 people came")
    assert "nine, two" not in out2 and "zero" not in out2


def test_phone_shapes_still_read_as_digits():
    from tts_tpu.frontend.normalize import normalize_numbers

    assert normalize_numbers("call 555-123-4567") == (
        "call five five five, one two three, four five six seven")
    assert normalize_numbers("dial +86 138 1234 5678").startswith("dial plus")
    assert normalize_numbers("(212) 555-0199") == (
        "two one two, five five five, zero one nine nine")
    assert normalize_numbers("call 555-0199") == (
        "call five five five, zero one nine nine")


def test_large_currency_beats_digit_string():
    from tts_tpu.frontend.normalize import normalize_numbers

    out = normalize_numbers("It cost $1234567 total")
    assert "$" not in out
    assert out == ("It cost one million two hundred thirty four thousand"
                   " five hundred sixty seven dollars total")
    # bare long digit strings still read digit-by-digit
    assert normalize_numbers("id 12345678") == (
        "id one two three four five six seven eight")


def test_zh_year_range_not_phone():
    from tts_tpu.frontend.normalize import zh_normalize_numbers

    out = zh_normalize_numbers("1980-1990期间")
    assert out == "一千九百八十到一千九百九十期间"
    # real grouped phone (>=3 groups) still reads 幺-style digits
    assert zh_normalize_numbers("拨打400-123-4567") == "拨打四零零幺二三四五六七"


# ----------------------------------------------------- round-3 edge families

def test_ellipsis_folds_reference_order():
    """The reference applies its char_rep_map as a single-pass ordered
    alternation (Export_IndexTTS.py:593-628, :709-710): ',,,' and '……'
    fold to '…', while '，，，' folds to ',,,' because the single-char
    '，' key precedes it in the map."""
    from tts_tpu.frontend.indextts_text import normalize_text

    assert normalize_text("wait,,, ok") == "wait… ok"
    assert normalize_text("等等……好") == "等等…好"
    assert normalize_text("wait... ok") == "wait… ok"
    assert normalize_text("等等，，，好") == "等等,,,好"


def test_email_routes_to_zh_normalizer():
    from tts_tpu.frontend.indextts_text import match_email, use_chinese

    assert match_email("abc123@qq.com")
    assert not match_email("not an email")
    assert not match_email("a@b")          # needs a dotted tld
    assert use_chinese("abc123@qq.com")    # email-only -> zh route
    assert use_chinese("你好 world")
    assert use_chinese("12345")            # no alpha -> zh route
    assert use_chinese("xuan4 sound")      # pinyin tone -> zh route
    assert not use_chinese("plain english 5 words")


def test_email_verbalized_en():
    from tts_tpu.frontend.normalize import normalize_numbers

    out = normalize_numbers("mail john.doe@example.com today")
    assert out == "mail john dot doe at example dot com today"
    out = normalize_numbers("user42@site.co.uk")
    assert out == "user four two at site dot co dot uk"


def test_url_verbalized_en():
    from tts_tpu.frontend.normalize import normalize_numbers

    assert normalize_numbers("visit www.example.com now") == \
        "visit www dot example dot com now"
    assert normalize_numbers("see https://docs.foo.io/guide/intro") == \
        "see docs dot foo dot io slash guide slash intro"
    assert normalize_numbers("open example.com/a-b") == \
        "open example dot com slash a dash b"


def test_email_verbalized_zh():
    from tts_tpu.frontend.normalize import zh_normalize_numbers

    out = zh_normalize_numbers("发邮件到 ab12@qq.com 吧")
    assert out == "发邮件到 ab 幺二 at qq dot com 吧" or "at qq dot com" in out
