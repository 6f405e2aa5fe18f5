"""Label codec + num2words unit tests (reference data/labels.py semantics)."""

import json

import pytest

from deepspeech_tpu.text import Labels, num2words

EN_LABELS = "_'ABCDEFGHIJKLMNOPQRSTUVWXYZ2 "


@pytest.fixture
def labels():
    return Labels(EN_LABELS)


def test_alphabet_indices(labels):
    assert labels.blank_index == 0
    assert labels.double_index == 28
    assert labels.space_index == 29


def test_parse_simple(labels):
    ids = labels.parse("hi there")
    assert labels.render_transcript(ids) == "HI THERE"


def test_parse_double_char_escape(labels):
    # repeated chars encode as the '2' escape (reference data/labels.py:50-56)
    ids = labels.parse("hello")
    assert labels.render_transcript(ids) == "HEL2O"
    assert ids[labels.render_transcript(ids).index("2")] == 28


def test_parse_clean_prefix(labels):
    ids = labels.parse("!clean:HEL2O")
    assert ids == [labels.labels_map[c] for c in "HEL2O"]


def test_parse_strips_trailing_2_from_letter_runs(labels):
    # re.sub(r'([^\W\d]+)2', r'\1', text): "soo2n" -> "soon" -> SO2N
    assert labels.render_transcript(labels.parse("soo2n")) == "SO2N"


def test_parse_star_plus_become_spaces(labels):
    assert labels.render_transcript(labels.parse("a*b+c")) == "A B C"


def test_roman_numerals(labels):
    # II..XXXX -> numbers -> words (English here)
    assert labels.render_transcript(labels.parse("chapter II")) == "CHAPTER TWO"
    assert labels.render_transcript(labels.parse("X")) == "TEN"


def test_digits_expand_to_words(labels):
    assert labels.render_transcript(labels.parse("42")) == "FORTY TWO"
    # double-char escape kicks in on THREE -> THRE2
    out = labels.render_transcript(labels.parse("123"))
    assert out == "ONE HUNDRED TWENTY THRE2"


def test_empty_text(labels):
    assert labels.parse("") == []


def test_out_of_alphabet_dropped(labels):
    # '#' splits the word-regex tokens, so two words remain
    assert labels.render_transcript(labels.parse("a#b")) == "A B"


def test_percent_en(labels):
    assert labels.render_transcript(labels.parse("5%")) == "FIVE PERCENT"


def test_shipped_labels_json_matches_reference():
    with open("labels.json") as f:
        assert "".join(json.load(f)) == EN_LABELS


def test_num2words_en_basic():
    assert num2words(0, lang="en") == "zero"
    assert num2words(7, lang="en") == "seven"
    assert num2words(15, lang="en") == "fifteen"
    assert num2words(21, lang="en") == "twenty one"
    assert num2words(105, lang="en") == "one hundred five"
    assert num2words(1000, lang="en") == "one thousand"
    assert num2words(1234567, lang="en") == \
        "one million two hundred thirty four thousand five hundred sixty seven"
    assert num2words(-3, lang="en") == "minus three"


def test_num2words_en_ordinal():
    assert num2words(1, ordinal=True, lang="en") == "first"
    assert num2words(2, ordinal=True, lang="en") == "second"
    assert num2words(3, ordinal=True, lang="en") == "third"
    assert num2words(12, ordinal=True, lang="en") == "twelfth"
    assert num2words(20, ordinal=True, lang="en") == "twentieth"
    assert num2words(21, ordinal=True, lang="en") == "twenty first"
    assert num2words(100, ordinal=True, lang="en") == "one hundredth"


def test_num2words_ru_basic():
    assert num2words(0) == "ноль"
    assert num2words(1) == "один"
    assert num2words(2) == "два"
    assert num2words(11) == "одиннадцать"
    assert num2words(21) == "двадцать один"
    assert num2words(100) == "сто"
    assert num2words(123) == "сто двадцать три"
    assert num2words(1000) == "одна тысяча"
    assert num2words(2000) == "две тысячи"
    assert num2words(5000) == "пять тысяч"
    assert num2words(21000) == "двадцать одна тысяча"
    assert num2words(1000000) == "один миллион"
    assert num2words(2000000) == "два миллиона"
    assert num2words(5000000) == "пять миллионов"


def test_num2words_ru_ordinal():
    assert num2words(1, ordinal=True) == "первый"
    assert num2words(2, ordinal=True) == "второй"
    assert num2words(21, ordinal=True) == "двадцать первый"
    assert num2words(30, ordinal=True) == "тридцатый"
    assert num2words(40, ordinal=True) == "сороковой"


def test_ordinal_suffix_tokens():
    ru = Labels("_абвгдежзиклмнопрстуфхцчшщьыэюяё2 ".upper() + "", num_lang="ru")
    # NB: the reference regex (data/labels.py:23) tokenizes "2-й" as ["2","й"]
    # (the '-?\\d+' alternative wins), so the ordinal+suffix branch at
    # data/labels.py:31-34 never fires; we reproduce the actual behavior.
    words = ru.find_words("2-й", clean=False)
    assert words == ["два", "й"]


def test_num_lang_autodetect():
    assert Labels(EN_LABELS).num_lang == "en"
    assert Labels("_АБВ2 ").num_lang == "ru"
