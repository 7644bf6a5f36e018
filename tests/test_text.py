"""Text frontend tests: symbol codec, cleaners, number expansion."""
import pytest

from rtvc_tpu.text import sequence_to_text, symbols, text_to_sequence
from rtvc_tpu.text.cleaners import (
    convert_to_ascii,
    english_cleaners,
    transliteration_cleaners,
)
from rtvc_tpu.text.numbers import normalize_numbers, number_to_words


class TestSymbols:
    def test_inventory_matches_reference_contract(self):
        # ref: synthesizer/utils/symbols.py:8-19 — pad, eos, letters, punct
        assert symbols[0] == "_"
        assert symbols[1] == "~"
        assert "".join(symbols[2:54]) == (
            "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        )
        assert " " in symbols and "?" in symbols
        assert len(symbols) == len(set(symbols))

    def test_roundtrip(self):
        seq = text_to_sequence("Hello, World!", ["basic_cleaners"])
        assert seq[-1] == 1  # EOS
        text = sequence_to_text(seq[:-1])
        assert text == "hello, world!"


class TestNumberToWords:
    @pytest.mark.parametrize(
        "n,expected",
        [
            (0, "zero"),
            (7, "seven"),
            (13, "thirteen"),
            (21, "twenty-one"),
            (100, "one hundred"),
            (101, "one hundred one"),
            (345, "three hundred forty-five"),
            (1000, "one thousand"),
            (1234567, "one million, two hundred thirty-four thousand, "
                      "five hundred sixty-seven"),
        ],
    )
    def test_cardinals_no_andword(self, n, expected):
        assert number_to_words(n, andword="") == expected

    def test_andword(self):
        assert number_to_words(345) == "three hundred and forty-five"

    def test_year_grouping(self):
        assert number_to_words(1999, andword="", zero="oh", group=2) == \
            "nineteen, ninety-nine"
        assert number_to_words(1905, andword="", zero="oh", group=2) == \
            "nineteen, oh five"


class TestNormalizeNumbers:
    @pytest.mark.parametrize(
        "text,expected",
        [
            ("I have 3 cats", "I have three cats"),
            ("the year 1999 was great", "the year nineteen ninety-nine was great"),
            ("in 2000 things changed", "in two thousand things changed"),
            ("2005 was later", "two thousand five was later"),
            ("1900 exactly", "nineteen hundred exactly"),
            ("he won $5", "he won five dollars"),
            ("it cost $2.50 total", "it cost two dollars, fifty cents total"),
            ("£100 reward", "one hundred pounds reward"),
            ("the 3rd time", "the third time"),
            ("the 21st century", "the twenty-first century"),
            ("the 42nd floor", "the forty-second floor"),
            ("3.14 approximately", "three point fourteen approximately"),
            ("1,000,000 stars", "one million stars"),
        ],
    )
    def test_expansion(self, text, expected):
        assert normalize_numbers(text) == expected


class TestCleaners:
    def test_english_cleaners_pipeline(self):
        out = english_cleaners("Dr. Smith bought 2 apples for $3 on Jan. 5th!")
        assert out == ("doctor smith bought two apples for three dollars on "
                       "january fifth!")

    def test_transliteration(self):
        assert convert_to_ascii("café naïve") == "cafe naive"
        assert convert_to_ascii("Größe") == "Grosse"
        assert convert_to_ascii("smörgåsbord") == "smorgasbord"
        assert transliteration_cleaners("ÜBER") == "uber"

    def test_whitespace_collapse(self):
        assert english_cleaners("hello    world\t\nfoo") == "hello world foo"

    def test_unknown_symbols_dropped_in_sequence(self):
        seq = text_to_sequence("abc @#$ def", ["basic_cleaners"])
        text = sequence_to_text(seq[:-1])
        assert text == "abc  def"


class TestFuzz:
    """The frontend must never crash and always emit valid symbol ids —
    whatever bytes a caller throws at it (the reference relies on
    unidecode's robustness; our transliteration needs the same contract)."""

    def test_random_unicode_never_crashes(self):
        import random

        from rtvc_tpu.text import text_to_sequence
        from rtvc_tpu.text.symbols import symbols

        rng = random.Random(0)
        planes = [(0x20, 0x7F), (0xA0, 0x2FF), (0x370, 0x4FF),
                  (0x4E00, 0x4FFF), (0x1F300, 0x1F5FF), (0x2000, 0x206F)]
        for trial in range(200):
            lo, hi = planes[trial % len(planes)]
            s = "".join(chr(rng.randint(lo, hi))
                        for _ in range(rng.randint(0, 40)))
            seq = text_to_sequence(s, ["english_cleaners"])
            assert all(0 <= i < len(symbols) for i in seq), s
            assert seq[-1] == symbols.index("~")  # EOS appended

    def test_pathological_inputs(self):
        from rtvc_tpu.text import text_to_sequence

        cases = [
            "", " ", "\t\n\r", "{" * 50, "}" * 50, "{AH0", "AH0}",
            "{{nested}}", "123" * 200, "Dr. Mr. Mrs. etc. no. 42",
            "\x00\x01\x02", "ﬁﬂﬀ", "ß" * 30, "½¾⅓", "¹²³",
            "e" + "́" * 20,  # combining-mark pileup
            "🎤🔊📢" * 10,
        ]
        for s in cases:
            seq = text_to_sequence(s, ["english_cleaners"])
            assert isinstance(seq, list) and len(seq) >= 1, repr(s)

    def test_numbers_do_not_explode(self):
        from rtvc_tpu.text import text_to_sequence

        seq = text_to_sequence("9" * 60, ["english_cleaners"])
        assert len(seq) < 5000  # bounded expansion, no hang
