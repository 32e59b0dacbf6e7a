"""EnglishTextNormalizer semantics (eval/normalize_en.py) — whisper's
documented normalization conventions, so parity WER measures models, not
normalizers (VERDICT r3 weak #4 / next #4)."""

import pytest

from clearconverse_tpu.eval.normalize_en import (
    EnglishNumberNormalizer, EnglishSpellingNormalizer,
    EnglishTextNormalizer, remove_symbols_and_diacritics)

norm = EnglishTextNormalizer()


# Whisper-documented behavior pairs (Radford et al. 2022 Appendix C).
PAIRS = [
    # contractions + abbreviations + punctuation
    ("Mr. Brown won't go to the theatre.",
     "mister brown will not go to the theater"),
    ("Let's see what she's got!", "let us see what she has got"),
    ("I'm here, you're there, they've left.",
     "i am here you are there they have left"),
    ("Dr. Smith and Mrs. Jones", "doctor smith and missus jones"),
    ("can't won't shouldn't", "can not will not should not"),
    # hesitation fillers
    ("I, um, think, uh, yes", "i think yes"),
    ("Hmm let me see mhm", "let me see"),
    # bracketed/parenthesized asides
    ("[APPLAUSE] He said (quietly) hello", "he said hello"),
    ("<noise> hello", "hello"),
    # numbers
    ("twenty-three", "23"),
    ("one hundred and five", "105"),
    ("two thousand and five", "2005"),
    ("nineteen hundred", "1900"),
    ("a hundred thousand", "100000"),
    ("three point one four", "3.14"),
    ("zero point five", "0.5"),
    ("the twenty-first century", "the 21st century"),
    ("the third time", "the 3rd time"),
    ("fifty percent", "50%"),
    ("two point five percent", "2.5%"),
    ("zero point five percent", "0.5%"),
    # teens are NOT decimal digits: no dangling "3."
    ("three point fifteen", "3 point 15"),
    ("two point five dollars", "$2.5"),
    ("1,000,000 people", "1000000 people"),
    ("seven million dollars", "$7000000"),
    ("ten dollars and fifty cents", "$10.50"),
    ("ninety nine cents", "¢99"),
    ("double seven triple two", "77 222"),
    # spelling
    ("the colour of my neighbour's armour",
     "the color of my neighbor is armor"),
    ("organised behaviour at the centre", "organized behavior at the center"),
    ("she analysed the programme", "she analyzed the program"),
    ("a marvellous travelled counsellor", "a marvelous traveled counselor"),
    # diacritics fold
    ("café naïve résumé", "cafe naive resume"),
    # ordinary text survives
    ("hello world", "hello world"),
    ("the quick brown fox", "the quick brown fox"),
]


@pytest.mark.parametrize("src,want", PAIRS)
def test_normalizer_pairs(src, want):
    assert norm(src) == want


def test_number_words_pass_through_when_not_numbers():
    # words that merely contain number-ish substrings stay words
    assert norm("onetime wonders") == "onetime wonders"
    assert norm("a second opinion") == "a 2nd opinion"  # whisper does this too


def test_number_normalizer_standalone():
    nn = EnglishNumberNormalizer()
    assert nn("sixty six") == "66"
    assert nn("nine hundred ninety nine") == "999"
    assert nn("one billion") == "1000000000"
    assert nn("four score") == "4 score"        # unknown units untouched
    assert nn("zero") == "0"
    # bare "point" is not consumed; the standalone "five" still converts
    # (standalone cardinals always do)
    assert nn("point five") == "point 5"


def test_spelling_normalizer_no_false_positives():
    sp = EnglishSpellingNormalizer()
    for w in ["surprise", "exercise", "promise", "wise", "rise",
              "practice", "advertise", "compromise", "precise"]:
        assert sp(w) == w


def test_spelling_extra_mapping_overrides():
    sp = EnglishSpellingNormalizer(extra={"whisky": "whiskey"})
    assert sp("whisky colour") == "whiskey color"


def test_spelling_ogue_family():
    sp = EnglishSpellingNormalizer()
    assert sp("monologue epilogues dialogue catalogues") == \
        "monolog epilogs dialog catalogs"


def test_spelling_from_file_round_trips_whisper_asset_format(tmp_path):
    """whisper's real asset is normalizers/english.json — a flat
    {"british": "american"} dict; from_file must layer it over the
    curated base so the public file drops in untouched (VERDICT r4 #5)."""
    import json
    sample = {"whisky": "whiskey", "colour": "KOLOR",  # override wins
              "cosier": "cozier"}
    p = tmp_path / "english.json"
    p.write_text(json.dumps(sample), encoding="utf-8")
    sp = EnglishSpellingNormalizer.from_file(str(p))
    assert sp("whisky cosier colour theatre") == "whiskey cozier KOLOR theater"


def test_spelling_from_file_rejects_non_dict(tmp_path):
    p = tmp_path / "english.json"
    p.write_text('["not", "a", "dict"]', encoding="utf-8")
    with pytest.raises(ValueError):
        EnglishSpellingNormalizer.from_file(str(p))


def test_text_normalizer_picks_up_env_asset(tmp_path, monkeypatch):
    import json
    p = tmp_path / "english.json"
    p.write_text(json.dumps({"zorbly": "zorblee"}), encoding="utf-8")
    monkeypatch.setenv("CC_TPU_SPELLING_JSON", str(p))
    assert EnglishTextNormalizer()("Zorbly colour!") == "zorblee color"


def test_text_normalizer_rejects_missing_env_asset(monkeypatch):
    """A SET-but-missing CC_TPU_SPELLING_JSON must fail loudly — silently
    scoring under the curated fallback would pass off the wrong normalizer
    as parity evidence (review r5)."""
    monkeypatch.setenv("CC_TPU_SPELLING_JSON", "/nonexistent/english.jsn")
    with pytest.raises(FileNotFoundError):
        EnglishTextNormalizer()


def test_remove_symbols_keeps_requested():
    assert remove_symbols_and_diacritics("50% off, $3!", keep="%$") == \
        "50% off  $3 "


def test_idempotent():
    for src, want in PAIRS:
        assert norm(norm(src)) == norm(src)
