"""Native English G2P tests (text/g2p_native.py).

Covers the reference phn tokenizer surface (seq2seq_vc/text/
phoneme_tokenizer.py:210-231): ARPAbet-with-stress inventory, " " word
separators for g2p_en vs filtered for g2p_en_no_space, number expansion.
"""

import re

import pytest

from seq2seq_vc_tpu.text.g2p_native import (
    ARPABET_VOWELS,
    NativeEnglishG2p,
    letter_to_sound,
    normalize_text,
    number_to_words,
)
from seq2seq_vc_tpu.text.tokenizers import build_tokenizer

_ARPABET = set(
    "AA AE AH AO AW AY B CH D DH EH ER EY F G HH IH IY JH K L M N NG OW OY "
    "P R S SH T TH UH UW V W Y Z ZH".split()
)
_TOKEN_RE = re.compile(r"^([A-Z]{1,2})([0-2]?)$")


def _valid_token(tok):
    m = _TOKEN_RE.match(tok)
    if not m:
        return False
    base, stress = m.groups()
    if base not in _ARPABET:
        return False
    # stress digits only on vowels, mandatory on vowels
    return bool(stress) == (base in ARPABET_VOWELS)


@pytest.fixture(scope="module")
def g2p():
    return NativeEnglishG2p()


def test_lexicon_words(g2p):
    assert g2p.word2phones("the") == ["DH", "AH0"]
    assert g2p.word2phones("water") == ["W", "AO1", "T", "ER0"]
    assert g2p.word2phones("one") == ["W", "AH1", "N"]


def test_regular_lts_words(g2p):
    assert g2p.word2phones("cat") == ["K", "AE1", "T"]
    assert g2p.word2phones("sit") == ["S", "IH1", "T"]
    # magic-e lengthens the vowel
    assert g2p.word2phones("make") == ["M", "EY1", "K"]
    assert g2p.word2phones("ride") == ["R", "AY1", "D"]


def test_digraphs(g2p):
    assert g2p.word2phones("ship")[0] == "SH"
    assert g2p.word2phones("chip")[0] == "CH"
    assert g2p.word2phones("thin")[0] == "TH"
    assert g2p.word2phones("phone")[0] == "F"
    assert g2p.word2phones("knee")[0] != "K"  # silent k


def test_inventory_is_valid_arpabet(g2p):
    text = (
        "The quick brown fox jumps over the lazy dog near 42 xylophones, "
        "weighing 3.5 pounds through rough caution!"
    )
    toks = g2p(text)
    assert toks, "no output"
    for t in toks:
        if t == " ":
            continue
        assert _valid_token(t), f"invalid ARPAbet token {t!r}"


def test_exactly_one_primary_stress_per_word(g2p):
    for word in ["hello", "computer", "synthesis", "voice", "conversion"]:
        phones = g2p.word2phones(word)
        stress1 = [p for p in phones if p.endswith("1")]
        assert len(stress1) >= 1, (word, phones)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(17) == "seventeen"
    assert number_to_words(42) == "forty two"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234) == "one thousand two hundred thirty four"
    assert number_to_words(2000000) == "two million"


def test_normalize_text():
    assert normalize_text("Hello, World!") == ["hello", "world"]
    assert normalize_text("I have 2 cats.") == ["i", "have", "two", "cats"]
    assert normalize_text("3.5 kg") == ["three", "point", "five", "kg"]
    assert normalize_text("1,000 years") == ["one", "thousand", "years"]
    assert normalize_text("it's fine") == ["it's", "fine"]
    assert normalize_text("") == []


def test_word_separator_parity():
    """g2p_en keeps " " between words; g2p_en_no_space filters them
    (ref phoneme_tokenizer.py:220-231)."""
    tok = build_tokenizer("phn", g2p_type="g2p_en")
    toks = tok.text2tokens("two words")
    assert " " in toks
    tok_ns = build_tokenizer("phn", g2p_type="g2p_en_no_space")
    toks_ns = tok_ns.text2tokens("two words")
    assert " " not in toks_ns
    assert [t for t in toks if t != " "] == toks_ns


def test_explicit_native_backend():
    tok = build_tokenizer("phn", g2p_type="english_native")
    toks = tok.text2tokens("speech synthesis")
    assert " " in toks
    assert all(_valid_token(t) or t == " " for t in toks)


def test_deterministic(g2p):
    text = "determinism matters for caching"
    assert g2p(text) == g2p(text)


def test_possessive_fallback(g2p):
    # lexicon word + 's uses the voicing-aware suffix rule
    assert g2p.word2phones("world's") == "W ER1 L D Z".split()


def test_letter_to_sound_never_errors(g2p):
    # fuzz the rule engine over odd but plausible word shapes
    for word in ["zzz", "aeiou", "rhythm", "q", "x", "gnarly", "psyche",
                 "brrr", "ok", "a", "strengths"]:
        phones = letter_to_sound(word)
        assert all(p in _ARPABET for p in phones), (word, phones)


# ------------------------------------------------------------ golden set
def _phoneme_edit_distance(a, b):
    d = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        d[i][0] = i
    for j in range(len(b) + 1):
        d[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            d[i][j] = min(
                d[i - 1][j] + 1, d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[-1][-1]


def test_golden_set_accuracy(g2p):
    """Quantify NativeEnglishG2p against a ~200-word hand-verified ARPAbet
    golden file (tests/fixtures/g2p_golden.txt): this turns the docstring's
    'lower accuracy on rare words' into enforced numbers. Measured at
    commit time: exact(stressless) 0.824, PER 0.048, exact(stressed)
    0.678 with only 7/199 golden words served by the lexicon (the rest
    exercise the rule engine). Floors leave headroom for drift, and ratchet
    up if the rules improve."""
    import os
    import re

    golden_path = os.path.join(
        os.path.dirname(__file__), "fixtures", "g2p_golden.txt"
    )
    strip = lambda ps: [re.sub(r"\d", "", p) for p in ps]  # noqa: E731
    n = exact = exact_stressed = per_num = per_den = 0
    for line in open(golden_path):
        if line.startswith("#") or not line.strip():
            continue
        word, phone_str = line.rstrip("\n").split("\t")
        gold = phone_str.split()
        hyp = g2p.word2phones(word)
        n += 1
        exact += strip(hyp) == strip(gold)
        exact_stressed += hyp == gold
        per_num += _phoneme_edit_distance(strip(hyp), strip(gold))
        per_den += len(gold)
    assert n >= 190
    assert exact / n >= 0.78, f"stressless exact-match {exact / n:.3f}"
    assert per_num / per_den <= 0.07, f"PER {per_num / per_den:.4f}"
    assert exact_stressed / n >= 0.60, f"stressed exact {exact_stressed / n:.3f}"
