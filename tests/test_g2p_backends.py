"""Dispatch parity for third-party g2p backends (reference
``text/phoneme_tokenizer.py:387-519``): every reference ``g2p_type`` is
constructible, the third-party package is imported lazily, and ImportError
fires only when the package is genuinely absent. Real packages aren't in
this image, so fakes are injected into sys.modules."""

import sys
import types

import pytest

from seq2seq_vc_tpu.text.g2p_backends import (
    BACKEND_FACTORIES,
    build_g2p_backend,
)
from seq2seq_vc_tpu.text.tokenizers import PhonemeTokenizer

REFERENCE_G2P_CHOICES = [
    # g2p_choices from /root/reference/seq2seq_vc/text/phoneme_tokenizer.py:14
    "pyopenjtalk", "pyopenjtalk_kana", "pyopenjtalk_accent",
    "pyopenjtalk_accent_with_pause", "pyopenjtalk_prosody",
    "pypinyin_g2p", "pypinyin_g2p_phone",
    "espeak_ng_arabic", "espeak_ng_german", "espeak_ng_french",
    "espeak_ng_spanish", "espeak_ng_russian", "espeak_ng_greek",
    "espeak_ng_finnish", "espeak_ng_hungarian", "espeak_ng_dutch",
    "espeak_ng_english_us_vits", "espeak_ng_hindi",
    "g2pk", "g2pk_no_space", "korean_jaso", "korean_jaso_no_space",
    "g2p_is",
]


def test_registry_covers_reference_choices():
    missing = [c for c in REFERENCE_G2P_CHOICES if c not in BACKEND_FACTORIES]
    assert not missing, f"unmapped reference g2p_type values: {missing}"


def test_absent_package_raises_import_error_naming_it():
    assert "pyopenjtalk" not in sys.modules
    with pytest.raises(ImportError, match="pyopenjtalk"):
        build_g2p_backend("pyopenjtalk")
    with pytest.raises(NotImplementedError):
        build_g2p_backend("not_a_backend")


@pytest.fixture
def fake_pyopenjtalk(monkeypatch):
    labels = [
        "xx^xx-sil+k=o/A:xx/F:xx",
        "sil^k-k+o=o/A:0+1+2/B:x/F:2_1/G:x",
        "k^o-o+sil=x/A:1+2+1/B:x/F:2_2/G:x",
        "o^sil-sil+x=x!0_/A:x",
    ]
    mod = types.ModuleType("pyopenjtalk")
    mod.g2p = lambda text, kana=False: "コン" if kana else "k o N"
    mod.run_frontend = lambda text: (None, labels)  # old 2-tuple API
    mod.make_label = lambda njd: labels
    monkeypatch.setitem(sys.modules, "pyopenjtalk", mod)
    return mod, labels


def test_pyopenjtalk_modes(fake_pyopenjtalk):
    assert build_g2p_backend("pyopenjtalk")("x") == ["k", "o", "N"]
    assert build_g2p_backend("pyopenjtalk_kana")("x") == ["コ", "ン"]
    # accent: [phoneme, mora_position, accent_type] per matching label
    assert build_g2p_backend("pyopenjtalk_accent")("x") == [
        "k", "1", "0", "o", "2", "1",
    ]
    # prosody: ^ BOS, ] pitch-fall after k (a1=0, a2_next=a2+1, a2!=f1),
    # $ statement EOS
    assert build_g2p_backend("pyopenjtalk_prosody")("x") == [
        "^", "k", "]", "o", "$",
    ]


def test_pyopenjtalk_accent_with_pause(fake_pyopenjtalk, monkeypatch):
    mod, _ = fake_pyopenjtalk
    monkeypatch.setattr(
        mod, "run_frontend",
        lambda text: (None, [
            "x^sil-pau+k=o/A:xx",
            "sil^k-k+o=o/A:-3+1+2/B:x/F:2_1/G:x",
        ]),
    )
    assert build_g2p_backend("pyopenjtalk_accent_with_pause")("x") == [
        "pau", "k", "1", "-3",
    ]


def test_pyopenjtalk_new_frontend_api(fake_pyopenjtalk, monkeypatch):
    """New pyopenjtalk: run_frontend returns njd features; labels come
    from make_label."""
    mod, labels = fake_pyopenjtalk
    monkeypatch.setattr(mod, "run_frontend", lambda text: [{"njd": 1}] * 4)
    assert build_g2p_backend("pyopenjtalk_prosody")("x") == [
        "^", "k", "]", "o", "$",
    ]


def test_pypinyin(monkeypatch):
    mod = types.ModuleType("pypinyin")

    class Style:
        TONE3 = "tone3"

    mod.Style = Style
    mod.pinyin = lambda text, style: [["ni3"], ["hao3"]]
    utils = types.ModuleType("pypinyin.style._utils")
    utils.get_initials = lambda s, strict: s[0]
    utils.get_finals = lambda s, strict: s[1:]
    style_pkg = types.ModuleType("pypinyin.style")
    monkeypatch.setitem(sys.modules, "pypinyin", mod)
    monkeypatch.setitem(sys.modules, "pypinyin.style", style_pkg)
    monkeypatch.setitem(sys.modules, "pypinyin.style._utils", utils)

    assert build_g2p_backend("pypinyin_g2p")("x") == ["ni3", "hao3"]
    # phone split: initial + final(+tone); bare digits dropped
    assert build_g2p_backend("pypinyin_g2p_phone")("x") == [
        "n", "i3", "h", "ao3",
    ]


def test_jaso(monkeypatch):
    mod = types.ModuleType("jamo")
    # one lead + one vowel + space + invalid char 'Z'
    mod.hangul_to_jamo = lambda text: [chr(0x1100), chr(0x1161), " ", "Z"]
    monkeypatch.setitem(sys.modules, "jamo", mod)
    assert build_g2p_backend("korean_jaso", space_symbol="<sp>")("x") == [
        chr(0x1100), chr(0x1161), "<sp>",
    ]
    assert build_g2p_backend("korean_jaso_no_space")("x") == [
        chr(0x1100), chr(0x1161),
    ]


def test_g2pk(monkeypatch):
    mod = types.ModuleType("g2pk")

    class G2p:
        def __call__(self, text, descriptive, group_vowels, to_syl):
            return "ab c"

    mod.G2p = G2p
    monkeypatch.setitem(sys.modules, "g2pk", mod)
    assert build_g2p_backend("g2pk")("x") == ["a", "b", " ", "c"]
    assert build_g2p_backend("g2pk_no_space")("x") == ["a", "b", "c"]


@pytest.fixture
def fake_phonemizer(monkeypatch):
    calls = {}
    backend_mod = types.ModuleType("phonemizer.backend")

    class FakeEspeak:
        def __init__(self, **kw):
            calls["backend_kwargs"] = kw

        def phonemize(self, texts, separator, strip, njobs):
            calls["separator"] = separator
            calls["strip"] = strip
            return ["h @ l oU" for _ in texts]

    backend_mod.BACKENDS = {"espeak": FakeEspeak}
    sep_mod = types.ModuleType("phonemizer.separator")

    class Separator:
        def __init__(self, word=None, syllable=None, phone=None):
            self.word, self.syllable, self.phone = word, syllable, phone

    sep_mod.Separator = Separator
    pkg = types.ModuleType("phonemizer")
    monkeypatch.setitem(sys.modules, "phonemizer", pkg)
    monkeypatch.setitem(sys.modules, "phonemizer.backend", backend_mod)
    monkeypatch.setitem(sys.modules, "phonemizer.separator", sep_mod)
    return calls


def test_espeak_variants(fake_phonemizer):
    out = build_g2p_backend("espeak_ng_german")("hallo")
    assert out == ["h", "@", "l", "oU"]
    kw = fake_phonemizer["backend_kwargs"]
    assert kw["language"] == "de"
    assert kw["with_stress"] and kw["preserve_punctuation"]

    # the VITS variant splits per-CHARACTER with <space> word separators
    # (reference Phonemizer.__call__, phoneme_tokenizer.py:345-351)
    out = build_g2p_backend("espeak_ng_english_us_vits")("hello")
    assert out == ["h", "<space>", "@", "<space>", "l", "<space>", "o", "U"]
    assert fake_phonemizer["strip"] is True
    assert fake_phonemizer["separator"].word == " "


def test_ice_g2p(monkeypatch):
    mod = types.ModuleType("ice_g2p.transcriber")
    seen = {}

    class Transcriber:
        def __init__(self, **kw):
            seen.update(kw)

        def transcribe(self, text):
            return "a b c"

    mod.Transcriber = Transcriber
    pkg = types.ModuleType("ice_g2p")
    monkeypatch.setitem(sys.modules, "ice_g2p", pkg)
    monkeypatch.setitem(sys.modules, "ice_g2p.transcriber", mod)
    assert build_g2p_backend("g2p_is")("x") == ["a", "b", "c"]
    assert seen["use_dict"] and seen["lang_detect"]


def test_phoneme_tokenizer_routes_to_backends(monkeypatch):
    mod = types.ModuleType("jamo")
    mod.hangul_to_jamo = lambda text: [chr(0x1100), " "]
    monkeypatch.setitem(sys.modules, "jamo", mod)
    tok = PhonemeTokenizer("korean_jaso", space_symbol="<space>")
    assert tok.text2tokens("x") == [chr(0x1100), "<space>"]
    # missing package still raises through the tokenizer
    with pytest.raises(ImportError, match="pypinyin"):
        PhonemeTokenizer("pypinyin_g2p")
