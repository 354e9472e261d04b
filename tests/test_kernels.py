"""Unit tests for the pure kernels (no Spark).

Golden parity with the reference:
- pre_tokenize: the committed YAML goldens from the reference test suite
  (tests/goldens/pretokenize/, copied verbatim from
  ref tests/test_models/test_tsl_pre_tokenize_*.yml) — 6 fixture strings x
  12 option combos, byte-identical token lists.
- merge_single_result: jittered 3x3 grid golden
  (ref tests/test_models.py:379-435).
- trie: insert/search/decompose/freq semantics
  (ref tests/test_trie.py behaviors).
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest
import yaml

from ocr_translate_spark.kernels.merge import merge_single_result
from ocr_translate_spark.kernels.pretokenize import pre_tokenize_options
from ocr_translate_spark.kernels.trie import Trie

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens" / "pretokenize"


# ---------------------------------------------------------------- trie

def make_trie(words=("app", "apple", "pie"), freqs=None) -> Trie:
    trie = Trie()
    for i, w in enumerate(words):
        trie.insert(w, 0.0 if freqs is None else freqs[i])
    return trie


def test_trie_search_strict_and_loose():
    trie = make_trie()
    assert trie.search("apple", strict=True)
    assert not trie.search("appl", strict=True)
    assert not trie.search("apple1", strict=True)  # '1' not in charset
    assert trie.search("apple1", strict=False)  # unknown chars skipped
    assert "apple" in trie and "appl" not in trie


def test_trie_freq():
    trie = make_trie(freqs=[1.0, 2.0, 3.0])
    assert trie.get_freq("apple") == 2.0
    assert trie.get_freq("appl") == 0.0
    assert trie.get_freq("zzz") == 0.0


def test_trie_decompose_golden():
    # ref trie.py:156 example semantics
    trie = Trie()
    for w in ("this", "is", "spar", "ta", "sparta"):
        trie.insert(w)
    got = trie.decompose("thisissparta", min_length=2)
    assert got == [["this", "is", "spar", "ta"], ["this", "is", "sparta"]]


def test_trie_decompose_short_word():
    trie = make_trie()
    assert trie.decompose("ab", min_length=3) == [["ab"]]


def test_trie_autocomplete_ranked():
    trie = make_trie(words=("app", "apple", "apply"), freqs=[1.0, 3.0, 2.0])
    assert trie.autocomplete("app") == ["apple", "apply", "app"]
    assert trie.autocomplete("xyz") == []


def test_trie_substitutions_deletions_insertions():
    trie = make_trie(words=("cat", "bat", "cut", "at", "cats"))
    subs = trie.get_all_substitutions("cat")
    assert set(subs) >= {"bat", "cut"}
    assert "cat" not in subs
    assert "at" in trie.get_all_deletions("cat")
    assert "cats" in trie.get_all_insertions("cat")


def test_trie_autocorrect_bayes_prefers_frequent():
    trie = make_trie(words=("cat", "bat"), freqs=[5.0, 1.0])
    res = trie.autocorrect_bayes("cet", max_num=1)
    assert res == ["cat"]  # 'bat' is 2 edits away, out of budget
    res2 = trie.autocorrect_bayes("cet", max_num=2)
    assert res2[0] == "cat" and "bat" in res2


# ------------------------------------------------------- pre_tokenize

# the 12 option combos of the reference golden matrix
# (ref tests/test_models.py:441-454)
GOLDEN_OPTIONS = [
    {},
    {"break_newlines": True},
    {"break_newlines": "True"},
    {"break_newlines": False},
    {"break_chars": "?.!"},
    {"ignore_chars": "?.!"},
    {"break_newlines": False, "break_chars": "?.!"},
    {"break_newlines": False, "ignore_chars": "?.!"},
    {"restore_missing_spaces": True},
    {"restore_missing_spaces": "True"},
    {"restore_dash_newlines": True},
    {"restore_dash_newlines": "True"},
]


@pytest.mark.parametrize("golden_file", sorted(GOLDEN_DIR.glob("*.yml")), ids=lambda p: p.stem)
def test_pre_tokenize_golden_matrix(golden_file):
    data = yaml.safe_load(golden_file.read_text())
    cases = data["res"]
    assert len(cases) == len(GOLDEN_OPTIONS)
    for case in cases:
        got = pre_tokenize_options(case["string"], case["options"], trie=None)
        assert got == case["tokens"], (case["string"], case["options"])


@pytest.mark.parametrize("extra", ["$", "$%n", "n$", "n$$"])
def test_pre_tokenize_allowed_start_end(extra):
    # ref tests/test_models.py:467-479
    allowed = "a-zA-Z0-9\\-\\.\\,\\;\\?\\! "
    res = pre_tokenize_options(extra + " apple", {"allowed_start_end": allowed})
    assert res[0].strip() == "apple"
    res = pre_tokenize_options("apple " + extra, {"allowed_start_end": allowed})
    assert res[0].strip() == "apple"


def test_pre_tokenize_restore_spaces_golden():
    # ref tests/test_models.py:481-489
    trie = make_trie()
    res = pre_tokenize_options("applepie", {"restore_missing_spaces": True}, trie=trie)
    assert res == ["apple pie"]


def test_pre_tokenize_empty_returns_space():
    assert pre_tokenize_options("", {}) == [" "]


# ------------------------------------------------- reading-order merge

def _grid_fixture():
    """Jittered 3x3 grids inside 3 merged blocks
    (ref tests/test_models.py:401-424, seed 0)."""
    merged = [
        ("m0", (0.0, 100.0, 30.0, 130.0)),
        ("m1", (100.0, 0.0, 130.0, 30.0)),
        ("m2", (50.0, 50.0, 80.0, 80.0)),
    ]
    w = h = 10
    s = 2
    rng = np.random.RandomState(0)
    texts, lbrt, mids = [], [], []
    for mid, (ml, mb, _, _) in merged:
        for i in range(9):
            errx = rng.rand(2) * 2
            erry = rng.rand(2) * 2
            l = i % 3 * (w + s) + ml + errx[0]
            b = i // 3 * (w + s) + mb + errx[1]
            texts.append(str(i + 1))
            lbrt.append((l, b, l + w + erry[0], b + h + erry[1]))
            mids.append(mid)
    return texts, lbrt, mids, merged


@pytest.mark.parametrize(
    "lang,expected",
    [("en", "1 2 3 4 5 6 7 8 9"), ("ja", "369258147")],
)
def test_merge_single_result_grid(lang, expected):
    texts, lbrt, mids, merged = _grid_fixture()
    res = merge_single_result(lang, texts, lbrt, mids, merged)
    assert res == [expected] * 3


def test_merge_wide_vertical_lang_reads_horizontal():
    # width > height * 1.3 => horizontal even for vertical-capable langs
    merged = [("m", (0.0, 0.0, 100.0, 10.0))]
    texts = ["a", "b"]
    lbrt = [(0.0, 0.0, 10.0, 10.0), (20.0, 0.0, 30.0, 10.0)]
    res = merge_single_result("ja", texts, lbrt, ["m", "m"], merged)
    assert res == ["ab"]  # no-space join, left-to-right


# ---------------------------------------------------------------- html skip-scan

def test_skip_scan_lowering_is_length_preserving():
    """Regression: the SKIP_CONTENT_TAGS scan must lower the buffer with a
    length-preserving map.  str.lower() expands U+0130 'İ' to 2 code
    points ('i' + combining dot), so indexes found in the lowered copy
    were shifted offsets into the original buffer — a page with 'İ'
    before a <script> close tag resumed parsing mid-tag, emitting a
    stray '>tail' block (and with more shift, leaking script content).
    """
    from ocr_translate_spark.kernels.html_extract import extract_html

    html = (
        "<article><p>İİİİ İstanbul paragraph with enough content chars here.</p>"
        "<script>var skipped = '<p>not content</p>';</script>"
        "<p>tail paragraph also has enough content characters here.</p></article>"
    ).encode()
    res = extract_html(html)
    assert "not content" not in res.text
    assert "skipped" not in res.text
    assert ">tail" not in res.text
    assert "tail paragraph also has enough content characters here." in res.text
    assert res.text.startswith("İİİİ İstanbul")


def test_skip_scan_shift_does_not_leak_script_content():
    """With enough pre-<script> 'İ's the old bug leaked script source into
    extracted text; pin the fixed behavior on a heavy case too."""
    from ocr_translate_spark.kernels.html_extract import extract_html

    html = (
        "<div><p>" + "İ" * 40 + " leading paragraph with plenty of content here.</p>"
        "<style>.x{color:red}</style>"
        "<script>function leak(){return 'SECRET_SCRIPT_BODY';}</script>"
        "<p>closing paragraph with plenty of ordinary content here too.</p></div>"
    ).encode()
    res = extract_html(html)
    assert "SECRET_SCRIPT_BODY" not in res.text
    assert "color:red" not in res.text
    assert "closing paragraph with plenty of ordinary content here too." in res.text
