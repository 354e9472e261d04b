"""Pure-kernel tests: PDF layout pass edge cases + corpus invariants
(no Spark)."""

from __future__ import annotations

from ocr_translate_spark.corpus import VARIANTS, gen_page, pages_pandas
from ocr_translate_spark.kernels.html_extract import escape_for_html, extract_html
from ocr_translate_spark.kernels.pdf_extract import (
    extract_pdf,
    is_pdf,
    make_pdf,
)


def test_pdf_roundtrip_basic():
    paras = ["first paragraph", "second one", "third"]
    data = make_pdf(paras)
    assert is_pdf(data)
    text, spans, n = extract_pdf(data)
    assert text == "\n".join(paras)
    assert n == 3
    for (s, e), p in zip(spans, paras):
        assert text[s:e] == p


def test_pdf_escaped_characters():
    paras = ["parens (nested) here", "back\\slash", "a(b)c\\d"]
    text, _, _ = extract_pdf(make_pdf(paras))
    assert text == "\n".join(paras)


def test_pdf_octal_and_escape_decoding():
    # hand-built content stream: octal \101 = 'A', \t tab, line continuation
    body = b"%PDF-1.4\nBT (\\101bc\\tdef) Tj ET\nBT ([\\(x\\)]) Tj ET\n"
    text, spans, n = extract_pdf(body)
    assert text == "Abc\tdef\n[(x)]"
    assert n == 2


def test_pdf_tj_array_operator():
    body = b"%PDF-1.4\nBT [(Hel) -20 (lo)] TJ ET\n"
    text, _, n = extract_pdf(body)
    assert text == "Hello" and n == 1


def test_pdf_truncated_no_et():
    text, spans, n = extract_pdf(b"%PDF-1.4 BT (orphan) Tj")
    assert text == "" and spans == [] and n == 0


def test_escape_for_html_protects_edges_and_runs():
    tricky = "  leading  and  double  spaces  \nsecond <line> & more"
    res = extract_html(("<article><p>" + escape_for_html(tricky) + "</p></article>").encode())
    assert res.text == tricky


def test_corpus_covers_all_variants():
    pdf = pages_pandas(len(VARIANTS) * 2)
    assert set(pdf["variant"]) == set(VARIANTS)


def test_corpus_dup_class_duplicates_content():
    idx = VARIANTS.index("dup_url_content")
    dup = gen_page(idx + len(VARIANTS))  # a dup slot beyond index 0
    prev = gen_page(idx + len(VARIANTS) - 1)
    assert dup["html"] == prev["html"] and dup["url"] != prev["url"]


def test_corpus_is_pure_function_of_index():
    a, b = gen_page(123), gen_page(123)
    assert a == b
    assert gen_page(123, seed=7)["html"] != a["html"]
