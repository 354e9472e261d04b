"""Property-based fuzzing of the extraction kernels (hypothesis).

The north_star demands the extractor survive arbitrary web bytes and stay
deterministic.  These properties hold for ANY input:

* never raises;
* deterministic: identical bytes -> identical output;
* spans are well-formed and index extracted_text;
* n_kept <= n_blocks; kept spans join to the text with '\n'.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ocr_translate_spark.kernels.html_extract import escape_for_html, extract_html
from ocr_translate_spark.kernels.pdf_extract import extract_pdf, is_pdf

# arbitrary bytes, plus HTML-ish fragments to bias coverage into the
# tag/comment/entity paths
_tags = st.sampled_from([
    b"<div>", b"</div>", b"<p>", b"</p>", b"<a href='x'>", b"</a>", b"<br>",
    b"<script>", b"</script>", b"<style>", b"</style>", b"<!--", b"-->",
    b"<!DOCTYPE html>", b"<?pi?>", b"<title>", b"</title>", b"<head>",
    b"</head>", b"<", b">", b"</", b"<img/>", b"<article>", b"</article>",
    b"&amp;", b"&#32;", b"&bogus;", b"\xff\xfe", b"\xc2\xa0", b"\xe2\x82",
])
_html_soup = st.lists(
    st.one_of(_tags, st.binary(max_size=24), st.text(max_size=24).map(lambda s: s.encode())),
    max_size=40,
).map(b"".join)


@settings(max_examples=200, deadline=None)
@given(st.one_of(st.binary(max_size=400), _html_soup))
def test_extract_html_total_and_deterministic(data: bytes):
    a = extract_html(data)
    b = extract_html(data)
    assert a.text == b.text and a.spans == b.spans and a.title == b.title
    assert 0 <= a.n_kept <= a.n_blocks
    assert len(a.spans) == a.n_kept
    pieces = []
    for start, end in a.spans:
        assert 0 <= start <= end <= len(a.text)
        pieces.append(a.text[start:end])
    # kept blocks joined with '\n' reconstruct the text exactly
    assert "\n".join(pieces) == a.text


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_extract_pdf_total(data: bytes):
    payload = b"%PDF-1.4" + data
    assert is_pdf(payload)
    text, spans, n_objs = extract_pdf(payload)
    assert isinstance(text, str) and n_objs >= 0
    for start, end in spans:
        assert 0 <= start <= end <= len(text)


# HTML cannot represent these at all (their character references are
# HTML5 parse errors): C0 except \t \n \f \r, DEL, C1
_UNREPRESENTABLE = (
    "".join(chr(c) for c in range(0x00, 0x20) if chr(c) not in "\t\n\f\r")
    + "\x7f"
    + "".join(chr(c) for c in range(0x80, 0xA0))
)


@settings(max_examples=300, deadline=None)
@given(st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters=_UNREPRESENTABLE
    ),
    max_size=200,
))
def test_escape_roundtrip_property(text: str):
    """escape_for_html must round-trip any HTML-representable text
    byte-identically through the extractor (the wrapper the synthetic
    corpus relies on)."""
    html = (b"<html><body><article><p>"
            + escape_for_html(text).encode("utf-8")
            + b"</p></article></body></html>")
    got = extract_html(html).text
    assert got == text
