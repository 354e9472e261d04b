"""Minimal PDF layout pass: text-object extraction from raw PDF bytes.

The north_star requires "a layout pass for embedded PDF payloads".  This is
a deliberately small, dependency-free reader of uncompressed PDF content
streams: it walks ``BT ... ET`` text objects and decodes the strings shown
by ``Tj`` / ``TJ`` / ``'`` operators.  Each text object contributes one
line; objects are joined with '\\n'.

This covers the corpus generator's ``pdf_payload`` page class
(FIXTURES.md §1 variant 10) and any PDF whose content streams are stored
unfiltered.  Compressed streams (FlateDecode etc.) are out of scope in this
container (no zlib-compressed fixtures are generated); the classifier
simply yields no text for them rather than failing.
"""

from __future__ import annotations

import re

PDF_MAGIC = b"%PDF"

_TEXT_OBJECT_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_SHOW_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')|\[(?:[^\]\\]|\\.)*\]\s*TJ", re.DOTALL)
_STRING_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.DOTALL)

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def is_pdf(data: bytes) -> bool:
    return data[:4] == PDF_MAGIC


def _decode_pdf_string(raw: bytes) -> str:
    """Decode one parenthesized PDF literal string (sans parens)."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        ch = raw[i: i + 1]
        if ch == b"\\" and i + 1 < n:
            nxt = raw[i + 1: i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and raw[j: j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1: j], 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out += ch
        i += 1
    return out.decode("utf-8", "replace")


def extract_pdf(data: bytes) -> tuple[str, list[tuple[int, int]], int]:
    """(text, spans, n_text_objects) from raw PDF bytes.

    Each BT/ET text object becomes one line; spans index into the returned
    text per object, mirroring the HTML extractor's block spans.
    """
    lines: list[str] = []
    for obj in _TEXT_OBJECT_RE.finditer(data):
        pieces: list[str] = []
        for show in _SHOW_RE.finditer(obj.group(1)):
            for lit in _STRING_RE.finditer(show.group(0)):
                pieces.append(_decode_pdf_string(lit.group(0)[1:-1]))
        if pieces:
            lines.append("".join(pieces))

    text = "\n".join(lines)
    spans: list[tuple[int, int]] = []
    offset = 0
    for ln in lines:
        spans.append((offset, offset + len(ln)))
        offset += len(ln) + 1
    return text, spans, len(lines)


def make_pdf(paragraphs: list[str]) -> bytes:
    """Build a minimal single-page PDF whose text objects round-trip through
    ``extract_pdf`` (corpus generator helper, FIXTURES.md variant 10)."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ).encode("utf-8")

    content = bytearray()
    y = 720
    for para in paragraphs:
        content += b"BT /F1 12 Tf 72 %d Td (" % y + esc(para) + b") Tj ET\n"
        y -= 20

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + bytes(content) + b"endstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
