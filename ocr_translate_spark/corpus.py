"""Deterministic synthetic pages corpus (FIXTURES.md §1).

Generates Common-Crawl-style rows with the driver-mandated shape
(BASELINE.json input_hint):

    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

``text`` is the *expected* main-content extraction for the page and doubles
as the per-url golden (FIXTURES.md §6).  Generation is a pure function of
(index, seed): the same index always produces the same page, so the corpus
can be materialized distributively via ``spark.range(n)`` + ``mapInPandas``
at any scale without driver memory or ordering hazards — the pattern that
carries to the 10^12-row regime.

Eleven page classes mirror the reference's operator edge cases: plain text,
embedded newlines, break characters, dash-split words (ref models/tsl.py:145),
no-space languages (ref models/ocr.py:40), edge garbage (ref tsl.py:124-144),
missing spaces (ref tsl.py:156-174), link farms, giant pages (skew driver),
PDF payloads, and duplicated content (dedup/memoization driver).
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Iterator

import pandas as pd

from .kernels.html_extract import escape_for_html
from .kernels.pdf_extract import make_pdf

SEED = 42

WORDS = (
    "data query table scan filter join merge sort hash agg group window "
    "batch stream row column value key part order line customer spark fast "
    "slow big small vector the a engine plan shuffle skew broadcast salt "
    "page block text span crawl corpus extract boiler plate content"
).split()

CJK_CHARS = "日本語のテキスト抽出処理中文文本提取引擎高速分散処理"

LANGS = ("en", "de", "fr", "ja", "zh")

# class sequence; giant pages are 1-in-16 (skew), pdf 1-in-16
VARIANTS = (
    "simple", "newlines", "breakchar", "dash_newline", "nospace_lang",
    "edge_garbage", "missing_spaces", "link_farm", "simple", "newlines",
    "dup_url_content", "breakchar", "simple", "missing_spaces",
    "giant_page", "pdf_payload",
)

EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

_NAV_LINKS = ["Home", "About", "Archive", "Contact", "Login"]


def _rng(index: int, seed: int) -> random.Random:
    return random.Random((seed << 34) ^ (index * 0x9E3779B97F4A7C15 & 0x7FFFFFFFFFFFFFF))


def _sentence(rng: random.Random, n_words: int, end: str = ".") -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n_words)) + end


def _paragraphs(rng: random.Random, n_para: int, words_lo=8, words_hi=24) -> list[str]:
    return [_sentence(rng, rng.randint(words_lo, words_hi)) for _ in range(n_para)]


def _boilerplate_head(rng: random.Random, host: int) -> str:
    nav = "".join(f'<li><a href="/{t.lower()}">{t}</a></li>' for t in _NAV_LINKS)
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>Site {host} — page</title>"
        "<style>body{margin:0}</style>"
        '<script>var x = "<p>not content</p>";</script>'
        "</head><body>"
        f"<header><h1>Site {host}</h1><p>tagline of the site</p></header>"
        f"<nav><ul>{nav}</ul></nav>"
        '<div class="sidebar"><ul>'
        + "".join(
            f'<li><a href="/t/{i}">{rng.choice(WORDS)} {rng.choice(WORDS)}</a></li>'
            for i in range(rng.randint(8, 20))
        )
        + "</ul></div>"
        "<div>Ad: buy now!</div>"
    )


def _boilerplate_tail(rng: random.Random) -> str:
    return (
        "<footer><p>Copyright 2024 — all rights reserved. "
        '<a href="/tos">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
        "</body></html>"
    )


def _article(paras: list[str]) -> str:
    return "<article>" + "".join(f"<p>{escape_for_html(p)}</p>" for p in paras) + "</article>"


def _gen_content(rng: random.Random, variant: str, lang: str) -> tuple[list[str], str]:
    """(paragraphs, lang) for a page class; paragraphs are the golden text."""
    if variant == "newlines":
        paras = []
        for _ in range(rng.randint(2, 4)):
            lines = [_sentence(rng, rng.randint(4, 9), end="") for _ in range(rng.randint(2, 4))]
            paras.append("\n".join(lines))
        return paras, lang
    if variant == "breakchar":
        paras = [
            "".join(
                _sentence(rng, rng.randint(3, 8), end=rng.choice("?.!")) + " "
                for _ in range(rng.randint(2, 5))
            ).rstrip()
            for _ in range(rng.randint(2, 4))
        ]
        return paras, lang
    if variant == "dash_newline":
        paras = []
        for _ in range(rng.randint(2, 4)):
            word = rng.choice([w for w in WORDS if len(w) >= 6])
            cut = rng.randint(2, len(word) - 2)
            paras.append(
                _sentence(rng, rng.randint(4, 8), end="")
                + f" {word[:cut]}-\n{word[cut:]} "
                + _sentence(rng, rng.randint(3, 6))
            )
        return paras, lang
    if variant == "nospace_lang":
        lang = rng.choice(("ja", "zh"))
        paras = [
            "".join(rng.choice(CJK_CHARS) for _ in range(rng.randint(30, 80)))
            for _ in range(rng.randint(2, 4))
        ]
        return paras, lang
    if variant == "edge_garbage":
        paras = []
        for _ in range(rng.randint(2, 4)):
            core = _sentence(rng, rng.randint(6, 12))
            paras.append(rng.choice("$%#@") + " " + core + " " + rng.choice("$%#@"))
        return paras, lang
    if variant == "missing_spaces":
        joined = "".join(rng.sample(WORDS, 2))
        paras = [_sentence(rng, rng.randint(4, 8), end="") + " " + joined + "."]
        paras += _paragraphs(rng, rng.randint(1, 3))
        return paras, lang
    if variant == "giant_page":
        return _paragraphs(rng, 250, 20, 40), lang
    return _paragraphs(rng, rng.randint(2, 6)), lang


def gen_page(index: int, seed: int = SEED) -> dict:
    """Deterministically build one page row."""
    rng = _rng(index, seed)
    variant = VARIANTS[index % len(VARIANTS)]
    # Zipf-ish host skew: a few hosts dominate (FIXTURES.md §1)
    host = min(int(rng.paretovariate(1.1)) - 1, 49)
    lang = rng.choice(LANGS)

    if variant == "dup_url_content" and index > 0:
        base = gen_page(index - 1, seed)
        return {
            "url": f"https://host{host}.example/dup/{index:09d}",
            "warc_ts": EPOCH + _dt.timedelta(seconds=index),
            "html": base["html"],
            "text": base["text"],
            "lang": base["lang"],
            "variant": "dup_url_content",
        }

    if variant == "pdf_payload":
        paras = _paragraphs(rng, rng.randint(2, 5))
        payload = make_pdf(paras)
        text = "\n".join(paras)
    elif variant == "link_farm":
        # no <article>: exercises the pure density classifier path
        para = _sentence(rng, rng.randint(12, 20))
        farm = "".join(
            f'<li><a href="/x/{i}">{rng.choice(WORDS)} {rng.choice(WORDS)}</a></li>'
            for i in range(rng.randint(40, 80))
        )
        payload = (
            _boilerplate_head(rng, host)
            + f"<div><p>{escape_for_html(para)}</p></div>"
            + f"<div><ul>{farm}</ul></div>"
            + _boilerplate_tail(rng)
        ).encode("utf-8")
        text = para
    else:
        paras, lang = _gen_content(rng, variant, lang)
        payload = (
            _boilerplate_head(rng, host)
            + _article(paras)
            + _boilerplate_tail(rng)
        ).encode("utf-8")
        text = "\n".join(paras)

    return {
        "url": f"https://host{host}.example/{variant}/{index:09d}",
        "warc_ts": EPOCH + _dt.timedelta(seconds=index),
        "html": payload,
        "text": text,
        "lang": lang,
        "variant": variant,
    }


def pages_pandas(n: int, seed: int = SEED, start: int = 0) -> pd.DataFrame:
    """Small-scale corpus as a pandas DataFrame (tests / driver-side)."""
    rows = [gen_page(i, seed) for i in range(start, start + n)]
    return pd.DataFrame(rows)


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, "
    "lang string, variant string"
)


def pages_df(spark, n: int, seed: int = SEED, partitions: int | None = None):
    """Distributed corpus builder: ``spark.range(n)`` -> mapInPandas.

    Generation is per-index pure, so this scales to any n with no driver
    materialization and no cross-partition coupling.
    """
    rng_df = spark.range(0, n, numPartitions=partitions)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([gen_page(int(i), seed) for i in pdf["id"]])

    return rng_df.mapInPandas(build, schema=PAGES_SCHEMA)
