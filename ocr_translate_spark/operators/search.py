"""BM25 relevance scoring / top-k retrieval over a documents table.

The lexical-search complement to ``operators/similarity.py``'s embedding
ANN: score every document against a small bag-of-words query with BM25
(Robertson/Spärck Jones; the Lucene-default ranking function) and return
the top-k.  The reference engine ranks cached entities by usage counts
(ref: ocr_translate/ocr_tsl/cached_lists.py most-used ordering); this is
the corpus-scale generalization a training-data pipeline needs for
targeted corpus probes ("find the documents about X") and
quality-by-relevance slicing.

Scale design (100 TB):

* per-document term frequencies come from ``size(filter(words, ...))``
  array expressions — a NARROW map over the scan, no explode, no
  per-term shuffle, no Python;
* the corpus-level statistics (N, total length, per-term document
  frequencies) are ONE tree-reduced aggregate row, broadcast back via a
  crossJoin — bytes, not rows, cross the network;
* the final top-k is ``orderBy(score).limit(k)`` = Spark's distributed
  TakeOrdered (per-partition partial top-k, then a k-row merge on the
  driver) — the corpus itself never shuffles.

Cross-engine determinism: with ``exact_math=True`` the classic
``ln``-based idf is replaced by the raw Robertson–Spärck-Jones odds
ratio ``(N - df + 0.5) / (df + 0.5)`` — every arithmetic step is then a
correctly-rounded IEEE +,*,/ of integer-derived doubles evaluated in a
fixed order, so the DuckDB oracle matches bit-for-bit (``ln`` is only
1-ulp-accurate and differs between libm implementations; same
discipline as similarity.py's exact_math).  For a single-term query the
idf is one constant positive factor, so exact_math ranks identically to
the log variant; for multi-term queries the odds ratio grows faster
than its log, so rare terms weigh relatively more — a deliberate,
documented scoring variant driven by the same per-term signals, not an
approximation error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    exact_math: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Top-``top_k`` documents by BM25 score for ``query_terms``.

    Returns (doc_id, score) ordered by score desc, doc_id asc (the
    deterministic tie-break both engines share).  Documents matching no
    query term (score 0) are excluded.

    ``materialize=True`` persists the slim (doc_id, dl, tf...) projection
    — a few longs per document — so the stats aggregate and the scoring
    pass share ONE tokenization of the text column instead of re-parsing
    the corpus twice (see dedup.minhash_lsh_candidates for the
    cache-lifecycle notes; at warehouse scale, write the projection once
    instead).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # the corpus side is lowercased, so match terms case-insensitively
    # (bm25_oracle_sql applies the same normalization)
    query_terms = tuple(t.lower() for t in query_terms)
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+", -1), lambda x: x != F.lit("")
    )

    def _tf(term: str):
        # NB: the HOF lambda must stay single-parameter — PySpark binds a
        # Column to every named parameter, defaults included
        return F.size(F.filter(F.col("_words"), lambda x: x == F.lit(term)))

    tf_cols = [
        _tf(t).cast("long").alias(f"_tf{i}") for i, t in enumerate(query_terms)
    ]
    # project the tokenized array ONCE, then derive _dl and every tf from
    # the projected column — one split per document is structural, not a
    # bet on Catalyst CSE'ing len(terms)+1 copies of the same expression
    d = (
        df.select(F.col(id_col).alias("doc_id"), words.alias("_words"))
        .select(
            "doc_id",
            F.size("_words").cast("long").alias("_dl"),
            *tf_cols,
        )
    )
    if materialize:
        d = d.persist()
    stats = d.agg(
        F.count("*").alias("_n"),
        F.sum("_dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    j = d.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("_dl").cast("double") / avgdl)
    )
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        dfi = F.col(f"_df{i}").cast("double")
        odds = (F.col("_n").cast("double") - dfi + F.lit(0.5)) / (dfi + F.lit(0.5))
        idf = odds if exact_math else F.log(F.lit(1.0) + odds)
        tf = F.col(f"_tf{i}").cast("double")
        score = score + idf * (tf * F.lit(k1 + 1.0)) / (tf + norm)
    return (
        j.select("doc_id", score.alias("score"))
        .filter(F.col("score") > 0.0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )


def bm25_oracle_sql(
    query_terms: tuple[str, ...],
    table: str = "documents",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """DuckDB SQL computing :func:`bm25_topk` with ``exact_math=True``,
    replaying the identical fixed-order IEEE arithmetic.  Float literals
    are embedded as ``CAST('<repr>' AS DOUBLE)`` — a correctly-rounded
    strtod of Python's round-trip repr, guaranteed to yield the very
    double Spark's ``F.lit`` carries (a bare numeric literal would be
    typed DECIMAL, whose conversion path DuckDB doesn't guarantee to
    match); ``k1 + 1.0`` is pre-computed in Python so neither engine
    re-rounds the sum."""

    query_terms = tuple(t.lower() for t in query_terms)

    def lit(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    tf_exprs = ",\n          ".join(
        f"CAST(len(list_filter(words, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(query_terms)
    )
    df_exprs = ",\n          ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(query_terms))
    )
    parts = " + ".join(
        f"((CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + {lit(0.5)})"
        f" / (CAST(df{i} AS DOUBLE) + {lit(0.5)}))"
        f" * (CAST(tf{i} AS DOUBLE) * {lit(k1 + 1.0)})"
        f" / (CAST(tf{i} AS DOUBLE) + norm)"
        for i in range(len(query_terms))
    )
    return f"""
        WITH w AS (
          SELECT doc_id,
            list_filter(string_split_regex(lower(text), '\\s+'),
                        x -> x <> '') AS words
          FROM {table}),
        d AS (
          SELECT doc_id, CAST(len(words) AS BIGINT) AS dl,
          {tf_exprs}
          FROM w),
        s AS (
          SELECT COUNT(*) AS n, SUM(dl) AS sumdl,
          {df_exprs}
          FROM d),
        scored AS (
          SELECT ({lit(k1)} * ({lit(1.0)} - {lit(b)}
              + {lit(b)} * (CAST(dl AS DOUBLE)
                 / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))) AS norm,
            d.*, s.*
          FROM d, s)
        SELECT doc_id, {lit(0.0)} + {parts} AS score
        FROM scored
        WHERE {lit(0.0)} + {parts} > {lit(0.0)}
        ORDER BY score DESC, doc_id
        LIMIT {top_k}
    """
