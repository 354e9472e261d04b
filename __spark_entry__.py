"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``ocr_translate_spark/``; this module is the thin
driver-facing shim.  ``entry`` runs the flagship extraction pipeline over
sf0.001 (documents wrapped into Common-Crawl-style pages, extracted by the
Arrow stage); ``queries``/``oracle_sql`` expose the operator inventory from
SURVEY.md §2 with DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocr_translate_spark.queries import ORACLE_SQL, QUERY_FNS, q_extract_roundtrip


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch main-content extraction with byte-identical
    round-trip over sf0.001 documents wrapped as HTML pages."""
    return q_extract_roundtrip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query.  Omitted only for the 3 queries
    whose physical inputs SQL cannot reproduce (extract_corpus: the
    synthetic page generator runs Spark-side; embedding_lsh_topk /
    embedding_ivf_topk: numpy hyperplanes / k-means cells) — those carry
    recall/exactness pytests instead.  MinHash/SimHash are oracled via
    the candidates->exact-verify shape (set/multiset-equality grouping);
    rolling fingerprints via a portable md5 gram hash."""
    return dict(ORACLE_SQL)
