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
    """DuckDB-equivalent SQL per query.  Omitted only for the 2 queries
    whose physical inputs SQL cannot reproduce (embedding_lsh_topk /
    embedding_ivf_topk: numpy hyperplane signs / probed-cell subsets) —
    those carry recall pytests, and their machinery is oracled through
    provably-exact degenerate configurations (embedding_lsh_onebucket:
    n_planes = 0; embedding_ivf_topk_fullprobe: n_probe = n_cells).
    extract_corpus is oracled byte-identically against the generator's
    golden text staged to parquet.  MinHash/SimHash are oracled via the
    candidates->exact-verify shape (set/multiset-equality grouping);
    rolling fingerprints via a portable md5 gram hash."""
    return dict(ORACLE_SQL)
