"""Driver-gate replica as a pytest: every oracled query must match DuckDB
exactly (row count, sorted columns, sorted values) at sf0.001."""

from __future__ import annotations

import math

import duckdb
import pytest

from ocr_translate_spark.queries import ORACLE_SQL, QUERY_FNS

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        return "NaN" if isinstance(v, float) and math.isnan(v) else v

    return sorted(tuple(cell(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, oracle_con, name):
    sdf = QUERY_FNS[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(ORACLE_SQL[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _norm(sdf.columns, srows) == _norm(ocols, orows)


@pytest.mark.parametrize("name", sorted(set(QUERY_FNS) - set(ORACLE_SQL)))
def test_rows_only_queries_run(spark, name):
    df = QUERY_FNS[name](spark, SF_DIR)
    assert df.count() >= 0
