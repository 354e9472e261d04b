"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against the DuckDB
``oracle_sql()`` result: row count, sorted column names, and exact sorted
value tuples.  Queries without an oracle get a rows-only smoke check.

Usage: PYTHONPATH=. python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from ocr_translate_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-correctness", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            status = "ok" if srows is not None else "fail"
            print(f"ROWS  {name}: {len(srows)} rows ({status}, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {exc}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            continue
        a = norm_rows(scols, srows)
        b = norm_rows(ocols, orows)
        if a != b:
            failures.append(name)
            bad = next(i for i in range(len(a)) if a[i] != b[i])
            print(f"FAIL  {name}: values differ at sorted row {bad}:")
            print(f"      spark:  {a[bad]}")
            print(f"      oracle: {b[bad]}")
            continue
        print(f"PASS  {name}: {len(srows)} rows")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
