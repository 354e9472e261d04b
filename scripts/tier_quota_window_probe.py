"""Hostile-size probe for the quality-tier quota window's one sqrt-growth
term (docs/PLANS.md: the column-predicate / WindowGroupLimit tradeoff).

quality_tiers' second-level re-rank sees ``salt_shards x quota`` rows per
(tier, group) cell in ONE task's sort, and quota grows as
``quota_coeff * sqrt(m)`` — the only term in the tier family that does
not partition.  This probe drives ONE worst-case cell (every row in the
same tier and group) of ``--rows`` rows (>= 20M per the round-6 verdict
ask) through:

* ``quality_tiers`` end-to-end — closed-form assert ``kept == quota ==
  min(m, floor(c * sqrt(m)))`` and that the level-1 prune emitted
  ``<= salt_shards * quota`` survivors;
* the isolated level-2 re-rank as its own job — this stage is a single
  task by construction (one window partition), so its wall IS the
  per-task max the verdict asks to see, +- job overhead;
* ``tiered_ingest`` of the same cell into a fresh warehouse (the
  streaming path pays the same windows plus the ledger write).

Interpretation: at m = 2*10^7 the level-2 input is 16 * ~35.8k = ~572k
rows; the sqrt law says a 10^10-doc cell feeds ~12.8M rows to that one
task — if the isolated level-2 wall here is already a material fraction
of the end-to-end wall, the recursive shard-combine (rank within shard,
shard-offset re-rank — pack_documents' two-level cumsum shape) is the
fix; if it is noise next to the scan + level-1 shard sorts, the
documented bound holds and the single task is not the bottleneck.

Run it alone (bench must own the box):
``python scripts/tier_quota_window_probe.py --rows 20000000``.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--quota-coeff", type=float, default=8.0)
    ap.add_argument("--salt-shards", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--warehouse", default="/tmp/tier_quota_probe_wh")
    ap.add_argument("--skip-ingest", action="store_true",
                    help="probe only the quality_tiers windows")
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ocr_translate_spark.operators.curation import quality_tiers
    from ocr_translate_spark.session import get_spark

    spark = get_spark("tier-quota-probe", cpus=args.cpus)
    m = args.rows
    quota = min(m, math.floor(args.quota_coeff * math.sqrt(m)))

    # ONE hostile cell: every row lands in tier 1 / group '' (tier_bounds
    # [] pins tier 1; no group column).  quality is a cheap deterministic
    # hash so the narrow input is synthesized, not stored.
    base = spark.range(m).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000)) / 1_000_000.0
         ).alias("quality"),
    )
    base = base.repartition(args.cpus).localCheckpoint()  # isolate gen cost

    report: dict = {
        "rows": m, "quota": quota, "salt_shards": args.salt_shards,
        "level2_input_rows": args.salt_shards * quota,
        "cpus": args.cpus,
    }

    # -- end-to-end quality_tiers on the single cell -------------------
    t0 = time.monotonic()
    out = quality_tiers(
        base, "doc_id", "quality", None, n_tiers=1,
        quota_coeff=args.quota_coeff, tier_bounds=[],
        salt_shards=args.salt_shards,
    )
    kept = out.filter(F.col("keep")).count()
    report["quality_tiers_wall_sec"] = round(time.monotonic() - t0, 3)
    assert kept == quota, (kept, quota)

    # -- level-1 shard prune alone (the partitioned half) --------------
    rkey = F.md5(F.col("doc_id").cast("string"))
    order = [rkey, F.col("doc_id")]
    salt = F.pmod(
        F.xxhash64(F.col("doc_id").cast("string"), F.lit("qt")),
        F.lit(args.salt_shards),
    )
    w1 = Window.partitionBy(salt).orderBy(*order)
    t0 = time.monotonic()
    survivors = (
        base.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= quota)
        .drop("_rn1")
    )
    n_surv = survivors.count()
    report["level1_wall_sec"] = round(time.monotonic() - t0, 3)
    assert n_surv <= args.salt_shards * quota, n_surv
    report["level1_survivors"] = n_surv

    # -- isolated level-2 re-rank: ONE window partition == ONE task ----
    surv = survivors.localCheckpoint()
    w2 = Window.partitionBy(F.lit(1)).orderBy(*order)
    t0 = time.monotonic()
    n2 = (
        surv.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= quota)
        .count()
    )
    report["level2_single_task_wall_sec"] = round(time.monotonic() - t0, 3)
    assert n2 == quota, (n2, quota)
    surv.unpersist()

    # -- tiered_ingest of the same hostile cell ------------------------
    if not args.skip_ingest:
        from ocr_translate_spark.curate import tiered_ingest

        shutil.rmtree(args.warehouse, ignore_errors=True)
        docs = base.withColumn("text", F.lit("x"))
        t0 = time.monotonic()
        _out, rep = tiered_ingest(
            spark, args.warehouse, docs, quality_col="quality",
            n_tiers=1, quota_coeff=args.quota_coeff,
        )
        report["tiered_ingest_wall_sec"] = round(time.monotonic() - t0, 3)
        report["tiered_ingest_kept"] = rep["n_kept"]
        assert rep["n_kept"] == quota, (rep["n_kept"], quota)
        shutil.rmtree(args.warehouse, ignore_errors=True)

    report["level2_share_of_end_to_end"] = round(
        report["level2_single_task_wall_sec"]
        / max(report["quality_tiers_wall_sec"], 1e-9), 3,
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
