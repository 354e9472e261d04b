"""Two-parallelism scaling evidence for the round-6 operators
(connected-components cluster dedup, span excision, quality tiering):
the same 200k-doc corpus, the same jobs, at local[N] and local[4N] in
separate JVMs — the sandbox stand-in for the north rule's N vs 4N
executor criterion (BENCH/BASELINE.md records the extraction pipeline's
seven-window history under the same protocol).

The corpus materializes once to a shared parquet dir and both sides
read it back, so generation cost is outside the timed window.  Each
operator is timed as its terminal count after an untimed warmup action
per session (python-worker/codegen startup, as scaling_bench.py does).

Usage: PYTHONPATH=. python scripts/tier_scaling_probe.py [--n 2]
       [--copies 40] [--dir /dev/shm/tier_scale]
Prints one JSON line per parallelism level plus an efficiency summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# one fresh JVM per (operator, parallelism): sequencing the three ops
# through one session contaminated the later ones — dedup_clusters'
# local-checkpoint storage stays pinned past clearCache and the heap
# churn inverted the excise measurement (68 s at local[8] in-sequence
# vs 8.3 s in a fresh JVM, same input)
_WORKER = r"""
import json, sys, time
from pyspark.sql import functions as F
from ocr_translate_spark.session import get_spark
from ocr_translate_spark.operators import curation, dedup

cpus, op, path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(f"tier-scale-{op}-{cpus}", cpus=cpus)
df = spark.read.parquet(path)
n_rows = df.count()  # warmup action + the throughput denominator

t0 = time.monotonic()
if op == "dedup_clusters":
    dedup.dedup_clusters(df, "id", "text", n=16, max_gram_df=50).count()
elif op == "excise_dup_spans":
    curation.excise_dup_spans(df, "id", "text", n=8).count()
elif op == "quality_tiers":
    bounds = curation.approx_tier_bounds(df, "quality", n_tiers=4)
    curation.quality_tiers(
        df, id_col="id", quality_col="quality", group_col="grp",
        n_tiers=4, tier_bounds=bounds,
    ).count()
else:
    raise SystemExit(f"unknown op {op}")
print(json.dumps({
    "cpus": cpus, "op": op, "n_rows": n_rows,
    "sec": round(time.monotonic() - t0, 3),
}))
"""


def _materialize(root: str, copies: int, excise_copies: int, tier_rows: int) -> tuple:
    dirs = (
        os.path.join(root, f"corpus{copies}"),
        os.path.join(root, f"corpus{excise_copies}"),
        os.path.join(root, f"scored{tier_rows}"),
    )
    if all(os.path.isdir(d) for d in dirs):
        return dirs
    from pyspark.sql import functions as F

    from ocr_translate_spark.session import get_spark

    spark = get_spark("tier-scale-gen", cpus=8)
    docs = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text")
        .dropDuplicates(["text"])
    )
    for d, cp in ((dirs[0], copies), (dirs[1], excise_copies)):
        if os.path.isdir(d):
            continue
        cps = spark.range(cp).withColumnRenamed("id", "k")
        dup = (F.pmod(F.col("k") * 7 + F.col("doc_id"), F.lit(20)) == 0) & (F.col("k") > 0)
        kk = F.when(dup, F.col("k") - 1).otherwise(F.col("k"))
        words = F.filter(
            F.split(F.lower(F.col("text")), r"\s+", -1), lambda x: x != F.lit("")
        )
        (
            docs.crossJoin(cps)
            .select(
                (F.col("doc_id") * cp + F.col("k")).alias("id"),
                F.array_join(
                    F.transform(words, lambda w: F.concat(w, F.lit("_"), kk)), " "
                ).alias("text"),
            )
            .repartition(64)
            .write.parquet(d)
        )
    if not os.path.isdir(dirs[2]):
        (
            spark.range(tier_rows).select(
                F.col("id"),
                (F.pmod(F.xxhash64(F.col("id")), F.lit(10_000)) / 10_000.0)
                .alias("quality"),
                F.pmod(F.col("id"), F.lit(37)).cast("string").alias("grp"),
            )
            .repartition(64)
            .write.parquet(dirs[2])
        )
    spark.stop()
    return dirs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--copies", type=int, default=40)
    ap.add_argument("--excise-copies", type=int, default=160)
    ap.add_argument("--tier-rows", type=int, default=5_000_000)
    ap.add_argument("--dir", default="/dev/shm/tier_scale")
    args = ap.parse_args()

    from bench import window_quality

    dirs = _materialize(args.dir, args.copies, args.excise_copies, args.tier_rows)
    ops = (
        ("dedup_clusters", dirs[0]),
        ("excise_dup_spans", dirs[1]),
        ("quality_tiers", dirs[2]),
    )
    results: dict = {}
    windows = []
    for op, path in ops:
        for cpus in (args.n, 4 * args.n):
            w = window_quality()
            windows.append(w["parallel_32"])
            out = subprocess.run(
                [sys.executable, "-c", _WORKER, str(cpus), op, path],
                capture_output=True, text=True, cwd=REPO,
                env={**os.environ, "PYTHONPATH": REPO},
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(out.stdout[-2000:], out.stderr[-2000:])
                return 1
            rec = json.loads(line[-1])
            rec["window"] = w
            results[(op, cpus)] = rec
            print(json.dumps(rec), flush=True)

    eff = {
        op: round(
            results[(op, args.n)]["sec"]
            / (4.0 * results[(op, 4 * args.n)]["sec"]), 3,
        )
        for op, _ in ops
    }
    print(json.dumps({
        "n": args.n, "scaling_efficiency": eff, "windows": windows,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
