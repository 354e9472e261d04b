"""Per-query isolation bench (guide §1.4): times each named query with the
noop sink so the computation is measured without the count()'s column
pruning, captures .explain("formatted") to plans/<tag>/<query>.txt, and
labels jobs for the UI.  NOT the driver-facing bench — bench.py stays the
frozen measurement contract; this file exists so optimization evidence
(before/after numbers + plan shapes) can be recorded per query.

Usage:
    python bench_extra.py [query ...] [--sf-dir DIR] [--reps N] [--tag NAME]
                          [--no-plans]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all bench queries)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="adhoc", help="plans/<tag>/ subdir for explain captures")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from bench import window_quality
    from ocr_translate_spark.queries import QUERY_FNS
    from ocr_translate_spark.session import get_spark

    names = args.queries or [
        "extract_roundtrip", "pricing_summary", "top_suppliers_by_revenue",
        "minhash_lsh", "simhash", "jaccard_pairs", "embedding_topk",
        "pack_documents", "gopher_rules", "bm25_search", "line_dedup",
        "decontaminate", "rarity_scores", "lang_id", "textstat_battery",
        "url_normalize", "events_windowed", "sessionize", "dedup_clusters",
        "span_dedup", "quality_tiers",
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cpus=cpus)
    sc = spark.sparkContext

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", args.tag)
    if not args.no_plans:
        os.makedirs(plans_dir, exist_ok=True)

    w0 = window_quality()
    out: dict[str, object] = {"sf_dir": args.sf_dir, "window_before": w0}
    timings: dict[str, list[float]] = {}
    for name in names:
        fn = QUERY_FNS[name]
        df = fn(spark, args.sf_dir)
        if not args.no_plans:
            with open(os.path.join(plans_dir, f"{name}.txt"), "w", encoding="utf-8") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        # untimed warmup (plan/JIT/broadcast), then noop-sink reps
        sc.setJobDescription(f"warmup:{name}")
        df.write.format("noop").mode("overwrite").save()
        reps = []
        for i in range(args.reps):
            sc.setJobDescription(f"{name}:rep{i}")
            t0 = time.monotonic()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(round(time.monotonic() - t0, 3))
        sc.setJobDescription(None)
        timings[name] = reps
        print(f"{name}: {reps}", file=sys.stderr)
    out["reps"] = timings
    out["best"] = {k: min(v) for k, v in timings.items()}
    out["window_after"] = window_quality()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
