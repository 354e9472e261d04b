"""Write-side probe for the flagship extraction pipeline (r4 verdict #4):
at 1M pages the staged parquet write + commit is ~half the wall
(docs/PLANS.md stage audit), so the named next lever is the OUTPUT
codec / row-group sizing, not the plan shape.  This probe measures the
full no-shuffle extraction job (scan -> Arrow extract -> staged parquet
write -> snapshot commit) under codec/row-group variants on the same
materialized corpus, and reports docs/sec + output bytes per config.

Window-gated like bench.py: numbers from a parallel_32 < 0.7 window are
hypervisor noise, not measurements.

Usage: python scripts/write_codec_probe.py [--pages 1000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SCRATCH = "/dev/shm/codec_probe"


def materialize_corpus(pages: int) -> str:
    """Generate the synthetic corpus once, shared by every config (same
    discipline as scaling_bench.materialize_corpus — untimed, on tmpfs)."""
    os.makedirs(SCRATCH, exist_ok=True)
    corpus = os.path.join(SCRATCH, f"pages_{pages}")
    if os.path.exists(os.path.join(corpus, "_SUCCESS")):
        return corpus
    code = (
        "from ocr_translate_spark.session import get_spark\n"
        "from ocr_translate_spark.corpus import pages_df\n"
        "spark = get_spark('gen', cpus=16)\n"
        f"pages_df(spark, {pages}, partitions=128).write.mode('overwrite')"
        f".parquet({corpus!r})\n"
    )
    subprocess.run(
        [sys.executable, "-c", code], check=True, capture_output=True,
        env=dict(os.environ, PYTHONPATH=REPO, TMPDIR=SCRATCH),
    )
    return corpus


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


# (label, parquet codec, parquet.block.size bytes or None=default 128 MiB)
CONFIGS = (
    ("snappy_128M", "snappy", None),
    ("zstd_128M", "zstd", None),
    ("zstd_32M", "zstd", 32 * 1024 * 1024),
    ("uncompressed_128M", "uncompressed", None),
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import bench
    from ocr_translate_spark.pipeline import run_extraction
    from ocr_translate_spark.session import get_spark

    window, waits, degraded = bench.await_clean_window()
    corpus = materialize_corpus(args.pages)

    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", os.path.join(SCRATCH, "spark-local"))
    spark = get_spark("codec_probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(corpus)

    # warmup: python workers + codegen, untimed (bench.py protocol)
    wh = tempfile.mkdtemp(prefix="codec_warm_", dir=SCRATCH)
    run_extraction(spark, pages.limit(5000), wh, assume_unique_urls=True)
    shutil.rmtree(wh, ignore_errors=True)

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    default_block = hconf.get("parquet.block.size")
    results = {}
    for label, codec, block in CONFIGS:
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        if block is None:
            if default_block is None:
                hconf.unset("parquet.block.size")
            else:
                hconf.set("parquet.block.size", default_block)
        else:
            hconf.setInt("parquet.block.size", block)
        reps, out_bytes = [], 0
        for _ in range(max(1, args.reps)):
            wh = tempfile.mkdtemp(prefix=f"codec_{label}_", dir=SCRATCH)
            t0 = time.monotonic()
            stats = run_extraction(spark, pages, wh, assume_unique_urls=True)
            reps.append(round(time.monotonic() - t0, 3))
            out_bytes = dir_bytes(os.path.join(wh, "extracted"))
            shutil.rmtree(wh, ignore_errors=True)
        best = min(reps)
        results[label] = {
            "wall_sec": best,
            "reps": reps,
            "docs_per_sec": round(stats["n_written"] / best, 1),
            "extracted_bytes": out_bytes,
            "mb": round(out_bytes / 1e6, 1),
        }
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")

    print(json.dumps({
        "probe": "write_codec",
        "pages": args.pages,
        "cpus": 32,
        "window_before": window,
        "window_waits": waits,
        "window_degraded": degraded,
        "window_after": bench.window_quality(),
        "results": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
