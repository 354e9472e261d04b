"""Compaction capacity probe: does the incremental band-join stay flat
under continuous ingestion once compaction runs?

curate_incremental appends one directory per batch to every curation
table; the LSH candidate join reads the stored dedup_bands state on
EVERY batch, so its file listing (and the summed host_counts log) grows
linearly with batch count.  This probe ingests ``--batches`` batches,
runs curate.compact_warehouse, ingests ``--post`` more, and reports:

* per-batch ingest wall, bucketed pre/post compaction (the flatness
  evidence — on the hypervisor-noisy sandbox compare medians, not tails);
* committed directory counts per table before/after (50 -> 1);
* exact survivor arithmetic as a correctness anchor: each batch carries
  ``--dups-per-batch`` exact dups of batch-0 docs, which must ALL die
  against the stored md5 keys whether or not the index was compacted.

Run it alone (bench must own the box): ``python scripts/compaction_probe.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sentence(i: int, n: int = 30) -> str:
    words = []
    for j in range(n):
        words.append(["the", "quick", "brown", "fox", "jumps", "over",
                      "and", "lazy", "dog", f"topic{i}w{j}"][j % 10])
    return " ".join(words)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=50)
    ap.add_argument("--post", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=400)
    ap.add_argument("--dups-per-batch", type=int, default=20)
    ap.add_argument("--warehouse", default="/tmp/compaction_probe_wh")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from ocr_translate_spark.curate import (
        BANDS_TABLE, CURATED_TABLE, compact_warehouse, curate_incremental,
    )
    from ocr_translate_spark.io.tables import open_warehouse
    from ocr_translate_spark.session import get_spark

    shutil.rmtree(args.warehouse, ignore_errors=True)
    spark = get_spark("compaction-probe", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    wh = open_warehouse(spark, args.warehouse)

    def run_batch(b: int) -> tuple[float, int]:
        base = b * args.batch_size
        rows = [(base + i, sentence(base + i)) for i in range(args.batch_size)]
        if b > 0:
            # replayed content: exact dups of batch-0 docs under fresh ids
            rows = rows[: -args.dups_per_batch] + [
                (10_000_000 + base + i, sentence(i))
                for i in range(args.dups_per_batch)
            ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        t0 = time.monotonic()
        _, rep = curate_incremental(
            spark, args.warehouse, df, min_words=10, scrub=False,
        )
        return time.monotonic() - t0, rep.n_appended

    expected_fresh = args.batch_size - args.dups_per_batch
    pre_walls, post_walls = [], []
    for b in range(args.batches):
        wall, n_app = run_batch(b)
        want = args.batch_size if b == 0 else expected_fresh
        assert n_app == want, (b, n_app, want)
        pre_walls.append(wall)
        if b % 10 == 9:
            print(f"batch {b + 1}/{args.batches}: {wall:.2f}s", file=sys.stderr)

    pre_dirs = {t: len(v) for t, v in
                wh._manifest(wh.current_snapshot_id())["tables"].items()}
    t0 = time.monotonic()
    snap, rows_by_table = compact_warehouse(spark, args.warehouse)
    compact_wall = time.monotonic() - t0
    post_dirs = {t: len(v) for t, v in wh._manifest(snap)["tables"].items()}

    for b in range(args.batches, args.batches + args.post):
        wall, n_app = run_batch(b)
        assert n_app == expected_fresh, (b, n_app)
        post_walls.append(wall)

    n_total = args.batch_size + (args.batches + args.post - 1) * expected_fresh
    got_total = wh.read(spark, CURATED_TABLE).count()
    assert got_total == n_total, (got_total, n_total)

    out = {
        "batches": args.batches, "post_batches": args.post,
        "batch_size": args.batch_size, "corpus_docs": n_total,
        "pre_wall_median_s": round(statistics.median(pre_walls), 3),
        "pre_wall_last5_median_s": round(statistics.median(pre_walls[-5:]), 3),
        "post_wall_median_s": round(statistics.median(post_walls), 3),
        "compact_wall_s": round(compact_wall, 3),
        "dirs_before": pre_dirs, "dirs_after": post_dirs,
        "bands_rows": rows_by_table.get(BANDS_TABLE),
        "dup_arithmetic_exact": True,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
