"""SemDeDup capacity probe: semantic dedup at the 200k-vector scale with
planted near-identical groups and EXACT self-computed expectations.

Corpus: ``--n`` 64-dim vectors in 16 well-separated clusters (center +
sigma-0.3 noise — ambient pairwise cosine ~0.92, far under the 0.995
threshold), plus ``--groups`` planted near-identical TRIPLES: three
vectors at ``base + eps * r`` (eps 0.005 / 0.005 / 0.02), mutual cosine
~0.9996+.

SemDeDup's inherent miss — a near-identical pair whose members land in
different k-means cells is never scored — is not asserted away but
COMPUTED: the probe trains the centroids itself (same function,
same args), passes them into ``semantic_dedup``, assigns every planted
member's cell, and derives the exact expected outcome: each triple
resolves to one sem_cluster PER DISTINCT CELL among its members
(members sharing a cell are pairwise over-threshold by construction;
ambient merges are geometrically impossible at 0.995), labeled by the
min member id of that cell-part, with exactly one representative each.

Asserts (closed form, given the computed cell partition):
* per-triple sem_cluster partition == the cell partition (labels AND
  member sets);
* exactly one representative per part; ambient docs all singleton reps;
* keep-set size == n - sum(3 - n_parts(triple));
* no group ever exceeds size 3 (no ambient merge).

Reports wall + vecs/sec and the measured split-triple fraction (the
boundary-miss rate — a property of n_cells vs the data, not a bug).

Usage: PYTHONPATH=. python scripts/semdedup_capacity_probe.py [--n 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from ocr_translate_spark.session import get_spark

DIM = 64
N_CLUSTERS = 16
GROUP_BASE = 10_000_000  # ids >= this are planted triple members
EPS = (0.005, 0.005, 0.02)


def _vec_for(vid: int, centers: np.ndarray) -> np.ndarray:
    if vid >= GROUP_BASE:
        g, m = divmod(vid - GROUP_BASE, 3)
        rb = np.random.RandomState(300_007 + g)
        base = centers[g % N_CLUSTERS] + 0.3 * rb.randn(DIM)
        rm = np.random.RandomState(400_009 + vid)
        return base + EPS[m] * rm.randn(DIM)
    r = np.random.RandomState(100_003 + vid)
    return centers[vid % N_CLUSTERS] + 0.3 * r.randn(DIM)


def synth_vectors(spark, n: int, groups: int, parts: int):
    """(vec_id, embedding float64[64]): ambient cluster member or planted
    triple member — deterministic per id, generated distributed.  The
    last 3*groups ids are remapped into the planted range."""
    rng = np.random.RandomState(7)
    centers = rng.randn(N_CLUSTERS, DIM).astype(np.float64)
    n_plant = 3 * groups

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vids = np.where(ids >= n - n_plant, ids - (n - n_plant) + GROUP_BASE, ids)
            out = np.empty((len(ids), DIM), dtype=np.float64)
            for row, vid in enumerate(vids):
                out[row] = _vec_for(int(vid), centers)
            yield pd.DataFrame({"vec_id": vids, "embedding": list(out)})

    return spark.range(n).repartition(parts).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--groups", type=int, default=500)
    ap.add_argument("--n-cells", type=int, default=1024,
                    help="scale with n (cells bound pairwise work AND "
                         "task memory — the paper's ~sqrt(n) rule)")
    ap.add_argument("--threshold", type=float, default=0.995)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ocr_translate_spark.operators.similarity import (
        _assign_cells, semantic_dedup, train_ivf_centroids,
    )

    spark = get_spark("semdedup-probe", cpus=args.cpus)
    vecs = synth_vectors(spark, args.n, args.groups, args.cpus * 2)
    vecs = vecs.localCheckpoint()  # isolate generation from the measurement
    assert vecs.count() == args.n

    # train the quantizer exactly as semantic_dedup would, then pass it
    # in — the probe needs the SAME cells to compute its expectations
    cts = train_ivf_centroids(
        vecs, "vec_id", "embedding", n_cells=args.n_cells, seed=7,
        sample_size=4096,
    )

    t0 = time.monotonic()
    out = semantic_dedup(
        vecs, "vec_id", "embedding",
        threshold=args.threshold, n_cells=args.n_cells,
        centroids=cts,
    ).localCheckpoint()
    n_out = out.count()
    wall = time.monotonic() - t0
    assert n_out == args.n, (n_out, args.n)

    # ---- expected structure from the cell partition -------------------
    planted_cells = {
        r["vec_id"]: int(r["cells"][0])
        for r in _assign_cells(
            vecs.filter(F.col("vec_id") >= GROUP_BASE), cts, "embedding", 1
        ).collect()
    }
    expect_cluster: dict[int, int] = {}  # member id -> expected label
    n_parts_total = 0
    split_triples = 0
    for g in range(args.groups):
        members = [GROUP_BASE + 3 * g + m for m in range(3)]
        parts: dict[int, list[int]] = {}
        for vid in members:
            parts.setdefault(planted_cells[vid], []).append(vid)
        n_parts_total += len(parts)
        if len(parts) > 1:
            split_triples += 1
        for mem in parts.values():
            lab = min(mem)
            for vid in mem:
                expect_cluster[vid] = lab

    got = {r["vec_id"]: (r["sem_cluster"], r["is_rep"]) for r in out.collect()}
    assert len(got) == args.n
    # ambient rows: all singleton representatives
    bad_ambient = [v for v, (c, rep) in got.items()
                   if v < GROUP_BASE and (c != v or not rep)]
    assert not bad_ambient, bad_ambient[:5]
    # planted rows: label == the cell-partition expectation
    bad_label = [(v, got[v][0], expect_cluster[v])
                 for v in expect_cluster if got[v][0] != expect_cluster[v]]
    assert not bad_label, bad_label[:5]
    # one rep per part
    reps_per_label: dict[int, int] = {}
    for v in expect_cluster:
        if got[v][1]:
            reps_per_label[expect_cluster[v]] = reps_per_label.get(expect_cluster[v], 0) + 1
    assert all(c == 1 for c in reps_per_label.values()), reps_per_label
    assert len(reps_per_label) == n_parts_total
    n_kept = sum(1 for (_c, rep) in got.values() if rep)
    assert n_kept == (args.n - 3 * args.groups) + n_parts_total, n_kept

    print(json.dumps({
        "n": args.n, "groups": args.groups, "n_cells": args.n_cells,
        "threshold": args.threshold, "cpus": args.cpus,
        "wall_sec": round(wall, 3),
        "vecs_per_sec": round(args.n / wall, 1),
        "n_kept": n_kept,
        "split_triple_frac": round(split_triples / args.groups, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
