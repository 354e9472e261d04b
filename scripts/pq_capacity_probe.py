"""PQ capacity probe (r4 verdict #6): product quantization at the
200k-vector scale — recall vs brute force, ADC-scan speed, and the
codes-table memory figure (the "~64x smaller scan" claim, measured as
written parquet bytes, not asserted from arithmetic).

Corpus: 200k 64-dim float32 vectors in 16 clusters (center + noise,
sigma chosen so the 256-centroid-per-subspace codebooks SUBDIVIDE each
cluster — with clusters >> centroids every member quantizes to the same
code and ADC cannot rank within a cluster at all; the first version of
this probe measured exactly that, recall 0.10 at 256 clusters), plus 10
planted TRUE near-neighbors per query (query + tiny noise, cosine
~0.9998 vs ~0.98 ambient) so brute-force ground truth is well-separated
rather than a tie-break lottery.  All vectors deterministic per id.

Asserts:
* recall@10 vs brute force >= 0.8 over 64 query vectors (rerank=256,
  i.e. a 0.13% re-rank scan of the corpus);
* the degenerate config (rerank >= corpus) EQUALS brute force exactly;
* codes parquet is at least 10x smaller than the vectors parquet.

Usage: PYTHONPATH=. python scripts/pq_capacity_probe.py [--n 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ocr_translate_spark.session import get_spark

SCRATCH = "/dev/shm/pq_probe"
DIM = 64
N_CLUSTERS = 16
N_QUERIES = 64
PLANTS_PER_QUERY = 10
PLANT_BASE = 10_000_000  # ids >= this are planted neighbors of query (id-BASE)//10


def _vec_for(vid: int, centers: np.ndarray) -> np.ndarray:
    if vid >= PLANT_BASE:
        qi = (vid - PLANT_BASE) // PLANTS_PER_QUERY
        r = np.random.RandomState(200_003 + vid)
        return _vec_for(qi, centers) + 0.02 * r.randn(DIM)
    r = np.random.RandomState(100_003 + vid)
    return centers[vid % N_CLUSTERS] + 0.3 * r.randn(DIM)


def synth_vectors(spark, n: int, parts: int):
    """(vec_id, embedding float32[64]): cluster member or planted
    near-neighbor — deterministic per id, generated distributed (no
    driver-side materialization).  The last N_QUERIES*PLANTS_PER_QUERY
    ids are remapped into the plant range."""
    rng = np.random.RandomState(7)
    centers = rng.randn(N_CLUSTERS, DIM).astype(np.float64)
    n_plants = N_QUERIES * PLANTS_PER_QUERY

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vids = np.where(ids >= n - n_plants, ids - (n - n_plants) + PLANT_BASE, ids)
            out = np.empty((len(ids), DIM), dtype=np.float32)
            for row, vid in enumerate(vids):
                out[row] = _vec_for(int(vid), centers).astype(np.float32)
            yield pd.DataFrame({"vec_id": vids, "embedding": list(out)})

    return spark.range(n).repartition(parts).mapInPandas(
        gen, "vec_id long, embedding array<float>"
    )


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--queries", type=int, default=N_QUERIES)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--rerank", type=int, default=256)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    os.makedirs(SCRATCH, exist_ok=True)
    spark = get_spark("pq-capacity-probe", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from ocr_translate_spark.operators import similarity

    vec_path = os.path.join(SCRATCH, f"vecs_{args.n}")
    if not os.path.exists(os.path.join(vec_path, "_SUCCESS")):
        synth_vectors(spark, args.n, 2 * args.cpus).write.mode("overwrite").parquet(vec_path)
    corpus = spark.read.parquet(vec_path)
    queries = corpus.filter(F.col("vec_id") < args.queries)

    t0 = time.monotonic()
    cbs = similarity.train_pq_codebooks(
        corpus, n_subspaces=8, n_centroids=256, sample_size=4096
    )
    t_train = time.monotonic() - t0

    codes_path = os.path.join(SCRATCH, "codes")
    t0 = time.monotonic()
    codes_df = similarity.pq_encode(corpus, cbs)
    codes_df.write.mode("overwrite").parquet(codes_path)
    t_encode = time.monotonic() - t0
    codes = spark.read.parquet(codes_path)  # (id, codes) — pq_topk's contract

    vec_bytes, code_bytes = dir_bytes(vec_path), dir_bytes(codes_path)

    # brute-force ground truth
    t0 = time.monotonic()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(corpus, queries, k=args.k).collect()
    }
    t_brute = time.monotonic() - t0

    # PQ ADC + exact re-rank
    t0 = time.monotonic()
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk(
            codes, corpus, queries, cbs, k=args.k, rerank=args.rerank
        ).collect()
    }
    t_pq = time.monotonic() - t0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall

    # degenerate certificate at capacity: rerank >= corpus == brute force
    sub_q = corpus.filter(F.col("vec_id") < 8)
    ex = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.brute_force_topk(corpus, sub_q, k=5).collect()
    )
    fx = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.pq_topk(
            codes, corpus, sub_q, cbs, k=5, rerank=args.n + 1
        ).collect()
    )
    assert ex == fx, "full-rerank PQ must equal brute force at capacity"

    assert code_bytes * 10 <= vec_bytes, (code_bytes, vec_bytes)

    print(json.dumps({
        "probe": "pq_capacity",
        "n_vectors": args.n,
        "dim": DIM,
        "recall_at_k": round(recall, 4),
        "k": args.k,
        "rerank": args.rerank,
        "train_sec": round(t_train, 2),
        "encode_sec": round(t_encode, 2),
        "brute_force_sec": round(t_brute, 2),
        "pq_topk_sec": round(t_pq, 2),
        "vectors_parquet_mb": round(vec_bytes / 1e6, 1),
        "codes_parquet_mb": round(code_bytes / 1e6, 1),
        "scan_shrink_factor": round(vec_bytes / code_bytes, 1),
    }))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
