"""Similarity search over an embedding column (array<float>).

Two paths:

* ``brute_force_topk`` — exact cosine top-k via native array expressions
  (``zip_with`` + ``aggregate``), JVM-side.  O(|Q|·|C|): correct baseline,
  fine when |Q| is small or as the within-bucket scorer.
* ``lsh_topk`` — random-hyperplane (SimHash) LSH: sign-pattern buckets
  prune candidates, exact cosine re-ranks within buckets.  The
  sub-quadratic scale path; hyperplanes are seeded-deterministic and
  broadcast once.

Embedding near-duplicate detection (`embedding_near_dups`) composes the
same pieces with a similarity threshold instead of top-k.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def as_double(col) -> "F.Column":
    """Promote array<float> to array<double> BEFORE arithmetic — float32
    multiplies lose precision and won't reproduce across engines."""
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the double-cast vector and its L2 norm (JVM-side)."""
    df = df.withColumn(vec_col, as_double(F.col(vec_col)))
    return df.withColumn("_norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    The query side is broadcast (top-k searches have small |Q|); the corpus
    never shuffles.  Self-matches are excluded.  Ties break on neighbor_id
    for full determinism.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.col("_norm").alias("_cnorm"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("_cvec"), F.col("_qvec")) / (F.col("_cnorm") * F.col("_qnorm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """Deterministic random hyperplanes (Gaussian, seeded)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64)


def add_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Attach a random-hyperplane sign bucket (int) per row.

    Computed in one Arrow pass: the whole batch's embeddings form an
    (n, d) matrix multiplied against the broadcast (p, d) planes — numpy
    BLAS, no per-row Python.
    """
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(first["d"])
    planes = _hyperplanes(dim, n_planes, seed)
    spark = df.sparkSession
    planes_bc = spark.sparkContext.broadcast(planes)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = planes_bc.value
        weights = (1 << np.arange(pl.shape[0])).astype(np.int64)
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy())
            signs = (mat @ pl.T) > 0
            out = pdf.copy()
            out["bucket"] = signs @ weights
            yield out

    return df.mapInPandas(bucketize, schema=f"{fields}, bucket long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket, exact
    cosine re-ranks inside the bucket.  Equi-join on bucket replaces the
    cross join — the piece that survives a 1000-executor scale-up."""
    dim = int(corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"])
    c = add_lsh_bucket(
        with_norm(corpus, vec_col), vec_col, n_planes, seed, dim
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.col("_norm").alias("_cnorm"),
        "bucket",
    )
    q = add_lsh_bucket(
        with_norm(queries, vec_col), vec_col, n_planes, seed, dim
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("_cvec"), F.col("_qvec")) / (F.col("_cnorm") * F.col("_qnorm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-bucketed.

    (id_a, id_b, cosine); only same-bucket pairs are scored."""
    b = add_lsh_bucket(with_norm(df, vec_col), vec_col, n_planes, seed)
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
        F.col("_norm").alias("_na"), "bucket",
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
        F.col("_norm").alias("_nb"), "bucket",
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
