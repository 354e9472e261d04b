"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The reference dedupes by content hash and value interning (Image.md5
unique, ref models/base.py:62-64; Text interning ref models/ocr.py:234).
At corpus scale exact dedup generalizes to near-dup detection; these are
the standard web-corpus dedup families, each built so the expensive
pairwise step only ever runs *within buckets*:

* exact:      hash -> groupBy                       (one shuffle on hash)
* jaccard:    shingle explode -> shingle equi-join   (self-join pruned by
              shingle key; only docs sharing a shingle ever meet)
* minhash:    k minhashes -> banded LSH buckets -> candidate pairs
              (sub-quadratic; the 100 TB-safe path)
* simhash:    64-bit signature -> 16-bit band buckets -> hamming filter

All hashing is JVM-side ``xxhash64`` — deterministic across runs and
cluster sizes, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_dups, keeper, dup_ids).

    keeper = min id (deterministic representative)."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("id").alias("keeper"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per distinct text (min id wins) — the batch form of the
    reference's get_or_create interning (ref models/base.py:33-47)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+", -1), lambda x: x != F.lit("")
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard: (id_a, id_b, jaccard).

    Shingle equi-join prunes the pair space: only documents sharing at
    least one shingle are compared.  At 100 TB the shingle join is the
    shuffle; hot shingles should be pre-filtered by document frequency
    (a stopword-gram hitting every doc makes the join quadratic) — see
    ``max_shingle_df``.
    """
    sh = word_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("set_size"))

    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    out = (
        shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("shared")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """(id, sig array<long>): MinHash signature via k seeded xxhash64 passes.

    One shuffle (groupBy id); hash evaluation is JVM-side over the exploded
    shingles.  Deterministic: seed s is mixed in as a literal column.
    """
    sh = word_shingles(df, id_col, text_col, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(s))).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH: (id_a, id_b, est_jaccard).

    rows-per-band r = num_hashes/bands; two docs collide when any band of
    their signatures is identical — the classic sub-quadratic web-dedup
    scheme (Broder resemblance / MMDS ch.3).  est_jaccard = fraction of
    matching minhashes.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)

    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.concat_ws(",", *[
                        F.col("sig")[b * r + i].cast("string") for i in range(r)
                    ])).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        (matches.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash long): 64-bit SimHash over whitespace tokens.

    Implemented as 64 bit-position majority votes computed JVM-side:
    explode tokens -> per-token xxhash64 -> per-bit +/-1 contributions via
    bit arithmetic -> sum -> sign.  One shuffle (groupBy id).
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+", -1), lambda x: x != F.lit("")
    )
    toks = df.select(F.col(id_col).alias("id"), F.explode(words).alias("tok"))
    toks = toks.withColumn("h", F.xxhash64("tok"))
    # per-bit contribution: +1 when bit set else -1
    bit_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(63)  # bit 63 = sign bit of long; skip to stay ANSI-safe
    ]
    agg = toks.groupBy("id").agg(*bit_sums)
    sig = None
    for b in range(63):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return agg.select("id", sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(simhash) <= max_hamming.

    Banded by the four 16-bit quarters (pigeonhole: <=3 differing bits
    leave at least one quarter identical), so candidate generation is an
    equi-join, not a cross join.
    """
    sigs = simhash_signatures(df, id_col, text_col)
    quarters = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(q).alias("q"),
                    F.shiftrightunsigned(F.col("simhash"), q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qv"),
                )
                for q in range(4)
            ])
        ).alias("qq"),
    ).select("id", "simhash", F.col("qq.q").alias("q"), F.col("qq.qv").alias("qv"))

    a, b = quarters.alias("a"), quarters.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qv") == F.col("b.qv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
