"""Dedup-family capacity probe: the dedup/retrieval operators at ~20-40x
the per-round bench scale (default 200k docs synthesized from the sf0.1
documents table), timing each family and asserting candidate counts stay
bounded — the evidence that the bucket-pruned designs hold as the corpus
grows, the dedup analog of the 1M-page extraction capacity probe in
BENCH/BASELINE.md.

Corpus construction: each source doc is replicated ``--copies`` times
with every word suffixed ``_<k>`` (copy k shares NO shingle/gram with
copy j != k — replication adds volume, not artificial dup cliques), then
~1/20 of the copies take their predecessor's suffix instead, planting
exact duplicates at a realistic web dup rate.  Expected pair counts are
therefore known in closed form and asserted, not eyeballed.

Usage: PYTHONPATH=. python scripts/dedup_capacity_probe.py [--copies 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ocr_translate_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=40)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark("dedup-capacity-probe", cpus=args.cpus)
    # sf0.1 ships a handful of naturally-duplicated source texts; drop
    # them so the planted-dup accounting below is exact closed-form
    docs = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .dropDuplicates(["text"])
    )
    n_src = docs.count()

    copies = spark.range(args.copies).withColumnRenamed("id", "k")
    # dup planting: copy k of doc d reuses suffix k-1 when (7k+d) % 20 == 0
    dup = (F.pmod(F.col("k") * 7 + F.col("doc_id"), F.lit(20)) == 0) & (F.col("k") > 0)
    kk = F.when(dup, F.col("k") - 1).otherwise(F.col("k"))
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+", -1), lambda x: x != F.lit(""))
    big = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * args.copies + F.col("k")).alias("id"),
            F.array_join(
                F.transform(words, lambda w: F.concat(w, F.lit("_"), kk)), " "
            ).alias("text"),
            dup.cast("int").alias("is_dup"),
        )
        .repartition(2 * args.cpus)
        .persist()
    )
    n_docs = big.count()
    n_planted = big.agg(F.sum("is_dup")).first()[0]
    print(f"probe corpus: {n_docs} docs from {n_src} sources, "
          f"{n_planted} planted exact dups", flush=True)

    from ocr_translate_spark.operators import dedup, search, textstats

    results = {}

    t0 = time.monotonic()
    n_groups = dedup.exact_duplicates(big, "id", "text").count()
    results["exact_duplicates"] = time.monotonic() - t0
    # every planted dup joins its predecessor's group; sources are unique
    assert n_groups == n_planted, (n_groups, n_planted)

    t0 = time.monotonic()
    cands = dedup.minhash_lsh_candidates(big, "id", "text").persist()
    n_cands = cands.count()
    n_exact = cands.filter(F.col("est_jaccard") == 1.0).count()
    results["minhash_lsh"] = time.monotonic() - t0
    # every planted exact pair must band-collide; suffixing keeps copies
    # shingle-disjoint so candidates stay ~= planted pairs (no blowup)
    assert n_exact >= n_planted, (n_exact, n_planted)
    assert n_cands <= 3 * n_planted, (n_cands, n_planted)
    cands.unpersist()

    # baseline: the sources naturally share verbatim 16-grams (the
    # generator reuses sentence fragments) — measure that pair count
    # first, since every one of the `copies` suffix groups reproduces it
    p_nat = dedup.shared_ngram_pairs(docs, "doc_id", "text", n=16).count()
    t0 = time.monotonic()
    pairs = dedup.shared_ngram_pairs(big, "id", "text", n=16, max_gram_df=50)
    n_pairs = pairs.count()
    results["shared_ngram_pairs"] = time.monotonic() - t0
    # pairs = planted dups (long docs only) + ~copies x natural pairs
    # (each planted dup also mirrors its doc's natural pairs into the
    # neighbouring suffix group, hence the small slack term)
    bound = n_planted + (args.copies + 6) * p_nat
    assert 0 < n_pairs <= bound, (n_pairs, n_planted, p_nat, bound)

    # --- n-gram Jaccard at 200k (round-3 verdict #5) ------------------
    # 8-word shingles, exact (no df cap): planted exact dups must appear
    # with jaccard == 1.0, so planted coverage is a closed-form equality,
    # not a bound.  Natural >=0.8 pairs replicate per suffix group
    # (suffixing is a word bijection — jaccard is invariant), measured
    # once at source scale; planted dups mirror a slice of them into the
    # neighbouring group, hence the same slack form as shared_ngram.
    p_nat_j = dedup.jaccard_pairs(docs, "doc_id", "text", n=8, threshold=0.8).count()
    n_planted_8w = big.filter(
        (F.col("is_dup") == 1) & (F.size(F.split(F.col("text"), r"\s+", -1)) >= 8)
    ).count()
    t0 = time.monotonic()
    jp = dedup.jaccard_pairs(big, "id", "text", n=8, threshold=0.8).persist()
    n_jp = jp.count()
    results["jaccard_pairs"] = time.monotonic() - t0
    # restrict to >=8-word planted docs so the equality below matches
    # n_planted_8w exactly (a <8-word doc still emits one truncated
    # shingle and its exact dup pairs at jaccard 1.0)
    planted_pairs = big.filter(
        (F.col("is_dup") == 1)
        & (F.size(F.split(F.col("text"), r"\s+", -1)) >= 8)
    ).select((F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b"))
    n_planted_found = jp.filter(F.col("jaccard") == 1.0).join(
        planted_pairs, ["id_a", "id_b"], "left_semi"
    ).count()
    jp.unpersist()
    assert n_planted_found == n_planted_8w, (n_planted_found, n_planted_8w)
    assert n_planted_8w <= n_jp <= n_planted + (args.copies + 6) * p_nat_j, (
        n_jp, n_planted_8w, p_nat_j,
    )

    # --- benchmark decontamination at 200k (round-3 verdict #5) -------
    # eval set: the first 16 words of every 101st copy-0 original (>=16
    # words so the 13-gram window fits).  Contamination is then confined
    # to suffix-0 text: the sampled copy-0 docs themselves (exact
    # closed-form floor, measured on the copy-0 slice) plus at most the
    # planted k=1 dups, which are the only other docs carrying suffix 0.
    wcount = F.size(F.split(F.col("text"), r"\s+", -1))
    evalset = (
        big.filter((F.col("id") % (args.copies * 101) == 0) & (wcount >= 16))
        .select(
            F.array_join(
                F.slice(F.split(F.col("text"), r"\s+", -1), 1, 16), " "
            ).alias("text")
        )
    )
    n_eval = evalset.count()
    copy0 = big.filter(F.col("id") % args.copies == 0)
    flag_src = (
        dedup.decontaminate(copy0, evalset, "id", "text")
        .filter("contaminated").count()
    )
    n_k1 = big.filter((F.col("is_dup") == 1) & (F.col("id") % args.copies == 1)).count()
    t0 = time.monotonic()
    flagged = (
        dedup.decontaminate(big, evalset, "id", "text")
        .filter("contaminated").count()
    )
    results["decontaminate"] = time.monotonic() - t0
    assert n_eval <= flag_src <= flagged <= flag_src + n_k1, (
        n_eval, flag_src, flagged, n_k1,
    )

    t0 = time.monotonic()
    n_pass = (
        textstats.gopher_rules(big, "id", "text", min_words=40, min_stopword_hits=0)
        .filter("passes").count()
    )
    results["gopher_rules"] = time.monotonic() - t0

    t0 = time.monotonic()
    top = search.bm25_topk(
        big, ("data_0", "vector_1", "query_2"), id_col="id", top_k=25
    ).count()
    results["bm25_search"] = time.monotonic() - t0
    assert top == 25

    from ocr_translate_spark.operators import curation, textstats as ts

    t0 = time.monotonic()
    n_scored = ts.rarity_scores(big, "id", "text").count()
    results["rarity_scores"] = time.monotonic() - t0
    assert n_scored == n_docs  # every (non-empty) doc scored

    # frame every doc with one corpus-wide footer line; line dedup must
    # strip exactly that line from every document
    framed = big.select(
        "id", F.concat_ws("\n", F.col("text"), F.lit("probe footer line")).alias("text")
    )
    t0 = time.monotonic()
    ld = curation.drop_boilerplate_lines(framed, "id", "text", n_docs=n_docs)
    n_stripped = ld.filter(F.col("n_dropped") == 1).count()
    results["line_dedup"] = time.monotonic() - t0
    assert n_stripped == n_docs, (n_stripped, n_docs)

    # --- connected components at 200k nodes (round 6) -----------------
    # synthetic graph with closed-form structure: 2000 chains of 100
    # nodes (worst-case diameter for label propagation) plus one hub of
    # degree 50k grafted onto chain 0 (the skew case) — component count
    # and every label are exact expectations, not bounds
    chain_len, n_chains = 100, 2000
    base = spark.range(n_chains * chain_len).withColumnRenamed("id", "src")
    chain_edges = (
        base.filter(F.pmod(F.col("src"), F.lit(chain_len)) != chain_len - 1)
        .select("src", (F.col("src") + 1).alias("dst"))
    )
    hub = 10_000_000
    hub_edges = spark.range(50_000).select(
        F.lit(hub).alias("src"), (F.col("id") + hub + 1).alias("dst")
    ).union(spark.createDataFrame([(0, hub)], "src long, dst long"))
    t0 = time.monotonic()
    labels = dedup.connected_components(
        chain_edges.union(hub_edges), max_iter=12
    ).persist()
    n_nodes = labels.count()
    results["connected_components"] = time.monotonic() - t0
    assert n_nodes == n_chains * chain_len + 50_001, n_nodes
    comp_sizes = {r["component"]: r["n"] for r in
                  labels.groupBy("component").agg(F.count("*").alias("n")).collect()}
    # chain 0 merged with the hub star; chains 1..1999 intact
    assert len(comp_sizes) == n_chains, len(comp_sizes)
    assert comp_sizes[0] == chain_len + 50_001, comp_sizes[0]
    assert all(comp_sizes[c * chain_len] == chain_len for c in range(1, n_chains))
    labels.unpersist()

    # --- cluster-resolved dedup on the 200k text corpus (round 6) -----
    # natural 16-gram sharing makes the cluster COUNT open-form, so the
    # asserts are structural and exact: every planted dup lands in its
    # predecessor's cluster, and every cluster elects exactly one rep
    t0 = time.monotonic()
    dc = dedup.dedup_clusters(big, "id", "text", n=16, max_gram_df=50).persist()
    n_dc = dc.count()
    results["dedup_clusters"] = time.monotonic() - t0
    assert n_dc == n_docs, (n_dc, n_docs)
    planted_long = big.filter(
        (F.col("is_dup") == 1) & (wcount >= 16)
    ).select((F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b"))
    n_long = planted_long.count()
    co = (
        planted_long
        .join(dc.select(F.col("id").alias("id_a"), F.col("cluster").alias("ca")), "id_a")
        .join(dc.select(F.col("id").alias("id_b"), F.col("cluster").alias("cb")), "id_b")
        .filter(F.col("ca") == F.col("cb")).count()
    )
    assert co == n_long, (co, n_long)
    bad_reps = (
        dc.groupBy("cluster").agg(F.sum(F.col("is_rep").cast("int")).alias("r"))
        .filter(F.col("r") != 1).count()
    )
    assert bad_reps == 0, bad_reps

    # --- span excision at 200k docs (round 6) -------------------------
    # every doc = 24 globally-unique words + one corpus-wide 8-word
    # footer: the footer gram is the ONLY duplicated 8-gram (straddling
    # grams contain a unique word), so exactly 8 positions excise per doc
    span_docs = spark.range(n_docs).select(
        F.col("id"),
        F.concat(
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(24)),
                    lambda j: F.concat(F.lit("u"), F.col("id"), F.lit("_"), j),
                ), " "
            ),
            F.lit(" probe footer span words alpha beta gamma delta"),
        ).alias("text"),
    ).repartition(2 * args.cpus)
    t0 = time.monotonic()
    ex = curation.excise_dup_spans(span_docs, "id", "text", n=8).persist()
    n_ex = ex.count()
    tot_removed = ex.agg(F.sum("n_removed")).first()[0]
    results["excise_dup_spans"] = time.monotonic() - t0
    assert n_ex == n_docs and tot_removed == 8 * n_docs, (n_ex, tot_removed)
    assert ex.filter(F.col("n_removed") != 8).count() == 0
    ex.unpersist()

    # --- quality tiering at 200k docs (round 6, threshold path) -------
    # the distributed path end-to-end: one approxQuantile sketch pass for
    # bounds, threshold tier map, sqrt-temperature quotas; keep counts
    # must equal the quota in EVERY (tier, group) cell
    scored = big.select(
        "id",
        (F.pmod(F.xxhash64(F.col("id")), F.lit(10_000)) / 10_000.0).alias("quality"),
        F.pmod(F.col("id"), F.lit(37)).cast("string").alias("grp"),
    )
    t0 = time.monotonic()
    bounds = curation.approx_tier_bounds(scored, "quality", n_tiers=4)
    qt = curation.quality_tiers(
        scored, id_col="id", quality_col="quality", group_col="grp",
        n_tiers=4, quota_coeff=8.0, tier_bounds=bounds,
    ).persist()
    n_qt = qt.count()
    results["quality_tiers"] = time.monotonic() - t0
    assert n_qt == n_docs, (n_qt, n_docs)
    cells = qt.groupBy("tier", "grp").agg(
        F.count("*").alias("m"), F.first("group_n").alias("gn"),
        F.first("quota").alias("q"), F.sum(F.col("keep").cast("int")).alias("kept"),
    ).collect()
    import math as _math
    for c in cells:
        assert c["gn"] == c["m"], (c["tier"], c["grp"], c["gn"], c["m"])
        assert c["q"] == min(c["m"], _math.floor(8.0 * _math.sqrt(c["m"])))
        assert c["kept"] == c["q"], (c["tier"], c["grp"], c["kept"], c["q"])
    qt.unpersist()
    dc.unpersist()

    print(f"gopher passing docs: {n_pass}; minhash candidates: {n_cands} "
          f"(exact {n_exact}); shared-gram pairs: {n_pairs}", flush=True)
    for name, sec in results.items():
        print(f"{name:22s} {sec:8.2f} s  ({n_docs / sec:9.0f} docs/sec)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
