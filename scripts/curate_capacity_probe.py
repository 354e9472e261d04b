"""curate_corpus capacity probe (r4 verdict #5): the full curation
composition at the 200k-doc probe scale with PLANTED casualties per
stage and closed-form / bracketed survivor asserts — the end-to-end
analog of dedup_capacity_probe's per-operator asserts.

Corpus: the dedup probe's construction (sf0.1 documents x ``--copies``
suffix groups, planted exact dups at ~1/20), then per-stage plants:

* quality   — every ``id % 997 == 0`` doc's text is replaced with
              symbol junk that fails the Gopher battery outright;
* line dedup— one corpus-wide footer line appended to every doc
              (df = 100% > max_line_frac, must be stripped everywhere);
* exact dup — the probe corpus's planted duplicate pairs (id-1, id);
* near dup  — run at est_jaccard == 1.0; non-planted full-signature
              collisions measured independently bound the stage delta;
* decontam  — eval set built from the first 16 words of sampled copy-0
              docs; those source docs must be ABSENT from the output;
* split     — binomial bracket on the val fraction.

Every expectation is computed from the INPUT's construction columns
(is_dup, word counts, plant moduli) or an independently-asserted
operator run — never from the stage under test.

Usage: PYTHONPATH=. python scripts/curate_capacity_probe.py [--copies 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ocr_translate_spark.session import get_spark

FOOTER = "probe footer boilerplate line"
JUNK = ":::: ~~~~ !!!! #### " * 12
JUNK_MOD = 997
GOPHER_KW = dict(min_words=40, min_stopword_hits=0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=40)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--incremental", action="store_true",
                    help="also run curate_incremental as two parity-split "
                         "batches (every planted dup pair straddles the "
                         "boundary) and assert count-convergence with the "
                         "single-shot run")
    args = ap.parse_args()

    spark = get_spark("curate-capacity-probe", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .dropDuplicates(["text"])
    )
    copies = spark.range(args.copies).withColumnRenamed("id", "k")
    dup = (F.pmod(F.col("k") * 7 + F.col("doc_id"), F.lit(20)) == 0) & (F.col("k") > 0)
    kk = F.when(dup, F.col("k") - 1).otherwise(F.col("k"))
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+", -1), lambda x: x != F.lit(""))
    base = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * args.copies + F.col("k")).alias("id"),
            F.array_join(
                F.transform(words, lambda w: F.concat(w, F.lit("_"), kk)), " "
            ).alias("text"),
            dup.cast("int").alias("is_dup"),
        )
    )
    junked = F.pmod(F.col("id"), F.lit(JUNK_MOD)) == 0
    planted = (
        base.select(
            "id",
            F.when(junked, F.lit(JUNK)).otherwise(F.col("text")).alias("text"),
            "is_dup",
            junked.cast("int").alias("is_junk"),
            F.size(F.filter(F.split(F.col("text"), r"\s+", -1),
                            lambda x: x != F.lit(""))).alias("wc"),
        )
        .repartition(2 * args.cpus)
        .persist()
    )
    n_docs = planted.count()
    n_junk = planted.agg(F.sum("is_junk")).first()[0]

    # ---- independent per-stage expectations (from construction columns)
    # quality survivors: non-junk docs passing the word-count gate; the
    # battery's other rules are vacuous for the generator's natural text
    # (alphabetic words, sane lengths, no bullets) — asserted EXACTLY.
    # NB the framed footer adds words, so frame BEFORE computing wc_in.
    framed = planted.select(
        "id", F.concat_ws("\n", F.col("text"), F.lit(FOOTER)).alias("text"),
        "is_dup", "is_junk", "wc",
    ).persist()
    wc_in = F.col("wc") + 4  # footer contributes 4 words pre-strip
    q_surv = framed.filter((F.col("is_junk") == 0) & (wc_in >= 40) & (wc_in <= 100_000))
    exp_quality = q_surv.count()
    # post line-strip the footer words are gone: length gate re-applies
    # to the ORIGINAL word count
    ld_surv = q_surv.filter(F.col("wc") >= 40).select("id", "is_dup").persist()
    exp_line_dedup = ld_surv.count()
    # planted pair (id-1, id) collapses iff BOTH endpoints reached stage 4
    surv_ids = ld_surv.select("id")
    exp_exact_drops = (
        ld_surv.filter(F.col("is_dup") == 1)
        .select((F.col("id") - 1).alias("id"))
        .join(surv_ids, "id", "left_semi")
        .count()
    )
    exp_exact = exp_line_dedup - exp_exact_drops

    # near-dup stage bound: non-planted est==1.0 collisions, measured by
    # the independently-asserted minhash operator on the post-exact set's
    # superset (the full planted corpus) — the stage can drop at most
    # one endpoint per such pair
    from ocr_translate_spark.operators import dedup as dd

    cands = dd.minhash_lsh_candidates(framed, "id", "text").persist()
    planted_pairs = framed.filter(F.col("is_dup") == 1).select(
        (F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b")
    )
    n_est1_nonplanted = (
        cands.filter(F.col("est_jaccard") == 1.0)
        .join(planted_pairs, ["id_a", "id_b"], "left_anti")
        .count()
    )
    cands.unpersist()

    # decontamination evalset: first 16 words of every 101st copy-0
    # original (same shape as the dedup probe); the SOURCE docs must not
    # appear in the curated output
    wcount = F.size(F.split(F.col("text"), r"\s+", -1))
    eval_src = framed.filter(
        (F.col("id") % (args.copies * 101) == 0) & (F.col("is_junk") == 0)
        & (wcount >= 16)
    ).persist()
    evalset = eval_src.select(
        F.array_join(F.slice(F.split(F.col("text"), r"\s+", -1), 1, 16), " ").alias("text")
    )
    n_eval = evalset.count()

    # ---- the composition under test ---------------------------------
    from ocr_translate_spark.curate import curate_corpus

    t0 = time.monotonic()
    out, rep = curate_corpus(
        framed.select("id", "text"), id_col="id", text_col="text",
        benchmark=evalset, near_threshold=1.0, min_words=40,
        max_line_frac=0.3, val_fraction=0.1, scrub=False,
        gopher_kwargs=GOPHER_KW,
    )
    wall = time.monotonic() - t0

    # ---- asserts ------------------------------------------------------
    r = rep.as_dict()
    assert r["n_input"] == n_docs, (r, n_docs)
    assert r["n_after_quality"] == exp_quality, (r, exp_quality)
    assert r["n_after_line_dedup"] == exp_line_dedup, (r, exp_line_dedup)
    assert r["n_after_exact_dedup"] == exp_exact, (r, exp_exact)
    near_drops = r["n_after_exact_dedup"] - r["n_after_near_dedup"]
    assert 0 <= near_drops <= n_est1_nonplanted, (near_drops, n_est1_nonplanted)
    dec_drops = r["n_after_near_dedup"] - r["n_after_decontamination"]
    assert dec_drops >= 0
    assert r["n_output"] == r["n_after_decontamination"]
    # binomial bracket: val fraction 0.1 +- 5 sigma
    import math

    n, p = r["n_output"], 0.1
    sigma = math.sqrt(n * p * (1 - p))
    assert abs(r["n_val"] - n * p) <= 5 * sigma + 1, (r["n_val"], n * p, sigma)

    out = out.persist()
    # footer stripped from every survivor; junk and eval sources absent
    assert out.filter(F.col("text").contains(FOOTER)).count() == 0
    assert out.join(eval_src.select("id"), "id", "left_semi").count() == 0
    assert out.filter(F.pmod(F.col("id"), F.lit(JUNK_MOD)) == 0).count() == 0

    inc_result = None
    if args.incremental:
        # parity split: planted pairs are (id-1, id), so EVERY pair
        # straddles the batch boundary — cross-batch dedup is exercised
        # for each of them; counts must converge to the single-shot run
        # (keeper identities may differ, survivor COUNT may not)
        import tempfile
        import time as _t

        from ocr_translate_spark.curate import CURATED_TABLE, curate_incremental
        from ocr_translate_spark.io.tables import open_warehouse

        wh_root = tempfile.mkdtemp(prefix="inc_probe_", dir="/dev/shm")
        kw = dict(near_threshold=1.0, min_words=40, max_line_frac=0.3,
                  val_fraction=0.1, scrub=False, gopher_kwargs=GOPHER_KW,
                  benchmark=evalset)
        t0 = _t.monotonic()
        _, ra = curate_incremental(
            spark, wh_root, framed.filter(F.col("id") % 2 == 0).select("id", "text"),
            id_col="id", text_col="text", **kw)
        _, rb = curate_incremental(
            spark, wh_root, framed.filter(F.col("id") % 2 == 1).select("id", "text"),
            id_col="id", text_col="text", **kw)
        inc_wall = _t.monotonic() - t0
        wh = open_warehouse(spark, wh_root)
        n_final = wh.read(spark, CURATED_TABLE).count()
        # replay batch B: ledger + rejection idempotence at scale
        _, rr = curate_incremental(
            spark, wh_root, framed.filter(F.col("id") % 2 == 1).select("id", "text"),
            id_col="id", text_col="text", **kw)
        assert rr.n_appended == 0, rr.as_dict()
        # convergence: same survivor count as the single-shot composition
        # (near dedup at est==1.0 can differ by at most the non-planted
        # est1 collisions whose endpoints were split across batches and
        # each survived its own batch — bounded by the same measurement)
        assert abs(n_final - r["n_output"]) <= n_est1_nonplanted, (
            n_final, r["n_output"], n_est1_nonplanted)
        import shutil as _sh
        _sh.rmtree(wh_root, ignore_errors=True)
        inc_result = {
            "batch_a": ra.as_dict(), "batch_b": rb.as_dict(),
            "n_final": n_final, "single_shot_n_output": r["n_output"],
            "wall_sec": round(inc_wall, 2),
        }

    print(json.dumps({
        "probe": "curate_capacity",
        "n_docs": n_docs,
        "n_junk": int(n_junk),
        "n_eval": n_eval,
        "report": r,
        "expected": {
            "quality": exp_quality, "line_dedup": exp_line_dedup,
            "exact_dedup": exp_exact,
            "near_drop_bound": n_est1_nonplanted,
        },
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "incremental": inc_result,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
