"""Four-stage pipeline composition: crawl -> extract -> curate -> tier,
every stage resumable (the README/SURVEY claim, tested as ONE chain).

The interrupted run processes part of the crawl through all three
streams, is "killed" (streams stopped, ALL checkpoints discarded), the
crawl grows, and the whole pipeline restarts from scratch over the full
source dirs — replayed micro-batches must be no-ops at every stage
(warehouse ledgers, not streaming state, carry resume).  The final
warehouses must be IDENTICAL to an uninterrupted pipeline driven over
the same micro-batch sequence without the kill: same extracted bytes,
same curated survivor set, same tier bounds, same kept tier rows, same
quota ledgers.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from ocr_translate_spark.corpus import pages_df
from ocr_translate_spark.curate import read_curated
from ocr_translate_spark.io.tables import open_warehouse
from ocr_translate_spark.pipeline import read_extracted
from ocr_translate_spark.streaming.curate_stream import (
    run_curation_stream, run_tiered_stream,
)
from ocr_translate_spark.streaming.extract_stream import run_extraction_stream

CURATE_KW = dict(
    id_col="url", text_col="text", min_words=5, scrub=False,
    gopher_kwargs={"min_stopword_hits": 0},
)
TIER_KW = dict(id_col="url", text_col="text", n_tiers=2, quota_coeff=3.0)


def _write_file(pdf, path: str, mtime: float) -> None:
    pdf.sort_values("url").reset_index(drop=True).to_parquet(
        path, coerce_timestamps="us", allow_truncated_timestamps=True
    )
    os.utime(path, (mtime, mtime))


def _extracted_docs(spark, wh_ex: str):
    return (
        read_extracted(spark, wh_ex)
        .select("url", F.col("extracted_text").alias("text"))
        .toPandas()
    )


def _tier_state(spark, wh_root: str):
    wh = open_warehouse(spark, wh_root)
    tiered = {
        (r["url"], r["tier"]) for r in
        wh.read(spark, "tiered").select("url", "tier").collect()
    }
    bounds = sorted(
        (r["tier"], r["cutoff"]) for r in wh.read(spark, "tier_bounds").collect()
    )
    counts = {
        (r["tier"], r["grp"]): (r["s"], r["k"]) for r in
        wh.read(spark, "tier_counts").groupBy("tier", "grp").agg(
            F.sum("n_seen").alias("s"), F.sum("n_kept").alias("k")
        ).collect()
    }
    return tiered, bounds, counts


@pytest.mark.slow
def test_four_stage_composition_survives_kill_restart(spark, tmp_path):
    pages = pages_df(spark, 48).toPandas().sort_values("url").reset_index(drop=True)
    files = [pages.iloc[0:16], pages.iloc[16:32], pages.iloc[32:48]]
    now = time.time()

    # ---- interrupted pipeline (warehouse set 1) ----------------------
    pages1 = str(tmp_path / "pages1"); os.makedirs(pages1)
    docs1 = str(tmp_path / "docs1"); os.makedirs(docs1)
    tdocs1 = str(tmp_path / "tdocs1"); os.makedirs(tdocs1)
    ex1, cur1, tier1 = (str(tmp_path / w) for w in ("ex1", "cur1", "tier1"))
    ck = str(tmp_path / "ck")

    # phase A: two crawl files through all three stages
    for i in (0, 1):
        _write_file(files[i], f"{pages1}/p{i}.parquet", now - 90 + 10 * i)
    run_extraction_stream(spark, pages1, ex1, checkpoint_dir=f"{ck}/ex-a")
    _write_file(_extracted_docs(spark, ex1), f"{docs1}/d0.parquet", now - 70)
    rep_a = run_curation_stream(
        spark, docs1, cur1, checkpoint_dir=f"{ck}/cur-a", **CURATE_KW
    )
    assert rep_a[0]["n_appended"] > 0
    _write_file(
        read_curated(spark, cur1).toPandas()[["url", "text"]],
        f"{tdocs1}/t0.parquet", now - 60,
    )
    tier_rep_a = run_tiered_stream(
        spark, tdocs1, tier1, checkpoint_dir=f"{ck}/tier-a", **TIER_KW
    )
    assert tier_rep_a[0]["first_batch"] and tier_rep_a[0]["n_kept"] > 0

    # KILL: streams are gone, every checkpoint is lost.  The crawl grows.
    _write_file(files[2], f"{pages1}/p2.parquet", now - 50)

    # phase B: restart the whole pipeline from scratch, fresh checkpoints
    st_b = run_extraction_stream(spark, pages1, ex1, checkpoint_dir=f"{ck}/ex-b")
    # replayed crawl files commit nothing; only the new file extracts
    assert [s["n_written"] for s in st_b[:2]] == [0, 0]
    assert st_b[2]["n_written"] > 0
    _write_file(_extracted_docs(spark, ex1), f"{docs1}/d1.parquet", now - 40)
    rep_b = run_curation_stream(
        spark, docs1, cur1, checkpoint_dir=f"{ck}/cur-b", **CURATE_KW
    )
    assert rep_b[0]["n_appended"] == 0          # replayed docs file: no-op
    assert sum(r["n_appended"] for r in rep_b) > 0
    _write_file(
        read_curated(spark, cur1).toPandas()[["url", "text"]],
        f"{tdocs1}/t1.parquet", now - 30,
    )
    tier_rep_b = run_tiered_stream(
        spark, tdocs1, tier1, checkpoint_dir=f"{ck}/tier-b", **TIER_KW
    )
    assert tier_rep_b[0]["n_new"] == 0          # replayed tier file: no-op
    assert not tier_rep_b[0].get("first_batch", False)

    # ---- uninterrupted baseline (warehouse set 2): the same micro-batch
    # sequence, driven end to end with no kill ------------------------
    pages2 = str(tmp_path / "pages2"); os.makedirs(pages2)
    docs2 = str(tmp_path / "docs2"); os.makedirs(docs2)
    tdocs2 = str(tmp_path / "tdocs2"); os.makedirs(tdocs2)
    ex2, cur2, tier2 = (str(tmp_path / w) for w in ("ex2", "cur2", "tier2"))

    for i in (0, 1, 2):
        _write_file(files[i], f"{pages2}/p{i}.parquet", now - 90 + 10 * i)
    run_extraction_stream(spark, pages2, ex2, checkpoint_dir=f"{ck}/ex-u")
    all_docs = _extracted_docs(spark, ex2)
    a_urls = set(files[0]["url"]) | set(files[1]["url"])
    _write_file(all_docs[all_docs["url"].isin(a_urls)],
                f"{docs2}/d0.parquet", now - 70)
    _write_file(all_docs, f"{docs2}/d1.parquet", now - 40)
    rep_u = run_curation_stream(
        spark, docs2, cur2, checkpoint_dir=f"{ck}/cur-u", **CURATE_KW
    )
    first_cur_snap = rep_u[0]["snapshot_id"]
    _write_file(
        read_curated(spark, cur2, snapshot_id=first_cur_snap)
        .toPandas()[["url", "text"]],
        f"{tdocs2}/t0.parquet", now - 60,
    )
    _write_file(
        read_curated(spark, cur2).toPandas()[["url", "text"]],
        f"{tdocs2}/t1.parquet", now - 30,
    )
    run_tiered_stream(spark, tdocs2, tier2, checkpoint_dir=f"{ck}/tier-u",
                      **TIER_KW)

    # ---- the restarted pipeline converged to the uninterrupted state --
    ext1 = {(r["url"], r["extracted_text"])
            for r in read_extracted(spark, ex1).collect()}
    ext2 = {(r["url"], r["extracted_text"])
            for r in read_extracted(spark, ex2).collect()}
    assert ext1 == ext2 and len(ext1) == 48

    cur_rows1 = {(r["url"], r["text"], r["split"])
                 for r in read_curated(spark, cur1).collect()}
    cur_rows2 = {(r["url"], r["text"], r["split"])
                 for r in read_curated(spark, cur2).collect()}
    assert cur_rows1 == cur_rows2 and cur_rows1

    t1_state = _tier_state(spark, tier1)
    t2_state = _tier_state(spark, tier2)
    assert t1_state == t2_state
    assert t1_state[0]  # kept tier rows exist
