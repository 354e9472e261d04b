"""End-to-end training-data curation pipeline: the composition a user of
the extraction engine actually runs between "raw extracted pages" and
"tokenizer-ready corpus".

Stage order follows the published pipelines (C4 -> Gopher -> RefinedWeb /
FineWeb all converge on roughly this sequence — each stage removes mass
the later, more expensive stages would otherwise pay for):

1. quality gate        — Gopher rule battery (narrow map, scan speed)
2. line dedup          — corpus-frequency boilerplate-line removal (C4)
3. PII scrub           — email/phone redaction (narrow map)
4. exact dedup         — one doc per identical text (md5 group, min id)
5. near dedup          — MinHash-LSH candidates, greedy keep-smallest-id
6. decontamination     — 13-gram overlap vs an eval suite (optional)
7. split + length gate — salted-hash train/val; post-clean min length

Every stage is one of the §2 / LLM-pipeline operators with its own
driver oracle; this module only composes them, adds the keeper policy,
and returns per-stage counts so a run is auditable (the analog of the
extraction pipeline's metrics lineage).

Near-dedup keeper policy: a candidate pair (a, b) with
``est_jaccard >= near_threshold`` (a < b by construction) drops ``b`` —
the standard greedy "keep first" web-dedup policy (equivalent to one
step of min-id label propagation; transitive chains collapse to their
minimum over repeated runs, and at one pass no surviving pair is a
near-dup).  One distinct + one broadcast-able anti-join — no iterative
connected components on the hot path.

Scale notes: stages 1-3 and 7 are shuffle-free narrow maps; stage 4 is
one hash shuffle on md5; stage 5 is the banded LSH join (payload-light,
probed at 200k docs — see BENCH/BASELINE.md); stage 6's build side is
the eval suite's distinct gram hashes.  Stage order puts the narrow
filters before every shuffle so the expensive stages see only surviving
mass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from .operators import curation, dedup, textstats, urls


@dataclass
class CurationReport:
    """Per-stage survivor counts (documents entering -> leaving)."""

    n_input: int = 0
    n_after_url_filter: int = 0
    n_after_quality: int = 0
    n_after_line_dedup: int = 0
    n_after_exact_dedup: int = 0
    n_after_near_dedup: int = 0
    n_after_decontamination: int = 0
    n_output: int = 0
    n_val: int = 0
    stages: list[str] = field(default_factory=list)

    def as_dict(self) -> dict:
        return {k: getattr(self, k) for k in (
            "n_input", "n_after_url_filter", "n_after_quality", "n_after_line_dedup",
            "n_after_exact_dedup", "n_after_near_dedup",
            "n_after_decontamination", "n_output", "n_val",
        )} | {"stages": list(self.stages)}


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    benchmark: DataFrame | None = None,
    blocklist: DataFrame | None = None,
    max_per_host: int | None = None,
    url_col: str | None = None,
    near_threshold: float = 0.8,
    min_words: int = 20,
    max_line_frac: float = 0.3,
    val_fraction: float = 0.1,
    scrub: bool = True,
    gopher_kwargs: dict | None = None,
) -> tuple[DataFrame, CurationReport]:
    """Run the full curation sequence; returns (curated_df, report).

    ``curated_df`` columns: (id_col, text_col, split) — text is the
    cleaned/scrubbed form; ``split`` is the salted-hash train/val label.
    ``benchmark`` (optional) is the eval-suite DataFrame for stage 6; it
    needs a ``text`` column.  ``blocklist`` (optional, one ``host``
    column) and ``max_per_host`` (optional quota) switch on a stage-0
    url filter over ``url_col``, which MUST be passed explicitly when
    either is set — defaulting to ``id_col`` silently produced empty
    host keys on non-url ids, and an empty-host corpus under
    ``max_per_host`` would truncate to the cap.  (The operators
    themselves also exempt empty-host rows — see urls.host_caps /
    urls.filter_blocklisted_hosts — so even a partially url-keyed
    column is safe.)  Both filters run BEFORE any payload work, per the
    C4/RefinedWeb ordering: broadcast host-blocklist anti-join +
    deterministic per-host cap.

    The report's counts are computed with one action per stage boundary
    — acceptable for an audited batch run (each is a count over an
    already-needed intermediate); pass-through composition without
    counts is just chaining the operators directly.

    Cache lifecycle: stages 2 and 5 persist their shared-scan
    intermediates (see dedup.minhash_lsh_candidates); a long-lived
    session cycling many corpora should ``spark.catalog.clearCache()``
    between corpora once the curated output is written.
    """
    report = CurationReport()
    report.n_input = df.count()

    # 0. url filters — host blocklist + per-host quota, before any
    # payload-touching stage (both corpus-shuffle-free: broadcast anti
    # join + a host-keyed window)
    if (blocklist is not None or max_per_host) and url_col is None:
        raise ValueError(
            "curate_corpus: blocklist/max_per_host need an explicit "
            "url_col — a non-url id column would yield empty host keys "
            "for every row (nothing to block, nothing to cap)"
        )
    ucol = url_col or id_col
    if blocklist is not None:
        df = urls.filter_blocklisted_hosts(df, blocklist, url_col=ucol)
        report.stages.append("host_blocklist")
    if max_per_host:
        df = urls.host_caps(df, url_col=ucol, max_per_host=max_per_host)
        report.stages.append("host_caps")
    if blocklist is not None or max_per_host:
        report.n_after_url_filter = df.count()
    else:
        report.n_after_url_filter = report.n_input

    # 1. quality gate — narrow map; scores every doc, keeps passers
    gk = dict(gopher_kwargs or {})
    gk.setdefault("min_words", min_words)
    passing = (
        textstats.gopher_rules(df, id_col, text_col, **gk)
        .filter("passes")
        .select(F.col("doc_id").alias(id_col))
    )
    cur = df.join(passing, id_col, "left_semi")
    report.n_after_quality = cur.count()
    report.stages.append("gopher_rules")

    # 2. line dedup — rebuild docs minus corpus-frequent lines
    rebuilt = curation.drop_boilerplate_lines(
        cur, id_col, text_col,
        max_line_frac=max_line_frac, n_docs=report.n_after_quality,
    ).select(
        F.col("doc_id").alias(id_col), F.col("clean_text").alias(text_col)
    )
    # post-clean length gate: docs that were mostly boilerplate die here
    # (the C4 ordering — line dedup first, then the length filter)
    words = F.filter(
        F.split(F.col(text_col), r"\s+", -1), lambda x: x != F.lit("")
    )
    cur = rebuilt.filter(F.size(words) >= min_words)
    report.n_after_line_dedup = cur.count()
    report.stages.append("line_dedup")

    # 3. PII scrub — narrow map on the surviving text
    if scrub:
        cur = cur.withColumn(text_col, curation.scrub_pii(F.col(text_col)))
        report.stages.append("pii_scrub")

    # 4. exact dedup — min id per identical text
    cur = dedup.dedup_exact(cur, id_col, text_col)
    report.n_after_exact_dedup = cur.count()
    report.stages.append("dedup_exact")

    # 5. near dedup — greedy keep-smallest-id over LSH candidates
    drops = (
        dedup.minhash_lsh_candidates(cur, id_col, text_col)
        .filter(F.col("est_jaccard") >= near_threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    cur = cur.join(drops, id_col, "left_anti")
    report.n_after_near_dedup = cur.count()
    report.stages.append("minhash_lsh")

    # 6. decontamination — drop docs sharing a 13-gram with the eval suite
    if benchmark is not None:
        flags = dedup.decontaminate(cur, benchmark, id_col, text_col)
        clean_ids = flags.filter(~F.col("contaminated")).select(
            F.col("doc_id").alias(id_col)
        )
        cur = cur.join(clean_ids, id_col, "left_semi")
        report.stages.append("decontaminate")
        report.n_after_decontamination = cur.count()
    else:
        # nothing changed; don't re-run the whole plan for the same number
        report.n_after_decontamination = report.n_after_near_dedup

    # 7. reproducible split — salted content-hash buckets
    out = curation.split_by_hash(cur, id_col, val_fraction=val_fraction)
    report.stages.append("train_val_split")
    report.n_output = report.n_after_decontamination
    report.n_val = out.filter(F.col("split") == "val").count()
    return out, report
