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

from contextlib import contextmanager
from dataclasses import dataclass, field
from functools import wraps

from pyspark.sql import DataFrame, Observation, functions as F

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


@contextmanager
def _aqe_empty_rule_excluded(spark):
    """Exclude AQEPropagateEmptyRelation while an observe()-audited plan
    is BUILT and run: if some stage empties the corpus at runtime (an
    aggressive quality gate, a fully-memoized replay batch), that rule
    replaces the upstream subtrees — CollectMetrics included — with empty
    relations, completing their observations with a schema-less row
    (toPyRow assertion) and losing the true upstream counts.  Empty
    pipelines are cheap; honest audit counts are not optional.

    The exclusion must cover ``persist()`` calls, not just the terminal
    action: caching compiles the cached physical plan EAGERLY with the
    session conf at persist() time, so an exclusion set only around the
    final count leaves the cached subtree free to propagate emptiness
    through its CollectMetrics nodes at materialization (observed:
    curate_incremental's replay batches died exactly this way when every
    observation sat under the persisted exact-dedup node).

    CONCURRENCY CONTRACT: the exclusion is set on the SHARED session conf,
    so any query the same SparkSession runs concurrently (another thread,
    a streaming sink) executes with the rule excluded too, and a
    concurrent caller can clobber the restore.  Curation is documented
    single-query-at-a-time per session (the warehouse is single-writer
    anyway); a caller that needs true isolation should run curation on
    ``spark.newSession()``, whose conf is cloned and independent."""
    exclude_key = "spark.sql.adaptive.optimizer.excludedRules"
    aqe_empty_rule = (
        "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
    )
    prev = spark.conf.get(exclude_key, None)
    rules = f"{prev},{aqe_empty_rule}" if prev else aqe_empty_rule
    spark.conf.set(exclude_key, rules)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(exclude_key)
        else:
            spark.conf.set(exclude_key, prev)


def _excluding_aqe_empty_rule(fn):
    """Run the whole decorated curation function under
    :func:`_aqe_empty_rule_excluded` for EVERY session reachable from
    its positional arguments (a SparkSession argument or a DataFrame's
    ``.sparkSession``).

    Covering all of them matters under Structured Streaming:
    ``foreachBatch`` hands the sink a DataFrame bound to a CLONED
    session (MicroBatchExecution clones the session per run, conf
    independent), so excluding the rule only on the caller's session
    left the cloned session's AQE free to propagate runtime-empty
    subtrees through the audited plan — the observations completed with
    schema-less rows exactly as in the persist case."""
    from contextlib import ExitStack

    @wraps(fn)
    def wrapper(*args, **kwargs):
        from pyspark.sql import SparkSession

        sessions: list = []
        for a in args:
            s = a if isinstance(a, SparkSession) else getattr(a, "sparkSession", None)
            if s is not None and all(s is not o for o in sessions):
                sessions.append(s)
        with ExitStack() as stack:
            for s in sessions:
                stack.enter_context(_aqe_empty_rule_excluded(s))
            return fn(*args, **kwargs)

    return wrapper


def _audited_count(out: DataFrame) -> int:
    """The ONE terminal action that drives an observe()-audited plan
    (callers run under :func:`_excluding_aqe_empty_rule`; the nested
    exclusion here keeps the action safe for any future direct caller)."""
    with _aqe_empty_rule_excluded(out.sparkSession):
        return out.count()


@_excluding_aqe_empty_rule
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

    The report's counts come from ``observe()`` metrics attached at each
    stage boundary, so the audited path is SINGLE-PASS: one terminal
    action drives the whole plan and every per-stage count falls out of
    the same job (r4 verdict #8 — the previous per-stage ``count()``
    design re-ran 7+ actions over intermediates, which at 100 TB is 7+
    extra passes).  The quality gate is a linear ``passes`` filter (no
    join back), and the line-dedup corpus-size anchor is computed
    in-plan (see drop_boilerplate_lines), so the only actions besides
    the terminal one are Spark's own broadcast-subtree builds.

    Cache lifecycle: stages 2 and 5 persist their shared-scan
    intermediates (see dedup.minhash_lsh_candidates); a long-lived
    session cycling many corpora should ``spark.catalog.clearCache()``
    between corpora once the curated output is written.
    """
    report = CurationReport()
    observations: dict[str, Observation] = {}

    def observed(frame: DataFrame, name: str) -> DataFrame:
        obs = Observation(f"curate_{name}")
        observations[name] = obs
        return frame.observe(obs, F.count(F.lit(1)).alias("n"))

    df = observed(df, "input")

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
        df = observed(df, "url_filter")

    # 1. quality gate — LINEAR narrow filter on the passes verdict (the
    # keep= mode carries id/text through, so no join back to recover
    # payload columns)
    gk = dict(gopher_kwargs or {})
    gk.setdefault("min_words", min_words)
    cur = (
        textstats.gopher_rules(df, id_col, text_col, keep=(id_col, text_col), **gk)
        .filter("passes")
        .select(id_col, text_col)
    )
    cur = observed(cur, "quality")
    report.stages.append("gopher_rules")

    # 2. line dedup — rebuild docs minus corpus-frequent lines; the
    # corpus-size anchor for the frequency cutoff is computed in-plan
    rebuilt = curation.drop_boilerplate_lines(
        cur, id_col, text_col, max_line_frac=max_line_frac,
    ).select(
        F.col("doc_id").alias(id_col), F.col("clean_text").alias(text_col)
    )
    # post-clean length gate: docs that were mostly boilerplate die here
    # (the C4 ordering — line dedup first, then the length filter)
    words = F.filter(
        F.split(F.col(text_col), r"\s+", -1), lambda x: x != F.lit("")
    )
    cur = observed(rebuilt.filter(F.size(words) >= min_words), "line_dedup")
    report.stages.append("line_dedup")

    # 3. PII scrub — narrow map on the surviving text
    if scrub:
        cur = cur.withColumn(text_col, curation.scrub_pii(F.col(text_col)))
        report.stages.append("pii_scrub")

    # 4. exact dedup — min id per identical text
    cur = observed(dedup.dedup_exact(cur, id_col, text_col), "exact_dedup")
    report.stages.append("dedup_exact")

    # 5. near dedup — greedy keep-smallest-id over LSH candidates
    drops = (
        dedup.minhash_lsh_candidates(cur, id_col, text_col)
        .filter(F.col("est_jaccard") >= near_threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    cur = observed(cur.join(drops, id_col, "left_anti"), "near_dedup")
    report.stages.append("minhash_lsh")

    # 6. decontamination — drop docs sharing a 13-gram with the eval suite
    if benchmark is not None:
        flags = dedup.decontaminate(cur, benchmark, id_col, text_col)
        clean_ids = flags.filter(~F.col("contaminated")).select(
            F.col("doc_id").alias(id_col)
        )
        cur = observed(cur.join(clean_ids, id_col, "left_semi"), "decontaminate")
        report.stages.append("decontaminate")

    # 7. reproducible split — salted content-hash buckets
    out = curation.split_by_hash(cur, id_col, val_fraction=val_fraction)
    report.stages.append("train_val_split")
    final_obs = Observation("curate_final")
    out = out.observe(
        final_obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("n_val"),
    )

    # ONE terminal action drives the whole audited plan; every stage
    # count materializes as an observed metric of this single job.
    _audited_count(out)

    def n_of(name: str) -> int:
        return int(observations[name].get["n"])

    report.n_input = n_of("input")
    report.n_after_url_filter = (
        n_of("url_filter") if "url_filter" in observations else report.n_input
    )
    report.n_after_quality = n_of("quality")
    report.n_after_line_dedup = n_of("line_dedup")
    report.n_after_exact_dedup = n_of("exact_dedup")
    report.n_after_near_dedup = n_of("near_dedup")
    report.n_after_decontamination = (
        n_of("decontaminate")
        if "decontaminate" in observations
        else report.n_after_near_dedup
    )
    report.n_output = int(final_obs.get["n"])
    report.n_val = int(final_obs.get["n_val"] or 0)
    return out, report


# ---------------------------------------------------------------------
# continuous ingestion: curate each crawl batch against the warehouse
# ---------------------------------------------------------------------

@dataclass
class IncrementalReport:
    """Per-batch ingestion audit: counts at each boundary plus what the
    stored corpus rejected."""

    n_batch: int = 0
    n_new: int = 0                      # after dropping already-ingested ids
    n_after_quality: int = 0
    n_after_line_dedup: int = 0
    n_after_exact_dedup: int = 0        # within batch + vs stored keys
    n_dropped_vs_corpus_exact: int = 0
    n_after_near_dedup: int = 0         # vs stored LSH index + within batch
    n_after_semantic_dedup: int = 0     # vs stored semantic index + in batch
    n_after_decontamination: int = 0
    n_appended: int = 0
    snapshot_id: int = -1
    stages: list[str] = field(default_factory=list)

    def as_dict(self) -> dict:
        return {k: getattr(self, k) for k in (
            "n_batch", "n_new", "n_after_quality", "n_after_line_dedup",
            "n_after_exact_dedup", "n_dropped_vs_corpus_exact",
            "n_after_near_dedup", "n_after_semantic_dedup",
            "n_after_decontamination", "n_appended",
            "snapshot_id",
        )} | {"stages": list(self.stages)}


CURATED_TABLE = "curated"
KEYS_TABLE = "curated_keys"        # (id, content_md5) — exact-dup index
SIGS_TABLE = "dedup_sigs"          # (id, sig array<long>) — MinHash index
BANDS_TABLE = "dedup_bands"        # (id, band, bucket) — LSH band index
HOSTS_TABLE = "host_counts"        # (host, n) — log-structured quota ledger
SEM_CENTROIDS_TABLE = "sem_centroids"  # (cell, centroid) — frozen quantizer
SEM_CELLS_TABLE = "sem_cells"      # (id, cell, cell_cos) — semantic cell index
SEM_VECS_TABLE = "sem_vecs"        # (id, embedding) — survivor vectors


@_excluding_aqe_empty_rule
def curate_incremental(
    spark,
    warehouse_root: str,
    batch: DataFrame,
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
    embedding_col: str | None = None,
    semantic_threshold: float = 0.95,
    semantic_cells: int = 1024,
) -> "tuple[DataFrame, IncrementalReport]":
    """Curate ONE crawl batch against the warehouse-resident corpus and
    append the survivors atomically — the continuous-ingestion form of
    :func:`curate_corpus` (ref parity: the extraction ledger's
    memoization discipline, pipeline.py:40-76, applied to curation).

    Stored state (all slim, payload-free except ``curated``):

    * ``curated``       — (id, text, split): the corpus itself;
    * ``curated_keys``  — (id, content_md5): exact-dup + idempotence index;
    * ``dedup_sigs`` / ``dedup_bands`` — the :func:`dedup.minhash_index`
      tables; each batch joins its own bands against the stored bands
      (dedup.incremental_minhash_candidates) — the 100 TB corpus text is
      NEVER re-scanned, only its ~300 B/doc index;
    * with ``embedding_col``: ``sem_centroids`` / ``sem_cells`` /
      ``sem_vecs`` — the :func:`similarity.semantic_index` tables
      (SemDeDup).  Centroids freeze at the first embedded batch (the
      tiered_ingest frozen-bounds discipline); each batch assigns only
      ITSELF to them and scores new-vs-members inside touched cells
      (similarity.incremental_semantic_candidates), corpus wins, then
      smallest id within the batch.

    Batch flow: drop already-ingested ids (re-running a batch is a
    no-op — crash-resume idempotence); Gopher gate; per-batch line dedup
    (line frequencies are per-batch by design — corpus-global boilerplate
    drift belongs to a periodic re-curation, not the hot ingest path);
    optional PII scrub; exact dedup within batch then against stored
    md5 keys (corpus wins); near dedup against the stored index then
    within the batch (corpus wins, then smallest id); optional
    decontamination; salted split.  Survivors + their keys + index rows
    publish in ONE atomic multi-table commit, so a crash leaves either
    the whole batch ingested or none of it — and the index can never
    disagree with the corpus.

    Host quotas are CROSS-BATCH: with ``max_per_host`` (explicit
    ``url_col`` required, same contract as curate_corpus) the warehouse
    keeps a log-structured ``host_counts`` table (append per commit,
    summed at read) and each batch's per-host allowance is
    ``max_per_host - already_kept``; the counts delta for docs the batch
    actually APPENDS rides the same atomic commit, so the quota can
    never drift from the corpus.  Empty-host rows are exempt, matching
    urls.host_caps.
    """
    from .io.tables import open_warehouse
    from .operators import dedup as dd

    rep = IncrementalReport()
    wh = open_warehouse(spark, warehouse_root)
    id_dt = batch.schema[id_col].dataType.simpleString()

    keys = wh.read(spark, KEYS_TABLE, schema=f"id {id_dt}, content_md5 string")
    sigs = wh.read(spark, SIGS_TABLE, schema=f"id {id_dt}, sig array<bigint>")
    bands = wh.read(spark, BANDS_TABLE, schema=f"id {id_dt}, band int, bucket bigint")

    # Single-pass audit (same contract as curate_corpus): every boundary
    # count is an observe() metric of the ONE terminal action, not its own
    # count() job — the previous design ran ~8 per-stage count() actions
    # per micro-batch, re-running the quality/line-dedup lineage several
    # times, which a high-frequency ingest stream pays on every batch.
    observations: dict[str, Observation] = {}

    def observed(frame: DataFrame, name: str) -> DataFrame:
        obs = Observation(f"curate_inc_{name}")
        observations[name] = obs
        return frame.observe(obs, F.count(F.lit(1)).alias("n"))

    batch = observed(batch, "batch")
    # idempotent re-ingestion: ids the ledger already holds are done
    new = observed(
        batch.join(keys.select(F.col("id").alias(id_col)), id_col, "left_anti"),
        "new",
    )
    rep.stages.append("ledger_anti_join")

    # stage 0: url filters — blocklist, then the CROSS-BATCH host quota
    if (blocklist is not None or max_per_host) and url_col is None:
        raise ValueError(
            "curate_incremental: blocklist/max_per_host need an explicit "
            "url_col (see curate_corpus)"
        )
    if blocklist is not None:
        new = urls.filter_blocklisted_hosts(new, blocklist, url_col=url_col)
        rep.stages.append("host_blocklist")
    if max_per_host:
        host_counts = (
            wh.read(spark, HOSTS_TABLE, schema="host string, n long")
            .groupBy("host").agg(F.sum("n").alias("_kept"))
        )
        # exact salted two-level per-host rank (urls.host_rank): the
        # batch's remaining allowance is at most max_per_host, so the
        # shard prune at max_per_host is lossless here too
        new = (
            urls.host_rank(new, url_col, max_per_host)
            .join(F.broadcast(host_counts),
                  F.col("_host") == F.col("host"), "left")
            .filter(
                (F.col("_host") == "")
                | (F.col("_hc_rn") <= max_per_host - F.coalesce(F.col("_kept"), F.lit(0)))
            )
            .drop("_hc_rn", "_kept", "host", "_host")
        )
        rep.stages.append("host_caps_incremental")

    gk = dict(gopher_kwargs or {})
    gk.setdefault("min_words", min_words)
    cur = (
        textstats.gopher_rules(new, id_col, text_col, keep=(id_col, text_col), **gk)
        .filter("passes")
        .select(id_col, text_col)
    )
    cur = observed(cur, "quality")
    rep.stages.append("gopher_rules")

    rebuilt = curation.drop_boilerplate_lines(
        cur, id_col, text_col, max_line_frac=max_line_frac,
    ).select(F.col("doc_id").alias(id_col), F.col("clean_text").alias(text_col))
    words = F.filter(F.split(F.col(text_col), r"\s+", -1), lambda x: x != F.lit(""))
    cur = observed(rebuilt.filter(F.size(words) >= min_words), "line_dedup")
    rep.stages.append("line_dedup")

    if scrub:
        cur = cur.withColumn(text_col, curation.scrub_pii(F.col(text_col)))
        rep.stages.append("pii_scrub")

    # exact dedup: within batch, then against the stored md5 keys
    cur = observed(dedup.dedup_exact(cur, id_col, text_col), "batch_exact")
    cur = cur.withColumn("_md5", F.md5(F.col(text_col))).join(
        keys.select(F.col("content_md5").alias("_md5")).distinct(),
        "_md5", "left_anti",
    ).drop("_md5")
    rep.stages.append("dedup_exact")
    # the persisted node sits ABOVE its observations: metrics still report
    # through InMemoryRelation (verified), and the near-dedup stage's four
    # references to cur share one cache materialization within the single
    # audited action
    cur = observed(cur, "exact_dedup").persist()
    cached = cur  # unpersist handle (cur is reassigned downstream)

    # near dedup: stored index first (corpus wins), then within batch
    new_ids = cur.select(F.col(id_col).alias("_nid"))
    cands = dd.incremental_minhash_candidates(
        cur.select(id_col, text_col), sigs, bands, id_col, text_col
    ).filter(F.col("est_jaccard") >= near_threshold).persist()
    # every NEW endpoint of a pair loses unless the pair is new-new, in
    # which case the smaller id survives: a new id_a drops only when the
    # other side is a STORED doc; a new id_b always drops (stored docs
    # never appear as id_b of a new-new pair, and in a new-new pair the
    # greater id loses by the batch keeper policy)
    lose_a = (
        cands.join(new_ids, cands["id_a"] == new_ids["_nid"], "left_semi")
        .join(
            cur.select(F.col(id_col).alias("_nb")),
            cands["id_b"] == F.col("_nb"), "left_anti",
        )
        .select(F.col("id_a").alias(id_col))
    )
    lose_b = (
        cands.join(
            cur.select(F.col(id_col).alias("_nb2")),
            cands["id_b"] == F.col("_nb2"), "left_semi",
        )
        .select(F.col("id_b").alias(id_col))
    )
    drops = lose_a.unionByName(lose_b).distinct()
    cur = observed(cur.join(drops, id_col, "left_anti"), "near_dedup")
    rep.stages.append("minhash_lsh_incremental")

    # semantic dedup (SemDeDup) against the stored frozen-centroid index:
    # same keeper policy as the MinHash stage (corpus wins; within-batch
    # the smaller id wins).  Embeddings are recovered from the RAW batch
    # by id (the payload stages projected them away); docs without a
    # (nonzero) embedding carry no semantic signal and never drop here.
    # Centroids FREEZE at the first embedded batch — the tiered_ingest
    # frozen-bounds discipline; re-clustering is a periodic maintenance
    # rebuild, not the hot path.
    new_cells = None
    sem_cands = None
    first_sem = False
    cts = None
    if embedding_col is not None:
        import numpy as np

        from .operators import similarity as sim

        emb_dt = batch.schema[embedding_col].dataType.simpleString()
        sem_input = (
            cur.select(id_col)
            .join(batch.select(F.col(id_col), F.col(embedding_col)), id_col)
            .filter(sim._nonzero_vec(F.col(embedding_col)))
            .select(F.col(id_col).alias("id"), F.col(embedding_col))
        )
        cts_rows = (
            wh.read(spark, SEM_CENTROIDS_TABLE,
                    schema="cell bigint, centroid array<double>")
            .orderBy("cell").collect()
        )
        first_sem = not cts_rows
        if first_sem:
            cts = sim.train_ivf_centroids(
                sem_input, "id", embedding_col,
                n_cells=semantic_cells, sample_size=4096,
            )
        else:
            cts = np.array([r["centroid"] for r in cts_rows], dtype=np.float64)
        if len(cts):
            new_cells = sim._assign_cell_with_sim(
                sem_input, cts, embedding_col
            ).persist()
            sem_index = wh.read(
                spark, SEM_CELLS_TABLE,
                schema=f"id {id_dt}, cell bigint, cell_cos double",
            )
            sem_vecs = wh.read(
                spark, SEM_VECS_TABLE,
                schema=f"id {id_dt}, embedding {emb_dt}",
            ).select("id", F.col("embedding").alias(embedding_col))
            sem_cands = sim.incremental_semantic_candidates(
                None, None, sem_index, sem_vecs, "id", embedding_col,
                threshold=semantic_threshold, new_cells=new_cells,
            ).persist()
            new_flag = cur.select(F.col(id_col).alias("_sn"))
            drops_sem = (
                sem_cands.join(new_flag, sem_cands["id_b"] == F.col("_sn"),
                               "left")
                .select(
                    F.when(
                        F.col("_sn").isNotNull(),
                        F.greatest(F.col("id_a"), F.col("id_b")),
                    ).otherwise(F.col("id_a")).alias(id_col)
                )
                .distinct()
            )
            cur = cur.join(drops_sem, id_col, "left_anti")
        rep.stages.append("semantic_dedup_incremental")
    cur = observed(cur, "semantic")

    if benchmark is not None:
        flags = dedup.decontaminate(cur, benchmark, id_col, text_col)
        clean_ids = flags.filter(~F.col("contaminated")).select(
            F.col("doc_id").alias(id_col)
        )
        cur = cur.join(clean_ids, id_col, "left_semi")
        rep.stages.append("decontaminate")
    cur = observed(cur, "decontamination")

    out = curation.split_by_hash(
        cur.select(id_col, text_col), id_col, val_fraction=val_fraction
    ).persist()
    rep.stages.append("train_val_split")

    # the ONE action of the batch's audit phase: materializes out's cache
    # and completes every observation above (AQE empty-relation rule
    # excluded around it — see _audited_count)
    rep.n_appended = _audited_count(out)

    def n_of(name: str) -> int:
        return int(observations[name].get["n"])

    rep.n_batch = n_of("batch")
    rep.n_new = n_of("new")
    rep.n_after_quality = n_of("quality")
    rep.n_after_line_dedup = n_of("line_dedup")
    rep.n_after_exact_dedup = n_of("exact_dedup")
    rep.n_dropped_vs_corpus_exact = n_of("batch_exact") - rep.n_after_exact_dedup
    rep.n_after_near_dedup = n_of("near_dedup")
    rep.n_after_semantic_dedup = n_of("semantic")
    rep.n_after_decontamination = n_of("decontamination")

    if rep.n_appended == 0:
        # fully-rejected (or fully-memoized) batch: nothing to publish —
        # don't burn a snapshot on four empty appends
        rep.snapshot_id = wh.current_snapshot_id()
        rep.stages.append("noop_commit")
        cached.unpersist()
        cands.unpersist()
        if new_cells is not None:
            new_cells.unpersist()
        if sem_cands is not None:
            sem_cands.unpersist()
        return out, rep

    # derive the index rows for the survivors and publish EVERYTHING in
    # one atomic commit (corpus, keys, sigs, bands can never diverge)
    new_keys = out.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("content_md5")
    )
    surv_sigs, surv_bands = dd.minhash_index(
        out.select(id_col, text_col), id_col, text_col
    )
    surv_sigs = surv_sigs.persist()
    staged = {
        CURATED_TABLE: [wh.stage(out, CURATED_TABLE)],
        KEYS_TABLE: [wh.stage(new_keys, KEYS_TABLE)],
        SIGS_TABLE: [wh.stage(surv_sigs, SIGS_TABLE)],
        BANDS_TABLE: [wh.stage(surv_bands, BANDS_TABLE)],
    }
    if embedding_col is not None and new_cells is not None:
        # semantic index rows for the survivors ride the SAME atomic
        # commit (the cells/vectors tables can never diverge from the
        # corpus); docs without a nonzero embedding simply have no rows.
        # Frozen centroids publish once, with the first embedded batch
        # that actually appends (an all-rejected first batch retrains
        # next time — nothing stored, nothing to drift from).
        out_ids = out.select(F.col(id_col).alias("id"))
        surv_cells = new_cells.join(out_ids, "id", "left_semi").select(
            "id", "cell", "cell_cos"
        )
        surv_vecs = new_cells.join(out_ids, "id", "left_semi").select(
            "id", F.col(embedding_col).alias("embedding")
        )
        staged[SEM_CELLS_TABLE] = [wh.stage(surv_cells, SEM_CELLS_TABLE)]
        staged[SEM_VECS_TABLE] = [wh.stage(surv_vecs, SEM_VECS_TABLE)]
        if first_sem:
            staged[SEM_CENTROIDS_TABLE] = [wh.stage(
                sim.centroids_to_df(spark, cts), SEM_CENTROIDS_TABLE
            )]
    if max_per_host:
        # quota delta = hosts of the docs this batch ACTUALLY appends —
        # same atomic commit, so quota state never drifts from the corpus.
        # The url column was projected away by the payload stages, so
        # recover it from the RAW batch by id (out ids ⊆ new ⊆ batch and
        # url-per-id is invariant, so joining the raw scan gives the same
        # hosts without re-running the ledger/quota lineage).
        url_map = batch.select(F.col(id_col), urls.host_of(F.col(url_col)).alias("host"))
        delta = (
            out.select(id_col).join(url_map, id_col)
            .filter(F.col("host") != "")
            .groupBy("host").agg(F.count(F.lit(1)).alias("n"))
        )
        staged[HOSTS_TABLE] = [wh.stage(delta, HOSTS_TABLE)]
    rep.snapshot_id = wh.commit(staged)
    rep.stages.append("atomic_commit")
    # drop the batch-scoped caches now the commit landed; a long-running
    # ingest stream must not accumulate cached relations across
    # micro-batches.  ``out`` stays cached — the CALLER owns it (tests
    # and the stream sink read it back; unpersist when done).
    cached.unpersist()
    cands.unpersist()
    surv_sigs.unpersist()
    if new_cells is not None:
        new_cells.unpersist()
    if sem_cands is not None:
        sem_cands.unpersist()
    return out, rep


def compact_warehouse(
    spark,
    warehouse_root: str,
    tables: "list[str] | None" = None,
    target_files: "int | None" = None,
    retain_last: "int | None" = None,
) -> "tuple[int, dict[str, int]]":
    """Compact the curation warehouse: rewrite each table's CURRENT
    committed state into one fresh staged directory and publish a single
    atomic replace-commit — the maintenance pass continuous ingestion
    needs, because :func:`curate_incremental` appends one directory per
    batch to ``curated``/``curated_keys``/``dedup_sigs``/``dedup_bands``/
    ``host_counts`` forever, and at daily batches the band-join's file
    listing and the summed host-quota log grow without bound.

    * ``host_counts`` is additionally FOLDED (``GROUP BY host SUM(n)``)
      — the log-structured ledger collapses to one row per host with
      identical read-side semantics (reads always sum).
    * Every other table is rewritten as-is into ``target_files``
      partitions (default: the session's parallelism).
    * All compacted tables ride ONE replace-commit, so readers switch
      atomically; earlier manifests still reference the old directories,
      so TIME TRAVEL to pre-compaction snapshots is unaffected (the same
      discipline as the ingest commit — see io/tables.py commit()).
    * SINGLE-WRITER: compaction occupies the warehouse's serialized
      writer slot; running it concurrently with an ingest batch could
      replace away rows appended between the read and the commit.

    On an Iceberg catalog the same pass runs catalog-natively
    (IcebergWarehouse.compact): ``CALL system.rewrite_data_files``
    bin-packs each appended table's small files, the log-structured
    ledgers fold via stage + ``INSERT OVERWRITE``, and all touched
    tables publish under one logical snapshot.  ``retain_last`` (opt-in,
    Iceberg branch only) additionally expires old table snapshots —
    storage reclaim at the cost of deep time travel; the emulation
    ignores it (manifests are tiny and old data dirs stay referenced).

    Returns ``(snapshot_id, {table: n_rows})``.  Tables with no
    committed data are skipped.  A no-op compaction (nothing committed
    yet) returns the current snapshot id and an empty dict.  The Iceberg
    branch returns an empty rows dict (row counts there would re-scan
    tables whose contents the rewrite procedures don't change).
    """
    import inspect

    from .io.tables import open_warehouse

    wh = open_warehouse(spark, warehouse_root)
    tables = tables if tables is not None else [
        CURATED_TABLE, KEYS_TABLE, SIGS_TABLE, BANDS_TABLE, HOSTS_TABLE,
        TIERED_TABLE, TIER_BOUNDS_TABLE, TIER_COUNTS_TABLE, TIER_SEEN_TABLE,
        TIER_QUALS_TABLE, SEM_CENTROIDS_TABLE, SEM_CELLS_TABLE,
        SEM_VECS_TABLE,
    ]
    n_parts = target_files or spark.sparkContext.defaultParallelism

    def fold(table: str, df: DataFrame) -> "DataFrame | None":
        """The ledger folds (reads always sum, so the summed form is
        read-identical); None = compact as-is, rows unchanged."""
        if table == HOSTS_TABLE:
            return df.groupBy("host").agg(F.sum("n").alias("n"))
        if table == TIER_COUNTS_TABLE:
            return df.groupBy("tier", "grp").agg(
                F.sum("n_seen").alias("n_seen"), F.sum("n_kept").alias("n_kept")
            )
        return None

    # capability dispatch FIRST — before any table is staged/rewritten —
    # so a branch that can't finish never leaves expensive orphans behind
    if "replace" not in inspect.signature(wh.commit).parameters:
        # Iceberg catalog: metadata-procedure compaction through the seam
        plan: dict = {}
        for table in tables:
            try:
                df = wh.read(spark, table)
            except ValueError:
                continue  # never committed — nothing to compact
            folded = fold(table, df)
            plan[table] = (
                folded.repartition(n_parts) if folded is not None else None
            )
        return wh.compact(spark, plan, retain_last=retain_last), {}

    staged: dict[str, list[str]] = {}
    rows: dict[str, int] = {}
    for table in tables:
        # only the empty-table signal skips a table; a real read failure
        # (corrupt footer, transient IO) must surface, not silently leave
        # the table uncompacted
        try:
            df = wh.read(spark, table)
        except ValueError:
            continue  # never committed — nothing to compact
        folded = fold(table, df)
        if folded is not None:
            df = folded
        staged[table] = [wh.stage(df.repartition(n_parts), table)]
        rows[table] = wh.read_staged(spark, staged[table][0]).count()
    if not staged:
        return wh.current_snapshot_id(), {}
    snap = wh.commit(staged, replace=set(staged))
    return snap, rows


def read_curated(
    spark,
    warehouse_root: str,
    snapshot_id: "int | None" = None,
    split: "str | None" = None,
) -> DataFrame:
    """Committed curated corpus (id, text, split), optionally
    time-traveled to ``snapshot_id`` and filtered to one ``split``
    ('train'/'val') — the read-side mirror of pipeline.read_extracted
    for the curation tables."""
    from .io.tables import open_warehouse

    wh = open_warehouse(spark, warehouse_root)
    df = wh.read(spark, CURATED_TABLE, snapshot_id=snapshot_id)
    if split is not None:
        df = df.filter(F.col("split") == split)
    return df


# ---------------------------------------------------------------------
# tier extraction: quality-bucketed, temperature-balanced corpus slices
# ---------------------------------------------------------------------

@_excluding_aqe_empty_rule
def tiered_select(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    quality_col: "str | None" = None,
    group_col: "str | None" = None,
    n_tiers: int = 4,
    quota_coeff: float = 8.0,
    span_excise_n: "int | None" = None,
    min_words: int = 20,
    distributed_bounds: bool = True,
    relative_error: float = 1e-3,
) -> "tuple[DataFrame, dict]":
    """Tier EXTRACTION over a curated corpus: the selection stage that
    turns "everything that survived curation" into "quality-bucketed,
    temperature-balanced training slices" (FineWeb-style buckets x
    XLM-R-style alpha=0.5 group rebalancing).

    Composition (each piece is its own oracled §2 operator; this
    function only chains them):

    1. optional span excision (``span_excise_n``): verbatim passages
       duplicated corpus-wide are cut out of the surviving text
       (operators.curation.excise_dup_spans) and the post-excision
       length gate re-applied — document dedup upstream removed whole
       near-copies; this removes the boilerplate spans that survived it.
    2. quality: ``quality_col`` if the caller scored docs already, else
       textstats.quality_score (narrow map).
    3. tiering: ``distributed_bounds=True`` (default) takes one
       Greenwald-Khanna ``approxQuantile`` sketch pass for the cutoffs,
       then tier assignment is a shuffle-free threshold map — the
       100 TB path.  ``False`` uses the exact global ``ntile`` (bounded
       slices only: single-task window).
    4. per-(tier, group) keep quotas ``min(m, floor(c*sqrt(m)))`` filled
       by the deterministic salted-window md5 lottery
       (operators.curation.quality_tiers).

    Returns ``(out, report)``: ``out`` is every surviving row with
    ``(quality, tier, group_n, quota, keep)`` appended — write the
    extraction as ``out.filter("keep").write.partitionBy("tier")...``
    so downstream jobs prune to the tiers they train on; ``report``
    carries ``n_input`` / ``n_after_excise`` / ``tier_bounds`` and the
    per-tier (total, kept) histogram.

    Single-pass audit (same discipline as curate_corpus): every report
    figure is an ``observe()`` metric of ONE terminal action — the only
    other execution is the Greenwald-Khanna bounds sketch (none with
    ``distributed_bounds=False``).  The previous design ran a count per
    boundary plus a histogram collect, re-running the (expensive) excise
    lineage once per probe.

    Scale shape: all tiering decisions (sketch, quota windows, lottery)
    run on a persisted NARROW (id, quality, group) projection — the
    corpus text rides exactly one scan into the final id-join however
    many consumers the decision plan has.  The narrow cache follows the
    standard lifecycle (``spark.catalog.clearCache()`` releases it).
    """
    report: dict = {}
    obs_input = Observation("tier_input")
    df = df.observe(obs_input, F.count(F.lit(1)).alias("n"))

    obs_excise = None
    if span_excise_n:
        cleaned = curation.excise_dup_spans(
            df, id_col, text_col, n=span_excise_n
        ).select(
            F.col(id_col),
            F.col("cleaned").alias(text_col),
            (F.col("n_words") - F.col("n_removed")).alias("_kept_words"),
        )
        other_cols = [c for c in df.columns if c != text_col]
        df = (
            df.select(*other_cols)
            .join(cleaned, id_col)
            .filter(F.col("_kept_words") >= min_words)
            .drop("_kept_words")
        )
        obs_excise = Observation("tier_excise")
        df = df.observe(obs_excise, F.count(F.lit(1)).alias("n"))

    # tiering decisions run on a persisted NARROW (id, quality, group)
    # table — the quantile sketch, the quota windows, and the keep join
    # all consume ~16-byte rows, and the corpus text rides exactly ONE
    # scan (the final id-join below) no matter how many consumers the
    # decision plan has.  Caching the full corpus instead (or
    # re-scanning text per consumer) measured strictly worse at 5M rows
    # — see quality_tiers' materialize note.
    qcol = quality_col
    if qcol is None:
        qcol = "_quality"
        narrow_cols = [F.col(id_col)]
        if group_col:
            narrow_cols.append(F.col(group_col))
        narrow = df.select(
            *narrow_cols, textstats.quality_score(F.col(text_col)).alias(qcol)
        )
    else:
        narrow = df.select(
            *([id_col] + ([group_col] if group_col else []) + [qcol])
        )
    narrow = narrow.persist()

    bounds = None
    if distributed_bounds:
        bounds = curation.approx_tier_bounds(
            narrow, qcol, n_tiers=n_tiers, relative_error=relative_error
        )
    report["tier_bounds"] = bounds
    decisions = curation.quality_tiers(
        narrow, id_col=id_col, quality_col=qcol, group_col=group_col,
        n_tiers=n_tiers, quota_coeff=quota_coeff, tier_bounds=bounds,
    )
    keep_cols = [id_col, qcol, "tier", "group_n", "quota", "keep"]
    if quality_col is not None:
        keep_cols.remove(qcol)
    if group_col:
        decisions = decisions.drop(group_col)
    # the per-tier histogram rides the same terminal action as the
    # boundary counts: n_tiers is known up front, so (total, kept) per
    # tier are 2*n_tiers observed aggregates, not a separate collect
    obs_hist = Observation("tier_hist")
    hist_metrics = []
    for i in range(1, n_tiers + 1):
        cond = F.col("tier") == i
        hist_metrics.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{i}")
        )
        hist_metrics.append(
            F.sum(F.when(cond & F.col("keep"), 1).otherwise(0)).alias(f"k_{i}")
        )
    decisions = decisions.observe(obs_hist, *hist_metrics)
    out = df.join(decisions.select(*keep_cols), id_col)
    if quality_col is None:
        out = out.withColumnRenamed("_quality", "quality")

    # ONE terminal action drives the whole audited plan (input count,
    # excise count, histogram); the caller's write of `out` re-reads only
    # the persisted narrow + one corpus scan
    _audited_count(out)
    report["n_input"] = int(obs_input.get["n"])
    if obs_excise is not None:
        report["n_after_excise"] = int(obs_excise.get["n"])
    h = obs_hist.get
    report["tiers"] = {
        i: (int(h[f"n_{i}"] or 0), int(h[f"k_{i}"] or 0))
        for i in range(1, n_tiers + 1)
        if int(h[f"n_{i}"] or 0) > 0
    }
    return out, report


TIERED_TABLE = "tiered"            # (id, text, ..., quality, tier) — kept docs
TIER_BOUNDS_TABLE = "tier_bounds"  # (tier, cutoff) — frozen thresholds
TIER_COUNTS_TABLE = "tier_counts"  # (tier, grp, n_seen, n_kept) — quota ledger
TIER_SEEN_TABLE = "tier_seen"      # (id) — processed-doc memo ledger
TIER_QUALS_TABLE = "tier_quals"    # (id, quality, grp) — seen-population scores


@_excluding_aqe_empty_rule
def tiered_ingest(
    spark,
    warehouse_root: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    quality_col: "str | None" = None,
    group_col: "str | None" = None,
    n_tiers: int = 4,
    quota_coeff: float = 8.0,
    relative_error: float = 1e-3,
    salt_shards: int = 16,
) -> "tuple[DataFrame, dict]":
    """Tier-extract ONE batch against the warehouse — the
    continuous-ingestion form of :func:`tiered_select`, mirroring
    curate_incremental's ledger discipline for the tier quotas.

    Stored state:

    * ``tiered``       — the kept rows (batch columns + quality, tier);
    * ``tier_bounds``  — (tier, cutoff): computed by the FIRST batch's
      Greenwald-Khanna sketch and frozen — every later batch tier-maps
      against the same thresholds, so tier semantics never drift with
      batch composition (re-tiering the corpus under fresh bounds is a
      periodic maintenance job, not the hot path);
    * ``tier_counts``  — (tier, grp, n_seen, n_kept) log-structured
      ledger (append per commit, summed at read).

    Per-(tier, group) allowance for a batch is
    ``min(m_total, floor(c*sqrt(m_total))) - kept_so_far`` where
    ``m_total`` counts every doc EVER SEEN in the cell (kept or not) —
    the sqrt-temperature quota is monotone in m, so allowances only
    top up, never shrink, and after any batch sequence the kept count
    per cell EXACTLY equals the single-shot quota for the same seen
    population (the convergence test pins this).  WHICH docs fill a
    topped-up allowance is arrival-order greedy (earlier batches lock
    their keeps) — same documented policy as the corpus-wins keeper in
    incremental dedup.  Within a batch the lottery is the deterministic
    portable-md5 rank, two-level salted like quality_tiers.

    Re-running a batch is a no-op: ``tier_seen`` is an id-only memo
    ledger of every doc ever PROCESSED (kept or rejected — a kept-only
    ledger would re-count a replayed batch's rejected docs as fresh
    ``n_seen`` and inflate future quotas), and a fully-rejected batch
    still commits its seen ids + counts — they raise future allowances.
    Kept rows, seen ids, count deltas, and (first batch) bounds publish
    in ONE atomic commit.

    Single-pass audit (the same discipline as curate_incremental): a
    batch runs exactly ONE probe action (the ledger anti-join count,
    which also yields ``n_batch`` as an observed metric and fills the
    batch-scan cache) plus one tiny bounds read (GK sketch on the first
    batch, a collect of the frozen cutoffs after) — ``n_kept`` and the
    per-tier histogram are ``observe()`` metrics completed by the stage
    writes themselves.  A replayed batch short-circuits at the probe:
    EXACTLY one execution, no tier plan built, no staging, no snapshot.

    Returns ``(kept_df, report)``.  ``kept_df`` comes back CACHED (the
    commit materialized it); the caller owns the unpersist — the
    streaming sink drops it per batch (run_tiered_stream).
    """
    from .io.tables import open_warehouse
    from .operators import curation as cops

    wh = open_warehouse(spark, warehouse_root)
    id_dt = batch.schema[id_col].dataType.simpleString()
    rep: dict = {}
    obs_batch = Observation("ti_batch")
    batch = batch.observe(obs_batch, F.count(F.lit(1)).alias("n"))

    seen_ids = wh.read(spark, TIER_SEEN_TABLE, schema=f"{id_col} {id_dt}")
    # persisted: the probe action below fills this cache, so the raw
    # batch is scanned ONCE per ingest however many consumers follow
    # (tier join, seen-ids stage) — the r6 design re-scanned it per count
    new = batch.join(seen_ids.select(id_col), id_col, "left_anti").persist()

    qcol = quality_col or "_quality"
    grp = F.col(group_col) if group_col else F.lit("")
    narrow_cols = [F.col(id_col), grp.alias("_grp")]
    if quality_col is None:
        narrow = new.select(
            *narrow_cols, textstats.quality_score(F.col(text_col)).alias(qcol)
        )
    else:
        narrow = new.select(*narrow_cols, F.col(qcol))
    narrow = narrow.persist()
    # the ONE probe action: n_new is its result, n_batch its observed
    # metric, and it materializes the new/narrow caches
    rep["n_new"] = narrow.count()
    rep["n_batch"] = int(obs_batch.get["n"])

    if rep["n_new"] == 0:
        # replay (or empty batch): nothing to tier, nothing to commit —
        # return before ANY tier plan is built, with exactly the one
        # probe execution spent (replay-is-a-no-op is the family's
        # headline contract; make it free)
        rep.update(n_kept=0, kept_per_tier={},
                   snapshot_id=wh.current_snapshot_id())
        empty = new.limit(0).withColumn("tier", F.lit(None).cast("long"))
        if quality_col is None:
            empty = empty.withColumn("quality", F.lit(None).cast("double"))
        narrow.unpersist()
        new.unpersist()
        return empty, rep

    # tier cutoffs: tiny — the frozen bounds are ≤ n_tiers rows, and the
    # first batch (no committed bounds table: the read raises the
    # empty-table ValueError without touching Spark) sketches them from
    # the already-cached narrow
    try:
        stored_bounds = wh.read(spark, TIER_BOUNDS_TABLE).collect()
    except ValueError:
        stored_bounds = []
    first_batch = not stored_bounds
    if first_batch:
        bounds = cops.approx_tier_bounds(
            narrow, qcol, n_tiers=n_tiers, relative_error=relative_error
        )
    else:
        bounds = [r["cutoff"] for r in sorted(stored_bounds, key=lambda r: r["tier"])]
    rep["tier_bounds"] = bounds
    rep["first_batch"] = first_batch

    t = F.lit(1)
    for b in bounds:
        t = t + F.when(F.col(qcol) < b, 1).otherwise(0)
    assigned = narrow.withColumn("tier", t.cast("long"))

    prev = (
        wh.read(spark, TIER_COUNTS_TABLE,
                schema="tier long, grp string, n_seen long, n_kept long")
        .groupBy("tier", "grp")
        .agg(F.sum("n_seen").alias("_m_prev"), F.sum("n_kept").alias("_k_prev"))
        .withColumnRenamed("grp", "_grp")
    )
    m_batch = assigned.groupBy("tier", "_grp").agg(F.count("*").alias("_m_batch"))
    cells = (
        m_batch.join(prev, ["tier", "_grp"], "left")
        .select(
            "tier", "_grp", "_m_batch",
            F.coalesce(F.col("_m_prev"), F.lit(0)).alias("_m_prev"),
            F.coalesce(F.col("_k_prev"), F.lit(0)).alias("_k_prev"),
        )
        .withColumn("_m_tot", F.col("_m_prev") + F.col("_m_batch"))
        .withColumn(
            "_allow",
            F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    F.col("_m_tot"),
                    F.floor(F.lit(float(quota_coeff))
                            * F.sqrt(F.col("_m_tot").cast("double"))),
                ).cast("long") - F.col("_k_prev"),
            ),
        )
    )
    sized = assigned.join(F.broadcast(cells), ["tier", "_grp"])

    from pyspark.sql import Window

    rkey = F.md5(F.col(id_col).cast("string"))
    order = [rkey, F.col(id_col)]
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit("ti")),
                  F.lit(salt_shards))
    w1 = Window.partitionBy("tier", "_grp", salt).orderBy(*order)
    pruned = (
        sized.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= F.col("_allow"))
        .drop("_rn1")
    )
    w2 = Window.partitionBy("tier", "_grp").orderBy(*order)
    kept = (
        pruned.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= F.col("_allow"))
        .select(id_col, "tier", "_grp", F.col(qcol))
        .persist()
    )
    sel = [F.col(id_col), F.col("tier")]
    if quality_col is None:
        # surface the internally-computed score; a caller-provided
        # quality column is already on the batch rows
        sel.append(F.col(qcol).alias("quality"))
    # n_kept + the per-tier histogram are observed metrics of the TIERED
    # stage write itself (which also materializes out's cache and kept's)
    # — no count(), no collect()
    obs_out = Observation("ti_out")
    out_metrics = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(F.col("tier") == i, 1).otherwise(0)).alias(f"t_{i}")
        for i in range(1, n_tiers + 1)
    ]
    out = (
        new.join(kept.select(*sel), id_col)
        .observe(obs_out, *out_metrics)
        .persist()
    )

    # delta rows: EVERY seen doc counts toward future allowances, kept
    # or not; kept counts come from the same kept set the corpus append
    # uses, so the ledger can never drift from the table
    kept_cells = kept.groupBy("tier", "_grp").agg(F.count("*").alias("_nk"))
    delta = (
        cells.select("tier", "_grp", F.col("_m_batch").alias("n_seen"))
        .join(kept_cells, ["tier", "_grp"], "left")
        .select(
            "tier", F.col("_grp").alias("grp"), "n_seen",
            F.coalesce(F.col("_nk"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )
    staged = {
        TIERED_TABLE: [wh.stage(out, TIERED_TABLE)],
        TIER_SEEN_TABLE: [wh.stage(new.select(id_col), TIER_SEEN_TABLE)],
        TIER_COUNTS_TABLE: [wh.stage(delta, TIER_COUNTS_TABLE)],
        # the seen-population quality ledger (~16 B/doc — same narrow
        # projection the decisions ran on, read from its cache): what
        # makes retier_warehouse exact later, for kept AND rejected docs
        TIER_QUALS_TABLE: [wh.stage(
            narrow.select(
                F.col(id_col),
                F.col(qcol).cast("double").alias("quality"),
                F.col("_grp").alias("grp"),
            ),
            TIER_QUALS_TABLE,
        )],
    }
    if first_batch:
        bounds_df = spark.createDataFrame(
            [(i + 1, float(b)) for i, b in enumerate(bounds)],
            "tier long, cutoff double",
        )
        staged[TIER_BOUNDS_TABLE] = [wh.stage(bounds_df, TIER_BOUNDS_TABLE)]
    rep["snapshot_id"] = wh.commit(staged)
    m = obs_out.get
    rep["n_kept"] = int(m["n"])
    rep["kept_per_tier"] = {
        i: int(m[f"t_{i}"] or 0)
        for i in range(1, n_tiers + 1)
        if int(m[f"t_{i}"] or 0) > 0
    }
    narrow.unpersist()
    new.unpersist()
    kept.unpersist()
    return out, rep


@_excluding_aqe_empty_rule
def retier_warehouse(
    spark,
    warehouse_root: str,
    id_col: str = "doc_id",
    *,
    n_tiers: "int | None" = None,
    quota_coeff: float = 8.0,
    relative_error: float = 1e-3,
    salt_shards: int = 16,
    target_files: "int | None" = None,
) -> "tuple[int, dict]":
    """The periodic maintenance job :func:`tiered_ingest`'s frozen-bounds
    design defers to: recompute tier cutoffs from the quality
    distribution of EVERY document the warehouse has ever seen (kept or
    rejected — the ``tier_quals`` ledger, ~16 B/doc), re-map the stored
    ``tiered`` rows to the new tiers, re-apply the sqrt-temperature
    quotas per new (tier, group) cell, and publish the rewritten
    ``tiered`` + ``tier_bounds`` + ``tier_counts`` in ONE replace-commit
    — so after months of drifting ingestion, tiers 1..n mean quantiles
    of the real population again.

    Exactness contract: the replacement ledger's ``n_seen`` per new cell
    is the TRUE seen count (from ``tier_quals``), so post-re-tier
    ingestion tops up each cell against the new bounds with the same
    closed form as always — ``min(m_tot, floor(c*sqrt(m_tot))) -
    kept_so_far`` — with no drift.  Cells whose stored keeps exceed the
    recomputed quota are trimmed by the same deterministic two-level
    md5 lottery the ingest path uses; cells under quota keep everything
    stored (rejected docs' text is gone — their slots refill from
    future batches).  Time travel to pre-re-tier snapshots still reads
    the old tiers (replace-commits never rewrite history; on an Iceberg
    catalog the rewrite rides ``INSERT OVERWRITE`` snapshots through
    IcebergWarehouse.compact).

    ``n_tiers=None`` keeps the stored tier count.  Raises ``ValueError``
    on a warehouse with no committed bounds (nothing to re-tier) or no
    ``tier_quals`` ledger (pre-r7 warehouse: the seen population's
    scores were not recorded, so honest re-tiering is impossible —
    re-ingest, or accept the frozen bounds).

    Returns ``(snapshot_id, report)`` with old/new bounds and kept
    counts.  Maintenance-scale job (a handful of actions over narrow
    ledgers + one corpus-table rewrite); single-writer slot applies.
    """
    import inspect

    from pyspark.sql import Window

    from .io.tables import open_warehouse
    from .operators import curation as cops

    wh = open_warehouse(spark, warehouse_root)
    try:
        stored_bounds = wh.read(spark, TIER_BOUNDS_TABLE).collect()
    except ValueError:
        raise ValueError(
            "retier_warehouse: no committed tier_bounds — run tiered_ingest "
            "first (nothing to re-tier)"
        ) from None
    try:
        quals = wh.read(spark, TIER_QUALS_TABLE)
    except ValueError:
        raise ValueError(
            "retier_warehouse: no tier_quals ledger — this warehouse predates "
            "the seen-population score ledger, so bounds cannot be recomputed "
            "honestly (kept-only quantiles are quota-biased); re-ingest to "
            "rebuild it"
        ) from None
    old_bounds = [
        r["cutoff"] for r in sorted(stored_bounds, key=lambda r: r["tier"])
    ]
    if n_tiers is None:
        n_tiers = len(old_bounds) + 1

    quals = quals.persist()
    bounds = cops.approx_tier_bounds(
        quals, "quality", n_tiers=n_tiers, relative_error=relative_error
    )

    t = F.lit(1)
    for b in bounds:
        t = t + F.when(F.col("quality") < b, 1).otherwise(0)
    assigned = quals.withColumn("_rt_tier", t.cast("long"))
    cells = (
        assigned.groupBy("_rt_tier", "grp")
        .agg(F.count("*").alias("n_seen"))
        .withColumn(
            "_rt_quota",
            F.least(
                F.col("n_seen"),
                F.floor(F.lit(float(quota_coeff))
                        * F.sqrt(F.col("n_seen").cast("double"))),
            ).cast("long"),
        )
    )

    stored = wh.read(spark, TIERED_TABLE)
    out_cols = list(stored.columns)
    # candidates = stored keeps re-mapped to their new tier; the stored
    # table is already quota-bounded (≤ c*sqrt(m) per old cell), so this
    # side is small next to the corpus scan that produced it
    cand = stored.drop("tier").join(
        assigned.select(
            F.col(id_col), F.col("_rt_tier"), F.col("grp").alias("_rt_grp")
        ),
        id_col,
    )
    sized = cand.join(
        F.broadcast(cells.withColumnRenamed("grp", "_rt_grp")),
        ["_rt_tier", "_rt_grp"],
    )
    rkey = F.md5(F.col(id_col).cast("string"))
    order = [rkey, F.col(id_col)]
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit("rt")),
                  F.lit(salt_shards))
    w1 = Window.partitionBy("_rt_tier", "_rt_grp", salt).orderBy(*order)
    pruned = (
        sized.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= F.col("_rt_quota"))
        .drop("_rn1")
    )
    w2 = Window.partitionBy("_rt_tier", "_rt_grp").orderBy(*order)
    kept = (
        pruned.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= F.col("_rt_quota"))
        .withColumn("tier", F.col("_rt_tier"))
    )
    obs_kept = Observation("rt_kept")
    new_tiered = kept.select(*out_cols).observe(
        obs_kept, F.count(F.lit(1)).alias("n")
    )

    # replacement ledger: exact seen counts per NEW cell + what survived
    kept_cells = kept.groupBy("_rt_tier", "_rt_grp").agg(
        F.count("*").alias("n_kept")
    )
    new_counts = (
        cells.withColumnRenamed("grp", "_rt_grp")
        .join(kept_cells, ["_rt_tier", "_rt_grp"], "left")
        .select(
            F.col("_rt_tier").alias("tier"),
            F.col("_rt_grp").alias("grp"),
            "n_seen",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )
    bounds_df = spark.createDataFrame(
        [(i + 1, float(b)) for i, b in enumerate(bounds)],
        "tier long, cutoff double",
    )

    replacements = {
        TIERED_TABLE: new_tiered,
        TIER_BOUNDS_TABLE: bounds_df,
        TIER_COUNTS_TABLE: new_counts,
    }
    if "replace" in inspect.signature(wh.commit).parameters:
        n_parts = target_files or spark.sparkContext.defaultParallelism
        staged = {
            tbl: [wh.stage(df.repartition(n_parts), tbl)]
            for tbl, df in replacements.items()
        }
        snap = wh.commit(staged, replace=set(staged))
    else:
        snap = wh.compact(spark, replacements)
    rep = {
        "snapshot_id": snap,
        "old_bounds": old_bounds,
        "new_bounds": bounds,
        "n_tiers": n_tiers,
        "n_kept": int(obs_kept.get["n"]),
    }
    quals.unpersist()
    return snap, rep
