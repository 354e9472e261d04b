"""URL normalization + host-level filtering (web-curation stage 0).

The standard pre-filters every Common-Crawl-style pipeline runs before
touching page payloads (C4 used a blocklist; RefinedWeb/FineWeb filter
by domain lists and normalize URLs before dedup): all pure column
expressions — narrow maps and one broadcast join, nothing here ever
shuffles the corpus.

ref parity note: the reference keys its cache on the image md5
(ref ocr_translate/views.py:266-268); the web-scale analog keys on the
normalized url, which is why normalization belongs to the engine — two
spellings of one url must not double-extract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tracking parameters stripped during normalization (the unambiguous
# industry-common set: Google/Facebook/Mailchimp click identifiers).
# Deliberately NOT in the list: ``ref`` — many sites use it functionally
# (?ref=<branch> on code forges, referral routing), and since the
# normalized url is the memoization/dedup key, stripping a functional
# param would collapse distinct resources into one ledger entry.
# Curators who want a more aggressive strip opt in via the
# ``strip_params`` argument of :func:`normalize_url`.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "mc_cid", "mc_eid",
)


def _scheme_of(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))


def host_of(url: Column) -> Column:
    """The lowercased host, scheme-default port stripped (empty string
    when the url has no ``scheme://host/`` shape).

    Only the port that IS the scheme's default is stripped — ``:80`` for
    http, ``:443`` for https.  ``http://h:443/x`` names a different
    resource than ``http://h/x`` and keeps its port."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    # strip credentials then the scheme-matching default-port suffix
    host = F.regexp_replace(host, r"^[^@]*@", "")
    scheme = _scheme_of(url)
    return (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )


def registered_domain(url: Column) -> Column:
    """Last-two-labels domain approximation (``a.b.example.com`` ->
    ``example.com``).  A public-suffix-list lookup is the production
    refinement (the PSL file ships with the job as a broadcast dim); the
    two-label fallback is deterministic and dependency-free."""
    return F.regexp_extract(host_of(url), r"([^.]+\.[^.]+)$", 1)


def normalize_url(
    url: Column, strip_params: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """Canonical url for content addressing: lowercase scheme+host,
    scheme-default port stripped, fragment dropped, ``strip_params``
    query keys removed (default: the unambiguous tracking set),
    remaining query keys sorted, trailing slash collapsed (except root).

    Pure column expressions (regexp + array ops) — runs at scan speed;
    the memoization ledger and dedup keys should always use this form."""
    # drop the fragment first
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = _scheme_of(u)
    rest_after_host = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    # split the query, drop tracking params, sort the survivors
    pairs = F.filter(
        F.split(query, "&", -1),
        lambda p: (p != F.lit(""))
        & ~F.regexp_extract(p, r"^([^=]*)", 1).isin(*strip_params),
    )
    sorted_q = F.array_join(F.array_sort(pairs), "&")
    path = F.when(rest_after_host == "", F.lit("/")).otherwise(
        # collapse a trailing slash on non-root paths
        F.regexp_replace(rest_after_host, r"(.)/$", "$1")
    )
    base = F.concat(scheme, F.lit("://"), host_of(u), path)
    return F.when(
        scheme == "", url  # not a scheme://host url: leave untouched
    ).otherwise(
        F.when(sorted_q == "", base).otherwise(F.concat(base, F.lit("?"), sorted_q))
    )


def filter_blocklisted_hosts(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    by_registered_domain: bool = True,
) -> DataFrame:
    """Drop rows whose host (or registered domain) appears in
    ``blocklist`` (a one-column ``host`` DataFrame — UT1/adult-list
    shaped).  The blocklist is broadcast (these lists are a few MB
    against a corpus of TB), so the corpus never shuffles: one narrow
    host extraction + one broadcast LEFT ANTI join.

    Rows whose extracted host is EMPTY (``url_col`` is not a
    scheme://host url) are exempt — they pass through.  A blank or
    malformed blocklist line must never silently drop every
    non-url-keyed row, so empty entries are filtered from the build
    side too."""
    key = registered_domain(F.col(url_col)) if by_registered_domain else host_of(
        F.col(url_col)
    )
    bl = F.broadcast(
        blocklist.select(F.lower(F.col("host")).alias("_bl_host"))
        .filter(F.col("_bl_host") != "")
    )
    return (
        df.withColumn("_host_key", key)
        .join(bl, F.col("_host_key") == F.col("_bl_host"), "left_anti")
        .drop("_host_key")
    )


def host_rank(
    df: DataFrame,
    url_col: str = "url",
    max_k: int = 100_000,
    seed: str = "v1",
    rank_key: Column | None = None,
    salt_shards: int | None = 16,
) -> DataFrame:
    """EXACT per-host rank (1-based, deterministic salted-hash order)
    computed skew-safely, for rows that could be in any host's top
    ``max_k`` — rows provably outside it may be dropped.  Adds columns
    ``_host`` and ``_hc_rn``; callers filter on ``_hc_rn`` and drop both.

    Giant-host treatment (two-level top-k): a single window partitioned
    by host puts a 10^8-page SEO farm through ONE task's sort at crawl
    scale.  Instead, level 1 ranks within ``(host, salt)`` shards
    (``salt_shards`` deterministic url-hash shards) and prunes each
    shard to its local top-``max_k`` — any row in the host's global
    top-``max_k`` is necessarily in its own shard's top-``max_k``, so
    the prune loses nothing; level 2 re-ranks the survivors in one
    window per host whose input is now BOUNDED by
    ``salt_shards * max_k`` rows regardless of host size.  Both levels
    order by the same ``(rank_key, url)`` total order, so the final
    rank (and therefore the kept set) is IDENTICAL to the single-window
    result — verified by equivalence test.  ``salt_shards=None`` (or
    ``<= 1``) opts out to the single window.

    Rows whose extracted host is EMPTY get their own partition (keyed by
    full url), so they rank 1 everywhere — the empty-host exemption the
    callers rely on."""
    from pyspark.sql import Window

    host = host_of(F.col(url_col))
    part_key = F.when(host == "", F.concat(F.lit("\x00"), F.col(url_col))).otherwise(host)
    if rank_key is None:
        rank_key = F.xxhash64(F.concat(F.col(url_col), F.lit(seed)))
    order = [rank_key, F.col(url_col)]
    out = df.withColumn("_host", host)
    if salt_shards and salt_shards > 1:
        salt = F.pmod(
            F.xxhash64(F.col(url_col), F.lit(seed), F.lit("shard")),
            F.lit(salt_shards),
        )
        w1 = Window.partitionBy(part_key, salt).orderBy(*order)
        out = (
            out.withColumn("_hc_rn1", F.row_number().over(w1))
            .filter(F.col("_hc_rn1") <= max_k)
            .drop("_hc_rn1")
        )
    w2 = Window.partitionBy(part_key).orderBy(*order)
    return out.withColumn("_hc_rn", F.row_number().over(w2))


def host_caps(
    df: DataFrame,
    url_col: str = "url",
    max_per_host: int = 100_000,
    seed: str = "v1",
    rank_key: Column | None = None,
    salt_shards: int | None = 16,
) -> DataFrame:
    """Per-host document quota (domain-cap sampling, the anti-SEO-farm
    guard every web corpus applies): keep at most ``max_per_host`` rows
    per host, chosen by a DETERMINISTIC salted-hash ranking so reruns
    and corpus growth keep stable samples (same contract as
    curation.split_by_hash).  ``rank_key`` overrides the default
    xxhash64 ranking (e.g. a portable md5-derived key for cross-engine
    verification).

    Rows whose extracted host is EMPTY (``url_col`` is not a
    scheme://host url) are EXEMPT from the cap: each such row gets its
    own window partition (keyed by its full url value), so the quota
    never collapses a non-url-keyed corpus to ``max_per_host`` rows —
    and the empty-host mass never lands in one giant single-task
    partition either.

    Skew: ranks come from :func:`host_rank`'s salted two-level top-k, so
    a giant host never runs through a single task's sort — the one
    host-partitioned window sees at most ``salt_shards * max_per_host``
    rows per host.  The kept SET is byte-identical to the single-window
    form (``salt_shards=None``)."""
    return (
        host_rank(
            df, url_col, max_per_host,
            seed=seed, rank_key=rank_key, salt_shards=salt_shards,
        )
        .filter(F.col("_hc_rn") <= max_per_host)
        .drop("_hc_rn", "_host")
    )
