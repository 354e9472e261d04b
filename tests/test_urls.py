"""URL normalization + host filtering operators (web-curation stage 0)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_translate_spark.operators import urls


def _norm(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], "url string")
    return df.select(urls.normalize_url(F.col("url")).alias("n")).first()["n"]


def test_normalize_url_canonical_forms(spark):
    # host lowercased, default port stripped, fragment dropped
    assert _norm(spark, "HTTPS://Example.COM:443/Path#frag") == "https://example.com/Path"
    # tracking params removed, remaining query sorted
    assert _norm(
        spark, "http://h.test/p?utm_source=x&b=2&a=1&fbclid=zzz"
    ) == "http://h.test/p?a=1&b=2"
    # all-tracking query collapses entirely
    assert _norm(spark, "http://h.test/p?gclid=1") == "http://h.test/p"
    # trailing slash collapsed on non-root, root kept
    assert _norm(spark, "http://h.test/a/") == "http://h.test/a"
    assert _norm(spark, "http://h.test") == "http://h.test/"
    # non-url strings pass through untouched
    assert _norm(spark, "not a url") == "not a url"
    # path case is PRESERVED (only scheme/host fold)
    assert _norm(spark, "http://H.test/CaseSensitive") == "http://h.test/CaseSensitive"


def test_host_and_registered_domain(spark):
    df = spark.createDataFrame(
        [("https://user:pw@A.B.Example.com:443/x?q=1",)], "url string"
    )
    row = df.select(
        urls.host_of(F.col("url")).alias("h"),
        urls.registered_domain(F.col("url")).alias("d"),
    ).first()
    assert row["h"] == "a.b.example.com"
    assert row["d"] == "example.com"


def test_filter_blocklisted_hosts(spark):
    df = spark.createDataFrame(
        [
            (1, "https://spam.bad.example/x"),
            (2, "https://sub.bad.example/y"),
            (3, "https://good.example/z"),
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame([("bad.example",)], "host string")
    kept = urls.filter_blocklisted_hosts(df, bl).select("id").collect()
    assert {r["id"] for r in kept} == {3}
    # exact-host mode only drops the literal host
    kept2 = urls.filter_blocklisted_hosts(
        df, spark.createDataFrame([("spam.bad.example",)], "host string"),
        by_registered_domain=False,
    ).select("id").collect()
    assert {r["id"] for r in kept2} == {2, 3}
    assert "_host_key" not in urls.filter_blocklisted_hosts(df, bl).columns


def test_host_caps_deterministic_quota(spark):
    rows = [(i, f"https://farm.example/p{i}") for i in range(50)]
    rows += [(100 + i, f"https://small.example/p{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, url string").repartition(8)
    capped = urls.host_caps(df, max_per_host=10)
    by_host = {}
    for r in capped.collect():
        h = r["url"].split("/")[2]
        by_host.setdefault(h, set()).add(r["id"])
    assert len(by_host["farm.example"]) == 10
    assert len(by_host["small.example"]) == 3
    # deterministic: the same quota sample on re-run
    again = {r["id"] for r in urls.host_caps(df, max_per_host=10).collect()}
    assert again == {i for s in by_host.values() for i in s}


def test_host_caps_two_level_equals_single_window(spark):
    """The salted two-level top-k (default) keeps the IDENTICAL set the
    single host window keeps — including a planted giant host, small
    hosts below the cap, and empty-host (exempt) rows — so the skew-safe
    plan changes nothing about semantics."""
    rows = [(i, f"https://giant.example/p{i}") for i in range(600)]
    rows += [(1000 + i, f"https://small.example/p{i}") for i in range(7)]
    rows += [(2000 + i, f"plain-key-{i}") for i in range(30)]  # empty host
    df = spark.createDataFrame(rows, "id long, url string").repartition(8)
    two = {r["id"] for r in urls.host_caps(df, max_per_host=20).collect()}
    one = {r["id"] for r in
           urls.host_caps(df, max_per_host=20, salt_shards=None).collect()}
    assert two == one
    giant = sum(1 for i in two if i < 1000)
    assert giant == 20
    assert {1000 + i for i in range(7)} <= two       # below cap: all kept
    assert {2000 + i for i in range(30)} <= two      # exempt: all kept


def test_host_caps_plan_is_salted(spark):
    """Plan guard for the 100 TB skew story: the default host_caps plan
    contains NO window partitioned by the bare host key alone over the
    full input — the first (full-corpus) window partitions by
    (host, salt), and the bare-host window runs only above the
    shard-pruned filter (bounded input per host)."""
    df = spark.createDataFrame(
        [(i, f"https://h{i % 3}.example/p{i}") for i in range(30)],
        "id long, url string",
    )
    import re

    plan = urls.host_caps(df, max_per_host=5)._jdf.queryExecution().optimizedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window [row_number()" in ln]
    assert len(windows) == 2, plan
    # level 1 (deeper = later line) partitions by TWO columns (host, salt)
    assert re.search(r"AS _hc_rn1#\d+\], \[_w0#\d+, _w1#\d+L?\]", windows[1]), windows[1]
    # level 2 partitions by the bare host key ALONE...
    assert re.search(r"AS _hc_rn#\d+\], \[_w0#\d+\],", windows[0]), windows[0]
    # ...but only above the shard-local-rank prune, so its per-host input
    # is bounded by salt_shards * max_per_host
    assert "Filter (_hc_rn1" in plan, plan
    # the salt is a pmod over a url hash, and Spark's WindowGroupLimit
    # computes both top-k prunes map-side before the sorts
    assert "pmod(xxhash64" in plan
    assert plan.count("WindowGroupLimit") == 2, plan


def test_normalize_url_idempotent(spark):
    """Canonicalization must be a fixed point: normalize(normalize(u)) ==
    normalize(u) for a grid of messy url shapes (double application is
    what happens when a re-crawl re-ingests an already-normalized
    ledger)."""
    raws = [
        "HTTP://A.B.C:80/x/y/?b=2&a=1&utm_source=s#frag",
        "https://h.test:443/",
        "https://h.test//double//slash/",
        "ftp://H.TEST/file",
        "https://h.test/p?ref=x",
        "https://h.test/p?a=&b=1",
        "https://user@h.test/p",
        "not a url at all",
        "",
        "https://h.test/p?a=1&a=0",  # duplicate keys keep both, sorted
    ]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    once = df.select(
        F.col("url"), urls.normalize_url(F.col("url")).alias("n1")
    )
    twice = once.select(
        "url", "n1", urls.normalize_url(F.col("n1")).alias("n2")
    ).collect()
    for r in twice:
        assert r["n1"] == r["n2"], (r["url"], r["n1"], r["n2"])


def test_scheme_aware_default_port_strip(spark):
    """Only the scheme's OWN default port is stripped — http://h:443 and
    https://h:80 name non-default-port resources and keep their port
    (advisor r4: the old unconditional :80|:443 strip collapsed them)."""
    df = spark.createDataFrame(
        [
            ("http://h.test:80/x",), ("https://h.test:443/x",),
            ("http://h.test:443/x",), ("https://h.test:80/x",),
            ("ftp://h.test:80/x",),
        ],
        "url string",
    )
    hosts = [r["h"] for r in df.select(urls.host_of(F.col("url")).alias("h")).collect()]
    assert hosts == ["h.test", "h.test", "h.test:443", "h.test:80", "h.test:80"]
    norms = [
        r["n"] for r in df.select(urls.normalize_url(F.col("url")).alias("n")).collect()
    ]
    assert norms[2] == "http://h.test:443/x"
    assert norms[3] == "https://h.test:80/x"


def test_ref_param_preserved_strip_list_opt_in(spark):
    """'ref' is functional on many sites (?ref=<branch>) — the default
    strip list keeps it; curators opt in via strip_params."""
    assert _norm(spark, "https://h.test/repo?ref=main") == "https://h.test/repo?ref=main"
    df = spark.createDataFrame([("https://h.test/repo?ref=main",)], "url string")
    aggressive = df.select(
        urls.normalize_url(
            F.col("url"), strip_params=urls.TRACKING_PARAMS + ("ref",)
        ).alias("n")
    ).first()["n"]
    assert aggressive == "https://h.test/repo"


def test_empty_host_rows_exempt_from_caps_and_blocklist(spark):
    """Non-url keys (numeric ids) yield empty hosts; the cap must not
    collapse such a corpus to max_per_host rows, and a blank blocklist
    entry must not drop every non-url row (advisor r4, medium)."""
    rows = [(str(i),) for i in range(40)]  # no scheme://host shape
    rows += [(f"https://farm.example/p{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "url string")
    capped = urls.host_caps(df, max_per_host=5)
    kept = [r["url"] for r in capped.collect()]
    assert sum(1 for u in kept if u.startswith("https://")) == 5
    assert sum(1 for u in kept if not u.startswith("https://")) == 40
    bl = spark.createDataFrame([("",), ("farm.example",)], "host string")
    surv = urls.filter_blocklisted_hosts(df, bl).collect()
    assert len(surv) == 40 and all(not r["url"].startswith("https") for r in surv)


def test_curate_requires_explicit_url_col(spark):
    import pytest as _pytest

    from ocr_translate_spark.curate import curate_corpus

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="url_col"):
        curate_corpus(df, max_per_host=10)
    with _pytest.raises(ValueError, match="url_col"):
        curate_corpus(
            df, blocklist=spark.createDataFrame([("h",)], "host string")
        )
