"""URL canonicalization / domain extraction / blocklist / domain caps —
the crawl-provenance stage (pipeline/web.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.web import (
    canonical_url,
    domain_cap,
    domain_stats,
    filter_blocked_domains,
    registrable_domain,
    url_host,
)


def _one(spark, expr, url):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(expr(F.col("url")).alias("v"))
        .collect()[0]["v"]
    )


CANON_CASES = [
    # tracking params stripped, survivors sorted, fragment dropped
    (
        "https://Example.COM/a/b?utm_source=x&z=2&a=1&fbclid=abc#frag",
        "https://example.com/a/b?a=1&z=2",
    ),
    # default ports stripped per scheme; explicit non-default kept
    ("http://host.org:80/p", "http://host.org/p"),
    ("https://host.org:443/p", "https://host.org/p"),
    ("https://host.org:8443/p", "https://host.org:8443/p"),
    # empty path -> '/', empty query dropped
    ("https://example.com", "https://example.com/"),
    ("https://example.com?utm_campaign=only", "https://example.com/"),
    # scheme case folded; host trailing dot removed
    ("HTTPS://EXAMPLE.com./x", "https://example.com/x"),
    # non-http(s) and garbage -> NULL
    ("ftp://example.com/x", None),
    ("not a url", None),
]


@pytest.mark.parametrize("raw,want", CANON_CASES)
def test_canonical_url_cases(spark, raw, want):
    assert _one(spark, canonical_url, raw) == want


def test_canonical_url_is_idempotent(spark):
    urls = [u for u, want in CANON_CASES if want is not None]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    twice = [
        r["c"]
        for r in df.select(
            canonical_url(canonical_url(F.col("url"))).alias("c")
        ).collect()
    ]
    assert once == twice


def test_host_and_registrable_domain(spark):
    cases = [
        ("https://www.news.example.co.uk/x", "news.example.co.uk", "example.co.uk"),
        ("https://a.b.example.com/x", "a.b.example.com", "example.com"),
        ("https://example.com/x", "example.com", "example.com"),
        ("https://www.example.org/", "example.org", "example.org"),
        ("https://sub.site.com.au/p", "sub.site.com.au", "site.com.au"),
        ("https://localhost/x", "localhost", "localhost"),
        ("garbage", None, None),
    ]
    for url, host, dom in cases:
        assert _one(spark, url_host, url) == host, url
        assert _one(spark, registrable_domain, url) == dom, url


def test_filter_blocked_domains_blocks_subdomains(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://spam.example.com/a"),
            (2, "https://www.example.com/b"),
            (3, "https://fine.org/c"),
            (4, "https://notexample.com/d"),
        ],
        "doc_id long, url string",
    )
    kept = sorted(
        r.doc_id
        for r in filter_blocked_domains(docs, ["Example.com"]).collect()
    )
    assert kept == [3, 4]


def test_domain_cap_deterministic_and_monotone(spark):
    docs = spark.createDataFrame(
        [
            (i, f"https://{'hot' if i % 4 else 'cold'}.site.com/p{i}")
            for i in range(200)
        ],
        "doc_id long, url string",
    )
    # all 200 URLs share registrable domain site.com -> one cap group
    c10 = sorted(r.doc_id for r in domain_cap(docs, 10).collect())
    c10b = sorted(
        r.doc_id for r in domain_cap(docs.repartition(13), 10).collect()
    )
    c25 = sorted(r.doc_id for r in domain_cap(docs, 25).collect())
    assert c10 == c10b and len(c10) == 10 and len(c25) == 25
    assert set(c10) <= set(c25)  # raising the cap only adds


def test_domain_stats_shares_sum_to_one(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://a.com/1"),
            (2, "https://a.com/2"),
            (3, "https://b.org/1"),
            (4, "https://sub.a.com/3"),
        ],
        "doc_id long, url string",
    )
    rows = {r.domain: r for r in domain_stats(docs).collect()}
    assert rows["a.com"].n_docs == 3 and rows["b.org"].n_docs == 1
    assert rows["a.com"].doc_share == 0.75


def test_blocklist_subdomain_entry_blocks_only_its_subtree(spark):
    """Round-7 review: blocklist entries at subdomain granularity must
    match (host-suffix semantics), and must NOT block the parent."""
    docs = spark.createDataFrame(
        [
            (1, "https://spam.example.com/a"),
            (2, "https://deep.spam.example.com/b"),
            (3, "https://www.example.com/c"),
            (4, "https://other.org/d"),
        ],
        "doc_id long, url string",
    )
    kept = sorted(
        r.doc_id
        for r in filter_blocked_domains(docs, ["spam.example.com"]).collect()
    )
    assert kept == [3, 4]
    # empty/None-host rows survive an empty blocklist untouched
    assert filter_blocked_domains(docs, []).count() == 4


def test_blocklist_size_budget_enforced(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.com/x")], "doc_id long, url string"
    )
    with pytest.raises(ValueError, match="max_entries"):
        filter_blocked_domains(
            docs, [f"d{i}.com" for i in range(30)], max_entries=10
        )
    bl_df = spark.createDataFrame(
        [(f"d{i}.com",) for i in range(30)], "domain string"
    )
    with pytest.raises(ValueError, match="max_entries"):
        filter_blocked_domains(docs, bl_df, max_entries=10)


# ---------------------------------------------------------------------------
# robots.txt compliance (RFC 9309)
# ---------------------------------------------------------------------------

ROBOTS = """
# site policy
User-agent: specialbot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/ok/
Disallow: /*.pdf$
Allow:
"""


def test_parse_robots_group_selection():
    from noaa_oracle_spark.pipeline.web import parse_robots

    star = parse_robots(ROBOTS, "*")
    assert ("/private/", False) in star and ("/private/ok/", True) in star
    # empty Disallow/Allow values contribute no rule
    assert all(p for p, _ in star)
    # exact product token wins its own (stricter) group
    special = parse_robots(ROBOTS, "SpecialBot")
    assert special == [("/", False)]
    # unknown agent falls back to the * group
    assert parse_robots(ROBOTS, "otherbot") == star
    assert parse_robots("", "*") == []


def test_robots_allows_longest_match_and_specials():
    from noaa_oracle_spark.pipeline.web import parse_robots, robots_allows

    rules = parse_robots(ROBOTS, "*")
    assert robots_allows(rules, "/") is True  # no match => allowed
    assert robots_allows(rules, "/private/x") is False
    assert robots_allows(rules, "/private/ok/x") is True  # longer Allow
    assert robots_allows(rules, "/tmpfile") is False  # prefix semantics
    assert robots_allows(rules, "/doc/a.pdf") is False  # * and $ honored
    assert robots_allows(rules, "/doc/a.pdfx") is True  # $ anchors end
    # tie between Allow and Disallow of equal length: Allow wins
    tie = [("/p", False), ("/p", True)]
    assert robots_allows(tie, "/page") is True


def test_filter_robots_disallowed_spark(spark):
    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    docs = spark.createDataFrame(
        [
            (1, "https://www.a.test/private/x"),
            (2, "https://a.test/public/x"),
            (3, "https://b.test/anything"),  # no robots row: allowed
            (4, "https://a.test/private/ok/y"),
            (5, None),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.test", ROBOTS)], "host string, robots_txt string"
    )
    kept = sorted(
        r.doc_id for r in filter_robots_disallowed(docs, robots).collect()
    )
    assert kept == [2, 3, 4, 5]
    # the special agent's own group applies when requested
    kept_special = sorted(
        r.doc_id
        for r in filter_robots_disallowed(
            docs, robots, user_agent="specialbot"
        ).collect()
    )
    assert kept_special == [3, 5]


def test_rule_matches_anchored_wildcard():
    """Anchored rules must consider LATER fragment occurrences: greedy
    leftmost binding of the final fragment wrongly failed '/*x$' on
    '/axbx' (round-8 advice)."""
    from noaa_oracle_spark.pipeline.web import _rule_matches, robots_allows

    assert _rule_matches("/*x$", "/axbx") is True
    assert _rule_matches("/*x$", "/axby") is False
    assert _rule_matches("/a*b*c$", "/aXbXbYc") is True  # greedy mid, end-anchored tail
    assert _rule_matches("/a*b$", "/ab") is True
    assert _rule_matches("/a*$", "/anything") is True  # trailing *$ = prefix
    assert _rule_matches("/x$", "/x") is True
    assert _rule_matches("/x$", "/xy") is False
    # the overlap case: last fragment may start before the middle match
    # ends only if a LATER disjoint occurrence exists
    assert _rule_matches("/*ab$", "/aab") is True
    assert robots_allows([("/*.pdf$", False)], "/a.pdf.pdf") is False


def test_robots_host_normalization_both_sides(spark):
    """A robots row keyed 'www.example.com' (or with a trailing dot)
    must still govern documents whose host normalizes to 'example.com'
    — both sides share normalize_host (round-8 advice)."""
    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    docs = spark.createDataFrame(
        [
            (1, "https://example.com/private/x"),
            (2, "https://www.example.com/private/y"),
            (3, "https://example.com/ok"),
            (4, "https://other.test/private/z"),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("www.example.com.", "User-agent: *\nDisallow: /private/")],
        "host string, robots_txt string",
    )
    kept = sorted(
        r.doc_id for r in filter_robots_disallowed(docs, robots).collect()
    )
    assert kept == [3, 4]


def test_filter_robots_plans_agree(spark):
    """broadcast and shuffle join plans produce identical verdicts, and
    both agree with a driver-side pure-Python oracle."""
    from urllib.parse import urlsplit

    from noaa_oracle_spark.pipeline.web import (
        filter_robots_disallowed,
        parse_robots,
        robots_allows,
    )

    doc_rows = [
        (i, f"https://h{i % 7}.test/p{i % 5}/f{i}" + ("" if i % 3 else ".pdf"))
        for i in range(60)
    ] + [(100, None), (101, "not a url ://")]
    robots_rows = [
        (f"h{k}.test", f"User-agent: *\nDisallow: /p{k % 5}/\nDisallow: /*.pdf$")
        for k in range(5)
    ] + [("h5.test", "User-agent: *\nAllow: /")]  # no restriction -> drops out
    docs = spark.createDataFrame(doc_rows, "doc_id long, url string")
    robots = spark.createDataFrame(robots_rows, "host string, robots_txt string")

    kept_b = sorted(
        r.doc_id
        for r in filter_robots_disallowed(docs, robots, plan="broadcast").collect()
    )
    kept_s = sorted(
        r.doc_id
        for r in filter_robots_disallowed(docs, robots, plan="shuffle").collect()
    )
    kept_i = sorted(
        r.doc_id
        for r in filter_robots_disallowed(docs, robots, plan="inline").collect()
    )
    assert kept_b == kept_s == kept_i

    rule_map = {h: parse_robots(t, "*") for h, t in robots_rows}
    expect = []
    for doc_id, u in doc_rows:
        if u is None:
            expect.append(doc_id)
            continue
        parts = urlsplit(u)
        host = (parts.hostname or "").lower().removeprefix("www.")
        rules = rule_map.get(host)
        if not rules:
            expect.append(doc_id)
            continue
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        if robots_allows(rules, path):
            expect.append(doc_id)
    assert kept_b == sorted(expect)
    # schema passthrough: helper columns dropped
    out = filter_robots_disallowed(docs, robots, plan="broadcast")
    assert out.columns == docs.columns


def test_filter_robots_duplicate_host_rows_no_fanout(spark):
    """Duplicate robots rows for one (normalized) host must not
    duplicate document rows through the join; the folded host gets the
    UNION of both bodies' rules (so both /a and /b are disallowed)."""
    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    docs = spark.createDataFrame(
        [
            (1, "https://dup.test/a"),
            (2, "https://dup.test/b"),
            (3, "https://dup.test/c"),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [
            ("dup.test", "User-agent: *\nDisallow: /a"),
            ("www.dup.test", "User-agent: *\nDisallow: /b"),
        ],
        "host string, robots_txt string",
    )
    out = filter_robots_disallowed(docs, robots, plan="shuffle").collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [3]
    assert len(out) == len(set(r.doc_id for r in out))


def test_parse_robots_rules_drops_unrestricted_hosts(spark):
    from noaa_oracle_spark.pipeline.web import parse_robots_rules

    robots = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\nDisallow: /x"),
            ("b.test", "User-agent: *\nAllow: /"),  # no restriction
            ("c.test", ""),
            (None, "User-agent: *\nDisallow: /"),
        ],
        "host string, robots_txt string",
    )
    rows = parse_robots_rules(robots).collect()
    assert [r.host for r in rows] == ["a.test"]
    assert [(d.p, d.allow) for d in rows[0].rules] == [("/x", False)]


def test_filter_robots_docs_with_own_host_column(spark):
    """A docs frame carrying its OWN host/rules columns must pass
    through untouched — the join's helper columns are renamed, never
    dropped by a name that could collide."""
    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    docs = spark.createDataFrame(
        [
            (1, "https://a.test/private/x", "keep-me", "r1"),
            (2, "https://a.test/ok", "keep-me-too", "r2"),
        ],
        "doc_id long, url string, host string, rules string",
    )
    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /private/")],
        "host string, robots_txt string",
    )
    out = filter_robots_disallowed(docs, robots).collect()
    assert len(out) == 1
    assert out[0].doc_id == 2
    assert out[0].host == "keep-me-too" and out[0].rules == "r2"


def test_filter_robots_plan_shape(spark):
    """Pin the de-weaked scale shape: rules pre-parse is ONE
    MapInPandas (a pandas_udf projection + where would evaluate the
    parse twice), evaluation is ONE Arrow stage, the broadcast plan
    joins with BroadcastHashJoin (documents cross no exchange) and the
    shuffle plan with ShuffledHashJoin (never sort-merge — no ordering
    requirement on the corpus side)."""
    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    docs = spark.createDataFrame(
        [(1, "https://a.test/x")], "doc_id long, url string"
    )
    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /p")],
        "host string, robots_txt string",
    )
    plans = {}
    for plan in ("broadcast", "shuffle"):
        out = filter_robots_disallowed(docs, robots, plan=plan)
        plans[plan] = out._jdf.queryExecution().executedPlan().toString()
    for plan, s in plans.items():
        assert s.count("MapInPandas") == 1, (plan, s)
        assert s.count("ArrowEvalPython") == 1, (plan, s)
        assert "SortMergeJoin" not in s, (plan, s)
    assert "BroadcastHashJoin" in plans["broadcast"], plans["broadcast"]
    assert "ShuffledHashJoin" in plans["shuffle"], plans["shuffle"]


def test_filter_robots_inline_budget_and_auto_fallback(spark):
    """plan='inline' beyond max_inline_hosts raises loudly; plan='auto'
    falls back to the shuffle join and still answers correctly."""
    import pytest as _pytest

    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    docs = spark.createDataFrame(
        [(i, f"https://h{i % 5}.test/p/{i}") for i in range(10)],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [(f"h{k}.test", "User-agent: *\nDisallow: /p/") for k in range(5)],
        "host string, robots_txt string",
    )
    with _pytest.raises(ValueError, match="max_inline_hosts|driver budget"):
        filter_robots_disallowed(
            docs, robots, plan="inline", max_inline_hosts=2
        )
    out = filter_robots_disallowed(
        docs, robots, plan="auto", max_inline_hosts=2
    )
    assert out.count() == 0  # every host disallows /p/


def test_robots_union_of_folding_hosts(spark):
    """www and apex rows folding to one normalized host contribute the
    UNION of their rules — picking one body could silently discard the
    other's Disallow (round-8 review)."""
    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    docs = spark.createDataFrame(
        [
            (1, "https://x.test/a/1"),
            (2, "https://x.test/b/2"),
            (3, "https://x.test/c/3"),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [
            ("x.test", "User-agent: *\nAllow: /\nDisallow: /a/"),
            ("www.x.test", "User-agent: *\nDisallow: /b/"),
        ],
        "host string, robots_txt string",
    )
    for plan in ("inline", "broadcast", "shuffle"):
        kept = sorted(
            r.doc_id
            for r in filter_robots_disallowed(
                docs, robots, plan=plan
            ).collect()
        )
        assert kept == [3], plan


def test_filter_robots_inline_composes_with_streaming(spark, tmp_path):
    """The inline plan is join-free (scan-stage UDF filter), so the
    compliance pass composes directly into a Structured Streaming
    ingest — the streaming twin comes for free; verdicts equal the
    batch run over the same rows."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    src = tmp_path / "docs_in"
    os.makedirs(src)
    rows = [(i, f"https://h{i % 3}.test/p{i % 2}/f{i}") for i in range(40)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows]),
            }
        ),
        str(src / "b0.parquet"),
    )
    robots = spark.createDataFrame(
        [(f"h{k}.test", "User-agent: *\nDisallow: /p0/") for k in range(2)],
        "host string, robots_txt string",
    )
    stream = spark.readStream.schema("doc_id long, url string").parquet(
        str(src)
    )
    out = filter_robots_disallowed(stream, robots, plan="inline")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("robots_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish"
    got = sorted(
        r.doc_id for r in spark.sql("SELECT * FROM robots_stream").collect()
    )
    batch = spark.createDataFrame(rows, "doc_id long, url string")
    want = sorted(
        r.doc_id
        for r in filter_robots_disallowed(
            batch, robots, plan="inline"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_filter_robots_plans_agree_on_malformed_urls(spark):
    """The inline plan keys its dict lookup on the SAME url_host
    expression the join plans key on, so URLs that Python's urlsplit
    and Spark's try_parse_url parse differently (bad port, embedded
    whitespace) get the same verdict from every plan (round-8
    review)."""
    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    docs = spark.createDataFrame(
        [
            (1, "https://a.test:80a/private/x"),  # invalid port
            (2, "https://a.test/pri\tvate/x"),  # embedded tab
            (3, "https://a.test/private/x"),  # well-formed: dropped
            (4, None),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /private/")],
        "host string, robots_txt string",
    )
    verdicts = {}
    for plan in ("inline", "broadcast", "shuffle"):
        verdicts[plan] = sorted(
            r.doc_id
            for r in filter_robots_disallowed(
                docs, robots, plan=plan
            ).collect()
        )
    assert verdicts["inline"] == verdicts["broadcast"] == verdicts["shuffle"]
    assert 3 not in verdicts["inline"]


def test_filter_robots_inline_no_restrictions_short_circuits(spark):
    """An all-Allow robots dimension leaves the docs plan UNTOUCHED in
    the inline path — no Arrow stage, no filter (the open-web common
    case)."""
    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    docs = spark.createDataFrame(
        [(1, "https://a.test/x"), (2, "https://b.test/y")],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nAllow: /")],
        "host string, robots_txt string",
    )
    out = filter_robots_disallowed(docs, robots, plan="inline")
    assert out is docs
    assert out.count() == 2


def test_robots_sitemaps_and_crawl_delay(spark):
    from noaa_oracle_spark.pipeline.web import (
        parse_crawl_delay,
        robots_sitemap_urls,
        sitemap_locs,
    )

    body = (
        "Sitemap: https://a.test/sitemap.xml\n"
        "User-agent: fastbot\nCrawl-delay: 0.5\nDisallow: /x\n\n"
        "User-agent: *\ncrawl-DELAY: 10\nDisallow: /y\n"
        "  sitemap:https://a.test/extra.xml\n"
        "Crawl-delay: nonsense\n"
    )
    df = spark.createDataFrame([(body,)], "robots_txt string")
    maps = df.select(
        robots_sitemap_urls(F.col("robots_txt")).alias("m")
    ).collect()[0]["m"]
    assert maps == [
        "https://a.test/sitemap.xml",
        "https://a.test/extra.xml",
    ]
    # group selection mirrors parse_robots; junk values parse to None
    assert parse_crawl_delay(body, "fastbot") == 0.5
    assert parse_crawl_delay(body, "otherbot") == 10.0
    assert parse_crawl_delay("User-agent: *\nDisallow: /x", "*") is None
    assert parse_crawl_delay("", "*") is None

    sm = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a.test/p1</loc><lastmod>2026-01-01</lastmod></url>"
        "<url><loc>https://a.test/p2</loc></url></urlset>"
    )
    sm_nons = "<urlset><url><loc>https://b.test/q</loc></url></urlset>"
    sdf = spark.createDataFrame([(sm,), (sm_nons,)], "xml string")
    locs = [
        r["l"]
        for r in sdf.select(sitemap_locs(F.col("xml")).alias("l")).collect()
    ]
    assert locs == [
        ["https://a.test/p1", "https://a.test/p2"],
        ["https://b.test/q"],
    ]


def test_politeness_waves(spark):
    from noaa_oracle_spark.pipeline.web import politeness_waves

    frontier = spark.createDataFrame(
        [(f"https://h{i % 2}.test/p{i}",) for i in range(10)],
        "url string",
    )
    delays = spark.createDataFrame(
        [("h0.test", 2.5)], "host string, delay_s double"
    )
    out = politeness_waves(frontier, delays=delays, default_delay=1.0)
    rows = out.collect()
    assert out.columns == ["url", "wave", "not_before_s"]
    by_host = {}
    for r in rows:
        h = r.url.split("/")[2]
        by_host.setdefault(h, []).append(r)
    # each host's waves are 0..n-1 exactly once
    for h, rs in by_host.items():
        assert sorted(r.wave for r in rs) == list(range(len(rs)))
    # per-host delay honored; default applies to the missing host
    assert {r.not_before_s for r in by_host["h0.test"]} == {
        0.0, 2.5, 5.0, 7.5, 10.0
    }
    assert {r.not_before_s for r in by_host["h1.test"]} == {
        0.0, 1.0, 2.0, 3.0, 4.0
    }
    # deterministic across partitionings
    again = politeness_waves(
        frontier.repartition(7), delays=delays, default_delay=1.0
    ).collect()
    assert {(r.url, r.wave) for r in again} == {
        (r.url, r.wave) for r in rows
    }


def test_politeness_waves_duplicate_host_variants_no_fanout(spark):
    """Dim rows folding to one normalized host (www/apex, case) must
    collapse to ONE delay row before the broadcast join — duplicates
    would fan each frontier row out into copies with conflicting
    not_before_s.  max() keeps the conservative delay."""
    from noaa_oracle_spark.pipeline.web import politeness_waves

    frontier = spark.createDataFrame(
        [(f"https://a.com/p{i}",) for i in range(4)], "url string"
    )
    delays = spark.createDataFrame(
        [("www.a.com", 1.0), ("a.com", 2.0), ("A.COM", 0.5)],
        "host string, delay_s double",
    )
    out = politeness_waves(frontier, delays=delays).collect()
    assert len(out) == 4  # no fanout
    assert sorted(r.wave for r in out) == [0, 1, 2, 3]
    # conservative (max) delay wins the fold
    assert sorted(r.not_before_s for r in out) == [0.0, 2.0, 4.0, 6.0]


def test_parse_crawl_delay_group_boundaries_follow_parse_robots(spark):
    """A crawl-delay line must NOT open a group body: parse_robots
    ignores crawl-delay entirely, so 'UA a / Crawl-delay / UA b / rule'
    is ONE group covering both agents — the two parsers must select the
    same group."""
    from noaa_oracle_spark.pipeline.web import parse_crawl_delay

    body = "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /x"
    # both agents are in the same group, so both see delay 5
    assert parse_crawl_delay(body, "a") == 5.0
    assert parse_crawl_delay(body, "b") == 5.0
    # a crawl-delay after the body closed belongs to the NEXT group
    body2 = (
        "User-agent: a\nDisallow: /x\n"
        "User-agent: b\nCrawl-delay: 3\nDisallow: /y"
    )
    assert parse_crawl_delay(body2, "a") is None
    assert parse_crawl_delay(body2, "b") == 3.0
    # header crawl-delay before any user-agent applies to no group
    assert parse_crawl_delay("Crawl-delay: 9\nUser-agent: *\nDisallow: /", "*") is None


def test_crawl_rounds_multi_round_frontier(spark):
    """2+-round crawl loop: rounds are disjoint (global seen dedup —
    cycles and converging links never re-enter the frontier), robots
    filtering applies inside the loop, the loop stops early when the
    frontier dries up, and the schedule is deterministic."""
    from noaa_oracle_spark.pipeline.web import crawl_rounds, table_fetcher

    pages = spark.createDataFrame(
        [
            # start → p1, p2, a robots-blocked url, and BACK to start
            (
                "https://a.test/start",
                '<a href="/p1">1</a><a href="/p2">2</a>'
                '<a href="https://b.test/blocked/x">b</a>'
                '<a href="/start">cycle</a>',
            ),
            # p1 → p3 and itself; p2 → p3 (converging) and start (cycle)
            ("https://a.test/p1", '<a href="/p3">3</a><a href="/p1">me</a>'),
            ("https://a.test/p2", '<a href="/p3">3</a><a href="/start">s</a>'),
            # p3 → p4: reachable only at round 3
            ("https://a.test/p3", '<a href="/p4">4</a>'),
        ],
        "url string, html string",
    )
    robots = spark.createDataFrame(
        [("b.test", "User-agent: *\nDisallow: /blocked/")],
        "host string, robots_txt string",
    )
    seeds = spark.createDataFrame([("https://a.test/start",)], "url string")

    out = crawl_rounds(
        seeds, table_fetcher(pages), rounds=2, robots=robots
    )
    assert out.columns == ["url", "round", "wave", "not_before_s"]
    rows = out.collect()
    by_round = {}
    for r in rows:
        by_round.setdefault(r["round"], set()).add(r.url)
    assert by_round == {
        0: {"https://a.test/start"},
        1: {"https://a.test/p1", "https://a.test/p2"},
        2: {"https://a.test/p3"},
    }
    # disjoint rounds == global dedup: no url appears twice
    assert len(rows) == len({r.url for r in rows})
    # waves restart per round and respect the default 1.0s delay
    r1 = sorted(
        (r.wave, r.not_before_s) for r in rows if r["round"] == 1
    )
    assert r1 == [(0, 0.0), (1, 1.0)]

    # early stop: p4 has no page, so round 4+ frontiers dry up
    deep = crawl_rounds(seeds, table_fetcher(pages), rounds=10)
    assert deep.agg(F.max("round")).collect()[0][0] == 3  # p4 at round 3
    # determinism across input partitionings
    again = crawl_rounds(
        seeds.repartition(5), table_fetcher(pages.repartition(3)),
        rounds=2, robots=robots,
    ).collect()
    assert {(r.url, r["round"], r.wave) for r in again} == {
        (r.url, r["round"], r.wave) for r in rows
    }


def test_crawl_rounds_budget_and_empty_seeds(spark):
    from noaa_oracle_spark.pipeline.web import crawl_rounds, table_fetcher

    pages = spark.createDataFrame(
        [
            (
                "https://a.test/start",
                "".join(f'<a href="/p{i}">x</a>' for i in range(8)),
            ),
        ],
        "url string, html string",
    )
    seeds = spark.createDataFrame([("https://a.test/start",)], "url string")
    out = crawl_rounds(
        seeds, table_fetcher(pages), rounds=1, max_frontier=3
    )
    r1 = [r.url for r in out.collect() if r["round"] == 1]
    assert len(r1) == 3
    # deterministic truncation: same 3 urls every run
    again = crawl_rounds(
        seeds, table_fetcher(pages), rounds=1, max_frontier=3
    )
    assert sorted(r.url for r in again.collect() if r["round"] == 1) == sorted(r1)

    empty = spark.createDataFrame([], "url string")
    with pytest.raises(ValueError, match="empty seed frontier"):
        crawl_rounds(empty, table_fetcher(pages), rounds=1)


def test_crawl_rounds_persist_budget(spark):
    """The loop persists exactly one frame per materialized frontier
    round; the accumulated seen-set union must NOT be re-persisted
    (its legs already are — a persist there stores every earlier
    round again, O(rounds) duplicate storage for the same rows)."""
    from noaa_oracle_spark.pipeline.web import crawl_rounds, table_fetcher

    pages = spark.createDataFrame(
        [
            ("https://a.test/start", '<a href="/p1">1</a>'),
            ("https://a.test/p1", '<a href="/p2">2</a>'),
            ("https://a.test/p2", '<a href="/p3">3</a>'),
        ],
        "url string, html string",
    )
    seeds = spark.createDataFrame([("https://a.test/start",)], "url string")
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    out = crawl_rounds(seeds, table_fetcher(pages), rounds=3)
    assert out.count() == 4  # start + p1 + p2 + p3
    added = jsc.getPersistentRDDs().size() - before
    # 4 frontier rounds materialized (0..3) + at most 1 for the final
    # empty-probe round; a persisted seen-union chain would add ~3 more
    assert added <= 5


def test_http_fetcher_politeness_and_retry(spark):
    """The production fetcher kernel under a virtual clock (the
    test_daemon discipline): per-host fetch starts honor the
    politeness_waves schedule AND the crawl-delay spacing, transient
    transport failures retry with backoff, and a URL that exhausts its
    retries yields no row (table_fetcher's 404 semantics)."""
    from noaa_oracle_spark.pipeline.web import http_fetcher
    from tests.test_daemon import VirtualTime

    vt = VirtualTime()
    attempts: dict = {}

    def transport(url, timeout, headers):
        assert headers["User-Agent"].startswith("noaa-oracle-spark")
        attempts[url] = attempts.get(url, 0) + 1
        if url.endswith("/flaky") and attempts[url] < 3:
            raise OSError("transient")
        if url.endswith("/dead"):
            raise OSError("always down")
        return f"<html>{url}</html>"

    frontier = spark.createDataFrame(
        [
            ("http://h0.test/a",), ("http://h0.test/b",),
            ("http://h0.test/c",), ("http://h1.test/flaky",),
            ("http://h1.test/x",), ("http://h1.test/dead",),
        ],
        "url string",
    )
    delays = spark.createDataFrame(
        [("h0.test", 2.0)], "host string, delay_s double"
    )
    fetched = http_fetcher(
        delays=delays,
        default_delay=1.0,
        transport=transport,
        clock=vt.clock,
        sleep=vt.sleep,
        npartitions=1,
        backoff_base=0.25,
    )(frontier)
    assert fetched.columns == ["url", "html", "fetched_at_s"]
    rows = fetched.collect()

    live = {
        "http://h0.test/a", "http://h0.test/b", "http://h0.test/c",
        "http://h1.test/flaky", "http://h1.test/x",
    }
    assert {r.url for r in rows} == live  # dead link dropped
    assert all(r.html == f"<html>{r.url}</html>" for r in rows)

    # per-host start spacing >= that host's crawl delay
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r.url.split("/")[2], []).append(r.fetched_at_s)
    for host, ts in by_host.items():
        d = 2.0 if host == "h0.test" else 1.0
        ts = sorted(ts)
        assert all(b - a >= d - 1e-9 for a, b in zip(ts, ts[1:])), (
            host, ts
        )


def test_crawl_rounds_with_http_fetcher_matches_table_fetcher(spark):
    """crawl_rounds is fetcher-agnostic: the HTTP kernel over a canned
    transport reproduces exactly the frontier/wave schedule the static
    page table produces for the same site."""
    from noaa_oracle_spark.pipeline.web import (
        crawl_rounds,
        http_fetcher,
        table_fetcher,
    )
    from tests.test_daemon import VirtualTime

    site = {
        "http://s.test/start": '<a href="/p1">1</a><a href="/p2">2</a>',
        "http://s.test/p1": '<a href="/p3">3</a>',
        "http://s.test/p2": '<a href="/start">s</a>',
        "http://s.test/p3": "",
    }

    def transport(url, timeout, headers):
        if url not in site:
            raise OSError("404")
        return site[url]

    vt = VirtualTime()
    seeds = spark.createDataFrame([("http://s.test/start",)], "url string")
    out_http = crawl_rounds(
        seeds,
        http_fetcher(
            transport=transport, clock=vt.clock, sleep=vt.sleep,
            npartitions=2, max_retries=0,
        ),
        rounds=3,
    ).collect()
    pages = spark.createDataFrame(
        list(site.items()), "url string, html string"
    )
    out_tab = crawl_rounds(seeds, table_fetcher(pages), rounds=3).collect()
    key = lambda r: (r.url, r["round"], r.wave, r.not_before_s)  # noqa: E731
    assert sorted(map(key, out_http)) == sorted(map(key, out_tab))


def test_http_fetcher_retries_respect_crawl_delay(spark):
    """Every ATTEMPT is a request to the host, so retries space by the
    crawl delay, not just the (possibly shorter) backoff: two URLs on
    one 2.0s-delay host, one needing 3 attempts, means 4 requests —
    the last must start at >= 3 delay windows after the first."""
    from noaa_oracle_spark.pipeline.web import http_fetcher
    from tests.test_daemon import VirtualTime

    vt = VirtualTime()
    attempts: dict = {}

    def transport(url, timeout, headers):
        attempts[url] = attempts.get(url, 0) + 1
        if url.endswith("/flaky") and attempts[url] < 3:
            raise OSError("transient")
        return "<html>ok</html>"

    frontier = spark.createDataFrame(
        [("http://h0.test/a",), ("http://h0.test/flaky",)], "url string"
    )
    delays = spark.createDataFrame(
        [("h0.test", 2.0)], "host string, delay_s double"
    )
    rows = http_fetcher(
        delays=delays,
        transport=transport,
        clock=vt.clock,
        sleep=vt.sleep,
        npartitions=1,
        backoff_base=0.25,  # deliberately << the crawl delay
    )(frontier).collect()
    assert len(rows) == 2
    ts = sorted(r.fetched_at_s for r in rows)
    assert ts[0] == 0.0
    # 4 requests total, each >= 2.0s after the previous on this host
    assert ts[1] >= 3 * 2.0 - 1e-9, ts


def test_bloom_seen_filter_is_exact(spark):
    """bloom_seen_filter == plain left-anti join, at BOTH extremes:
    a roomy bitmap (most candidates provably fresh, bypassing the
    join) and a deliberately saturated 64-bit one (everything 'maybe',
    the exact join doing all the work — false positives never leak)."""
    from noaa_oracle_spark.pipeline.web import bloom_seen_filter

    cand = spark.createDataFrame(
        [(f"http://x.test/{i}",) for i in range(200)], "url string"
    )
    seen = spark.createDataFrame(
        [(f"http://x.test/{i}",) for i in range(0, 200, 3)], "url string"
    )
    want = sorted(
        r.url for r in cand.join(seen, "url", "left_anti").collect()
    )
    for m_bits in (1 << 16, 64):
        got = sorted(
            r.url
            for r in bloom_seen_filter(
                cand, seen, m_bits=m_bits
            ).collect()
        )
        assert got == want, m_bits


def test_crawl_rounds_bloom_equals_exact(spark):
    """crawl_rounds with the seen-set bloom relief valve returns exactly
    the exact-anti-join frontier (rows, rounds, waves)."""
    from noaa_oracle_spark.pipeline.web import crawl_rounds, table_fetcher

    pages = spark.createDataFrame(
        [
            ("https://a.test/start", '<a href="/p1">1</a><a href="/p2">2</a>'),
            ("https://a.test/p1", '<a href="/p3">3</a><a href="/start">c</a>'),
            ("https://a.test/p2", '<a href="/p3">3</a>'),
            ("https://a.test/p3", '<a href="/p4">4</a>'),
        ],
        "url string, html string",
    )
    seeds = spark.createDataFrame([("https://a.test/start",)], "url string")
    key = lambda r: (r.url, r["round"], r.wave, r.not_before_s)  # noqa: E731
    exact = sorted(
        map(key, crawl_rounds(seeds, table_fetcher(pages), rounds=3).collect())
    )
    bloomed = sorted(
        map(
            key,
            crawl_rounds(
                seeds, table_fetcher(pages), rounds=3, seen_bloom_bits=1 << 16
            ).collect(),
        )
    )
    assert bloomed == exact
