"""HTML main-text extraction (pipeline/html.py): block parsing, the
jusText-style content heuristic, and the Spark mapInPandas surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.html import (
    extract_main_text,
    html_to_text,
    parse_blocks,
)

PAGE = """<!DOCTYPE html>
<html><head><title>Site Title</title>
<style>body { color: red }</style>
<script>var tracking = "evil";</script></head>
<body>
<nav><a href="/">Home</a> | <a href="/about">About</a> | <a href="/contact">Contact us</a></nav>
<h1>The Article &amp; Its Heading</h1>
<p>This is the first real paragraph of the article, long enough to pass
the minimum block length requirement easily.</p>
<p>Second paragraph with a single <a href="x">inline link</a> inside a
much longer run of genuine prose, so link density stays low.</p>
<p>short.</p>
<div><a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a></div>
<footer>Copyright 2026 Example Corp. All rights reserved. Terms of
service and privacy policy links live here usually.</footer>
</body></html>"""


def test_parse_blocks_skips_and_unescapes():
    blocks = parse_blocks(PAGE)
    texts = [b["text"] for b in blocks]
    joined = " ".join(texts)
    assert "tracking" not in joined and "color: red" not in joined
    assert "The Article & Its Heading" in texts  # entity unescaped
    # the nav block is fully link-covered
    nav = next(b for b in blocks if b["text"].startswith("Home"))
    assert nav["link_chars"] >= len("Home") + len("About") + len("Contact us")


def test_extract_main_text_keeps_content_drops_boilerplate():
    out = extract_main_text(PAGE)
    assert "first real paragraph" in out["text"]
    assert "genuine prose" in out["text"]
    # the heading is kept because content follows it
    assert out["text"].startswith("The Article & Its Heading")
    # nav, link farm, and the short block are dropped
    assert "Home" not in out["text"]
    assert "short." not in out["text"]
    # the footer is long and link-FREE, so the link-density heuristic
    # keeps it — pinned as honest behavior (a tag-based footer drop is
    # caller policy, not part of the density rule)
    assert "Copyright" in out["text"]
    assert out["n_content_blocks"] >= 3
    assert 0.0 < out["link_density"] < 0.5


def test_malformed_and_empty_html_never_raise():
    assert extract_main_text("")["text"] == ""
    assert extract_main_text(None)["n_blocks"] == 0
    weird = "<p>unclosed <div><<<>>&nosuch; <b>tail"
    out = extract_main_text(weird, min_block_chars=3)
    assert out["n_blocks"] >= 1


def test_heading_without_following_content_is_dropped():
    html = "<h2>Stranded Heading</h2><div><a href='/'>x</a></div>"
    assert extract_main_text(html)["text"] == ""


def test_html_to_text_spark_surface(spark):
    docs = spark.createDataFrame(
        [(1, PAGE), (2, "<p>tiny</p>"), (3, None)],
        "doc_id long, html string",
    )
    rows = {r.doc_id: r for r in html_to_text(docs).collect()}
    assert "first real paragraph" in rows[1].text
    assert rows[2].text == "" and rows[2].n_blocks == 1
    assert rows[3].text == "" and rows[3].n_blocks == 0
    assert rows[1].link_density > 0


def test_omitted_head_end_tag_recovers():
    """HTML5 allows omitting </head> (round-7 review): the body must
    still be extracted."""
    html = (
        "<html><head><title>T</title>"
        "<body><p>A perfectly normal paragraph of article text that is "
        "long enough to be treated as content.</p>"
    )
    out = extract_main_text(html)
    assert "perfectly normal paragraph" in out["text"]
    # head content stays suppressed
    blocks = parse_blocks(html)
    assert all(b["text"] != "T" for b in blocks)
    # implied </head> via a block tag, without <body>
    html2 = "<head><title>T</title><p>%s</p>" % ("prose " * 20)
    assert "prose" in extract_main_text(html2)["text"]


def test_unclosed_anchor_does_not_erase_following_blocks():
    html = (
        "<p><a href='/x'>nav link without close</p>"
        "<p>Real article prose, long enough to clear the block length "
        "threshold and completely free of anchors.</p>"
    )
    out = extract_main_text(html)
    assert "Real article prose" in out["text"]


def test_body_start_recovers_unclosed_skip_subtree():
    html = (
        "<svg><circle r='1'/>"
        "<body><p>Content after a malformed unclosed svg element, long "
        "enough to pass the minimum length bar.</p>"
    )
    assert "Content after" in extract_main_text(html)["text"]


def test_html_to_text_keep_cols_passthrough(spark):
    """keep_cols ride through the kernel aligned to their rows (the
    single-pass provenance contract crawl_to_documents relies on);
    collisions with output names are rejected."""
    docs = spark.createDataFrame(
        [(1, "<p>%s</p>" % ("words " * 20), "u1", "s1"),
         (2, None, "u2", "s2")],
        "doc_id long, html string, url string, source string",
    )
    rows = {
        r.doc_id: r
        for r in html_to_text(docs, keep_cols=["url", "source"]).collect()
    }
    assert (rows[1].url, rows[1].source) == ("u1", "s1")
    assert (rows[2].url, rows[2].source) == ("u2", "s2")
    assert "words" in rows[1].text and rows[2].text == ""
    import pytest

    with pytest.raises(ValueError, match="collide"):
        html_to_text(docs, keep_cols=["text"])


def test_extract_links_rules():
    from noaa_oracle_spark.pipeline.html import extract_links

    html = (
        '<a href="/rel">r</a>'
        '<a href="https://abs.test/p?b=2">a</a>'
        '<a href="#frag">f</a>'
        '<a href="mailto:x@y">m</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a rel="noopener NOFOLLOW" href="/no">n</a>'
        '<script><a href="/in-script">s</a></script>'
        '<svg><a href="/in-svg">v</a></svg>'
        '<a href="/rel">dup</a>'
        "<a href='broken.html'>unclosed"
    )
    base = "https://h.test/dir/page.html"
    links = extract_links(html, base_url=base)
    assert links == [
        "https://h.test/rel",
        "https://abs.test/p?b=2",
        "https://h.test/dir/broken.html",
    ]
    # nofollow edges come back for link-graph mode
    assert "https://h.test/no" in extract_links(
        html, base_url=base, follow_only=False
    )
    # no base: relative links drop, absolute survive
    assert extract_links(html) == ["https://abs.test/p?b=2"]
    # junk never raises
    assert extract_links(None) == []
    assert extract_links("<<<>>>&&& <a href") == []


def test_html_links_frontier_composition(spark):
    """The crawl loop closes in-engine: crawled pages → out-link edges
    → canonicalize → drop already-seen → robots-filter = the next
    frontier, every stage an existing operator."""
    from noaa_oracle_spark.pipeline.html import html_links
    from noaa_oracle_spark.pipeline.web import (
        canonical_url,
        filter_robots_disallowed,
    )

    pages = spark.createDataFrame(
        [
            (
                1,
                "https://a.test/start",
                '<a href="/next1">x</a><a href="https://b.test/private/p">y</a>'
                '<a href="/seen?utm_source=t">z</a>',
            ),
            (2, "https://b.test/other", '<a href="/next2#frag">w</a>'),
            (3, "https://c.test/bad", None),
        ],
        "doc_id long, url string, html string",
    )
    edges = html_links(pages)
    got = {(r.doc_id, r.link) for r in edges.collect()}
    assert got == {
        (1, "https://a.test/next1"),
        (1, "https://b.test/private/p"),
        (1, "https://a.test/seen?utm_source=t"),
        (2, "https://b.test/next2"),
    }
    seen = spark.createDataFrame(
        [("https://a.test/seen",)], "url string"
    )
    robots = spark.createDataFrame(
        [("b.test", "User-agent: *\nDisallow: /private/")],
        "host string, robots_txt string",
    )
    frontier = (
        edges.select(canonical_url(F.col("link")).alias("url"))
        .where(F.col("url").isNotNull())
        .distinct()
        .join(seen.select(canonical_url(F.col("url")).alias("url")),
              "url", "left_anti")
    )
    frontier = filter_robots_disallowed(frontier, robots, plan="inline")
    urls = sorted(r.url for r in frontier.collect())
    # /seen removed by the seen anti-join (tracking param stripped by
    # canonicalization first), b.test/private dropped by robots
    assert urls == [
        "https://a.test/next1",
        "https://b.test/next2",
    ]


def test_html_links_string_keyed_frame(spark):
    """html_links must take the doc-id output type from the input frame
    (string-keyed crawl frames are common); a hardcoded LongType failed
    at Arrow conversion inside the kernel instead of at plan time."""
    from noaa_oracle_spark.pipeline.html import html_links

    docs = spark.createDataFrame(
        [("d-1", '<a href="https://x.test/a">a</a>', "https://x.test/")],
        "doc_id string, html string, url string",
    )
    out = html_links(docs)
    assert dict(out.dtypes)["doc_id"] == "string"
    rows = out.collect()
    assert [(r.doc_id, r.link) for r in rows] == [("d-1", "https://x.test/a")]
