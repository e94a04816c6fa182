"""WARC container reader/writer (pipeline/warc.py): round trips for
plain and member-gzip shards, HTTP payload splitting, truncation
salvage, and the WARC → HTML → text composition."""

from __future__ import annotations

import gzip
import os

import pytest

from noaa_oracle_spark.pipeline.warc import (
    build_warc,
    parse_warc,
    warc_records,
)

PAGE = (
    "<html><head><title>T</title></head><body>"
    "<p>A content paragraph long enough to clear the extraction "
    "threshold with plenty of room to spare.</p></body></html>"
).encode()


def _records(n=3):
    return [
        {
            "type": "response",
            "uri": f"https://example.com/page/{i}",
            "date": f"2026-01-0{i + 1}T00:00:00Z",
            "http_status": 200,
            "http_content_type": "text/html; charset=utf-8",
            "payload": PAGE.replace(b"content", b"content %d" % i),
        }
        for i in range(n)
    ]


def test_roundtrip_plain_and_member_gzip():
    recs = _records()
    for member_gzip in (False, True):
        blob = build_warc(recs, member_gzip=member_gzip)
        out = parse_warc(blob)
        assert len(out) == 3
        for i, rec in enumerate(out):
            h = rec["headers"]
            assert h["warc-type"] == "response"
            assert h["warc-target-uri"] == f"https://example.com/page/{i}"
            assert rec["payload"].startswith(b"HTTP/1.1 200")
            assert b"content %d" % i in rec["payload"]


def test_member_gzip_is_deterministic_and_memberwise():
    recs = _records()
    blob = build_warc(recs)
    assert blob == build_warc(recs)  # mtime=0, derived ids
    # genuinely member-wise: a single gzip.decompress only sees the
    # stream CONCATENATED; counting members via re-parse proves >1
    assert blob[:2] == b"\x1f\x8b"
    assert blob.count(b"\x1f\x8b\x08") >= 3
    # whole-file decompress (concatenating members) parses identically
    assert len(parse_warc(gzip.decompress(blob))) == 3


def test_truncation_salvages_prefix():
    recs = _records()
    plain = build_warc(recs, member_gzip=False)
    # chop mid-way through the last record's payload
    cut = plain[: len(plain) - 40]
    assert len(parse_warc(cut)) == 2
    gz = build_warc(recs)
    assert len(parse_warc(gz[: len(gz) - 20])) == 2
    assert parse_warc(b"") == []
    assert parse_warc(b"not warc at all") == []


def test_warc_records_spark_surface(spark, tmp_path):
    d = str(tmp_path / "warc")
    os.makedirs(d)
    with open(os.path.join(d, "shard-0.warc.gz"), "wb") as f:
        f.write(build_warc(_records(3)))
    with open(os.path.join(d, "shard-1.warc.gz"), "wb") as f:
        f.write(
            build_warc(
                [
                    {
                        "type": "warcinfo",
                        "uri": "",
                        "content_type": "application/warc-fields",
                        "payload": b"software: noaa-oracle-spark",
                    }
                ]
            )
        )
    df = warc_records(spark, d)
    rows = sorted(
        map(
            lambda r: (os.path.basename(r.shard), r.record_idx, r.warc_type,
                       r.http_status, r.content_type),
            df.collect(),
        )
    )
    assert len(rows) == 4
    assert rows[0] == (
        "shard-0.warc.gz", 0, "response", 200, "text/html; charset=utf-8"
    )
    assert rows[3] == (
        "shard-1.warc.gz", 0, "warcinfo", None, "application/warc-fields"
    )
    # manifest-only scan drops payloads but keeps sizes
    manifest = warc_records(spark, d, with_payload=False).collect()
    assert all(r.payload is None for r in manifest)
    assert all(r.n_payload_bytes > 0 for r in manifest)


def test_warc_to_text_composition(spark, tmp_path):
    """The crawl front door end-to-end: WARC shard → records → HTML
    body → extracted main text."""
    from noaa_oracle_spark.pipeline.html import html_to_text
    from pyspark.sql import functions as F

    d = str(tmp_path / "warc2")
    os.makedirs(d)
    with open(os.path.join(d, "shard-0.warc.gz"), "wb") as f:
        f.write(build_warc(_records(2)))
    recs = warc_records(spark, d).filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    )
    docs = recs.select(
        F.col("record_idx").alias("doc_id"),
        F.col("payload").cast("string").alias("html"),
    )
    texts = {r.doc_id: r.text for r in html_to_text(docs).collect()}
    assert "content 0" in texts[0] and "content 1" in texts[1]


# ---------------------------------------------------------------------------
# property fuzz: the parsers must never raise and round trips must hold
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=300), min_size=1, max_size=5
    ),
    member_gzip=st.booleans(),
)
def test_warc_roundtrip_arbitrary_payloads(payloads, member_gzip):
    """Payloads containing CRLF runs, 'WARC/' strings, gzip magic —
    anything — must round trip exactly (Content-Length framing, not
    delimiters, carries the record)."""
    recs = [
        {
            "type": "resource",
            "uri": f"https://x.test/{i}",
            "content_type": "application/octet-stream",
            "payload": p,
        }
        for i, p in enumerate(payloads)
    ]
    out = parse_warc(build_warc(recs, member_gzip=member_gzip))
    assert [r["payload"] for r in out] == payloads


@settings(max_examples=80, deadline=None)
@given(junk=st.binary(min_size=0, max_size=400))
def test_parse_warc_never_raises_on_junk(junk):
    assert isinstance(parse_warc(junk), list)


@settings(max_examples=80, deadline=None)
@given(junk=st.text(max_size=400))
def test_html_extract_never_raises_on_junk(junk):
    from noaa_oracle_spark.pipeline.html import extract_main_text

    out = extract_main_text(junk, min_block_chars=5)
    assert isinstance(out["text"], str)


def test_http_split_degrades_on_folded_headers_and_junk_status(spark, tmp_path):
    """Round-7 review: folded HTTP header lines (RFC-7230 legacy) and
    out-of-range status codes must degrade per record, never fail the
    task."""
    folded = (
        b"HTTP/1.1 200 OK\r\nSet-Cookie: a\r\n folded-continuation\r\n"
        b"Content-Type: text/html\r\n\r\nreal body"
    )
    junk_status = b"HTTP/1.1 123456789012 OK\r\nX: y\r\n\r\nbody"
    recs = [
        {"type": "response", "uri": "https://a/1",
         "content_type": "application/http;msgtype=response",
         "payload": folded},
        {"type": "response", "uri": "https://a/2",
         "content_type": "application/http;msgtype=response",
         "payload": junk_status},
    ]
    d = str(tmp_path / "warc3")
    os.makedirs(d)
    with open(os.path.join(d, "shard-0.warc.gz"), "wb") as f:
        f.write(build_warc(recs))
    rows = {r.target_uri: r for r in warc_records(spark, d).collect()}
    assert len(rows) == 2
    # folded header: the lenient parser still splits the message
    assert rows["https://a/1"].http_status == 200
    assert rows["https://a/1"].content_type == "text/html"
    assert bytes(rows["https://a/1"].payload) == b"real body"
    # junk status: record degrades to unsplit, row survives
    assert rows["https://a/2"].http_status is None
    assert bytes(rows["https://a/2"].payload) == junk_status


def test_stream_warc_records_incremental(spark, tmp_path):
    """Streaming twin: shards arriving across microbatches manifest
    incrementally and the union equals the batch walk; the composed
    downstream stage (main-text extraction) runs on the stream."""
    from noaa_oracle_spark.pipeline.warc import stream_warc_records

    d = str(tmp_path / "warc_s")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc.gz"), "wb") as f:
        f.write(build_warc(_records(2)))

    q = (
        stream_warc_records(spark, d, max_files_per_trigger=1)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("warc_stream")
        .option("checkpointLocation", str(tmp_path / "warc_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) c FROM warc_stream").collect()[0].c
        with open(os.path.join(d, "b.warc.gz"), "wb") as f:
            f.write(build_warc(_records(3)))
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT shard, record_idx, target_uri, http_status "
            "FROM warc_stream"
        ).collect()
    finally:
        q.stop()
    assert n1 == 2 and len(rows) == 5
    batch = warc_records(spark, d, with_payload=False).select(
        "shard", "record_idx", "target_uri", "http_status"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch))


def test_http_split_ignores_folded_continuation_with_colon():
    """Round-7 review wave 3: an obs-fold continuation line containing a
    colon must not be misread as a fresh Content-Type header."""
    from noaa_oracle_spark.pipeline.warc import _split_http_payload

    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b'Link: <u>; title="a\r\n content-type: text/plain"\r\n\r\nbody'
    )
    status, ctype, body = _split_http_payload(payload)
    assert (status, ctype, body) == (200, "text/html", b"body")


def test_stream_default_glob_matches_batch_on_mixed_shards(spark, tmp_path):
    """The streaming twin's default glob must read everything the batch
    walk reads — including PLAIN .warc shards."""
    from noaa_oracle_spark.pipeline.warc import stream_warc_records

    d = str(tmp_path / "warc_mixed")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc.gz"), "wb") as f:
        f.write(build_warc(_records(2)))
    with open(os.path.join(d, "b.warc"), "wb") as f:
        f.write(build_warc(_records(3), member_gzip=False))
    q = (
        stream_warc_records(spark, d)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("warc_mixed_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) c FROM warc_mixed_stream").collect()[0].c
    finally:
        q.stop()
    n_batch = warc_records(spark, d, with_payload=False).count()
    assert n == n_batch == 5


def test_cdx_index_then_fetch_roundtrip(spark, tmp_path):
    """The Common Crawl consumption pattern: the manifest's
    (shard, record_offset, record_length) columns ARE the CDX index —
    fetching each extent with one range read reproduces every record,
    for both member-gzip and plain shards."""
    from noaa_oracle_spark.pipeline.warc import fetch_warc_record

    d = str(tmp_path / "warc_cdx")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc.gz"), "wb") as f:
        f.write(build_warc(_records(3)))
    with open(os.path.join(d, "b.warc"), "wb") as f:
        f.write(build_warc(_records(2), member_gzip=False))
    idx = warc_records(spark, d, with_payload=False).collect()
    assert len(idx) == 5
    full = {
        (r.shard, r.record_idx): r
        for r in warc_records(spark, d, with_payload=True).collect()
    }
    for row in idx:
        rec = fetch_warc_record(
            row.shard.replace("file:", ""), row.record_offset,
            row.record_length,
        )
        want = full[(row.shard, row.record_idx)]
        assert rec["headers"]["warc-target-uri"] == want.target_uri
        # fetched payload is the WHOLE record payload (HTTP head + body)
        assert rec["payload"].endswith(bytes(want.payload))
    # plain-shard extents are record-exact: offsets strictly increase
    # and lengths sum to the file size
    plain = sorted(
        (r.record_offset, r.record_length)
        for r in idx
        if r.shard.endswith("b.warc")
    )
    size = os.path.getsize(os.path.join(d, "b.warc"))
    assert plain[0][0] == 0 and sum(ln for _, ln in plain) == size

    with pytest.raises(Exception):
        fetch_warc_record(os.path.join(d, "b.warc"), size - 3, 3)


def test_crawl_to_documents_end_to_end(spark, tmp_path):
    """The one-call crawl front door: WARC shards in, documents-shaped
    rows out (stable doc ids from CDX coordinates, canonical urls,
    registrable-domain source, extracted main text)."""
    from noaa_oracle_spark.pipeline.warc import crawl_to_documents

    d = str(tmp_path / "warc_docs")
    os.makedirs(d)
    page = (
        "<html><head><title>t</title></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<p>The reproducible article body text, long enough to clear "
        "the extraction threshold comfortably for this test page.</p>"
        "</body></html>"
    ).encode()
    recs = [
        {"type": "response",
         "uri": f"https://News.Example.co.uk/p/{i}?utm_source=x&b=2",
         "http_status": 200, "http_content_type": "text/html",
         "payload": page}
        for i in range(3)
    ] + [
        # non-HTML and non-200 records must be filtered out
        {"type": "response", "uri": "https://x.test/img",
         "http_status": 200, "http_content_type": "image/png",
         "payload": b"\x89PNG"},
        {"type": "response", "uri": "https://x.test/404",
         "http_status": 404, "http_content_type": "text/html",
         "payload": b"<html><body><p>gone gone gone gone gone</p></body></html>"},
    ]
    with open(os.path.join(d, "a.warc.gz"), "wb") as f:
        f.write(build_warc(recs))
    out = crawl_to_documents(spark, d).collect()
    assert len(out) == 3
    for r in out:
        assert r.url.startswith("https://news.example.co.uk/p/")
        assert "utm_source" not in r.url and "b=2" in r.url
        assert r.source == "example.co.uk"
        assert "reproducible article body" in r.text
        assert "Home" not in r.text
    # doc ids are stable across re-walks and distinct per record
    again = {r.doc_id for r in crawl_to_documents(spark, d).collect()}
    assert again == {r.doc_id for r in out} and len(again) == 3


def test_crawl_doc_ids_unique_in_multi_record_member(spark, tmp_path):
    """A single gzip member holding several records gives every record
    the SAME member extent (record_offset); doc_id must still be unique
    because record_idx is part of the hash key (round-8 advice)."""
    from noaa_oracle_spark.pipeline.warc import crawl_to_documents

    # one gzip member containing all three records
    blob = gzip.compress(build_warc(_records(3), member_gzip=False), mtime=0)
    p = tmp_path / "multi.warc.gz"
    p.write_bytes(blob)
    docs = crawl_to_documents(spark, str(p)).collect()
    assert len(docs) == 3
    assert len({r.doc_id for r in docs}) == 3
    # and the records really did share one member extent; member_idx
    # disambiguates within it and IS fetch_warc_record's idx selector
    from noaa_oracle_spark.pipeline.warc import fetch_warc_record

    recs = warc_records(spark, str(p)).orderBy("record_idx").collect()
    assert len({r.record_offset for r in recs}) == 1
    assert sorted(r.record_idx for r in recs) == [0, 1, 2]
    assert [r.member_idx for r in recs] == [0, 1, 2]
    for r in recs:
        got = fetch_warc_record(
            str(p), r.record_offset, r.record_length, idx=r.member_idx
        )
        assert got["headers"]["warc-target-uri"] == r.target_uri


def test_crawl_to_documents_with_robots(spark, tmp_path):
    """The compliance pass composes into the crawl front door: pages a
    host's robots.txt disallows never become documents, hosts without a
    robots row pass, and the plan keeps the single binaryFile scan with
    a broadcast join (documents cross no exchange)."""
    from noaa_oracle_spark.pipeline.warc import crawl_to_documents

    recs = []
    for i in range(4):
        host = "a.test" if i % 2 == 0 else "b.test"
        recs.append(
            {
                "type": "response",
                "uri": f"https://{host}/{'blocked' if i < 2 else 'open'}/{i}",
                "date": f"2026-03-0{i + 1}T00:00:00Z",
                "http_status": 200,
                "http_content_type": "text/html",
                "payload": PAGE.replace(b"content", b"content %d" % i),
            }
        )
    p = tmp_path / "robots.warc.gz"
    p.write_bytes(build_warc(recs))
    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /blocked/")],
        "host string, robots_txt string",
    )
    out = crawl_to_documents(spark, str(p), robots=robots)
    urls = sorted(r.url for r in out.collect())
    # i=0 (a.test /blocked) dropped; i=1 (b.test /blocked, no robots row)
    # kept; i=2 (a.test /open) and i=3 (b.test /open) kept
    assert urls == [
        "https://a.test/open/2",
        "https://b.test/blocked/1",
        "https://b.test/open/3",
    ]
    # AdaptiveSparkPlan.toString repeats subtrees under "== Initial
    # Plan ==" — count scans only in the final section.  The default
    # robots_plan='auto' lands on the inline tier here: the verdict
    # evaluates IN the scan stage, so the crawl plan has exactly one
    # binaryFile scan and no join of any kind.
    s = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert s.count("BatchScan") + s.count("FileScan") == 1
    assert "Join" not in s
    assert "Exchange" not in s


def test_crawl_to_media_feeds_phash(spark, tmp_path):
    """crawl_to_media routes image responses into the media shape the
    pHash tier consumes: two near-identical PPMs in the crawl come out
    as a verified near-dup pair, HTML records never enter the frame,
    and the plan keeps one scan with no exchanges before the select."""
    import numpy as np

    from noaa_oracle_spark.pipeline.media_codecs import encode_ppm
    from noaa_oracle_spark.pipeline.multimodal import phash_near_dupes
    from noaa_oracle_spark.pipeline.warc import crawl_to_media

    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = [0, 0, 0]
    other = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    recs = [
        {
            "type": "response",
            "uri": "https://img.test/a.ppm",
            "http_status": 200,
            "http_content_type": "image/x-portable-pixmap",
            "payload": encode_ppm(base),
        },
        {
            "type": "response",
            "uri": "https://img.test/b.ppm",
            "http_status": 200,
            "http_content_type": "image/x-portable-pixmap; charset=binary",
            "payload": encode_ppm(near),
        },
        {
            "type": "response",
            "uri": "https://img.test/c.ppm",
            "http_status": 200,
            "http_content_type": "image/x-portable-pixmap",
            "payload": encode_ppm(other),
        },
        {
            "type": "response",
            "uri": "https://w.test/page",
            "http_status": 200,
            "http_content_type": "text/html",
            "payload": PAGE,
        },
    ]
    p = tmp_path / "mixed.warc.gz"
    p.write_bytes(build_warc(recs))

    media = crawl_to_media(spark, str(p))
    rows = media.collect()
    assert len(rows) == 3
    assert {r.kind for r in rows} == {"image"}
    assert {r.mime_type for r in rows} == {"image/x-portable-pixmap"}
    assert len({r.media_id for r in rows}) == 3
    by_url = {r.url: r for r in rows}
    assert set(by_url) == {
        "https://img.test/a.ppm",
        "https://img.test/b.ppm",
        "https://img.test/c.ppm",
    }
    assert all(r.source == "img.test" for r in rows)

    pairs = phash_near_dupes(media, max_distance=6, bands=8).collect()
    want = {
        tuple(
            sorted(
                (
                    by_url["https://img.test/a.ppm"].media_id,
                    by_url["https://img.test/b.ppm"].media_id,
                )
            )
        )
    }
    assert {(r.id_a, r.id_b) for r in pairs} == want


def test_write_warc_shards_roundtrip_and_determinism(spark, tmp_path):
    """Distributed re-shard: documents out as member-gzip WARC shards,
    read back exactly; output BYTES identical across partitionings (the
    webdataset reproducibility rule); manifest matches the filesystem;
    empty input writes an empty manifest."""
    import json

    from noaa_oracle_spark.pipeline.warc import write_warc_shards

    docs = spark.createDataFrame(
        [
            (i, f"https://d.test/{i}", f"document body {i}" * (1 + i % 3))
            for i in range(25)
        ],
        "doc_id long, url string, text string",
    )
    d1 = str(tmp_path / "out1")
    m1 = write_warc_shards(docs, d1, records_per_shard=10).collect()
    assert sorted(r.shard_id for r in m1) == [0, 1, 2]
    assert sum(r.n_records for r in m1) == 25
    for r in m1:
        assert os.path.getsize(r.shard_path) == r.n_bytes
    with open(os.path.join(d1, "manifest.json")) as fh:
        assert len(json.load(fh)) == 3

    back = warc_records(spark, d1).collect()
    assert len(back) == 25
    got = {
        r.target_uri: bytes(r.payload).decode("utf-8") for r in back
    }
    want = {
        f"https://d.test/{i}": f"document body {i}" * 1
        if False
        else f"document body {i}" * (1 + i % 3)
        for i in range(25)
    }
    assert got == want
    assert all(r.warc_type == "resource" for r in back)
    assert all(r.content_type == "text/plain" for r in back)

    # byte-identical across partitionings
    d2 = str(tmp_path / "out2")
    write_warc_shards(docs.repartition(13), d2, records_per_shard=10)
    for s in range(3):
        f1 = os.path.join(d1, f"shard-{s:05d}.warc.gz")
        f2 = os.path.join(d2, f"shard-{s:05d}.warc.gz")
        with open(f1, "rb") as a, open(f2, "rb") as b:
            assert a.read() == b.read(), s

    d3 = str(tmp_path / "empty")
    empty = write_warc_shards(docs.filter("doc_id < 0"), d3)
    assert empty.count() == 0
    with open(os.path.join(d3, "manifest.json")) as fh:
        assert json.load(fh) == []


def test_fetch_warc_records_error_in_place_keeps_single_pass(tmp_path):
    """r12 review: one bad extent among many must not abort (default
    raise) or de-batch the shard — error_in_place=True returns the
    failure in place while every good extent still comes from the one
    sequential pass, element-wise equal to singles."""
    from noaa_oracle_spark.pipeline.warc import (
        WarcError,
        fetch_warc_record,
        fetch_warc_records,
    )

    shard = str(tmp_path / "s.warc.gz")
    blob = build_warc(_records(3))
    with open(shard, "wb") as f:
        f.write(blob)
    # recover the 3 member extents from the gzip member boundaries
    import zlib

    offsets, lens, pos = [], [], 0
    data = blob
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        d.decompress(data[pos:])
        consumed = len(data[pos:]) - len(d.unused_data)
        offsets.append(pos)
        lens.append(consumed)
        pos += consumed
    assert len(offsets) == 3

    good = [(offsets[i], lens[i], 0) for i in range(3)]
    bad_parse = (10**9, 64, 0)        # reads empty past EOF
    bad_idx = (offsets[1], lens[1], 9)  # member has 1 record
    extents = [good[0], bad_parse, good[1], bad_idx, good[2], good[0]]

    # default contract still raises
    with pytest.raises(WarcError):
        fetch_warc_records(shard, extents)

    out = fetch_warc_records(shard, extents, error_in_place=True)
    assert len(out) == len(extents)
    for pos_i, (o, ln, ix) in ((0, good[0]), (2, good[1]), (4, good[2]),
                               (5, good[0])):
        want = fetch_warc_record(shard, o, ln, idx=ix)
        assert out[pos_i] == want, pos_i
    assert "error" in out[1] and "error" in out[3]
    assert "no record 9" in out[3]["error"]
