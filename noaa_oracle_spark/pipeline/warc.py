"""WARC (Web ARChive, ISO 28500) reader/writer on stdlib bytes — the
container format web crawls ship in (Common Crawl's distribution
format), which makes it the entry point of a crawl-to-corpus pipeline:
WARC shard → `warc_records` → `html.html_to_text` → quality/dedup/mix.

Format facts implemented (WARC/1.0 and 1.1):
  - a record = version line, CRLF header block (Name: value, folding
    not emitted by crawlers and not supported here), CRLF CRLF, exactly
    Content-Length payload bytes, CRLF CRLF record terminator;
  - shards are either plain concatenated records or MEMBER-WISE gzip
    (one gzip member per record, concatenated — the Common Crawl
    layout); the reader walks members one-by-one with zlib's
    unused_data NOT because multi-member needs it (Python's
    gzip.decompress concatenates members fine) but for the degrade
    contract: a corrupt or truncated later member salvages every
    earlier one, where one whole-file decompress throws the shard away;
  - `response` records carry an HTTP message as payload: status line +
    headers + body, split here so callers get the body and the
    Content-Type without re-parsing.

Spark surface: `warc_records(spark, path_glob)` — binaryFile source
(one task per shard, the webdataset discipline: payload bytes never
cross an exchange) → mapInPandas walk → one row per record with
(shard, record offset/index, WARC type, target URI, date, HTTP status,
content type, payload).  A corrupt shard degrades to the records parsed
before the corruption (the truncation convention every container reader
here follows); a corrupt single record ends that shard's walk, never
the task.

The writer exists for fixtures and for re-sharding extracted subsets
(`build_warc` — deterministic bytes, member-gzip optional), the
build_mp4/build_mp3 discipline.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


class WarcError(ValueError):
    pass


def _parse_headers(block: bytes) -> "dict[str, str]":
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise WarcError(f"malformed header line {line[:60]!r}")
        headers[name.decode("latin-1").strip().lower()] = value.decode(
            "latin-1"
        ).strip()
    return headers


def _parse_record(data: bytes, pos: int) -> "tuple[dict, int] | None":
    """One WARC record at `pos` → (record dict, next pos); None at a
    clean end of data.  Raises WarcError on malformed structure."""
    if pos >= len(data):
        return None
    end_ver = data.find(_CRLF, pos)
    if end_ver < 0:
        raise WarcError("truncated version line")
    version = data[pos:end_ver]
    if not version.startswith(b"WARC/"):
        raise WarcError(f"bad version line {version[:20]!r}")
    end_hdr = data.find(_CRLF + _CRLF, end_ver)
    if end_hdr < 0:
        raise WarcError("truncated header block")
    headers = _parse_headers(data[end_ver + 2 : end_hdr])
    try:
        length = int(headers["content-length"])
    except (KeyError, ValueError) as exc:
        raise WarcError("missing/bad Content-Length") from exc
    body_start = end_hdr + 4
    body_end = body_start + length
    if body_end + 4 > len(data):
        raise WarcError("truncated payload")
    if data[body_end : body_end + 4] != _CRLF + _CRLF:
        raise WarcError("missing record terminator")
    return (
        {
            "version": version.decode("latin-1"),
            "headers": headers,
            "payload": data[body_start:body_end],
        },
        body_end + 4,
    )


def _split_http_payload(payload: bytes) -> "tuple[int | None, str | None, bytes]":
    """(status, content_type, body) of an HTTP response payload; payload
    returned whole (status None) when it is not an HTTP message.

    Deliberately LENIENT where `_parse_headers` (WARC's own block) is
    strict: real crawls contain folded continuation lines, bare-colon
    junk, and garbage status lines — any of those must degrade to "not
    an HTTP message we can split" (or skip the one bad header line),
    never raise into the Spark task (round-7 review finding)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head_end = payload.find(_CRLF + _CRLF)
    if head_end < 0:
        return None, None, payload
    head = payload[:head_end]
    status_line, _, rest = head.partition(_CRLF)
    parts = status_line.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, payload
    if not 100 <= status <= 999:
        # garbage status (also: IntegerType schema domain)
        return None, None, payload
    ctype = None
    for line in rest.split(_CRLF):
        if line[:1] in (b" ", b"\t"):
            continue  # RFC-7230 obs-fold continuation: part of the
            # PREVIOUS header's value, never a fresh header line (a
            # fold containing a colon must not overwrite Content-Type)
        name, sep, value = line.partition(b":")
        if sep and name.strip().lower() == b"content-type":
            ctype = value.decode("latin-1").strip()
    return status, ctype, payload[head_end + 4 :]


def _gzip_members(data: bytes) -> "Iterator[tuple[bytes, int, int]]":
    """Decompress concatenated gzip members one by one (zlib's
    unused_data walk), yielding (member bytes, compressed offset,
    compressed length).  The walk — rather than one whole-file
    `gzip.decompress` — exists for the degrade contract (a corrupt or
    truncated LATER member still yields every earlier one, where a
    single decompress call would throw away the whole shard) AND for
    the offsets, which are what a CDX-style index records so one record
    can later be fetched with a single range read."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
            while not d.eof:
                tail = d.decompress(b"")
                if not tail:
                    break
                chunk += tail
            if not d.eof:
                return  # truncated final member: salvage prior ones
        except zlib.error:
            return  # corrupt member ends the walk (truncation rule)
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        yield chunk, pos, consumed
        pos += consumed


def _walk_warc(data: bytes) -> "list[tuple[dict, int, int]]":
    """All records of a shard with their byte extents IN SHARD
    COORDINATES — (record, offset, length) where the extent is the
    record's bytes for a plain shard and the containing gzip MEMBER's
    compressed bytes for a member-gzip shard (the Common Crawl layout
    is one record per member, so the member extent IS the record
    extent; a multi-record member assigns its extent to each of its
    records).  `fetch_warc_record(path, offset, length)` re-reads
    exactly these extents."""
    records: "list[tuple[dict, int, int]]" = []
    if data[:2] == b"\x1f\x8b":
        for member, m_off, m_len in _gzip_members(data):
            pos = 0
            while True:
                try:
                    out = _parse_record(member, pos)
                except WarcError:
                    return records
                if out is None:
                    break
                rec, pos = out
                records.append((rec, m_off, m_len))
        return records
    pos = 0
    while True:
        try:
            out = _parse_record(data, pos)
        except WarcError:
            return records
        if out is None:
            return records
        rec, new_pos = out
        records.append((rec, pos, new_pos - pos))
        pos = new_pos


def parse_warc(data: bytes) -> "list[dict]":
    """All records of a WARC shard (plain or member-gzip, sniffed by
    magic), each {'version', 'headers', 'payload'}; a structural error
    ends the parse at the records seen so far."""
    return [rec for rec, _, _ in _walk_warc(data)]


def fetch_warc_record(
    shard_path: str, offset: int, length: int, idx: int = 0
) -> dict:
    """Fetch ONE record by its indexed byte extent — the CDX
    consumption pattern (the index answers WHERE, then a single range
    read answers WHAT, without re-walking the shard).  Locally this is
    a seek+read; on an object store the same (offset, length) pair maps
    to one ranged GET.  The extent comes from `warc_records`'s
    offset/length columns.

    `idx` selects WITHIN the fetched extent and is exactly the
    manifest's `member_idx` column: 0 for the standard
    one-record-per-member layout; in a MULTI-record gzip member all
    records share the member's extent (the same reason doc_id hashes
    record_idx) and member_idx disambiguates.  Raises WarcError if the
    extent does not parse to enough records."""
    with open(shard_path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    recs = parse_warc(blob)
    if idx < 0 or len(recs) <= idx:
        raise WarcError(
            f"no record {idx} at {shard_path!r} "
            f"offset={offset} length={length} ({len(recs)} records parse)"
        )
    return recs[idx]


def fetch_warc_records(
    shard_path: str,
    extents: "list[tuple[int, int, int]]",
    error_in_place: bool = False,
) -> "list[dict]":
    """Fetch MANY records from one shard in a single pass — the batch
    twin of `fetch_warc_record` (r11 verdict ask #5): the shard opens
    ONCE, extents are read in offset order (sequential-friendly on
    local disk; on an object store the sorted extents coalesce into
    the fewest ranged GETs), duplicate (offset, length) extents parse
    once, and results return in the INPUT order.  Each extent is
    (offset, length, idx) with `fetch_warc_record`'s exact semantics —
    batch == N singles, asserted in tests.

    By default a bad extent raises WarcError (the single-fetch
    contract).  `error_in_place=True` returns `{"error": ...}` for the
    failing extents instead — one bad extent among thousands must not
    abort (or, worse, de-batch) the pass: the batch endpoint's whole
    point is one open per shard, so failures are isolated per extent,
    never retried one open at a time."""
    parsed: "dict[tuple[int, int], object]" = {}
    with open(shard_path, "rb") as f:
        for offset, length, _idx in sorted(set(
            (o, ln, 0) for o, ln, _ in extents
        )):
            f.seek(offset)
            blob = f.read(length)
            try:
                parsed[(offset, length)] = parse_warc(blob)
            except WarcError as exc:
                if not error_in_place:
                    raise
                parsed[(offset, length)] = exc
    out = []
    for offset, length, idx in extents:
        recs = parsed[(offset, length)]
        if isinstance(recs, WarcError):
            out.append({"error": str(recs)})
            continue
        if idx < 0 or len(recs) <= idx:
            err = WarcError(
                f"no record {idx} at {shard_path!r} "
                f"offset={offset} length={length} "
                f"({len(recs)} records parse)"
            )
            if error_in_place:
                out.append({"error": str(err)})
                continue
            raise err
        out.append(recs[idx])
    return out


def build_warc(
    records: "list[dict]",
    member_gzip: bool = True,
) -> bytes:
    """Serialize records ({'type', 'uri', 'date', 'payload', optional
    'http_status'/'http_content_type'}) into WARC/1.0 bytes —
    deterministic (no clocks, no uuids: record ids derive from the
    index), member-wise gzip with mtime=0 by default (the Common Crawl
    layout and the webdataset reproducibility rule)."""
    out = bytearray()
    for i, r in enumerate(records):
        payload = r["payload"]
        if "http_status" in r:
            head = (
                f"HTTP/1.1 {r['http_status']} OK\r\n"
                f"Content-Type: {r.get('http_content_type', 'text/html')}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1")
            payload = head + payload
        headers = [
            ("WARC-Type", r.get("type", "response")),
            ("WARC-Record-ID", f"<urn:noaa-oracle-spark:record:{i}>"),
            ("WARC-Date", r.get("date", "2026-01-01T00:00:00Z")),
            ("WARC-Target-URI", r.get("uri", "")),
            ("Content-Type", "application/http;msgtype=response"
             if "http_status" in r else r.get("content_type", "text/plain")),
            ("Content-Length", str(len(payload))),
        ]
        rec = bytearray(b"WARC/1.0\r\n")
        for k, v in headers:
            if v != "":
                rec += f"{k}: {v}\r\n".encode("latin-1")
        rec += _CRLF + payload + _CRLF + _CRLF
        if member_gzip:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(bytes(rec))
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)


WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("record_idx", T.LongType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("n_payload_bytes", T.LongType(), False),
        # byte extent of the record in SHARD coordinates (gzip: the
        # containing member's compressed extent) — together with
        # `shard` these columns ARE the CDX index: fetch_warc_record
        # re-reads one record with a single range read.  member_idx is
        # the record's index WITHIN its extent (0 for the standard
        # one-record-per-member layout; in a multi-record member every
        # record shares the member extent, and member_idx is exactly
        # fetch_warc_record's / GET /warc/record's `idx` selector)
        T.StructField("record_offset", T.LongType(), False),
        T.StructField("record_length", T.LongType(), False),
        T.StructField("member_idx", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _records_kernel(with_payload: bool):
    """mapInPandas kernel shared by the batch and streaming record
    walks (the webdataset twin discipline)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                recs = _walk_warc(bytes(blob) if blob is not None else b"")
                prev_off = None
                midx = 0
                for i, (rec, r_off, r_len) in enumerate(recs):
                    midx = midx + 1 if r_off == prev_off else 0
                    prev_off = r_off
                    h = rec["headers"]
                    try:
                        status, ctype, body = _split_http_payload(
                            rec["payload"]
                        )
                    except Exception:
                        # belt over the lenient parser's suspenders: a
                        # pathological payload degrades to unsplit,
                        # never to a task failure
                        status, ctype, body = None, None, rec["payload"]
                    if status is None:
                        ctype = h.get("content-type")
                    rows.append(
                        {
                            "shard": path,
                            "record_idx": i,
                            "warc_type": h.get("warc-type"),
                            "target_uri": h.get("warc-target-uri"),
                            "warc_date": h.get("warc-date"),
                            "http_status": status,
                            "content_type": ctype,
                            "n_payload_bytes": len(body),
                            "record_offset": r_off,
                            "record_length": r_len,
                            "member_idx": midx,
                            "payload": body if with_payload else None,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return kernel


def warc_records(
    spark: SparkSession,
    path_glob: str,
    with_payload: bool = True,
) -> DataFrame:
    """One row per WARC record across the shards matching `path_glob` —
    binaryFile source (one task per shard), mapInPandas walk, zero
    Exchange: payload bytes never shuffle (drop them at the source with
    `with_payload=False` when only the manifest is needed — the scan
    then moves headers, not the crawl).  `response` records get their
    HTTP status/Content-Type/body split out; other record types
    (request, metadata, warcinfo) pass their payload through whole."""
    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(_records_kernel(with_payload), WARC_RECORD_SCHEMA)
    )


def stream_warc_records(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    with_payload: bool = True,
    max_files_per_trigger: "int | None" = None,
) -> DataFrame:
    """Streaming twin of `warc_records` (the webdataset-manifest
    discipline): a crawl fleet appends shards under `path`, Structured
    Streaming's file-source ledger tracks arrivals, and every
    micro-batch walks ONLY the new shards with the identical map-side
    kernel.  The default glob is `*` to MATCH the batch walk's
    semantics (parse_warc sniffs gzip vs plain per file, and non-WARC
    files yield zero records) — a narrower default like `*.warc.gz`
    would silently drop plain `.warc` shards the batch twin reads,
    breaking the stream==batch contract.  Pair with `availableNow`
    triggers for catch-up and a parquet/`toTable` sink for a queryable
    crawl ledger; downstream stateless stages (html_to_text,
    canonical_url, quality) compose directly on the streaming frame."""
    from noaa_oracle_spark.pipeline.binary_stream import stream_binary_files

    return stream_binary_files(
        spark, path, glob, max_files_per_trigger
    ).mapInPandas(_records_kernel(with_payload), WARC_RECORD_SCHEMA)


def _cdx_id() -> "Column":
    """60-bit id from the record's CDX coordinates
    (shard, record_offset, record_idx): stable across re-walks,
    independent of partitioning, traceable back to a fetchable record.
    record_idx is in the key because every record of a multi-record
    gzip member shares the member's extent — (shard, offset) alone
    would collide (round-8 advice)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("shard"),
                    F.col("record_offset"),
                    F.col("record_idx"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def crawl_to_documents(
    spark: SparkSession,
    path_glob: str,
    min_block_chars: int = 40,
    max_link_density: float = 0.33,
    robots: "DataFrame | None" = None,
    user_agent: str = "*",
    robots_plan: str = "auto",
    robots_max_inline_hosts: int = 1_000_000,
) -> DataFrame:
    """The whole crawl front door as one lazy plan: WARC shards →
    successful HTML responses → main-text extraction → canonical URL —
    emitting rows in the engine's documents shape (doc_id, url, source,
    text) so everything downstream (quality, dedup, LM scoring, splits,
    packing) composes unchanged.

    doc_id is the 60-bit hash of (shard, offset, record_idx) — stable
    across re-walks of the same shards, independent of partitioning,
    and derived from the CDX coordinates so a document can always be
    traced back to (and re-fetched from) its record.  record_idx is in
    the key because a multi-record gzip member assigns the SAME member
    extent (offset) to every record inside it — (shard, offset) alone
    would give two HTML responses in one member identical doc_ids and
    silently corrupt downstream dedup/joins (round-8 advice).  `source` is the
    registrable domain (the provenance key domain caps and mixes group
    on).  Truly ONE pass: url/source ride THROUGH the extraction
    kernel as passthrough columns (`html_to_text(keep_cols=...)`) —
    the join-back alternative would evaluate the crawl walk twice —
    and nothing shuffles until the caller aggregates.

    `robots`, when given, is the (host, robots_txt) dimension and
    applies the RFC 9309 compliance pass
    (`web.filter_robots_disallowed`) to the records BEFORE extraction
    ever runs.  `robots_plan`/`robots_max_inline_hosts` pass straight
    through — the default 'auto' evaluates in the scan stage under the
    inline budget (no join at all; the crawl stays one pass) and falls
    back to the shuffle join for a beyond-budget rule dimension.
    Caveat: 'auto'/'inline' run eager (small-side-only) jobs at
    plan-construction time — the budget probe and rule collect; pass
    robots_plan='shuffle' to keep construction fully lazy."""
    from noaa_oracle_spark.pipeline.html import html_to_text
    from noaa_oracle_spark.pipeline.web import (
        canonical_url,
        registrable_domain,
    )

    recs = warc_records(spark, path_glob, with_payload=True).filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    )
    if robots is not None:
        from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

        # filter on the raw target_uri before extraction ever runs;
        # only the url string crosses into the Arrow eval stage — the
        # payload column stays JVM-side through the filter
        recs = filter_robots_disallowed(
            recs,
            robots,
            url_col="target_uri",
            user_agent=user_agent,
            plan=robots_plan,
            max_inline_hosts=robots_max_inline_hosts,
        )
    pages = recs.select(
        _cdx_id().alias("doc_id"),
        canonical_url(F.col("target_uri")).alias("url"),
        registrable_domain(F.col("target_uri")).alias("source"),
        F.col("payload").cast("string").alias("html"),
    )
    texts = html_to_text(
        pages,
        min_block_chars=min_block_chars,
        max_link_density=max_link_density,
        keep_cols=["url", "source"],
    )
    return texts.select("doc_id", "url", "source", "text").filter(
        F.col("text") != ""
    )


def crawl_to_media(
    spark: SparkSession,
    path_glob: str,
    kinds: "tuple[str, ...]" = ("image",),
    robots: "DataFrame | None" = None,
    user_agent: str = "*",
) -> DataFrame:
    """The multimodal sibling of `crawl_to_documents`: successful
    responses whose Content-Type's top-level type is in `kinds`
    (default images) become rows in the engine's media shape
    (media_id, url, source, mime_type, kind, content) — the frame
    `multimodal.image_phash` / `phash_near_dupes` and the feature
    extractors consume directly, so crawl → perceptual dedup is two
    calls.  media_id is the same CDX-coordinate hash as
    `crawl_to_documents`' doc_id (an asset and a page can never
    collide: they are different records with different coordinates).

    Same scale shape as the text front door: one binaryFile scan, the
    blobs never shuffle (downstream phash/feature kernels are
    map-side), optional robots compliance on the raw target_uri before
    payloads go anywhere."""
    from noaa_oracle_spark.pipeline.web import (
        canonical_url,
        registrable_domain,
    )

    kind_expr = F.lower(
        F.substring_index(
            F.substring_index(F.col("content_type"), ";", 1), "/", 1
        )
    )
    recs = warc_records(spark, path_glob, with_payload=True).filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & kind_expr.isin(*[k.lower() for k in kinds])
    )
    if robots is not None:
        from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

        recs = filter_robots_disallowed(
            recs, robots, url_col="target_uri", user_agent=user_agent
        )
    return recs.select(
        _cdx_id().alias("media_id"),
        canonical_url(F.col("target_uri")).alias("url"),
        registrable_domain(F.col("target_uri")).alias("source"),
        F.trim(
            F.substring_index(F.col("content_type"), ";", 1)
        ).alias("mime_type"),
        kind_expr.alias("kind"),
        F.col("payload").alias("content"),
    )


WARC_SHARD_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("shard_path", T.StringType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def write_warc_shards(
    docs: DataFrame,
    path: str,
    records_per_shard: int = 1000,
    salt: str = "",
    id_col: str = "doc_id",
    uri_col: str = "url",
    payload_col: str = "text",
    content_type: str = "text/plain",
) -> DataFrame:
    """Distributed WARC writer — the write side of the crawl tier (the
    `write_webdataset_shards` sibling): re-shard a filtered/extracted
    corpus back into `shard-%05d.warc.gz` member-gzip shards under
    `path`, one `resource` record per row, returning (and persisting as
    manifest.json) the shard manifest (shard_id, shard_path, n_records,
    n_bytes).

    Record order inside and across shards is the md5(salt|id) hash
    order via the two-pass global-rank discipline (hash-prefix buckets,
    per-bucket windows, broadcast offsets — never a single-partition
    window), and shard bytes are deterministic (`build_warc`: mtime=0,
    index-derived record ids), so OUTPUT BYTES are reproducible across
    runs and partitionings — the webdataset reproducibility rule.  One
    task writes one shard; payload bytes never cross more than the one
    shard-routing exchange."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    n = docs.count()
    if n == 0:
        with open(os.path.join(path, "manifest.json"), "w") as fh:
            json.dump([], fh)
        return docs.sparkSession.createDataFrame(
            [], WARC_SHARD_MANIFEST_SCHEMA
        )

    payload_is_binary = isinstance(
        docs.schema[payload_col].dataType, T.BinaryType
    )
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f"{salt}|"), F.col("_id").cast("string")))
    b = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(uri_col).alias("_uri"),
        F.col(payload_col).alias("_payload"),
    ).withColumn("_h", h).withColumn("_b", b)
    w = Window.partitionBy("_b").orderBy("_h", "_id")
    local = base.withColumn("_rn", F.row_number().over(w))
    totals = local.groupBy("_b").agg(F.max("_rn").alias("_c")).collect()
    offsets, running = [], 0
    for row in sorted(totals, key=lambda r: r["_b"]):
        offsets.append((row["_b"], running))
        running += row["_c"]
    off_df = docs.sparkSession.createDataFrame(offsets, "_b int, _off long")
    ranked = local.join(F.broadcast(off_df), "_b").withColumn(
        "_rank", (F.col("_off") + F.col("_rn") - 1).cast("long")
    )
    routed = ranked.withColumn(
        "_shard", (F.col("_rank") / records_per_shard).cast("long")
    )
    n_shards = -(-n // records_per_shard)
    dest = path
    ctype = content_type

    def write_shard(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=["shard_id", "shard_path", "n_records", "n_bytes"]
            )
        sid = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("_rank")
        recs = []
        for _, row in pdf.iterrows():
            p = row["_payload"]
            if p is None:
                blob = b""
            elif payload_is_binary:
                blob = bytes(p)
            else:
                blob = str(p).encode("utf-8")
            recs.append(
                {
                    "type": "resource",
                    "uri": "" if row["_uri"] is None else str(row["_uri"]),
                    "content_type": ctype,
                    "payload": blob,
                }
            )
        shard_path = os.path.join(dest, f"shard-{sid:05d}.warc.gz")
        tmp = shard_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(build_warc(recs, member_gzip=True))
        os.replace(tmp, shard_path)
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "shard_path": [shard_path],
                "n_records": [len(pdf)],
                "n_bytes": [os.path.getsize(shard_path)],
            }
        )

    import json as _json
    import os as _os

    manifest_df = (
        routed.repartition(max(n_shards, 1), "_shard")
        .groupBy("_shard")
        .applyInPandas(write_shard, WARC_SHARD_MANIFEST_SCHEMA)
    )
    manifest = sorted(
        (r.asDict() for r in manifest_df.collect()),
        key=lambda d: d["shard_id"],
    )
    with open(_os.path.join(path, "manifest.json"), "w") as fh:
        _json.dump(manifest, fh, sort_keys=True)
    return docs.sparkSession.createDataFrame(
        manifest, WARC_SHARD_MANIFEST_SCHEMA
    )
