"""HTML → training-text extraction — the crawl-to-corpus front door
(the stage C4 ran with a tag stripper and jusText/trafilatura run with
block classification), on stdlib `html.parser` alone.

Two layers:

  - `parse_blocks(html)`: tolerant streaming parse into BLOCK records —
    text segmented at block-level tags, per block the visible text, its
    anchor-text character count, and the source tag — with
    script/style/noscript/template/svg/head subtrees dropped and
    entities unescaped.  Malformed markup never raises (html.parser is
    recovery-oriented by design); the result is deterministic.
  - `extract_main_text(html)`: the jusText-style heuristic over those
    blocks — a block is CONTENT when it is long enough and not
    link-dominated (boilerplate navigation/footers are short and
    anchor-heavy), headings are kept when a content block follows them.
    Returns the joined content text plus the block-level accounting
    (n_blocks, n_content_blocks, link_density) a corpus profile reads.

Spark surface: `html_to_text(docs)` — one mapInPandas over the raw HTML
column (Arrow-batched, per-row degrade to NULL text on any parse
surprise), emitting text + structure metrics.  Map-side only: HTML
bytes never cross an exchange; downstream operators (quality, dedup,
LM scoring) consume the extracted text column.

Round 8 adds the frontier side of the loop: `extract_links` /
`html_links(docs)` — out-link edges (doc_id, link) with relative hrefs
resolved against the page URL, rel=nofollow honored, pseudo-schemes
and fragments dropped — so fetch → extract → canonicalize →
robots-filter → next frontier closes entirely in-engine.

Reference scope: none (brief-added LLM-pipeline surface).  Heuristic
constants (min block length, link-density cut) are pinned here and in
the tests — they are policy, not spec.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Subtrees whose text is never visible content.  `head` is handled as
#: a recoverable flag (HTML5 allows omitting </head>), not skip depth.
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe"}
)

#: Tags that terminate the current text block.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
        "h1", "h2", "h3", "h4", "h5", "h6", "article", "section",
        "header", "footer", "nav", "aside", "main", "blockquote", "pre",
        "figure", "figcaption", "hr", "form", "fieldset", "dl", "dt",
        "dd", "body", "title",
    }
)

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "title"})


class _BlockParser(HTMLParser):
    # html.parser performs NO implied end tags, and HTML5 allows
    # omitting </head> — without recovery an omitted </head> would
    # leave the head-skip stuck and silently drop the whole body
    # (round-7 review finding).  `head` is therefore tracked as a FLAG
    # cleared by <body> or by any block-level start tag (except title,
    # which is legitimate head content), not as skip depth; <body> also
    # resets the skip depth outright (an unclosed <svg>/<iframe> before
    # it is malformed markup — recover rather than eat the document).
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._skip_depth = 0
        self._in_head = False
        self._link_depth = 0
        self._tag = "body"

    def _flush(self, next_tag: str) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append(
                {
                    "text": text,
                    "link_chars": min(self._link_chars, len(text)),
                    "tag": self._tag,
                }
            )
        self._buf, self._link_chars = [], 0
        # an anchor is not allowed to span a block boundary here: an
        # UNCLOSED <a> would otherwise mark every later block
        # link-dense and erase the rest of the document (review
        # finding).  Cost: <a><div>card</div></a> wrappers undercount
        # link chars — conservative toward keeping content.
        self._link_depth = 0
        self._tag = next_tag

    def handle_starttag(self, tag, attrs):
        if tag == "head":
            self._in_head = True
            return
        if tag == "body":
            self._in_head = False
            self._skip_depth = 0
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if self._in_head and tag in _BLOCK_TAGS and tag != "title":
            self._in_head = False  # implied </head> (HTML5 omission)
        if self._in_head:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush(tag)

    def handle_endtag(self, tag):
        if tag == "head":
            self._in_head = False
            return
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth or self._in_head:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush("body")

    def handle_data(self, data):
        if self._skip_depth or self._in_head or not data:
            return
        self._buf.append(data)
        if self._link_depth:
            self._link_chars += len(" ".join(data.split()))


def parse_blocks(html: str) -> "list[dict]":
    """Visible-text blocks of an HTML document: [{text, link_chars,
    tag}] in document order, skip-subtrees removed, entities unescaped,
    whitespace normalized.  Never raises on malformed markup."""
    p = _BlockParser()
    p.feed(html or "")
    p.close()
    p._flush("body")
    return p.blocks


def extract_main_text(
    html: str,
    min_block_chars: int = 40,
    max_link_density: float = 0.33,
) -> dict:
    """jusText-style main-content extraction: a block is CONTENT when
    text length >= `min_block_chars` AND anchor-text share <
    `max_link_density`; a heading block is kept when the NEXT kept
    block is content (a heading introduces its section, but a heading
    stranded in navigation is boilerplate).  Returns {'text',
    'n_blocks', 'n_content_blocks', 'link_density'} where link_density
    is the whole-document anchor-char share, 6-dp."""
    blocks = parse_blocks(html)
    content: list[str] = []
    pending_heading: "str | None" = None
    n_content = 0
    for b in blocks:
        is_heading = b["tag"] in _HEADING_TAGS
        dense_links = (
            b["link_chars"] > max_link_density * len(b["text"])
        )
        if is_heading and not dense_links:
            pending_heading = b["text"]
            continue
        if len(b["text"]) >= min_block_chars and not dense_links:
            if pending_heading is not None:
                content.append(pending_heading)
                pending_heading = None
            content.append(b["text"])
            n_content += 1
        else:
            pending_heading = None
    total = sum(len(b["text"]) for b in blocks)
    links = sum(b["link_chars"] for b in blocks)
    return {
        "text": "\n".join(content),
        "n_blocks": len(blocks),
        "n_content_blocks": n_content,
        "link_density": round(links / total, 6) if total else 0.0,
    }


HTML_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_blocks", T.IntegerType(), True),
        T.StructField("n_content_blocks", T.IntegerType(), True),
        T.StructField("link_density", T.DoubleType(), True),
    ]
)


def html_to_text(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_block_chars: int = 40,
    max_link_density: float = 0.33,
    keep_cols: "list[str] | None" = None,
) -> DataFrame:
    """Extract main text + structure metrics from an HTML column — one
    Arrow-batched mapInPandas, per-row degrade (a pathological document
    yields NULL text, the row survives); HTML bytes never shuffle.

    `keep_cols` are passed THROUGH the kernel unchanged (provenance
    columns like url/source): without passthrough a caller would have
    to join the output back to its input on the id — two evaluations of
    the upstream plan where the source is expensive (the crawl walk in
    `warc.crawl_to_documents`, round-7 efficiency finding)."""
    keep = list(keep_cols or [])
    bad = set(keep) & {"text", "n_blocks", "n_content_blocks",
                       "link_density", id_col}
    if bad:
        raise ValueError(f"html_to_text: keep_cols collide with outputs: {sorted(bad)}")
    schema = T.StructType(
        list(HTML_TEXT_SCHEMA.fields)
        + [docs.schema[c] for c in keep]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(doc_id, html):
            try:
                out = extract_main_text(
                    html,
                    min_block_chars=min_block_chars,
                    max_link_density=max_link_density,
                )
                return {
                    "doc_id": doc_id,
                    "text": out["text"],
                    "n_blocks": out["n_blocks"],
                    "n_content_blocks": out["n_content_blocks"],
                    "link_density": out["link_density"],
                }
            except Exception:
                return {
                    "doc_id": doc_id,
                    "text": None,
                    "n_blocks": None,
                    "n_content_blocks": None,
                    "link_density": None,
                }

        for pdf in it:
            rows = [
                one(i, h)
                for i, h in zip(pdf[id_col], pdf[html_col])
            ]
            out_pdf = pd.DataFrame(
                rows, columns=[f.name for f in HTML_TEXT_SCHEMA.fields]
            )
            for c in keep:
                out_pdf[c] = pdf[c].values
            yield out_pdf

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(html_col).alias(html_col),
        *[F.col(c) for c in keep],
    ).mapInPandas(kernel, schema)


class _LinkParser(HTMLParser):
    """Collect <a href> targets with their rel attributes — the
    frontier-discovery side of the crawl loop.  Links inside
    script/style/template/svg/iframe subtrees are ignored (they are
    not navigable content); malformed markup never raises."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: "list[tuple[str, bool]]" = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth or tag != "a":
            return
        href = None
        nofollow = False
        for k, v in attrs:
            if k == "href" and v:
                href = v
            elif k == "rel" and v and "nofollow" in v.lower().split():
                nofollow = True
        if href:
            self.links.append((href, nofollow))

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)


def extract_links(
    html: str,
    base_url: "str | None" = None,
    follow_only: bool = True,
) -> "list[str]":
    """Absolute out-link URLs of a page in document order, deduplicated
    (first occurrence wins) — the crawl loop's frontier source:
    fetch → extract text AND links → canonicalize → robots-filter →
    new frontier.

      - relative hrefs resolve against `base_url` (RFC 3986 urljoin);
        without one, relative links are dropped;
      - fragment-only links, and javascript:/mailto:/tel:/data:
        pseudo-schemes, are dropped (not fetchable documents);
        fragments on surviving links are stripped (client-side only —
        '/p' and '/p#sec' are one fetch);
      - `follow_only` honors rel="nofollow" (the crawl-politeness
        default; pass False for link-graph analyses that want every
        edge).

    Never raises on malformed markup (html.parser recovery + a belt
    around urljoin)."""
    from urllib.parse import urldefrag, urljoin, urlsplit

    p = _LinkParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    out: "list[str]" = []
    seen: "set[str]" = set()
    for href, nofollow in p.links:
        if follow_only and nofollow:
            continue
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        try:
            scheme = urlsplit(href).scheme.lower()
        except ValueError:
            continue
        if scheme and scheme not in ("http", "https"):
            continue
        if base_url:
            try:
                absu = urljoin(base_url, href)
            except ValueError:
                continue
        else:
            if not scheme:
                continue  # relative link with no base to resolve against
            absu = href
        absu = urldefrag(absu)[0]
        if not absu:
            continue
        if absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out


#: Output shape of html_links for long-keyed frames; the actual schema is
#: built per-call from the id column's real type (string-keyed crawl
#: frames are common — a hardcoded LongType failed at Arrow conversion
#: inside the kernel instead of plan time).
LINKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("link", T.StringType(), False),
    ]
)


def html_links(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    url_col: "str | None" = "url",
    follow_only: bool = True,
) -> DataFrame:
    """Out-link edges (doc_id, link) of an HTML column — one
    Arrow-batched mapInPandas, one output row per extracted absolute
    link, per-row degrade (a pathological document contributes no
    edges, the task survives).  `url_col` (when present) is each row's
    base URL for resolving relative hrefs.

    The frontier composition this feeds:
        links = html_links(pages)
        fresh = links.select(canonical_url("link")).distinct()
                  [anti-join the seen set; filter_robots_disallowed]
    — every downstream step is an existing operator, so the whole
    crawl loop (fetch → extract → frontier) closes in-engine.  HTML
    bytes never shuffle; only the (doc_id, link) edges do."""

    base_cols = [id_col, html_col] + (
        [url_col] if url_col and url_col in docs.columns else []
    )
    has_base = len(base_cols) == 3

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: "list" = []
            links: "list[str]" = []
            bases = pdf[url_col] if has_base else [None] * len(pdf)
            for doc_id, html, base in zip(pdf[id_col], pdf[html_col], bases):
                try:
                    found = extract_links(
                        html, base_url=base, follow_only=follow_only
                    )
                except Exception:
                    continue
                for u in found:
                    ids.append(doc_id)
                    links.append(u)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="object"),
                    "link": pd.Series(links, dtype="object"),
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", docs.schema[id_col].dataType, True),
            T.StructField("link", T.StringType(), False),
        ]
    )
    return docs.select(*base_cols).mapInPandas(kernel, schema)
