"""Web-corpus URL operators — the provenance stage of a crawl-derived
training pipeline (the C4 / RefinedWeb front door): canonicalize URLs so
exact-dedup keys agree across crawls, extract grouping domains, filter
against domain blocklists, and cap per-domain document counts.

Everything here is JVM-side expression work (`parse_url`, higher-order
array functions) — no Python in the hot path, because URL normalization
runs once per document over the WHOLE corpus before anything else:

  - `canonical_url`: lowercase scheme/host, strip default ports and
    fragments, drop tracking parameters (utm_* and a documented id
    list), sort surviving query parameters, normalize the empty path to
    '/'. Idempotent (property-tested), so keys computed from already-
    canonical URLs never re-shuffle membership.
  - `url_host` / `registrable_domain`: grouping keys at two
    granularities. registrable_domain approximates the Public Suffix
    List with the structural rule (last two labels, or three under a
    two-part suffix like co.uk) over an embedded set of the common
    second-level public suffixes — the full PSL is a large external
    artifact; the approximation and its failure mode (rare exotic
    suffixes group one label too high) are documented here rather than
    silently wrong.
  - `filter_blocked_domains`: map-side host-SUFFIX filter against a
    curated blocklist (entries at any granularity; subdomains of an
    entry are blocked with it), inlined as a literal array under an
    enforced size budget.
  - `domain_cap`: at most N docs per registrable domain, the
    `sampling.cap_per_group` deterministic-hash-prefix contract.
  - `parse_robots` / `robots_allows` / `parse_robots_rules` /
    `filter_robots_disallowed`: RFC 9309 robots.txt compliance (group
    selection by most specific product token, longest-match rule with
    Allow winning ties, '*' wildcards and '$' anchors).  Rules are
    pre-parsed in a distributed projection and joined to documents on
    the shared normalized host key (broadcast under a counted budget,
    shuffle-hash beyond it); evaluation is Arrow-batched because
    longest-match over per-host rule lists is not expressible as a
    fixed-depth column expression.
  - `robots_sitemap_urls` / `sitemap_locs` / `parse_crawl_delay`:
    frontier discovery + politeness metadata — sitemap declarations
    and <loc> entries as pure codegen expressions
    (regexp_extract_all / xpath), crawl-delay with parse_robots'
    group-selection semantics.
  - `politeness_waves`: schedule a frontier at ≤1 request per
    crawl-delay window per host — deterministic per-host wave numbers
    (rank-1-per-group window, one host-keyed shuffle) with the delay
    dimension broadcast.

Reference scope: none (brief-added LLM-pipeline surface, like the dedup
and sketch tiers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tracking parameters stripped by canonical_url: the utm_* family is
#: matched by prefix; these exact names cover the common click/session
#: identifiers that vary per visit without changing the document.
TRACKING_PARAMS = (
    "gclid",
    "fbclid",
    "msclkid",
    "dclid",
    "igshid",
    "mc_cid",
    "mc_eid",
    "yclid",
    "_ga",
    "ref_src",
    "cmpid",
)

#: Second-level labels that act as public suffixes under a country-code
#: TLD (the structural core of the PSL): under these, the registrable
#: domain is three labels, not two.
_SECOND_LEVEL_SUFFIXES = (
    "co", "com", "net", "org", "gov", "edu", "ac", "mil", "sch",
    "or", "ne", "go", "ad",
)


def normalize_host(host: Column) -> Column:
    """Canonical host form shared by BOTH sides of every host-keyed
    operation in this module (lowercase, trailing dot stripped, leading
    'www.' stripped).  The robots join and the blocklist normalize
    through this same function so a robots row keyed 'www.example.com'
    (or 'example.com.') matches documents at 'example.com' — one-sided
    normalization silently drops the row's rules (round-8 advice)."""
    host = F.lower(host)
    host = F.regexp_replace(host, r"\.$", "")
    return F.regexp_replace(host, r"^www\.", "")


def url_host(url: Column) -> Column:
    """Lowercased host with any leading 'www.' and trailing dot removed
    — the per-site grouping key (NULL for unparseable URLs)."""
    return normalize_host(F.try_parse_url(url, F.lit("HOST")))


def registrable_domain(url: Column) -> Column:
    """Registrable (pay-level) domain of a URL: the last two host
    labels, or the last three when the second-to-last label is a known
    second-level public suffix under a 2-letter ccTLD (co.uk, com.au,
    ac.jp ...).  An approximation of the Public Suffix List by its
    structural rule — see the module docstring for the failure mode."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    second = F.element_at(parts, -2)
    tld = F.element_at(parts, -1)
    take3 = (
        (n >= F.lit(3))
        & (F.length(tld) == 2)
        & second.isin(*_SECOND_LEVEL_SUFFIXES)
    )
    return F.when(host.isNull() | (host == ""), F.lit(None)).otherwise(
        F.when(n <= 2, host).otherwise(
            F.when(
                take3,
                F.concat_ws(
                    ".", F.element_at(parts, -3), second, tld
                ),
            ).otherwise(F.concat_ws(".", second, tld))
        )
    )


def _clean_query(query: Column) -> Column:
    """Drop tracking params and empty fragments from a query string,
    sort what survives (param order is not content-significant), NULL
    when nothing survives."""
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.lower(F.substring_index(p, "=", 1)).startswith("utm_")
        & ~F.lower(F.substring_index(p, "=", 1)).isin(*TRACKING_PARAMS),
    )
    joined = F.array_join(F.array_sort(params), "&")
    return F.when(joined == "", F.lit(None)).otherwise(joined)


def canonical_url(url: Column) -> Column:
    """Canonical form of an http(s) URL (NULL for unparseable or
    non-http(s) input): lowercase scheme and host, default port
    stripped, fragment dropped, tracking params removed, surviving
    query params sorted, empty path normalized to '/'.  Idempotent:
    canonical_url(canonical_url(u)) == canonical_url(u)."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(host, r"\.$", "")
    # AUTHORITY carries host[:port]; extract a non-default explicit port
    auth = F.lower(F.try_parse_url(url, F.lit("AUTHORITY")))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default_port = F.when(scheme == "https", F.lit("443")).otherwise(
        F.lit("80")
    )
    keep_port = (port != "") & (port != default_port)
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    query = _clean_query(F.try_parse_url(url, F.lit("QUERY")))
    ok = (
        scheme.isin("http", "https")
        & host.isNotNull()
        & (host != "")
    )
    return F.when(
        ok,
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
                F.lit("")
            ),
            path,
            F.when(
                query.isNotNull(), F.concat(F.lit("?"), query)
            ).otherwise(F.lit("")),
        ),
    )


def filter_blocked_domains(
    docs: DataFrame,
    blocked: "DataFrame | list[str]",
    url_col: str = "url",
    max_entries: int = 10_000,
) -> DataFrame:
    """Drop documents whose host matches a blocklist entry by HOST
    SUFFIX: an entry blocks itself and every subdomain of it
    ('example.com' blocks 'spam.example.com'; 'spam.example.com' blocks
    only that subtree) — real blocklists name hosts at any granularity,
    so matching on registrable domain alone would silently ignore
    subdomain entries (round-7 review finding).  Entries are normalized
    like `url_host` (lowercase, leading 'www.' and trailing dot
    stripped).

    The blocklist is a curated human artifact, small by construction:
    it is collected to the driver and inlined as an array literal, so
    the filter is pure map-side expression work — the corpus crosses no
    exchange and no join.  That design only holds under a SIZE budget,
    so `max_entries` (default 10k) is ENFORCED, not advisory (round-7
    review: a machine-generated million-entry list would otherwise fail
    late as a driver collect + codegen blowup); for lists beyond the
    budget, the decontamination tier's bloom/broadcast join is the
    right tool instead."""
    if isinstance(blocked, DataFrame):
        col = blocked.columns[0]
        entries = [
            r[col]
            for r in blocked.select(col).limit(max_entries + 1).collect()
        ]
    else:
        entries = list(blocked)
    if len(entries) > max_entries:
        raise ValueError(
            f"filter_blocked_domains: blocklist exceeds max_entries="
            f"{max_entries} — this literal-inline filter is for curated "
            "lists; use decontamination's bloom/broadcast join for "
            "machine-generated ones"
        )
    norm = sorted(
        {
            e.lower().lstrip(".").removeprefix("www.").rstrip(".")
            for e in entries
            if e
        }
    )
    if not norm:
        return docs
    host = url_host(F.col(url_col))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    # every suffix of the host's label chain: a.b.c -> [a.b.c, b.c, c]
    chain = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )
    blocked_arr = F.array(*[F.lit(e) for e in norm])
    hit = F.exists(chain, lambda s: F.array_contains(blocked_arr, s))
    return docs.filter(~F.coalesce(hit, F.lit(False)))


def domain_cap(
    docs: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """At most `cap` documents per registrable domain, membership
    decided by deterministic id-hash order (`sampling.cap_per_group`):
    re-runs and re-partitionings keep the same documents, and raising
    the cap only ever adds.  The anti-SEO-farm lever of a training mix
    ("no single site dominates")."""
    from noaa_oracle_spark.pipeline.sampling import cap_per_group

    with_dom = docs.withColumn(
        "_dom", F.coalesce(registrable_domain(F.col(url_col)), F.lit(""))
    )
    return cap_per_group(
        with_dom, "_dom", id_col, cap, salt=salt
    ).drop("_dom")


def domain_stats(
    docs: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-registrable-domain document counts and corpus share — the
    profile readout that motivates `domain_cap` thresholds.  One
    domain-keyed agg + a broadcast 1-row total (the q68 two-scan
    discipline is unnecessary here: the agg output IS the small side)."""
    per = (
        docs.withColumn("_dom", registrable_domain(F.col(url_col)))
        .groupBy(F.col("_dom").alias("domain"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total = per.agg(F.sum("n_docs").alias("_total"))
    return per.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_docs",
        F.round(F.col("n_docs") / F.col("_total"), 6).alias("doc_share"),
    )


def parse_robots(robots_txt: str, user_agent: str = "*") -> "list[tuple[str, bool]]":
    """Parse a robots.txt body (RFC 9309) into the rule list that
    applies to `user_agent`: [(path_prefix, allow)] — the group whose
    User-agent line most specifically matches wins (exact product token
    beats '*'; groups separated by User-agent lines; multiple UA lines
    share one group).  Comments (#) stripped; unknown directives
    ignored; an empty Disallow means allow-all (the RFC's explicit
    no-restriction form) and contributes no rule."""
    target = user_agent.lower()
    groups: "list[tuple[list[str], list[tuple[str, bool]]]]" = []
    agents: "list[str]" = []
    rules: "list[tuple[str, bool]]" = []
    in_group_body = False
    for raw in (robots_txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        name, sep, value = line.partition(":")
        if not sep:
            continue
        name = name.strip().lower()
        value = value.strip()
        if name == "user-agent":
            if in_group_body:
                groups.append((agents, rules))
                agents, rules = [], []
                in_group_body = False
            agents.append(value.lower())
        elif name in ("allow", "disallow"):
            in_group_body = True
            if value:
                rules.append((value, name == "allow"))
            # empty value: no restriction — contributes nothing
        # other directives (sitemap, crawl-delay...) are ignored
    if agents:
        groups.append((agents, rules))
    # pick the most specific matching group: exact token > '*'
    exact = [r for a, r in groups if target in a]
    if exact:
        return exact[0]
    starred = [r for a, r in groups if "*" in a]
    return starred[0] if starred else []


def _rule_matches(rule_path: str, path: str) -> bool:
    """Does one RFC 9309 rule path match `path`?  '*' is a full
    wildcard and a trailing '$' anchors end-of-path.  Unanchored rules
    use greedy leftmost fragment matching (complete for existence);
    anchored rules match the FINAL fragment against the end of the path
    instead — greedy leftmost would bind the last fragment to its first
    occurrence and wrongly fail e.g. rule '/*x$' on path '/axbx'
    (round-8 advice)."""
    anchored = rule_path.endswith("$")
    body = rule_path[:-1] if anchored else rule_path
    parts = body.split("*")
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    if len(parts) == 1:
        return pos == len(path) if anchored else True
    mids = parts[1:-1]
    last = parts[-1]
    for frag in mids:
        nxt = path.find(frag, pos)
        if nxt < 0:
            return False
        pos = nxt + len(frag)
    if anchored:
        # the last fragment must sit flush at the end, at or after pos
        return path.endswith(last) and len(path) - len(last) >= pos
    return path.find(last, pos) >= 0


def robots_allows(rules: "list[tuple[str, bool]]", path: str) -> bool:
    """RFC 9309 evaluation: the LONGEST rule whose prefix matches the
    path decides; on a length tie Allow wins; no match ⇒ allowed.
    '$' anchors end-of-path and '*' wildcards inside rule paths are
    honored (the two special characters the RFC defines)."""
    best_len = -1
    best_allow = True
    for rule_path, allow in rules:
        if not _rule_matches(rule_path, path):
            continue
        specificity = len(rule_path)
        if specificity > best_len or (
            specificity == best_len and allow and not best_allow
        ):
            best_len = specificity
            best_allow = allow
    return best_allow


def parse_robots_rules(
    robots: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Distributed pre-parse of a (host, robots_txt) dimension into the
    per-host rule lists that apply to `user_agent`:
    (host, rules array<struct<p string, allow boolean>>).

    Raw bodies never leave the executors — parsing happens in one
    Arrow-batched projection where the bodies already sit.  Hosts whose
    applicable group is EMPTY (no robots.txt restrictions for this
    agent — the overwhelming majority of the web) are dropped, so the
    join side downstream carries only hosts that can actually change a
    verdict — and so are hosts with ONLY Allow rules, since the
    no-match default is already allow and only a matching Disallow can
    flip it.  Hosts are normalized through `normalize_host`, the same
    function the document side uses, and duplicate host rows (e.g.
    'www.x.com' + 'x.com' collapsing under normalization) contribute
    the UNION of their (deterministically sorted) bodies' rule lists —
    one row per host out, so the join can never fan out a document
    row, and neither sibling's Disallow rules can be silently
    discarded."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("host", T.StringType(), False),
            T.StructField(
                "rules",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("p", T.StringType()),
                            T.StructField("allow", T.BooleanType()),
                        ]
                    )
                ),
                False,
            ),
        ]
    )

    # mapInPandas (not a pandas_udf projection + a where): the kernel
    # both parses and DROPS non-restricting hosts in one pass — a
    # filter expressed over a UDF column would evaluate the UDF twice
    # (once for the predicate, once for the projection; plan-verified)
    def _parse_kernel(it):
        import pandas as pd

        for pdf in it:
            hosts, rule_lists = [], []
            for h, bodies in zip(pdf["host"], pdf["_txts"]):
                rules = [
                    r
                    for b in bodies
                    for r in parse_robots(b or "", user_agent)
                ]
                if any(not allow for _, allow in rules):
                    hosts.append(h)
                    rule_lists.append(
                        [{"p": p, "allow": a} for p, a in rules]
                    )
            # explicit object dtype: a batch where EVERY host was
            # dropped yields empty columns, which pandas would default
            # to float64 and Arrow cannot convert to list<struct>
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "rules": pd.Series(rule_lists, dtype="object"),
                }
            )

    # distinct hosts folding to one normalized key (www/apex, trailing
    # dot) contribute the UNION of their rule lists, sorted for
    # determinism — picking one body (e.g. min()) could silently
    # discard a host's Disallow rules when the sibling body sorts first
    # (round-8 review); longest-match then evaluates over the union
    one_per_host = (
        robots.select(
            normalize_host(F.col(host_col)).alias("host"),
            F.col(txt_col).alias("_txt"),
        )
        .where(F.col("host").isNotNull() & (F.col("host") != ""))
        .groupBy("host")
        .agg(F.sort_array(F.collect_set("_txt")).alias("_txts"))
    )
    return one_per_host.mapInPandas(_parse_kernel, out_schema)


def filter_robots_disallowed(
    docs: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    user_agent: str = "*",
    plan: str = "auto",
    max_inline_hosts: int = 1_000_000,
) -> DataFrame:
    """Drop documents whose URL path a site's robots.txt disallows —
    the compliance pass a crawl-derived corpus runs before anything
    else (C4 did; RFC 9309 semantics: longest-match, Allow wins ties,
    no-match ⇒ allowed, hosts WITHOUT a robots.txt allowed).

    `robots` is (host, robots_txt) — one row per site, the artifact a
    crawler already fetched.  Scale shape (round-8 rewrite of the
    round-7 uncapped driver collect): rules are ALWAYS pre-parsed in a
    DISTRIBUTED projection (`parse_robots_rules` — raw bodies never
    reach the driver, non-restricting hosts drop out).  `plan` picks
    how the parsed dimension meets the corpus; the full measured
    ladder is SCALE.md §12 (1M docs, 1k/10k/100k restricting hosts,
    fresh local[32] processes):

      - 'inline': the parsed rules — never the bodies — collect to
        the driver under an ENFORCED `max_inline_hosts` budget (loud
        ValueError beyond it) and broadcast as a plain dict; the
        verdict evaluates in one Arrow stage ON THE SCAN — zero joins,
        the corpus crosses ZERO exchanges.  11.7–18.4 s measured
        locally.  The driver footprint equals what a broadcast join
        would put there anyway (BroadcastExchange collects its child
        to the driver too), so under the budget this plan strictly
        dominates 'broadcast'.
      - 'shuffle': documents LEFT-join the rule dimension with a
        shuffle-hash join on the shared normalized host key, verdict
        in the joined Arrow stage.  The beyond-driver-memory path —
        nothing materializes anywhere whole.  7.7–10.0 s measured
        locally — the LOCAL winner, because a local[32] exchange is a
        memory copy; at cluster scale the same exchange ships the
        ENTIRE corpus over the network, which is why it is the
        fallback and not the default.
      - 'broadcast': the same join as a broadcast-hash join.  Kept
        for completeness/regression: ~19 s measured — ArrowEvalPython
        downstream of a BroadcastHashJoin pays a structural penalty
        regardless of dimension size (measured at 1k/10k/100k hosts),
        and its driver footprint already equals 'inline'.
      - 'auto' (default): probe the parsed dimension with
        limit(max_inline_hosts + 1).count() — ONE number to the
        driver, so the over-budget case never materializes a
        driver-sized row set — then run 'inline' when it fits (one
        extra parse of a by-definition-small dimension) or fall back
        to 'shuffle'.  The probe touches only the (small) robots
        lineage, never the corpus — but note it IS an eager job at
        plan-construction time.  auto prefers inline over the
        locally-faster shuffle because keeping the corpus map-side is
        the property that survives the 100 TB scale-up.
    """
    from pyspark.sql import types as T

    if plan not in ("auto", "inline", "broadcast", "shuffle"):
        raise ValueError(
            f"filter_robots_disallowed: unknown plan {plan!r} "
            "(expected 'auto', 'inline', 'broadcast' or 'shuffle')"
        )
    rules_df = parse_robots_rules(robots, user_agent)

    inline_rows = None
    if plan in ("auto", "inline"):
        # budget probe: limit().count() ships ONE number — the failure
        # case (dimension over budget) must not itself materialize a
        # driver-sized row set (round-8 review); the under-budget case
        # then pays one extra parse of a by-definition-small dimension
        n_restricting = rules_df.limit(max_inline_hosts + 1).count()
        if n_restricting <= max_inline_hosts:
            inline_rows = rules_df.collect()
        elif plan == "inline":
            raise ValueError(
                f"filter_robots_disallowed: more than "
                f"{max_inline_hosts} restricting hosts — the inline "
                "dict exceeds its driver budget; use plan='shuffle' "
                "(or 'auto', which falls back to it)"
            )
        else:
            plan = "shuffle"

    if inline_rows is not None:
        rule_map = {
            r["host"]: [(d["p"], d["allow"]) for d in r["rules"]]
            for r in inline_rows
        }
        if not rule_map:
            # nothing restricts: every verdict is allow — skip the
            # Arrow round-trip entirely (the common open-web case)
            return docs
        bc = docs.sparkSession.sparkContext.broadcast(rule_map)

        def _allowed_inline(urls, hosts):
            from urllib.parse import urlsplit

            rules = bc.value

            def one(u, h):
                # h comes from the SAME url_host expression the join
                # plans key on, so all three plans agree even on URLs
                # Python's urlsplit and Spark's try_parse_url parse
                # differently (round-8 review); urlsplit only ever
                # extracts the PATH here, as in the join-plan kernel
                if u is None or h is None:
                    return True
                r = rules.get(h)
                if not r:
                    return True
                try:
                    parts = urlsplit(u)
                except ValueError:
                    return True
                path = parts.path or "/"
                if parts.query:
                    path += "?" + parts.query
                return robots_allows(r, path)

            import pandas as pd

            return pd.Series(
                [one(u, h) for u, h in zip(urls, hosts)]
            )

        _allowed = F.pandas_udf(
            _allowed_inline, T.BooleanType(), F.PandasUDFType.SCALAR
        )
        return docs.filter(
            _allowed(F.col(url_col), url_host(F.col(url_col)))
        )

    # join path — rename the dimension's columns before joining: a
    # docs frame may legitimately carry its own host/rules columns
    # (crawl pipelines often do), and a bare drop-by-name after the
    # join would eat them
    rules_df = rules_df.select(
        F.col("host").alias("_robots_host"),
        F.col("rules").alias("_robots_rules"),
    )
    if plan == "broadcast":
        rules_df = F.broadcast(rules_df)
    else:
        rules_df = rules_df.hint("shuffle_hash")

    def _allowed_series(urls, rule_lists):
        import pandas as pd
        from urllib.parse import urlsplit

        out = []
        for u, rl in zip(urls, rule_lists):
            if rl is None or len(rl) == 0 or u is None:
                out.append(True)
                continue
            try:
                parts = urlsplit(u)
            except ValueError:
                out.append(True)
                continue
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
            out.append(
                robots_allows(
                    [(d["p"], d["allow"]) for d in rl], path
                )
            )
        return pd.Series(out)

    _allowed = F.pandas_udf(
        _allowed_series, T.BooleanType(), F.PandasUDFType.SCALAR
    )

    joined = docs.withColumn(
        "_doc_host", url_host(F.col(url_col))
    ).join(
        rules_df, F.col("_doc_host") == F.col("_robots_host"), "left"
    )
    return (
        joined.filter(_allowed(F.col(url_col), F.col("_robots_rules")))
        .drop("_doc_host", "_robots_host", "_robots_rules")
    )


def robots_sitemap_urls(robots_txt: Column) -> Column:
    """Sitemap URLs declared in a robots.txt body (RFC 9309 §2.3:
    'Sitemap:' lines live OUTSIDE groups, apply regardless of
    user-agent, case-insensitive, absolute URLs) — a pure codegen
    expression (regexp_extract_all), no Python: the other half of
    frontier discovery next to `html.extract_links`."""
    return F.regexp_extract_all(
        robots_txt, F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), 1
    )


def sitemap_locs(xml: Column) -> Column:
    """<loc> URLs of a sitemap or sitemap-index XML document — the
    xpath is namespace-agnostic (local-name()) because real sitemaps
    carry the sitemaps.org default namespace and copies in the wild
    often drop it.  Pure JVM expression (xpath), no Python; returns
    array<string>."""
    return F.xpath(xml, F.lit('//*[local-name()="loc"]/text()'))


def parse_crawl_delay(
    robots_txt: str, user_agent: str = "*"
) -> "float | None":
    """Crawl-delay (seconds) of the group that applies to `user_agent`
    — the de-facto extension most crawlers honor (not part of RFC 9309
    proper; group selection follows `parse_robots` exactly: exact
    product token beats '*').  None when the applicable group declares
    none or the value does not parse."""
    target = user_agent.lower()
    groups: "list[tuple[list[str], float | None]]" = []
    agents: "list[str]" = []
    delay: "float | None" = None
    in_body = False
    for raw in (robots_txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        name, sep, value = line.partition(":")
        if not sep:
            continue
        name = name.strip().lower()
        value = value.strip()
        if name == "user-agent":
            if in_body:
                groups.append((agents, delay))
                agents, delay = [], None
                in_body = False
            agents.append(value.lower())
        elif name in ("allow", "disallow"):
            # ONLY rule lines open a group body — crawl-delay records its
            # value without opening one, so a user-agent line after a bare
            # crawl-delay EXTENDS the group exactly as parse_robots (which
            # ignores crawl-delay lines entirely) would group it
            in_body = True
        elif name == "crawl-delay":
            if not agents and not in_body:
                continue  # header line before any group: applies to none
            try:
                d = float(value)
                delay = d if d >= 0 else None
            except ValueError:
                pass
    if agents:
        groups.append((agents, delay))
    exact = [d for a, d in groups if target in a]
    if exact:
        return exact[0]
    starred = [d for a, d in groups if "*" in a]
    return starred[0] if starred else None


def politeness_waves(
    frontier: DataFrame,
    url_col: str = "url",
    delays: "DataFrame | None" = None,
    default_delay: float = 1.0,
    keep_delay: bool = False,
    partition_extra: "list[str] | None" = None,
) -> DataFrame:
    """Schedule a fetch frontier politely: per host, URLs are ordered
    by deterministic id-hash (md5 of the url — re-runs schedule
    identically) and assigned 0-based `wave` numbers plus a
    `not_before_s` offset (wave × the host's crawl-delay), so a fetcher
    that processes wave w at time w·delay never exceeds one request
    per delay window per host.

    `delays` is an optional (host, delay_s) dimension (e.g. from
    `parse_crawl_delay` over fetched robots bodies), broadcast-joined
    on the shared normalized host key; hosts without a row use
    `default_delay`.  Scale shape: ONE shuffle on host (the window
    partition key), the delay dimension broadcast — the per-host wave
    counter is exactly the rank-1-per-group pattern the dedup tier
    uses, never a global window.

    `partition_extra` (r13 optimization round) adds columns to the
    window partition key so INDEPENDENT schedules compute in one pass:
    `crawl_rounds` schedules every round in a single (round, host)
    window instead of one host-window job per round — waves restart per
    round by definition, so partitioning by (round, host) over the
    unioned frontiers is value-identical to the per-round calls, with
    one exchange instead of rounds-many."""
    from pyspark.sql.window import Window

    host = url_host(F.col(url_col))
    with_host = frontier.withColumn("_p_host", host)
    if delays is not None:
        dcol = delays.columns[1]
        dim = (
            delays.select(
                normalize_host(F.col(delays.columns[0])).alias("_p_host"),
                F.col(dcol).cast("double").alias("_p_delay"),
            )
            # hosts folding under normalize_host (www./apex, case) must
            # collapse to ONE dim row BEFORE the join — duplicate keys
            # would fan every frontier row out into conflicting copies
            # (the same fold filter_robots' rule-union guards against);
            # max() keeps the most conservative declared delay
            .groupBy("_p_host")
            .agg(F.max("_p_delay").alias("_p_delay"))
        )
        with_host = with_host.join(F.broadcast(dim), "_p_host", "left")
    else:
        with_host = with_host.withColumn(
            "_p_delay", F.lit(None).cast("double")
        )
    w = Window.partitionBy(
        "_p_host", *(partition_extra or [])
    ).orderBy(F.md5(F.col(url_col)), F.col(url_col))
    delay = F.coalesce(F.col("_p_delay"), F.lit(float(default_delay)))
    wave = (F.row_number().over(w) - 1).cast("long")
    out = (
        with_host.withColumn("wave", wave)
        .withColumn("not_before_s", F.round(wave * delay, 6))
    )
    if keep_delay:
        # consumers that enforce the schedule (http_fetcher's pacing
        # kernel) need the resolved per-host delay alongside it
        out = out.withColumn("delay_s", delay)
    return out.drop("_p_host", "_p_delay")


def table_fetcher(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html"):
    """A `crawl_rounds` fetcher backed by a static page table: the
    frontier inner-joins the table on canonical URL (URLs the table
    lacks simply return no page — a 404).  This is the test/simulation
    fetcher; a production deployment plugs an HTTP mapInPandas fetcher
    with the same (frontier) -> (url, html) contract."""
    canon = pages.select(
        canonical_url(F.col(url_col)).alias("url"),
        F.col(html_col).alias("html"),
    ).where(F.col("url").isNotNull())

    def fetch(frontier: DataFrame) -> DataFrame:
        return frontier.select("url").join(canon, "url")

    return fetch


def http_fetcher(
    user_agent: str = "noaa-oracle-spark-crawler/1.0",
    timeout: float = 20.0,
    max_retries: int = 3,
    backoff_base: float = 1.0,
    delays: "DataFrame | None" = None,
    default_delay: float = 1.0,
    transport=None,
    clock=None,
    sleep=None,
    npartitions: "int | None" = None,
):
    """Production `crawl_rounds` fetcher: a rate-limited HTTP
    mapInPandas kernel honoring the `politeness_waves` schedule — the
    `table_fetcher` contract (``frontier(url) -> (url, html, …)``)
    backed by real requests instead of a static page table.

    Scale shape: the frontier is scheduled by `politeness_waves`
    (per-host 0-based waves × crawl-delay, `delays` broadcast), then
    HASH-PARTITIONED BY HOST, so every URL of a host lands in one
    partition and that host's requests are serialized on one executor
    core — per-host rate limits need no cross-executor coordination.
    Inside the kernel each row waits until the LATER of its scheduled
    ``t0 + not_before_s`` and ``last_start(host) + delay`` (fetch
    latency must not compress the gap below the crawl-delay), then
    runs the daemon's transport/retry discipline (`daemon.XmlFetcher`:
    injectable ``transport(url, timeout, headers) -> str``, exponential
    backoff through the injectable ``sleep``).  A URL that exhausts its
    retries yields NO row — the `table_fetcher` 404 semantics, so
    `crawl_rounds` treats dead links identically under both fetchers.

    ``clock``/``sleep`` default to ``time.monotonic``/``time.sleep``
    and are injectable so tests advance virtual time (the
    `test_daemon` discipline); both are closure-shipped to the workers,
    where their state is per-partition — exactly the scope the pacing
    needs.  Output: (url, html, fetched_at_s) — fetch start offset
    from the partition's first-row clock, the politeness audit column
    (`crawl_rounds` selects url/html and ignores it)."""
    import time as _time

    _clock = clock or _time.monotonic
    _sleep = sleep or _time.sleep

    if transport is None:
        from noaa_oracle_spark.daemon import _default_transport

        transport = _default_transport

    def fetch(frontier: DataFrame) -> DataFrame:
        import pandas as pd

        sched = politeness_waves(
            frontier.select("url"),
            delays=delays,
            default_delay=default_delay,
            keep_delay=True,
        ).select("url", "not_before_s", "delay_s")
        spark = frontier.sparkSession
        n = npartitions or spark.sparkContext.defaultParallelism
        # named "host" (no leading underscore): pandas itertuples renames
        # underscore-led columns positionally inside the kernel
        part = sched.withColumn("host", url_host(F.col("url"))).repartition(
            int(n), "host"
        )
        headers = {"User-Agent": user_agent}

        def kernel(batches):
            t0 = None
            last_start: dict = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pdf = pdf.sort_values(["not_before_s", "url"])
                if t0 is None:
                    t0 = _clock()
                urls, htmls, starts = [], [], []
                for row in pdf.itertuples(index=False):
                    host = row.host
                    attempt = 0
                    while True:
                        # every ATTEMPT is a request to the host, so the
                        # politeness gap applies to retries too (the
                        # exponential backoff can be shorter than the
                        # crawl delay; the wait below takes the max)
                        target = t0 + float(row.not_before_s)
                        if host in last_start:
                            target = max(
                                target,
                                last_start[host] + float(row.delay_s),
                            )
                        now = _clock()
                        if target > now:
                            _sleep(target - now)
                        start = _clock()
                        last_start[host] = start
                        try:
                            body = transport(row.url, timeout, headers)
                            break
                        except Exception:
                            if attempt >= max_retries:
                                body = None  # dead link: emit no row
                                break
                            _sleep(backoff_base * (2**attempt))
                            attempt += 1
                    if body is None:
                        continue
                    urls.append(row.url)
                    htmls.append(body)
                    starts.append(start - t0)
                if urls:
                    yield pd.DataFrame(
                        {
                            "url": urls,
                            "html": htmls,
                            "fetched_at_s": starts,
                        }
                    )

        return part.mapInPandas(
            kernel, "url string, html string, fetched_at_s double"
        )

    return fetch


def bloom_seen_filter(
    candidates: DataFrame,
    seen: DataFrame,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
) -> DataFrame:
    """`candidates` minus `seen` on `key_col` — exactly a left-anti
    join, with a broadcast bloom bitmap over the SEEN keys splitting the
    probe stream first: bloom-NEGATIVE rows are provably unseen and
    bypass the join entirely (a bloom never false-negatives), so only
    the maybe-fraction — true re-visits plus the bitmap's false
    positives — enters the anti-join exchange.  Exactness never depends
    on the filter, only the shuffle volume does (the
    decontamination_bloom discipline applied to the crawl frontier).

    At the billions-of-URLs tier this is the seen-set relief valve: in
    steady state most extracted links are NEW, so the anti-join's probe
    side shrinks to ~FPR of the stream while the join stays the
    correctness backstop.  Size m_bits ~10× the seen-set cardinality
    for a ~1% FPR (128 KB per 2^20 bits — broadcastable far beyond
    billion-URL crawls)."""
    from noaa_oracle_spark.pipeline.text import (
        bloom_bitmap,
        bloom_might_contain,
    )

    bitmap = bloom_bitmap(seen, key_col, m_bits, k_hashes)
    tested = candidates.crossJoin(F.broadcast(bitmap)).withColumn(
        "_maybe", bloom_might_contain(F.col(key_col), m_bits, k_hashes)
    )
    fresh = tested.filter(~F.col("_maybe")).drop("_maybe", "_bloom")
    maybe = (
        tested.filter(F.col("_maybe"))
        .drop("_maybe", "_bloom")
        .join(seen.select(key_col), key_col, "left_anti")
    )
    return fresh.unionByName(maybe)


def crawl_rounds(
    seeds: DataFrame,
    fetcher,
    rounds: int = 2,
    url_col: str = "url",
    robots: "DataFrame | None" = None,
    robots_plan: str = "auto",
    delays: "DataFrame | None" = None,
    default_delay: float = 1.0,
    max_frontier: "int | None" = None,
    seen_bloom_bits: "int | None" = None,
) -> DataFrame:
    """Iterative multi-round crawl frontier driver — the loop that turns
    the one-round composition (fetch → extract_links → canonicalize →
    seen-anti-join → robots → politeness) into an actual crawl.  Round 0
    is the canonicalized, robots-filtered seed set; each later round
    fetches the previous frontier via `fetcher` (a
    ``frontier(url) -> (url, html)`` callable — `table_fetcher` for
    tests/simulation, `http_fetcher` in production: the rate-limited
    HTTP mapInPandas kernel that re-applies `politeness_waves` and
    enforces its schedule per host),
    extracts out-links, canonicalizes, drops every URL already SEEN in
    any earlier round (global dedup, not just parent-round), applies the
    robots filter, and optionally truncates to a deterministic
    `max_frontier` budget (md5-ordered — re-runs truncate identically).

    Returns (url, round, wave, not_before_s): one row per scheduled
    fetch, with `politeness_waves` applied WITHIN each round (waves
    restart per round — a fetcher processes round r wave w at time
    w·delay, so per-host rate limits hold round by round).

    Scale shape per round: the fetch is whatever the fetcher does; link
    extraction is one Arrow stage over the fetched pages (HTML bytes
    never shuffle — only (page, link) edges do); the frontier dedup is
    one `distinct` exchange plus one left-anti hash join against the
    accumulated seen set (url-keyed — at the billions-of-URLs tier this
    is the shape you bucket by url hash, and `seen_bloom_bits` turns on
    the `bloom_seen_filter` relief valve: provably-unseen links bypass
    the anti-join, only the maybe-fraction probes it; the join stays
    the correctness backstop).  Each round's frontier is persisted and
    materialized — the driver loop truncates lineage so round N's plan
    does not re-derive rounds 0..N−1, the standard iterative-algorithm
    discipline (same as the connected-components loop).  The seen set
    peaks at the total crawled URL count; rounds are a small driver
    constant, so the loop adds no per-row driver work.

    Frontier invariants (tested): rounds are DISJOINT (a URL appears in
    exactly one round — the seen anti-join), and the union over rounds
    is exactly the reachable, robots-allowed closure within `rounds`
    hops of the seeds."""
    from noaa_oracle_spark.pipeline.html import html_links

    def _canon(df: DataFrame) -> DataFrame:
        return (
            df.select(canonical_url(F.col("url")).alias("url"))
            .where(F.col("url").isNotNull())
            .distinct()
        )

    def _guard(df: DataFrame) -> DataFrame:
        if robots is not None:
            df = filter_robots_disallowed(df, robots, plan=robots_plan)
        if max_frontier is not None:
            df = (
                df.orderBy(F.md5(F.col("url")), F.col("url"))
                .limit(int(max_frontier))
            )
        return df

    cur = _guard(_canon(seeds.select(F.col(url_col).alias("url"))))
    cur = cur.persist()
    if cur.count() == 0:
        cur.unpersist()
        raise ValueError("crawl_rounds: empty seed frontier")
    seen = cur
    out = [cur.withColumn("round", F.lit(0).cast("int"))]
    for rnd in range(1, int(rounds) + 1):
        pages = fetcher(cur).select(
            F.col("url"), F.col("html"), F.col("url").alias("_page_url")
        )
        edges = html_links(
            pages, html_col="html", id_col="_page_url", url_col="url"
        )
        nxt = _canon(edges.select(F.col("link").alias("url")))
        if seen_bloom_bits is not None:
            # bloom relief valve (`seen_bloom_bits` = m_bits): provably-
            # unseen links bypass the anti-join; only the maybe-fraction
            # probes the accumulated seen set.  Same rows either way.
            nxt = bloom_seen_filter(
                nxt, seen, key_col="url", m_bits=int(seen_bloom_bits)
            )
        else:
            nxt = nxt.join(seen, "url", "left_anti")
        nxt = _guard(nxt).persist()
        if nxt.count() == 0:
            nxt.unpersist()
            break
        out.append(nxt.withColumn("round", F.lit(rnd).cast("int")))
        # the union is NOT persisted: its legs (the per-round frontiers)
        # already are, so the next anti-join scans cached blocks — a
        # persist here would store every earlier round AGAIN (O(rounds)
        # duplicate storage for the same rows)
        seen = seen.union(nxt)
        cur = nxt

    # ONE scheduling pass over every round (r13 optimization round):
    # waves restart per round, so a single (round, host)-partitioned
    # window over the unioned cached frontiers is value-identical to
    # one politeness_waves call per round — one exchange and one delay
    # broadcast instead of rounds-many window jobs
    allrounds = out[0]
    for df in out[1:]:
        allrounds = allrounds.unionByName(df)
    result = politeness_waves(
        allrounds,
        delays=delays,
        default_delay=default_delay,
        partition_extra=["round"],
    )
    return result.select("url", "round", "wave", "not_before_s")
