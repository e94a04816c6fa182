"""Mergeable sketch operators — the sublinear cardinality / overlap /
frequency estimators a 100 TB corpus profile runs when exact answers are
too expensive to keep per shard: KMV (k-minimum-values) distinct-count
estimation (Bar-Yossef et al. 2002 — the bottom-k sketch behind Theta
sketches), KMV set-overlap / Jaccard between corpus slices, and a
count-min sketch (Cormode & Muthukrishnan 2005) for heavy-hitter
frequency estimates.

Unlike the engine-native `approx_count_distinct` (HyperLogLog++) these
are built from md5, so every engine that can hash reproduces the SAME
estimate bit-for-bit — the property the suite's DuckDB oracles grade,
and the property a multi-engine pipeline needs when sketches computed by
different systems must merge (per-shard sketches union into the corpus
sketch without re-reading data; that mergeability is the whole point of
the bottom-k / CMS designs).

Scale shapes:
  - KMV phase 1 cuts each group's distinct-hash stream to the k smallest
    PER HASH-BUCKET (a partitioned sort-window — spills, never
    collects); phase 2 re-cuts the <= n_buckets*k survivors per group.
    The k smallest of a union are always within the union of per-bucket
    k-smallest, so the two-phase cut is exact, and no task ever holds
    more than a sort buffer.
  - KMV pair math (union/intersection estimates) runs on the sketch
    ARRAYS — group-dimension rows, broadcastable by construction.
  - CMS buckets the term-TYPE dimension (the q106 de-skew discipline:
    occurrence rows reduce to types before the d-way seed explode), so
    the cell build costs one type-scale shuffle; the d*w cell table is
    tiny and broadcast into the estimate join.

Float portability: estimates are emitted 6-dp-rounded doubles computed
from integer hash math ((k-1) * 2^60 / (h_k + 1)); counts are BIGINT.
Never order by a raw estimate — rank on (estimate, group) if needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 60-bit md5-prefix hash: Spark conv(,16,10) == DuckDB ('0x'||hex)::BIGINT
# (the suite-wide cross-engine hash idiom, text.py:441).
_TWO60 = float(1 << 60)


def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: "list[str]",
    element: Column,
    k: int = 256,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate from the k smallest distinct
    60-bit element hashes: est = (k-1) / u_(k) with u_(k) the k-th
    smallest hash normalized to (0, 1] — unbiased for the true
    cardinality with relative error ~ 1/sqrt(k-2).  Groups with fewer
    than k distinct elements report their EXACT count (the sketch holds
    every hash).

    Returns (group..., n_sketch, kmv_distinct) where n_sketch =
    min(k, true distinct) and kmv_distinct is the 6-dp estimate."""
    if k < 2 or n_buckets < 1:
        raise ValueError(
            f"kmv_distinct: need k >= 2 and n_buckets >= 1, "
            f"got k={k}, n_buckets={n_buckets}"
        )
    # NULL elements are outside the sketch domain (they would hash to
    # NULL and sort as the minimum, polluting every bottom-k)
    hashed = (
        df.select(*group_cols, _h60(element).alias("_h"))
        .filter(F.col("_h").isNotNull())
        .dropDuplicates([*group_cols, "_h"])
    )
    # phase 1: k smallest per (group, hash-bucket) — bounded survivors
    bucketed = hashed.withColumn("_b", F.pmod(F.col("_h"), F.lit(n_buckets)))
    w1 = Window.partitionBy(*group_cols, "_b").orderBy("_h")
    survivors = (
        bucketed.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_b", "_rn")
    )
    # phase 2: k smallest per group over <= n_buckets*k rows
    w2 = Window.partitionBy(*group_cols).orderBy("_h")
    topk = survivors.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= k
    )
    return topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise(
                F.lit(float(k - 1)) * F.lit(_TWO60) / (F.max("_h") + F.lit(1.0))
            ),
            6,
        ).alias("kmv_distinct"),
    )


def kmv_sketches(
    df: DataFrame,
    group_col: str,
    element: Column,
    k: int = 256,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-group bottom-k sketch ARRAYS — (group, sketch: array<long>
    of the k smallest distinct element hashes, ascending).  The
    mergeable form: sketches union by concat → sort → cut.  Same
    two-phase scale shape as `kmv_distinct`."""
    if k < 1 or n_buckets < 1:
        raise ValueError(
            f"kmv_sketches: need k >= 1 and n_buckets >= 1, "
            f"got k={k}, n_buckets={n_buckets}"
        )
    hashed = (
        df.select(F.col(group_col).alias("_g"), _h60(element).alias("_h"))
        .filter(F.col("_h").isNotNull())  # NULL ∉ sketch domain
        .dropDuplicates(["_g", "_h"])
    )
    bucketed = hashed.withColumn("_b", F.pmod(F.col("_h"), F.lit(n_buckets)))
    w1 = Window.partitionBy("_g", "_b").orderBy("_h")
    survivors = (
        bucketed.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_b", "_rn")
    )
    return (
        survivors.groupBy("_g")
        .agg(
            F.slice(F.array_sort(F.collect_list("_h")), 1, k).alias("sketch")
        )
        .withColumnRenamed("_g", group_col)
    )


def kmv_jaccard(
    df: DataFrame,
    group_col: str,
    element: Column,
    k: int = 256,
    n_buckets: int = 32,
) -> DataFrame:
    """Pairwise set-overlap estimate between every two groups from their
    bottom-k sketches: the size-k bottom of the UNION is exactly
    computable from the two per-group sketches (any union-bottom hash
    must sit in its own group's bottom-k), and membership of a
    union-bottom hash in each side is likewise exact — so
    jaccard ≈ |union-bottom ∩ A ∩ B| / |union-bottom|, the standard
    Theta-sketch intersection estimator.

    Returns (group_a, group_b, n_union_sketch, n_both, jaccard) for
    group_a < group_b, with the ratio ALSO emitted as its integer
    numerator/denominator (the suite float rule)."""
    sk = kmv_sketches(df, group_col, element, k=k, n_buckets=n_buckets)
    a = sk.select(
        F.col(group_col).alias("group_a"), F.col("sketch").alias("_sa")
    )
    b = sk.select(
        F.col(group_col).alias("group_b"), F.col("sketch").alias("_sb")
    )
    # group-dimension rows: the pair join is broadcast-sized by definition
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    union_bottom = F.slice(
        F.array_sort(F.array_union("_sa", "_sb")), 1, k
    )
    both = F.array_intersect(F.array_intersect(union_bottom, "_sa"), "_sb")
    return pairs.select(
        "group_a",
        "group_b",
        F.size(union_bottom).cast("long").alias("n_union_sketch"),
        F.size(both).cast("long").alias("n_both"),
        F.round(
            F.size(both).cast("double") / F.size(union_bottom), 6
        ).alias("jaccard"),
    )


def countmin_cells(
    counts: DataFrame,
    term_col: str = "term",
    count_col: str = "n",
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Count-min sketch table from a (term, count) TYPE dimension: d
    seeded hash rows x w buckets; cell = total count of every term
    hashing there.  d*w rows total — broadcastable at any corpus size.
    Build it from pre-aggregated type counts, never the occurrence
    stream (the d-way explode then costs |vocab|*d, not |corpus|*d)."""
    if d < 1 or w < 1:
        raise ValueError(f"countmin: need d >= 1 and w >= 1, got d={d}, w={w}")
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    cells = counts.select(
        F.col(term_col).alias("_t"), F.col(count_col).alias("_n"), seeds
    ).select(
        "seed",
        F.pmod(
            _h60(F.concat_ws("|", F.col("seed"), F.col("_t"))), F.lit(w)
        ).alias("bucket"),
        "_n",
    )
    return cells.groupBy("seed", "bucket").agg(
        F.sum("_n").cast("long").alias("cell_count")
    )


def countmin_estimate(
    cells: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Point-query the sketch for each term in `terms`: estimate = min
    over the d rows of that term's cell — always >= the true count
    (collisions only ADD).  The cell table joins broadcast (d*w rows).
    A probe term whose cell was never populated gets the true CMS
    answer — 0 — not a dropped row (LEFT join + coalesce), so probing
    unseen terms (the decontamination shape) stays total."""
    probes = terms.select(
        term_col,
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed"),
    ).select(
        term_col,
        "seed",
        F.pmod(
            _h60(F.concat_ws("|", F.col("seed"), F.col(term_col))), F.lit(w)
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["seed", "bucket"], "left")
        .groupBy(term_col)
        .agg(
            F.min(F.coalesce("cell_count", F.lit(0)))
            .cast("long")
            .alias("cms_estimate")
        )
    )


def _corpus_words(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")


def countmin_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Heavy-hitter readout: CMS estimates beside exact counts for the
    exact top-`top_n` corpus terms (count desc, term asc — a
    deterministic integer order).  In production the sketch REPLACES the
    exact pass; grading both here makes the collision overestimate
    (cms_estimate >= exact, equality when a row is collision-free for
    that term) visible and oracle-checkable.

    Returns (term, exact_count, cms_estimate)."""
    counts = _corpus_words(docs, text_col).groupBy("term").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    cells = countmin_cells(
        counts, term_col="term", count_col="exact_count", d=d, w=w
    )
    top = counts.orderBy(F.desc("exact_count"), F.asc("term")).limit(top_n)
    est = countmin_estimate(cells, top.select("term"), d=d, w=w)
    return top.join(est, "term").select(
        "term",
        F.col("exact_count").cast("long").alias("exact_count"),
        "cms_estimate",
    )


def kmv_sample(
    df: DataFrame,
    group_cols: "list[str]",
    id_col: str,
    k: int = 256,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-group MERGEABLE uniform sample: the rows whose 60-bit id
    hashes are the k smallest in their group — a uniform sample without
    replacement (an ideal hash induces a uniform random permutation of
    the ids), with the same exact-merge property as the KMV sketch: the
    bottom-k of a union of shards is computable from the per-shard
    bottom-k alone, because a row ever discarded hashed above some
    current k-th minimum and can never re-enter.  That makes this the
    row-level sibling of `kmv_distinct` — per-shard samples union into
    the corpus sample without re-reading data, and the SAME rows are
    selected by every engine that can md5 (deterministic, so a sample
    drawn today merges with one drawn next month).

    Groups with fewer than k rows return entirely.  `id_col` must be
    unique per row (the usual doc_id contract); NULL ids are outside
    the sample domain.  Same two-phase per-bucket cut as kmv_distinct —
    no task holds more than a sort buffer.

    Returns the original columns plus nothing — the sample IS rows."""
    if k < 1 or n_buckets < 1:
        raise ValueError(
            f"kmv_sample: need k >= 1 and n_buckets >= 1, "
            f"got k={k}, n_buckets={n_buckets}"
        )
    hashed = df.withColumn(
        "_h", _h60(F.col(id_col).cast("string"))
    ).filter(F.col("_h").isNotNull())
    bucketed = hashed.withColumn("_b", F.pmod(F.col("_h"), F.lit(n_buckets)))
    w1 = Window.partitionBy(*group_cols, "_b").orderBy("_h", id_col)
    survivors = (
        bucketed.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_b", "_rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("_h", id_col)
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_h", "_rn")
    )


def kmv_quantiles(
    df: DataFrame,
    group_cols: "list[str]",
    id_col: str,
    value_col: str,
    quantiles: "list[float]" = (0.25, 0.5, 0.9, 0.99),
    k: int = 256,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-group quantile ESTIMATES from the `kmv_sample` uniform
    sample: exact interpolated (quantile_cont) quantiles of the k
    sampled values — rank-space error O(1/sqrt(k)) against the true
    population quantiles, in O(k) memory per group, mergeable across
    shards through the sample itself.  The sketch-tier sibling of
    `profile.source_percentiles` (exact, for when groups are bounded)
    and of engine-native percentile_approx (not cross-engine
    reproducible); this one is deterministic md5 math end-to-end, so
    two engines agree on the estimate bit-for-bit.

    Returns (group..., n_sample, q_<pct> ... one column per requested
    quantile, 6-dp)."""
    qs = list(quantiles)
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"kmv_quantiles: quantiles must be in [0,1], got {qs}")
    if len({_q_col_name(q) for q in qs}) != len(qs):
        raise ValueError(
            f"kmv_quantiles: duplicate quantiles in {qs} would collide "
            "in the output column names"
        )
    sample = kmv_sample(
        df.select(*group_cols, id_col, value_col),
        group_cols,
        id_col,
        k=k,
        n_buckets=n_buckets,
    )

    return sample.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sample"),
        *[
            F.round(
                F.percentile(F.col(value_col).cast("double"), F.lit(q)), 6
            ).alias(_q_col_name(q))
            for q in qs
        ],
    )


def _q_col_name(q: float) -> str:
    """Collision-free column name for a quantile: q_0_25 for 0.25, q_1
    for 1.0 (the leading '0.' is NOT stripped — stripping made 0.1 and
    1.0 both 'q_1', a round-7 review finding)."""
    return "q_" + f"{q:g}".replace(".", "_")
