"""Corpus profiling operators — the distribution readouts a 100 TB ingest
monitors per shard/source before any training run: exact length
percentiles per source and length-bucketed batch assignment with padding
-waste accounting (the dynamic-batching diagnostic: sorting documents by
length before batching is what keeps pad-token waste low, and this
operator quantifies exactly how much a batch plan wastes).

Scale shapes:
  - `source_percentiles` is one groupBy over a low-cardinality source
    dimension; Spark's exact `percentile` aggregate is a per-group
    in-memory digest whose size is bounded by per-source distinct
    lengths, not corpus rows (for truly unbounded groups, swap in
    `percentile_approx` — same call shape).
  - `length_batches` needs a GLOBAL rank, which must NOT be an
    empty-partition window (one task would sort the corpus); it uses the
    same two-pass range-partition discipline as
    `text.ranked_word_frequencies`, generalized here as `global_rank`:
    range-partition on the sort keys, local row_number per partition,
    then add broadcast per-partition offsets (<= n_parts rows ever reach
    the driver).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank(
    df: DataFrame,
    order: "list[Column]",
    n_parts: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Scale-safe global row_number over arbitrary sort keys.

    Two passes: (1) `repartitionByRange` on the keys + per-partition
    row_number (each task sorts only its range slice); (2) per-partition
    counts — at most `n_parts` rows — are collected, prefix-summed on
    the driver, and broadcast back as offsets.  Equivalent to
    `row_number() OVER (ORDER BY ...)` without serializing the dataset
    through a single task.

    Correctness contract: the two passes evaluate `df` INDEPENDENTLY
    (the counts collect is its own job), so the whole input FRAME — not
    just the sort keys — must be deterministic under recomputation: no
    `sample()` without a seed, no re-listed growing directory, no
    stream-backed frame (a frame that changes between the jobs would
    pair offsets from one partitioning with row_numbers from another —
    duplicate/skipped ranks with no error).  The sort keys must also be
    total (include a unique id as the last key).  Cost note: the
    upstream subtree is computed twice; callers with an expensive
    upstream that control caching may persist it first — a gate query
    cannot (the run-twice protocol would grade cache reads, the q68
    lesson)."""
    parts = df.repartitionByRange(n_parts, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order)),
    )
    counts = sorted(
        (r["_pid"], r["c"])
        for r in local.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    )  # <= n_parts rows — small by construction
    offsets, running = [], 0
    for pid, c in counts:
        offsets.append((pid, running))
        running += c
    off = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    return (
        local.join(F.broadcast(off), "_pid")
        .withColumn(rank_col, F.col("_off") + F.col("_rn"))
        .drop("_pid", "_rn", "_off")
    )


def source_percentiles(
    docs: DataFrame,
    ps: "tuple[float, ...]" = (0.25, 0.5, 0.9, 0.99),
    value_col: str = "n_chars",
) -> DataFrame:
    """Per-source exact length percentiles (linear interpolation — the
    quantile_cont definition both engines share), plus doc and char
    totals.  The per-source length profile is the first thing a corpus
    curator reads: a source whose p99 is 100x its p50 needs chunking; a
    source whose p25 is near zero needs a min-length filter.  Percentile
    values round at 6 dp (cross-engine float rule).

    Returns (source, n_docs, total_chars, p25, p50, p90, p99)."""
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(value_col).cast("long").alias("total_chars"),
        F.percentile(
            F.col(value_col), F.array(*[F.lit(p) for p in ps])
        ).alias("_q"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_chars",
        *[
            F.round(F.col("_q")[i], 6).alias(f"p{int(p * 100)}")
            for i, p in enumerate(ps)
        ],
    )


def length_batches(
    docs: DataFrame, batch_size: int = 32, n_parts: int = 32
) -> DataFrame:
    """Length-bucketed batch assignment + padding-waste accounting: rank
    every document globally by (length asc, id asc), cut the ranked
    stream into fixed-size batches, and report per batch how many pad
    characters a max-length-padded batch would carry (`pad_waste =
    max*count - sum`).  Summing pad_waste across batches is the metric
    dynamic batching minimizes — computed here exactly, at scale, with
    no single-task sort (see `global_rank`).

    Returns (batch_id, n_docs, min_chars, max_chars, sum_chars,
    pad_waste)."""
    ranked = global_rank(
        docs.select("doc_id", "n_chars"),
        [F.asc("n_chars"), F.asc("doc_id")],
        n_parts=n_parts,
    )
    batches = ranked.withColumn(
        "batch_id",
        F.floor((F.col("rank") - 1) / F.lit(batch_size)).cast("long"),
    )
    return (
        batches.groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .select(
            "batch_id",
            "n_docs",
            "min_chars",
            "max_chars",
            "sum_chars",
            (F.col("max_chars") * F.col("n_docs") - F.col("sum_chars"))
            .cast("long")
            .alias("pad_waste"),
        )
    )
