"""Streaming mergeable sketches — the incremental form of the batch
sketch tier (pipeline/sketches.py).

A bottom-k (KMV) sketch is mergeable by construction: the k smallest of
everything-seen equals the k smallest of (previous bottom-k ∪ the new
batch), because any hash ever discarded was larger than the current
k-th minimum and can never re-enter the bottom.  That identity makes
the streaming form exact — after any sequence of microbatches the
state equals the batch sketch over the union of their rows, which
`tests/test_streaming_sketches.py` asserts against
`pipeline.sketches.kmv_distinct` on the same data.

State per group is EXACTLY k longs — cardinality state does not grow
with the stream and never needs eviction (contrast the dedup operators,
whose per-key state is bounded only by a watermark TTL), so the kernel
runs with NoTimeout.

Count-min needs no custom operator in streaming: its cells are a plain
(seed, bucket) SUM, which Structured Streaming's native update-mode
aggregation already maintains incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the batch tier's hash idiom and normalization constant — imported, not
# re-implemented, so the streaming==batch equality cannot silently break
from noaa_oracle_spark.pipeline.sketches import _TWO60, _h60

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType(), False),
        T.StructField("n_sketch", T.LongType(), False),
        T.StructField("kmv_distinct", T.DoubleType(), False),
    ]
)

_KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("hashes", T.ArrayType(T.LongType()), False)]
)


def _round6_half_up(x: float) -> float:
    """Spark's F.round on DOUBLE is BigDecimal HALF_UP over the double's
    SHORTEST DECIMAL REPR (BigDecimal.valueOf semantics — see
    pipeline/rounding.py for the measurement); Python's round() is
    banker's.  Quantizing Decimal(repr(x)) reproduces Spark's result
    bit-for-bit, which is what makes the streaming estimate EQUAL the
    batch one."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _make_kmv_kernel(k: int):
    def kernel(key, pdfs, state):
        import pandas as pd

        hs = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            hs.update(int(h) for h in pdf["_h"])
        bottom = sorted(hs)[:k]
        state.update((bottom,))
        if len(bottom) < k:
            est = float(len(bottom))
        else:
            # same integer hash math as the batch estimator; Python and
            # Spark doubles are both IEEE-754, and the HALF_UP quantize
            # matches F.round, so the value equals the batch expression
            # bit-for-bit
            est = _round6_half_up(
                (k - 1) * _TWO60 / (float(bottom[-1]) + 1.0)
            )
        yield pd.DataFrame(
            [
                {
                    "group": key[0],
                    "n_sketch": len(bottom),
                    "kmv_distinct": est,
                }
            ]
        )

    return kernel


def streaming_kmv_distinct(
    elements: DataFrame,
    group_col: str,
    element_col: str,
    k: int = 256,
) -> DataFrame:
    """Running per-group distinct-count estimate over a stream: emits the
    group's CURRENT (n_sketch, kmv_distinct) every microbatch the group
    appears in (update semantics — read the latest row per group).

    `elements` is a streaming frame; `element_col` is hashed with the
    suite-wide 60-bit md5 idiom, so the running estimate converges to
    exactly what the batch `kmv_distinct` computes over the union of all
    microbatches (mergeability, equality-tested).

    Scale shape: the per-batch shuffle carries only this batch's
    (group, hash) pairs; state is k longs per group forever — the reason
    sketches exist is that this is the ENTIRE memory cost of a
    cardinality readout over an unbounded stream."""
    if k < 2:
        raise ValueError(f"streaming_kmv_distinct: need k >= 2, got {k}")
    hashed = elements.select(
        F.col(group_col).cast("string").alias("group"),
        _h60(F.col(element_col)).alias("_h"),
    ).filter(F.col("_h").isNotNull())  # NULL ∉ sketch domain (batch rule)
    return hashed.groupBy("group").applyInPandasWithState(
        _make_kmv_kernel(k),
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def streaming_countmin_cells(
    elements: DataFrame,
    term_col: str,
    count_col: "str | None" = None,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Streaming count-min sketch table: the running (seed, bucket) →
    cell_count over everything the stream has delivered (update
    semantics — read the latest row per cell).

    Unlike KMV this needs NO custom stateful kernel: a CMS cell is a
    plain sum, and sums are what Structured Streaming's native
    update-mode aggregation maintains incrementally — the mergeability
    of the sketch IS the associativity of addition.  State is d*w cells
    total (not per group, not per term), the same fixed footprint the
    batch table has, so the readout over an unbounded term stream costs
    constant memory by construction.

    `elements` is the raw occurrence stream (one row per term
    occurrence), or a pre-counted stream when `count_col` is given; the
    cells equal `pipeline.sketches.countmin_cells` over the union of
    all microbatches either way because the batch build from the term-
    TYPE dimension and the streaming build from occurrences sum the
    same integers, just in different groupings (equality-tested in
    tests/test_streaming_sketches.py).  Same seeded-hash idiom —
    `_h60(concat_ws('|', seed, term))` — imported from the batch tier
    so the two tables can never drift."""
    if d < 1 or w < 1:
        raise ValueError(f"streaming_countmin: need d >= 1 and w >= 1, got d={d}, w={w}")
    weight = (
        F.col(count_col).cast("long") if count_col else F.lit(1).cast("long")
    )
    # NO NULL-term filter: the batch tier hashes concat_ws('|', seed,
    # term), and concat_ws SKIPS NULLs — a NULL term lands in the
    # seed-only cell there, so the streaming twin must send it to the
    # same cell or the claimed cell equality breaks (round-7 review
    # finding)
    cells = elements.select(
        F.col(term_col).cast("string").alias("_t"),
        weight.alias("_n"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed"),
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


SAMPLE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

_SAMPLE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.LongType()), False),
        T.StructField("ids", T.ArrayType(T.LongType()), False),
        T.StructField("values", T.ArrayType(T.DoubleType()), True),
    ]
)


def _make_sample_kernel(k: int):
    def kernel(key, pdfs, state):
        import math

        import pandas as pd

        # pool keyed by (hash, id) — NOT hash alone: two distinct ids
        # with colliding hashes must both survive, in the batch twin's
        # (_h, id) tie order (round-7 review finding; 2^-60 per pair,
        # but the batch kernel explicitly orders the tie)
        if state.exists:
            hs, ids, vals = state.get
            pool = {
                (int(h), int(i)): (
                    None
                    if v is None or (isinstance(v, float) and math.isnan(v))
                    else float(v)
                )
                for h, i, v in zip(hs, ids, vals)
            }
        else:
            pool = {}
        for pdf in pdfs:
            for h, i, v in zip(pdf["_h"], pdf["id"], pdf["value"]):
                pool[(int(h), int(i))] = None if pd.isna(v) else float(v)
        bottom = sorted(pool)[:k]
        state.update(
            (
                [h for h, _ in bottom],
                [i for _, i in bottom],
                [pool[key_] for key_ in bottom],
            )
        )
        yield pd.DataFrame(
            {
                "group": key[0],
                "id": [i for _, i in bottom],
                "value": [pool[key_] for key_ in bottom],
            }
        )

    return kernel


def streaming_kmv_sample(
    elements: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Streaming twin of `pipeline.sketches.kmv_sample`: the per-group
    bottom-k-by-id-hash uniform sample, maintained incrementally — each
    microbatch emits the group's CURRENT sample rows (update semantics;
    the latest emission per group IS the sample, equal to the batch
    sample over the union of everything delivered, the same
    irreversible-discard argument as streaming KMV).  State is exactly
    k (hash, id, value) triples per group, NoTimeout — a bounded uniform
    sample (and through it, quantile estimates) over an unbounded
    stream.  `value_col` is cast to double (the quantile use case);
    duplicate ids re-deliver their latest value rather than widening the
    sample (at-least-once replay stays idempotent)."""
    if k < 1:
        raise ValueError(f"streaming_kmv_sample: need k >= 1, got {k}")
    hashed = elements.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(id_col).cast("long").alias("id"),
        F.col(value_col).cast("double").alias("value"),
        _h60(F.col(id_col).cast("string")).alias("_h"),
    ).filter(F.col("_h").isNotNull())
    return hashed.groupBy("group").applyInPandasWithState(
        _make_sample_kernel(k),
        outputStructType=SAMPLE_OUTPUT_SCHEMA,
        stateStructType=_SAMPLE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
