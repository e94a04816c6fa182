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

_TWO60 = float(1 << 60)

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
            # Spark doubles are both IEEE-754, so the value matches the
            # batch expression bit-for-bit before the final rounding
            est = round((k - 1) * _TWO60 / (float(bottom[-1]) + 1.0), 6)
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
    hashed = elements.select(
        F.col(group_col).cast("string").alias("group"),
        F.conv(F.substring(F.md5(F.col(element_col)), 1, 15), 16, 10)
        .cast("long")
        .alias("_h"),
    ).filter(F.col("_h").isNotNull())  # NULL ∉ sketch domain (batch rule)
    return hashed.groupBy("group").applyInPandasWithState(
        _make_kmv_kernel(k),
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
