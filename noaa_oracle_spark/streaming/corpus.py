"""Streaming corpus ingestion: the training-data pipeline's dedup gate as
a Structured Streaming stage, so documents arriving from a crawl land
already exact-deduped instead of requiring a batch re-pass.

Mirrors the batch operator (pipeline.dedup.exact_dedup) semantics: first
arrival of a text hash wins; later identical texts are dropped. State is
the hash set, kept in the state store:

  - with an event-time column, `dropDuplicatesWithinWatermark` bounds the
    state to the watermark horizon — the ONLY viable shape for an
    unbounded 100 TB/day feed (a crawl re-fetching a page weeks later is
    a new observation, not a duplicate worth state).
  - without one, plain `dropDuplicates` state grows forever — acceptable
    only for bounded backfills; callers get the watermark path by naming
    `ts_col`.

Reference kin: the batch operator q16 gates; the reference engine has no
streaming path at all (its daemon re-reads whole snapshot files hourly) —
this is one of the capabilities Spark adds outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
        T.StructField("ingest_ts", T.TimestampType(), True),
    ]
)


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """File-source document stream (one parquet drop per crawl batch).
    maxFilesPerTrigger keeps microbatches bounded so a backlog of crawl
    files cannot produce one giant batch."""
    return (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup on md5(text) across microbatches.

    The hash column (not the full text) is the dedup key, so state store
    entries are 32 hex chars regardless of document size — the same
    hash-not-payload rule as the batch dedup ladder."""
    keyed = docs.withColumn("text_hash", F.md5(F.col(text_col)))
    if ts_col is not None:
        return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["text_hash"]
        )
    return keyed.dropDuplicates(["text_hash"])
