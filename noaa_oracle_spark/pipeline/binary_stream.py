"""Shared streaming binaryFile reader for the container streaming twins
(webdataset shards, WARC crawl shards): Structured Streaming's file
source needs the schema up front (binaryFile's is fixed by the format),
takes a DIRECTORY whose ledger tracks new files, and selects files with
pathGlobFilter — boilerplate that must stay identical across twins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def stream_binary_files(
    spark: SparkSession,
    path: str,
    glob: str,
    max_files_per_trigger: "int | None" = None,
) -> DataFrame:
    """Streaming (path, content) over files arriving under `path` that
    match `glob`; each microbatch carries only the ledger's new files."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path).select("path", "content")
