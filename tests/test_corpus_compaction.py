"""Corpus compaction reuse: pipeline tables shredded into many small part
files are rewritten into few sorted files, and the dedup/ANN operators read
the compacted layout with IDENTICAL results — compaction is a pure layout
change (task counts and row-group stats move; values don't).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.sources.compaction import compact_table_dir

SF_DIR = "/root/testdata/sf0.001"


def _shredded(spark, tmp_path, table: str, n_parts: int) -> str:
    d = str(tmp_path / table)
    spark.read.parquet(f"{SF_DIR}/{table}.parquet").repartition(
        n_parts
    ).write.parquet(d)
    assert len(glob.glob(os.path.join(d, "part-*.parquet"))) == n_parts
    return d


@pytest.fixture(scope="module")
def corpus_dirs(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus_compact")
    return (
        _shredded(spark, tmp, "documents", 16),
        _shredded(spark, tmp, "embeddings", 16),
    )


def test_compaction_reduces_files_and_preserves_table(spark, corpus_dirs):
    docs_dir, emb_dir = corpus_dirs
    before = spark.read.parquet(docs_dir)
    rows_before = sorted(map(tuple, before.collect()))
    n = compact_table_dir(spark, docs_dir, sort_cols=("doc_id",))
    assert n == 1  # sf0.001 documents fit one 128 MB target file
    assert len(glob.glob(os.path.join(docs_dir, "part-*.parquet"))) == 1
    after = spark.read.parquet(docs_dir)
    assert after.schema == before.schema
    assert sorted(map(tuple, after.collect())) == rows_before
    # second pass: already compact → no-op
    assert compact_table_dir(spark, docs_dir, sort_cols=("doc_id",)) is None


def test_pipeline_queries_unchanged_over_compacted_layout(
    spark, corpus_dirs
):
    """The exact-dedup and ANN operators produce identical output reading
    the shredded layout and the compacted one."""
    from noaa_oracle_spark.pipeline.dedup import (
        exact_dedup,
        minhash_lsh_candidates,
    )
    from noaa_oracle_spark.pipeline.similarity import brute_force_knn

    docs_dir, emb_dir = corpus_dirs

    def snapshot():
        docs = spark.read.parquet(docs_dir)
        emb = spark.read.parquet(emb_dir)
        dedup = sorted(map(tuple, exact_dedup(docs).collect()))
        lsh = sorted(map(tuple, minhash_lsh_candidates(docs).collect()))
        knn = sorted(
            map(
                tuple,
                brute_force_knn(
                    emb.filter(F.col("vec_id") < 5), emb, k=3
                ).collect(),
            )
        )
        return dedup, lsh, knn

    before = snapshot()
    # documents may already be compacted by the prior test; embeddings not
    compact_table_dir(spark, docs_dir, sort_cols=("doc_id",))
    assert compact_table_dir(spark, emb_dir, sort_cols=("vec_id",)) == 1
    assert snapshot() == before


def test_sorted_layout_has_id_clustered_row_groups(spark, corpus_dirs):
    """The rewrite's sort is real: the single output file's row groups
    carry tight doc_id min/max ranges (the min/max-skipping payoff)."""
    import pyarrow.parquet as pq

    docs_dir, _ = corpus_dirs
    compact_table_dir(spark, docs_dir, sort_cols=("doc_id",))
    part = glob.glob(os.path.join(docs_dir, "part-*.parquet"))[0]
    md = pq.ParquetFile(part).metadata
    idx = md.schema.to_arrow_schema().get_field_index("doc_id")
    prev_max = -1
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        assert st.min > prev_max  # non-overlapping, ascending ranges
        prev_max = st.max
