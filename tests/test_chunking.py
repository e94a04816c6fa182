"""Training-window chunking: stride/overlap arithmetic, full coverage,
short-doc behavior, and the no-shuffle plan guarantee."""

from __future__ import annotations

import pytest

from noaa_oracle_spark.pipeline.text import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    long_text = " ".join(f"t{i}" for i in range(50))
    return spark.createDataFrame(
        [(1, long_text), (2, "a b c"), (3, " ".join(f"u{i}" for i in range(16)))],
        "doc_id long, text string",
    )


def test_stride_overlap_and_tail(docs):
    out = sorted(
        (r for r in chunk_documents(docs, 16, 4).collect() if r.doc_id == 1),
        key=lambda r: r.chunk_idx,
    )
    # 50 tokens, chunk 16, stride 12 → starts 0,12,24,36 → 4 chunks
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in out] == [16, 16, 16, 14]
    words = [r.chunk_text.split(" ") for r in out]
    for a, b in zip(words, words[1:]):
        assert a[-4:] == b[:4]  # consecutive chunks share exactly `overlap`
    # every source token covered, in order
    reassembled = words[0] + sum((w[4:] for w in words[1:]), [])
    assert reassembled == [f"t{i}" for i in range(50)]


def test_short_docs_single_chunk(docs):
    rows = {r.doc_id: r for r in chunk_documents(docs, 16, 4).collect()
            if r.doc_id in (2, 3)}
    assert rows[2].n_chunk_tokens == 3 and rows[2].chunk_idx == 0
    assert rows[3].n_chunk_tokens == 16 and rows[3].chunk_idx == 0


def test_overlap_validation(docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, 8, 8)


def test_no_shuffle(docs):
    plan = (
        chunk_documents(docs, 16, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
