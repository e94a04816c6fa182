"""Span-level dedup with reassembly: hand-built corpus with known shared
boilerplate — survivors keep document order, fully-duplicated docs empty."""

from __future__ import annotations

import pytest

from noaa_oracle_spark.pipeline.text import span_dedup

BOILER = "all rights reserved by us"  # 5 words → one exact span
UNIQUE_A = "alpha beta gamma delta epsi"
UNIQUE_B = "one two three four five"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, f"{UNIQUE_A} {BOILER}"),
        (2, f"{BOILER} {UNIQUE_B}"),
        (3, BOILER),  # nothing but boilerplate
        (4, "solo words never repeated anywhere"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_spans_dropped_unique_kept(docs):
    out = {r.doc_id: r for r in span_dedup(docs, span_words=5).collect()}
    assert out[1].clean_text == UNIQUE_A
    assert out[2].clean_text == UNIQUE_B
    assert out[3].clean_text == ""
    assert out[4].clean_text == "solo words never repeated anywhere"
    assert (out[1].n_spans, out[1].n_kept) == (2, 1)
    assert (out[3].n_spans, out[3].n_kept) == (1, 0)


def test_order_preserved_across_many_spans(spark):
    text = " ".join(f"w{i}" for i in range(40))  # 10 unique 4-word spans
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = span_dedup(docs, span_words=4).collect()[0]
    assert out.clean_text == text  # reassembly must not permute spans
    assert out.n_spans == out.n_kept == 10


def test_max_freq_threshold(spark):
    # span appears in 2 docs: kept at max_freq=2, dropped at max_freq=1
    rows = [(1, "x y z w"), (2, "x y z w"), (3, "p q r s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    strict = {r.doc_id: r.n_kept for r in span_dedup(docs, 4, 1).collect()}
    loose = {r.doc_id: r.n_kept for r in span_dedup(docs, 4, 2).collect()}
    assert strict == {1: 0, 2: 0, 3: 1}
    assert loose == {1: 1, 2: 1, 3: 1}
