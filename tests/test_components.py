"""connected_components: crafted graph shapes — a long chain (forces
multiple propagation rounds), a cycle, a singleton, and two components that
must NOT merge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.dedup import connected_components


def _run(spark, n_nodes, edges):
    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(nodes, e).collect()
    return {r.doc_id: r.component for r in rows}


def test_chain_cycle_singleton(spark):
    # chain 0-1-2-3-4 (diameter 4), cycle 5-6-7-5, singleton 8, pair 9-10
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4),
        (5, 6), (6, 7), (7, 5),
        (9, 10),
    ]
    got = _run(spark, 11, edges)
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in (5, 6, 7)} == {5}
    assert got[8] == 8
    assert got[9] == got[10] == 9


def test_reverse_chain_converges(spark):
    # worst case for min-propagation: min id at the FAR end of the chain
    edges = [(i, i + 1) for i in range(19)]
    got = _run(spark, 20, edges)
    assert set(got.values()) == {0}
