"""connected_components: crafted graph shapes — a long chain (forces
multiple propagation rounds), a cycle, a singleton, and two components that
must NOT merge — on BOTH execution paths (driver union-find and the
distributed min-propagation loop).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.dedup import connected_components

# threshold 0 forces the distributed loop; the huge threshold forces the
# driver union-find
PATHS = [0, 10**9]


def _run(spark, n_nodes, edges, threshold):
    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(
        nodes, e, driver_edge_threshold=threshold
    ).collect()
    return {r.doc_id: r.component for r in rows}


@pytest.mark.parametrize("threshold", PATHS)
def test_chain_cycle_singleton(spark, threshold):
    # chain 0-1-2-3-4 (diameter 4), cycle 5-6-7-5, singleton 8, pair 9-10
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4),
        (5, 6), (6, 7), (7, 5),
        (9, 10),
    ]
    got = _run(spark, 11, edges, threshold)
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in (5, 6, 7)} == {5}
    assert got[8] == 8
    assert got[9] == got[10] == 9


@pytest.mark.parametrize("threshold", PATHS)
def test_reverse_chain_converges(spark, threshold):
    # worst case for min-propagation: min id at the FAR end of the chain
    edges = [(i, i + 1) for i in range(19)]
    got = _run(spark, 20, edges, threshold)
    assert set(got.values()) == {0}


def test_paths_agree_on_random_graph(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 60, size=(80, 2))
        if a != b
    ]
    a = _run(spark, 60, edges, 0)
    b = _run(spark, 60, edges, 10**9)
    assert a == b
