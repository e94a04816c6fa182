"""connected_components: crafted graph shapes — a long chain (forces
multiple propagation rounds), a cycle, a singleton, and two components that
must NOT merge — on ALL THREE execution paths (driver union-find, the
distributed min-propagation loop, and the distributed two-phase
large-star/small-star), plus a round-count assertion showing the star
algorithm's diameter-independence on a long chain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.dedup import connected_components

# (driver_edge_threshold, algorithm): threshold 0 forces a distributed
# path, the huge threshold forces the driver union-find
PATHS = [(0, "star"), (0, "propagate"), (10**9, "auto")]


def _run(spark, n_nodes, edges, threshold, algorithm="auto", stats=None):
    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(
        nodes,
        e,
        driver_edge_threshold=threshold,
        algorithm=algorithm,
        stats=stats,
    ).collect()
    return {r.doc_id: r.component for r in rows}


@pytest.mark.parametrize("threshold,algorithm", PATHS)
def test_chain_cycle_singleton(spark, threshold, algorithm):
    # chain 0-1-2-3-4 (diameter 4), cycle 5-6-7-5, singleton 8, pair 9-10
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4),
        (5, 6), (6, 7), (7, 5),
        (9, 10),
    ]
    got = _run(spark, 11, edges, threshold, algorithm)
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in (5, 6, 7)} == {5}
    assert got[8] == 8
    assert got[9] == got[10] == 9


@pytest.mark.parametrize("threshold,algorithm", PATHS)
def test_reverse_chain_converges(spark, threshold, algorithm):
    # worst case for min-propagation: min id at the FAR end of the chain
    edges = [(i, i + 1) for i in range(19)]
    got = _run(spark, 20, edges, threshold, algorithm)
    assert set(got.values()) == {0}


def test_paths_agree_on_random_graph(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 60, size=(80, 2))
        if a != b
    ]
    star = _run(spark, 60, edges, 0, "star")
    prop = _run(spark, 60, edges, 0, "propagate")
    uf = _run(spark, 60, edges, 10**9)
    assert star == prop == uf


def test_star_rounds_diameter_independent(spark):
    """The reason the star algorithm exists: on a diameter-39 chain,
    min-propagation needs ~diameter rounds while large-star/small-star
    collapses it in O(log^2 n) — assert the measured gap, not just the
    asymptotic claim."""
    edges = [(i, i + 1) for i in range(39)]
    s_star: dict = {}
    s_prop: dict = {}
    star = _run(spark, 40, edges, 0, "star", s_star)
    prop = _run(spark, 40, edges, 0, "propagate", s_prop)
    assert star == prop
    assert set(star.values()) == {0}
    assert s_star["path"] == "two_phase_star"
    assert s_prop["path"] == "propagate"
    assert s_prop["rounds"] >= 39  # one hop of label movement per round
    assert s_star["rounds"] <= 10  # geometric path-halving
    assert s_star["rounds"] < s_prop["rounds"] / 3


def test_driver_path_reports_stats(spark):
    s: dict = {}
    _run(spark, 4, [(0, 1), (2, 3)], 10**9, "auto", s)
    assert s == {"rounds": 0, "path": "driver_union_find"}
