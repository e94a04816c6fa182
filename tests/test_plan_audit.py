"""Whole-suite physical-plan audit: no query may silently regress into a
plan shape that dies at scale.

Pinned invariants, for every `queries()` entry:
  - no CartesianProduct (an unkeyed join that went quadratic);
  - no BatchEvalPython (a row-at-a-time Python UDF in the plan — Arrow
    batched `ArrowEvalPython`/`mapInPandas` remain allowed);
  - no SortAggregate (a min/max/first over a var-length or struct type
    fell out of hash aggregation and sorts its whole input — the exact
    regression class fixed for the MinHash/winnowing/nearest-site
    operators; ObjectHashAggregate for collect_*/percentile is fine);
  - no empty-partition-spec WindowExec over unbounded input (Spark plans
    `Window.orderBy(...)` with no partitionBy by moving EVERY row to ONE
    task — "No Partition Defined for Window operation" is the engine's
    own warning; at corpus scale that serializes the operator onto a
    single core). A global window is legal only when its input is
    k-bounded by construction: a GlobalLimit / TakeOrderedAndProject /
    CollectLimit in its subtree (the post-limit rank shape of
    q08_topk_customers). The one contract exemption is the geo
    broadcast-site registry (operators/geo.py — the site side must be
    broadcastable by the operator's documented contract, so its
    row_number registry window is bounded the same way a broadcast is).

Plans are built at sf0.001 — analysis only, nothing is executed (except
q38's driver-side components loop and q99/q102's two-pass prefix-sum
bucket-totals collect, each covered by its own oracle test)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from tests.conftest import SF_DIR

FORBIDDEN = ("CartesianProduct", "BatchEvalPython", "SortAggregate")

# Queries whose empty-partition window is bounded by an operator CONTRACT
# rather than by a limit node in the plan (geo.py's broadcast-registry
# row_number — input must be broadcastable for the operator to work at
# all, so the window is k-bounded the same way the broadcast is).
_GLOBAL_WINDOW_EXEMPT = {"q65_nearest_station"}

_LIMIT_NODES = ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")

# Iterative queries execute jobs while *building* their result (driver
# union-find loop); their final-stage plan is still audited.
_ALL = sorted(entrymod.queries())


def _iter_plan(jnode):
    """DFS over a JVM SparkPlan tree, unwrapping AQE wrapper leaves."""
    stack = [jnode]
    while stack:
        n = stack.pop()
        yield n
        if n.nodeName() == "AdaptiveSparkPlan":
            # AdaptiveSparkPlanExec is a leaf node; audit its initial plan.
            stack.append(n.initialPlan())
            continue
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def _subtree_has_limit(jnode) -> bool:
    return any(c.nodeName() in _LIMIT_NODES for c in _iter_plan(jnode))


def _unbounded_global_windows(jplan) -> list[str]:
    hits = []
    for n in _iter_plan(jplan):
        if n.nodeName() != "Window":
            continue
        if not n.partitionSpec().isEmpty():
            continue
        if not _subtree_has_limit(n):
            hits.append(n.simpleStringWithNodeId())
    return hits


@pytest.mark.parametrize("name", _ALL)
def test_no_forbidden_operators(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    hits = [op for op in FORBIDDEN if op in plan]
    assert not hits, f"{name}: forbidden physical operators {hits}"
    if name not in _GLOBAL_WINDOW_EXEMPT:
        windows = _unbounded_global_windows(qe.executedPlan())
        assert not windows, (
            f"{name}: empty-partition WindowExec over unbounded input "
            f"(single-task shuffle of the whole relation): {windows}"
        )
