"""Whole-suite physical-plan audit: no query may silently regress into a
plan shape that dies at scale.

Pinned invariants, for every `queries()` entry:
  - no CartesianProduct (an unkeyed join that went quadratic);
  - no BatchEvalPython (a row-at-a-time Python UDF in the plan — Arrow
    batched `ArrowEvalPython`/`mapInPandas` remain allowed);
  - no SortAggregate (a min/max/first over a var-length or struct type
    fell out of hash aggregation and sorts its whole input — the exact
    regression class fixed for the MinHash/winnowing/nearest-site
    operators; ObjectHashAggregate for collect_*/percentile is fine).

Plans are built at sf0.001 — analysis only, nothing is executed (except
q38's driver-side components loop, which its own oracle test covers)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from tests.conftest import SF_DIR

FORBIDDEN = ("CartesianProduct", "BatchEvalPython", "SortAggregate")

# Iterative queries execute jobs while *building* their result (driver
# union-find loop); their final-stage plan is still audited.
_ALL = sorted(entrymod.queries())


@pytest.mark.parametrize("name", _ALL)
def test_no_forbidden_operators(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [op for op in FORBIDDEN if op in plan]
    assert not hits, f"{name}: forbidden physical operators {hits}"
