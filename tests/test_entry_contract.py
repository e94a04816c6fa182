"""Driver-contract invariants for __spark_entry__ — the things that, if
broken, silently cost a round of grading (the round-1 lesson: insertion
order decides which 50 queries the driver grades)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(os_)


def test_grade_first_names_resolve_and_lead():
    qs = list(entry.queries())
    gf = entry._GRADE_FIRST
    assert len(gf) == len(set(gf)), "duplicate names in _GRADE_FIRST"
    assert qs[: len(gf)] == gf, "_GRADE_FIRST must be the exact prefix"


def test_priority_queries_fit_the_graded_window():
    """The driver grades queries()[:50]; every name placed in
    _GRADE_FIRST must actually land inside that window."""
    assert len(entry._GRADE_FIRST) <= 50


def test_callables_and_sql_are_wellformed():
    qs, os_ = entry.queries(), entry.oracle_sql()
    for name, fn in qs.items():
        assert callable(fn), name
        sql = os_[name]
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_grading_window_staleness():
    """Rotation hygiene (r4 verdict ask #9): after this round's window is
    graded, no query may be more than 2 rounds stale.

    Last-graded rounds are computed from the committed CORRECTNESS_r0N.json
    records (the driver's own output), so this test red-flags a window plan
    that would let any name age out — window planning no longer depends on
    judge memory.  A name with no record yet MUST be in the window (it is
    new and ungraded)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_graded: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            # only a GREEN row counts as graded (r5 advice: a red row must
            # age the name toward mandatory re-grading, not reset its clock)
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                last_graded[name] = max(last_graded.get(name, 0), rnd)

    window = set(entry._GRADE_FIRST[:50])
    cur = entry._CURRENT_ROUND
    stale = []
    for name in entry.queries():
        effective = cur if name in window else last_graded.get(name)
        if effective is None:
            stale.append((name, "never graded and not in window"))
        elif effective < cur - 2:
            stale.append((name, f"last graded r{effective}, budget r{cur - 2}"))
    assert not stale, f"staleness budget exceeded: {stale}"


def test_no_query_modified_since_grade():
    """Modified-since-grade drift detection (r5 verdict "what's wrong" #1:
    q106/q107 changed after their r4 driver grade and the round-age test
    could not see it).  GRADE_HASHES.json records a sha256 over each gate
    query's callable source + oracle SQL as of the round it was last put
    in a grading window; any non-window query whose current hash differs
    was edited after its grade — put it back in the window front and run
    ``python -m noaa_oracle_spark.grade_hashes`` to refresh the ledger."""
    from noaa_oracle_spark import grade_hashes

    ledger = grade_hashes.load_ledger()
    assert ledger, "GRADE_HASHES.json missing — run python -m noaa_oracle_spark.grade_hashes --all"
    current = grade_hashes.current_hashes()
    window = set(entry._GRADE_FIRST[:50])
    drifted = []
    for name, h in current.items():
        recorded = ledger.get(name)
        if recorded == h:
            continue
        if name in window:
            # r6 verdict ask #9: the ledger is only as good as its refresh
            # discipline — an edited/new WINDOW name must have its hash
            # re-recorded in the SAME commit, or the post-grade drift
            # check above has nothing trustworthy to compare against.
            drifted.append(
                (name, "window name not refreshed — run "
                 "python -m noaa_oracle_spark.grade_hashes")
            )
        elif recorded is None:
            drifted.append((name, "no recorded hash and not in window"))
        else:
            drifted.append((name, "source or oracle changed since last grade"))
    assert not drifted, f"ledger drift: {drifted}"
