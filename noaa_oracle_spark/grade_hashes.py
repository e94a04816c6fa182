"""Source-hash ledger for grading-window drift detection.

Round-5 judge finding ("what's wrong" #1): q106/q107 were modified AFTER
their last driver grade, so the green CORRECTNESS rows no longer described
the shipped code — and the round-age staleness test could not see it.
This module closes that gap: ``GRADE_HASHES.json`` (repo root) records,
per gate query, a sha256 over the query callable's source
(``inspect.getsource``) plus its DuckDB oracle SQL, taken when the name
was last placed in a grading window (i.e. the code the driver graded).

``tests/test_entry_contract.py::test_no_query_modified_since_grade``
fails when a query NOT in the current window drifts from its recorded
hash — the fix is to put the name back in the window front and refresh
the ledger with ``python -m noaa_oracle_spark.grade_hashes``.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

LEDGER_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "GRADE_HASHES.json",
)


def query_hash(fn, sql: str) -> str:
    """Hash the graded surface of one gate query: its top-level callable's
    source and its oracle SQL.  Helper-function drift is out of scope by
    design (the judge's suggested granularity, VERDICT r5 "what's wrong"
    #1); direct edits to either graded artifact are what bit us."""
    src = inspect.getsource(fn)
    return hashlib.sha256(src.encode() + b"\x00" + sql.encode()).hexdigest()


def current_hashes() -> dict[str, str]:
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    return {name: query_hash(fn, oracles[name]) for name, fn in qs.items()}


def load_ledger() -> dict[str, str]:
    if not os.path.exists(LEDGER_PATH):
        return {}
    with open(LEDGER_PATH) as f:
        return json.load(f)


def refresh(window_only: bool = True) -> dict[str, str]:
    """Update the ledger: window names (about to be graded this round) get
    their current hash; other names keep their recorded one.  With
    ``window_only=False`` every name is re-recorded (initialisation)."""
    import __spark_entry__ as entry

    ledger = load_ledger()
    cur = current_hashes()
    window = set(entry._GRADE_FIRST[:50])
    for name, h in cur.items():
        if not window_only or name in window or name not in ledger:
            ledger[name] = h
    ledger = {k: ledger[k] for k in sorted(ledger)}
    with open(LEDGER_PATH, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    return ledger


if __name__ == "__main__":
    import sys

    window_only = "--all" not in sys.argv
    out = refresh(window_only=window_only)
    print(f"GRADE_HASHES.json: {len(out)} entries recorded")
