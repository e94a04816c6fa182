"""asof_join: randomized equivalence against pandas.merge_asof (backward,
inclusive, by-key) — an independent reference implementation of the same
semantics the DuckDB ASOF LEFT JOIN oracle checks at the gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from noaa_oracle_spark.operators.asof import asof_join


def _random_frames(seed: int, n_left: int = 300, n_right: int = 200):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "key": rng.integers(0, 8, n_left),
            "ts": rng.integers(0, 10_000, n_left),
            "lid": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "key": rng.integers(0, 8, n_right),
            "ts": rng.integers(0, 10_000, n_right),
            "rid": np.arange(n_right),
            "payload": rng.random(n_right).round(6),
        }
    )
    # operator contract: right unique per (key, ts) — keep max rid
    right = (
        right.sort_values("rid")
        .drop_duplicates(["key", "ts"], keep="last")
        .reset_index(drop=True)
    )
    return left, right


def test_asof_matches_pandas(spark):
    for seed in (0, 1, 7):
        left, right = _random_frames(seed)
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                keys=["key"],
                left_ts="ts",
                right_ts="ts",
                right_cols=["rid", "payload"],
            )
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        expected = pd.merge_asof(
            left.sort_values(["ts", "lid"]),
            right.sort_values("ts"),
            on="ts",
            by="key",
            direction="backward",
            allow_exact_matches=True,
        ).sort_values("lid").reset_index(drop=True)
        assert list(got["lid"]) == list(expected["lid"])
        assert got["r_rid"].fillna(-1).tolist() == expected["rid"].fillna(-1).tolist(), seed
        assert got["r_payload"].fillna(-1).tolist() == expected["payload"].fillna(-1).tolist()


def test_asof_no_preceding_row_is_null(spark):
    left = pd.DataFrame({"key": [1], "ts": [5], "lid": [0]})
    right = pd.DataFrame({"key": [1], "ts": [9], "rid": [0], "payload": [1.0]})
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        keys=["key"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["rid"],
    ).collect()
    assert len(got) == 1 and got[0]["r_rid"] is None


def test_binned_range_join_matches_naive(spark):
    """Randomized boundary check for operators/rangejoin.py: bin edges are
    the classic off-by-one trap, so the generator lands many timestamps
    exactly ON multiples of the window."""
    import numpy as np

    from noaa_oracle_spark.operators.rangejoin import binned_range_join

    rng = np.random.default_rng(3)
    w = 100
    l_ts = np.concatenate(
        [rng.integers(0, 2000, 150), rng.integers(0, 20, 30) * w]
    )
    r_ts = np.concatenate(
        [rng.integers(0, 2000, 150), rng.integers(0, 20, 30) * w]
    )
    left = spark.createDataFrame(
        [(int(i), int(t)) for i, t in enumerate(l_ts)], "lid long, l_us long"
    )
    right = spark.createDataFrame(
        [(int(i), int(t)) for i, t in enumerate(r_ts)], "rid long, r_us long"
    )
    got = {
        (r.lid, r.rid)
        for r in binned_range_join(left, right, "l_us", "r_us", w).collect()
    }
    expected = {
        (li, ri)
        for li, lt in enumerate(l_ts)
        for ri, rt in enumerate(r_ts)
        if lt - w <= rt <= lt
    }
    assert got == expected
