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
