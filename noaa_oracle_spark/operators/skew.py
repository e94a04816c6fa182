"""Skew mitigation: salted join for hot keys.

AQE's skew-join (on in session.py) splits oversized SORT-MERGE partitions
automatically — that covers the common case. Salting is the explicit
fallback for the shapes AQE cannot rewrite: a skewed key feeding a
broadcast-ineligible join inside a cached/reused stage, or a join whose
skewed side is the OUTPUT of an operator AQE won't re-split (e.g. a window
over the same key). The events table is the in-repo example: 15 users over
100 k+ rows — every per-user shuffle lands on ≤ 15 tasks no matter how many
executors exist.

Mechanics: the big side gets a deterministic per-row salt in [0, n); the
small-but-not-broadcastable side is replicated n× with every salt value;
the join key becomes (key, salt), multiplying effective parallelism by n at
the cost of replicating the right side n× (choose n ≈ hot-key partition
size / target partition size — replication is linear, skew was quadratic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `keys` with the left side's hot keys spread over
    `num_salts` shuffle partitions. Result is row-identical to
    `left.join(right, keys, how)`.

    The salt hashes the full left row (xxhash64 — deterministic across
    runs/retries, unlike monotonically_increasing_id or rand, both of
    which break retry idempotency mid-shuffle)."""
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError("salted_join: input already has a _salt column")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(num_salts))
    lx = left.withColumn("_salt", salt)
    rx = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return lx.join(rx, [*keys, "_salt"], how).drop("_salt")
