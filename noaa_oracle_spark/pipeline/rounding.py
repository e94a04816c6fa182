"""Cross-engine HALF_UP rounding for numpy kernels.

Spark's ``F.round`` and DuckDB's ``round()`` both round the double's
SHORTEST DECIMAL REPRESENTATION half-up (Spark goes through Scala
BigDecimal.decimal → Java ``BigDecimal.valueOf(double)`` →
``Double.toString``; measured on this runtime: 0.0078125 → 0.007813,
-0.0078125 → -0.007813, AND 0.1234565 — whose exact binary value is
just BELOW the half — → 0.123457 in both engines), while ``np.round``
is HALF_EVEN over the exact binary value (→ 0.007812 / 0.123456).  For
raw real-valued embeddings such boundary values are measure-zero, but
the QUANTIZED vector tiers make them reachable by construction —
dequantized values are small dyadic rationals, and any odd multiple of
2⁻⁷ lands exactly on the 6-dp half-way.  Every numpy kernel that
rounds a value the SQL oracle also rounds must therefore use this
helper, not bare np.round.

The fast path is still np.round; only the (rare) boundary candidates
are requantized through ``decimal`` over ``repr(x)`` — Python's repr is
the same shortest round-trip representation the engines round."""

from __future__ import annotations

import numpy as np


def round_half_up(x: "np.ndarray", digits: int = 6) -> "np.ndarray":
    """Elementwise decimal rounding matching Spark/DuckDB ROUND semantics
    (HALF_UP over the shortest decimal repr), vectorized: np.round
    everywhere, repr-decimal requantize on half-way candidates only."""
    xa = np.asarray(x, dtype=np.float64)
    y = np.round(xa, digits)
    scaled = xa * (10.0**digits)
    frac = scaled - np.floor(scaled)
    ties = np.abs(frac - 0.5) < 1e-9
    if np.any(ties):
        import decimal

        q = decimal.Decimal(1).scaleb(-digits)
        flat_y = y.reshape(-1)
        flat_x = xa.reshape(-1)
        for i in np.nonzero(ties.reshape(-1))[0]:
            flat_y[i] = float(
                decimal.Decimal(repr(float(flat_x[i]))).quantize(
                    q, rounding=decimal.ROUND_HALF_UP
                )
            )
        y = flat_y.reshape(y.shape)
    return y
