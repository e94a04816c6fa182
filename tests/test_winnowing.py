"""Winnowing property: any two documents sharing a substring of length
>= k + window - 1 share at least one fingerprint (the MOSS guarantee) —
and unrelated strings share none.
"""

from __future__ import annotations

from noaa_oracle_spark.pipeline.text import winnowing_fingerprints

K, W = 8, 4


def _fps(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = winnowing_fingerprints(df, k=K, window=W).collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r.doc_id, set()).add(r.fingerprint)
    return out

def test_shared_substring_shares_fingerprint(spark):
    shared = "the quick brown fox jumps over it"  # len 33 >= k+w-1 = 11
    a = "AAAA " + shared + " BBBB trailing words here"
    b = "completely different prefix " + shared
    c = "no overlap with the others at all, zzz qqq"
    fps = _fps(spark, [a, b, c])
    assert fps[0] & fps[1], "copied substring must share a fingerprint"
    assert not (fps[0] & fps[2])
    assert not (fps[1] & fps[2])


def test_short_documents_emit_nothing(spark):
    fps = _fps(spark, ["tiny", "x" * (K + W - 2)])
    assert fps == {}
