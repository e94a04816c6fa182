"""Approximate-nearest-neighbor search over an embedding column.

Two tiers:
  - brute_force_knn: exact cosine top-k via a broadcast query-side cross
    join — the correctness baseline. Per-row cost is O(dim); the candidate
    side is never shuffled, so it scales linearly with corpus size.
  - lsh_bucketed_knn: random-hyperplane LSH (sign sketch) — candidates only
    from matching buckets; the 100 TB path where even a linear scan per
    query is too slow. Hyperplanes are derived deterministically from md5 so
    results are reproducible (and testable) without a stored model.

All vector math uses higher-order functions (zip_with/aggregate/transform) —
JVM-side, no Python UDFs, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Plan shape: broadcast(queries) × corpus → per-pair cosine → window
    top-k on (rounded cosine desc, neighbor id asc). The corpus side stays
    partition-local; only the k·|queries| winners shuffle. Ranking on the
    rounded value keeps the order reproducible across engines."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    from noaa_oracle_spark.pipeline.dedup import spread

    c = spread(corpus).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("q_id") != F.col("n_id"))
    cos = cosine(F.col("q_vec"), F.col("n_vec"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = pairs.select("q_id", "n_id", cos.alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos_sim")
    )


def _hyperplane(dim: int, plane: int) -> Column:
    """Deterministic pseudo-random hyperplane: component i is ±1 from the
    high bit of md5('{plane}|{i}'). Stored nowhere — recomputed as a literal
    array expression, identical on every executor and every engine."""
    comps = [
        F.when(
            F.substring(F.md5(F.lit(f"{plane}|{i}")), 1, 1).isin(*list("89abcdef")),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
        for i in range(dim)
    ]
    return F.array(*comps)


def lsh_bucket(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """Sign-sketch bucket id: bit p = (vec · hyperplane_p) > 0."""
    bits = []
    for p in range(num_planes):
        d = _dot(_as_double(vec), _hyperplane(dim, p))
        bits.append(F.when(d > 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _table_buckets(
    vec: Column, dim: int, num_planes: int, num_tables: int
) -> Column:
    """Array of (table, bucket) memberships; table t uses hyperplanes
    t·num_planes … t·num_planes+num_planes−1."""
    entries = []
    for t in range(num_tables):
        bits = []
        for p in range(num_planes):
            d = _dot(_as_double(vec), _hyperplane(dim, t * num_planes + p))
            bits.append(F.when(d > 0, F.lit(2 ** p)).otherwise(F.lit(0)))
        bucket = bits[0]
        for b in bits[1:]:
            bucket = bucket + b
        entries.append(
            F.struct(
                F.lit(t).alias("table"), bucket.cast("int").alias("bucket")
            )
        )
    return F.array(*entries)


def lsh_bucketed_knn(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing a bucket
    in ANY of `num_tables` hash tables (OR-amplification — the standard
    recall lever; a single table's recall on unstructured embeddings decays
    ~2× per extra plane, measured 0.30→0.02 from 2→5 planes here).

    The join is an equi-join on (table, bucket) — at scale the corpus is
    written bucketed by this key so a query touches num_tables partitions;
    candidate volume ≈ num_tables · corpus / 2^num_planes per query."""
    membership = lambda col: F.explode(  # noqa: E731
        _table_buckets(col, dim, num_planes, num_tables)
    ).alias("tb")
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        membership(F.col(vec_col)),
    ).select("q_id", "q_vec", "tb.table", "tb.bucket")
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
        membership(F.col(vec_col)),
    ).select("n_id", "n_vec", "tb.table", "tb.bucket")
    pairs = (
        F.broadcast(q)
        .join(c, ["table", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
    )
    scored = pairs.select(
        "q_id",
        "n_id",
        F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos_sim")
    )
