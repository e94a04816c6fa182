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


def lsh_bucketed_knn(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The join is an equi-join on bucket id — at scale the corpus is written
    bucketed/partitioned by this key so a query touches one partition. Recall
    is tunable via num_planes (fewer planes → bigger buckets → higher
    recall, more work)."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        lsh_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    pairs = F.broadcast(q).join(c, "bucket").filter(F.col("q_id") != F.col("n_id"))
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
