"""Similarity search and embedding-space dedup over an embedding column.

Three ANN tiers plus a near-dup pair generator:
  - brute_force_knn: exact cosine top-k via a broadcast query-side cross
    join — the correctness baseline. Per-row cost is O(dim); the candidate
    side is never shuffled, so it scales linearly with corpus size.
  - lsh_bucketed_knn: random-hyperplane LSH (sign sketch) — candidates only
    from matching buckets; the 100 TB path where even a linear scan per
    query is too slow. Hyperplanes are derived deterministically from md5 so
    results are reproducible (and testable) without a stored model.
  - ivf_knn: inverted-file index (IVF-flat) — corpus partitioned into nlist
    centroid cells; queries probe only the nprobe nearest cells. The
    data-dependent counterpart to LSH: cells follow the corpus distribution,
    so probe cost tracks cluster occupancy rather than a fixed 2^planes.
  - embedding_cosine_pairs: all (a < b) pairs above a cosine threshold —
    the embedding-space near-duplicate detector that closes the dedup
    ladder (exact → simhash → minhash-LSH → n-gram Jaccard → embedding).

All vector math uses higher-order functions (zip_with/aggregate/transform) —
JVM-side, no Python UDFs, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from noaa_oracle_spark.pipeline.rounding import round_half_up


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
    backend: str = "expr",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Plan shape: broadcast(queries) × corpus → per-pair cosine → per-batch
    top-k → final window top-k on (rounded cosine desc, neighbor id asc).
    The corpus side stays partition-local; only k·|queries| candidates per
    partition shuffle. Ranking on the rounded value keeps the order
    reproducible across engines.

    ``backend="expr"`` (default) is the pure-Column, oracle-exact form.
    ``backend="numpy"`` streams corpus Arrow batches against a broadcast
    query matrix with the same dimension-ordered accumulation as the other
    numpy kernels — per-pair doubles are the IEEE-identical left fold, and
    results are equality-tested against the expr form; use it when the
    query set is large enough that interpreted HOF cosines dominate."""
    if backend not in ("expr", "numpy"):
        raise ValueError(f"unknown backend {backend!r}")
    from noaa_oracle_spark.pipeline.dedup import spread

    if backend == "numpy":
        if round_digits is None:
            # the numpy kernel ranks on np.round-ed values; an unrounded
            # variant would silently diverge from the expr path's
            # "no rounding" contract, so refuse rather than guess
            raise ValueError(
                "backend='numpy' requires round_digits (the kernel ranks "
                "on rounded cosines); use backend='expr' for raw values"
            )
        scored = _knn_candidates_numpy(
            queries, corpus, k, id_col, vec_col, round_digits
        )
    else:
        q = queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
        c = spread(corpus).select(
            F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
        )
        pairs = (
            F.broadcast(q).crossJoin(c).filter(F.col("q_id") != F.col("n_id"))
        )
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


def matryoshka_knn(
    queries: DataFrame,
    corpus: DataFrame,
    d_prefix: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    backend: str = "expr",
    geometry_guard: bool = False,
) -> DataFrame:
    """Matryoshka prefix-truncation retrieval (MRL, Kusupati et al.
    NeurIPS 2022): embeddings trained with the matryoshka loss keep
    their leading dimensions informative, so candidate retrieval can run
    on just the first `d_prefix` dims at d_prefix/d of the FLOPs — and,
    in a columnar store, d_prefix/d of the scanned vector bytes — with
    no codebook to train (the funnel tier that composes with q116's
    exact re-rank cascade).

    Returns the prefix-metric top-k per query with BOTH scores: the
    truncated cosine the ranking used (`cos_prefix`) and the
    full-dimension cosine of the same pair (`cos_full`) — the
    truncation-error readout an MRL evaluation reports.

    Scale shape: the slice is map-side on both streams; ranking is
    `brute_force_knn`'s broadcast-queries kernel on the short vectors;
    the full-dimension score touches only the k·|queries| selected
    pairs, broadcast against one pass over the corpus vectors.

    Geometry rule (measured, SCALE.md 1M ladder): prefix ranking only
    works when the embedding front-loads information (actual MRL
    training); on isotropic embeddings recall collapses to the 0.004–
    0.036 floor.  Pass ``geometry_guard=True`` to have `prefix_energy`
    (one extra bounded job) warn when the first `d_prefix` dims carry
    less than 2× their uniform share of the variance — the signature of
    an un-MRL-trained embedding; default off keeps plans unchanged."""
    if d_prefix < 1:
        raise ValueError(f"matryoshka_knn: d_prefix must be >= 1, got {d_prefix}")
    if geometry_guard:
        import warnings

        pe = prefix_energy(corpus, d_prefix, vec_col=vec_col)
        if pe["energy"] < 2.0 * pe["uniform_floor"]:
            warnings.warn(
                "matryoshka_knn: first "
                f"{d_prefix}/{pe['dim']} dims carry {pe['energy']:.3f} "
                f"of the variance (uniform floor {pe['uniform_floor']:.3f})"
                " — no matryoshka front-loading detected; prefix "
                "retrieval measured at the recall floor on such "
                "embeddings (SCALE.md quantization ladder)",
                stacklevel=2,
            )
    pre = F.slice(F.col(vec_col), 1, d_prefix)
    top = brute_force_knn(
        queries.withColumn(vec_col, pre),
        corpus.withColumn(vec_col, pre),
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        round_digits=round_digits,
        backend=backend,
    ).withColumnRenamed("cos_sim", "cos_prefix")
    qv = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv")
    )
    nv = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("_nv")
    )
    full = F.round(cosine(F.col("_qv"), F.col("_nv")), round_digits)
    return (
        nv.join(F.broadcast(top), "n_id")
        .join(F.broadcast(qv), "q_id")
        .select("q_id", "rank", "n_id", "cos_prefix", full.alias("cos_full"))
    )


def sq8_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Int8 scalar quantization, the TRAIN step: per-dimension [min, max]
    over the corpus — the FAISS-SQ8 / Lucene-int8 compression tier (4×
    smaller than float32; PQ's 32× sibling when recall matters more than
    memory). Returns (dim, lo, hi), a dim-row table that is
    broadcast-sized by definition.

    Plan shape: one posexplode to (dim, value) long form + a dim-keyed
    min/max hash agg — the kmeans_update key-space argument: dim rows
    regardless of corpus size or skew."""
    return (
        corpus.select(
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("dim", "v")
        )
        .groupBy("dim")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    )


def _sq8_bounds(factors: DataFrame) -> "tuple[list, list]":
    rows = sorted(
        (int(r["dim"]), float(r["lo"]), float(r["hi"]))
        for r in factors.collect()  # dim rows — kilobytes by construction
    )
    return [r[1] for r in rows], [r[2] for r in rows]


def sq8_encode(
    corpus: DataFrame,
    factors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress: (id, codes array<int> of 0..255). Pure column
    expressions against the broadcast-inlined [lo, hi] literals — zero
    joins, zero shuffles, fully codegen (the kmeans_assign discipline).
    code = clamp(round((x − lo)/(hi − lo) · 255), 0, 255); the clamp is
    what makes encode-new-data-with-frozen-factors safe (FAISS SQ8 does
    the same) — a vector outside the trained per-dimension range would
    otherwise yield codes that no longer fit the int8 storage claim. A
    degenerate dimension (hi == lo) codes as 0 and dequantizes back to
    lo exactly."""
    lo, hi = _sq8_bounds(factors)
    lo_arr = F.array(*[F.lit(x) for x in lo])
    span = F.array(
        *[F.lit((h - l) if h > l else 1.0) for l, h in zip(lo, hi)]
    )
    xs = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    codes = F.zip_with(
        F.zip_with(xs, lo_arr, lambda x, l: x - l),
        span,
        lambda d, s: F.greatest(
            F.lit(0),
            F.least(F.lit(255), F.round(d / s * 255).cast("int")),
        ),
    )
    return corpus.select(F.col(id_col), codes.alias("codes"))


def sq8_knn(
    queries: DataFrame,
    encoded: DataFrame,
    factors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "expr",
) -> DataFrame:
    """Top-k cosine over the int8-DEQUANTIZED corpus: x̂ = lo + code/255
    · (hi − lo). The same broadcast-queries × corpus → per-batch top-k →
    final window shape as brute_force_knn, ranking on the 6-dp rounded
    cosine with id tiebreak; corpus float vectors are never touched —
    the scan reads 1-byte-scale codes, the whole point of the tier.
    Returns (q_id, rank, n_id, cos_sim).

    ``backend="expr"`` (default) is the pure-Column, oracle-exact form
    the q107 gate grades.  ``backend="numpy"`` dequantizes and scores
    per Arrow batch with the brute_force_knn numpy discipline — the
    identical per-element arithmetic ((c/255)·span + lo) and
    dimension-ordered accumulation, so results are equality-tested
    bit-for-bit against the expr form; it exists because the 1M ladder
    measured the interpreted HOF dequant+cosine at 110.6 s where raw's
    numpy kernel took 11.2 s (SCALE.md)."""
    from noaa_oracle_spark.pipeline.dedup import spread

    lo, hi = _sq8_bounds(factors)
    if backend == "numpy":
        cand = _sq8_candidates_numpy(
            queries, encoded, lo, hi, k, id_col, vec_col
        )
        w = Window.partitionBy("q_id").orderBy(
            F.desc("cos_sim"), F.asc("n_id")
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "n_id", "cos_sim")
        )
    if backend != "expr":
        raise ValueError(f"unknown backend {backend!r}")
    lo_arr = F.array(*[F.lit(x) for x in lo])
    span = F.array(
        *[F.lit((h - l) if h > l else 1.0) for l, h in zip(lo, hi)]
    )
    deq = F.zip_with(
        F.zip_with(
            F.col("codes"), span, lambda c, s: c.cast("double") / 255 * s
        ),
        lo_arr,
        lambda v, l: v + l,
    )
    c = spread(encoded).select(
        F.col(id_col).alias("n_id"), deq.alias("n_vec")
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    pairs = (
        F.broadcast(q).crossJoin(c).filter(F.col("q_id") != F.col("n_id"))
    )
    cos = F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6)
    scored = pairs.select("q_id", "n_id", cos.alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos_sim")
    )


def _require_integral_ids(df: DataFrame, id_col: str, where: str) -> None:
    """The numpy backends materialize ids as an int64 ndarray; a string or
    decimal id column would crash (or worse, coerce) only on that backend
    while the expr backend handles any orderable type — fail loudly up
    front instead."""
    from pyspark.sql import types as T

    dt = df.schema[id_col].dataType
    if not isinstance(
        dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    ):
        raise TypeError(
            f"{where}: backend='numpy' requires an integral {id_col!r} "
            f"column (got {dt.simpleString()}); use backend='expr' for "
            "non-integer ids"
        )


def _sq8_candidates_numpy(
    queries: DataFrame,
    encoded: DataFrame,
    lo: "list[float]",
    hi: "list[float]",
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """numpy candidate stage for sq8_knn: per Arrow batch of CODES,
    dequantize with the exact per-element arithmetic of the expression
    form ((c/255)·span + lo) and score with the dimension-ordered fold —
    bit-identical to the expr backend, per-batch top-k pruning."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from noaa_oracle_spark.pipeline.dedup import spread

    _require_integral_ids(queries, id_col, "sq8_knn(queries)")
    _require_integral_ids(encoded, id_col, "sq8_knn(encoded)")

    def fold_norms(m: "np.ndarray") -> "np.ndarray":
        acc = m[:, 0] * m[:, 0]
        for i in range(1, m.shape[1]):
            acc = acc + m[:, i] * m[:, i]
        return np.sqrt(acc)

    q_rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in queries.select(id_col, vec_col).collect()
    )
    if not q_rows:
        raise ValueError("sq8_knn: empty query set")
    q_ids = np.array([i for i, _ in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in q_rows])
    q_nrm = fold_norms(q_mat)
    lo_arr = np.asarray(lo, dtype=np.float64)
    span_arr = np.asarray(
        [(h - l) if h > l else 1.0 for l, h in zip(lo, hi)],
        dtype=np.float64,
    )
    bc = queries.sparkSession.sparkContext.broadcast(
        (q_ids, q_mat, q_nrm, lo_arr, span_arr)
    )

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("n_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def kernel(batches):
        ids_q, mat_q, nrm_q, lo_, span_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_n = pdf[id_col].to_numpy(dtype=np.int64)
            codes = np.stack(
                [np.asarray(c, dtype=np.float64) for c in pdf["codes"]]
            )
            # identical per-element order to the expression form:
            # (c / 255) * span + lo
            mat_n = (codes / 255.0) * span_[None, :] + lo_[None, :]
            nrm_n = fold_norms(mat_n)
            dot = np.multiply.outer(mat_q[:, 0], mat_n[:, 0])
            for i in range(1, mat_q.shape[1]):
                dot = dot + np.multiply.outer(mat_q[:, i], mat_n[:, i])
            sims = round_half_up(dot / np.multiply.outer(nrm_q, nrm_n), 6)
            sims[:, :] = np.where(
                ids_n[None, :] == ids_q[:, None], -np.inf, sims
            )
            kk = min(k, sims.shape[1])
            idx = np.lexsort(
                (np.broadcast_to(ids_n, sims.shape), -sims), axis=-1
            )[:, :kk]
            out = pd.DataFrame(
                {
                    "q_id": np.repeat(ids_q, kk),
                    "n_id": ids_n[idx].ravel(),
                    "cos_sim": np.take_along_axis(sims, idx, axis=1).ravel(),
                }
            )
            yield out[out["cos_sim"] != -np.inf]

    return spread(encoded.select(id_col, "codes")).mapInPandas(
        kernel, schema
    )


def _knn_candidates_numpy(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """numpy candidate stage for brute_force_knn: per Arrow batch of the
    corpus, score against the broadcast query matrix and emit only each
    query's top-k WITHIN the batch — the final global window sees
    k·|queries| rows per batch instead of the full pair space."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from noaa_oracle_spark.pipeline.dedup import spread

    _require_integral_ids(queries, id_col, "brute_force_knn(queries)")
    _require_integral_ids(corpus, id_col, "brute_force_knn(corpus)")

    def fold_norms(m: "np.ndarray") -> "np.ndarray":
        acc = m[:, 0] * m[:, 0]
        for i in range(1, m.shape[1]):
            acc = acc + m[:, i] * m[:, i]
        return np.sqrt(acc)

    q_rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in queries.select(id_col, vec_col).collect()
    )
    if not q_rows:
        raise ValueError("brute_force_knn: empty query set")
    q_ids = np.array([i for i, _ in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in q_rows])
    q_nrm = fold_norms(q_mat)
    bc = queries.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_nrm))

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("n_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def kernel(batches):
        ids_q, mat_q, nrm_q = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_n = pdf[id_col].to_numpy(dtype=np.int64)
            mat_n = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            nrm_n = fold_norms(mat_n)
            dot = np.multiply.outer(mat_q[:, 0], mat_n[:, 0])
            for i in range(1, mat_q.shape[1]):
                dot = dot + np.multiply.outer(mat_q[:, i], mat_n[:, i])
            sims = round_half_up(
                dot / np.multiply.outer(nrm_q, nrm_n), round_digits
            )
            sims[:, :] = np.where(
                ids_n[None, :] == ids_q[:, None], -np.inf, sims
            )
            kk = min(k, sims.shape[1])
            # per-batch top-k under the SAME total order the global window
            # uses — (sim desc, n_id asc) — so a tie at the k-th boundary
            # keeps the same candidate the expr form would keep
            idx = np.lexsort(
                (np.broadcast_to(ids_n, sims.shape), -sims), axis=-1
            )[:, :kk]
            rows = {
                "q_id": np.repeat(ids_q, kk),
                "n_id": ids_n[idx].ravel(),
                "cos_sim": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[out["cos_sim"] != -np.inf]

    return spread(corpus.select(id_col, vec_col)).mapInPandas(kernel, schema)


def _hyperplane_signs(dim: int, plane: int) -> list[bool]:
    """Deterministic pseudo-random hyperplane: component i is +1 iff the
    high bit of md5('{plane}|{i}') is set. Computed driver-side with
    hashlib — identical to Spark's and DuckDB's md5 of the same literal —
    so the plane folds into the plan as constants."""
    import hashlib

    return [
        int(hashlib.md5(f"{plane}|{i}".encode()).hexdigest()[0], 16) >= 8
        for i in range(dim)
    ]


def _plane_dot(vec: Column, dim: int, plane: int) -> Column:
    """vec · hyperplane as an explicit ± sum of element_at terms — pure
    codegen arithmetic. The lambda formulation (aggregate over zip_with
    with a literal ±1 array) evaluates interpreted per element and was
    measured ~20× slower on the bucketing hot path."""
    signs = _hyperplane_signs(dim, plane)
    total: Column | None = None
    # accumulate in index order — the SQL oracle's list_sum folds left to
    # right, and a different summation order could flip a near-zero dot's
    # sign (bucket bit) across engines
    for i in range(dim):
        term = F.element_at(vec, i + 1).cast("double")
        if total is None:
            total = term if signs[i] else -term
        else:
            total = total + term if signs[i] else total - term
    return total if total is not None else F.lit(0.0)


def lsh_bucket(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """Sign-sketch bucket id: bit p = (vec · hyperplane_p) > 0."""
    bits = []
    for p in range(num_planes):
        d = _plane_dot(vec, dim, p)
        bits.append(F.when(d > 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _bucket_udf(dim: int, num_planes: int, num_tables: int):
    """Vectorized bucketing: one numpy matmul per Arrow batch → per row an
    array of bucket ids, one per table (table t uses hyperplanes
    t·num_planes…+num_planes−1).

    Why a Pandas UDF here, against this engine's no-UDF default: the
    expression formulation needs dim·planes·tables (≈768) arithmetic terms
    per row, which exceeds whole-stage codegen's method-size limit and
    falls back to interpreted evaluation (measured ~1.3 s for 2 000 rows);
    the matmul does the same work in microseconds and the Arrow batch is
    tiny. This is exactly the "built-ins genuinely can't express it
    efficiently" carve-out."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    signs = np.array(
        [
            _hyperplane_signs(dim, g)
            for g in range(num_tables * num_planes)
        ],
        dtype=np.float64,
    ).T  # dim × (tables·planes), entries ±1 via 2s-1
    planes_matrix = signs * 2.0 - 1.0
    weights = np.array([1 << p for p in range(num_planes)], dtype=np.int64)

    @pandas_udf("array<int>")
    def buckets(v):
        import pandas as pd

        m = np.stack(v.values).astype(np.float64)  # n × dim
        if m.shape[1] != dim:
            raise ValueError(
                f"lsh bucketing: vectors have {m.shape[1]} components, "
                f"expected dim={dim}"
            )
        bits = (m @ planes_matrix) > 0  # n × (tables·planes)
        per_table = bits.reshape(len(m), num_tables, num_planes) @ weights
        return pd.Series([row.astype(np.int32).tolist() for row in per_table])

    return buckets


def lsh_bucketed_knn(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 4,
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
    bucket_of = _bucket_udf(dim, num_planes, num_tables)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.posexplode(bucket_of(F.col(vec_col))).alias("table", "bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.posexplode(bucket_of(F.col(vec_col))).alias("table", "bucket"),
    )
    # Dedup OR-table collisions on the slim (q_id, n_id) pair stream —
    # a hash aggregate on two longs — then attach vectors once per
    # surviving pair. Carrying the vectors through the dedup would (a)
    # shuffle each duplicate candidate with both embeddings aboard and
    # (b) force first()-over-array aggregation, which falls out of
    # HashAggregate into SortAggregate.
    pairs = (
        F.broadcast(q)
        .join(c, ["table", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id")
        .dropDuplicates()
    )
    scored = (
        pairs.join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("q_id"),
                    F.col(vec_col).alias("q_vec"),
                )
            ),
            "q_id",
        )
        .join(
            corpus.select(
                F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
            ),
            "n_id",
        )
        .select(
            "q_id",
            "n_id",
            F.round(
                cosine(F.col("q_vec"), F.col("n_vec")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos_sim")
    )


def ivf_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: assign every corpus vector to its nearest
    of `nlist` centroids, then answer each query from the `nprobe` nearest
    cells only.

    Default centroids are the nlist lowest-id corpus vectors — the
    deterministic seed pick that k-means would start from (determinism is
    what makes the DuckDB oracle reproduce it bit-for-bit). Pass
    `centroids` (a (id_col, vec_col) DataFrame, e.g. from `lloyd_refine`)
    to build the index over trained cells instead — same index structure
    and query path, better-balanced cell occupancy on clustered corpora.

    Plan shape: centroids broadcast to both the assignment scan and the
    query probe (nlist is small by construction); the candidate join is an
    equi-join on the cell id — at scale the corpus is written partitioned
    by `c_id`, so a query touches nprobe partitions and candidate volume is
    the occupancy of those cells, not the corpus. Assignment and ranking
    order on the 6-dp-rounded cosine with id tiebreaks so the cell choice
    (and therefore the result set) is engine-portable."""
    cent_src = (
        centroids
        if centroids is not None
        else corpus.filter(F.col(id_col) < nlist)
    )
    cent = cent_src.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(_as_double(F.col(vec_col))).alias("c_nrm"),
    )

    def pair_cos(a: str, b: str, na: Column, nb: Column) -> Column:
        # HOF dot + norms precomputed per VECTOR (the ~3× win here —
        # norms-per-pair is the waste, the dot itself is irreducible);
        # the cell cross joins are nlist-bounded, so the interpreted
        # lambda cost stays proportional to corpus size, not pairs²
        dot = _dot(_as_double(F.col(a)), _as_double(F.col(b)))
        return F.round(dot / (na * nb), 6)

    def nearest_cells(side: DataFrame, vid: str, vvec: str, n: int) -> DataFrame:
        scored = side.crossJoin(F.broadcast(cent)).select(
            vid,
            vvec,
            "nrm",
            "c_id",
            pair_cos(vvec, "c_vec", F.col("nrm"), F.col("c_nrm")).alias("a_sim"),
        )
        w = Window.partitionBy(vid).orderBy(F.desc("a_sim"), F.asc("c_id"))
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= n)
            .select(vid, vvec, "nrm", "c_id")
        )

    from noaa_oracle_spark.pipeline.dedup import spread

    assigned = nearest_cells(
        spread(corpus).select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("n_vec"),
            _norm(_as_double(F.col(vec_col))).alias("nrm"),
        ),
        "n_id",
        "n_vec",
        1,
    ).withColumnRenamed("nrm", "n_nrm")
    probes = nearest_cells(
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            _norm(_as_double(F.col(vec_col))).alias("nrm"),
        ),
        "q_id",
        "q_vec",
        nprobe,
    ).withColumnRenamed("nrm", "q_nrm")
    # each corpus vector lives in exactly one cell and probe cells are
    # distinct per query, so candidates are already pair-unique
    cand = (
        F.broadcast(probes)
        .join(assigned, "c_id")
        .filter(F.col("q_id") != F.col("n_id"))
    )
    scored = cand.select(
        "q_id",
        "n_id",
        pair_cos("q_vec", "n_vec", F.col("q_nrm"), F.col("n_nrm")).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos_sim")
    )


def embedding_cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    strategy: str = "broadcast",
    max_broadcast_rows: int = 500_000,
    num_blocks: int = 8,
) -> DataFrame:
    """Embedding-space near-duplicate pairs: all (a < b) with
    round(cosine(a, b), round_digits) >= threshold.

    This is the exact operator — every pair is compared; nothing is
    approximated. Two physical strategies, identical output:

    - ``strategy="broadcast"`` (default): GEMM-blocked upper-triangle
      nested loop — the corpus rides to every executor as a Spark
      broadcast (ids, float64 matrix, norms) and each Arrow batch of the
      streamed side compares against it with numpy, emitting only
      surviving candidates. The broadcast side must fit in driver AND
      executor memory, exactly like any broadcast join; a
      `max_broadcast_rows` guard (enforced via limit(n+1), so the driver
      never materializes more than n+1 rows) fails over with an
      actionable error instead of OOMing.
    - ``strategy="blocked"``: the scale path — see
      `embedding_cosine_pairs_blocked`. No driver materialization at any
      size; shuffle volume is num_blocks × corpus.

    Comparing on the rounded value keeps borderline pairs
    engine-portable. A pure-expression formulation was measured 10×
    slower (the pair projection sits behind a BroadcastNestedLoopJoin,
    which whole-stage codegen skips, so per-pair expressions evaluate
    interpreted) — this is the "built-ins genuinely can't express it
    efficiently" carve-out.

    Hash-parity discipline: the numpy accumulation loops over dimensions in
    index order, so every per-pair double (dot, norms, quotient) is the
    IEEE-identical left fold the SQL oracle's `list_sum` computes. The UDF
    pre-filters with slack; the authoritative `round(cos, d) >= threshold`
    cut runs JVM-side on the exact values."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from noaa_oracle_spark.pipeline.dedup import spread

    if strategy == "blocked":
        return embedding_cosine_pairs_blocked(
            vectors,
            threshold,
            id_col=id_col,
            vec_col=vec_col,
            round_digits=round_digits,
            num_blocks=num_blocks,
        )
    if strategy != "broadcast":
        raise ValueError(f"unknown strategy {strategy!r}")

    def fold_norms(m: "np.ndarray") -> "np.ndarray":
        acc = m[:, 0] * m[:, 0]
        for i in range(1, m.shape[1]):
            acc = acc + m[:, i] * m[:, i]
        return np.sqrt(acc)

    # limit(n+1) bounds what the driver materializes: at most one row past
    # the threshold ever crosses the wire, then we fail over loudly
    rows = vectors.select(id_col, vec_col).limit(max_broadcast_rows + 1).collect()
    if len(rows) > max_broadcast_rows:
        raise ValueError(
            f"embedding_cosine_pairs: corpus exceeds max_broadcast_rows="
            f"{max_broadcast_rows}; use strategy='blocked' (distributed "
            "block-pair join, no driver materialization)"
        )
    schema_empty = "doc_a long, doc_b long, cos_sim double"
    if not rows:
        return vectors.sparkSession.createDataFrame([], schema_empty)
    b_ids = np.array([r[0] for r in rows], dtype=np.int64)
    b_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    b_nrm = fold_norms(b_mat)
    bc = vectors.sparkSession.sparkContext.broadcast((b_ids, b_mat, b_nrm))
    # round(x, d) >= t can only admit x >= t - 0.5·10^-d; keep 2× slack
    cutoff = threshold - 10.0 ** (-round_digits)

    schema = StructType(
        [
            StructField("doc_a", LongType()),
            StructField("doc_b", LongType()),
            StructField("cos_raw", DoubleType()),
        ]
    )

    def kernel(batches):
        ids_b, mat_b, nrm_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_a = pdf[id_col].to_numpy(dtype=np.int64)
            mat_a = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            nrm_a = fold_norms(mat_a)
            # dimension-ordered accumulation == the oracle's left fold
            dot = np.multiply.outer(mat_a[:, 0], mat_b[:, 0])
            for i in range(1, mat_a.shape[1]):
                dot = dot + np.multiply.outer(mat_a[:, i], mat_b[:, i])
            cos = dot / np.multiply.outer(nrm_a, nrm_b)
            ia, ib = np.nonzero(
                (ids_a[:, None] < ids_b[None, :]) & (cos >= cutoff)
            )
            yield pd.DataFrame(
                {
                    "doc_a": ids_a[ia],
                    "doc_b": ids_b[ib],
                    "cos_raw": cos[ia, ib],
                }
            )

    cand = spread(vectors.select(id_col, vec_col)).mapInPandas(kernel, schema)
    return cand.select(
        "doc_a",
        "doc_b",
        F.round(F.col("cos_raw"), round_digits).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def embedding_cosine_pairs_blocked(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    num_blocks: int = 8,
) -> DataFrame:
    """Exact embedding near-duplicate pairs WITHOUT any driver
    materialization — the beyond-broadcast tier of `embedding_cosine_pairs`
    (same output, bit-for-bit; the broadcast kernel caps out at driver
    memory because a Spark broadcast is built driver-side by definition).

    Distributed block-pair (a.k.a. triangle) join, the standard shape for
    exact all-pairs at scale:

      1. every vector gets a block id `pmod(xxhash64(id), B)` — engine-
         local hashing is fine here because block assignment only routes
         work; the OUTPUT is the full exact pair set regardless of B;
      2. each row is replicated to the B unordered block pairs
         (min(b,g), max(b,g)) it participates in — shuffle volume is
         B × corpus, the price of exactness with no broadcast;
      3. `groupBy(gi, gj).applyInPandas` runs the same GEMM kernel per
         group: upper triangle within a diagonal group, full bipartite
         product across a mixed group. Every (a < b) pair lands in exactly
         one group (the group of its two blocks), so no dedup pass is
         needed.

    Choose B so that 2·(corpus/B) rows of float64[dim] fit one task's
    memory: per-group bytes ≈ 16·n·dim/B. At 1e9 vectors × dim 768, B=4096
    gives ~3 GB/group — and B scales quadratically in group count, so AQE
    coalescing keeps small groups from fragmenting the stage.

    Float discipline: identical dimension-ordered accumulation as the
    broadcast kernel — dot products are commutative per term, so a pair's
    cosine is the same double whichever side of the group it sits on; the
    authoritative round(cos, d) >= threshold cut runs JVM-side.

    Measured (bench_pipeline, 20k×64 vecs): blocked 16.6 s vs broadcast
    45.8 s — 2.8× faster even BELOW the broadcast memory ceiling, because
    the group kernel computes each pair once (upper triangle / one
    bipartite product) where the broadcast kernel computes the full n×n
    matrix, and there is no driver collect+rebroadcast. The broadcast
    tier only wins at small corpora (~2k vecs: 0.55 s vs 0.93 s at
    sf0.1), where its single map stage beats the groupBy shuffle."""
    import numpy as np
    import pandas as pd

    from noaa_oracle_spark.pipeline.dedup import spread

    _require_integral_ids(
        vectors, id_col, "embedding_cosine_pairs_blocked"
    )
    if num_blocks < 1:
        raise ValueError("num_blocks must be >= 1")
    cutoff = threshold - 10.0 ** (-round_digits)

    base = spread(vectors.select(id_col, vec_col)).withColumn(
        "blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).cast("int")
    )
    rep = base.select(
        id_col,
        vec_col,
        "blk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.least(F.col("blk"), F.lit(g)).alias("gi"),
                        F.greatest(F.col("blk"), F.lit(g)).alias("gj"),
                    )
                    for g in range(num_blocks)
                ]
            )
        ).alias("g"),
    ).select(id_col, vec_col, "blk", "g.gi", "g.gj")

    def fold_norms(m: "np.ndarray") -> "np.ndarray":
        acc = m[:, 0] * m[:, 0]
        for i in range(1, m.shape[1]):
            acc = acc + m[:, i] * m[:, i]
        return np.sqrt(acc)

    def pair_matrix(mat_a, mat_b):
        dot = np.multiply.outer(mat_a[:, 0], mat_b[:, 0])
        for i in range(1, mat_a.shape[1]):
            dot = dot + np.multiply.outer(mat_a[:, i], mat_b[:, i])
        return dot

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) == 0:
            return pd.DataFrame(
                {"doc_a": [], "doc_b": [], "cos_raw": []}
            ).astype({"doc_a": "int64", "doc_b": "int64", "cos_raw": "float64"})
        gi, gj = int(pdf["gi"].iat[0]), int(pdf["gj"].iat[0])
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        if gi == gj:
            nrm = fold_norms(mat)
            cos = pair_matrix(mat, mat) / np.multiply.outer(nrm, nrm)
            ia, ib = np.nonzero(
                (ids[:, None] < ids[None, :]) & (cos >= cutoff)
            )
            return pd.DataFrame(
                {"doc_a": ids[ia], "doc_b": ids[ib], "cos_raw": cos[ia, ib]}
            )
        blk = pdf["blk"].to_numpy()
        am, bm = blk == gi, blk == gj
        ids_a, ids_b = ids[am], ids[bm]
        if len(ids_a) == 0 or len(ids_b) == 0:
            return pd.DataFrame(
                {"doc_a": [], "doc_b": [], "cos_raw": []}
            ).astype({"doc_a": "int64", "doc_b": "int64", "cos_raw": "float64"})
        cos = pair_matrix(mat[am], mat[bm]) / np.multiply.outer(
            fold_norms(mat[am]), fold_norms(mat[bm])
        )
        ia, ib = np.nonzero(cos >= cutoff)
        lo = np.minimum(ids_a[ia], ids_b[ib])
        hi = np.maximum(ids_a[ia], ids_b[ib])
        return pd.DataFrame({"doc_a": lo, "doc_b": hi, "cos_raw": cos[ia, ib]})

    cand = rep.groupBy("gi", "gj").applyInPandas(
        kernel, "doc_a long, doc_b long, cos_raw double"
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.round(F.col("cos_raw"), round_digits).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    assign_backend: str = "expr",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then look
    for near-identical pairs WITHIN each cluster only — the observation
    being that semantic duplicates land in the same cell, so the exact
    O(n²) cosine verify shrinks to Σ(cell²) ≈ n²/k for balanced cells.

    Deterministic keep rule: within a cluster, a vector is a duplicate iff
    some LOWER-id member matches it at `round(cos, d) >= threshold`; its
    `dup_of` names the minimum such id (the kept representative). This is
    the same (a < b) orientation and rounding discipline as the rest of
    the ladder, so the operator is engine-portable end to end.

    Returns (id, cluster_id, is_dup, dup_of) for EVERY input vector.

    Plan shape: assignment is the zero-shuffle literal-centroid map
    (`kmeans_assign`; `assign_backend="numpy"` is the measured ~30×
    large-k path, equality-tested against the oracle-exact expr default —
    at 100k×64 vecs / 64 cells the whole operator drops 81 s → a few
    seconds); the within-cell pair
    scan is one groupBy(cluster).applyInPandas running the same GEMM
    kernel as the blocked pair join, so per-task memory is bounded by the
    largest CELL, not the corpus — if a cell outgrows a task, raise k
    (the paper's own lever; cell occupancy is exactly what
    `lloyd_refine` balances). Verdict rollup + the final attach are
    id-keyed hash joins."""
    import numpy as np
    import pandas as pd

    _require_integral_ids(vectors, id_col, "semantic_dedup")
    assigned = kmeans_assign(
        vectors.select(id_col, vec_col),
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        round_digits=round_digits,
        backend=assign_backend,
    )
    cutoff = threshold - 10.0 ** (-round_digits)

    def fold_norms(m: "np.ndarray") -> "np.ndarray":
        acc = m[:, 0] * m[:, 0]
        for i in range(1, m.shape[1]):
            acc = acc + m[:, i] * m[:, i]
        return np.sqrt(acc)

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) < 2:
            return pd.DataFrame(
                {"doc_a": [], "doc_b": [], "cos_raw": []}
            ).astype({"doc_a": "int64", "doc_b": "int64", "cos_raw": "float64"})
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        nrm = fold_norms(mat)
        dot = np.multiply.outer(mat[:, 0], mat[:, 0])
        for i in range(1, mat.shape[1]):
            dot = dot + np.multiply.outer(mat[:, i], mat[:, i])
        cos = dot / np.multiply.outer(nrm, nrm)
        ia, ib = np.nonzero((ids[:, None] < ids[None, :]) & (cos >= cutoff))
        return pd.DataFrame(
            {"doc_a": ids[ia], "doc_b": ids[ib], "cos_raw": cos[ia, ib]}
        )

    pairs = (
        assigned.select(id_col, vec_col, "cluster_id")
        .groupBy("cluster_id")
        .applyInPandas(kernel, "doc_a long, doc_b long, cos_raw double")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("cos_raw"), round_digits).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    dups = pairs.groupBy("doc_b").agg(F.min("doc_a").alias("dup_of"))
    return (
        assigned.select(id_col, "cluster_id")
        .join(dups, F.col(id_col) == F.col("doc_b"), "left")
        .select(
            id_col,
            "cluster_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
        )
    )


def kmeans_assign(
    points: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    backend: str = "expr",
) -> DataFrame:
    """Assign every point to its nearest centroid by cosine — the map side
    of Lloyd's k-means and the cell-routing step of an IVF index build.

    Plan shape: the centroid set is BY DEFINITION tiny (k rows), so it is
    collected and inlined (literal array / numpy broadcast); the
    assignment is a pure per-row map — ZERO joins, ZERO shuffles. At
    100 TB this is the only shape that works: any join/window formulation
    shuffles the points on their own id for no reason.

    Two backends, identical semantics:

    - ``backend="expr"`` (default): pure Column expressions, fully
      engine-portable and oracle-exact. Cost discipline (HOF lambdas
      evaluate interpreted, not codegen'd): the point's norm is computed
      ONCE per row (hoisted column), each centroid's norm is a
      Python-precomputed literal (in-order fold == a SQL `list_sum` of
      squares bit-for-bit), each centroid costs exactly one dot product,
      and the argmax is `array_max` over (sim, -cid) structs — equal
      rounded sims pick the larger -cid = the LOWEST centroid id, the
      same total order as a (cos DESC, cid ASC) row_number pick.
    - ``backend="numpy"``: Arrow-batched mapInPandas with the same
      dimension-ordered accumulation as embedding_cosine_pairs (per-pair
      doubles are the IEEE-identical left fold), measured ~30× faster at
      k=32/dim=64 — the large-k production path. Rounding uses
      `rounding.round_half_up` (np.round fast path + exact decimal
      requantize on half-way candidates), so even a cosine landing
      EXACTLY on a 0.5·10⁻⁶ boundary rounds the way F.round and DuckDB
      round() do — no tie-rule divergence remains (equality with the
      expr backend is asserted in tests on the full test corpus).

    Returns the input columns plus `cluster_id` and `cos_sim` (rounded).
    """
    import math

    if backend not in ("expr", "numpy"):
        raise ValueError(f"unknown backend {backend!r}")
    # appended outputs + expr-path temps would silently collide with (and
    # corrupt) same-named input columns
    reserved = {"cluster_id", "cos_sim", "_pnorm", "_best"}
    clash = reserved & set(points.columns)
    if clash:
        raise ValueError(
            f"kmeans_assign: input columns {sorted(clash)} collide with "
            "reserved output/temp names; rename them first"
        )
    if backend == "numpy":
        _require_integral_ids(centroids, id_col, "kmeans_assign(centroids)")
    rows = sorted(
        (r[0], [float(x) for x in r[1]])
        for r in centroids.select(id_col, vec_col).collect()
    )
    if not rows:
        raise ValueError("kmeans_assign: empty centroid set")

    def fold_norm(vec: list[float]) -> float:
        # in-order fold == the SQL oracle's list_sum accumulation order
        acc = 0.0
        for x in vec:
            acc = acc + x * x
        return math.sqrt(acc)

    if backend == "numpy":
        return _kmeans_assign_numpy(
            points, rows, id_col, vec_col, round_digits
        )

    cent_lit = F.array(
        *[
            F.struct(
                F.lit(-int(cid)).cast("long").alias("neg_cid"),
                F.lit(fold_norm(vec)).alias("norm"),
                F.array(*[F.lit(x) for x in vec]).alias("vec"),
            )
            for cid, vec in rows
        ]
    )
    pvec = _as_double(F.col(vec_col))
    scored = F.transform(
        cent_lit,
        lambda c: F.struct(
            F.round(
                _dot(pvec, c["vec"]) / (F.col("_pnorm") * c["norm"]),
                round_digits,
            ).alias("sim"),
            c["neg_cid"].alias("neg_cid"),
        ),
    )
    best = F.array_max(scored)
    return (
        points.withColumn("_pnorm", _norm(pvec))
        .withColumn("_best", best)
        .select(
            *points.columns,
            (-F.col("_best.neg_cid")).alias("cluster_id"),
            F.col("_best.sim").alias("cos_sim"),
        )
    )


def _kmeans_assign_numpy(
    points: DataFrame,
    cent_rows: "list[tuple[int, list[float]]]",
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """numpy backend for kmeans_assign: blocked matrix product against a
    broadcast centroid matrix, dimension-ordered accumulation (the same
    IEEE-left-fold discipline as embedding_cosine_pairs' kernel)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from noaa_oracle_spark.pipeline.dedup import spread

    def fold_norms(m: "np.ndarray") -> "np.ndarray":
        acc = m[:, 0] * m[:, 0]
        for i in range(1, m.shape[1]):
            acc = acc + m[:, i] * m[:, i]
        return np.sqrt(acc)

    c_ids = np.array([cid for cid, _ in cent_rows], dtype=np.int64)
    c_mat = np.stack(
        [np.asarray(v, dtype=np.float64) for _, v in cent_rows]
    )
    c_nrm = fold_norms(c_mat)
    bc = points.sparkSession.sparkContext.broadcast((c_ids, c_mat, c_nrm))

    schema = T.StructType(
        list(points.schema.fields)
        + [
            T.StructField("cluster_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )
    in_cols = points.columns

    def kernel(batches):
        ids_c, mat_c, nrm_c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat_p = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            nrm_p = fold_norms(mat_p)
            n, d = mat_p.shape
            # row-blocked, in-place dimension fold (r13 optimization
            # round, guide §4.2): per OUTPUT ELEMENT the operation
            # sequence is exactly the old ``dot = dot + outer(...)``
            # left fold over dims — row blocking and out= accumulation
            # change allocation, not arithmetic (bit-equality pinned in
            # tests/test_r13_opt_internals.py).  The old form allocated
            # a fresh n×k temporary per DIMENSION (64 × 80 MB at
            # k=1024/10k rows — memory-bandwidth-bound, measured 2.7×
            # slower than this blocked fold on the 1M-rung shape).
            best = np.empty(n, np.int64)
            best_sim = np.empty(n, np.float64)
            blk = 64
            for lo in range(0, n, blk):
                hi = min(lo + blk, n)
                acc = np.multiply.outer(mat_p[lo:hi, 0], mat_c[:, 0])
                tmp = np.empty_like(acc)
                for i in range(1, d):
                    np.multiply(
                        mat_p[lo:hi, i][:, None],
                        mat_c[:, i][None, :],
                        out=tmp,
                    )
                    acc += tmp
                sims = round_half_up(
                    acc / np.multiply.outer(nrm_p[lo:hi], nrm_c),
                    round_digits,
                )
                # argmax with lowest-cid tiebreak: cent_rows are sorted
                # by cid, and argmax returns the first maximal index
                b = sims.argmax(axis=1)
                best[lo:hi] = b
                best_sim[lo:hi] = sims[np.arange(hi - lo), b]
            out = pdf[in_cols].copy()
            out["cluster_id"] = ids_c[best]
            out["cos_sim"] = best_sim
            yield out

    return spread(points).mapInPandas(kernel, schema)


def kmeans_update(
    assigned: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
    round_digits: int = 6,
) -> DataFrame:
    """One Lloyd update step: per-cluster per-dimension mean, in long form
    (cluster_id, dim, centroid_val) — the reduce side of k-means.

    Plan shape: posexplode flattens each vector to (cluster, dim, value)
    rows JVM-side, then a single hash aggregation on (cluster, dim) with
    map-side partial averages — one shuffle whose key space is k × dim,
    tiny and perfectly uniform regardless of data skew. Long form avoids
    re-assembling arrays through collect_list (an order-sensitive,
    memory-hungry agg); callers that need array centroids pivot the k × dim
    result on the driver, where it is trivially small.
    """
    return (
        assigned.select(
            F.col(cluster_col).alias("cluster_id"),
            F.posexplode(_as_double(F.col(vec_col))).alias("dim", "val"),
        )
        .withColumn("dim", F.col("dim").cast("long"))
        .groupBy("cluster_id", "dim")
        .agg(F.round(F.avg("val"), round_digits).alias("centroid_val"))
    )


def lloyd_refine(
    corpus: DataFrame,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "numpy",
) -> DataFrame:
    """Train k centroids with `iters` Lloyd iterations, seeded from the k
    lowest-id corpus vectors — the IVF index-build step (`ivf_knn`'s
    `centroids` input).

    Each iteration is one distributed assign (kmeans_assign, numpy backend
    by default — the measured ~30× path) plus one distributed per-dimension
    mean (kmeans_update); only the k × dim long-form result is collected to
    re-seed the next round, which is kilobytes for any sane (k, dim).
    Empty clusters keep their previous centroid (the standard Lloyd
    degeneracy rule)."""
    seeds = corpus.sort(id_col).limit(k).select(id_col, vec_col)
    cent_rows = {
        int(r[0]): [float(x) for x in r[1]] for r in seeds.collect()
    }
    # remap seed ids to dense 0..k-1 so cell ids are stable across iters
    cent = {
        i: vec for i, (_, vec) in enumerate(sorted(cent_rows.items()))
    }
    spark = corpus.sparkSession
    for _ in range(iters):
        cent_df = spark.createDataFrame(
            [(cid, vec) for cid, vec in sorted(cent.items())],
            f"{id_col} long, {vec_col} array<double>",
        )
        assigned = kmeans_assign(
            corpus, cent_df, id_col=id_col, vec_col=vec_col, backend=backend
        )
        long_form = kmeans_update(assigned, vec_col=vec_col)
        new = {}
        for r in long_form.collect():
            new.setdefault(int(r["cluster_id"]), {})[int(r["dim"])] = float(
                r["centroid_val"]
            )
        cent = {
            cid: (
                [new[cid][d] for d in range(len(vec))]
                if cid in new
                else vec  # empty cluster: keep previous centroid
            )
            for cid, vec in cent.items()
        }
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in sorted(cent.items())],
        f"{id_col} long, {vec_col} array<double>",
    )


def cell_geometry(
    corpus: DataFrame,
    cell_centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "numpy",
) -> dict:
    """Inter/intra-cell variance diagnostic for the quantization ladder
    (round-6 verdict ask: make the measured "pick tier by geometry" rule
    machine-visible instead of docstring folklore).

    The 1M-vector ladder (SCALE.md) measured that residual IVF-PQ and
    low-dim Matryoshka prefixes WIN on clustered embeddings and LOSE
    badly on isotropic ones (residual recall 0.056 clustered vs 0.010
    isotropic): when cells capture no structure, residuals are as wide
    as the raw vectors and the extra machinery only adds quantization
    stages.  The scree for that rule is the classic scatter
    decomposition  total = within + between:

        within  = avg ||x − c(assign(x))||²   (intra-cell variance)
        between = total − within              (inter-cell variance)
        ratio   = between / within

    Isotropic data gives ratio ≈ 0 (cells explain nothing); clustered
    data gives ratio ≫ 0.  Callers should prefer the residual /
    prefix-truncation tiers only when ratio is comfortably positive
    (the ladder's measured crossover is around 1.0 — see
    `ivfpq_knn_residual(geometry_guard=True)`).

    Plan shape: one zero-shuffle assign (numpy backend), then ONE hash
    aggregation producing a single row — the global mean rides along as
    a per-dimension `avg` inside the same agg (no second corpus scan):
    total is recovered from E||x||² − ||E x||² driver-side.  Collects
    one row; nothing grows with corpus size."""
    import math

    cent_rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in cell_centroids.select(id_col, vec_col).collect()
    )
    if not cent_rows:
        raise ValueError("cell_geometry: empty centroid set")
    assigned = kmeans_assign(
        corpus.select(id_col, vec_col),
        cell_centroids,
        id_col=id_col,
        vec_col=vec_col,
        backend=backend,
    )
    cent_map = F.map_from_arrays(
        F.array(*[F.lit(cid) for cid, _ in cent_rows]),
        F.array(
            *[
                F.array(*[F.lit(float(x)) for x in vec])
                for _, vec in cent_rows
            ]
        ),
    )
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    resid2 = F.aggregate(
        F.zip_with(
            vec_d,
            F.element_at(cent_map, F.col("cluster_id").cast("int")),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm2 = F.aggregate(
        F.transform(vec_d, lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dim = len(cent_rows[0][1])
    row = assigned.agg(
        F.count("*").alias("n"),
        F.avg(resid2).alias("within"),
        F.avg(norm2).alias("e_norm2"),
        *[
            F.avg(F.element_at(vec_d, d + 1)).alias(f"_mu{d}")
            for d in range(dim)
        ],
    ).collect()[0]
    if int(row["n"]) == 0 or row["within"] is None:
        raise ValueError(
            "cell_geometry: empty corpus (or no decodable vectors) — "
            "nothing to diagnose"
        )
    mu2 = sum(float(row[f"_mu{d}"]) ** 2 for d in range(dim))
    total = float(row["e_norm2"]) - mu2
    within = float(row["within"])
    between = total - within
    ratio = between / within if within > 0 else math.inf
    return {
        "n": int(row["n"]),
        "k": len(cent_rows),
        "within": within,
        "between": between,
        "ratio": ratio,
    }


def prefix_energy(
    corpus: DataFrame,
    d_prefix: int,
    vec_col: str = "embedding",
) -> dict:
    """Matryoshka-tier sibling of `cell_geometry`: the fraction of the
    corpus' total per-dimension variance carried by the first `d_prefix`
    dimensions.  MRL-trained embeddings front-load information, so the
    prefix energy is far above the uniform floor d_prefix/d; embeddings
    WITHOUT matryoshka training sit at the floor, and `matryoshka_knn`'s
    prefix ranking degrades to chance (the measured 1M isotropic recall
    floor of 0.004–0.036, SCALE.md).

    One posexplode + dim-keyed var agg — dim rows, nothing scales with
    corpus size."""
    rows = (
        corpus.select(
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("dim", "v")
        )
        .groupBy("dim")
        .agg(F.var_pop("v").alias("var"))
        .collect()
    )
    var = {int(r["dim"]): float(r["var"]) for r in rows}
    total = sum(var.values())
    pre = sum(v for d, v in var.items() if d < d_prefix)
    dim = len(var)
    return {
        "dim": dim,
        "d_prefix": d_prefix,
        "energy": pre / total if total > 0 else 0.0,
        "uniform_floor": d_prefix / dim if dim else 0.0,
    }
