"""Product quantization (Jégou, Douze, Schmid — TPAMI 2011): the memory
lever of billion-scale similarity search.

A 64-dim float32 embedding is 256 bytes; its PQ code is `m` small
integers (8 bytes at m=8) — a 32× compression that is what actually lets
an ANN index hold a 100 TB corpus's vectors in cluster memory. The
pipeline:

  - `pq_train`: per-subspace k-means codebooks. Each vector splits into
    `m` contiguous subvectors; subspace s gets its own k-codeword
    codebook, trained with distributed Lloyd rounds (the same
    assign/update shape as `lloyd_refine` — map-side numpy assignment
    against broadcast codebooks, a (sub, code, dim) hash-agg mean whose
    key space is m·k·(dim/m) regardless of skew, and only that
    kilobyte-sized result crosses to the driver between rounds). Seeded
    from the k lowest-id vectors per subspace — deterministic, no RNG.
  - `pq_encode`: one assignment pass → (id, codes array<int>), the
    compressed corpus representation to persist.
  - `pq_knn`: asymmetric distance computation (ADC). Each query builds an
    m×k lookup table of exact partial squared distances to every
    codeword; a corpus code's approximate distance is the sum of m table
    lookups — no decompression, no per-pair float math. LUTs broadcast;
    the encoded corpus streams map-side with per-batch top-k pruning
    (the brute_force_knn discipline), so only k·|queries| candidates per
    partition reach the final window.

PQ is a EUCLIDEAN quantizer; for cosine semantics L2-normalize vectors
first (then ranking by L2 == ranking by cosine). Like `lloyd_refine`,
training is iterative-with-driver-coordination and has no SQL oracle —
tests anchor recall against the exact search and the code/LUT math
against independent numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from noaa_oracle_spark.pipeline.rounding import round_half_up


def _dim_of(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        raise ValueError("empty vector table")
    return int(row["d"])


def _subvectors(df: DataFrame, id_col: str, vec_col: str, m: int,
                sub_len: int) -> DataFrame:
    """(id, sub, svec) — contiguous slices, JVM-side. Spread first: a
    single-file corpus scans as one partition and would run the numpy
    assignment kernels on one core."""
    from noaa_oracle_spark.pipeline.dedup import spread

    df = spread(df)
    slices = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            s * sub_len + 1,
            sub_len,
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(slices).alias("sub", "svec")
    )


def _assign_codes(subs: DataFrame, books: "dict", id_col: str):
    """mapInPandas: nearest codeword per (sub) row, L2, lowest-code tie.
    `books` is {sub: (k, sub_len) float64 matrix} broadcast via closure.
    Distances are rounded at 6 dp before the argmin — the suite's
    cross-engine float convention (summation-order ulps must never flip a
    code between engines); the tie then breaks to the lowest code in both
    numpy (argmin returns the first minimum) and SQL (ORDER BY d, code)."""
    import numpy as np
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("sub", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_codes = np.empty(len(pdf), np.int32)
            svecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["svec"]]
            )
            sub_ids = pdf["sub"].to_numpy()
            for s in np.unique(sub_ids):
                mask = sub_ids == s
                cb = books[int(s)]  # k × sub_len
                d = round_half_up(_sq_dists(svecs[mask], cb), 6)
                out_codes[mask] = d.argmin(axis=1)  # first (lowest) code
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "sub": sub_ids.astype(np.int32),
                    "code": out_codes,
                }
            )

    return subs.mapInPandas(kernel, schema)


def _code_partials(
    corpus: DataFrame,
    books: "dict",
    sub_len: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One Lloyd-round pass: per partition, assign every vector's codes
    (`_encode_block` — the exact `_assign_codes` math) and scatter-add
    per-(sub, code, dim) component sums and counts.  Output is bounded
    at m·k·sub_len rows PER PARTITION (kilobytes) — the corpus never
    shuffles; only these partials cross to the mean aggregation."""
    import numpy as np
    import pandas as pd

    from noaa_oracle_spark.pipeline.dedup import spread

    m = len(books)
    n_codes = books[0].shape[0]
    schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
            T.StructField("d", T.IntegerType()),
            T.StructField("s", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def kernel(batches):
        sums = np.zeros((m, n_codes, sub_len), np.float64)
        counts = np.zeros((m, n_codes), np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            sv = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = _encode_block(sv, books, sub_len)
            for s in range(m):
                sub = sv[:, s * sub_len : (s + 1) * sub_len]
                np.add.at(sums[s], codes[:, s], sub)
                np.add.at(counts[s], codes[:, s], 1)
        if not seen:
            return
        subs_i, codes_i = np.nonzero(counts)
        if len(subs_i) == 0:
            return
        yield pd.DataFrame(
            {
                "sub": np.repeat(subs_i, sub_len).astype(np.int32),
                "code": np.repeat(codes_i, sub_len).astype(np.int32),
                "d": np.tile(
                    np.arange(sub_len, dtype=np.int32), len(subs_i)
                ),
                "s": sums[subs_i, codes_i].reshape(-1),
                "n": np.repeat(counts[subs_i, codes_i], sub_len),
            }
        )

    return spread(corpus.select(id_col, vec_col)).mapInPandas(
        kernel, schema
    )


CODEBOOK_SCHEMA = "sub int, code int, centroid array<double>"


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks; returns (sub, code, centroid).

    Each Lloyd round is one fused map-side kernel (`_code_partials`) +
    one bounded k·dim-key aggregate — zero corpus joins, zero row
    explosion (r10; the module docstring's stated shape, now the
    implemented one)."""
    import numpy as np

    spark = corpus.sparkSession

    # deterministic seeds: the k lowest-id vectors' subvectors.  The
    # dim comes off the collected seed rows (r12 optimization round) —
    # the separate `_dim_of` probe was one extra Spark job per train
    # whose answer these rows already carry.
    seed_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if not seed_rows:
        raise ValueError("empty vector table")
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} vectors to seed PQ")
    dim = len(seed_rows[0][1])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_len = dim // m
    seed = np.stack(
        [
            np.asarray([float(x) for x in r[1]], dtype=np.float64)
            for r in seed_rows
        ]
    )
    books: dict[int, "np.ndarray"] = {
        s: seed[:, s * sub_len : (s + 1) * sub_len].copy()
        for s in range(m)
    }

    # Each Lloyd round is ONE fused scan-stage kernel (assign via
    # `_encode_block` + scatter-add partial sums over whole vectors)
    # followed by ONE bounded hash-agg whose key space is m·k·sub_len =
    # k·dim regardless of corpus size or skew — the kmeans_update
    # discipline.  (The previous shape re-joined per-(id, sub)
    # assignments back to the exploded subvectors and dim-exploded the
    # result: a corpus-wide join plus a dim× row explosion per round.)
    for _ in range(iters):
        partials = _code_partials(
            corpus, books, sub_len, id_col, vec_col
        )
        means = (
            partials.groupBy("sub", "code", "d")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new = {s: books[s].copy() for s in books}
        for r in means:
            new[int(r["sub"])][int(r["code"]), int(r["d"])] = float(
                r["s"]
            ) / float(
                r["n"]
            )  # empty codes keep their previous centroid
        books = new

    rows = [
        (s, c, [float(x) for x in books[s][c]])
        for s in sorted(books)
        for c in range(k)
    ]
    df = spark.createDataFrame(rows, CODEBOOK_SCHEMA)
    # the trained rows are already driver-local — ride them on the frame
    # so `_books_dict` (encode / knn / ivfpq / save) never pays a Spark
    # collect job for values this function just computed (r12
    # optimization round).  Transformed frames lose the attribute and
    # fall back to the collect — same values either way.
    df._local_codebook_rows = rows
    return df


def _books_from_rows(rows) -> "dict":
    """Codebook dict from collected (sub, code, centroid) rows — shared
    by `_books_dict` (DataFrame input) and the metaio load path; rows
    index positionally so Rows and plain tuples both work."""
    import numpy as np

    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(int(r[0]), []).append(
            (int(r[1]), [float(x) for x in r[2]])
        )
    return {
        s: np.asarray(
            [v for _, v in sorted(items)], dtype=np.float64
        )
        for s, items in by_sub.items()
    }


def _books_dict(codebooks: DataFrame) -> "dict":
    # m·k rows — kilobytes by construction; frames built by pq_train /
    # load_pq_index carry their rows driver-local already (zero jobs)
    rows = getattr(codebooks, "_local_codebook_rows", None)
    if rows is None:
        rows = codebooks.collect()
    return _books_from_rows(rows)


def _probe_map(probes: DataFrame, q_index: "dict") -> "dict":
    """cluster_id → (probing q_ids int64[], their LUT rows int64[]) from
    the collected probe pairs — |Q|·nprobe rows, driver-bounded because
    the query set itself is already collected to build ADC LUTs."""
    import numpy as np

    cell_to_q: dict = {}
    for r in probes.collect():
        cell_to_q.setdefault(int(r["cluster_id"]), []).append(
            int(r["q_id"])
        )
    return {
        cid: (
            np.asarray(qids, dtype=np.int64),
            np.asarray([q_index[q] for q in qids], dtype=np.int64),
        )
        for cid, qids in cell_to_q.items()
    }


def _sq_dists(sub, cb):
    """(n × sub_len) row block vs (k × sub_len) codebook squared
    distances, one codebook row at a time — BIT-IDENTICAL to the
    broadcast form ``((sub[:, None, :] - cb[None, :, :]) ** 2).sum(
    axis=2)`` (same elementwise ops, same last-axis reduction order;
    pinned by tests/test_r13_opt_internals.py) without materializing
    the n×k×sub_len broadcast temporary, which at k=256 is ~160 MB per
    10k-row Arrow batch and made the encode memory-bandwidth-bound:
    measured 10.3× on the kernel (guide §4.2 — the r13 optimization
    round's 1M-rung finding)."""
    import numpy as np

    out = np.empty((sub.shape[0], cb.shape[0]), np.float64)
    for j in range(cb.shape[0]):
        out[:, j] = ((sub - cb[j]) ** 2).sum(axis=1)
    return out


def _encode_block(sv, books: "dict", sub_len: int, with_error: bool = False):
    """PQ-encode an (n × dim) float64 block: per subspace, 6-dp-rounded
    squared distances then first-minimum code — the `_assign_codes` math
    verbatim, applied to whole rows instead of exploded (id, sub) rows
    (per-(row, code) summation is independent of batch composition, so
    the two forms are bit-identical; asserted in tests).

    `with_error=True` also returns the per-row reconstruction error —
    the sum over subspaces of the chosen code's (already computed)
    squared distance, i.e. ‖x − decode(encode(x))‖² in the index's
    geometry.  Free: it reuses the argmin distances the encode computes
    anyway (r11 verdict ask #4 — the codebook-drift signal)."""
    import numpy as np

    m = len(books)
    codes = np.empty((sv.shape[0], m), np.int64)
    err = np.zeros(sv.shape[0], np.float64) if with_error else None
    for s in range(m):
        cb = books[s]
        sub = sv[:, s * sub_len : (s + 1) * sub_len]
        d = round_half_up(_sq_dists(sub, cb), 6)
        codes[:, s] = d.argmin(axis=1)  # first (lowest) code on ties
        if with_error:
            err += d.min(axis=1)
    if with_error:
        return codes, err
    return codes


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_error: bool = False,
    books: "dict | None" = None,
) -> DataFrame:
    """Compress: (id, codes array<int>) — the persisted representation.
    `with_error=True` adds a `qerr` double column (per-row
    reconstruction error, reused from the encode's own argmin
    distances) for the drift metric; callers drop it before persisting
    codes.

    Fused map-side form (r9 verdict ask #2): one `_encode_block` kernel
    over whole vectors on the scan stage — the exact `_assign_codes`
    math (slice, 6-dp round, first-minimum code), the same kernel the
    inline ivfpq plan runs.  The previous shape (explode to (id, sub)
    subvector rows → per-row assignment → groupBy(id) collect_list)
    carried the ONLY corpus-wide shuffle in the q100/q109 build path:
    an m× row explosion followed by a hash aggregate just to reassemble
    rows the scan already had intact.  Equality of the two forms is
    asserted in tests (per-(row, code) summation is independent of
    batch composition, so they are bit-identical); only the `spread`
    round-robin rebalance remains — needed so a single-file corpus
    doesn't encode on one core, a near-no-op at real input-split
    counts."""
    import numpy as np
    import pandas as pd

    from noaa_oracle_spark.pipeline.dedup import spread

    # `books` (r12 optimization round): callers that already hold the
    # collected codebook dict (load_pq_index attaches it) pass it in so
    # the per-call collect of the codebooks frame disappears; must be
    # _books_dict(codebooks) for the same frame — same values either way
    if books is None:
        books = _books_dict(codebooks)
    sub_len = books[0].shape[1]
    fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ]
    if with_error:
        fields.append(T.StructField("qerr", T.DoubleType()))
    schema = T.StructType(fields)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sv = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            out = {
                id_col: pdf[id_col].to_numpy(dtype=np.int64),
            }
            if with_error:
                codes, err = _encode_block(
                    sv, books, sub_len, with_error=True
                )
                out["codes"] = codes.astype(np.int32).tolist()
                out["qerr"] = err
            else:
                codes = _encode_block(sv, books, sub_len)
                out["codes"] = codes.astype(np.int32).tolist()
            yield pd.DataFrame(out)

    return spread(corpus.select(id_col, vec_col)).mapInPandas(kernel, schema)


def ivfpq_knn(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: DataFrame,
    cell_centroids: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plan: str = "inline",
) -> DataFrame:
    """IVF-PQ (the FAISS composition): coarse k-means cells bound WHICH
    codes are scored, PQ codes bound their MEMORY — the standard
    billion-scale index. Corpus vectors are routed to their nearest cell
    (`kmeans_assign`, numpy backend) and stored as (cell, codes); a query
    probes its `nprobe` nearest cells and runs ADC over only those cells'
    codes.

    At scale the encoded corpus is written partitioned by cell id, so a
    query touches nprobe partitions of 8-byte-per-vector codes — both
    the scan volume AND the bytes per scanned vector are bounded, which
    neither IVF-flat nor flat-PQ achieves alone. Cells and codebooks are
    both broadcast-sized by construction.

    Composition note: codes here quantize the RAW vectors (not cell
    residuals) — one shared codebook set, encode once, reuse across cell
    layouts; residual encoding squeezes more accuracy but couples codes
    to a specific coarse quantizer. Returns (q_id, rank, n_id,
    adc_dist).

    ``plan`` picks how probed cells meet the encoded corpus (r8 verdict
    weak-fix; the probe list is |Q|·nprobe rows — driver-bounded because
    the query set is already collected to build the ADC LUTs):
      * ``'inline'`` (default): collect the probe pairs and ship a
        cluster→queries map inside the existing LUT broadcast; the ADC
        kernel runs ON THE SCAN STAGE and fans each code row out to its
        probing queries — the corpus crosses ZERO exchanges and no
        ArrowEval sits downstream of a join (the measured ~2×
        BHJ→ArrowEvalPython structural penalty, SCALE.md §12).
      * ``'shuffle'``: shuffle-hash join on cluster_id (local-mode
        measured winner over broadcast for join plans).
      * ``'broadcast'``: the r6–r8 broadcast-join shape, kept
        measurable."""
    from noaa_oracle_spark.pipeline.similarity import kmeans_assign

    assigned = kmeans_assign(
        corpus.select(id_col, vec_col),
        cell_centroids,
        id_col=id_col,
        vec_col=vec_col,
        backend="numpy",
    )

    # query-side probes: nprobe nearest cells by the same cosine rule
    # ivf_knn uses (kmeans_assign ranks by cosine; reuse its scorer via a
    # small cross join — the centroid set is tiny by construction)
    from noaa_oracle_spark.pipeline.similarity import _as_double, _dot, _norm

    cent = cell_centroids.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(_as_double(F.col(vec_col))).alias("c_nrm"),
    )
    scored = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            _norm(_as_double(F.col(vec_col))).alias("q_nrm"),
        )
        .crossJoin(F.broadcast(cent))
        .select(
            "q_id",
            "c_id",
            F.round(
                _dot(_as_double(F.col("q_vec")), _as_double(F.col("c_vec")))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("a_sim"),
        )
    )
    wp = Window.partitionBy("q_id").orderBy(F.desc("a_sim"), F.asc("c_id"))
    probes = (
        scored.withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") <= nprobe)
        .select("q_id", F.col("c_id").alias("cluster_id"))
    )

    books = _books_dict(codebooks)
    m = len(books)
    sub_len = books[0].shape[1]
    n_codes = books[0].shape[0]
    import numpy as np

    q_rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in queries.select(id_col, vec_col).collect()
    )
    if not q_rows:
        raise ValueError("ivfpq_knn: empty query set")
    q_index = {qid: i for i, (qid, _) in enumerate(q_rows)}
    lut = np.empty((len(q_rows), m, n_codes), np.float64)
    for qi, (_, vec) in enumerate(q_rows):
        v = np.asarray(vec, dtype=np.float64)
        for s in range(m):
            qsub = v[s * sub_len : (s + 1) * sub_len]
            lut[qi, s] = ((books[s] - qsub[None, :]) ** 2).sum(axis=1)

    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("n_id", T.LongType()),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    if plan == "inline":
        # cluster → (probing q_ids, their LUT rows): |Q|·nprobe pairs,
        # bounded because the query set is collected above anyway.  The
        # probe ranking itself still runs in Spark (same expressions as
        # the join plans — bit-identical tie behavior).
        cell_map = _probe_map(probes, q_index)
        bc = queries.sparkSession.sparkContext.broadcast(
            (cell_map, lut, books)
        )

        def kernel_inline(batches):
            cmap, lut_, books_ = bc.value
            subs_idx = np.arange(lut_.shape[1])
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cids = pdf["cluster_id"].to_numpy(dtype=np.int64)
                hits = [cmap.get(int(c)) for c in cids]
                counts = np.asarray(
                    [0 if h is None else len(h[0]) for h in hits]
                )
                keep = counts > 0
                if not keep.any():
                    continue
                ids_n = pdf[id_col].to_numpy(dtype=np.int64)[keep]
                # map-side PQ encode of the SURVIVING rows — the exact
                # _assign_codes math (slice, 6-dp round, first-min code)
                sv = np.stack(
                    [
                        np.asarray(v, dtype=np.float64)
                        for v in pdf[vec_col].to_numpy()[keep]
                    ]
                )
                codes = _encode_block(sv, books_, sub_len)
                rep = counts[keep]
                ids_rep = np.repeat(ids_n, rep)
                codes_rep = np.repeat(codes, rep, axis=0)
                qs = np.concatenate([h[0] for h in hits if h is not None])
                rowsq = np.concatenate(
                    [h[1] for h in hits if h is not None]
                )
                # 6-dp rounding BEFORE ranking: the suite's float rule
                dists = round_half_up(
                    lut_[
                        rowsq[:, None], subs_idx[None, :], codes_rep
                    ].sum(axis=1),
                    6,
                )
                yield pd.DataFrame(
                    {"q_id": qs, "n_id": ids_rep, "adc_dist": dists}
                )

        cand_src = assigned.select(
            id_col, vec_col, "cluster_id"
        ).mapInPandas(kernel_inline, schema)
    elif plan in ("shuffle", "broadcast"):
        encoded = pq_encode(
            corpus, codebooks, id_col=id_col, vec_col=vec_col
        )
        celled = encoded.join(assigned.select(id_col, "cluster_id"), id_col)
        probe_side = (
            F.broadcast(probes)
            if plan == "broadcast"
            else probes.hint("shuffle_hash")
        )
        cand_codes = celled.join(probe_side, "cluster_id").select(
            F.col("q_id").alias("probe_q"), id_col, "codes"
        )
        bc = queries.sparkSession.sparkContext.broadcast((q_index, lut))

        def kernel_join(batches):
            qidx, lut_ = bc.value
            subs_idx = np.arange(lut_.shape[1])
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                qs = pdf["probe_q"].to_numpy(dtype=np.int64)
                ids_n = pdf[id_col].to_numpy(dtype=np.int64)
                codes = np.stack(
                    [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
                )
                rowsq = np.asarray([qidx[int(q)] for q in qs])
                dists = round_half_up(
                    lut_[rowsq[:, None], subs_idx[None, :], codes].sum(
                        axis=1
                    ),
                    6,
                )
                yield pd.DataFrame(
                    {"q_id": qs, "n_id": ids_n, "adc_dist": dists}
                )

        cand_src = cand_codes.mapInPandas(kernel_join, schema)
    else:
        raise ValueError(f"ivfpq_knn: unknown plan {plan!r}")

    cand = cand_src.filter(F.col("q_id") != F.col("n_id"))
    w = Window.partitionBy("q_id").orderBy(
        F.asc("adc_dist"), F.asc("n_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id", "rank", "n_id", F.round("adc_dist", 6).alias("adc_dist")
        )
    )


def ivfpq_knn_residual(
    queries: DataFrame,
    corpus: DataFrame,
    cell_centroids: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 0,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    geometry_guard: bool = False,
    plan: str = "inline",
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the accuracy-coupled FAISS form:
    each vector is assigned to its nearest coarse cell and its RESIDUAL
    (vector − cell centroid) is what the PQ codebooks quantize. Residuals
    concentrate near the origin, so the same code budget buys markedly
    lower quantization error than raw-vector codes — at the cost that
    codes are only meaningful relative to their cell (re-clustering
    forces re-encoding, the tradeoff ivfpq_knn's docstring names).

    Query side: ADC distance needs a PER-(query, cell) lookup table —
    ||(q − c_cell) − codeword||² — instead of flat PQ's per-query table;
    nprobe bounds that to nprobe tables per query, built driver-side from
    the broadcast-sized centroid and codebook sets.

    Plan shape mirrors ivfpq_knn, including its ``plan`` ladder:
    ``'inline'`` (default) runs the residual-encode + ADC fan-out in ONE
    kernel on the assignment stage — the corpus crosses zero exchanges
    between scan and candidate generation; ``'shuffle'``/``'broadcast'``
    keep the r6–r8 encode→join→probes-join shapes measurable. Codebooks
    train on residuals with the same deterministic lowest-id seeding;
    `iters` Lloyd rounds (0 = seed codebooks, the SQL-oracle-able form).

    Returns (q_id, rank, n_id, adc_dist) with the suite's 6-dp
    rounded-before-ranking float convention.

    Geometry rule (measured, SCALE.md 1M ladder): residual encoding WINS
    on clustered corpora (recall 0.056 vs plain ivfpq 0.002) and LOSES
    on isotropic ones (0.010 vs sq8's 0.978) — residuals of random cells
    are ~√2× as wide as the vectors themselves.  Pass
    ``geometry_guard=True`` to have `similarity.cell_geometry` measure
    the between/within-cell variance ratio (two extra bounded jobs) and
    warn when it is below 1.0, i.e. when flat PQ / SQ8 is the right
    tier; the default stays off so index-build plans and benches are
    unchanged."""
    import warnings

    import numpy as np
    import pandas as pd

    from noaa_oracle_spark.pipeline.similarity import (
        cell_geometry,
        kmeans_assign,
    )

    if geometry_guard:
        geo = cell_geometry(
            corpus, cell_centroids, id_col=id_col, vec_col=vec_col
        )
        if geo["ratio"] < 1.0:
            warnings.warn(
                "ivfpq_knn_residual: between/within cell variance ratio "
                f"{geo['ratio']:.3f} < 1.0 — cells capture little "
                "structure (isotropic geometry); residual encoding "
                "measured WORSE than flat PQ/SQ8 here, prefer those "
                "tiers (SCALE.md quantization ladder)",
                stacklevel=2,
            )

    spark = corpus.sparkSession
    cent_rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in cell_centroids.select(id_col, vec_col).collect()
    )
    if not cent_rows:
        raise ValueError("ivfpq_knn_residual: empty centroid set")
    # dim off the collected centroids (r12 optimization round — the
    # `_dim_of` probe was one extra Spark job whose answer these rows
    # already carry; centroids ARE corpus vectors by construction, and
    # a corpus/centroid dim mismatch still fails loudly in the
    # kmeans_assign kernel's numpy arithmetic)
    dim = len(cent_rows[0][1])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_len = dim // m
    c_ids = [cid for cid, _ in cent_rows]
    c_mat = np.asarray([v for _, v in cent_rows], dtype=np.float64)
    c_index = {cid: i for i, cid in enumerate(c_ids)}

    assigned = kmeans_assign(
        corpus.select(id_col, vec_col),
        cell_centroids,
        id_col=id_col,
        vec_col=vec_col,
        backend="numpy",
    ).select(id_col, vec_col, "cluster_id")

    # residual = vector − centroid(cluster): map-side zip_with against the
    # broadcast centroid literal map (tiny by construction)
    cent_map = F.map_from_arrays(
        F.array(*[F.lit(cid) for cid in c_ids]),
        F.array(
            *[
                F.array(*[F.lit(float(x)) for x in vec])
                for _, vec in cent_rows
            ]
        ),
    )
    residuals = assigned.select(
        F.col(id_col),
        F.col("cluster_id"),
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.element_at(cent_map, F.col("cluster_id").cast("int")),
            lambda a, b: a - b,
        ).alias("_resid"),
    )

    books = pq_train(
        residuals.select(F.col(id_col), F.col("_resid").alias(vec_col)),
        m=m,
        k=k_codes,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    bdict = _books_dict(books)

    # query probes: nprobe nearest cells by cosine (the ivfpq_knn rule)
    cent = cell_centroids.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        _norm_of(vec_col).alias("c_nrm"),
    )
    scored = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            _norm_of(vec_col).alias("q_nrm"),
        )
        .crossJoin(F.broadcast(cent))
        .select(
            "q_id",
            "c_id",
            F.round(
                _dot_of("q_vec", "c_vec") / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("a_sim"),
        )
    )
    wp = Window.partitionBy("q_id").orderBy(F.desc("a_sim"), F.asc("c_id"))
    probes = (
        scored.withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") <= nprobe)
        .select("q_id", F.col("c_id").alias("cluster_id"))
    )
    # per-(query, probed-cell) residual LUTs, driver-built: |Q|·nprobe·m·k
    # exact partial distances — broadcast-sized by construction
    q_rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in queries.select(id_col, vec_col).collect()
    )
    if not q_rows:
        raise ValueError("ivfpq_knn_residual: empty query set")
    q_index = {qid: i for i, (qid, _) in enumerate(q_rows)}
    n_codes = bdict[0].shape[0]
    lut = np.empty((len(q_rows), len(c_ids), m, n_codes), np.float64)
    for qi, (_, vec) in enumerate(q_rows):
        v = np.asarray(vec, dtype=np.float64)
        for ci_ in range(len(c_ids)):
            qr = v - c_mat[ci_]  # query residual w.r.t. this cell
            for s in range(m):
                qsub = qr[s * sub_len : (s + 1) * sub_len]
                lut[qi, ci_, s] = ((bdict[s] - qsub[None, :]) ** 2).sum(
                    axis=1
                )
    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("n_id", T.LongType()),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    if plan == "inline":
        cell_map = _probe_map(probes, q_index)
        bc = spark.sparkContext.broadcast((cell_map, c_index, lut, bdict))

        def kernel_inline(batches):
            cmap, cidx, lut_, books_ = bc.value
            subs_idx = np.arange(lut_.shape[2])
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cids = pdf["cluster_id"].to_numpy(dtype=np.int64)
                hits = [cmap.get(int(c)) for c in cids]
                counts = np.asarray(
                    [0 if h is None else len(h[0]) for h in hits]
                )
                keep = counts > 0
                if not keep.any():
                    continue
                ids_n = pdf[id_col].to_numpy(dtype=np.int64)[keep]
                sv = np.stack(
                    [
                        np.asarray(v, dtype=np.float64)
                        for v in pdf["_resid"].to_numpy()[keep]
                    ]
                )
                codes = _encode_block(sv, books_, sub_len)
                rep = counts[keep]
                ids_rep = np.repeat(ids_n, rep)
                codes_rep = np.repeat(codes, rep, axis=0)
                rc_rep = np.repeat(
                    np.asarray([cidx[int(c)] for c in cids[keep]]), rep
                )
                qs = np.concatenate([h[0] for h in hits if h is not None])
                rq = np.concatenate([h[1] for h in hits if h is not None])
                dists = round_half_up(
                    lut_[
                        rq[:, None],
                        rc_rep[:, None],
                        subs_idx[None, :],
                        codes_rep,
                    ].sum(axis=1),
                    6,
                )
                yield pd.DataFrame(
                    {"q_id": qs, "n_id": ids_rep, "adc_dist": dists}
                )

        cand_src = residuals.select(
            id_col, "cluster_id", "_resid"
        ).mapInPandas(kernel_inline, schema)
    elif plan in ("shuffle", "broadcast"):
        encoded = pq_encode(
            residuals.select(F.col(id_col), F.col("_resid").alias(vec_col)),
            books,
            id_col=id_col,
            vec_col=vec_col,
        )
        celled = encoded.join(
            residuals.select(id_col, "cluster_id"), id_col
        )
        probe_side = (
            F.broadcast(probes)
            if plan == "broadcast"
            else probes.hint("shuffle_hash")
        )
        cand_codes = celled.join(probe_side, "cluster_id").select(
            F.col("q_id").alias("probe_q"),
            F.col(id_col),
            "codes",
            "cluster_id",
        )
        bc = spark.sparkContext.broadcast((q_index, c_index, lut))

        def kernel_join(batches):
            qidx, cidx, lut_ = bc.value
            subs_idx = np.arange(lut_.shape[2])
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                qs = pdf["probe_q"].to_numpy(dtype=np.int64)
                ids_n = pdf[id_col].to_numpy(dtype=np.int64)
                cells_n = pdf["cluster_id"].to_numpy(dtype=np.int64)
                codes = np.stack(
                    [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
                )
                rq = np.asarray([qidx[int(x)] for x in qs])
                rc = np.asarray([cidx[int(x)] for x in cells_n])
                dists = round_half_up(
                    lut_[
                        rq[:, None], rc[:, None], subs_idx[None, :], codes
                    ].sum(axis=1),
                    6,
                )
                yield pd.DataFrame(
                    {"q_id": qs, "n_id": ids_n, "adc_dist": dists}
                )

        cand_src = cand_codes.mapInPandas(kernel_join, schema)
    else:
        raise ValueError(f"ivfpq_knn_residual: unknown plan {plan!r}")

    cand = cand_src.filter(F.col("q_id") != F.col("n_id"))
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id", "rank", "n_id", F.round("adc_dist", 6).alias("adc_dist")
        )
    )


def _norm_of(vec_col: str):
    from noaa_oracle_spark.pipeline.similarity import _as_double, _norm

    return _norm(_as_double(F.col(vec_col)))


def _dot_of(a: str, b: str):
    from noaa_oracle_spark.pipeline.similarity import _as_double, _dot

    return _dot(_as_double(F.col(a)), _as_double(F.col(b)))


def pq_knn(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: "dict | None" = None,
) -> DataFrame:
    """ADC top-k: (q_id, rank, n_id, adc_dist) over the ENCODED corpus —
    the corpus vectors themselves are never touched.  `books` is the
    load_pq_index pass-through economy (see pq_encode)."""
    import numpy as np
    import pandas as pd

    if books is None:
        books = _books_dict(codebooks)
    m = len(books)
    sub_len = books[0].shape[1]
    n_codes = books[0].shape[0]
    q_rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in queries.select(id_col, vec_col).collect()
    )
    if not q_rows:
        raise ValueError("pq_knn: empty query set")
    q_ids = np.asarray([i for i, _ in q_rows], dtype=np.int64)
    # LUT[q, sub, code] = ||query_sub − codeword||²  (exact partials)
    lut = np.empty((len(q_rows), m, n_codes), np.float64)
    for qi, (_, vec) in enumerate(q_rows):
        v = np.asarray(vec, dtype=np.float64)
        for s in range(m):
            qsub = v[s * sub_len : (s + 1) * sub_len]
            lut[qi, s] = ((books[s] - qsub[None, :]) ** 2).sum(axis=1)
    bc = queries.sparkSession.sparkContext.broadcast((q_ids, lut))

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("n_id", T.LongType()),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )
    kk = k

    def kernel(batches):
        ids_q, lut_ = bc.value
        subs_idx = np.arange(lut_.shape[1])
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_n = pdf[id_col].to_numpy(dtype=np.int64)
            codes = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )  # n × m
            # dists[q, n] = Σ_s LUT[q, s, codes[n, s]] — rounded at 6 dp
            # BEFORE ranking (cross-engine float convention: the id
            # tiebreak must see the same ordering an oracle engine sees)
            gathered = lut_[:, subs_idx[None, :], codes]  # q × n × m
            dists = round_half_up(gathered.sum(axis=2), 6)
            # k+1: a query drawn from the corpus sits in some batch at
            # distance ~0; keeping one extra candidate means the post-hoc
            # self-filter can never cost a true top-k member
            take = min(kk + 1, dists.shape[1])
            idx = np.lexsort(
                (np.broadcast_to(ids_n, dists.shape), dists), axis=-1
            )[:, :take]
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(ids_q, take),
                    "n_id": ids_n[idx].ravel(),
                    "adc_dist": np.take_along_axis(
                        dists, idx, axis=1
                    ).ravel(),
                }
            )

    cand = encoded.mapInPandas(kernel, schema).filter(
        F.col("q_id") != F.col("n_id")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.asc("adc_dist"), F.asc("n_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("adc_dist", 6).alias("adc_dist"))
    )


def ivfpq_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: DataFrame,
    cell_centroids: DataFrame,
    k: int = 5,
    rerank: int = 20,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plan: str = "inline",
) -> DataFrame:
    """IVF-PQ candidate generation + EXACT re-ranking — the two-stage
    shape every deployed ANN service actually runs (FAISS's
    `IndexRefineFlat`, ScaNN's reordering stage): the compressed index
    nominates `rerank` candidates per query by ADC, then only those
    candidate ids' RAW vectors are fetched and scored exactly, and the
    final top-`k` ranks by true cosine.  ADC error then costs recall
    only when a true neighbor falls outside the candidate list entirely
    — quantization noise inside the list is corrected for free.

    Scale shape: the expensive index scan is `ivfpq_knn` unchanged
    (cells bound which codes are scored, codes bound their memory); the
    refinement joins a `|queries| x rerank`-row candidate list —
    broadcast-sized by construction — against the raw corpus, so the
    full-precision vectors are read exactly once for candidates and
    never shuffled (in a real deployment this is the "refine from
    storage" random-read tier).  Exact scores round at 6 dp before the
    final per-query window (sim DESC, id ASC) — the suite's cross-engine
    float rule.  Returns (q_id, rank, n_id, cos_sim)."""
    from noaa_oracle_spark.pipeline.similarity import _as_double, _dot, _norm

    cands = ivfpq_knn(
        queries,
        corpus,
        codebooks,
        cell_centroids,
        k=rerank,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        plan=plan,
    ).select("q_id", "n_id")
    refined = corpus.select(
        F.col(id_col).alias("n_id"),
        _as_double(F.col(vec_col)).alias("n_vec"),
    ).join(F.broadcast(cands), "n_id")
    qv = queries.select(
        F.col(id_col).alias("q_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
    )
    exact = refined.join(F.broadcast(qv), "q_id").select(
        "q_id",
        "n_id",
        F.round(
            _dot(F.col("q_vec"), F.col("n_vec"))
            / (_norm(F.col("q_vec")) * _norm(F.col("n_vec"))),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos_sim")
    )


# ---------------------------------------------------------------------------
# OPQ — Optimized Product Quantization (Ge, He, Ke, Sun — CVPR 2013).
#
# PQ quantizes contiguous subvectors independently, so its error grows when
# variance is concentrated in a few correlated dimensions (real embedding
# models, PCA'd features).  OPQ prepends an orthogonal rotation R chosen to
# decorrelate dimensions and BALANCE variance across the m subspaces; the
# parametric solution needs only the dim×dim covariance: rotate onto the
# eigenbasis, then permute eigenvectors so each subspace receives an equal
# share of the spectrum (greedy log-eigenvalue balancing).
#
# Scale shape: the covariance is a map-side partial X'X per Arrow batch
# (dim² doubles each) summed through one (i, j)-keyed aggregation whose key
# space is dim² regardless of corpus size — at 64 dims that is 4096 rows to
# the driver, broadcast-sized by definition.  The rotation applies map-side
# (numpy GEMM per batch, or a pure column expression for the Householder
# special case), so the OPQ pipeline adds ZERO shuffles beyond pq_train's.
# ---------------------------------------------------------------------------


def covariance_matrix(
    corpus: DataFrame,
    vec_col: str = "embedding",
    center: bool = True,
) -> "tuple":
    """(mean, cov) of the vector column as numpy arrays, computed with one
    distributed pass: per-batch partial (count, Σx, X'X) flattened to
    (i, j, s) rows, summed by key (dim² keys — uniform, skew-free), and
    assembled on the driver."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("s", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def partial(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d = x.shape[1]
            xtx = x.T @ x  # d × d partial second moment
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            # row i = -1 carries the per-batch sum vector (first moment)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([ii.ravel(), -np.ones(d, np.int64)]),
                    "j": np.concatenate([jj.ravel(), np.arange(d)]),
                    "s": np.concatenate([xtx.ravel(), x.sum(axis=0)]),
                    "n": np.concatenate(
                        [np.zeros(d * d, np.int64), np.full(d, len(x))]
                    ),
                }
            )

    rows = (
        corpus.select(vec_col)
        .mapInPandas(partial, schema)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )  # dim² + dim rows — kilobytes at embedding dims
    if not rows:
        raise ValueError("covariance_matrix: empty corpus")
    dim = 1 + max(int(r["j"]) for r in rows)
    xtx = np.zeros((dim, dim))
    sx = np.zeros(dim)
    n = 0
    for r in rows:
        if int(r["i"]) < 0:
            sx[int(r["j"])] = float(r["s"])
            if int(r["j"]) == 0:
                n = int(r["n"])  # every dim carries the same row count
        else:
            xtx[int(r["i"]), int(r["j"])] = float(r["s"])
    if n == 0:
        raise ValueError("covariance_matrix: empty corpus")
    mean = sx / n
    cov = xtx / n - (np.outer(mean, mean) if center else 0.0)
    return mean, cov


def opq_train_rotation(
    corpus: DataFrame,
    m: int = 8,
    vec_col: str = "embedding",
) -> "object":
    """Parametric OPQ (Ge et al. CVPR 2013 §4): R = eigenbasis of the data
    covariance with eigenvectors PERMUTED so the m subspaces carry equal
    variance — assign eigenvalues (descending) greedily to the subspace
    with the smallest running log-eigenvalue product that still has free
    slots.  Deterministic given the covariance (ties break to the lowest
    subspace index).  Returns R as a dim×dim numpy array; rotated = R @ x."""
    import numpy as np

    _, cov = covariance_matrix(corpus, vec_col)
    dim = cov.shape[0]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_len = dim // m
    evals, evecs = np.linalg.eigh(cov)  # ascending, orthonormal columns
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]

    # Greedy LPT balance of per-subspace log-eigenvalue sums.  Balancing
    # the raw log sums directly degenerates when eigenvalues are < 1
    # (all logs negative: the smallest bucket keeps winning and collects
    # every remaining small eigenvalue — a rich-get-poorer spiral that
    # reproduces the identity permutation on decaying spectra).  Because
    # every bucket holds exactly sub_len items, balance is invariant to a
    # constant shift per item, so shift logs positive and run standard
    # LPT: largest first, into the bucket with the smallest running sum.
    logs = np.log(np.maximum(evals, 1e-12))
    shifted = logs - logs.min() + 1e-9
    sums = np.zeros(m)
    slots = [sub_len] * m
    buckets: list[list[int]] = [[] for _ in range(m)]
    for idx in range(dim):
        open_subs = [b for b in range(m) if slots[b] > 0]
        b = min(open_subs, key=lambda s: (sums[s], s))
        buckets[b].append(idx)
        sums[b] += float(shifted[idx])
        slots[b] -= 1
    perm = [i for b in range(m) for i in buckets[b]]
    # rows of R are the permuted eigenvectors: (R @ x)[d] = evec_perm[d]·x
    return evecs[:, perm].T


def rotate_embeddings(
    corpus: DataFrame,
    rotation: "object",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply a dim×dim rotation map-side: (id, rotated vec) with
    rotated = R @ x per row, numpy GEMM per Arrow batch, R broadcast via
    closure (dim² doubles).  No shuffle, no driver data path."""
    import numpy as np
    import pandas as pd

    r_mat = np.asarray(rotation, dtype=np.float64)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(vec_col, T.ArrayType(T.DoubleType())),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            rx = x @ r_mat.T
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), vec_col: list(rx)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(kernel, schema)


def householder_rotate(
    corpus: DataFrame,
    v: "list[float]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SQL-expressible rotation rung: reflect across the hyperplane
    normal to `v` (H = I − 2vvᵀ/‖v‖², orthogonal by construction),
    exactly mirrorable in DuckDB list lambdas (the q109 oracle).

    Computed as an Arrow-batched numpy kernel (guide §4.2; r12
    optimization round — the previous higher-order-function column
    expression evaluated interpreted per element and dominated the
    q109 profile).  Bit-equality with the SQL shape is preserved by
    summing BOTH dot products left-to-right over dims — a Python loop
    of vectorized per-dim multiply-adds, the same IEEE operation order
    as a sequential `aggregate(acc + x)` / DuckDB `list_sum` — and the
    per-element `x − scale·vᵢ` is one multiply and one subtract either
    way (equality-tested against the expression form)."""
    import numpy as np
    import pandas as pd

    varr = np.asarray([float(x) for x in v], dtype=np.float64)
    vv = 0.0
    for x in varr:
        vv += float(x) * float(x)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(vec_col, T.ArrayType(T.DoubleType())),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(row, dtype=np.float64) for row in pdf[vec_col]]
            )
            dot = np.zeros(len(x))
            for j in range(x.shape[1]):  # left-to-right over dims
                dot = dot + x[:, j] * varr[j]
            scale = 2.0 * dot / vv
            rot = x - scale[:, None] * varr[None, :]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), vec_col: list(rot)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# index persistence — train once, serve many
# ---------------------------------------------------------------------------

_PQ_MANIFEST_SCHEMA = (
    "format_version int, m int, n_codes int, dim int, metric string, "
    "has_cells boolean, codebook_md5 string, n_encoded long, "
    "rotation array<double>, n_code_files long, min_id long"
)


def _write_pq_manifest(
    spark,
    path: str,
    m: int,
    n_codes: int,
    dim: int,
    metric: str,
    has_cells: bool,
    codebook_md5: str,
    n_encoded: int,
    rotation=None,
    n_code_files: "int | None" = None,
    min_id: "int | None" = None,
) -> None:
    """Write the 1-row index manifest — ALWAYS last (crash-consistency
    contract: every save/append/merge/compact fingerprints its other
    components first, so a write that dies mid-way leaves a manifest
    mismatch `load_pq_index` rejects loudly).  `rotation` is the OPQ
    rotation R as a row-major flattened dim×dim list, or None for
    unrotated indexes — persisted so an OPQ-trained index round-trips
    to the serving tier (r10 verdict: without it, queries against a
    saved index skip the rotate and return wrong neighbors).

    `n_code_files` / `min_id` are the codes FILE ledger and id floor
    (r13 optimization round — `_bm25_write_manifest`'s twin):
    `load_pq_index` validates against the ledger with one O(1)
    globStatus listing (instead of a Spark count whose listing cost
    grows with accumulated appends) and serves `min_vec_id` straight
    from the manifest.  Derivation is the CALLER's responsibility:
    fresh-directory writers (save / merge / compact) record the
    on-disk count after their own writes; `append_pq_index` records
    old-ledger + its own file delta — a fresh directory count there
    would adopt a previous tear's orphan files and heal what must stay
    loudly broken.  None (legacy manifest) keeps the row-count
    validation path at load."""
    from noaa_oracle_spark.pipeline.metaio import write_meta_rows

    flat = None
    if rotation is not None:
        import numpy as np

        r_mat = np.asarray(rotation, dtype=np.float64)
        if r_mat.shape != (dim, dim):
            raise ValueError(
                f"pq manifest: rotation shape {r_mat.shape} != "
                f"({dim}, {dim})"
            )
        flat = [float(x) for x in r_mat.reshape(-1)]
    # metaio write (r12 optimization round): one Hadoop-FS file write,
    # zero Spark jobs — same parquet bytes, same layout on disk
    write_meta_rows(
        spark,
        f"{path}/manifest",
        _PQ_MANIFEST_SCHEMA,
        [
            (
                1,
                int(m),
                int(n_codes),
                int(dim),
                metric,
                bool(has_cells),
                codebook_md5,
                int(n_encoded),
                flat,
                None if n_code_files is None else int(n_code_files),
                None if min_id is None else int(min_id),
            )
        ],
    )


def _manifest_rotation(meta) -> "object | None":
    """The dim×dim numpy rotation stored in a manifest Row, or None.
    Reads via getattr so pre-rotation manifests (saved before the
    `rotation` field existed) keep loading."""
    flat = getattr(meta, "rotation", None)
    if flat is None:
        return None
    import numpy as np

    dim = int(meta.dim)
    r_mat = np.asarray(flat, dtype=np.float64)
    if r_mat.size != dim * dim:
        raise ValueError(
            f"pq manifest: rotation has {r_mat.size} values, expected "
            f"{dim * dim}"
        )
    return r_mat.reshape(dim, dim)


def _rotation_md5(rotation) -> str:
    """Fingerprint of a rotation (or 'identity' for None) — merge
    compatibility: codes from indexes rotated differently are
    meaningless against each other."""
    if rotation is None:
        return "identity"
    import hashlib
    import numpy as np

    r_mat = np.asarray(rotation, dtype=np.float64)
    h = hashlib.md5()
    h.update(",".join(f"{x:.9g}" for x in r_mat.reshape(-1)).encode())
    return h.hexdigest()


def _codebook_md5(books: "dict") -> str:
    """Deterministic fingerprint of the codebook contents: md5 over the
    (sub, code, 6-dp centroid) rows in canonical order."""
    import hashlib

    h = hashlib.md5()
    for sub in sorted(books):
        for code, row in enumerate(books[sub]):
            h.update(
                f"{sub}|{code}|"
                f"{','.join(f'{x:.6f}' for x in row)}\n".encode()
            )
    return h.hexdigest()


def save_pq_index(
    codebooks: DataFrame,
    encoded: DataFrame,
    path: str,
    cells: DataFrame | None = None,
    metric: str = "l2_adc",
    rotation=None,
) -> None:
    """Persist a trained PQ index — codebooks + encoded corpus (+ coarse
    cells for IVF) — as parquet under `path`, with a 1-row manifest
    carrying the quantizer geometry, a codebook content fingerprint,
    and the encoded row count.  At 100 TB the index is trained and
    encoded ONCE and served many times; without persistence every
    session would re-pay the encode pass over the full corpus.  Parquet
    (not pickle) so any engine — and any later version of this one —
    can read the index back; the layout is plain directories a catalog
    can register as tables.

    Crash consistency: the manifest is written LAST and fingerprints
    the other components, so a save that dies mid-way — including a
    RE-save over an existing index with same-geometry retrained
    codebooks — leaves a directory whose (old) manifest no longer
    matches the (new) components, and `load_pq_index` fails loudly
    instead of decoding codes against the wrong codebooks.

    `rotation` (OPQ): the dense dim×dim R the corpus was rotated with
    BEFORE encoding (`opq_train_rotation` → `rotate_embeddings`).  It
    rides in the manifest so the serving tier rotates query vectors the
    same way — an OPQ index saved without it would score unrotated
    queries against rotated codes and return wrong neighbors.

    Layout: path/codebooks (sub, code, centroid), path/codes
    (vec_id, codes), path/cells (vec_id, embedding; IVF only),
    path/manifest."""
    from noaa_oracle_spark.pipeline.metaio import write_meta_rows

    spark = codebooks.sparkSession
    # collect once: the rows feed the books dict, the fingerprint, AND
    # the codebooks write (metaio — KB-scale, corpus-size-independent;
    # the Spark write job it replaces was pure scheduling overhead)
    cb_rows = [
        (int(r[0]), int(r[1]), [float(x) for x in r[2]])
        for r in (
            getattr(codebooks, "_local_codebook_rows", None)
            or codebooks.collect()
        )
    ]
    books = _books_from_rows(cb_rows)
    m = len(books)
    n_codes, sub_len = books[0].shape
    write_meta_rows(spark, f"{path}/codebooks", CODEBOOK_SCHEMA, cb_rows)
    # the manifest count rides the codes write as an observed metric
    # (r12 optimization round): the CollectMetrics node sits directly
    # under the write, i.e. in the write's result stage, where Spark
    # applies accumulator updates exactly once per committed partition —
    # the count is the rows the committed write produced, replacing a
    # full re-read job.  The crash contract is unchanged (manifest still
    # written last), and every validated load re-checks this count
    # against the on-disk files.
    from pyspark.sql import Observation

    obs = Observation()
    enc_id = [
        c for c in encoded.columns if c not in ("codes", "cluster_id")
    ][0]
    (
        encoded.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.min(F.col(enc_id)).alias("lo"),
        )
        .write.mode("overwrite")
        .parquet(f"{path}/codes")
    )
    if cells is not None:
        cells.write.mode("overwrite").parquet(f"{path}/cells")
    vals = obs.get
    n_encoded = int(vals["n"])
    from noaa_oracle_spark.pipeline.text import _parquet_file_count

    _write_pq_manifest(
        spark,
        path,
        m=m,
        n_codes=int(n_codes),
        dim=int(m * sub_len),
        metric=metric,
        has_cells=cells is not None,
        codebook_md5=_codebook_md5(books),
        n_encoded=n_encoded,
        rotation=rotation,
        # fresh directory (mode overwrite): the ledger IS the on-disk
        # count this save just produced; min id rides the same write
        n_code_files=_parquet_file_count(spark, f"{path}/codes"),
        min_id=None if vals["lo"] is None else int(vals["lo"]),
    )


def load_pq_index(spark, path: str, validate_codes: bool = True) -> "dict":
    """Reload a persisted PQ index: returns {"codebooks", "codes",
    "cells" (or None), "manifest" (Row)} — frames that plug directly
    into pq_knn / ivfpq_knn.  Validates the manifest's geometry,
    codebook fingerprint, and encoded row count against the loaded
    components, so a half-written, partially re-saved, or
    mixed-version directory fails loudly instead of scoring garbage.

    `validate_codes=False` skips the codes row-count/min aggregate —
    the only load step whose cost grows with accumulated append count
    (the r11 1M rung measured 34.5 s/append dominated by exactly this
    recount over every accumulated file, SCALE.md §14).  Maintenance
    paths that already end with their own count check (append's
    arithmetic manifest, compaction's rewrite-equality check) use it;
    serve paths keep the default full validation.  With
    `validate_codes=False` the returned "min_vec_id" is None.

    Manifest AND codebooks load through `metaio` (r12 optimization
    round): both are KB-scale, corpus-size-independent metadata, read
    with one Hadoop-FS call each instead of a Spark job each; the codes
    and cells frames read with the schema taken from one data file's
    footer (`metaio.spark_read_component`), killing the per-component
    schema-inference job as well.  The
    collected codebooks come back as the "books" numpy dict (encode /
    ADC paths reuse it instead of re-collecting) plus a local-relation
    "codebooks" DataFrame for API compatibility; a missing directory
    raises FileNotFoundError (the missing-vs-inconsistent split the
    HTTP tier maps to 400-classes)."""
    from noaa_oracle_spark.pipeline.metaio import read_meta_rows

    manifest = read_meta_rows(spark, f"{path}/manifest")
    if len(manifest) != 1:
        raise ValueError(f"load_pq_index: bad manifest at {path}")
    meta = manifest[0]
    if meta.format_version != 1:
        raise ValueError(
            f"load_pq_index: unsupported format_version "
            f"{meta.format_version}"
        )
    cb_rows = [
        (int(r["sub"]), int(r["code"]), [float(x) for x in r["centroid"]])
        for r in read_meta_rows(spark, f"{path}/codebooks")
    ]
    codebooks = spark.createDataFrame(cb_rows, CODEBOOK_SCHEMA)
    codebooks._local_codebook_rows = cb_rows
    books = _books_from_rows(cb_rows)
    m = len(books)
    n_codes, sub_len = books[0].shape
    if (m, int(n_codes), m * sub_len) != (meta.m, meta.n_codes, meta.dim):
        raise ValueError(
            f"load_pq_index: manifest geometry (m={meta.m}, "
            f"n_codes={meta.n_codes}, dim={meta.dim}) does not match "
            f"codebooks (m={m}, n_codes={n_codes}, dim={m * sub_len})"
        )
    if _codebook_md5(books) != meta.codebook_md5:
        raise ValueError(
            f"load_pq_index: codebook contents at {path} do not match "
            f"the manifest fingerprint — the index directory is "
            f"inconsistent (interrupted re-save?)"
        )
    from noaa_oracle_spark.pipeline.metaio import spark_read_component

    codes = spark_read_component(
        spark, f"{path}/codes", partitioned_by="cluster_id"
    )
    # the id column is whatever the index was saved with (save/
    # save_ivfpq_index accept id_col) — derive it from the codes schema
    # exactly as append_pq_index does, instead of hardcoding vec_id
    # (r9 advice: an index saved with a custom id_col could never load)
    id_cols = [c for c in codes.columns if c not in ("codes", "cluster_id")]
    if len(id_cols) != 1:
        raise ValueError(
            f"load_pq_index: cannot identify the id column in codes "
            f"schema {codes.columns} at {path}"
        )
    n_files_expected = (
        getattr(meta, "n_code_files", None) if validate_codes else None
    )
    if validate_codes and n_files_expected is not None:
        # O(1) validation against the manifest's file ledger (r13
        # optimization round, `load_bm25_index`'s twin): every writer
        # records the codes file count it left on disk (appends record
        # old-ledger + delta, so a tear's orphan files are never
        # adopted), and one globStatus listing replaces the codes
        # aggregate whose listing/footer cost grows with accumulated
        # appends.  min_vec_id serves straight from the manifest —
        # maintained exactly by every writer alongside the ledger.
        from noaa_oracle_spark.pipeline.text import _parquet_file_count

        n_files = _parquet_file_count(spark, f"{path}/codes")
        if n_files != int(n_files_expected):
            raise ValueError(
                f"load_pq_index: {n_files} code files at {path} vs "
                f"{int(n_files_expected)} in the manifest ledger — "
                f"torn or partial (re-)save; inconsistent index"
            )
        lo = getattr(meta, "min_id", None)
        stats = {"lo": None if lo is None else int(lo)}
    elif validate_codes:
        # legacy manifest (predates the ledger): the original row-count
        # aggregate, one job over the accumulated files
        aggs = [F.count("*").alias("n"), F.min(id_cols[0]).alias("lo")]
        if "cluster_id" in codes.columns:
            # rides the same aggregate job for free (r12 advice):
            # spark_read_component declares cluster_id IntegerType from
            # the FIRST partition directory only, so an out-of-int32
            # value in a later directory would otherwise read back as
            # NULL silently under non-ANSI casting.
            aggs.append(F.count("cluster_id").alias("n_cid"))
        stats = codes.agg(*aggs).collect()[0]
        if stats["n"] != meta.n_encoded:
            raise ValueError(
                f"load_pq_index: {stats['n']} encoded rows at {path} vs "
                f"{meta.n_encoded} in the manifest — inconsistent index"
            )
        if "cluster_id" in codes.columns and stats["n_cid"] != stats["n"]:
            raise ValueError(
                f"load_pq_index: {stats['n'] - stats['n_cid']} codes rows "
                f"at {path} have a NULL cluster_id — partition values do "
                f"not fit the declared int32 partition column"
            )
    else:
        stats = {"lo": None}
    cells = (
        spark_read_component(spark, f"{path}/cells")
        if meta.has_cells
        else None
    )
    return {
        "codebooks": codebooks,
        "codes": codes,
        "cells": cells,
        "manifest": meta,
        # OPQ rotation (dim×dim numpy) the corpus was encoded under, or
        # None — serve paths apply it to query vectors before probing
        # and LUT construction so a saved OPQ index round-trips
        "rotation": _manifest_rotation(meta),
        # smallest encoded id, for callers that need a query-id sentinel
        # guaranteed outside the corpus id domain (the serve endpoint's
        # self-pair-filter correctness); None for an empty index
        "min_vec_id": None if stats["lo"] is None else int(stats["lo"]),
        # the already-collected codebook dict — encode/ADC callers pass
        # it through (pq_encode/pq_knn books=) instead of re-collecting
        # the codebooks frame per call (r12 optimization round)
        "books": books,
        "_codebook_rows": cb_rows,
    }


def append_pq_index(
    spark,
    path: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    check_disjoint: bool = True,
    verify: bool = False,
    metrics_out: "dict | None" = None,
    preloaded_index: "dict | None" = None,
) -> int:
    """Grow a persisted PQ index incrementally: encode `new_vectors`
    with the index's FROZEN codebooks and append the codes — the vector
    sibling of `merge_bm25_indexes` (same contract: growing the corpus
    must not re-pay work over the old shards).  At 100 TB this is the
    only affordable index-maintenance path: appending a day's shard
    costs one encode pass over THAT shard (codebooks broadcast to the
    kernel, zero joins), never a re-encode of the corpus; the standard
    IVF-PQ production discipline (retrain codebooks only when the
    distribution drifts, which is a new index, not an append).

    The append is file-level (`mode("append")` under `path/codes`):
    existing code files are never rewritten, so concurrent READERS of
    the index stay consistent, and the manifest — rewritten LAST with
    the updated row count — keeps the crash-consistency contract:
    an append that dies between codes and manifest leaves a count
    mismatch that `load_pq_index` rejects loudly.

    `check_disjoint` (default on) fails loudly when a new id already
    exists in the index — a duplicate id would return twice from every
    search.  The check is ONE left-semi hash join on the id key (at
    cluster scale: bucket the codes table by id hash and this is a
    co-located probe; a bloom filter on existing ids is the cheap
    pre-filter, the join stays the correctness backstop).

    Validation is O(new shard) by default (r11 verdict ask #2): the
    append counts the rows it is about to write (one pass over the NEW
    frame only) and updates the manifest count arithmetically —
    old n_encoded + n_new — instead of recounting the codes across
    every accumulated file, which the 1M rung measured growing to
    34.5 s/append at 20 appends (SCALE.md §14).  `verify=True` restores
    the full recount (load-validation of the accumulated index AND a
    post-write recount) for callers that want the audit pass.  Either
    way the crash contract holds: an append that dies between the codes
    write and the manifest leaves a count the next validated
    `load_pq_index` rejects, and an append on TOP of such a torn index
    writes a manifest that is still short of the on-disk rows, so the
    tear stays loudly detectable — the fast path never "heals" it.

    `metrics_out` (a dict, filled in place) requests the codebook-drift
    signal (r11 verdict ask #4): the append's OWN encode pass also
    emits each row's reconstruction error (the argmin distances it
    computes anyway — zero extra passes; the mean folds into the same
    bounded count action), and the dict comes back with
    {"n": rows_appended, "mse": mean reconstruction error} in the
    index's stored geometry.  A drifting embedding distribution
    quantizes ever worse under frozen codebooks; a rising mse against
    the version's first-batch baseline is the retrain-offline signal
    (`pq_index_sink` persists it per microbatch; /index/stats surfaces
    it).

    `preloaded_index` is the ingest-loop economy (`pq_index_sink`
    already holds a VALIDATED load for its containment check): reuse it
    instead of re-reading manifest + codebooks + fingerprint every
    microbatch.

    Returns the number of rows appended."""
    # manifest geometry + codebook fingerprint always validate; the
    # accumulated-codes recount is the O(index) term verify gates
    idx = (
        preloaded_index
        if preloaded_index is not None
        else load_pq_index(spark, path, validate_codes=verify)
    )
    meta = idx["manifest"]
    celled = "cluster_id" in idx["codes"].columns
    id_col = [
        c for c in idx["codes"].columns
        if c not in ("codes", "cluster_id")
    ][0]
    if id_col not in new_vectors.columns:
        raise ValueError(
            f"append_pq_index: new vectors lack the index id column "
            f"{id_col!r} (columns: {new_vectors.columns})"
        )
    # ONE fused probe action over the new shard (r12 optimization
    # round): dim validation (min/max of size() — strictly stronger
    # than the old first-row `_dim_of` probe: a ragged batch fails too)
    # and, when requested, the disjointness count, computed together.
    # The disjoint leg keeps its left-semi shape — the BIG accumulated
    # codes side streams against the small new-id build side; never
    # invert it (a left-outer from the new side would make the corpus
    # the broadcast/build side at scale).  The two 1-row aggregates
    # cross-join into a single job.
    probe = new_vectors.agg(
        F.count(F.lit(1)).alias("n_new"),
        F.min(F.size(F.col(vec_col))).alias("dim_lo"),
        F.max(F.size(F.col(vec_col))).alias("dim_hi"),
    )
    if check_disjoint:
        probe = probe.crossJoin(
            idx["codes"]
            .join(new_vectors.select(id_col), id_col, "left_semi")
            .agg(F.count(F.lit(1)).alias("n_overlap"))
        )
    prow = probe.collect()[0]
    if int(prow["n_new"]) == 0:
        raise ValueError("empty vector table")
    if (
        int(prow["dim_lo"]) != int(meta.dim)
        or int(prow["dim_hi"]) != int(meta.dim)
    ):
        got = (
            int(prow["dim_lo"])
            if prow["dim_lo"] == prow["dim_hi"]
            else f"{int(prow['dim_lo'])}..{int(prow['dim_hi'])}"
        )
        raise ValueError(
            f"append_pq_index: vector dim {got} != index dim {meta.dim}"
        )
    if check_disjoint and int(prow["n_overlap"]):
        raise ValueError(
            f"append_pq_index: {int(prow['n_overlap'])} new ids already "
            f"exist in the index at {path} — ids must be disjoint"
        )
    if idx["rotation"] is not None:
        # OPQ index: the stored codes live in rotated space, so route the
        # RAW new vectors through the same persisted R before encoding /
        # cell assignment — callers append unrotated vectors and the
        # index applies its own geometry (map-side GEMM, no shuffle)
        new_vectors = rotate_embeddings(
            new_vectors, idx["rotation"], id_col=id_col, vec_col=vec_col
        )
    enc = pq_encode(
        new_vectors, idx["codebooks"], id_col=id_col, vec_col=vec_col,
        with_error=metrics_out is not None,
        books=idx.get("books"),
    )
    if celled:
        # cell-partitioned layout (save_ivfpq_index): route the new
        # vectors through the SAME frozen coarse cells and keep the
        # partitioned write — appended files land inside their
        # cluster_id= directories, so serve-side partition pruning
        # (ivfpq_query) keeps holding over the grown index
        if idx["cells"] is None:
            raise ValueError(
                "append_pq_index: codes are cell-partitioned but the "
                f"index at {path} has no cells directory"
            )
        from noaa_oracle_spark.pipeline.similarity import kmeans_assign

        assigned = kmeans_assign(
            new_vectors.select(id_col, vec_col),
            idx["cells"],
            id_col=id_col,
            vec_col=vec_col,
            backend="numpy",
        ).select(id_col, "cluster_id")
        # cell-keyed repartition (the save_ivfpq_index layout rule): the
        # append adds ONE file set per touched cell, so fragmentation
        # grows linearly with append count — the predictable growth the
        # compact_pq_index trigger reasons about — instead of up to
        # rows-many files per append
        to_write = (
            enc.join(assigned, id_col).repartition(F.col("cluster_id"))
        )
        part_cols = ["cluster_id"]
    else:
        to_write = enc
        part_cols = []
    # the manifest count (and the drift metric when requested) ride the
    # codes write as OBSERVED metrics (r12 optimization round): one
    # pass, one action — the previous shape persisted the encoded frame
    # and paid a separate count/agg job before the write.  The
    # CollectMetrics node sits at the top of the write plan (after the
    # cell-keyed repartition on the celled path), i.e. in the write's
    # result stage, where accumulator updates apply exactly once per
    # committed partition — the count is the rows the committed write
    # produced.  Counting the written frame (not new_vectors) keeps the
    # count honest even if a caller ships intra-batch duplicate ids
    # past check_disjoint; qerr is observed but dropped before the
    # write, so the on-disk schema is unchanged.
    from pyspark.sql import Observation

    from noaa_oracle_spark.pipeline.text import _parquet_file_count

    obs = Observation()
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min(F.col(id_col)).alias("lo"),
    ]
    if metrics_out is not None:
        aggs.append(F.avg("qerr").alias("mse"))
    out_frame = to_write.observe(obs, *aggs)
    if metrics_out is not None:
        out_frame = out_frame.drop("qerr")
    # file-ledger arithmetic (r13): the appended manifest records
    # old-ledger + this-append's file delta — NEVER a fresh directory
    # count, which would adopt a previous tear's orphan files and heal
    # what must stay loudly broken (the "fast path never heals"
    # contract the tests pin)
    files_before = _parquet_file_count(spark, f"{path}/codes")
    w = out_frame.write.mode("append")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(f"{path}/codes")
    vals = obs.get
    n_new = int(vals["n"])
    if metrics_out is not None:
        metrics_out["n"] = n_new
        metrics_out["mse"] = (
            None if vals["mse"] is None else float(vals["mse"])
        )
    if verify:
        from noaa_oracle_spark.pipeline.metaio import (
            spark_read_component,
        )

        n_total = spark_read_component(
            spark, f"{path}/codes", partitioned_by="cluster_id"
        ).count()
    else:
        n_total = int(meta.n_encoded) + int(n_new)
    old_ledger = getattr(meta, "n_code_files", None)
    old_lo = getattr(meta, "min_id", None)
    new_lo = None if vals["lo"] is None else int(vals["lo"])
    _write_pq_manifest(
        spark,
        path,
        m=int(meta.m),
        n_codes=int(meta.n_codes),
        dim=int(meta.dim),
        metric=meta.metric,
        has_cells=bool(meta.has_cells),
        codebook_md5=meta.codebook_md5,
        n_encoded=int(n_total),
        rotation=idx["rotation"],
        n_code_files=None if old_ledger is None else (
            int(old_ledger)
            + _parquet_file_count(spark, f"{path}/codes")
            - files_before
        ),
        # a legacy index's historical min is unknown — recording only
        # the new batch's min would serve a wrong min_vec_id floor, so
        # the ledger and the floor upgrade together (never legacy);
        # with a ledger present, old_lo None means the old index was
        # EMPTY and the new batch's min is the true floor
        min_id=None if old_ledger is None else (
            new_lo if old_lo is None
            else old_lo if new_lo is None
            else min(int(old_lo), new_lo)
        ),
    )
    return int(n_total - meta.n_encoded)


def merge_pq_indexes(
    spark,
    paths: "list[str]",
    out_path: str,
    check_disjoint: bool = True,
) -> None:
    """Merge N persisted PQ indexes that were encoded INDEPENDENTLY with
    the SAME frozen codebooks into one index at `out_path` — the
    parallel-shard complement of `append_pq_index` (append grows one
    index serially; merge combines shard indexes produced by concurrent
    encode jobs, each of which ran `save_pq_index` over its own slice).
    Because ADC distances depend only on (codes, codebooks), codes from
    same-codebook indexes union without any arithmetic; the codebook
    fingerprint in each manifest is the compatibility proof — indexes
    trained separately (different md5) refuse to merge, since their
    codes are meaningless against each other's centroids.

    IVF indexes (has_cells) are refused: per-shard coarse cells are
    shard-local samples, and a union of codes against any one shard's
    cells silently mis-routes probes — re-run the coarse assignment
    against shared cells instead (or grow with `append_pq_index`,
    which keeps the original index's cells).

    `check_disjoint` mirrors merge_bm25_indexes: a duplicate id would
    surface twice from every search; the check is one distinct-count
    over the unioned id column."""
    if len(paths) < 2:
        raise ValueError("merge_pq_indexes: need at least two indexes")
    # geometry/fingerprint validate per shard; the per-shard codes
    # recount is skipped — the post-union output count is checked
    # against the SUM of the shard manifests below, so a torn shard
    # still fails loudly before the merged manifest exists (the
    # compact_pq_index discipline, r12)
    idxs = [
        load_pq_index(spark, p, validate_codes=False) for p in paths
    ]
    metas = [i["manifest"] for i in idxs]
    geom = {
        (
            m.m,
            m.n_codes,
            m.dim,
            m.metric,
            m.codebook_md5,
            _rotation_md5(getattr(m, "rotation", None)),
        )
        for m in metas
    }
    if len(geom) != 1:
        raise ValueError(
            "merge_pq_indexes: indexes differ in geometry/metric/"
            f"codebooks/rotation — {sorted(geom)}; only same-codebook "
            "same-rotation shard indexes can merge"
        )
    if any(m.has_cells for m in metas):
        raise ValueError(
            "merge_pq_indexes: IVF indexes (has_cells) cannot merge — "
            "per-shard coarse cells are incompatible; re-assign against "
            "shared cells or grow with append_pq_index"
        )
    id_cols = {
        c for i in idxs for c in i["codes"].columns if c != "codes"
    }
    if len(id_cols) != 1:
        raise ValueError(
            f"merge_pq_indexes: mixed id columns {sorted(id_cols)}"
        )
    id_col = id_cols.pop()
    codes = idxs[0]["codes"]
    for i in idxs[1:]:
        codes = codes.unionByName(i["codes"])
    if check_disjoint:
        n_total = sum(int(m.n_encoded) for m in metas)
        n_distinct = codes.select(id_col).distinct().count()
        if n_distinct > n_total:
            # more on-disk ids than the manifests account for: not an
            # overlap but orphan rows from an append that died before
            # its manifest write — name the real condition
            raise ValueError(
                f"merge_pq_indexes: {n_distinct} distinct ids on disk "
                f"vs {n_total} in the shard manifests — a shard is torn "
                "(append died pre-manifest); recover it (compact or "
                "re-save) before merging"
            )
        if n_distinct != n_total:
            raise ValueError(
                "merge_pq_indexes: document sets overlap "
                f"({n_total - n_distinct} shared ids) — shards must be "
                "disjoint"
            )
    meta = metas[0]
    # the shared codebooks carry over verbatim through metaio (the
    # load already collected them; r12 optimization round)
    from noaa_oracle_spark.pipeline.metaio import write_meta_rows

    write_meta_rows(
        spark, f"{out_path}/codebooks", CODEBOOK_SCHEMA,
        idxs[0]["_codebook_rows"],
    )
    # the torn-shard check rides the union write as an observed metric
    # (r12 optimization round): the count of rows actually read from
    # the shards and written — a shard whose files are short of its
    # manifest yields fewer rows here, failing the same check the
    # re-read count enforced, without a second pass over the output
    from pyspark.sql import Observation

    obs = Observation()
    merged_id = [
        c for c in codes.columns if c not in ("codes", "cluster_id")
    ][0]
    (
        codes.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.min(F.col(merged_id)).alias("lo"),
        )
        .write.mode("overwrite")
        .parquet(f"{out_path}/codes")
    )
    vals = obs.get
    n_encoded = int(vals["n"])
    n_expected = sum(int(m.n_encoded) for m in metas)
    if n_encoded != n_expected:
        raise ValueError(
            f"merge_pq_indexes: merged {n_encoded} rows vs {n_expected} "
            f"in the shard manifests — a shard is torn; aborting before "
            f"the manifest write (out_path is not serveable)"
        )
    from noaa_oracle_spark.pipeline.text import _parquet_file_count

    _write_pq_manifest(
        spark,
        out_path,
        m=int(meta.m),
        n_codes=int(meta.n_codes),
        dim=int(meta.dim),
        metric=meta.metric,
        has_cells=False,
        codebook_md5=meta.codebook_md5,
        n_encoded=int(n_encoded),
        rotation=idxs[0]["rotation"],
        # fresh directory: ledger = what this merge just wrote; the min
        # rides the same union write (exact over all shards' rows)
        n_code_files=_parquet_file_count(spark, f"{out_path}/codes"),
        min_id=None if vals["lo"] is None else int(vals["lo"]),
    )


def save_ivfpq_index(
    codebooks: DataFrame,
    corpus: DataFrame,
    cells: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation=None,
) -> None:
    """Persist an IVF-PQ index with the codes PARTITIONED BY COARSE CELL
    — the serve-side layout `ivfpq_knn`'s docstring promises ("at scale
    the encoded corpus is written partitioned by cell id"): corpus
    vectors are routed to their nearest cell (`kmeans_assign`, numpy
    backend), PQ-encoded, and written as
    path/codes/cluster_id=C/part-*.parquet.  A query served from this
    layout (`ivfpq_query`) touches nprobe partition DIRECTORIES of
    8-byte-per-vector codes — partition pruning happens at file-listing
    time, before a single row is read, which is what bounds per-query
    scan volume at the billion-vector tier.

    Layout and manifest are `save_pq_index`-compatible (`load_pq_index`
    reads it back unchanged — the extra cluster_id column rides along
    and flat `pq_knn` serving still works), with the same
    manifest-written-LAST crash-consistency contract.

    `rotation` (OPQ): pass the dense R when `corpus`, `cells`, and the
    codebooks were all trained in ROTATED space (`opq_train_rotation` →
    `rotate_embeddings`); the components are stored as given and R rides
    in the manifest so `ivfpq_query`/`_batch` rotate query vectors to
    match.  (`append_pq_index` takes RAW vectors and applies the stored
    R itself — the index owns its geometry.)"""
    from noaa_oracle_spark.pipeline.metaio import write_meta_rows
    from noaa_oracle_spark.pipeline.similarity import kmeans_assign

    spark = codebooks.sparkSession
    # one collect feeds books + fingerprint + the metaio codebooks
    # write (the save_pq_index economy, r12 optimization round)
    cb_rows = [
        (int(r[0]), int(r[1]), [float(x) for x in r[2]])
        for r in (
            getattr(codebooks, "_local_codebook_rows", None)
            or codebooks.collect()
        )
    ]
    books = _books_from_rows(cb_rows)
    m = len(books)
    n_codes, sub_len = books[0].shape
    assigned = kmeans_assign(
        corpus.select(id_col, vec_col),
        cells,
        id_col=id_col,
        vec_col=vec_col,
        backend="numpy",
    ).select(id_col, "cluster_id")
    encoded = pq_encode(
        corpus, codebooks, id_col=id_col, vec_col=vec_col, books=books
    )
    celled = encoded.join(assigned, id_col)
    write_meta_rows(spark, f"{path}/codebooks", CODEBOOK_SCHEMA, cb_rows)
    # ONE cell-keyed repartition before the partitioned write: each cell
    # lands entirely in one task, so every cluster_id= directory holds
    # exactly one file set — without it each of the N input partitions
    # writes its own file per cell it touches (up to N files/cell on day
    # one), and a probe pays that open count forever.  The shuffle moves
    # 8-byte codes, not vectors — cheap relative to the encode; it is
    # also the layout compact_pq_index restores, so "fresh" and
    # "compacted" mean the same thing.
    # the manifest count rides the celled write as an observed metric
    # (the save_pq_index economy, r12 optimization round) — observed
    # after the cell-keyed repartition, so it lives in the write's
    # result stage and counts committed rows exactly once
    from pyspark.sql import Observation

    obs = Observation()
    (
        celled.repartition(F.col("cluster_id"))
        .observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.min(F.col(id_col)).alias("lo"),
        )
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(f"{path}/codes")
    )
    cells.write.mode("overwrite").parquet(f"{path}/cells")
    vals = obs.get
    n_encoded = int(vals["n"])
    from noaa_oracle_spark.pipeline.text import _parquet_file_count

    _write_pq_manifest(
        spark,
        path,
        m=m,
        n_codes=int(n_codes),
        dim=int(m * sub_len),
        metric="l2_adc",
        has_cells=True,
        codebook_md5=_codebook_md5(books),
        n_encoded=n_encoded,
        rotation=rotation,
        # fresh directory: ledger = on-disk count of the celled layout
        # (one file set per cell); min id rides the same write
        n_code_files=_parquet_file_count(spark, f"{path}/codes"),
        min_id=None if vals["lo"] is None else int(vals["lo"]),
    )


def _cells_schema_cols(cells: DataFrame) -> "tuple[str, str]":
    """(id_col, vec_col) of a cell-centroid table, derived from its
    SCHEMA — the array-typed column is the centroid, the other the
    cell id.  Serve paths must not hardcode names the index was not
    saved with (the load_pq_index id_col lesson, applied to cells)."""
    vec_cols = [
        f.name for f in cells.schema.fields
        if isinstance(f.dataType, T.ArrayType)
    ]
    other = [f.name for f in cells.schema.fields if f.name not in vec_cols]
    if len(vec_cols) != 1 or len(other) != 1:
        raise ValueError(
            f"cannot identify (id, centroid) columns in cells schema "
            f"{cells.columns}"
        )
    return other[0], vec_cols[0]


def _collect_cells(cells: DataFrame, id_col: str, vec_col: str):
    """(c_ids int64[], c_mat (n×dim) float64) from the cell table —
    collected once; the cell set is broadcast-sized by construction."""
    import numpy as np

    rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in cells.select(id_col, vec_col).collect()
    )
    if not rows:
        raise ValueError("probe_cells: empty cell set")
    c_ids = np.array([cid for cid, _ in rows], dtype=np.int64)
    c_mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in rows])
    return c_ids, c_mat


def _rank_cells(c_ids, c_mat, vector, nprobe: int) -> "list[int]":
    """nprobe nearest cells for one vector — the shared numpy scorer of
    `probe_cells` / `ivfpq_query_batch`: 6-dp-rounded cosine via the
    dimension-ordered left-fold (numerically IDENTICAL to the Spark
    expression form), cell-id-ascending tiebreak."""
    import numpy as np

    q = np.asarray(vector, dtype=np.float64)
    if q.shape[0] != c_mat.shape[1]:
        raise ValueError(
            f"probe_cells: vector has {q.shape[0]} dims, cells have "
            f"{c_mat.shape[1]}"
        )

    def fold_norm(mat):
        acc = mat[:, 0] * mat[:, 0]
        for i in range(1, mat.shape[1]):
            acc = acc + mat[:, i] * mat[:, i]
        return np.sqrt(acc)

    dot = c_mat[:, 0] * q[0]
    for i in range(1, c_mat.shape[1]):
        dot = dot + c_mat[:, i] * q[i]
    qn = 0.0
    for x in q:
        qn = qn + x * x
    sims = round_half_up(dot / (fold_norm(c_mat) * float(qn) ** 0.5), 6)
    order = sorted(range(len(c_ids)), key=lambda i: (-sims[i], c_ids[i]))
    return [int(c_ids[i]) for i in order[: int(nprobe)]]


def probe_cells(
    cells: DataFrame,
    vector: "list[float]",
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "list[int]":
    """The query-side coarse routing of `ivfpq_knn`, for ONE external
    vector: nprobe nearest cells by 6-dp-rounded cosine with the
    cell-id-ascending tiebreak — numerically IDENTICAL to the Spark
    expression form (dimension-ordered left-fold accumulation +
    `round_half_up`, the kmeans_assign numpy-backend discipline), so a
    served query probes exactly the cells the batch operator would."""
    c_ids, c_mat = _collect_cells(cells, id_col, vec_col)
    return _rank_cells(c_ids, c_mat, vector, nprobe)


def ivfpq_query(
    index: "dict",
    vector: "list[float]",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Serve one query from a LOADED cell-partitioned IVF-PQ index
    (`save_ivfpq_index` → `load_pq_index`): probe the nprobe nearest
    cells (bounded — the cell table is broadcast-sized by construction),
    then run flat ADC over ONLY those cells' code partitions.  The
    cluster_id filter is a PARTITION filter, pruned at file-listing
    time (asserted on the executed plan in tests), so per-query scan
    volume is nprobe/n_cells of the index regardless of corpus size —
    the serve-side twin of `ivfpq_knn`'s batch semantics, and
    result-identical to it (equality-tested).

    Returns (rank, n_id, adc_dist)."""
    meta = index["manifest"]
    if index["cells"] is None:
        raise ValueError("ivfpq_query: index has no coarse cells")
    codes = index["codes"]
    if "cluster_id" not in codes.columns:
        raise ValueError(
            "ivfpq_query: codes are not cell-partitioned — re-save with "
            "save_ivfpq_index"
        )
    if len(vector) != int(meta.dim):
        raise ValueError(
            f"ivfpq_query: vector has {len(vector)} dims, index expects "
            f"{meta.dim}"
        )
    if index.get("rotation") is not None:
        # OPQ index: cells + codes live in rotated space — rotate the
        # raw query into it (same float64 GEMM `rotate_embeddings`
        # applied to the corpus, so query/corpus geometry agrees)
        import numpy as np

        vector = [
            float(x)
            for x in index["rotation"]
            @ np.asarray([float(v) for v in vector], dtype=np.float64)
        ]
    id_col = [
        c for c in codes.columns if c not in ("codes", "cluster_id")
    ][0]
    c_id_col, c_vec_col = _cells_schema_cols(index["cells"])
    probed = probe_cells(
        index["cells"], vector, nprobe, id_col=c_id_col, vec_col=c_vec_col
    )
    pruned = codes.filter(
        F.col("cluster_id").isin(*[int(c) for c in probed])
    ).select(id_col, "codes")
    spark = codes.sparkSession
    lo = index.get("min_vec_id")
    sentinel = min(-1, (lo - 1) if lo is not None else -1)
    qdf = spark.createDataFrame(
        [(sentinel, [float(x) for x in vector])],
        f"{id_col} long, embedding array<double>",
    )
    return pq_knn(
        qdf, pruned, index["codebooks"], k=k, id_col=id_col,
        books=index.get("books"),
    ).select("rank", "n_id", "adc_dist")


def ivfpq_query_batch(
    index: "dict",
    vectors: "list[list[float]]",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Serve a BATCH of query vectors from a loaded cell-partitioned
    IVF-PQ index in ONE Spark job — the shape an LLM-data pipeline
    actually queries an index in (dedup probes and similarity sweeps
    arrive thousands of vectors at a time, not one request per job).

    Per-query semantics are EXACTLY `ivfpq_query`'s (equality-tested):
    each vector probes its own nprobe nearest cells (`_rank_cells`, the
    shared numpy scorer — cells collected ONCE for the whole batch),
    and is scored against ONLY those cells' codes.  Execution is one
    partition-pruned scan of the UNION of all probed cells
    (cluster_id PartitionFilter at file-listing time) with a
    cell→probing-queries map + per-query ADC LUTs riding in one
    broadcast; the kernel fans each code row out to exactly the
    queries that probed its cell — the inline-ivfpq discipline minus
    the encode (codes are already persisted).  The corpus crosses zero
    joins; candidates are |Q|·(rows in probed cells), bounded by
    nprobe/n_cells of the index per query.

    Returns (q_idx, rank, n_id, adc_dist) where q_idx indexes into
    `vectors`."""
    import numpy as np
    import pandas as pd

    meta = index["manifest"]
    if index["cells"] is None:
        raise ValueError("ivfpq_query_batch: index has no coarse cells")
    codes = index["codes"]
    if "cluster_id" not in codes.columns:
        raise ValueError(
            "ivfpq_query_batch: codes are not cell-partitioned — re-save "
            "with save_ivfpq_index"
        )
    if not vectors:
        raise ValueError("ivfpq_query_batch: empty query batch")
    dim = int(meta.dim)
    for v in vectors:
        if len(v) != dim:
            raise ValueError(
                f"ivfpq_query_batch: vector has {len(v)} dims, index "
                f"expects {dim}"
            )
    if index.get("rotation") is not None:
        # OPQ index: rotate the whole batch into the index's space (one
        # |Q|×dim GEMM — same float64 math as the per-query path)
        rx = (
            np.asarray(
                [[float(x) for x in v] for v in vectors], np.float64
            )
            @ index["rotation"].T
        )
        vectors = [list(row) for row in rx]
    id_col = [
        c for c in codes.columns if c not in ("codes", "cluster_id")
    ][0]

    c_id_col, c_vec_col = _cells_schema_cols(index["cells"])
    c_ids, c_mat = _collect_cells(index["cells"], c_id_col, c_vec_col)
    probes = [
        _rank_cells(c_ids, c_mat, [float(x) for x in v], nprobe)
        for v in vectors
    ]
    union_cells = sorted({c for p in probes for c in p})

    # the loaded index already carries the collected codebook dict
    books = index.get("books") or _books_dict(index["codebooks"])
    m = len(books)
    sub_len = books[0].shape[1]
    n_codes = books[0].shape[0]
    lut = np.empty((len(vectors), m, n_codes), np.float64)
    for qi, vec in enumerate(vectors):
        v = np.asarray([float(x) for x in vec], dtype=np.float64)
        for s in range(m):
            qsub = v[s * sub_len : (s + 1) * sub_len]
            lut[qi, s] = ((books[s] - qsub[None, :]) ** 2).sum(axis=1)
    # cell -> int64[] of probing query indexes (|Q|·nprobe pairs)
    cell_map: dict = {}
    for qi, p in enumerate(probes):
        for c in p:
            cell_map.setdefault(int(c), []).append(qi)
    cell_map = {
        c: np.asarray(qs, dtype=np.int64) for c, qs in cell_map.items()
    }

    spark = codes.sparkSession
    bc = spark.sparkContext.broadcast((cell_map, lut))
    pruned = codes.filter(
        F.col("cluster_id").isin(*[int(c) for c in union_cells])
    ).select(id_col, "codes", "cluster_id")

    schema = T.StructType(
        [
            T.StructField("q_idx", T.IntegerType()),
            T.StructField("n_id", T.LongType()),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    def kernel(batches):
        cmap, lut_ = bc.value
        subs_idx = np.arange(lut_.shape[1])
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf["cluster_id"].to_numpy(dtype=np.int64)
            hits = [cmap.get(int(c)) for c in cids]
            counts = np.asarray(
                [0 if h is None else len(h) for h in hits]
            )
            keep = counts > 0
            if not keep.any():
                continue
            ids_n = pdf[id_col].to_numpy(dtype=np.int64)[keep]
            cmat = np.stack(
                [
                    np.asarray(c, dtype=np.int64)
                    for c in pdf["codes"].to_numpy()[keep]
                ]
            )
            rep = counts[keep]
            ids_rep = np.repeat(ids_n, rep)
            codes_rep = np.repeat(cmat, rep, axis=0)
            qs = np.concatenate([h for h in hits if h is not None])
            dists = round_half_up(
                lut_[qs[:, None], subs_idx[None, :], codes_rep].sum(
                    axis=1
                ),
                6,
            )
            yield pd.DataFrame(
                {
                    "q_idx": qs.astype(np.int32),
                    "n_id": ids_rep,
                    "adc_dist": dists,
                }
            )

    cand = pruned.mapInPandas(kernel, schema)
    w = Window.partitionBy("q_idx").orderBy(
        F.asc("adc_dist"), F.asc("n_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_idx", "rank", "n_id", F.round("adc_dist", 6).alias("adc_dist")
        )
    )


def compact_pq_index(spark, path: str, out_path: str) -> "dict":
    """Rewrite a many-times-appended PQ/IVF-PQ index into the fresh-save
    layout — the vector twin of `text.compact_bm25_index` (same
    read-amplification problem, same snapshot-then-switch fix).

    `append_pq_index` is file-level (old code files never rewritten), so
    after N small appends every cell directory of an IVF-PQ index holds
    ~N file sets and a query probing that cell opens all of them —
    per-probe open/footer cost grows linearly with append count even
    though the probed ROW volume is unchanged.  Compaction rewrites the
    codes row set (unchanged, so every neighbor result is bit-identical
    — equality-tested) into consolidated files:

    - celled (IVF-PQ): ONE hash repartition on cluster_id, then the
      partitionBy("cluster_id") write — each cell lands entirely in one
      task, so each cluster_id= directory holds exactly one file set
      and serve-side PartitionFilter pruning opens the minimum possible
      file count per probe;
    - flat: a plain rewrite — the scan coalesces the small appended
      files into maxPartitionBytes-sized splits, so the output file
      count is the task count, not the append count.  Zero shuffles.

    Writes to `out_path` (must differ from `path`): the live index
    stays consistent for concurrent readers until the serving layer
    repoints — compaction is a maintenance job, not an in-place
    mutation.  Codebooks, cells, and the OPQ rotation carry over
    verbatim (the quantizer is untouched; only file layout changes),
    and the manifest is written LAST, keeping the crash-consistency
    contract.

    Trigger discipline (mirrors BM25): compact when the codes file
    count exceeds ~3× the fresh-save file count for the same row
    volume — bench_index_maintenance measures the fragmented-vs-
    compacted serve delta that justifies it.

    Returns {"codes_files_before", "codes_files_after", "n_encoded",
    "timings"} — timings break the job into its phases (load/listing,
    codes rewrite, verify count, codebooks/cells+manifest) so the rung
    can attribute the cost (r11 verdict ask #3)."""
    import os
    import time as _time

    if os.path.abspath(out_path) == os.path.abspath(path):
        raise ValueError(
            "compact_pq_index: out_path must differ from path "
            "(in-place rewrite would race concurrent readers)"
        )
    timings: "dict[str, float]" = {}
    t0 = _time.time()
    # geometry + codebook fingerprint validate on load; the O(index)
    # codes recount is SKIPPED here because compaction ends with its own
    # equality check — rewritten row count vs the source manifest — so a
    # torn source still fails loudly, one full data pass later instead
    # of two (r11 verdict ask #3: the pre-validation pass was half the
    # read volume of the whole job)
    idx = load_pq_index(spark, path, validate_codes=False)
    meta = idx["manifest"]
    from noaa_oracle_spark.pipeline.text import _parquet_file_count

    files_before = _parquet_file_count(spark, f"{path}/codes")
    timings["load_and_listing_s"] = round(_time.time() - t0, 2)
    t0 = _time.time()
    # the rewrite counts its own rows as an observed metric (r12
    # optimization round) — the same torn-source check the re-read
    # count enforced (rows actually read from the source and written
    # vs the source manifest), one data pass instead of two
    from pyspark.sql import Observation

    obs = Observation()
    compact_id = [
        c for c in idx["codes"].columns
        if c not in ("codes", "cluster_id")
    ][0]
    compact_aggs = (
        F.count(F.lit(1)).alias("n"),
        F.min(F.col(compact_id)).alias("lo"),
    )
    if "cluster_id" in idx["codes"].columns:
        (
            idx["codes"]
            .repartition(F.col("cluster_id"))
            .observe(obs, *compact_aggs)
            .write.mode("overwrite")
            .partitionBy("cluster_id")
            .parquet(f"{out_path}/codes")
        )
    else:
        (
            idx["codes"]
            .observe(obs, *compact_aggs)
            .write.mode("overwrite")
            .parquet(f"{out_path}/codes")
        )
    timings["codes_rewrite_s"] = round(_time.time() - t0, 2)
    t0 = _time.time()
    obs_vals = obs.get
    n_encoded = int(obs_vals["n"])
    timings["verify_count_s"] = round(_time.time() - t0, 2)
    t0 = _time.time()
    if n_encoded != int(meta.n_encoded):
        raise ValueError(
            f"compact_pq_index: rewrote {n_encoded} rows vs "
            f"{meta.n_encoded} in the source manifest — aborting before "
            f"the manifest write (out_path is not serveable)"
        )
    # codebooks carry over verbatim through metaio (KB-scale, already
    # collected by the load); cells copy byte-for-byte at the FS level —
    # the quantizer is untouched by compaction, so neither needs a
    # Spark job (r12 optimization round)
    from noaa_oracle_spark.pipeline.metaio import write_meta_rows

    write_meta_rows(
        spark, f"{out_path}/codebooks", CODEBOOK_SCHEMA,
        idx["_codebook_rows"],
    )
    if idx["cells"] is not None:
        sc = spark.sparkContext
        jvm = sc._jvm
        conf = sc._jsc.hadoopConfiguration()
        src = jvm.org.apache.hadoop.fs.Path(f"{path}/cells")
        dst = jvm.org.apache.hadoop.fs.Path(f"{out_path}/cells")
        sfs = src.getFileSystem(conf)
        dfs = dst.getFileSystem(conf)
        if dfs.exists(dst):
            dfs.delete(dst, True)
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            sfs, src, dfs, dst, False, True, conf
        )
    files_after = _parquet_file_count(spark, f"{out_path}/codes")
    _write_pq_manifest(
        spark,
        out_path,
        m=int(meta.m),
        n_codes=int(meta.n_codes),
        dim=int(meta.dim),
        metric=meta.metric,
        has_cells=bool(meta.has_cells),
        codebook_md5=meta.codebook_md5,
        n_encoded=n_encoded,
        rotation=idx["rotation"],
        # fresh directory: ledger = what this rewrite produced; the min
        # rides the rewrite itself (exact even for a legacy source
        # whose manifest predates the floor field)
        n_code_files=files_after,
        min_id=(
            None if obs_vals["lo"] is None else int(obs_vals["lo"])
        ),
    )
    timings["aux_writes_s"] = round(_time.time() - t0, 2)
    return {
        "codes_files_before": files_before,
        "codes_files_after": files_after,
        "n_encoded": int(n_encoded),
        "timings": timings,
    }
