"""Deterministic hash-based sampling for training-data pipelines.

RNG sampling (`df.sample`, `sampleBy`) is not reproducible across engines,
partitionings, or retries — a training pipeline needs the SAME document to
land in the same split every run, on every system that touches the corpus.
Hash sampling gives that: a row is selected iff the first 3 hex digits of
md5(salt|key) fall below a threshold — a pure column expression, portable
to any engine with md5 (fixed-width lowercase hex compares exactly like the
underlying integer).

Resolution is 1/4096 per threshold step (3 hex digits); fractions are
floored to that grid. Different `salt` values give independent samples, so
`salt="train"` / `salt="test"` build overlapping-free splits from
complementary thresholds on the SAME salt, and independent subsamples from
different salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRID = 4096  # 16^3


def _threshold_hex(fraction: float) -> str:
    """fraction → 3-hex-digit exclusive upper bound.

    fraction 1.0 returns 'g', which sorts above every 3-hex bucket
    ('fff' < 'g') and therefore keeps everything — the naive format of
    4096 would be '1000', which sorts BELOW 3-char buckets lexicographically
    and would silently keep nothing."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = int(fraction * _GRID)
    if n >= _GRID:
        return "g"
    return format(n, "03x")


def _bucket(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(f"{salt}|"), key)), 1, 3)


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen deterministically by key hash."""
    return df.filter(
        _bucket(F.col(key_col).cast("string"), salt)
        < F.lit(_threshold_hex(fraction))
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: "tuple[tuple[str, float], ...]" = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1),
    ),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds `split_col` naming
    which split each row belongs to.  Every engine that can compute
    md5(salt|key) reproduces the exact same partition of the corpus —
    the property a training pipeline needs so that evaluation rows can
    NEVER leak into training no matter which system materializes which
    split (the same contract q77's decontamination enforces after the
    fact, applied up front).

    `splits` is an ordered (name, fraction) tuple; fractions must sum to
    1.0 (within the 1/4096 hash grid — each boundary is floored to the
    grid, the remainder goes to the last split).  Assignment is a CASE
    over cumulative thresholds on ONE hash, so splits are disjoint and
    exhaustive by construction; changing one fraction moves only the
    rows at the moved boundary (the stability argument from
    `stratified_hash_sample`).

    Scale shape: pure map-side column expression — no shuffle, no state;
    composes with any downstream groupBy at zero plan cost."""
    fracs = [f for _, f in splits]
    if len(splits) < 2:
        raise ValueError("hash_split: need at least 2 splits")
    if any(f <= 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(
            f"hash_split: fractions must be positive and sum to 1.0, "
            f"got {fracs}"
        )
    # a NULL key would hash to NULL, fail every `<` comparison, and land
    # silently in the LAST split — a leak-shaped surprise; fail loudly
    key = F.when(
        F.col(key_col).isNull(),
        F.raise_error(F.lit(f"hash_split: NULL {key_col}")),
    ).otherwise(F.col(key_col).cast("string"))
    bucket = _bucket(key, salt)
    expr = F.lit(splits[-1][0])  # everything above the last boundary
    cum = 0.0
    bounds = []
    grid_bounds = [0]
    for name, frac in splits[:-1]:
        cum += frac
        bounds.append((name, _threshold_hex(cum)))
        grid_bounds.append(min(int(cum * _GRID), _GRID))
    grid_bounds.append(_GRID)
    # a fraction below the 1/4096 grid resolution floors two boundaries
    # onto the same bucket — that split would be PERMANENTLY empty on
    # every engine, which for an eval split is a silent disaster
    for (name, _), lo, hi in zip(splits, grid_bounds, grid_bounds[1:]):
        if hi <= lo:
            raise ValueError(
                f"hash_split: split {name!r} is empty at the 1/{_GRID} "
                f"hash-grid resolution — use a larger fraction"
            )
    for name, bound in reversed(bounds):
        expr = F.when(bucket < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def epoch_upsample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    salt: str = "epoch",
    copy_col: str = "epoch",
    max_weight: float = 100.0,
) -> DataFrame:
    """Deterministic weighted upsampling — the epoch MATERIALIZATION step
    downstream of `source_mix_weights` (q98): a row with weight w is
    emitted floor(w) times, plus once more iff its hash bucket falls
    below frac(w) on the 1/4096 grid.  A source weighted 2.3 therefore
    sees every document twice and a deterministic ~30% of its documents
    a third time — the fractional-epoch semantics LLM data mixtures use
    (e.g. the Pile / LLaMA tables), reproducible on any engine that can
    compute md5 (same doc gets the extra copy everywhere, so reshards
    and retries never change the mixture).

    Emits one row per copy with `copy_col` = 1..n_copies; rows with
    n_copies = 0 (w < 1 and hash above frac) drop out, which is exactly
    hash_sample's downsampling semantics — weights below 1 subsample.

    Scale shape: pure map-side explode — no shuffle, no state; output
    row count = Σ n_copies ≈ Σ w.  `max_weight` guards against a
    mixture bug amplifying one row into millions (raise explicitly for
    aggressive upsampling)."""
    w = F.col(weight_col).cast("double")
    bucket_int = F.conv(
        _bucket(F.col(key_col).cast("string"), salt), 16, 10
    ).cast("int")
    # the invalid-input guard must be the FIRST when-branch: guarding
    # inside a sub-expression lets Catalyst's null propagation fold
    # `x < NULL` away WITHOUT evaluating the raise, and the row would
    # vanish silently — a mixture bug, not a sampling decision.  NULL,
    # NaN, and negative weights are all mixture bugs (w == 0 is a
    # legitimate "exclude" and stays silent, like hash_sample)
    n_copies = F.when(
        F.col(key_col).isNull() | w.isNull() | F.isnan(w) | (w < 0),
        F.raise_error(
            F.concat(
                F.lit(
                    f"epoch_upsample: NULL/NaN/negative {weight_col} "
                    f"or NULL {key_col}: "
                ),
                F.coalesce(w.cast("string"), F.lit("NULL")),
            )
        ).cast("int"),
    ).when(
        w > F.lit(max_weight),
        F.raise_error(
            F.concat(
                F.lit(
                    f"epoch_upsample: weight exceeds max_weight="
                    f"{max_weight}: "
                ),
                w.cast("string"),
            )
        ).cast("int"),
    ).otherwise(
        F.floor(w).cast("int")
        + (bucket_int < F.floor((w - F.floor(w)) * _GRID)).cast("int")
    )
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") >= 1)
        .select(
            *df.columns,
            F.explode(
                F.sequence(F.lit(1), F.col("_n_copies"))
            ).alias(copy_col),
        )
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix primitive
    (e.g. keep 50% of English, 20% of everything else). Selection depends
    only on (salt, key), so adjusting one stratum's rate never reshuffles
    another stratum's membership."""
    thr = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return df.filter(_bucket(F.col(key_col).cast("string"), salt) < thr)


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    salt: str = "",
) -> DataFrame:
    """Keep each row with probability ≈ its own weight column (clamped to
    [0, 1]), deterministically by key hash — quality-proportional corpus
    downsampling ("keep good documents more often") with the same
    reproducibility contract as hash_sample: membership depends only on
    (salt, key, weight), never on partitioning, retries, or engine.

    For a fixed key, raising the weight only ever ADDS the row (the
    threshold grows, the bucket doesn't move), so re-scoring a corpus
    upward never evicts previously kept documents.

    Pure column expressions (md5/substring/format_string) — codegen'd,
    portable to any engine with md5 and printf-style hex."""
    w = F.least(
        F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0)
    )
    n = F.floor(w * _GRID)
    thr = F.when(n >= _GRID, F.lit("g")).otherwise(
        F.format_string("%03x", n.cast("int"))
    )
    return df.filter(_bucket(F.col(key_col).cast("string"), salt) < thr)


def source_mix_weights(
    df: DataFrame,
    alpha: float = 0.7,
    budget: int = 100_000,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-scaled source mixing — the multilingual/multi-source
    sampling-rate computation of mT5/GPT-3-style training mixes: source s
    with share p_s = n_s/N samples proportionally to p_s^alpha, so alpha<1
    UP-weights small sources (alpha=1 is natural sampling, alpha=0 is
    uniform). Returns per source (n_docs, mix_weight, quota) where
    mix_weight is the normalized 6-dp-rounded rate and quota =
    floor(mix_weight·budget) documents — feed quota into `cap_per_group`
    and the weight into `weighted_hash_sample` to materialize the mix.

    Plan shape: one hash-agg on source (tiny key space), the corpus total
    and the normalizer each ride in as broadcast 1-row aggregates
    (crossJoin, fully lazy — the tfidf N trick), zero driver collects.
    The only transcendental (pow) is rounded at 6 dp before any
    comparison, the suite's cross-engine float convention."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    raw = counts.crossJoin(F.broadcast(total)).select(
        source_col,
        "n_docs",
        F.pow(F.col("n_docs") / F.col("n_total"), F.lit(alpha)).alias("_raw"),
    )
    z = raw.agg(F.sum("_raw").alias("_z"))
    return (
        raw.crossJoin(F.broadcast(z))
        .select(
            source_col,
            "n_docs",
            F.round(F.col("_raw") / F.col("_z"), 6).alias("mix_weight"),
            F.floor(
                F.round(F.col("_raw") / F.col("_z"), 6) * F.lit(budget)
            ).cast("long").alias("quota"),
        )
    )


def pack_training_sequences(
    df: DataFrame,
    budget_tokens: int,
    salt: str = "",
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic concat-and-pack: the standard pretraining batch
    layout where documents are concatenated in a fixed global order and
    split into `budget_tokens`-sized training sequences; each document is
    assigned the sequence in which it STARTS (a document may straddle into
    the next sequence — that is the packing scheme's own behavior, not an
    approximation).

    The global order is the md5 hash order of (salt | key) — the
    deterministic training-data shuffle: reproducible across engines,
    partitionings and retries, re-saltable per epoch. Returns
    (key, n_tokens, seq_id, start_offset) where start_offset is the
    position of the document's first token inside its sequence.

    Plan shape — a distributed two-pass prefix sum (a global running
    sum is a classic parallel scan, NOT a single global window):
      1. bucket every row by the first 3 hex digits of its sort hash —
         4096 uniform buckets, and because the bucket is a PREFIX of the
         sort key, (bucket, hash) order == global hash order;
      2. within-bucket running sums via a window PARTITIONED by bucket
         (one balanced 4096-key shuffle; every core busy);
      3. per-bucket token totals (a tiny hash-agg, ≤4096 rows) are
         collected — small-by-construction: 4096 longs ≈ 32 KB at ANY
         corpus size — turned into exclusive cumulative offsets, and
         broadcast-joined back;
      4. global_prev = bucket_offset + local_prev; seq_id/start_offset
         are per-row arithmetic.
    At 100 TB each bucket holds ~1/4096 of the slim (key, count) rows,
    so no task ever sees more than ~0.025% of the corpus; the old shape
    (an empty-partition-spec window = Spark moves EVERY row to one task)
    is forbidden by tests/test_plan_audit.py. Output is bit-identical to
    the single-window form: same hash order, same running sum.

    DETERMINISTIC-INPUT REQUIREMENT: step 3 collects bucket totals
    eagerly at call time and the final plan re-evaluates `df` — the input
    is scanned twice. A non-deterministic input (``sample()`` without a
    seed, ``rand()``-derived columns, a source mutating between scans)
    would make the broadcast offsets disagree with the second scan and
    silently corrupt seq_id/start_offset. Pass a deterministic DataFrame,
    or ``.persist()`` it first if the source can change underneath."""
    from pyspark.sql.window import Window

    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    h = _bucket_full(F.col(key_col).cast("string"), salt)
    base = df.select(
        F.col(key_col),
        n_tokens.alias("n_tokens"),
        h.alias("_h"),
        F.conv(F.substring(h, 1, 3), 16, 10).cast("int").alias("_b"),
    )
    w = (
        Window.partitionBy("_b")
        .orderBy("_h", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))

    totals = (
        base.groupBy("_b").agg(F.sum("n_tokens").alias("_t")).collect()
    )
    offsets, running = [], 0
    for row in sorted(totals, key=lambda r: r["_b"]):
        offsets.append((row["_b"], running))
        running += row["_t"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_b int, _off long")

    prev = F.col("_local") + F.col("_off")
    return (
        base.withColumn("_local", local_prev)
        .join(F.broadcast(off_df), "_b")
        .select(
            key_col,
            "n_tokens",
            F.floor(prev / budget_tokens).cast("long").alias("seq_id"),
            F.pmod(prev, F.lit(budget_tokens)).cast("long").alias(
                "start_offset"
            ),
        )
    )


def pack_training_sequences_binned(
    df: DataFrame,
    budget_tokens: int,
    salt: str = "",
    text_col: str = "text",
    key_col: str = "doc_id",
    bucket_hex_digits: int = 3,
) -> DataFrame:
    """Bin-capacity (next-fit, no-straddle) sequence packing: unlike
    `pack_training_sequences` (concat-and-split, where a document may
    straddle into the next sequence), a document here must FIT in the
    current sequence's remaining token budget or a new sequence opens —
    the layout fixed-context training stacks need when an example may not
    cross a sequence boundary. A document longer than the whole budget
    gets a sequence of its own (callers typically chunk those first).

    Document order is the same deterministic md5(salt|key) epoch shuffle
    as the concat-and-pack form. Next-fit is inherently sequential, so
    the corpus is bucketed by the first `bucket_hex_digits` hex digits of
    the sort hash (16^digits uniform buckets) and each bucket packs
    INDEPENDENTLY with fresh state — the standard per-shard packing rule:
    sequences never straddle a bucket boundary, wasting at most one
    partial sequence per bucket (4096 partial sequences against the
    corpus's hundreds of millions — noise), in exchange for full
    parallelism. Global sequence ids stay contiguous and deterministic:
    per-bucket sequence counts (≤4096 longs, small-by-construction) are
    collected, turned into exclusive offsets, and broadcast back — the
    same two-pass discipline as pack_training_sequences, so no
    single-partition window anywhere.

    The next-fit simulation itself is a per-bucket applyInPandas kernel
    (a true data-dependent recursion — not window-expressible); each
    group holds ~1/16^digits of the slim (key, n_tokens, hash) rows. The
    kernel runs twice (once under the count aggregate, once for the
    final rows) — deterministic, and cheaper at scale than materializing
    the intermediate.

    Returns (key, n_tokens, seq_id, start_offset); start_offset is the
    fill level the document was placed at (always 0 for a
    sequence-opening document).

    Gate-shape footnote (q102): the driver gate runs bucket_hex_digits=1
    (16 buckets) so its recursive-CTE DuckDB oracle stays tractable; the
    production default above is 3 (4096 buckets) — the bucket count only
    changes parallelism/waste granularity, not per-document placement
    within a bucket."""
    import pandas as pd

    if not 1 <= bucket_hex_digits <= 3:
        raise ValueError("bucket_hex_digits must be 1..3")
    budget = int(budget_tokens)
    if budget <= 0:
        raise ValueError("budget_tokens must be positive")

    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    h = _bucket_full(F.col(key_col).cast("string"), salt)
    base = df.select(
        F.col(key_col),
        n_tokens.alias("n_tokens"),
        h.alias("_h"),
        F.conv(F.substring(h, 1, bucket_hex_digits), 16, 10)
        .cast("int")
        .alias("_b"),
    )

    out_schema = (
        f"{key_col} {dict(df.dtypes)[key_col]}, n_tokens long, "
        "_b int, _local_seq long, start_offset long"
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["_h", key_col], kind="mergesort")
        seqs, offs = [], []
        bin_id, fill = -1, budget + 1  # force the first doc to open seq 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill + n <= budget:
                offs.append(fill)
                fill += n
            else:
                bin_id += 1
                offs.append(0)
                fill = n
            seqs.append(bin_id)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "_b": pdf["_b"].to_numpy(),
                "_local_seq": seqs,
                "start_offset": offs,
            }
        )

    packed = base.groupBy("_b").applyInPandas(kernel, out_schema)

    totals = (
        packed.groupBy("_b")
        .agg((F.max("_local_seq") + 1).alias("_n_bins"))
        .collect()
    )
    offsets, running = [], 0
    for row in sorted(totals, key=lambda r: r["_b"]):
        offsets.append((row["_b"], running))
        running += row["_n_bins"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_b int, _off long")

    return packed.join(F.broadcast(off_df), "_b").select(
        key_col,
        "n_tokens",
        (F.col("_off") + F.col("_local_seq")).cast("long").alias("seq_id"),
        F.col("start_offset").cast("long").alias("start_offset"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    salt: str = "",
) -> DataFrame:
    """Keep at most `cap` rows per group, chosen deterministically by key
    hash order — the domain-cap / source-quota primitive of a training
    mix ("no single domain exceeds N documents").

    The kept subset depends only on (salt, group, keys present): hash
    order is a uniform random permutation per group, so the cap takes an
    unbiased sample, and re-running (or re-partitioning) never changes
    membership. Raising the cap only ever ADDS rows (the permutation is
    fixed; a bigger prefix of it survives).

    One shuffle on the group key; a viral group is one hot window
    partition — AQE-safe because the window function is rank-only (no
    payload aggregation), and the alternative (exact per-group sort by
    hash) is precisely what the cap semantics require."""
    from pyspark.sql.window import Window

    if "_rn" in df.columns:
        raise ValueError(
            "cap_per_group: input column '_rn' collides with the reserved "
            "rank temp name; rename it first"
        )
    w = Window.partitionBy(group_col).orderBy(
        _bucket_full(F.col(key_col).cast("string"), salt),
        F.col(key_col),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def _bucket_full(key: Column, salt: str) -> Column:
    """Full md5 hex (not the 3-digit bucket): a per-group total order
    needs enough bits that ties are broken by the key itself only when
    hashes truly collide."""
    return F.md5(F.concat(F.lit(f"{salt}|"), key))
