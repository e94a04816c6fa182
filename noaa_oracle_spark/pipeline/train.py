"""In-engine model training — batch gradient descent where every
iteration is ONE distributed aggregation (the `kmeans_update` scale
argument applied to supervised learning): the executors compute
map-side partial sums of the gradient, a single row reaches the driver,
the driver updates the weight vector and broadcasts it back as
literals.  Nothing driver-side grows with corpus size; an iteration
costs exactly one scan.

This completes the engine's training tier (k-means / Lloyd for the IVF
index, PQ/OPQ codebooks for quantization, BPE merges for tokenization):
`train_logistic` fits the linear quality filter that
`text.quality_classifier` SERVES — `fit_quality_classifier` closes the
loop by training on the classifier's own integer per-mille features and
emitting its integer milli-weight dict, so a corpus with labels can
refresh the production filter without leaving the engine.

Determinism: full-batch gradients (no sampling, no row order
dependence — addition over doubles is reassociated by Spark, but the
gradient sums are averaged and the test suite pins tolerance-level
equality across partitionings; the FITTED classifier is exactly
deterministic because serving quantizes to integer milli-weights).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logistic_predict(
    df: DataFrame,
    feature_cols: "list[str]",
    weights: "list[float]",
    bias: float,
    prob_col: str = "prob",
    label_col: str = "label_pred",
) -> DataFrame:
    """Score rows with a fitted model: adds sigmoid probability (6 dp)
    and the 0/1 label (z >= 0).  Pure map-side expressions — broadcast
    weights as literals, no shuffle, no UDF."""
    if len(weights) != len(feature_cols):
        raise ValueError(
            f"logistic_predict: {len(weights)} weights for "
            f"{len(feature_cols)} features"
        )
    z: Column = F.lit(float(bias))
    for w, c in zip(weights, feature_cols):
        z = z + F.lit(float(w)) * F.col(c).cast("double")
    return df.withColumn(
        prob_col, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    ).withColumn(label_col, (z >= 0).cast("long"))


def train_logistic(
    df: DataFrame,
    feature_cols: "list[str]",
    label_col: str,
    iters: int = 100,
    lr: float = 0.5,
    l2: float = 0.0,
    cache: bool = True,
    standardize: bool = False,
    max_loss_growth: "float | None" = 3.0,
) -> dict:
    """Full-batch logistic regression by gradient descent.

    Per iteration: one aggregation computing, map-side-partially,
      grad_j = avg((sigmoid(w·x + b) − y) · x_j)   for every feature,
      grad_b = avg(sigmoid(w·x + b) − y),
      loss   = avg(log-loss)
    — dim+2 aggregate columns, ONE collected row, then the driver takes
    the step w ← w − lr·(grad + l2·w).  `iters` scans total; weights
    ride into each scan as literals (broadcast-by-construction).  The
    learning rate is the caller's (features should be on comparable
    scales — per-mille integer features, as `_quality_cols` emits, work
    as-is with lr ~ 1e-4·1000).

    The training frame is PROJECTED to (features, label) and persisted
    for the loop: every iteration re-reads the frame, and without the
    persist each of `iters` jobs would re-run the whole upstream plan —
    feature extraction, joins, scans — instead of one expensive pass
    plus `iters` cheap ones (round-7 review finding).  The projected
    frame is a handful of doubles per row; `cache=False` opts out for
    inputs that must not be materialized.

    `standardize=True` z-scores each feature with ONE extra aggregation
    before the loop (mean / population stddev; zero-variance features
    fall back to std 1 so a constant column degrades to a bias term
    instead of dividing by zero) and trains in standardized space —
    the footgun-remover for full-batch GD on features of wildly
    different scales.  The returned weights are DE-standardized back
    to raw feature space (w_raw = w_std/σ, b_raw = b_std − Σ w_std·μ/σ)
    so `logistic_predict` on the raw columns serves the fit unchanged.

    Divergence guard: a non-finite per-iteration loss, or one exceeding
    `max_loss_growth`× the first iteration's loss (3× default — the
    w=0 starting loss is log 2, and convex full-batch GD only blows
    past that when the learning rate is too high), raises with the fix
    spelled out instead of silently returning garbage weights; pass
    `max_loss_growth=None` to disable the growth check.

    Returns {'weights': [...], 'bias': float, 'losses': [per-iter
    log-loss], 'n': row count} — the loss curve is the convergence
    receipt a training job should log."""
    import math

    if not feature_cols:
        raise ValueError("train_logistic: need at least one feature")
    if iters < 1:
        raise ValueError(f"train_logistic: iters must be >= 1, got {iters}")
    train = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias(label_col),
    )
    if cache:
        train = train.persist()
    mu = [0.0] * len(feature_cols)
    sigma = [1.0] * len(feature_cols)
    w = [0.0] * len(feature_cols)
    b = 0.0
    losses: "list[float]" = []
    n = 0
    # the try/finally covers EVERY job over the persisted frame —
    # including the standardization pre-pass, whose failure would
    # otherwise leak the persist (round-8 review)
    try:
        if standardize:
            srow = train.agg(
                *[
                    F.avg(c).alias(f"m{j}")
                    for j, c in enumerate(feature_cols)
                ],
                *[
                    F.stddev_pop(c).alias(f"s{j}")
                    for j, c in enumerate(feature_cols)
                ],
            ).collect()[0]
            for j, c in enumerate(feature_cols):
                if srow[f"m{j}"] is None:
                    raise ValueError(
                        f"train_logistic: feature '{c}' is entirely "
                        "NULL — cannot standardize"
                    )
                mu[j] = float(srow[f"m{j}"])
                s = srow[f"s{j}"]
                sigma[j] = (
                    float(s) if s is not None and float(s) > 0.0 else 1.0
                )
        feats = [
            (F.col(c) - F.lit(mu[j])) / F.lit(sigma[j]) if standardize
            else F.col(c)
            for j, c in enumerate(feature_cols)
        ]
        y = F.col(label_col)
        for _ in range(iters):
            z: Column = F.lit(b)
            for wj, xj in zip(w, feats):
                z = z + F.lit(wj) * xj
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - y
            eps = F.lit(1e-12)
            row = train.agg(
                F.count(F.lit(1)).alias("n"),
                F.count(y).alias("n_labeled"),
                F.count(err).alias("n_used"),
                F.avg(
                    -(y * F.log(p + eps) + (F.lit(1.0) - y) * F.log(
                        F.lit(1.0) - p + eps
                    ))
                ).alias("loss"),
                F.avg(err).alias("gb"),
                *[
                    F.avg(err * xj).alias(f"g{j}")
                    for j, xj in enumerate(feats)
                ],
            ).collect()[0]
            n = int(row["n"])
            if n == 0:
                raise ValueError("train_logistic: empty training frame")
            if int(row["n_labeled"]) != n or row["loss"] is None:
                # a non-numeric label column casts to NULL: Spark's avg
                # would silently train on the non-NULL subset (or on
                # nothing) while reporting the full row count
                raise ValueError(
                    f"train_logistic: {n - int(row['n_labeled'])} of {n} "
                    f"labels are NULL after cast to double — "
                    f"'{label_col}' must be numeric 0/1 (or the feature "
                    "columns produced NULL aggregates)"
                )
            if int(row["n_used"]) != int(row["n_labeled"]):
                # a NULL in ANY feature column NULLs z/p/err, so avg()
                # silently drops that row from every gradient and the
                # loss while count(*) still reports it — the model
                # would train on an unreported subset (round-8 advice)
                raise ValueError(
                    f"train_logistic: feature NULLs exclude "
                    f"{int(row['n_labeled']) - int(row['n_used'])} of {n} "
                    "rows from every gradient — clean or impute the "
                    "feature columns before training"
                )
            loss = float(row["loss"])
            if not math.isfinite(loss) or (
                max_loss_growth is not None
                and losses
                and loss > max_loss_growth * losses[0]
            ):
                raise ValueError(
                    f"train_logistic: diverging — iteration "
                    f"{len(losses)} loss {loss!r} vs initial "
                    f"{losses[0] if losses else loss!r} — lower lr "
                    "(or pass standardize=True for features on "
                    "mismatched scales)"
                )
            losses.append(loss)
            b -= lr * float(row["gb"])
            w = [
                wj - lr * (float(row[f"g{j}"]) + l2 * wj)
                for j, wj in enumerate(w)
            ]
    finally:
        if cache:
            train.unpersist()
    if standardize:
        # fold the z-scoring into the weights so raw-space serving
        # (logistic_predict on the original columns) is the same model
        b -= sum(wj * m / s for wj, m, s in zip(w, mu, sigma))
        w = [wj / s for wj, s in zip(w, sigma)]
    return {"weights": w, "bias": b, "losses": losses, "n": n}


def fit_quality_classifier(
    docs: DataFrame,
    labels: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    iters: int = 200,
    lr: float = 3e-4,
    l2: float = 1e-6,
) -> "dict[str, int]":
    """Train `text.quality_classifier`'s weights on labeled documents —
    the train side of the serve path: features are the classifier's own
    integer per-mille columns (stop-word share, digit share, capped
    token count), the fit runs in-engine (`train_logistic`), and the
    result is the classifier's integer MILLI-weight dict (floats ×1000,
    rounded) so serving stays engine-exact.

    `labels` is (id_col, label 0/1).  The join is on the document id;
    unlabeled documents are simply not trained on."""
    from noaa_oracle_spark.pipeline.text import _quality_cols, spread

    cols = _quality_cols(text_col)
    feats = spread(docs).select(
        id_col,
        cols["stop_permille"].alias("_f_stop"),
        cols["digit_permille"].alias("_f_digit"),
        F.least(cols["n_tokens"], F.lit(100)).alias("_f_tokens"),
    )
    train = feats.join(
        labels.select(id_col, F.col(label_col).alias("_y")), id_col
    )
    fit = train_logistic(
        train,
        ["_f_stop", "_f_digit", "_f_tokens"],
        "_y",
        iters=iters,
        lr=lr,
        l2=l2,
    )
    names = ["stop_permille", "digit_permille", "n_tokens_capped"]
    out = {
        name: int(round(wj * 1000.0))
        for name, wj in zip(names, fit["weights"])
    }
    out["bias"] = int(round(fit["bias"] * 1000.0))
    return out
