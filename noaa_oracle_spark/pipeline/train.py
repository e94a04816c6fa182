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

    Returns {'weights': [...], 'bias': float, 'losses': [per-iter
    log-loss], 'n': row count} — the loss curve is the convergence
    receipt a training job should log."""
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
    feats = [F.col(c) for c in feature_cols]
    y = F.col(label_col)
    w = [0.0] * len(feature_cols)
    b = 0.0
    losses: "list[float]" = []
    n = 0
    try:
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
            losses.append(float(row["loss"]))
            b -= lr * float(row["gb"])
            w = [
                wj - lr * (float(row[f"g{j}"]) + l2 * wj)
                for j, wj in enumerate(w)
            ]
    finally:
        if cache:
            train.unpersist()
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
