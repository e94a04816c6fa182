"""Incrementally-maintained corpus statistics (continuous aggregate for
the training-data pipeline).

tf-idf and unigram-logprob scoring both need corpus-global statistics —
per-term document frequency (df), per-term occurrence count (tf), total
documents and tokens. Recomputing them per batch re-scans the corpus; at
100 TB that is the same anti-pattern as the reference recomputing daily
rollups per request. The fix is the same continuous-aggregate shape as
incremental/rollup.py: the statistics are a commutative monoid over file
batches —

    state column     partial             merge
    df               count of docs containing term (per batch)   sum
    tf               term occurrences (per batch)                sum
    n_docs, n_tokens batch totals (manifest metadata)            sum

so folding only NEW files is algebraically identical to a full recompute
(integer sums — no float-order caveat at all here).

Crash safety is inherited from incremental/statedir.py: the processed-file
manifest rides inside the state directory and publishes in the same atomic
rename as the state, so no crash point can double-fold a file's counts.

Serving: `score_unigram_logprob(docs)` reproduces pipeline.text's
unigram_logprob EXACTLY (same ln(tf/n_tokens) per token, same 6-dp
rounding) when every term is in-state — the parity tested against the
batch operator — and add-one-smooths unseen terms when scoring documents
from outside the folded corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_oracle_spark.incremental import statedir


def _term_partials(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    words = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    return words.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("_doc").alias("df"),
    )


class CorpusStatsStore:
    """Parquet-backed continuous aggregate of term df/tf + corpus totals."""

    def __init__(self, store_dir: str, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.store_dir = store_dir
        self.text_col = text_col
        self.id_col = id_col
        os.makedirs(store_dir, exist_ok=True)

    @property
    def _state_path(self) -> str:
        return os.path.join(self.store_dir, "term_stats.parquet")

    def _meta(self) -> dict:
        meta = statedir.read_meta(self._state_path)
        return meta or {"processed": [], "n_docs": 0, "n_tokens": 0}

    def totals(self) -> tuple[int, int]:
        m = self._meta()
        return int(m["n_docs"]), int(m["n_tokens"])

    def refresh(self, spark: SparkSession, corpus_dir: str) -> int:
        """Fold every not-yet-processed parquet file under `corpus_dir`
        into the term state. Returns the number of new files folded."""
        statedir.recover(self._state_path)
        paths = sorted(
            os.path.join(corpus_dir, f)
            for f in os.listdir(corpus_dir)
            if f.endswith(".parquet")
        )
        meta = self._meta()
        done = set(meta["processed"])
        new = [p for p in paths if p not in done]
        if not new:
            return 0
        batch = spark.read.parquet(*new)
        delta = _term_partials(batch, self.text_col, self.id_col)
        b_docs = batch.count()
        b_tokens = (
            batch.select(
                F.explode(F.split(F.col(self.text_col), " ")).alias("t")
            )
            .filter(F.col("t") != "")
            .count()
        )
        if os.path.exists(self._state_path):
            state = spark.read.parquet(self._state_path)
            merged = (
                state.unionByName(delta)
                .groupBy("term")
                .agg(F.sum("tf").alias("tf"), F.sum("df").alias("df"))
            )
        else:
            merged = delta
        tmp = self._state_path + ".tmpdir"
        merged.write.mode("overwrite").parquet(tmp)
        statedir.publish(
            self._state_path,
            tmp,
            {
                "processed": sorted(done | set(new)),
                "n_docs": int(meta["n_docs"]) + b_docs,
                "n_tokens": int(meta["n_tokens"]) + b_tokens,
            },
        )
        return len(new)

    def term_stats(self, spark: SparkSession) -> DataFrame:
        statedir.recover(self._state_path)
        if not os.path.exists(self._state_path):
            raise FileNotFoundError(
                "corpus stats empty — call refresh() first"
            )
        return spark.read.parquet(self._state_path)

    def score_unigram_logprob(
        self, spark: SparkSession, docs: DataFrame, round_digits: int = 6
    ) -> DataFrame:
        """Mean unigram log-probability per document under the MAINTAINED
        distribution — identical to pipeline.text.unigram_logprob for
        documents whose terms are all in-state (ln(tf/n_tokens) per token,
        rounded avg), with add-one smoothing ((tf+1)/(n_tokens+|vocab|))
        for unseen terms so out-of-corpus documents still score finitely."""
        n_docs, n_tokens = self.totals()
        stats = self.term_stats(spark)
        vocab = stats.count()
        words = docs.select(
            F.col(self.id_col),
            F.explode(F.split(F.col(self.text_col), " ")).alias("term"),
        ).filter(F.col("term") != "")
        joined = words.join(stats.select("term", "tf"), "term", "left")
        logp = F.when(
            F.col("tf").isNotNull(),
            F.log(F.col("tf") / F.lit(float(n_tokens))),
        ).otherwise(
            F.log(F.lit(1.0) / F.lit(float(n_tokens + vocab)))
        )
        return joined.groupBy(self.id_col).agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(logp), round_digits).alias("logprob"),
        )
