"""Driver-facing suite entries for the training-data pipeline operators
(dedup / similarity / text analysis) over documents + embeddings, each with a
DuckDB oracle. Hash portability: every hash is md5-hex (identical in both
engines); thresholds compare integers; cosine ranks on a 6-dp-rounded value.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_ppjoin,
    simhash_fingerprints,
)
from noaa_oracle_spark.pipeline.similarity import (
    brute_force_knn,
    embedding_cosine_pairs,
    embedding_cosine_pairs_blocked,
    ivf_knn,
    kmeans_assign,
    kmeans_update,
    lsh_bucketed_knn,
    semantic_dedup,
)
from noaa_oracle_spark.pipeline.text import (
    TOKEN_RE,
    boilerplate_ngram_stats,
    document_fingerprint,
    language_id,
    quality_scores,
    repetition_stats,
    chunk_documents,
    span_dedup,
    token_counts,
    unigram_logprob,
    winnowing_fingerprints,
)
from noaa_oracle_spark.suite import load


def q16_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load(spark, sf_dir, "documents"))


SQL_Q16 = """
SELECT md5(text) AS text_hash, min(doc_id) AS rep_doc_id, count(*) AS dup_count
FROM documents GROUP BY 1
"""


def q17_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # threshold 3/10 on word-3-gram Jaccard
    return ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold_num=3, threshold_den=10
    )


# Same shingling (word 3-grams from a single-space split), same integer
# threshold arithmetic: 10*common >= 3*union.
SQL_Q17 = """
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
), idx AS (
    SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i
    FROM w WHERE len(words) >= 3
), sh AS (
    SELECT DISTINCT doc_id,
           words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
    FROM idx
), cnt AS (
    SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, common, ca.n_sh + cb.n_sh - common AS union_size
FROM pairs
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE common * 10 >= (ca.n_sh + cb.n_sh - common) * 3
"""


def q18_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_candidates(
        load(spark, sf_dir, "documents"), num_hashes=8, rows_per_band=2
    )


# MinHash portability: min over the first 15 md5 hex chars parsed as a
# 60-bit BIGINT — numerically identical in both engines (Spark conv(,16,10)
# == DuckDB '0x…'::BIGINT, probed equal), and integer mins keep Spark in
# hash aggregation; bands of 2 hashed again (BIGINT || '|' renders the same
# decimal digits both sides).
_MH = ",\n           ".join(
    f"min(('0x' || substring(md5('{i}|' || shingle), 1, 15))::BIGINT)"
    f" AS mh{i}"
    for i in range(8)
)
SQL_Q18 = f"""
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
), idx AS (
    SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i
    FROM w WHERE len(words) >= 3
), sh AS (
    SELECT DISTINCT doc_id,
           words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
    FROM idx
), sig AS (
    SELECT doc_id,
           {_MH}
    FROM sh GROUP BY doc_id
), expanded AS (
    SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7,
           unnest([0, 1, 2, 3]) AS band_id
    FROM sig
), bands AS (
    SELECT doc_id, band_id,
           CASE band_id
             WHEN 0 THEN md5(mh0 || '|' || mh1)
             WHEN 1 THEN md5(mh2 || '|' || mh3)
             WHEN 2 THEN md5(mh4 || '|' || mh5)
             WHEN 3 THEN md5(mh6 || '|' || mh7)
           END AS band_hash
    FROM expanded
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
            AND a.doc_id < b.doc_id
"""


def q19_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_fingerprints(load(spark, sf_dir, "documents"), bits=16)


_SIMHASH_SUMS = ",\n           ".join(
    "sum(CASE WHEN substr(md5(w), {p}, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{j}".format(
        p=j + 1, j=j
    )
    for j in range(16)
)
_SIMHASH_VAL = " + ".join(
    f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(16)
)
SQL_Q19 = f"""
WITH words AS (
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
    FROM documents
), filtered AS (
    SELECT doc_id, w FROM words WHERE w != ''
), sums AS (
    SELECT doc_id,
           {_SIMHASH_SUMS}
    FROM filtered GROUP BY doc_id
)
SELECT doc_id, CAST({_SIMHASH_VAL} AS BIGINT) AS simhash FROM sums
"""


def q20_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return brute_force_knn(
        emb.filter(F.col("vec_id") < 10), emb, k=5, round_digits=6
    )


SQL_Q20 = """
WITH q AS (
    SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
), scored AS (
    SELECT q.q_id, e.vec_id AS n_id,
           round(
             list_sum(list_transform(range(1, len(q.q_vec) + 1),
                      i -> q.q_vec[i]::DOUBLE * e.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(q.q_vec, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))),
             6) AS cos_sim
    FROM q, embeddings e
    WHERE e.vec_id != q.q_id
), ranked AS (
    SELECT q_id, n_id, cos_sim,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, n_id ASC) AS rank
    FROM scored
)
SELECT q_id, rank, n_id, cos_sim FROM ranked WHERE rank <= 5
"""


def q21_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(load(spark, sf_dir, "documents"))


_ALL_STOP = ", ".join(
    f"'{w}'"
    for ws in (
        ["the", "a", "of", "and", "to"],
        ["el", "la", "de", "y", "que"],
        ["der", "die", "das", "und", "zu"],
        ["le", "la", "de", "et", "les"],
    )
    for w in ws
)
SQL_Q21 = f"""
WITH base AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '),
               w -> w IN ({_ALL_STOP}))) AS n_stopwords,
           length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
    FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_stopwords AS BIGINT) AS n_stopwords,
       CAST(floor(n_stopwords * 1000 / n_tokens) AS BIGINT) AS stop_permille,
       CAST(floor(n_digits * 1000 / greatest(n_nonspace, 1)) AS BIGINT)
           AS digit_permille,
       CAST(100
            - (CASE WHEN n_tokens < 20 THEN 40 ELSE 0 END)
            - (CASE WHEN floor(n_stopwords * 1000 / n_tokens) < 50
                    THEN 30 ELSE 0 END)
            - (CASE WHEN floor(n_digits * 1000 / greatest(n_nonspace, 1)) > 300
                    THEN 20 ELSE 0 END) AS BIGINT) AS quality_score
FROM base
"""


def q22_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = language_id(load(spark, sf_dir, "documents"))
    return d.groupBy("lang", "detected_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def _hits_sql(lang: str, words: list[str]) -> str:
    wl = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(string_split(text, ' '), w -> w IN ({wl}))) AS hits_{lang}"
    )


SQL_Q22 = f"""
WITH hits AS (
    SELECT lang,
           {_hits_sql('de', ['der', 'die', 'das', 'und', 'zu'])},
           {_hits_sql('en', ['the', 'a', 'of', 'and', 'to'])},
           {_hits_sql('es', ['el', 'la', 'de', 'y', 'que'])},
           {_hits_sql('fr', ['le', 'la', 'de', 'et', 'les'])}
    FROM documents
), detected AS (
    SELECT lang,
           CASE
             WHEN hits_de > 0 AND hits_de >= hits_en AND hits_de >= hits_es
                  AND hits_de >= hits_fr THEN 'de'
             WHEN hits_en > 0 AND hits_en > hits_de AND hits_en >= hits_es
                  AND hits_en >= hits_fr THEN 'en'
             WHEN hits_es > 0 AND hits_es > hits_de AND hits_es > hits_en
                  AND hits_es >= hits_fr THEN 'es'
             WHEN hits_fr > 0 AND hits_fr > hits_de AND hits_fr > hits_en
                  AND hits_fr > hits_es THEN 'fr'
             ELSE 'und'
           END AS detected_lang
    FROM hits
)
SELECT lang, detected_lang, count(*) AS n_docs
FROM detected GROUP BY 1, 2
"""


def q23_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return document_fingerprint(load(spark, sf_dir, "documents"))


SQL_Q23 = """
SELECT doc_id,
       substr(md5(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))), 1, 16)
           AS fingerprint
FROM documents
"""


def q24_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(load(spark, sf_dir, "documents"))


SQL_Q24 = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens_bpe,
       CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens_ws
FROM documents
"""


_LSH_PLANES = 3
# recall@5 vs exact at sf0.1: 4 tables → 0.64, 6 → 0.78, 8 → 0.92 at equal
# warm runtime (the bucketing matmul is one Arrow batch either way)
_LSH_TABLES = 8


def q27_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The similarity-search scale path: multi-table random-hyperplane LSH
    (OR-amplified for recall) restricts candidates before exact cosine
    ranking. Hyperplanes derive deterministically from md5, so the
    identical bucketing runs in SQL."""
    emb = load(spark, sf_dir, "embeddings")
    return lsh_bucketed_knn(
        emb.filter(F.col("vec_id") < 10), emb, dim=64, k=5,
        num_planes=_LSH_PLANES, num_tables=_LSH_TABLES,
    )


def _plane_term(global_p: int, weight: int) -> str:
    """SQL for dot(embedding, hyperplane_{global_p}) > 0 → `weight`;
    component i (0-based) is ±1 from the high bit of md5('{global_p}|{i}')."""
    comp = (
        f"CASE WHEN substr(md5('{global_p}|' || (i-1)), 1, 1) IN "
        "('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END"
    )
    dot = (
        f"list_sum(list_transform(range(1, len(embedding)+1), "
        f"i -> embedding[i]::DOUBLE * ({comp})))"
    )
    return f"(CASE WHEN {dot} > 0 THEN {weight} ELSE 0 END)"


def _table_sql(t: int) -> str:
    bucket = " + ".join(
        _plane_term(t * _LSH_PLANES + p, 2 ** p) for p in range(_LSH_PLANES)
    )
    return (
        f"SELECT vec_id, embedding, {t} AS tbl, "
        f"CAST({bucket} AS INT) AS bucket FROM embeddings"
    )


_BUCKETED_SQL = "\n    UNION ALL\n    ".join(
    _table_sql(t) for t in range(_LSH_TABLES)
)

SQL_Q27 = f"""
WITH bucketed AS (
    {_BUCKETED_SQL}
), q AS (
    SELECT vec_id AS q_id, embedding AS q_vec, tbl, bucket
    FROM bucketed WHERE vec_id < 10
), cand AS (
    SELECT DISTINCT q.q_id, q.q_vec, c.vec_id AS n_id, c.embedding AS n_vec
    FROM q JOIN bucketed c
      ON q.tbl = c.tbl AND q.bucket = c.bucket AND c.vec_id != q.q_id
), scored AS (
    SELECT q_id, n_id,
           round(
             list_sum(list_transform(range(1, len(q_vec) + 1),
                      i -> q_vec[i]::DOUBLE * n_vec[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(q_vec, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(n_vec, x -> x::DOUBLE * x::DOUBLE)))),
             6) AS cos_sim
    FROM cand
), ranked AS (
    SELECT q_id, n_id, cos_sim,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, n_id ASC) AS rank
    FROM scored
)
SELECT q_id, rank, n_id, cos_sim FROM ranked WHERE rank <= 5
"""


def q28_latest_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY … LIMIT result shaping (T2/T3 — the raw page's default
    `ORDER BY station_id, generated_at DESC LIMIT 200`, raw_data.js:98-99)
    with a total order for determinism."""
    e = load(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(200)
        .select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value")
    )


SQL_Q28 = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
FROM events ORDER BY ts DESC, event_id DESC LIMIT 200
"""


# shared cosine fragment for the SQL oracles (1-based DuckDB list indexing)
_COS_SQL = (
    "round(list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)) "
    "/ (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))) "
    "* sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))), 6)"
)


def q29_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at threshold 0.4 — the last
    rung of the dedup ladder (semantic dups that share no shingles)."""
    return embedding_cosine_pairs(
        load(spark, sf_dir, "embeddings"), threshold=0.4
    )


SQL_Q29 = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings)
SELECT * FROM (
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
           {_COS_SQL.format(a='a.embedding', b='b.embedding')} AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
) WHERE cos_sim >= 0.4
"""


_IVF_NLIST = 16
_IVF_NPROBE = 4


def q30_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: data-dependent centroid cells, nprobe-limited search —
    the clustered-corpus counterpart to q27's LSH path."""
    emb = load(spark, sf_dir, "embeddings")
    return ivf_knn(
        emb.filter(F.col("vec_id") < 10), emb, k=5,
        nlist=_IVF_NLIST, nprobe=_IVF_NPROBE,
    )


SQL_Q30 = f"""
WITH cent AS (
    SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
    WHERE vec_id < {_IVF_NLIST}
), assigned AS (
    SELECT n_id, n_vec, c_id FROM (
        SELECT e.vec_id AS n_id, e.embedding AS n_vec, cent.c_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_COS_SQL.format(a='e.embedding', b='cent.c_vec')}
                            DESC, cent.c_id ASC) AS r
        FROM embeddings e CROSS JOIN cent
    ) WHERE r = 1
), probes AS (
    SELECT q_id, q_vec, c_id FROM (
        SELECT e.vec_id AS q_id, e.embedding AS q_vec, cent.c_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_COS_SQL.format(a='e.embedding', b='cent.c_vec')}
                            DESC, cent.c_id ASC) AS r
        FROM embeddings e CROSS JOIN cent
        WHERE e.vec_id < 10
    ) WHERE r <= {_IVF_NPROBE}
), scored AS (
    SELECT p.q_id, a.n_id,
           {_COS_SQL.format(a='p.q_vec', b='a.n_vec')} AS cos_sim
    FROM probes p JOIN assigned a ON p.c_id = a.c_id AND p.q_id != a.n_id
), ranked AS (
    SELECT q_id, n_id, cos_sim,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, n_id ASC) AS rank
    FROM scored
)
SELECT q_id, rank, n_id, cos_sim FROM ranked WHERE rank <= 5
"""


def q38_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: connected components over the q17 Jaccard pair
    graph — pair soup → (doc, component) groups keyed by min member id.
    Iterative min-label propagation on Spark; the oracle replays it as a
    DuckDB recursive CTE (transitive closure + min-reachable-root)."""
    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, threshold_num=3, threshold_den=10
    ).select("doc_a", "doc_b")
    return connected_components(docs, pairs)


SQL_Q38 = f"""
WITH RECURSIVE pairs AS (
    {SQL_Q17}
), edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(node, root) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, min(root) AS component FROM reach GROUP BY node
"""


def q48_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (50% of 'en' docs, 20% of the
    rest, keyed on doc_id) — reproducible train/test membership with no
    RNG; the oracle computes the identical md5-bucket selection."""
    from noaa_oracle_spark.pipeline.sampling import stratified_hash_sample

    docs = load(spark, sf_dir, "documents")
    picked = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.5}, default_fraction=0.2,
        salt="train",
    )
    return picked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("id_checksum"),
    )


# 0.5 → 2048/4096 = '800'; 0.2 → 819/4096 = '333'
SQL_Q48 = """
SELECT lang, count(*) AS n_sampled, CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM documents
WHERE substr(md5('train|' || CAST(doc_id AS VARCHAR)), 1, 3)
      < (CASE WHEN lang = 'en' THEN '800' ELSE '333' END)
GROUP BY lang
"""


_WINNOW_K = 8
_WINNOW_W = 4


def q46_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints over documents, counted per doc —
    the position-robust fingerprinting that q23's whole-doc hash is not."""
    fp = winnowing_fingerprints(
        load(spark, sf_dir, "documents"), k=_WINNOW_K, window=_WINNOW_W
    )
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fingerprint").alias("min_fp"),
    )


SQL_Q46 = f"""
WITH pos AS (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text) - {_WINNOW_K} + 1)) AS start
    FROM documents
    WHERE length(text) >= {_WINNOW_K} + {_WINNOW_W} - 1
), hashed AS (
    SELECT doc_id, start,
           ('0x' || substring(md5(substring(text, start, {_WINNOW_K})),
                              1, 15))::BIGINT AS h,
           max(start) OVER (PARTITION BY doc_id) AS max_start
    FROM pos
), winnowed AS (
    SELECT doc_id,
           min(h) OVER (PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
               AS fp,
           start, max_start
    FROM hashed
), fingerprints AS (
    SELECT DISTINCT doc_id, fp FROM winnowed
    WHERE start <= max_start - {_WINNOW_W - 1}
)
SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fp
FROM fingerprints GROUP BY doc_id
"""


def q63_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition prefilter: integer numerators/denominators
    for max-word share and duplicate-2-gram share, plus the keep flag."""
    return repetition_stats(load(spark, sf_dir, "documents"))


SQL_Q63 = """
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
), wx AS (
    SELECT doc_id, unnest(words) AS w FROM w
), wc AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
           count(*) AS n_distinct_words,
           max(c) AS max_word_count
    FROM (SELECT doc_id, w, count(*) AS c FROM wx GROUP BY 1, 2)
    GROUP BY 1
), gx AS (
    SELECT doc_id, words[i] || ' ' || words[i+1] AS g
    FROM (SELECT doc_id, words,
                 unnest(generate_series(1, len(words) - 1)) AS i
          FROM w WHERE len(words) >= 2)
), gc AS (
    SELECT doc_id, count(*) AS n_2grams,
           count(DISTINCT g) AS n_distinct_2grams
    FROM gx GROUP BY 1
)
SELECT wc.doc_id, n_words, n_distinct_words, max_word_count,
       coalesce(n_2grams, 0) AS n_2grams,
       coalesce(n_distinct_2grams, 0) AS n_distinct_2grams,
       CAST(4 * max_word_count <= n_words
            AND 5 * coalesce(n_2grams - n_distinct_2grams, 0)
                <= coalesce(n_2grams, 0) AS INT) AS keep
FROM wc LEFT JOIN gc ON wc.doc_id = gc.doc_id
"""


def q64_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc boilerplate word-5-grams (≥ 10 distinct docs) and each
    document's boilerplate share, as integers."""
    return boilerplate_ngram_stats(
        load(spark, sf_dir, "documents"), n=5, min_docs=10
    )


SQL_Q64 = """
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' '
             || words[i+3] || ' ' || words[i+4] AS shingle
    FROM (SELECT doc_id, words,
                 unnest(generate_series(1, len(words) - 4)) AS i
          FROM w WHERE len(words) >= 5)
), freq AS (
    SELECT shingle, count(DISTINCT doc_id) AS n_docs FROM sh GROUP BY 1
)
SELECT doc_id, count(*) AS n_grams,
       CAST(sum(CAST(n_docs >= 10 AS BIGINT)) AS BIGINT) AS n_boilerplate
FROM sh JOIN freq USING (shingle)
GROUP BY 1
"""


def q66_ppjoin_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin prefix-filtered thresholded-Jaccard pairs — the same output
    contract as q17's inverted-index join (equality at any threshold is
    property-tested in test_ppjoin), via the candidate generation that
    survives Zipfian hot shingles at corpus scale (12× faster on the
    50k-doc planted-boilerplate bench, SCALE.md §4). Gated at 0.8 — the
    high-threshold near-dup regime prefix filtering is designed for, where
    only ~20% of each doc's (rarest) shingles need indexing."""
    df = ngram_jaccard_pairs_ppjoin(
        load(spark, sf_dir, "documents"), threshold_num=8, threshold_den=10
    )
    return df.select(
        "doc_a",
        "doc_b",
        F.col("common").cast("long").alias("common"),
        F.col("union_size").cast("long").alias("union_size"),
    )


# Same shape as q17's oracle with the 8/10 threshold arithmetic.
SQL_Q66 = SQL_Q17.replace(
    "common * 10 >= (ca.n_sh + cb.n_sh - common) * 3",
    "common * 10 >= (ca.n_sh + cb.n_sh - common) * 8",
)


def q77_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word 3-gram
    with the benchmark holdout (doc_id % 97 == 0 plays the eval set; the
    operator defaults to 5-grams, the gate uses 3 so the synthetic corpus
    produces a discriminative overlap set). The benchmark gram set
    broadcasts; the corpus side never shuffles before its per-doc rollup
    (pipeline/text.decontamination)."""
    from noaa_oracle_spark.pipeline.text import decontamination

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return decontamination(train, bench, n=3)


SQL_Q77 = """
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
), idx AS (
    SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i
    FROM w WHERE len(words) >= 3
), sh AS (
    SELECT DISTINCT doc_id,
           words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
    FROM idx
), bench AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
), train AS (
    SELECT * FROM sh WHERE doc_id % 97 <> 0
), totals AS (
    SELECT doc_id, count(*) AS total_grams FROM train GROUP BY 1
), shared AS (
    SELECT t.doc_id, count(*) AS shared_grams
    FROM train t JOIN bench b USING (shingle) GROUP BY 1
)
SELECT s.doc_id, s.shared_grams, t.total_grams
FROM shared s JOIN totals t USING (doc_id)
"""


def q78_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf terms per document; rank compares the 6-dp-rounded
    score with term-string tiebreak (pipeline/text.tfidf_top_terms)."""
    from noaa_oracle_spark.pipeline.text import tfidf_top_terms

    return tfidf_top_terms(load(spark, sf_dir, "documents"), k=3)


# Same tf / df / ln(N/df) arithmetic, same 6-dp rounding before ranking.
SQL_Q78 = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM words
    WHERE term <> '' GROUP BY 1, 2
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (
    SELECT count(*) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.term,
           round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
    SELECT doc_id, term, tfidf,
           row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
           ) AS rnk
    FROM scored
)
SELECT doc_id, term, tfidf, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
"""


def q79_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus audit: volume, exact-duplicate rate (distinct
    md5(text) vs rows), language spread, and size profile — the
    domain/source-level rollup a crawl pipeline uses to budget and prune
    sources. One hash-agg on `source`; md5 stays in codegen."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
    )


SQL_Q79 = """
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_distinct_texts,
       count(DISTINCT lang) AS n_langs,
       round(avg(n_chars), 4) AS avg_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY 1
"""


def q89_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document span dedup with reassembly (pipeline.text.span_dedup):
    4-word spans, drop spans any other document also contains, stitch the
    survivors back in order."""
    return span_dedup(load(spark, sf_dir, "documents"), span_words=4)


SQL_Q89 = """
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
), idx AS (
    SELECT doc_id, words,
           unnest(generate_series(0,
               ((len(words) + 3) // 4) - 1)) AS i
    FROM w
), sp AS (
    SELECT doc_id, i AS span_idx,
           array_to_string(
               list_slice(words, i * 4 + 1, least((i + 1) * 4, len(words))),
               ' ') AS span
    FROM idx
), freq AS (
    SELECT span, count(*) AS span_freq FROM sp GROUP BY 1
)
SELECT doc_id,
       count(*) AS n_spans,
       count(*) FILTER (WHERE span_freq <= 1) AS n_kept,
       coalesce(
           string_agg(span, ' ' ORDER BY span_idx)
               FILTER (WHERE span_freq <= 1),
           '') AS clean_text
FROM sp JOIN freq USING (span)
GROUP BY doc_id
"""


def q90_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional deterministic sampling
    (pipeline.sampling.weighted_hash_sample): weight = min(n_chars/200, 1)
    — longer documents kept more often, long docs always kept (exercising
    the weight-1 'g' threshold), membership reproducible from (salt, id)
    alone."""
    from noaa_oracle_spark.pipeline.sampling import weighted_hash_sample

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.least(F.col("n_chars") / F.lit(200.0), F.lit(1.0))
    )
    picked = weighted_hash_sample(docs, "doc_id", "w", salt="wq")
    return picked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("id_checksum"),
    )


SQL_Q90 = """
WITH weighted AS (
    SELECT *, least(n_chars / 200.0, 1.0) AS w FROM documents
)
SELECT lang, count(*) AS n_sampled, CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM weighted
WHERE substr(md5('wq|' || CAST(doc_id AS VARCHAR)), 1, 3)
      < (CASE WHEN CAST(floor(w * 4096) AS INT) >= 4096 THEN 'g'
              ELSE printf('%03x', CAST(floor(w * 4096) AS INT)) END)
GROUP BY lang
"""


def q91_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring (pipeline.text.unigram_logprob):
    mean unigram log-probability per document under the corpus's own
    distribution."""
    return unigram_logprob(load(spark, sf_dir, "documents"))


SQL_Q91 = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), w AS (
    SELECT doc_id, term FROM words WHERE term <> ''
), counts AS (
    SELECT term, count(*) AS tc FROM w GROUP BY 1
), total AS (
    SELECT count(*) AS n_total FROM w
)
SELECT doc_id,
       count(*) AS n_tokens,
       round(avg(ln(tc / n_total)), 6) AS logprob
FROM w JOIN counts USING (term) CROSS JOIN total
GROUP BY doc_id
"""


def q92_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-window chunking (pipeline.text.chunk_documents): 16-token
    windows, 4 tokens of overlap (stride 12). Integer casts align Spark's
    int chunk metadata with DuckDB's BIGINT."""
    out = chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=16, overlap=4
    )
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        "chunk_text",
    )


SQL_Q92 = """
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
), idx AS (
    SELECT doc_id, words,
           unnest(generate_series(0,
               CASE WHEN len(words) <= 16 THEN 0
                    ELSE (len(words) - 16 + 11) // 12 END)) AS i
    FROM w
)
SELECT doc_id,
       i AS chunk_idx,
       len(list_slice(words, i * 12 + 1,
                      least(i * 12 + 16, len(words)))) AS n_chunk_tokens,
       array_to_string(list_slice(words, i * 12 + 1,
                                  least(i * 12 + 16, len(words))),
                       ' ') AS chunk_text
FROM idx
"""


def q93_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap (pipeline.sampling.cap_per_group): at most 150
    documents per source, membership decided by deterministic hash order.
    Emits the capped counts and an id checksum so the exact kept set is
    hash-compared, not just its size."""
    from noaa_oracle_spark.pipeline.sampling import cap_per_group

    docs = load(spark, sf_dir, "documents")
    capped = cap_per_group(docs, "source", "doc_id", cap=150, salt="quota")
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_checksum"),
    )


SQL_Q93 = """
WITH ranked AS (
    SELECT source, doc_id,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5('quota|' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
)
SELECT source, count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM ranked WHERE rn <= 150
GROUP BY source
"""


_KMEANS_K = 8


def _kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seed centroids: the k lowest vec_ids (k-means needs
    SOME seeding rule; id-order is reproducible with no RNG, like the
    suite's md5-bucket sampling)."""
    return load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _KMEANS_K
    )


def q87_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-assignment rollup: route every non-seed vector to its
    nearest seed centroid (cosine, 6-dp rounded, lowest-cid tiebreak) and
    report per-cluster membership plus how many members share the seed's
    label — the purity signal an IVF build or diversity-sampling pass
    reads. The assignment itself is the zero-shuffle literal-centroid fold
    (kmeans_assign); the only exchange is the final k-group agg."""
    emb = load(spark, sf_dir, "embeddings")
    seeds = _kmeans_centroids(spark, sf_dir)
    assigned = kmeans_assign(emb.filter(F.col("vec_id") >= _KMEANS_K), seeds)
    seed_labels = seeds.select(
        F.col("vec_id").alias("cluster_id"),
        F.col("label").alias("seed_label"),
    )
    return (
        assigned.join(F.broadcast(seed_labels), "cluster_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count(
                F.when(F.col("label") == F.col("seed_label"), F.lit(1))
            ).alias("n_label_match"),
        )
    )


SQL_Q87 = """
WITH seeds AS (
    SELECT vec_id AS cid, embedding AS c_vec, label AS seed_label
    FROM embeddings WHERE vec_id < 8
), scored AS (
    SELECT e.vec_id, e.label, s.cid, s.seed_label,
           round(
             list_sum(list_transform(range(1, len(e.embedding) + 1),
                      i -> e.embedding[i]::DOUBLE * s.c_vec[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(e.embedding,
                       x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(s.c_vec,
                       x -> x::DOUBLE * x::DOUBLE)))),
             6) AS cos_sim
    FROM embeddings e, seeds s
    WHERE e.vec_id >= 8
), assigned AS (
    SELECT vec_id, label, cid, seed_label,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos_sim DESC, cid ASC) AS rnk
    FROM scored
)
SELECT cid AS cluster_id,
       count(*) AS n_members,
       count(*) FILTER (WHERE label = seed_label) AS n_label_match
FROM assigned WHERE rnk = 1
GROUP BY 1
"""


def q88_kmeans_centroid_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration's reduce: per-cluster per-dimension mean of the
    q87 assignment, in long form (cluster_id, dim, centroid_val). The
    shuffle key space is k × dim — tiny and uniform no matter how skewed
    the cluster sizes are, which is why the long form beats any
    collect_list-of-arrays agg at scale."""
    emb = load(spark, sf_dir, "embeddings")
    seeds = _kmeans_centroids(spark, sf_dir)
    assigned = kmeans_assign(emb.filter(F.col("vec_id") >= _KMEANS_K), seeds)
    return kmeans_update(assigned)


SQL_Q88 = """
WITH seeds AS (
    SELECT vec_id AS cid, embedding AS c_vec FROM embeddings WHERE vec_id < 8
), scored AS (
    SELECT e.vec_id, e.embedding, s.cid,
           round(
             list_sum(list_transform(range(1, len(e.embedding) + 1),
                      i -> e.embedding[i]::DOUBLE * s.c_vec[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(e.embedding,
                       x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(s.c_vec,
                       x -> x::DOUBLE * x::DOUBLE)))),
             6) AS cos_sim
    FROM embeddings e, seeds s
    WHERE e.vec_id >= 8
), assigned AS (
    SELECT vec_id, embedding, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos_sim DESC, cid ASC) AS rnk
    FROM scored
)
, flat AS (
    SELECT cid, embedding,
           unnest(generate_series(1, len(embedding))) AS i
    FROM assigned WHERE rnk = 1
)
SELECT cid AS cluster_id,
       i - 1 AS dim,
       round(avg(embedding[i]::DOUBLE), 6) AS centroid_val
FROM flat
GROUP BY 1, 2
"""


def q94_embedding_dedup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q29's exact embedding near-dup pairs via the BLOCKED strategy —
    distributed block-pair join, zero driver materialization (the
    broadcast kernel builds its Spark broadcast driver-side, which caps at
    driver memory; this tier has no cap). Output is identical by
    construction — every (a < b) pair lands in exactly one block-pair
    group — so the oracle is q29's own SQL."""
    return embedding_cosine_pairs_blocked(
        load(spark, sf_dir, "embeddings"), threshold=0.4, num_blocks=8
    )


SQL_Q94 = SQL_Q29


def q95_decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q77's decontamination via the bloom-prefilter tier: a 1-row bitmap
    aggregate over benchmark grams broadcast to the corpus scan, so only
    bloom-surviving grams enter the shuffle join (which then kills false
    positives — exactness never depends on the filter). Same benchmark
    split as q77; oracle is q77's own SQL."""
    from noaa_oracle_spark.pipeline.text import decontamination_bloom

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return decontamination_bloom(train, bench, n=3)


SQL_Q95 = SQL_Q77


_SEMDEDUP_T = 0.35


def q96_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-cell semantic dedup (similarity.semantic_dedup) —
    assign every vector to its nearest of the 8 seed centroids, flag
    vectors matched at >=0.35 cosine by a lower-id member of the SAME
    cell, name the kept representative."""
    emb = load(spark, sf_dir, "embeddings")
    seeds = _kmeans_centroids(spark, sf_dir).select("vec_id", "embedding")
    return semantic_dedup(emb, seeds, threshold=_SEMDEDUP_T)


SQL_Q96 = f"""
WITH seeds AS (
    SELECT vec_id AS cid, embedding AS c_vec FROM embeddings
    WHERE vec_id < {_KMEANS_K}
), scored AS (
    SELECT e.vec_id, e.embedding, s.cid,
           {_COS_SQL.format(a='e.embedding', b='s.c_vec')} AS cos_sim
    FROM embeddings e, seeds s
), members AS (
    SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, cid ASC) AS rnk
        FROM scored
    ) WHERE rnk = 1
), pairs AS (
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
           {_COS_SQL.format(a='a.embedding', b='b.embedding')} AS cos_sim
    FROM members a JOIN members b
      ON a.cid = b.cid AND a.vec_id < b.vec_id
), dups AS (
    SELECT doc_b, min(doc_a) AS dup_of FROM pairs
    WHERE cos_sim >= {_SEMDEDUP_T} GROUP BY 1
)
SELECT m.vec_id, m.cid AS cluster_id,
       d.doc_b IS NOT NULL AS is_dup, d.dup_of
FROM members m LEFT JOIN dups d ON m.vec_id = d.doc_b
"""


_ESS_L = 30


def q97_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring removal (Lee et al. 2021 suffix-array
    dedup re-expressed as a gram join): merge all corpus-wide-duplicated
    30-char windows into maximal spans and cut them out of every
    document (pipeline/text.exact_substring_spans)."""
    from noaa_oracle_spark.pipeline.text import exact_substring_spans

    return exact_substring_spans(
        load(spark, sf_dir, "documents"), min_len=_ESS_L
    )


# Oracle takes the dumb-but-obviously-right road: per-character coverage.
# A char is duplicated iff some duplicated L-gram's window covers it;
# n_dup_spans counts coverage-run starts, clean_text re-assembles the
# uncovered chars in order. The Spark side merges intervals with array
# folds instead (no per-char explosion) — same result by construction.
SQL_Q97 = f"""
WITH d AS (
    SELECT doc_id, text, length(text) AS n FROM documents
), g AS (
    SELECT doc_id, i,
           ('0x' || substring(md5(substr(text, i, {_ESS_L})), 1, 15))::BIGINT AS h
    FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, n - {_ESS_L} + 1)) AS i
        FROM d WHERE n >= {_ESS_L}
    )
), freq AS (
    SELECT h FROM g GROUP BY h HAVING count(*) > 1
), dp AS (
    SELECT g.doc_id, g.i FROM g JOIN freq USING (h)
), cov AS (
    SELECT DISTINCT doc_id,
           i + unnest(generate_series(0, {_ESS_L} - 1)) AS c
    FROM dp
), runs AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS dup_chars,
           CAST(sum(CASE WHEN prev IS NULL OR c - prev > 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
    FROM (
        SELECT doc_id, c,
               lag(c) OVER (PARTITION BY doc_id ORDER BY c) AS prev
        FROM cov
    )
    GROUP BY 1
), chars AS (
    SELECT doc_id, unnest(generate_series(1, n)) AS c FROM d WHERE n >= 1
), clean AS (
    SELECT ch.doc_id,
           coalesce(
               string_agg(
                   CASE WHEN cov.c IS NULL THEN substr(d.text, ch.c, 1) END,
                   '' ORDER BY ch.c
               ), ''
           ) AS clean_text
    FROM chars ch
    JOIN d USING (doc_id)
    LEFT JOIN cov ON cov.doc_id = ch.doc_id AND cov.c = ch.c
    GROUP BY 1
)
SELECT d.doc_id,
       coalesce(r.n_dup_spans, 0) AS n_dup_spans,
       coalesce(r.dup_chars, 0) AS dup_chars,
       coalesce(cl.clean_text, d.text) AS clean_text
FROM d
LEFT JOIN runs r USING (doc_id)
LEFT JOIN clean cl USING (doc_id)
"""


def q98_source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing rates (alpha=0.7, budget 10k) —
    the data-mix computation feeding per-source quotas
    (pipeline/sampling.source_mix_weights)."""
    from noaa_oracle_spark.pipeline.sampling import source_mix_weights

    return source_mix_weights(
        load(spark, sf_dir, "documents"), alpha=0.7, budget=10_000
    )


SQL_Q98 = """
WITH counts AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents
    GROUP BY 1
), total AS (
    SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents
), raw AS (
    SELECT source, n_docs,
           pow(n_docs::DOUBLE / n_total, 0.7) AS _raw
    FROM counts CROSS JOIN total
), z AS (
    SELECT sum(_raw) AS _z FROM raw
)
SELECT source, n_docs,
       round(_raw / _z, 6) AS mix_weight,
       CAST(floor(round(_raw / _z, 6) * 10000) AS BIGINT) AS quota
FROM raw CROSS JOIN z
"""


def q99_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic concat-and-pack training layout: md5 hash order
    (the reproducible epoch shuffle), 512-token sequences, each doc
    assigned the sequence where it starts
    (pipeline/sampling.pack_training_sequences)."""
    from noaa_oracle_spark.pipeline.sampling import pack_training_sequences

    return pack_training_sequences(
        load(spark, sf_dir, "documents"), budget_tokens=512, salt="epoch0"
    )


SQL_Q99 = """
WITH t AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           md5('epoch0|' || doc_id) AS h
    FROM documents
), c AS (
    SELECT doc_id, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS prev
    FROM t
)
SELECT doc_id, n_tokens,
       CAST(floor(prev / 512) AS BIGINT) AS seq_id,
       prev % 512 AS start_offset
FROM c
"""


def q102_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-capacity (next-fit, no-straddle) packing
    (pipeline/sampling.pack_training_sequences_binned): a document must
    fit in the current 512-token sequence or open a new one; md5 epoch
    shuffle order; 16 hash-prefix buckets packing independently with
    globally contiguous sequence ids. The oracle replays the per-bucket
    next-fit recursion as a recursive CTE stepping the rank-within-bucket
    chain — a genuinely sequential semantics the driver still
    hash-grades end to end."""
    from noaa_oracle_spark.pipeline.sampling import (
        pack_training_sequences_binned,
    )

    return pack_training_sequences_binned(
        load(spark, sf_dir, "documents"),
        budget_tokens=512,
        salt="epoch0",
        bucket_hex_digits=1,
    )


SQL_Q102 = """
WITH RECURSIVE t AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           md5('epoch0|' || doc_id) AS h
    FROM documents
), ordered AS (
    -- bucket stays the hex CHARACTER: single hex digits sort in ASCII
    -- exactly as their numeric values, so the offset prefix below walks
    -- buckets in the same order Spark's integer _b does
    SELECT doc_id, n_tokens,
           substr(h, 1, 1) AS bucket,
           row_number() OVER (
               PARTITION BY substr(h, 1, 1) ORDER BY h, doc_id
           ) AS rn
    FROM t
), rec AS (
    SELECT bucket, rn, doc_id, n_tokens,
           CAST(0 AS BIGINT) AS bin,
           CAST(0 AS BIGINT) AS start_offset,
           n_tokens AS fill
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
           CASE WHEN r.fill + o.n_tokens <= 512
                THEN r.bin ELSE r.bin + 1 END,
           CASE WHEN r.fill + o.n_tokens <= 512
                THEN r.fill ELSE CAST(0 AS BIGINT) END,
           CASE WHEN r.fill + o.n_tokens <= 512
                THEN r.fill + o.n_tokens ELSE o.n_tokens END
    FROM rec r JOIN ordered o
      ON o.bucket = r.bucket AND o.rn = r.rn + 1
), counts AS (
    SELECT bucket, max(bin) + 1 AS n_bins FROM rec GROUP BY 1
), offs AS (
    SELECT bucket,
           CAST(coalesce(sum(n_bins) OVER (
               ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS off
    FROM counts
)
SELECT r.doc_id, r.n_tokens,
       o.off + r.bin AS seq_id,
       r.start_offset
FROM rec r JOIN offs o ON o.bucket = r.bucket
"""


def q103_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus build in ONE DataFrame pipeline:
    quality gate (map-side expressions, no shuffle) → exact dedup
    (lowest-id representative per text hash, one hash shuffle) →
    deterministic sequence packing (the two-pass prefix sum). The
    composition the SURVEY's pipeline tier exists for — graded as a
    single query so operator boundaries can't hide a semantic drift.
    Output: (doc_id, n_tokens, seq_id, start_offset) for every kept
    representative."""
    from noaa_oracle_spark.pipeline.sampling import pack_training_sequences
    from noaa_oracle_spark.pipeline.text import quality_filter

    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    kept = quality_filter(docs, min_score=60)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return pack_training_sequences(uniq, budget_tokens=512, salt="pipe")


SQL_Q103 = f"""
WITH scored AS (
    SELECT doc_id, text,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '),
               w -> w IN ({_ALL_STOP}))) AS n_stopwords,
           length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
    FROM documents
), kept AS (
    SELECT doc_id, text FROM scored
    WHERE 100
          - (CASE WHEN n_tokens < 20 THEN 40 ELSE 0 END)
          - (CASE WHEN floor(n_stopwords * 1000 / n_tokens) < 50
                  THEN 30 ELSE 0 END)
          - (CASE WHEN floor(n_digits * 1000 / greatest(n_nonspace, 1)) > 300
                  THEN 20 ELSE 0 END) >= 60
), uniq AS (
    SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (
                   PARTITION BY md5(text) ORDER BY doc_id
               ) AS rn
        FROM kept) WHERE rn = 1
), t AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           md5('pipe|' || doc_id) AS h
    FROM uniq
), c AS (
    SELECT doc_id, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS prev
    FROM t
)
SELECT doc_id, n_tokens,
       CAST(floor(prev / 512) AS BIGINT) AS seq_id,
       prev % 512 AS start_offset
FROM c
"""


def q100_pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat PQ / ADC top-k (pipeline/pq.py): train seed codebooks (m=8
    subspaces × 8 codes, the 8 lowest-id vectors — iters=0 so the whole
    train→encode→ADC pipeline is SQL-expressible), compress the corpus to
    8-byte codes, and answer 5 queries' top-3 by asymmetric distance
    (LUT-gather, 6-dp rounded, lowest-id tiebreak). The oracle recomputes
    codebook slicing, code assignment, the per-subspace LUT, and the ADC
    sum entirely in SQL — every stage of the quantizer is hash-graded,
    not just the final ranking."""
    from noaa_oracle_spark.pipeline.pq import pq_encode, pq_knn, pq_train

    emb = load(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, k=8, iters=0)
    enc = pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 5)
    return pq_knn(q, enc, books, k=3)


# shared SQL fragments: seed codebooks (8 lowest-id vectors sliced into
# 8×8-dim subspaces), corpus subvectors, 6-dp code assignment, query LUT
_PQ_CTE = """
seeds AS (
    SELECT vec_id, embedding,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
    FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
), subsq AS (
    SELECT CAST(unnest(range(0, 8)) AS INT) AS sub
), books AS (
    SELECT subsq.sub, seeds.code,
           list_transform(range(1, 9),
               i -> seeds.embedding[subsq.sub * 8 + i]::DOUBLE) AS centroid
    FROM seeds, subsq
), subv AS (
    SELECT e.vec_id, subsq.sub,
           list_transform(range(1, 9),
               i -> e.embedding[subsq.sub * 8 + i]::DOUBLE) AS svec
    FROM embeddings e, subsq
), enc_d AS (
    SELECT v.vec_id, v.sub, b.code,
           round(list_sum(list_transform(range(1, 9),
               i -> (v.svec[i] - b.centroid[i])
                  * (v.svec[i] - b.centroid[i]))), 6) AS d
    FROM subv v JOIN books b ON v.sub = b.sub
), codes AS (
    SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d ASC, code ASC) AS rnk
        FROM enc_d) WHERE rnk = 1
), lut AS (
    SELECT q.vec_id AS q_id, b.sub, b.code,
           list_sum(list_transform(range(1, 9),
               i -> (q.embedding[b.sub * 8 + i]::DOUBLE - b.centroid[i])
                  * (q.embedding[b.sub * 8 + i]::DOUBLE - b.centroid[i])
           )) AS pd
    FROM embeddings q, books b WHERE q.vec_id < 5
)"""

SQL_Q100 = f"""
WITH {_PQ_CTE}
, adc AS (
    SELECT l.q_id, c.vec_id AS n_id, round(sum(l.pd), 6) AS adc_dist
    FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
    WHERE l.q_id <> c.vec_id
    GROUP BY 1, 2
)
SELECT q_id, rank, n_id, adc_dist FROM (
    SELECT q_id, n_id, adc_dist,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adc_dist ASC, n_id ASC) AS rank
    FROM adc) WHERE rank <= 3
"""


def q101_ivfpq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (pipeline/pq.ivfpq_knn): the FAISS composition — coarse
    cells bound WHICH codes are scored (each query probes its 2 nearest
    of 8 cells by cosine), PQ codes bound their MEMORY. Same seed
    codebooks as q100; the oracle adds the cell routing (cosine 6-dp,
    lowest-cid tie — q87's rule) and restricts the ADC sum to probed
    cells' members."""
    from noaa_oracle_spark.pipeline.pq import ivfpq_knn, pq_train

    emb = load(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, k=8, iters=0)
    cells = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < 5)
    return ivfpq_knn(q, emb, books, cells, k=3, nprobe=2)


SQL_Q101 = f"""
WITH {_PQ_CTE}
, cell_d AS (
    SELECT e.vec_id, s.vec_id AS cid,
           {_COS_SQL.format(a='e.embedding', b='s.embedding')} AS cos_sim
    FROM embeddings e, seeds s
), cells AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, cid ASC) AS rnk
        FROM cell_d) WHERE rnk = 1
), probes AS (
    SELECT q_id, cid FROM (
        SELECT vec_id AS q_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, cid ASC) AS rnk
        FROM cell_d WHERE vec_id < 5) WHERE rnk <= 2
), adc AS (
    SELECT l.q_id, c.vec_id AS n_id, round(sum(l.pd), 6) AS adc_dist
    FROM codes c
    JOIN cells ce ON ce.vec_id = c.vec_id
    JOIN probes p ON p.cid = ce.cid
    JOIN lut l ON l.sub = c.sub AND l.code = c.code AND l.q_id = p.q_id
    WHERE l.q_id <> c.vec_id
    GROUP BY 1, 2
)
SELECT q_id, rank, n_id, adc_dist FROM (
    SELECT q_id, n_id, adc_dist,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adc_dist ASC, n_id ASC) AS rank
    FROM adc) WHERE rank <= 3
"""


def q104_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVF-PQ (pipeline/pq.ivfpq_knn_residual): coarse
    cells are the 8 HIGHEST-id vectors (so the 8 lowest-id codebook
    seeds have non-zero residuals), each corpus vector's residual
    against its cosine-nearest cell is what the m=8×8 seed codebooks
    quantize, and queries probe 2 cells with per-(query, cell) residual
    LUTs. The oracle recomputes cell routing, residual slicing, code
    assignment, and the residual ADC sum in SQL — the accuracy-coupled
    FAISS composition, hash-graded end to end."""
    from noaa_oracle_spark.pipeline.pq import ivfpq_knn_residual

    emb = load(spark, sf_dir, "embeddings")
    cells = (
        emb.orderBy(F.desc("vec_id")).limit(8).select("vec_id", "embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)
    return ivfpq_knn_residual(
        q, emb, cells, m=8, k_codes=8, iters=0, k=3, nprobe=2
    )


SQL_Q104 = f"""
WITH cells AS (
    SELECT vec_id AS cid, embedding AS c_vec
    FROM embeddings ORDER BY vec_id DESC LIMIT 8
), routed AS (
    SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_COS_SQL.format(a='e.embedding', b='c.c_vec')}
                            DESC, c.cid ASC
               ) AS rnk
        FROM embeddings e, cells c) WHERE rnk = 1
), resid AS (
    SELECT r.vec_id, r.cid,
           list_transform(range(1, len(r.embedding) + 1),
               i -> r.embedding[i]::DOUBLE - c.c_vec[i]::DOUBLE) AS rv
    FROM routed r JOIN cells c ON c.cid = r.cid
), seeds AS (
    SELECT vec_id, rv,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
    FROM (SELECT * FROM resid ORDER BY vec_id LIMIT 8)
), subsq AS (
    SELECT CAST(unnest(range(0, 8)) AS INT) AS sub
), books AS (
    SELECT subsq.sub, seeds.code,
           list_transform(range(1, 9),
               i -> seeds.rv[subsq.sub * 8 + i]) AS centroid
    FROM seeds, subsq
), subv AS (
    SELECT r.vec_id, subsq.sub,
           list_transform(range(1, 9),
               i -> r.rv[subsq.sub * 8 + i]) AS svec
    FROM resid r, subsq
), enc_d AS (
    SELECT v.vec_id, v.sub, b.code,
           round(list_sum(list_transform(range(1, 9),
               i -> (v.svec[i] - b.centroid[i])
                  * (v.svec[i] - b.centroid[i]))), 6) AS d
    FROM subv v JOIN books b ON v.sub = b.sub
), codes AS (
    SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d ASC, code ASC) AS rnk
        FROM enc_d) WHERE rnk = 1
), probes AS (
    SELECT q_id, cid FROM (
        SELECT q.vec_id AS q_id, c.cid,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_COS_SQL.format(a='q.embedding', b='c.c_vec')}
                            DESC, c.cid ASC
               ) AS rnk
        FROM embeddings q, cells c WHERE q.vec_id < 5) WHERE rnk <= 2
), qresid AS (
    SELECT q.vec_id AS q_id, c.cid,
           list_transform(range(1, len(q.embedding) + 1),
               i -> q.embedding[i]::DOUBLE - c.c_vec[i]::DOUBLE) AS qr
    FROM embeddings q JOIN probes p ON p.q_id = q.vec_id
    JOIN cells c ON c.cid = p.cid
), lut AS (
    SELECT qr.q_id, qr.cid, b.sub, b.code,
           list_sum(list_transform(range(1, 9),
               i -> (qr.qr[b.sub * 8 + i] - b.centroid[i])
                  * (qr.qr[b.sub * 8 + i] - b.centroid[i]))) AS pd
    FROM qresid qr, books b
), adc AS (
    SELECT l.q_id, c.vec_id AS n_id, round(sum(l.pd), 6) AS adc_dist
    FROM codes c
    JOIN resid r ON r.vec_id = c.vec_id
    JOIN lut l ON l.cid = r.cid AND l.sub = c.sub AND l.code = c.code
    WHERE l.q_id <> c.vec_id
    GROUP BY 1, 2
)
SELECT q_id, rank, n_id, adc_dist FROM (
    SELECT q_id, n_id, adc_dist,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adc_dist ASC, n_id ASC) AS rank
    FROM adc) WHERE rank <= 3
"""


def q105_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (pipeline/text.redact_pii): the synthetic corpus
    carries no organic PII, so the gate PLANTS deterministic emails /
    IPv4s / card numbers derived from doc_id (every third doc an email,
    every fifth an IP, every seventh a card — some docs get several,
    most get none) and hash-grades the cascade's counts and the fully
    redacted text. Rollup keeps the gate row small: per-source totals
    plus a clean-text checksum, so one wrong replacement anywhere flips
    the hash."""
    from noaa_oracle_spark.pipeline.text import redact_pii

    docs = load(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".77"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" card 4"),
                    F.lpad(
                        ((F.col("doc_id") * 13) % 1000000).cast("string"),
                        15,
                        "0",
                    ),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = redact_pii(planted)
    return (
        red.join(planted.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_email").alias("emails"),
            F.sum("n_ip").alias("ips"),
            F.sum("n_card").alias("cards"),
            F.sum(
                F.conv(
                    F.substring(F.md5("clean_text"), 1, 10), 16, 10
                ).cast("long")
            ).alias("clean_checksum"),
        )
    )


SQL_Q105 = """
WITH planted AS (
    SELECT doc_id, source,
           text
           || CASE WHEN doc_id % 3 = 0
                   THEN ' contact user' || doc_id || '@example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                   THEN ' from 10.0.' || (doc_id % 256) || '.77'
                   ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                   THEN ' card 4' || lpad(CAST((doc_id * 13) % 1000000
                                              AS VARCHAR), 15, '0')
                   ELSE '' END AS text
    FROM documents
), s1 AS (
    SELECT doc_id, source,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
               AS n_email,
           regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t
    FROM planted
), s2 AS (
    SELECT doc_id, source, n_email,
           len(regexp_extract_all(t,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
               AS n_ip,
           regexp_replace(t,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
               '<IP>', 'g') AS t
    FROM s1
), s3 AS (
    SELECT doc_id, source, n_email, n_ip,
           len(regexp_extract_all(t, '\\b\\d{16}\\b')) AS n_card,
           regexp_replace(t, '\\b\\d{16}\\b', '<CARD>', 'g') AS t
    FROM s2
)
SELECT source,
       CAST(sum(n_email) AS BIGINT) AS emails,
       CAST(sum(n_ip) AS BIGINT) AS ips,
       CAST(sum(n_card) AS BIGINT) AS cards,
       CAST(sum(('0x' || substring(md5(t), 1, 10))::BIGINT) AS BIGINT) AS clean_checksum
FROM s3
GROUP BY 1
"""


def q106_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM scoring (pipeline/text.bigram_logprob):
    p(w2|w1) = 0.7·C(w1w2)/C(w1) + 0.3·C(w2)/N over the corpus's own
    counts — the CCNet perplexity-filter family's SQL-expressible rung."""
    from noaa_oracle_spark.pipeline.text import bigram_logprob

    return bigram_logprob(load(spark, sf_dir, "documents"))


SQL_Q106 = """
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS a
    FROM documents
), grams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(a)),
                  i -> struct_pack(w1 := a[i], w2 := a[i + 1]))) AS g
    FROM toks WHERE len(a) >= 2
), gflat AS (
    SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM grams
), words AS (
    SELECT unnest(a) AS term FROM toks
), uni AS (
    SELECT term, count(*) AS tc FROM words GROUP BY 1
), total AS (
    SELECT count(*) AS n_total FROM words
), big AS (
    SELECT w1, w2, count(*) AS bc FROM gflat GROUP BY 1, 2
)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(avg(ln(0.7 * (bc / u1.tc) + 0.3 * (u2.tc / n_total))), 6)
           AS logprob
FROM gflat
JOIN big USING (w1, w2)
JOIN uni u1 ON u1.term = gflat.w1
JOIN uni u2 ON u2.term = gflat.w2
CROSS JOIN total
GROUP BY doc_id
"""


def q107_sq8_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization (similarity.sq8_train/encode/knn): the
    FAISS-SQ8 compression tier — per-dimension [min,max] scale factors,
    4× smaller int codes, top-3 cosine over the DEQUANTIZED corpus for
    5 queries. Train, encode, dequantize, and ranking are all pure
    column expressions, so the oracle replays every stage in SQL (the
    testdata embeddings are 64-dim at every scale factor)."""
    from noaa_oracle_spark.pipeline.similarity import (
        sq8_encode,
        sq8_knn,
        sq8_train,
    )

    emb = load(spark, sf_dir, "embeddings")
    factors = sq8_train(emb)
    enc = sq8_encode(emb, factors)
    q = emb.filter(F.col("vec_id") < 5)
    return sq8_knn(q, enc, factors, k=3)


SQL_Q107 = """
WITH dims AS (
    SELECT CAST(unnest(range(1, 65)) AS INT) AS i
), f AS (
    SELECT dims.i,
           min(e.embedding[dims.i]::DOUBLE) AS lo,
           max(e.embedding[dims.i]::DOUBLE) AS hi
    FROM embeddings e, dims
    GROUP BY 1
), fv AS (
    SELECT list(lo ORDER BY i) AS lo,
           list(CASE WHEN hi > lo THEN hi - lo ELSE 1.0 END ORDER BY i)
               AS sp
    FROM f
), enc AS (
    SELECT e.vec_id,
           list_transform(range(1, 65),
               i -> greatest(0, least(255,
                    CAST(round((e.embedding[i]::DOUBLE - fv.lo[i])
                               / fv.sp[i] * 255) AS INT)))) AS codes
    FROM embeddings e CROSS JOIN fv
), deq AS (
    SELECT enc.vec_id,
           list_transform(range(1, 65),
               i -> enc.codes[i] / 255.0 * fv.sp[i] + fv.lo[i]) AS nv
    FROM enc CROSS JOIN fv
), scored AS (
    SELECT q.vec_id AS q_id, d.vec_id AS n_id,
           round(
             list_sum(list_transform(range(1, 65),
                      i -> q.embedding[i]::DOUBLE * d.nv[i]))
             / (sqrt(list_sum(list_transform(q.embedding,
                       x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(d.nv, x -> x * x)))),
             6) AS cos_sim
    FROM embeddings q, deq d
    WHERE q.vec_id < 5 AND q.vec_id <> d.vec_id
)
SELECT q_id, rank, n_id, cos_sim FROM (
    SELECT q_id, n_id, cos_sim,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, n_id ASC) AS rank
    FROM scored) WHERE rank <= 3
"""


def q108_webdataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard manifest as a gate query (r4 ask #5 / r5 verdict
    ask #3): documents become text-media samples, are sharded to tar by
    the deterministic hash-rank writer, and the member-level manifest is
    read back distributed (one task per shard, headers only).  Shard
    assignment, member order, names, and sizes are all pure functions of
    the source table — which is what makes the tar layout SQL-oracle-able
    even though tar BYTES are not."""
    import os
    import tempfile

    from noaa_oracle_spark.pipeline.webdataset import (
        read_webdataset_member_manifest,
        write_webdataset_shards,
    )

    media = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit(None).cast("string").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    # fixed per-sf destination, rebuilt in place: the grading/bench
    # protocols call each gate several times (warm-up + timed + mirror),
    # and a fresh mkdtemp per call would leak corpus-sized shard dirs
    import hashlib
    import shutil

    dest = os.path.join(
        tempfile.gettempdir(),
        "noaa_wds_gate_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(dest, ignore_errors=True)
    write_webdataset_shards(media, dest, samples_per_shard=64, salt="wds")
    return read_webdataset_member_manifest(spark, dest)


# The writer's layout contract, restated in SQL: global rank = hash order
# md5('wds|' || doc_id) with doc_id tiebreak; shard = rank // 64; each
# sample appends {rank:09d}.bin (the blob; kind 'text' with no MIME maps
# to .bin) then {rank:09d}.json (the sorted-keys metadata sidecar, whose
# byte length is a fixed template plus the media_id's digits).
SQL_Q108 = """
WITH ranked AS (
    SELECT doc_id,
           octet_length(encode(text)) AS blob_len,
           row_number() OVER (
               ORDER BY md5('wds|' || CAST(doc_id AS VARCHAR)), doc_id
           ) - 1 AS rnk
    FROM documents
), members AS (
    SELECT CAST(rnk // 64 AS BIGINT) AS shard_id,
           (rnk % 64) * 2 AS sample_pos,
           lpad(CAST(rnk AS VARCHAR), 9, '0') AS key,
           blob_len, doc_id
    FROM ranked
)
SELECT shard_id, CAST(sample_pos AS BIGINT) AS member_idx,
       key || '.bin' AS member_name, CAST(blob_len AS BIGINT) AS size_bytes
FROM members
UNION ALL
SELECT shard_id, CAST(sample_pos + 1 AS BIGINT), key || '.json',
       CAST(length('{"duration_ms": null, "height": null, "kind": "text"'
                   || ', "media_id": ') + length(CAST(doc_id AS VARCHAR))
            + length(', "mime_type": null, "width": null}') AS BIGINT)
FROM members
"""


def q109_opq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ rotation rung (r5 verdict ask #6): rotate the corpus with a
    data-derived orthogonal transform BEFORE PQ slicing, then run the
    exact q100 pipeline (seed codebooks iters=0, encode, ADC top-3) on
    the rotated vectors.  The gate's rotation is the SQL-expressible
    Householder special case H = I − 2vvᵀ/‖v‖² with v = the 6-dp-rounded
    per-dimension mean (data-derived, broadcast-sized, deterministic —
    the q100 seeding discipline); the full eigenvalue-balanced OPQ
    training (covariance → permuted eigenbasis, Ge et al. CVPR 2013)
    lives in pipeline/pq.opq_train_rotation with reconstruction-error
    tests, since SVD is not SQL-expressible."""
    from noaa_oracle_spark.pipeline.pq import (
        householder_rotate,
        pq_encode,
        pq_knn,
        pq_train,
    )

    emb = load(spark, sf_dir, "embeddings")
    mean_row = emb.select(
        *[
            F.round(F.avg(F.col("embedding")[i].cast("double")), 6).alias(
                f"m{i}"
            )
            for i in range(64)
        ]
    ).collect()[0]
    v = [float(mean_row[i]) for i in range(64)]
    rot = householder_rotate(emb, v)
    books = pq_train(rot, m=8, k=8, iters=0)
    enc = pq_encode(rot, books)
    # filter BEFORE the rotation kernel (r12 optimization round): the
    # mapInPandas barrier blocks predicate pushdown, so filtering `rot`
    # re-rotated the whole corpus to produce 5 query rows; rotation is
    # per-row, so rotate(filter(emb)) == filter(rotate(emb)) bit-for-bit
    q = householder_rotate(emb.filter(F.col("vec_id") < 5), v)
    return pq_knn(q, enc, books, k=3)


# the q100 quantizer CTEs, re-sourced from the rotated vectors
_PQ_CTE_ROT = _PQ_CTE.replace("embeddings", "rot")

SQL_Q109 = f"""
WITH dims AS (
    SELECT CAST(unnest(range(1, 65)) AS INT) AS i
), mstats AS (
    SELECT dims.i, round(avg(e.embedding[dims.i]::DOUBLE), 6) AS m
    FROM embeddings e, dims GROUP BY 1
), mv AS (
    SELECT list(m ORDER BY i) AS v FROM mstats
), rot AS (
    SELECT e.vec_id,
           list_transform(range(1, 65), i ->
               e.embedding[i]::DOUBLE
               - (2.0 * list_sum(list_transform(range(1, 65),
                       j -> mv.v[j] * e.embedding[j]::DOUBLE))
                  / list_sum(list_transform(mv.v, x -> x * x)))
                 * mv.v[i]) AS embedding
    FROM embeddings e CROSS JOIN mv
), {_PQ_CTE_ROT}
, adc AS (
    SELECT l.q_id, c.vec_id AS n_id, round(sum(l.pd), 6) AS adc_dist
    FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
    WHERE l.q_id <> c.vec_id
    GROUP BY 1, 2
)
SELECT q_id, rank, n_id, adc_dist FROM (
    SELECT q_id, n_id, adc_dist,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adc_dist ASC, n_id ASC) AS rank
    FROM adc) WHERE rank <= 3
"""


def q110_mp4_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/ISO-BMFF mux→demux round trip as a gate query: each document
    becomes a single-track MP4 (video samples = 120-byte chunks of the
    text, 40 ms ticks, stsc chunk runs of 3), muxed map-side by
    pipeline/mp4.build_mp4 and demuxed back by demux_mp4_samples — both
    distributed, blobs never shuffle.  The container layout (sample
    count, sizes, DTS ladder, payload bytes) is a pure function of the
    text length, which is what makes a BINARY container format
    SQL-oracle-able: the oracle restates the chunking arithmetic and
    md5s the same byte slices (the corpus is ASCII — octet_length ==
    length at every SF, so VARCHAR substring is byte-exact; the
    operators themselves are byte-based)."""
    import pandas as pd

    from noaa_oracle_spark.pipeline.mp4 import build_mp4, demux_mp4_samples

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def mux(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                chunks = [
                    data[i : i + 120] for i in range(0, len(data), 120)
                ] or [b""]
                tr = {
                    "handler": "vide",
                    "codec": "avc1",
                    "timescale": 1000,
                    "width": 64,
                    "height": 64,
                    "samples": [(c, 40) for c in chunks],
                }
                rows.append(
                    {
                        "media_id": doc_id,
                        "content": build_mp4([tr], samples_per_chunk=3),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = docs.mapInPandas(mux, "media_id long, content binary")
    out = demux_mp4_samples(media, handler="vide")
    return out.select(
        "media_id",
        "sample_idx",
        "dts_ms",
        "duration_ms",
        "size_bytes",
        F.md5("payload").alias("payload_md5"),
    )


SQL_Q110 = """
WITH chunks AS (
    SELECT doc_id, text, length(text) AS n,
           unnest(range(0, greatest((length(text) + 119) // 120, 1))) AS i
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(i AS BIGINT) AS sample_idx,
       CAST(i * 40 AS BIGINT) AS dts_ms,
       CAST(40 AS BIGINT) AS duration_ms,
       CAST(least(120, n - i * 120) AS BIGINT) AS size_bytes,
       md5(substring(text, CAST(i * 120 + 1 AS BIGINT),
                     CAST(least(120, n - i * 120) AS BIGINT))) AS payload_md5
FROM chunks
"""


def q111_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training pair counting (Sennrich et al. ACL 2016),
    the character-stage round: adjacent character pairs per word TYPE
    weighted by word frequency (pipeline/text.bpe_pair_counts).  The
    scale shape is the q106 de-skew discipline — one corpus-scale
    word-keyed exchange, then all pair math at vocabulary scale.  The
    oracle restates the whitespace split, the type rollup, and the
    substring pair walk in SQL."""
    from noaa_oracle_spark.pipeline.text import bpe_pair_counts

    return bpe_pair_counts(load(spark, sf_dir, "documents"))


SQL_Q111 = """
WITH words AS (
    SELECT w, count(*) AS n_w FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS w
        FROM documents)
    WHERE length(w) > 0 GROUP BY 1
), pairs AS (
    SELECT substring(w, i, 1) AS left_sym,
           substring(w, i + 1, 1) AS right_sym, n_w
    FROM (SELECT w, n_w, unnest(range(1, greatest(length(w), 1))) AS i
          FROM words)
)
SELECT left_sym, right_sym, CAST(sum(n_w) AS BIGINT) AS pair_count
FROM pairs GROUP BY 1, 2
"""


def q112_mp3_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MPEG-audio frame walk as a gate (the q110 discipline for audio):
    each document becomes a constant-bitrate MPEG1 Layer III stream
    (bitrate from a 4-value ladder by doc_id, frame count from the text
    length), built map-side by pipeline/mp3.build_mp3 and walked back by
    mp3_frame_manifest.  Frame sizes/offsets are pure integer header
    math — 144·bitrate/44100 per frame — which the oracle restates
    directly.  Codec payload decode stays gated; this grades the
    container layer end to end."""
    import pandas as pd

    from noaa_oracle_spark.pipeline.mp3 import build_mp3, mp3_frame_manifest

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    ladder = [64, 96, 128, 192]

    def mux(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                rows.append(
                    {
                        "media_id": doc_id,
                        "content": build_mp3(
                            n_frames=1 + len(text or "") % 29,
                            bitrate_kbps=ladder[int(doc_id) % 4],
                            sample_rate=44100,
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = docs.mapInPandas(mux, "media_id long, content binary")
    return mp3_frame_manifest(media).select(
        "media_id", "frame_idx", "offset", "size_bytes", "bitrate"
    )


SQL_Q112 = """
WITH streams AS (
    SELECT doc_id,
           1 + length(text) % 29 AS n_frames,
           CASE doc_id % 4 WHEN 0 THEN 64000 WHEN 1 THEN 96000
                           WHEN 2 THEN 128000 ELSE 192000 END AS bitrate
    FROM documents
), frames AS (
    SELECT doc_id, bitrate,
           (144 * bitrate) // 44100 AS fsize,
           unnest(range(0, n_frames)) AS i
    FROM streams
)
SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx,
       CAST(i * fsize AS BIGINT) AS offset,
       CAST(fsize AS BIGINT) AS size_bytes,
       CAST(bitrate AS INT) AS bitrate
FROM frames
"""


def q113_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health metric: the Zipf rank–frequency slope. A natural
    corpus follows freq ∝ rank^s with s ≈ −1; heavy duplication or
    template spam bends the head, truncation bends the tail — one
    number a 100 TB ingest can monitor per shard. Shape: ONE word-type
    exchange (word_frequencies), rank by (count desc, word asc), then
    the OLS slope of log(freq) on log(rank) as covar_pop/var_pop — all
    aggregate expressions, no corpus-scale collect. The global rank uses
    the two-pass range-partition discipline (NOT an empty-partition
    window, which the plan audit forbids — a web-scale vocabulary would
    serialize through one task); see pipeline/text.zipf_slope for the
    full shape. Slope and moments are rounded at 4 dp (the cross-engine
    float rule: distributed vs sequential partial-sum orders differ in
    final ulps)."""
    from noaa_oracle_spark.pipeline.text import zipf_slope

    return zipf_slope(load(spark, sf_dir, "documents"))


SQL_Q113 = """
WITH wf AS (
    SELECT w, count(*) AS n_w FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS w
        FROM documents)
    WHERE length(w) > 0 GROUP BY 1
), ranked AS (
    SELECT ln(CAST(row_number() OVER (ORDER BY n_w DESC, w ASC) AS DOUBLE))
               AS lx,
           ln(CAST(n_w AS DOUBLE)) AS ly
    FROM wf
)
SELECT round(covar_pop(lx, ly) / var_pop(lx), 4) AS zipf_slope,
       count(*) AS n_types,
       round(avg(ly), 4) AS mean_log_freq
FROM ranked
"""


def q114_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K vocabulary coverage / OOV rate (pipeline/text.vocab_coverage)
    — the tokenizer-budget diagnostic beside q113's Zipf slope, sharing
    its scale-safe two-pass global rank.  top_k=10 so the gate corpus's
    small synthetic vocabulary still yields a non-trivial OOV band;
    integer outputs only (per-mille floor, no float ratio)."""
    from noaa_oracle_spark.pipeline.text import vocab_coverage

    return vocab_coverage(load(spark, sf_dir, "documents"), top_k=10)


SQL_Q114 = """
WITH wf AS (
    SELECT w, count(*) AS n_w FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS w
        FROM documents)
    WHERE length(w) > 0 GROUP BY 1
), ranked AS (
    SELECT n_w, row_number() OVER (ORDER BY n_w DESC, w ASC) AS rank
    FROM wf
), agg AS (
    SELECT CAST(sum(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS vocab_size,
           CAST(sum(CASE WHEN rank <= 10 THEN n_w ELSE 0 END) AS BIGINT)
               AS covered_tokens,
           CAST(sum(n_w) AS BIGINT) AS total_tokens
    FROM ranked
)
SELECT vocab_size, covered_tokens, total_tokens,
       CAST(floor((total_tokens - covered_tokens) * 1000 / total_tokens)
            AS BIGINT) AS oov_permille
FROM agg
"""


def q115_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the dedup-audit readout a
    corpus curator actually looks at (how much is singleton vs viral):
    q38's connected components rolled up twice, (component → size) then
    (size → n_clusters), with the largest cluster's anchor id as a spot
    -check column.  Pure aggregations past the component step; the
    oracle wraps the q38 recursive-CTE closure."""
    from noaa_oracle_spark.pipeline.dedup import connected_components

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, threshold_num=3, threshold_den=10
    ).select("doc_a", "doc_b")
    comp = connected_components(docs, pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.min("component").alias("min_component"),
    )


SQL_Q115 = f"""
WITH q38 AS (
    {SQL_Q38}
), sizes AS (
    SELECT component, count(*) AS cluster_size FROM q38 GROUP BY 1
)
SELECT cluster_size, count(*) AS n_clusters,
       min(component) AS min_component
FROM sizes GROUP BY 1
"""


def q116_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact re-rank (pipeline/pq.ivfpq_rerank) — the deployed
    two-stage ANN shape (FAISS IndexRefineFlat / ScaNN reordering): the
    q101 index (same seed codebooks, 8 cells, nprobe=2) nominates the
    ADC top-10 per query, then ONLY those candidates' raw vectors are
    fetched and the final top-3 ranks by exact cosine (6 dp, id-asc
    tiebreak).  The oracle recomputes the whole cascade in SQL: q101's
    cell routing + ADC, the rank<=10 candidate cut, and the exact-cosine
    re-rank — so the gate grades the refinement contract, not just the
    index."""
    from noaa_oracle_spark.pipeline.pq import ivfpq_rerank, pq_train

    emb = load(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, k=8, iters=0)
    cells = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < 5)
    return ivfpq_rerank(q, emb, books, cells, k=3, rerank=10, nprobe=2)


SQL_Q116 = f"""
WITH {_PQ_CTE}
, cell_d AS (
    SELECT e.vec_id, s.vec_id AS cid,
           {_COS_SQL.format(a='e.embedding', b='s.embedding')} AS cos_sim
    FROM embeddings e, seeds s
), cells AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, cid ASC) AS rnk
        FROM cell_d) WHERE rnk = 1
), probes AS (
    SELECT q_id, cid FROM (
        SELECT vec_id AS q_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, cid ASC) AS rnk
        FROM cell_d WHERE vec_id < 5) WHERE rnk <= 2
), adc AS (
    SELECT l.q_id, c.vec_id AS n_id, round(sum(l.pd), 6) AS adc_dist
    FROM codes c
    JOIN cells ce ON ce.vec_id = c.vec_id
    JOIN probes p ON p.cid = ce.cid
    JOIN lut l ON l.sub = c.sub AND l.code = c.code AND l.q_id = p.q_id
    WHERE l.q_id <> c.vec_id
    GROUP BY 1, 2
), cand AS (
    SELECT q_id, n_id FROM (
        SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adc_dist ASC, n_id ASC) AS rnk
        FROM adc) WHERE rnk <= 10
), exact AS (
    SELECT c.q_id, c.n_id,
           {_COS_SQL.format(a='q.embedding', b='e.embedding')} AS cos_sim
    FROM cand c
    JOIN embeddings e ON e.vec_id = c.n_id
    JOIN embeddings q ON q.vec_id = c.q_id
)
SELECT q_id, rank, n_id, cos_sim FROM (
    SELECT q_id, n_id, cos_sim,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, n_id ASC) AS rank
    FROM exact) WHERE rank <= 3
"""


def q117_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic quality classifier (pipeline/text.quality_classifier):
    the learned-filter tier above q21's rule score — integer milli-logit
    over the shared quality features, sigmoid probability at 6 dp, and
    an EXACT integer decision boundary (keep = z_milli >= 0), so no
    float threshold can flip a label between engines.  Weights are
    injectable (trained offline, like the fastText filters real
    pipelines use); the gate runs the defaults."""
    from noaa_oracle_spark.pipeline.text import quality_classifier

    return quality_classifier(load(spark, sf_dir, "documents"))


SQL_Q117 = f"""
WITH base AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '),
               w -> w IN ({_ALL_STOP}))) AS n_stopwords,
           length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
    FROM documents
), feats AS (
    SELECT doc_id,
           CAST(-2000
                + 8 * floor(n_stopwords * 1000 / n_tokens)
                - 6 * floor(n_digits * 1000 / greatest(n_nonspace, 1))
                + 20 * least(n_tokens, 100) AS BIGINT) AS z_milli
    FROM base
)
SELECT doc_id, z_milli,
       round(1.0 / (1.0 + exp(-CAST(z_milli AS DOUBLE) / 1000.0)), 6)
           AS quality_prob,
       CAST(CASE WHEN z_milli >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM feats
"""


def q118_source_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact length percentiles (pipeline/profile
    .source_percentiles): p25/p50/p90/p99 of n_chars by linear
    interpolation (the quantile_cont definition both engines share,
    6 dp), plus doc/char totals — the distribution readout a curator
    checks before chunking or min-length filtering a source."""
    from noaa_oracle_spark.pipeline.profile import source_percentiles

    return source_percentiles(load(spark, sf_dir, "documents"))


SQL_Q118 = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(quantile_cont(n_chars, 0.25), 6) AS p25,
       round(quantile_cont(n_chars, 0.50), 6) AS p50,
       round(quantile_cont(n_chars, 0.90), 6) AS p90,
       round(quantile_cont(n_chars, 0.99), 6) AS p99
FROM documents GROUP BY source
"""


def q119_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching + padding-waste audit (pipeline/profile
    .length_batches): global (n_chars asc, doc_id asc) rank via the
    scale-safe two-pass range-partition kernel (profile.global_rank —
    NOT an empty-partition window), fixed 32-doc batches, and per-batch
    pad_waste = max*count - sum, the metric dynamic batching exists to
    minimize.  The oracle is the single-node row_number the kernel
    replaces."""
    from noaa_oracle_spark.pipeline.profile import length_batches

    return length_batches(load(spark, sf_dir, "documents"), batch_size=32)


SQL_Q119 = """
WITH ranked AS (
    SELECT doc_id, n_chars,
           row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS rank
    FROM documents
), b AS (
    SELECT CAST(floor((rank - 1) / 32) AS BIGINT) AS batch_id, n_chars
    FROM ranked
)
SELECT batch_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(max(n_chars) * count(*) - sum(n_chars) AS BIGINT) AS pad_waste
FROM b GROUP BY 1
"""


def q120_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (pipeline.text.perplexity_buckets,
    Wenzek et al. 2020): corpus-LM score per doc (q91's unigram rung),
    global (logprob DESC, doc_id ASC) rank via the scale-safe two-pass
    kernel, equal-population head/middle/tail cut.  The oracle restates
    the whole contract — scoring, ranking, and the population-quantile
    bucket arithmetic — in single-node SQL."""
    from noaa_oracle_spark.pipeline.text import perplexity_buckets

    return perplexity_buckets(load(spark, sf_dir, "documents"))


SQL_Q120 = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), w AS (
    SELECT doc_id, term FROM words WHERE term <> ''
), counts AS (
    SELECT term, count(*) AS tc FROM w GROUP BY 1
), total AS (
    SELECT count(*) AS n_total FROM w
), scores AS (
    SELECT doc_id,
           count(*) AS n_tokens,
           round(avg(ln(tc / n_total)), 6) AS logprob
    FROM w JOIN counts USING (term) CROSS JOIN total
    GROUP BY doc_id
), ranked AS (
    SELECT *,
           row_number() OVER (ORDER BY logprob DESC, doc_id ASC) AS rnk,
           count(*) OVER () AS n
    FROM scores
)
SELECT doc_id, n_tokens, logprob,
       CASE CAST(floor((rnk - 1) * 3.0 / n) AS INT)
            WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
       END AS ppl_bucket
FROM ranked
"""


def q121_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (pipeline.sampling.hash_split):
    80/10/10 assignment by cumulative thresholds on one md5 hash — the
    same-doc-same-split-everywhere contract a training pipeline needs so
    eval rows can never leak into training.  Rolled up per split with an
    id checksum so the oracle certifies the exact membership, not just
    the sizes."""
    from noaa_oracle_spark.pipeline.sampling import hash_split

    return (
        hash_split(load(spark, sf_dir, "documents"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
    )


SQL_Q121 = """
WITH assigned AS (
    SELECT *,
           CASE WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 3)
                     < 'ccc' THEN 'train'
                WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 3)
                     < 'e66' THEN 'val'
                ELSE 'test'
           END AS split
    FROM documents
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM assigned GROUP BY 1
"""


def q122_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct-count sketch (pipeline/sketches
    .kmv_distinct, Bar-Yossef et al. 2002): per-source distinct
    word-3-gram cardinality estimated from the 256 smallest md5 hashes —
    the mergeable sublinear counter a 100 TB profile keeps per shard
    instead of exact distinct state.  md5-keyed, so the estimate is
    bit-identical in any engine; the exact count rides along so the
    sketch error is visible in the gate output."""
    from noaa_oracle_spark.pipeline.dedup import _word_shingles
    from noaa_oracle_spark.pipeline.sketches import kmv_distinct

    sh = _word_shingles(
        load(spark, sf_dir, "documents"), id_col="source", n=3
    )
    est = kmv_distinct(sh, ["source"], F.col("shingle"), k=256)
    exact = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    return est.join(exact, "source").select(
        "source", "n_exact", "n_sketch", "kmv_distinct"
    )


SQL_Q122 = """
WITH w AS (
    SELECT source, string_split(text, ' ') AS words FROM documents
), sh AS (
    SELECT DISTINCT source,
           words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
    FROM (SELECT source, words,
                 unnest(generate_series(1, len(words) - 2)) AS i
          FROM w WHERE len(words) >= 3)
), hd AS (
    SELECT DISTINCT source,
           ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS hv
    FROM sh
), ranked AS (
    SELECT source, hv,
           row_number() OVER (PARTITION BY source ORDER BY hv) AS rnk
    FROM hd
), agg AS (
    SELECT source, count(*) AS n_sketch, max(hv) AS kth
    FROM ranked WHERE rnk <= 256 GROUP BY 1
), exact AS (
    SELECT source, count(*) AS n_exact FROM sh GROUP BY 1
)
SELECT source,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_sketch AS BIGINT) AS n_sketch,
       round(CASE WHEN n_sketch < 256 THEN CAST(n_sketch AS DOUBLE)
                  ELSE 255.0 * 1152921504606846976.0 / (kth + 1.0)
             END, 6) AS kmv_distinct
FROM agg JOIN exact USING (source)
"""


def q123_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap from merged KMV sketches
    (pipeline/sketches.kmv_jaccard — the Theta-sketch intersection
    estimator): the bottom-256 of each pair's UNION is reconstructed
    exactly from the two per-source sketches, and jaccard = |bottom ∩
    A ∩ B| / |bottom|.  The oracle recomputes the union-bottom
    relationally (rank over the pair-expanded distinct hashes), proving
    the sketch algebra equals the definition."""
    from noaa_oracle_spark.pipeline.dedup import _word_shingles
    from noaa_oracle_spark.pipeline.sketches import kmv_jaccard

    sh = _word_shingles(
        load(spark, sf_dir, "documents"), id_col="source", n=3
    )
    return kmv_jaccard(sh, "source", F.col("shingle"), k=256)


SQL_Q123 = """
WITH w AS (
    SELECT source, string_split(text, ' ') AS words FROM documents
), sh AS (
    SELECT DISTINCT source,
           words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
    FROM (SELECT source, words,
                 unnest(generate_series(1, len(words) - 2)) AS i
          FROM w WHERE len(words) >= 3)
), hd AS (
    SELECT DISTINCT source AS g,
           ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS hv
    FROM sh
), srcs AS (
    SELECT DISTINCT g FROM hd
), pairs AS (
    SELECT a.g AS ga, b.g AS gb FROM srcs a JOIN srcs b ON a.g < b.g
), u AS (
    SELECT ga, gb, hv,
           max(CASE WHEN hd.g = ga THEN 1 ELSE 0 END) AS in_a,
           max(CASE WHEN hd.g = gb THEN 1 ELSE 0 END) AS in_b
    FROM pairs JOIN hd ON hd.g = ga OR hd.g = gb
    GROUP BY 1, 2, 3
), ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY ga, gb ORDER BY hv) AS rnk
    FROM u
)
SELECT ga AS group_a, gb AS group_b,
       CAST(count(*) AS BIGINT) AS n_union_sketch,
       CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
       round(sum(in_a * in_b) / count(*), 6) AS jaccard
FROM ranked WHERE rnk <= 256 GROUP BY 1, 2
"""


def q124_countmin_heavy_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-min sketch heavy hitters (pipeline/sketches, Cormode &
    Muthukrishnan 2005): 4x64 seeded-md5 cell table built from the
    term-TYPE dimension (the q106 de-skew discipline), point-queried for
    the exact top-20 corpus terms.  cms_estimate >= exact_count always
    (collisions only add); the oracle restates the cell build and the
    min-over-rows query."""
    from noaa_oracle_spark.pipeline.sketches import countmin_heavy_hitters

    return countmin_heavy_hitters(
        load(spark, sf_dir, "documents"), top_n=20, d=4, w=64
    )


SQL_Q124 = """
WITH words AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
), counts AS (
    SELECT term, count(*) AS n FROM words WHERE term <> '' GROUP BY 1
), seeds AS (
    SELECT unnest(range(0, 4)) AS seed
), cells AS (
    SELECT seed,
           ('0x' || substring(md5(CAST(seed AS VARCHAR) || '|' || term),
                              1, 15))::BIGINT % 64 AS bucket,
           sum(n) AS cell_count
    FROM counts CROSS JOIN seeds GROUP BY 1, 2
), top AS (
    SELECT term, n,
           row_number() OVER (ORDER BY n DESC, term ASC) AS rnk
    FROM counts
), probes AS (
    SELECT term, n, seed,
           ('0x' || substring(md5(CAST(seed AS VARCHAR) || '|' || term),
                              1, 15))::BIGINT % 64 AS bucket
    FROM top CROSS JOIN seeds WHERE rnk <= 20
)
SELECT term,
       CAST(max(n) AS BIGINT) AS exact_count,
       CAST(min(cell_count) AS BIGINT) AS cms_estimate
FROM probes JOIN cells USING (seed, bucket)
GROUP BY term
"""


def q125_matryoshka_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka prefix-truncation retrieval (pipeline/similarity
    .matryoshka_knn, Kusupati et al. NeurIPS 2022): top-5 by cosine on
    the first 16 of 64 dims — the codebook-free cheap-candidate tier —
    with the full-dimension cosine of each selected pair alongside (the
    truncation-error readout).  The oracle restates the slice, the
    prefix ranking, and the full-dim re-score in SQL."""
    from noaa_oracle_spark.pipeline.similarity import matryoshka_knn

    emb = load(spark, sf_dir, "embeddings")
    return matryoshka_knn(
        emb.filter(F.col("vec_id") < 10), emb, d_prefix=16, k=5
    )


SQL_Q125 = """
WITH q AS (
    SELECT vec_id AS q_id, embedding[1:16] AS q_vec
    FROM embeddings WHERE vec_id < 10
), scored AS (
    SELECT q.q_id, e.vec_id AS n_id,
           round(
             list_sum(list_transform(range(1, 17),
                      i -> q.q_vec[i]::DOUBLE * e.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(q.q_vec,
                        x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(e.embedding[1:16],
                        x -> x::DOUBLE * x::DOUBLE)))),
             6) AS cos_prefix
    FROM q, embeddings e
    WHERE e.vec_id != q.q_id
), ranked AS (
    SELECT q_id, n_id, cos_prefix,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_prefix DESC, n_id ASC) AS rank
    FROM scored
), sel AS (
    SELECT q_id, rank, n_id, cos_prefix FROM ranked WHERE rank <= 5
)
SELECT sel.q_id, sel.rank, sel.n_id, sel.cos_prefix,
       round(
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> qq.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(qq.embedding,
                    x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(e.embedding,
                    x -> x::DOUBLE * x::DOUBLE)))),
         6) AS cos_full
FROM sel
JOIN embeddings e ON e.vec_id = sel.n_id
JOIN embeddings qq ON qq.vec_id = sel.q_id
"""


def q126_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted epoch materialization (pipeline/sampling
    .epoch_upsample): weight = min(n_chars/400, 3), each doc emitted
    floor(w) times plus a hash-decided extra for frac(w) — the
    fractional-epoch mixture semantics of LLM data recipes, reproducible
    on any engine.  Rolled up per (source, epoch) with an id checksum so
    the oracle certifies exactly WHICH docs got the extra copy."""
    from noaa_oracle_spark.pipeline.sampling import epoch_upsample

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.least(F.col("n_chars") / F.lit(400.0), F.lit(3.0))
    )
    return (
        epoch_upsample(docs, "doc_id", "w")
        .groupBy("source", "epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
    )


SQL_Q126 = """
WITH weighted AS (
    SELECT source, doc_id,
           least(n_chars / 400.0, 3.0) AS w,
           ('0x' || substring(md5('epoch|' || CAST(doc_id AS VARCHAR)),
                              1, 3))::INT AS bucket
    FROM documents
), copies AS (
    SELECT source, doc_id,
           CAST(floor(w) AS INT)
           + CASE WHEN bucket < floor((w - floor(w)) * 4096)
                  THEN 1 ELSE 0 END AS n_copies
    FROM weighted
), expanded AS (
    SELECT source, doc_id,
           unnest(range(1, n_copies + 1)) AS epoch
    FROM copies WHERE n_copies >= 1
)
SELECT source, CAST(epoch AS INT) AS epoch,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM expanded GROUP BY 1, 2
"""


def q127_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-mix build, graded as ONE query (the q103
    discipline applied to the round-6 tier): learned quality filter
    (q117's exact integer boundary) → deterministic 80/10/10 split
    (q121) → fractional-epoch upsampling of ONLY the train split (q126,
    w = min(n_chars/400, 2) — eval splits are never upsampled), rolled
    up per (split, source) with a doc_id·epoch checksum.  Pins
    operator-boundary drift across the whole mix pipeline: a filter that
    drops the wrong rows, a split that leaks, or an upsample that
    touches an eval row all flip the hash."""
    from noaa_oracle_spark.pipeline.sampling import (
        epoch_upsample,
        hash_split,
    )
    from noaa_oracle_spark.pipeline.text import quality_classifier

    docs = load(spark, sf_dir, "documents")
    kept = quality_classifier(docs).filter(F.col("keep") == 1).select(
        "doc_id"
    )
    assigned = hash_split(docs.join(kept, "doc_id"), "doc_id")
    train = assigned.filter(F.col("split") == "train").withColumn(
        "w", F.least(F.col("n_chars") / F.lit(400.0), F.lit(2.0))
    )
    up = epoch_upsample(train, "doc_id", "w").select(
        "split", "source", "doc_id", "epoch"
    )
    evals = assigned.filter(F.col("split") != "train").select(
        "split", "source", "doc_id", F.lit(1).alias("epoch")
    )
    return (
        up.unionByName(evals)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.sum(F.col("doc_id") * F.col("epoch"))
            .cast("long")
            .alias("mix_checksum"),
        )
    )


SQL_Q127 = f"""
WITH base AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '),
               w -> w IN ({_ALL_STOP}))) AS n_stopwords,
           length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
    FROM documents
), feats AS (
    SELECT doc_id,
           -2000
           + 8 * floor(n_stopwords * 1000 / n_tokens)
           - 6 * floor(n_digits * 1000 / greatest(n_nonspace, 1))
           + 20 * least(n_tokens, 100) AS z_milli
    FROM base
), kept AS (
    SELECT d.source, d.doc_id, d.n_chars
    FROM documents d JOIN feats USING (doc_id) WHERE z_milli >= 0
), assigned AS (
    SELECT *,
           CASE WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 3)
                     < 'ccc' THEN 'train'
                WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 3)
                     < 'e66' THEN 'val'
                ELSE 'test'
           END AS split
    FROM kept
), train AS (
    SELECT source, doc_id,
           least(n_chars / 400.0, 2.0) AS w,
           ('0x' || substring(md5('epoch|' || CAST(doc_id AS VARCHAR)),
                              1, 3))::INT AS bucket
    FROM assigned WHERE split = 'train'
), copies AS (
    SELECT source, doc_id,
           CAST(floor(w) AS INT)
           + CASE WHEN bucket < floor((w - floor(w)) * 4096)
                  THEN 1 ELSE 0 END AS n_copies
    FROM train
), up AS (
    SELECT 'train' AS split, source, doc_id,
           unnest(range(1, n_copies + 1)) AS epoch
    FROM copies WHERE n_copies >= 1
), evals AS (
    SELECT split, source, doc_id, 1 AS epoch
    FROM assigned WHERE split <> 'train'
), allr AS (
    SELECT * FROM up UNION ALL SELECT * FROM evals
)
SELECT split, source,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(doc_id * epoch) AS BIGINT) AS mix_checksum
FROM allr GROUP BY 1, 2
"""


def q128_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction through the REAL WAV codec (pipeline/
    multimodal.audio_features — the q110/q112 container-gate discipline
    extended to the decoded-sample level): each document becomes a mono
    16-bit 8 kHz PCM clip (sample_j = ascii(char_j)·129 − 8000, built
    map-side with the stdlib muxer), the RIFF/WAVE blob is decoded back
    by media_codecs.decode_wav, and the features come off the recovered
    integer samples — so the oracle can restate the whole mux → parse →
    decode → feature path as integer math on the text.  RMS is derived
    from the exact integers and rounded at 6 dp (the suite float
    rule).  Empty/NULL texts mux to no clip at all (text_to_wav_media),
    matching the oracle's zero-row per-character expansion."""
    from noaa_oracle_spark.pipeline.multimodal import (
        audio_features,
        text_to_wav_media,
    )

    media = text_to_wav_media(load(spark, sf_dir, "documents"))
    return audio_features(media).select(
        "media_id",
        "n_samples",
        "sample_rate",
        "sum_sq",
        "zero_crossings",
        "peak_i16",
        F.round(
            F.sqrt(F.col("sum_sq").cast("double") / F.col("n_samples"))
            / F.lit(32768.0),
            6,
        ).alias("rms"),
    )


SQL_Q128 = """
WITH chars AS (
    SELECT doc_id,
           ascii(substring(text, i, 1)) * 129 - 8000 AS s,
           i
    FROM (SELECT doc_id, text,
                 unnest(range(1, length(text) + 1)) AS i
          FROM documents)
), lagged AS (
    SELECT doc_id, s, i,
           lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
    FROM chars
)
SELECT doc_id AS media_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(8000 AS INT) AS sample_rate,
       CAST(sum(s * s) AS BIGINT) AS sum_sq,
       CAST(sum(CASE WHEN prev IS NOT NULL AND s * prev < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(max(abs(s)) AS BIGINT) AS peak_i16,
       round(sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)) / 32768.0, 6)
           AS rms
FROM lagged GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Round-9 debuts (r7 verdict ask #4): written and mirror-tested during
# round 8 as a staging registry, promoted into the main dicts when the r9
# grading window rotated.  Gate-checks the crawl tier end to end: BM25
# retrieval, crawl→documents URL provenance, robots filtering, WARC/CDX
# byte-layout arithmetic.
# ---------------------------------------------------------------------------

#: BM25 query terms for q129 — deterministic, present in the synthetic
#: documents vocabulary at every SF.
_BM25_TERMS = ["hash", "spark", "window"]


def q129_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by Okapi BM25 (Lucene idf) for a fixed
    bag-of-words query (pipeline/text.bm25_scores): map-side query-term
    filter, one (doc, term) shuffle, df at term-type dim, broadcast
    1-row corpus stats; 6-dp score with doc_id tiebreak."""
    from noaa_oracle_spark.pipeline.text import bm25_scores

    return bm25_scores(
        load(spark, sf_dir, "documents"), _BM25_TERMS, k=10
    )


# Same words/tf/df/dlen/corpus splits, Lucene idf ln(1+(N-df+.5)/(df+.5)),
# k1=1.2 b=0.75 (tf*(k1+1) = tf*2.2; k1*(1-b) = 0.3), 6-dp round, id
# tiebreak.  n_docs/avgdl come from dlen (docs with >=1 token), exactly as
# bm25_scores computes them.
SQL_Q129 = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), w AS (
    SELECT doc_id, term FROM words WHERE term <> ''
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM w
    WHERE term IN ('hash', 'spark', 'window') GROUP BY 1, 2
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
), dlen AS (
    SELECT doc_id, count(*) AS dl FROM w GROUP BY 1
), corpus AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen
), scored AS (
    SELECT tf.doc_id,
           round(sum(
               ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dlen.dl / corpus.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN df USING (term)
    JOIN dlen USING (doc_id)
    CROSS JOIN corpus
    GROUP BY 1
)
SELECT doc_id, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
           AS rnk
FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT 10
"""


def q130_crawl_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL provenance stage over six deterministic URL shapes built
    from doc_id (uppercase scheme/host, default + explicit ports,
    tracking params, unsorted query, fragment, trailing-dot host,
    co.uk public suffix, unparseable junk, non-http scheme):
    canonical_url / url_host / registrable_domain
    (pipeline/web.py — pure codegen expressions, zero Python).  The
    oracle states each shape's expected output directly, so Spark's
    parser is graded against hand-derived RFC expectations rather than
    another parser's quirks."""
    from noaa_oracle_spark.pipeline.web import (
        canonical_url,
        registrable_domain,
        url_host,
    )

    d = F.col("doc_id")
    g = (d % 10).cast("string")
    i = d.cast("string")
    url = (
        F.when(
            d % 6 == 0,
            F.concat(
                F.lit("HTTP://WWW.Site"), g, F.lit(".COM/path/"), i,
                F.lit("?utm_source=x&b=2&a=1#frag"),
            ),
        )
        .when(
            d % 6 == 1,
            F.concat(
                F.lit("https://site"), g, F.lit(".co.uk:443/a/"), i,
                F.lit("?gclid=z&z=1"),
            ),
        )
        .when(
            d % 6 == 2,
            F.concat(
                F.lit("http://site"), g, F.lit(".test.:8080?q="), i
            ),
        )
        .when(
            d % 6 == 3,
            F.concat(F.lit("https://sub.site"), g, F.lit(".org:80/"), i),
        )
        .when(d % 6 == 4, F.concat(F.lit("not a url "), i))
        .otherwise(F.concat(F.lit("ftp://site"), g, F.lit(".net/"), i))
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            "url",
            canonical_url(F.col("url")).alias("canon"),
            url_host(F.col("url")).alias("host"),
            registrable_domain(F.col("url")).alias("domain"),
        )
    )


# The oracle CONSTRUCTS the same six URL shapes and states their expected
# canonical/host/domain outputs per shape — golden expectations derived by
# hand from RFC 3986 + the canonical_url contract (probe-verified against
# Spark before staging).
SQL_Q130 = """
WITH shaped AS (
    SELECT doc_id,
           CAST(doc_id % 10 AS VARCHAR) AS g,
           CAST(doc_id AS VARCHAR) AS i,
           doc_id % 6 AS m
    FROM documents
)
SELECT doc_id,
       CASE m
           WHEN 0 THEN 'HTTP://WWW.Site' || g || '.COM/path/' || i
                       || '?utm_source=x&b=2&a=1#frag'
           WHEN 1 THEN 'https://site' || g || '.co.uk:443/a/' || i
                       || '?gclid=z&z=1'
           WHEN 2 THEN 'http://site' || g || '.test.:8080?q=' || i
           WHEN 3 THEN 'https://sub.site' || g || '.org:80/' || i
           WHEN 4 THEN 'not a url ' || i
           ELSE 'ftp://site' || g || '.net/' || i
       END AS url,
       CASE m
           WHEN 0 THEN 'http://www.site' || g || '.com/path/' || i
                       || '?a=1&b=2'
           WHEN 1 THEN 'https://site' || g || '.co.uk/a/' || i || '?z=1'
           WHEN 2 THEN 'http://site' || g || '.test:8080/?q=' || i
           WHEN 3 THEN 'https://sub.site' || g || '.org:80/' || i
           ELSE NULL
       END AS canon,
       CASE m
           WHEN 0 THEN 'site' || g || '.com'
           WHEN 1 THEN 'site' || g || '.co.uk'
           WHEN 2 THEN 'site' || g || '.test'
           WHEN 3 THEN 'sub.site' || g || '.org'
           WHEN 4 THEN NULL
           ELSE 'site' || g || '.net'
       END AS host,
       CASE m
           WHEN 0 THEN 'site' || g || '.com'
           WHEN 1 THEN 'site' || g || '.co.uk'
           WHEN 2 THEN 'site' || g || '.test'
           WHEN 3 THEN 'site' || g || '.org'
           WHEN 4 THEN NULL
           ELSE 'site' || g || '.net'
       END AS domain
FROM shaped
"""

def q131_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 compliance filtering as a gate: three hosts with known
    robots.txt bodies (longest-match, Allow-wins-tie, '$'-anchored
    wildcard, and a host with no robots row), URLs built
    deterministically from doc_id, kept documents returned
    (web.filter_robots_disallowed, inline plan — the corpus crosses
    zero exchanges).  The oracle states the keep/drop verdict per
    (host, path-shape) case by hand from the RFC semantics."""
    from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

    d = F.col("doc_id")
    i = d.cast("string")
    host = F.concat(F.lit("h"), (d % 3).cast("string"), F.lit(".test"))
    path = (
        F.when(d % 4 == 0, F.concat(F.lit("/private/x"), i))
        .when(d % 4 == 1, F.concat(F.lit("/private/ok/x"), i))
        .when(d % 4 == 2, F.concat(F.lit("/doc/x"), i, F.lit(".pdf")))
        .otherwise(F.concat(F.lit("/pub/x"), i))
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("https://"), host, path).alias("url"),
    )
    robots = spark.createDataFrame(
        [
            (
                "h0.test",
                "User-agent: *\nDisallow: /private/\nAllow: /private/ok/",
            ),
            ("h1.test", "User-agent: *\nDisallow: /*.pdf$"),
        ],
        "host string, robots_txt string",
    )
    return filter_robots_disallowed(docs, robots, plan="inline")


# Golden keep/drop verdicts per (doc_id % 3 = host, doc_id % 4 = path
# shape), hand-derived from RFC 9309: h0 drops /private/ but its longer
# Allow keeps /private/ok/; h1's anchored wildcard drops only *.pdf;
# h2 has no robots row — everything allowed.
SQL_Q131 = """
WITH shaped AS (
    SELECT doc_id,
           doc_id % 3 AS h,
           doc_id % 4 AS m,
           CAST(doc_id AS VARCHAR) AS i
    FROM documents
)
SELECT doc_id,
       'https://h' || h || '.test' ||
       CASE m
           WHEN 0 THEN '/private/x' || i
           WHEN 1 THEN '/private/ok/x' || i
           WHEN 2 THEN '/doc/x' || i || '.pdf'
           ELSE '/pub/x' || i
       END AS url
FROM shaped
WHERE NOT (h = 0 AND m = 0)
  AND NOT (h = 1 AND m = 2)
"""


def q132_warc_cdx_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC CDX layout contract as a gate (the q110/q112 container
    discipline): documents become HTTP-response records in ONE plain
    (uncompressed) WARC shard via the deterministic `build_warc`
    (fixture muxed driver-side like q110's MP4 and q112's MP3 — the
    graded operator is the DISTRIBUTED manifest walk), and the CDX
    columns the walk emits — record byte offsets/lengths, member_idx,
    payload sizes after the HTTP split — are restated in SQL as pure
    byte arithmetic over the source table.  Every record extent is
    205 + digits(i) + len(uri) + digits(p2) + p2 bytes (fixed header
    template + the variable-width fields), offsets are the running
    sum, so the oracle certifies the walk AND the writer against each
    other."""
    import hashlib
    import os
    import tempfile

    from noaa_oracle_spark.pipeline.warc import build_warc, warc_records

    rows = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    recs = [
        {
            "type": "response",
            "uri": f"https://w.test/{r['doc_id']}",
            "http_status": 200,
            "http_content_type": "text/html",
            "payload": (r["text"] or "").encode("utf-8"),
        }
        for r in rows
    ]
    dest = os.path.join(
        tempfile.gettempdir(),
        "noaa_warc_gate_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    os.makedirs(dest, exist_ok=True)
    shard = os.path.join(dest, "gate.warc")
    tmp = shard + ".building"
    with open(tmp, "wb") as f:
        f.write(build_warc(recs, member_gzip=False))
    os.replace(tmp, shard)
    return warc_records(spark, shard, with_payload=False).select(
        "record_idx",
        "target_uri",
        "http_status",
        "content_type",
        "n_payload_bytes",
        "record_offset",
        "record_length",
        "member_idx",
    )


# The writer's byte layout restated in SQL.  Per record i (= dense rank
# of doc_id, 0-based) with P = octet_length(text) and U = its uri:
#   http head   = 62 + digits(P)                  ("HTTP/1.1 200 OK…")
#   p2          = head + P                         (WARC Content-Length)
#   record len  = 205 + digits(i) + len(U) + digits(p2) + p2
#     (10 "WARC/1.0\r\n" + 21 type + 49+digits(i) record-id + 33 date
#      + 19+len(U) target-uri + 49 content-type + 18+digits(p2)
#      content-length + 2 blank + p2 payload + 4 trailer CRLFs)
#   offset      = running sum of prior record lengths
# The walk's n_payload_bytes is the BODY after the HTTP split = P;
# plain shards give every record its own extent, so member_idx = 0.
SQL_Q132 = """
WITH base AS (
    SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS i,
           'https://w.test/' || CAST(doc_id AS VARCHAR) AS uri,
           CAST(octet_length(encode(text)) AS BIGINT) AS p
    FROM documents
), sized AS (
    SELECT i, uri, p,
           62 + length(CAST(p AS VARCHAR)) + p AS p2
    FROM base
), reclen AS (
    SELECT i, uri, p, p2,
           205 + length(CAST(i AS VARCHAR)) + length(uri)
               + length(CAST(p2 AS VARCHAR)) + p2 AS rlen
    FROM sized
)
SELECT i AS record_idx,
       uri AS target_uri,
       CAST(200 AS INTEGER) AS http_status,
       'text/html' AS content_type,
       p AS n_payload_bytes,
       CAST(COALESCE(
           SUM(rlen) OVER (ORDER BY i
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT)
           AS record_offset,
       CAST(rlen AS BIGINT) AS record_length,
       CAST(0 AS BIGINT) AS member_idx
FROM reclen
"""


PIPELINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q16_dedup_exact": q16_dedup_exact,
    "q17_ngram_jaccard": q17_ngram_jaccard,
    "q18_minhash_lsh": q18_minhash_lsh,
    "q19_simhash": q19_simhash,
    "q20_ann_cosine": q20_ann_cosine,
    "q21_quality_scores": q21_quality_scores,
    "q22_language_id": q22_language_id,
    "q23_fingerprint": q23_fingerprint,
    "q24_token_counts": q24_token_counts,
    "q27_lsh_ann": q27_lsh_ann,
    "q28_latest_limit": q28_latest_limit,
    "q29_embedding_dedup": q29_embedding_dedup,
    "q30_ivf_ann": q30_ivf_ann,
    "q38_dedup_components": q38_dedup_components,
    "q46_winnowing": q46_winnowing,
    "q48_stratified_sample": q48_stratified_sample,
    "q63_repetition_filter": q63_repetition_filter,
    "q64_boilerplate_ngrams": q64_boilerplate_ngrams,
    "q66_ppjoin_jaccard": q66_ppjoin_jaccard,
    "q77_decontamination": q77_decontamination,
    "q78_tfidf_top_terms": q78_tfidf_top_terms,
    "q79_source_stats": q79_source_stats,
    "q87_kmeans_clusters": q87_kmeans_clusters,
    "q88_kmeans_centroid_update": q88_kmeans_centroid_update,
    "q89_span_dedup": q89_span_dedup,
    "q90_weighted_sample": q90_weighted_sample,
    "q91_unigram_logprob": q91_unigram_logprob,
    "q92_chunk_documents": q92_chunk_documents,
    "q93_source_quota": q93_source_quota,
    "q94_embedding_dedup_blocked": q94_embedding_dedup_blocked,
    "q95_decontamination_bloom": q95_decontamination_bloom,
    "q96_semantic_dedup": q96_semantic_dedup,
    "q97_exact_substring_spans": q97_exact_substring_spans,
    "q98_source_mix_weights": q98_source_mix_weights,
    "q99_pack_sequences": q99_pack_sequences,
    "q100_pq_adc_knn": q100_pq_adc_knn,
    "q101_ivfpq_knn": q101_ivfpq_knn,
    "q102_pack_bins": q102_pack_bins,
    "q103_corpus_pipeline": q103_corpus_pipeline,
    "q104_ivfpq_residual": q104_ivfpq_residual,
    "q105_redact_pii": q105_redact_pii,
    "q106_bigram_logprob": q106_bigram_logprob,
    "q107_sq8_knn": q107_sq8_knn,
    "q108_webdataset_manifest": q108_webdataset_manifest,
    "q109_opq_knn": q109_opq_knn,
    "q110_mp4_demux": q110_mp4_demux,
    "q111_bpe_pairs": q111_bpe_pairs,
    "q112_mp3_manifest": q112_mp3_manifest,
    "q113_zipf_slope": q113_zipf_slope,
    "q114_vocab_coverage": q114_vocab_coverage,
    "q115_dup_cluster_stats": q115_dup_cluster_stats,
    "q116_ivfpq_rerank": q116_ivfpq_rerank,
    "q117_quality_classifier": q117_quality_classifier,
    "q118_source_percentiles": q118_source_percentiles,
    "q119_length_batches": q119_length_batches,
    "q120_perplexity_buckets": q120_perplexity_buckets,
    "q121_hash_split": q121_hash_split,
    "q122_kmv_distinct": q122_kmv_distinct,
    "q123_kmv_source_overlap": q123_kmv_source_overlap,
    "q124_countmin_heavy_hitters": q124_countmin_heavy_hitters,
    "q125_matryoshka_knn": q125_matryoshka_knn,
    "q126_epoch_upsample": q126_epoch_upsample,
    "q127_training_mix": q127_training_mix,
    "q128_wav_features": q128_wav_features,
    # r9 debuts — staged through round 8 (PIPELINE_QUERIES_STAGED_R9),
    # promoted here when the r9 window rotated.
    "q129_bm25_retrieval": q129_bm25_retrieval,
    "q130_crawl_urls": q130_crawl_urls,
    "q131_robots_filter": q131_robots_filter,
    "q132_warc_cdx_manifest": q132_warc_cdx_manifest,
}

PIPELINE_ORACLE_SQL: dict[str, str] = {
    "q16_dedup_exact": SQL_Q16,
    "q17_ngram_jaccard": SQL_Q17,
    "q18_minhash_lsh": SQL_Q18,
    "q19_simhash": SQL_Q19,
    "q20_ann_cosine": SQL_Q20,
    "q21_quality_scores": SQL_Q21,
    "q22_language_id": SQL_Q22,
    "q23_fingerprint": SQL_Q23,
    "q24_token_counts": SQL_Q24,
    "q27_lsh_ann": SQL_Q27,
    "q28_latest_limit": SQL_Q28,
    "q29_embedding_dedup": SQL_Q29,
    "q30_ivf_ann": SQL_Q30,
    "q38_dedup_components": SQL_Q38,
    "q46_winnowing": SQL_Q46,
    "q48_stratified_sample": SQL_Q48,
    "q63_repetition_filter": SQL_Q63,
    "q64_boilerplate_ngrams": SQL_Q64,
    "q66_ppjoin_jaccard": SQL_Q66,
    "q77_decontamination": SQL_Q77,
    "q78_tfidf_top_terms": SQL_Q78,
    "q79_source_stats": SQL_Q79,
    "q87_kmeans_clusters": SQL_Q87,
    "q88_kmeans_centroid_update": SQL_Q88,
    "q89_span_dedup": SQL_Q89,
    "q90_weighted_sample": SQL_Q90,
    "q91_unigram_logprob": SQL_Q91,
    "q92_chunk_documents": SQL_Q92,
    "q93_source_quota": SQL_Q93,
    "q94_embedding_dedup_blocked": SQL_Q94,
    "q95_decontamination_bloom": SQL_Q95,
    "q96_semantic_dedup": SQL_Q96,
    "q97_exact_substring_spans": SQL_Q97,
    "q98_source_mix_weights": SQL_Q98,
    "q99_pack_sequences": SQL_Q99,
    "q100_pq_adc_knn": SQL_Q100,
    "q101_ivfpq_knn": SQL_Q101,
    "q102_pack_bins": SQL_Q102,
    "q103_corpus_pipeline": SQL_Q103,
    "q104_ivfpq_residual": SQL_Q104,
    "q105_redact_pii": SQL_Q105,
    "q106_bigram_logprob": SQL_Q106,
    "q107_sq8_knn": SQL_Q107,
    "q108_webdataset_manifest": SQL_Q108,
    "q109_opq_knn": SQL_Q109,
    "q110_mp4_demux": SQL_Q110,
    "q111_bpe_pairs": SQL_Q111,
    "q112_mp3_manifest": SQL_Q112,
    "q113_zipf_slope": SQL_Q113,
    "q114_vocab_coverage": SQL_Q114,
    "q115_dup_cluster_stats": SQL_Q115,
    "q116_ivfpq_rerank": SQL_Q116,
    "q117_quality_classifier": SQL_Q117,
    "q118_source_percentiles": SQL_Q118,
    "q119_length_batches": SQL_Q119,
    "q120_perplexity_buckets": SQL_Q120,
    "q121_hash_split": SQL_Q121,
    "q122_kmv_distinct": SQL_Q122,
    "q123_kmv_source_overlap": SQL_Q123,
    "q124_countmin_heavy_hitters": SQL_Q124,
    "q125_matryoshka_knn": SQL_Q125,
    "q126_epoch_upsample": SQL_Q126,
    "q127_training_mix": SQL_Q127,
    "q128_wav_features": SQL_Q128,
    "q129_bm25_retrieval": SQL_Q129,
    "q130_crawl_urls": SQL_Q130,
    "q131_robots_filter": SQL_Q131,
    "q132_warc_cdx_manifest": SQL_Q132,
}


# ---------------------------------------------------------------------------
# Round-10 debuts (r9 verdict ask #1): written and oracle-checked during
# round 9 as a staging registry (PIPELINE_QUERIES_STAGED_R10), promoted
# into the main dicts when the r10 grading window rotated.  Gate-checks
# the retrieval-serving tier end to end: hybrid lexical+vector RRF
# fusion, polite fetch scheduling with host-normalization hazards, the
# iterative crawl-frontier driver, and BM25 shard-merge score parity.
# Measured sf0.1 warm-min2 bench cost at staging time: q133 1.7 s,
# q134 0.8 s, q135 3.8 s, q136 6.3 s (a persistence gate — 2 index
# saves + merge + serve; job scheduling dominates at this sf, not data).
# ---------------------------------------------------------------------------

_BM25_HYBRID_TERMS = ["query", "join", "group"]
_BM25_MERGE_TERMS = ["merge", "batch", "vector"]


def q133_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the lexical BM25 top-20 (pipeline/text.
    bm25_scores) with the vector cosine top-20 for query vec_id=0
    (similarity.brute_force_knn) by reciprocal-rank fusion
    (text.rrf_fuse, k=60) — the full lexical+vector serve path of
    POST /search/hybrid as one declarative gate query.  Both input
    rankings are bounded top-k lists, so the fuse is broadcast-sized;
    nothing after the two retrieval legs touches the corpus."""
    from noaa_oracle_spark.pipeline.similarity import brute_force_knn
    from noaa_oracle_spark.pipeline.text import bm25_scores, rrf_fuse

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    lex = bm25_scores(docs, _BM25_HYBRID_TERMS, k=20).select("doc_id", "rnk")
    vec = brute_force_knn(
        emb.filter(F.col("vec_id") == 0), emb, k=20
    ).select(F.col("n_id").alias("doc_id"), F.col("rank").alias("rnk"))
    return rrf_fuse([lex, vec], k=60, topk=10)


# Leg 1: BM25 exactly as SQL_Q129 (Lucene idf, k1=1.2 b=0.75, 6-dp,
# id tiebreak) for the hybrid terms.  Leg 2: brute cosine of vec_id 0
# against every other vector, ranked on the 6-dp-rounded value (the
# SQL_Q20 arithmetic).  Fusion: score(d) = Σ 1/(60 + rank_d) over the
# lists where d appears (≤2 doubles — IEEE-commutative, engine-stable),
# rounded 6 dp, doc-id tiebreak, top 10.
SQL_Q133 = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), w AS (
    SELECT doc_id, term FROM words WHERE term <> ''
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM w
    WHERE term IN ('group', 'join', 'query') GROUP BY 1, 2
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
), dlen AS (
    SELECT doc_id, count(*) AS dl FROM w GROUP BY 1
), corpus AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen
), bscored AS (
    SELECT tf.doc_id,
           round(sum(
               ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dlen.dl / corpus.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN df USING (term)
    JOIN dlen USING (doc_id)
    CROSS JOIN corpus
    GROUP BY 1
), lex AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rnk
    FROM bscored ORDER BY bm25 DESC, doc_id ASC LIMIT 20
), qv AS (
    SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0
), cscored AS (
    SELECT e.vec_id AS doc_id,
           round(
             list_sum(list_transform(range(1, len(qv.q_vec) + 1),
                      i -> qv.q_vec[i]::DOUBLE * e.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(qv.q_vec,
                                             x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(e.embedding,
                                               x -> x::DOUBLE * x::DOUBLE)))),
             6) AS cos_sim
    FROM qv, embeddings e
    WHERE e.vec_id != 0
), vec AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS rnk
    FROM cscored ORDER BY cos_sim DESC, doc_id ASC LIMIT 20
), fused AS (
    SELECT doc_id, round(sum(1.0 / (60.0 + rnk)), 6) AS rrf_score
    FROM (SELECT * FROM lex UNION ALL SELECT * FROM vec)
    GROUP BY 1
)
SELECT doc_id, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT)
           AS rnk
FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
"""


def q134_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polite fetch scheduling (pipeline/web.politeness_waves) over a
    7-host frontier derived from doc_id, with a crawl-delay dimension
    that exercises the host-fold hazards: a www/uppercase variant
    ('WWW.H1.TEST.') that must normalize onto h1.test, and DUPLICATE
    rows for h2.test that must collapse to ONE dim row (max = most
    conservative) before the broadcast join — the round-8-advice
    fan-out bug, stated as a gate.  Hosts without a dim row use the
    1.0 s default.  One host-keyed exchange; the dim is broadcast."""
    from noaa_oracle_spark.pipeline.web import politeness_waves

    d = F.col("doc_id")
    url = F.concat(
        F.lit("http://h"), (d % 7).cast("string"),
        F.lit(".test/p/"), d.cast("string"),
    )
    frontier = load(spark, sf_dir, "documents").select(
        "doc_id", url.alias("url")
    )
    delays = spark.createDataFrame(
        [
            ("h0.test", 2.0),
            ("WWW.H1.TEST.", 0.5),
            ("h2.test", 1.5),
            ("h2.test.", 3.0),
        ],
        "host string, delay_s double",
    )
    return politeness_waves(frontier, delays=delays).select(
        "doc_id", "url", "wave", "not_before_s"
    )


# The oracle normalizes the dim by hand (www/case/dot fold onto h1/h2,
# duplicate h2 rows -> max 3.0) and restates the wave window: 0-based
# row_number per host ordered by (md5(url), url) — md5 hex strings sort
# identically in both engines — with not_before_s = wave x delay.
SQL_Q134 = """
WITH f AS (
    SELECT doc_id,
           'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.test/p/'
               || CAST(doc_id AS VARCHAR) AS url,
           'h' || CAST(doc_id % 7 AS VARCHAR) || '.test' AS host
    FROM documents
), d AS (
    SELECT * FROM (VALUES ('h0.test', 2.0), ('h1.test', 0.5),
                          ('h2.test', 3.0)) AS t(host, delay)
), w AS (
    SELECT doc_id, url, host,
           row_number() OVER (PARTITION BY host
                              ORDER BY md5(url), url) - 1 AS wave
    FROM f
)
SELECT w.doc_id, w.url, CAST(w.wave AS BIGINT) AS wave,
       round(CAST(w.wave AS DOUBLE)
             * CAST(COALESCE(d.delay, 1.0) AS DOUBLE), 6) AS not_before_s
FROM w LEFT JOIN d ON w.host = d.host
"""


def q135_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of the iterative crawl driver (pipeline/web.
    crawl_rounds) over a synthetic deterministic link graph: page i
    (url http://s{i%5}.test/{i}) links to targets i+1 and i+17, the
    fetcher is the static page table (table_fetcher — URLs the table
    lacks 404), seeds are pages 0 and 1.  The gate states the loop's
    invariants as data: rounds are disjoint (global seen anti-join),
    round N+1 is exactly the unseen out-links of round N's FETCHED
    pages (links to nonexistent pages enter the frontier and die as
    404s), and politeness waves restart per round at the 1.0 s default
    delay.  Link extraction runs the real HTML parser (html_links
    mapInPandas) over real anchor markup; the oracle expands the
    same graph arithmetically."""
    from noaa_oracle_spark.pipeline.web import crawl_rounds, table_fetcher

    def u(c):  # canonical-form URL of page id c (identity under canon)
        return F.concat(
            F.lit("http://s"), (c % 5).cast("string"),
            F.lit(".test/"), c.cast("string"),
        )

    d = F.col("doc_id")
    html = F.concat(
        F.lit('<html><body><a href="'), u(d + 1),
        F.lit('">next</a> <a href="'), u(d + 17),
        F.lit('">jump</a></body></html>'),
    )
    pages = load(spark, sf_dir, "documents").select(
        u(d).alias("url"), html.alias("html")
    )
    seeds = spark.createDataFrame(
        [("http://s0.test/0",), ("http://s1.test/1",)], "url string"
    )
    return crawl_rounds(seeds, table_fetcher(pages), rounds=2)


# Bounded-round closure in plain SQL: fetched_r = frontier_r ∩ pages,
# links_{r+1} = distinct u(i+1) ∪ u(i+17) over fetched_r, frontier_{r+1}
# = links minus everything seen, waves restart per (round, host) ordered
# by (md5(url), url), not_before_s = wave x 1.0.
SQL_Q135 = """
WITH pages AS (
    SELECT 'http://s' || CAST(doc_id % 5 AS VARCHAR) || '.test/'
               || CAST(doc_id AS VARCHAR) AS url,
           doc_id AS i
    FROM documents
), r0 AS (
    SELECT * FROM (VALUES ('http://s0.test/0'), ('http://s1.test/1'))
        AS t(url)
), f0 AS (
    SELECT p.i FROM r0 JOIN pages p USING (url)
), l1 AS (
    SELECT 'http://s' || CAST((i + 1) % 5 AS VARCHAR) || '.test/'
               || CAST(i + 1 AS VARCHAR) AS url FROM f0
    UNION
    SELECT 'http://s' || CAST((i + 17) % 5 AS VARCHAR) || '.test/'
               || CAST(i + 17 AS VARCHAR) FROM f0
), r1 AS (
    SELECT url FROM l1 WHERE url NOT IN (SELECT url FROM r0)
), f1 AS (
    SELECT p.i FROM r1 JOIN pages p USING (url)
), l2 AS (
    SELECT 'http://s' || CAST((i + 1) % 5 AS VARCHAR) || '.test/'
               || CAST(i + 1 AS VARCHAR) AS url FROM f1
    UNION
    SELECT 'http://s' || CAST((i + 17) % 5 AS VARCHAR) || '.test/'
               || CAST(i + 17 AS VARCHAR) FROM f1
), r2 AS (
    SELECT url FROM l2
    WHERE url NOT IN (SELECT url FROM r0)
      AND url NOT IN (SELECT url FROM r1)
), allr AS (
    SELECT url, 0 AS rnd FROM r0
    UNION ALL SELECT url, 1 FROM r1
    UNION ALL SELECT url, 2 FROM r2
), hosted AS (
    SELECT url, rnd,
           split_part(split_part(url, '://', 2), '/', 1) AS host
    FROM allr
), w AS (
    SELECT url, rnd,
           row_number() OVER (PARTITION BY rnd, host
                              ORDER BY md5(url), url) - 1 AS wave
    FROM hosted
)
SELECT url, CAST(rnd AS INTEGER) AS round, CAST(wave AS BIGINT) AS wave,
       CAST(wave AS DOUBLE) AS not_before_s
FROM w
"""


def q136_bm25_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index growth: split the corpus by doc_id parity,
    build a persisted BM25 index per shard (text.save_bm25_index),
    merge them (merge_bm25_indexes — disjointness-checked union, no
    re-tokenization of old shards), and serve a top-10 query off the
    MERGED index (bm25_query).  The oracle scores the same query over
    the whole corpus directly, so the gate pins the merge contract:
    merged-index scores are exactly the scores of one index built over
    the concatenated corpus.

    The work dir is a fresh mkdtemp per invocation (round-9 advice: a
    fixed sf-keyed /tmp path races under pytest-xdist / bench-alongside-
    tests and can flakily fail load's count validation); the bounded
    top-k result is materialized before cleanup so the returned frame
    does not lazily reference deleted index files."""
    import shutil
    import tempfile

    from noaa_oracle_spark.pipeline.text import (
        bm25_query,
        load_bm25_index,
        merge_bm25_indexes,
        save_bm25_index,
    )

    from concurrent.futures import ThreadPoolExecutor

    docs = load(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="noaa_bm25_gate_")
    try:
        # the two shard builds are independent (disjoint inputs, disjoint
        # output dirs) — exactly the concurrent-shard-build shape a real
        # ingest tier runs; overlapping them back-fills each build's
        # shuffle tail (guide §2.6)
        with ThreadPoolExecutor(max_workers=2) as pool:
            fe = pool.submit(
                save_bm25_index,
                docs.filter(F.col("doc_id") % 2 == 0),
                f"{base}/even",
            )
            fo = pool.submit(
                save_bm25_index,
                docs.filter(F.col("doc_id") % 2 == 1),
                f"{base}/odd",
            )
            fe.result()
            fo.result()
        merge_bm25_indexes(
            spark, [f"{base}/even", f"{base}/odd"], f"{base}/merged"
        )
        out = bm25_query(
            load_bm25_index(spark, f"{base}/merged"), _BM25_MERGE_TERMS, k=10
        )
        # k=10 rows by contract — bounded, not corpus-sized.
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# Scoring over the FULL corpus with the q129 arithmetic — the merged
# index must reproduce it exactly (same idf/saturation/6-dp/tiebreak).
SQL_Q136 = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), w AS (
    SELECT doc_id, term FROM words WHERE term <> ''
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM w
    WHERE term IN ('batch', 'merge', 'vector') GROUP BY 1, 2
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
), dlen AS (
    SELECT doc_id, count(*) AS dl FROM w GROUP BY 1
), corpus AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen
), scored AS (
    SELECT tf.doc_id,
           round(sum(
               ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dlen.dl / corpus.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN df USING (term)
    JOIN dlen USING (doc_id)
    CROSS JOIN corpus
    GROUP BY 1
)
SELECT doc_id, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
           AS rnk
FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Round-11 debuts — staged through round 10 (PIPELINE_QUERIES_STAGED_R11,
# oracle-checked at sf0.001+sf0.01 by tests/test_staged_r11.py the whole
# round), promoted into the main dicts when the r11 window rotated.
# Gate-checks the index-maintenance tier end to end: the append →
# fragment → compact lifecycle with score parity across the switch, and
# the production HTTP crawl fetcher driving the same frontier the pure
# table fetcher does.  Measured sf0.1 warm-min2 bench cost at staging
# time: q137 ~7 s (persistence gate — save + 2 appends + compact + serve;
# job scheduling dominates at this sf), q138 ~2.9 s (3 crawl rounds).
# ---------------------------------------------------------------------------

_BM25_COMPACT_TERMS = ["filter", "scan", "sort"]


def q137_bm25_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-then-compact index lifecycle: build a base BM25 index over
    the first 60% of the corpus (text.save_bm25_index), grow it with
    two file-level appends (append_bm25_index — old shards never
    re-tokenized), compact the fragmented index into the fresh-save
    layout (compact_bm25_index — one term-hash repartition + term sort,
    row set unchanged), and serve a top-10 query off the COMPACTED
    index.  The oracle scores the same query over the whole corpus
    directly, so the gate pins the whole maintenance chain: grown ==
    rebuilt == compacted, score-exactly.

    Work dir is a fresh mkdtemp; the bounded top-k result is
    materialized before cleanup (the q136 discipline)."""
    import shutil
    import tempfile

    from noaa_oracle_spark.pipeline.text import (
        append_bm25_index,
        bm25_query,
        compact_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    docs = load(spark, sf_dir, "documents")
    n = docs.count()  # one bounded scalar — split points, not data
    c1, c2 = (3 * n) // 5, (4 * n) // 5
    d = F.col("doc_id")
    base = tempfile.mkdtemp(prefix="noaa_bm25_compact_gate_")
    try:
        save_bm25_index(docs.filter(d < c1), f"{base}/idx")
        append_bm25_index(
            spark, f"{base}/idx", docs.filter((d >= c1) & (d < c2))
        )
        append_bm25_index(spark, f"{base}/idx", docs.filter(d >= c2))
        compact_bm25_index(spark, f"{base}/idx", f"{base}/compacted")
        out = bm25_query(
            load_bm25_index(spark, f"{base}/compacted"),
            _BM25_COMPACT_TERMS,
            k=10,
        )
        # k=10 rows by contract — bounded, not corpus-sized.
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# Full-corpus scoring with the q129/q136 arithmetic — the compacted
# grown index must reproduce it exactly.
SQL_Q137 = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), w AS (
    SELECT doc_id, term FROM words WHERE term <> ''
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM w
    WHERE term IN ('filter', 'scan', 'sort') GROUP BY 1, 2
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
), dlen AS (
    SELECT doc_id, count(*) AS dl FROM w GROUP BY 1
), corpus AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen
), scored AS (
    SELECT tf.doc_id,
           round(sum(
               ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dlen.dl / corpus.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN df USING (term)
    JOIN dlen USING (doc_id)
    CROSS JOIN corpus
    GROUP BY 1
)
SELECT doc_id, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
           AS rnk
FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT 10
"""


def q138_crawl_http_fetcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q135 crawl closure driven by the PRODUCTION fetcher path:
    `crawl_rounds` over `http_fetcher` with a deterministic closure
    transport (page i at http://s{i%5}.test/{i} links to i+1 and i+17;
    ids outside the corpus 404 — the transport raises and the kernel
    drops the row, table_fetcher's 404 semantics) under a virtual
    clock, so the politeness pacing runs without wall-clock sleeps.
    Same seeds/rounds/graph as q135, so the same arithmetic oracle
    pins that the HTTP kernel path — schedule, host partitioning,
    retry-drop — changes NOTHING about the frontier semantics."""
    from noaa_oracle_spark.pipeline.web import crawl_rounds, http_fetcher

    n = load(spark, sf_dir, "documents").count()  # corpus id bound

    def transport(url, timeout, headers):
        try:
            i = int(url.rsplit("/", 1)[1])
        except ValueError:
            raise OSError("404") from None
        if not (0 <= i < n) or url != f"http://s{i % 5}.test/{i}":
            raise OSError("404")
        return (
            f'<html><body><a href="http://s{(i + 1) % 5}.test/{i + 1}">n'
            f'</a> <a href="http://s{(i + 17) % 5}.test/{i + 17}">j</a>'
            "</body></html>"
        )

    clock_state = [0.0]

    def clock() -> float:
        return clock_state[0]

    def sleep(secs: float) -> None:
        clock_state[0] += secs

    seeds = spark.createDataFrame(
        [("http://s0.test/0",), ("http://s1.test/1",)], "url string"
    )
    fetcher = http_fetcher(
        transport=transport, clock=clock, sleep=sleep, max_retries=0
    )
    return crawl_rounds(seeds, fetcher, rounds=2)


#: Same graph, seeds, and rounds as q135 — the oracle is shared.
SQL_Q138 = SQL_Q135


# ---------------------------------------------------------------------------
# Round-12 staged gate debuts.
#
# The r11 grading window is full (37 two-round-stale r8 names + the
# q137/q138 debuts + 11 oldest-r9 fills), so these CANNOT enter
# queries() this round.  Built, oracle-checked
# (tests/test_staged_r12.py runs them against DuckDB at sf0.001 and
# sf0.01) and PROMOTED into PIPELINE_QUERIES / PIPELINE_ORACLE_SQL when
# the r12 window rotates — the staging discipline q129–q138 followed.
# Gate-growth budget: 138 + 1 keeps the trajectory under the ~150
# ceiling (r10 verdict ask #8: stage at most 1–2, prefer non-gate work).
# ---------------------------------------------------------------------------


def q139_pq_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-then-compact VECTOR index lifecycle — q137's PQ twin (r10
    verdict ask #2): train the q100 seed codebooks (iters=0, the 8
    lowest-id vectors — all inside the base split, so training on the
    base equals training on the corpus and the oracle stays q100's
    full-corpus SQL), save a flat PQ index over the first 60% of the
    embeddings (pq.save_pq_index), grow it with two file-level appends
    (append_pq_index — frozen codebooks, old code files never
    rewritten), compact the fragmented index into the fresh-save layout
    (compact_pq_index — row set unchanged), and answer 5 queries' ADC
    top-3 off the COMPACTED index.  Codes are append-path-invariant
    (encode is deterministic given frozen codebooks), so grown ==
    compacted == rebuilt score-exactly, and the oracle recomputes the
    whole quantizer over the corpus in SQL (the q100 arithmetic).

    Work dir is a fresh mkdtemp; the bounded top-k result is
    materialized before cleanup (the q136/q137 discipline)."""
    import shutil
    import tempfile

    from noaa_oracle_spark.pipeline.pq import (
        append_pq_index,
        compact_pq_index,
        load_pq_index,
        pq_encode,
        pq_knn,
        pq_train,
        save_pq_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()  # one bounded scalar — split points, not data
    c1, c2 = (3 * n) // 5, (4 * n) // 5
    v = F.col("vec_id")
    books = pq_train(emb.filter(v < c1), m=8, k=8, iters=0)
    base = tempfile.mkdtemp(prefix="noaa_pq_compact_gate_")
    try:
        save_pq_index(
            books, pq_encode(emb.filter(v < c1), books), f"{base}/idx"
        )
        append_pq_index(
            spark, f"{base}/idx", emb.filter((v >= c1) & (v < c2))
        )
        append_pq_index(spark, f"{base}/idx", emb.filter(v >= c2))
        compact_pq_index(spark, f"{base}/idx", f"{base}/compacted")
        idx = load_pq_index(spark, f"{base}/compacted")
        q = emb.filter(v < 5)
        out = pq_knn(q, idx["codes"], idx["codebooks"], k=3)
        # 5 queries × 3 rows by contract — bounded, not corpus-sized.
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


#: The compacted grown index must reproduce the full-corpus quantizer
#: exactly — q100's oracle IS the spec (codes are append-path-invariant
#: under frozen codebooks, and the seeds live in the base split).
SQL_Q139 = SQL_Q100


_SINK_LIFECYCLE_TERMS = ["stream", "table", "agg"]


def q140_versioned_sink_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-ingest lifecycle as ONE gate: drive the
    `bm25_index_sink` foreachBatch closure (auto_compact_ratio=2.0,
    versioned root) over five deterministic doc-id-range microbatches of
    the corpus, then serve a top-10 query off whatever version the
    CURRENT pointer ends on (`current_bm25_index_path` — the serve
    layer's pointer-follow).  WHERE in the batch sequence compaction
    fires depends on physical file counts (shuffle partitioning), but
    the SERVED SCORES are invariant to it by construction — appends
    never change old rows and compaction never changes the row set — so
    the full-corpus scoring oracle pins the lifecycle end to end: save →
    appends → auto-compact(s) → repoint → serve == one batch build.

    Work dir is a fresh mkdtemp; bounded top-k materialized before
    cleanup (the q136/q137 discipline)."""
    import shutil
    import tempfile

    from noaa_oracle_spark.pipeline.text import bm25_query, load_bm25_index
    from noaa_oracle_spark.streaming.corpus import (
        bm25_index_sink,
        current_bm25_index_path,
    )

    docs = load(spark, sf_dir, "documents")
    n = docs.count()  # one bounded scalar — split points, not data
    d = F.col("doc_id")
    base = tempfile.mkdtemp(prefix="noaa_sink_gate_")
    try:
        sink = bm25_index_sink(f"{base}/root", auto_compact_ratio=2.0)
        bounds = [(i * n) // 5 for i in range(6)]
        for b in range(5):
            sink(
                docs.filter((d >= bounds[b]) & (d < bounds[b + 1])),
                b,
            )
        idx = load_bm25_index(
            spark, current_bm25_index_path(spark, f"{base}/root")
        )
        out = bm25_query(idx, _SINK_LIFECYCLE_TERMS, k=10)
        # k=10 rows by contract — bounded, not corpus-sized.
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# Full-corpus scoring with the q129/q137 arithmetic — the sink-built,
# auto-compacted, pointer-served index must reproduce it exactly.
SQL_Q140 = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), w AS (
    SELECT doc_id, term FROM words WHERE term <> ''
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM w
    WHERE term IN ('stream', 'table', 'agg') GROUP BY 1, 2
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
), dlen AS (
    SELECT doc_id, count(*) AS dl FROM w GROUP BY 1
), corpus AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen
), scored AS (
    SELECT tf.doc_id,
           round(sum(
               ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dlen.dl / corpus.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN df USING (term)
    JOIN dlen USING (doc_id)
    CROSS JOIN corpus
    GROUP BY 1
)
SELECT doc_id, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
           AS rnk
FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT 10
"""


def q141_codebook_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook-drift metric through the PRODUCTION append path (r11
    verdict ask #4): train the q100 seed codebooks on the base 60% of
    the embeddings (iters=0; the 8 lowest-id seeds all live in the
    base, so base-train == corpus-train and the oracle can restate the
    quantizer), save a flat PQ index, then grow it with TWO appends
    whose `metrics_out` reconstruction errors are the result rows —
    batch 0 appends the tail 40% unchanged (stationary stream: mse in
    the training distribution's range), batch 1 appends the SAME rows
    shifted by +3.0 per dimension under fresh ids (planted drift: the
    frozen codebooks quantize it far worse).  The mse is computed from
    the append's own encode pass (the argmin distances it derives
    anyway — zero extra passes), so this gate hash-grades the exact
    numbers `pq_index_sink` persists and /index/stats serves.  The
    oracle restates per-row error as Σ_sub min_code round(‖sub −
    centroid‖², 6) and averages per batch."""
    import shutil
    import tempfile

    from noaa_oracle_spark.pipeline.pq import (
        append_pq_index,
        pq_encode,
        pq_train,
        save_pq_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()  # one bounded scalar — split points, not data
    c1 = (3 * n) // 5
    v = F.col("vec_id")
    books = pq_train(emb.filter(v < c1), m=8, k=8, iters=0)
    tail = emb.filter(v >= c1)
    shifted = tail.select(
        (v + F.lit(int(n))).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") + F.lit(3.0)
        ).alias("embedding"),
    )
    base = tempfile.mkdtemp(prefix="noaa_drift_gate_")
    try:
        save_pq_index(
            books, pq_encode(emb.filter(v < c1), books), f"{base}/idx"
        )
        m0: dict = {}
        m1: dict = {}
        append_pq_index(spark, f"{base}/idx", tail, metrics_out=m0)
        append_pq_index(spark, f"{base}/idx", shifted, metrics_out=m1)
        # 2 rows by contract — the per-batch drift signal, not data
        return spark.createDataFrame(
            [(0, int(m0["n"]), float(m0["mse"])),
             (1, int(m1["n"]), float(m1["mse"]))],
            "batch int, n long, mse double",
        ).select("batch", "n", F.round("mse", 6).alias("mse"))
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_Q141 = """
WITH seeds AS (
    SELECT vec_id, embedding,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
    FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
), subsq AS (
    SELECT CAST(unnest(range(0, 8)) AS INT) AS sub
), books AS (
    SELECT subsq.sub, seeds.code,
           list_transform(range(1, 9),
               i -> seeds.embedding[subsq.sub * 8 + i]::DOUBLE) AS centroid
    FROM seeds, subsq
), cnt AS (
    SELECT (3 * count(*)) // 5 AS c1 FROM embeddings
), grp AS (
    SELECT 0 AS batch, e.vec_id,
           list_transform(e.embedding, x -> x::DOUBLE) AS emb
    FROM embeddings e, cnt WHERE e.vec_id >= cnt.c1
    UNION ALL
    SELECT 1 AS batch, e.vec_id,
           list_transform(e.embedding, x -> x::DOUBLE + 3.0) AS emb
    FROM embeddings e, cnt WHERE e.vec_id >= cnt.c1
), subv AS (
    SELECT g.batch, g.vec_id, subsq.sub,
           list_transform(range(1, 9),
               i -> g.emb[subsq.sub * 8 + i]) AS svec
    FROM grp g, subsq
), dmin AS (
    SELECT v.batch, v.vec_id, v.sub,
           min(round(list_sum(list_transform(range(1, 9),
               i -> (v.svec[i] - b.centroid[i])
                  * (v.svec[i] - b.centroid[i]))), 6)) AS d
    FROM subv v JOIN books b ON v.sub = b.sub
    GROUP BY 1, 2, 3
), qerr AS (
    SELECT batch, vec_id, sum(d) AS qerr FROM dmin GROUP BY 1, 2
)
SELECT batch, CAST(count(*) AS BIGINT) AS n,
       round(avg(qerr), 6) AS mse
FROM qerr GROUP BY 1 ORDER BY 1
"""


# r10–r13 debuts — each staged one round ahead (PIPELINE_QUERIES_STAGED_R10
# / _R11 / _R12 / _R13), promoted here when their window rotated (defined
# below the main dict literals, hence .update()).  q141 was staged through
# r12 and oracle-checked every round by the then tests/test_staged_r13.py;
# promoted when the r13 window rotated (141 live gates, under the ~150
# ceiling, r11 verdict ask #8).
PIPELINE_QUERIES.update({
    "q141_codebook_drift": q141_codebook_drift,
    "q133_hybrid_rrf": q133_hybrid_rrf,
    "q134_politeness_schedule": q134_politeness_schedule,
    "q135_crawl_frontier": q135_crawl_frontier,
    "q136_bm25_merge": q136_bm25_merge,
    "q137_bm25_compaction": q137_bm25_compaction,
    "q138_crawl_http_fetcher": q138_crawl_http_fetcher,
    "q139_pq_compaction": q139_pq_compaction,
    "q140_versioned_sink_lifecycle": q140_versioned_sink_lifecycle,
})

PIPELINE_ORACLE_SQL.update({
    "q141_codebook_drift": SQL_Q141,
    "q133_hybrid_rrf": SQL_Q133,
    "q134_politeness_schedule": SQL_Q134,
    "q135_crawl_frontier": SQL_Q135,
    "q136_bm25_merge": SQL_Q136,
    "q137_bm25_compaction": SQL_Q137,
    "q138_crawl_http_fetcher": SQL_Q138,
    "q139_pq_compaction": SQL_Q139,
    "q140_versioned_sink_lifecycle": SQL_Q140,
})
