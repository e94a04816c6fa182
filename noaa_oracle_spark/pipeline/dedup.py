"""Document deduplication operators for training-data pipelines.

Four tiers, cheapest-first — the standard large-corpus dedup ladder:
  1. exact_dedup          hash-groupBy on the full text (one shuffle)
  2. simhash_fingerprints 64→16-bit locality-sensitive bit signature
  3. minhash_lsh_candidates  MinHash signatures + LSH banding → candidate
                             pairs without the O(n²) comparison
  4. ngram_jaccard_pairs  exact shingle-Jaccard verification (inverted-index
                          self-join, not a cross join)

All are pure DataFrame plans using JVM-side built-ins (md5/split/explode/
groupBy) — no Python UDFs — so they scale to a full cluster: the only
shuffles are on shingle/band keys, and the pair-explosion is bounded by
posting-list sizes, not n².

Portability note: every hash is md5-hex, which DuckDB computes identically —
each operator has an exact SQL oracle (see suite wiring in __spark_entry__).
Min-of-hex-string is a valid MinHash permutation because fixed-width
lowercase hex compares lexicographically exactly as the underlying integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built with transform+slice over the split array — one projection, no UDF.
    """
    words = F.split(F.col(text_col), " ")
    # Guard: F.sequence(1, 0) would yield a *descending* [1, 0] in Spark, so
    # docs shorter than n words get an explicit empty array instead.
    shingles = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .dropDuplicates([id_col, "shingle"])
    )


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) → representative (min id) + count.
    One hash-aggregate; at 100 TB this is the classic first pass — the
    shuffle key is the 128-bit digest, perfectly uniform."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("rep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via inverted-index self-join.

    Pairs (a < b) with |A∩B| / |A∪B| >= threshold_num/threshold_den. The
    predicate is evaluated on integers (den*common >= num*union) so results
    are exact and engine-portable. Join explodes only co-occurring shingles
    (posting lists), never the full n² pair space."""
    sh = _word_shingles(docs, text_col, id_col, n)
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    ca = counts.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    joined = common.join(ca, "doc_a").join(cb, "doc_b")
    union_sz = F.col("n_a") + F.col("n_b") - F.col("common")
    return (
        joined.filter(
            F.col("common") * threshold_den >= union_sz * threshold_num
        )
        .select(
            "doc_a",
            "doc_b",
            "common",
            union_sz.alias("union_size"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: mh_i = min over shingles of md5(i|shingle).

    Seeding by prefixing the hash index gives `num_hashes` independent
    permutations from one md5 kernel; min-of-hex == min-of-integer for
    fixed-width hex. One groupBy — num_hashes conditional mins."""
    sh = _word_shingles(docs, text_col, id_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
) -> DataFrame:
    """LSH banding over MinHash signatures → candidate near-dup pairs.

    Signature is split into bands of `rows_per_band` hashes; docs agreeing
    on ANY full band become a candidate pair. Probability of candidacy for
    Jaccard s is 1-(1-s^r)^b — the standard S-curve. The band hash is the
    shuffle key, so the self-join is an equi-join on (band_id, band_hash):
    at 100 TB this is the only way pair generation stays sub-quadratic."""
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, n)
    num_bands = num_hashes // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(band).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh{band * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for band in range(num_bands)
        ]
    )
    exploded = sig.select(F.col(id_col), F.explode(bands).alias("band")).select(
        F.col(id_col),
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_hash").alias("band_hash"),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .dropDuplicates()
    )


def simhash_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """SimHash bit-signature per document over distinct words.

    Bit j of the fingerprint is the sign of sum over words of ±1, where the
    vote is the high bit of hex digit j of md5(word). `bits` ≤ 32 uses the
    first `bits` hex digits. Everything is integer/string built-ins, so the
    same computation runs verbatim in DuckDB for the oracle."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    ).filter(F.col("w") != "")
    h = F.md5(F.col("w"))
    votes = [
        F.sum(
            F.when(
                F.substring(h, j + 1, 1).isin(*list("89abcdef")), 1
            ).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    sums = words.groupBy(id_col).agg(*votes)
    fingerprint = None
    for j in range(bits):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return sums.select(F.col(id_col), fingerprint.cast("long").alias("simhash"))
