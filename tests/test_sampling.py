"""Deterministic hash sampling: rate accuracy, run-to-run stability,
stratum independence, and salt independence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.sampling import (
    hash_sample,
    stratified_hash_sample,
)

SF_DIR = "/root/testdata/sf0.01"


def test_rate_and_determinism(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    s1 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    s2 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    assert s1 == s2, "same inputs must select the same rows"
    assert abs(len(s1) / n - 0.3) < 0.08


def test_growing_fraction_is_superset(spark):
    """Raising the rate must only ADD rows (threshold grids nest) — the
    property that lets a pipeline grow a sample without resampling."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    small = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    big = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5).select("doc_id").collect()}
    assert small <= big


def test_salts_give_independent_samples(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt="a").select("doc_id").collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt="b").select("doc_id").collect()}
    assert a != b
    # independent 50% samples overlap on ~25% of the corpus
    assert abs(len(a & b) / n - 0.25) < 0.1


def test_stratified_rates(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_lang = {
        r.lang: r.n
        for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    got = {
        r.lang: r.n
        for r in stratified_hash_sample(
            docs, "doc_id", "lang", {"en": 0.5}, default_fraction=0.2
        ).groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    assert abs(got["en"] / per_lang["en"] - 0.5) < 0.12
    for lang, total in per_lang.items():
        if lang != "en":
            assert got.get(lang, 0) / total < 0.4


def test_weighted_rate_tracks_weight(spark):
    from noaa_oracle_spark.pipeline.sampling import weighted_hash_sample

    df = spark.range(20000).select(
        F.col("id"),
        (F.when(F.col("id") % 2 == 0, 0.8).otherwise(0.2)).alias("w"),
    )
    kept = weighted_hash_sample(df, "id", "w", salt="wq").collect()
    hi = sum(1 for r in kept if r.id % 2 == 0) / 10000
    lo = sum(1 for r in kept if r.id % 2 == 1) / 10000
    assert abs(hi - 0.8) < 0.03, hi
    assert abs(lo - 0.2) < 0.03, lo
    again = weighted_hash_sample(df, "id", "w", salt="wq").collect()
    assert sorted(r.id for r in kept) == sorted(r.id for r in again)


def test_weight_one_keeps_all_weight_zero_none(spark):
    from noaa_oracle_spark.pipeline.sampling import weighted_hash_sample

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 2).cast("double").alias("w")
    )
    kept = [r.id for r in weighted_hash_sample(df, "id", "w").collect()]
    assert len(kept) == 500  # the 'g' threshold keeps ALL weight-1 rows
    assert all(i % 2 == 1 for i in kept)


def test_raising_weight_is_superset(spark):
    from noaa_oracle_spark.pipeline.sampling import weighted_hash_sample

    df = spark.range(5000).select(
        F.col("id"), F.lit(0.3).alias("lo"), F.lit(0.6).alias("hi")
    )
    small = {r.id for r in weighted_hash_sample(df, "id", "lo", "s").collect()}
    big = {r.id for r in weighted_hash_sample(df, "id", "hi", "s").collect()}
    assert small <= big


def test_cap_per_group_quota_and_monotonicity(spark):
    from noaa_oracle_spark.pipeline.sampling import cap_per_group

    df = spark.range(3000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    small = cap_per_group(df, "grp", "id", cap=100, salt="q").collect()
    counts = {}
    for r in small:
        counts[r.grp] = counts.get(r.grp, 0) + 1
    assert counts == {"0": 100, "1": 100, "2": 100}
    again = cap_per_group(df, "grp", "id", cap=100, salt="q").collect()
    assert sorted(r.id for r in small) == sorted(r.id for r in again)
    big = cap_per_group(df, "grp", "id", cap=200, salt="q").collect()
    assert {r.id for r in small} <= {r.id for r in big}  # raising cap only adds


def test_cap_per_group_under_cap_groups_untouched(spark):
    from noaa_oracle_spark.pipeline.sampling import cap_per_group

    df = spark.range(30).select(
        F.col("id"), (F.col("id") % 10).cast("string").alias("grp")
    )
    out = cap_per_group(df, "grp", "id", cap=5).collect()
    assert len(out) == 30  # every group has 3 rows, under the cap


def test_cap_per_group_reserved_name_collision(spark):
    import pytest

    from noaa_oracle_spark.pipeline.sampling import cap_per_group

    df = spark.range(10).select(
        F.col("id"), F.lit("a").alias("grp"), F.lit(1).alias("_rn")
    )
    with pytest.raises(ValueError, match="_rn"):
        cap_per_group(df, "grp", "id", cap=5)


def test_source_mix_weights_temperature_semantics(spark):
    import pytest

    from noaa_oracle_spark.pipeline.sampling import (
        cap_per_group,
        source_mix_weights,
    )

    rows = (
        [(i, "big") for i in range(900)]
        + [(i + 1000, "mid") for i in range(90)]
        + [(i + 2000, "tiny") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    natural = {
        r.source: r for r in source_mix_weights(df, alpha=1.0).collect()
    }
    cooled = {
        r.source: r for r in source_mix_weights(df, alpha=0.5).collect()
    }
    uniform = {
        r.source: r for r in source_mix_weights(df, alpha=0.0).collect()
    }
    # alpha=1: natural shares
    assert natural["big"].mix_weight == pytest.approx(0.9, abs=1e-6)
    assert natural["tiny"].mix_weight == pytest.approx(0.01, abs=1e-6)
    # alpha=0: uniform
    for s in ("big", "mid", "tiny"):
        assert uniform[s].mix_weight == pytest.approx(1 / 3, abs=1e-6)
    # cooling strictly up-weights the small source, down-weights the big
    assert cooled["tiny"].mix_weight > natural["tiny"].mix_weight
    assert cooled["big"].mix_weight < natural["big"].mix_weight
    # weights normalize; quotas honor the budget up to flooring
    assert sum(r.mix_weight for r in cooled.values()) == pytest.approx(
        1.0, abs=1e-5
    )
    budgeted = sum(r.quota for r in cooled.values())
    assert 0 < budgeted <= 100_000
    # composition: quotas drive cap_per_group directly
    q = {r.source: r.quota for r in
         source_mix_weights(df, alpha=0.5, budget=100).collect()}
    capped = cap_per_group(df, "source", "doc_id", cap=q["tiny"]).collect()
    got_tiny = sum(1 for r in capped if r.source == "tiny")
    assert got_tiny == min(10, q["tiny"])


def test_pack_training_sequences_semantics(spark):
    import pytest

    from noaa_oracle_spark.pipeline.sampling import pack_training_sequences

    rows = [(i, " ".join(["w"] * n)) for i, n in
            [(0, 300), (1, 300), (2, 300), (3, 300), (4, 10)]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r.doc_id, r.n_tokens, r.seq_id, r.start_offset)
        for r in pack_training_sequences(df, budget_tokens=512).collect()
    )
    # invariants independent of hash order: token counts survive; the
    # k-th doc in hash order starts at cumulative-sum offset
    assert [t[1] for t in out] == [300, 300, 300, 300, 10]
    by_order = sorted(out, key=lambda t: (t[2], t[3]))
    cum = 0
    for _, n, seq, off in by_order:
        assert seq == cum // 512
        assert off == cum % 512
        cum += n
    # deterministic: same salt, same packing; different salt reorders
    again = sorted(
        (r.doc_id, r.n_tokens, r.seq_id, r.start_offset)
        for r in pack_training_sequences(df, budget_tokens=512).collect()
    )
    assert again == out
    other = sorted(
        (r.doc_id, r.seq_id, r.start_offset)
        for r in pack_training_sequences(
            df, budget_tokens=512, salt="epoch1"
        ).collect()
    )
    assert other != [(d, s, o) for d, _, s, o in out]


def test_pack_training_sequences_vs_python_oracle(spark):
    """Randomized corpora against an independent python reimplementation:
    md5(salt|id) order, running token sum, floor/mod assignment."""
    import hashlib
    import random

    from noaa_oracle_spark.pipeline.sampling import pack_training_sequences

    rnd = random.Random(13)
    rows = [
        (i, " ".join("tok%d" % rnd.randint(0, 9) for _ in
                     range(rnd.randint(1, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.seq_id, r.start_offset)
        for r in pack_training_sequences(
            df, budget_tokens=64, salt="s9"
        ).collect()
    }
    order = sorted(
        rows, key=lambda r: hashlib.md5(f"s9|{r[0]}".encode()).hexdigest()
    )
    cum = 0
    expected = {}
    for did, text in order:
        n = len(text.split(" "))
        expected[did] = (n, cum // 64, cum % 64)
        cum += n
    assert got == expected


def test_pack_bins_vs_python_oracle(spark):
    """Randomized corpora against an independent python next-fit
    reimplementation: md5(salt|id) order, per-hex-bucket next-fit with
    fresh state, bucket-offset sequence numbering. Includes oversize
    docs (longer than the whole budget → a sequence of their own)."""
    import hashlib
    import random

    from noaa_oracle_spark.pipeline.sampling import (
        pack_training_sequences_binned,
    )

    rnd = random.Random(29)
    rows = [
        (i, " ".join("t%d" % rnd.randint(0, 9) for _ in
                     range(rnd.choice([3, 10, 30, 60, 100]))))
        for i in range(300)
    ]
    budget = 64  # docs of 100 tokens are oversize on purpose
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.seq_id, r.start_offset)
        for r in pack_training_sequences_binned(
            df, budget_tokens=budget, salt="s4", bucket_hex_digits=1
        ).collect()
    }

    hashed = sorted(
        (hashlib.md5(f"s4|{d}".encode()).hexdigest(), d, t)
        for d, t in rows
    )
    per_bucket: dict[str, list] = {}
    for h, d, t in hashed:
        per_bucket.setdefault(h[0], []).append((d, len(t.split(" "))))
    expected = {}
    offset = 0
    for b in sorted(per_bucket):
        bin_id, fill = -1, budget + 1
        for did, n in per_bucket[b]:
            if fill + n <= budget:
                expected[did] = (n, offset + bin_id, fill)
                fill += n
            else:
                bin_id += 1
                expected[did] = (n, offset + bin_id, 0)
                fill = n
        offset += bin_id + 1
    assert got == expected
    # every sequence respects the budget unless it holds one oversize doc
    by_seq: dict[int, list] = {}
    for n, seq, off in got.values():
        by_seq.setdefault(seq, []).append((off, n))
    for seq, members in by_seq.items():
        total = sum(n for _, n in members)
        assert total <= budget or len(members) == 1


def test_pack_bins_validation(spark):
    from noaa_oracle_spark.pipeline.sampling import (
        pack_training_sequences_binned,
    )

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError, match="bucket_hex_digits"):
        pack_training_sequences_binned(df, 10, bucket_hex_digits=4)
    with pytest.raises(ValueError, match="positive"):
        pack_training_sequences_binned(df, 0)
