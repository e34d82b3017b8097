"""Chunking and deterministic-sampling operator semantics."""

from __future__ import annotations

import pytest

from hephaestus_spark.operators.curation import chunk_by_tokens, hash_sample


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(100))),  # 100 toks → 3 chunks
            (2, "a b c"),                                # short → 1 chunk
            (3, ""),                                     # empty → 1 chunk
            (4, " ".join(f"t{i}" for i in range(50))),   # exactly one window
        ],
        "doc_id bigint, text string",
    )


def test_chunk_windows_and_overlap(spark):
    out = chunk_by_tokens(_docs(spark), "text", chunk_size=50, overlap=10)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # 100 tokens, stride 40: chunks at 0..49, 40..89, 80..99
    assert [rows[(1, i)].chunk_tokens for i in range(3)] == [50, 50, 20]
    c0, c1 = rows[(1, 0)].chunk_text.split(), rows[(1, 1)].chunk_text.split()
    assert c0[40:] == c1[:10]  # 10-token overlap is verbatim
    assert rows[(2, 0)].chunk_text == "a b c"
    assert rows[(4, 0)].chunk_tokens == 50 and (4, 1) not in rows
    assert (3, 0) in rows  # empty doc still yields one (degenerate) chunk


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_by_tokens(_docs(spark), "text", chunk_size=10, overlap=10)


def test_hash_sample_deterministic_and_proportional(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in hash_sample(df, "k", 0.1).collect())
    b = sorted(r.k for r in hash_sample(df, "k", 0.1).collect())
    assert a == b
    assert 800 <= len(a) <= 1200  # ~10%
    # nested property: a 5% sample is a subset of the 10% sample
    small = set(r.k for r in hash_sample(df, "k", 0.05).collect())
    assert small <= set(a)


def test_hash_sample_stratified(spark):
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = hash_sample(df, "k", 0.2, by={"en": 0.02}, strata_col="lang")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert counts["en"] < counts["de"]
    assert 40 <= counts["en"] <= 180      # ~2% of 5000
    assert 800 <= counts["de"] <= 1200    # ~20% of 5000


def test_hash_sample_handles_negative_and_huge_keys(spark):
    from pyspark.sql import functions as F

    # Negative keys and keys past 2^31 must sample ~fraction, not 100%
    # (a plain % goes negative for negative keys; a naive product
    # overflows int64 above ~3.4e9).
    df = spark.range(10_000).select(
        (F.col("id") - 5_000).alias("neg"),
        (F.col("id") + F.lit(5_000_000_000)).alias("big"),
        (F.col("id") * F.lit(922_337_200_000_000)).alias("huge"),
    )
    for col in ["neg", "big", "huge"]:
        n = hash_sample(df.select(F.col(col).alias("k")), "k", 0.1).count()
        assert 700 <= n <= 1300, (col, n)
