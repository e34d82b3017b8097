"""SimHash lane-packing guard (VERDICT r5 item 4).

The packed implementation carries 3 per-bit counters in each 64-bit sum
as 21-bit lanes — exact up to 2^21 - 1 tokens/doc (worst-case column
sum is exactly 2^63 - 1), with deterministic slice() truncation beyond.
The r4 16-bit x 4 packing actually overflowed the signed top lane at
~32k tokens (ANSI ARITHMETIC_OVERFLOW); these tests pin the fixed
geometry against an unpacked 64-sum-column reference that is slow but
trivially correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hephaestus_spark.operators.textops import (
    _SIMHASH_MAX_TOKENS,
    simhash_signatures,
    tokens,
)


def _unpacked_simhash(docs, max_tokens=_SIMHASH_MAX_TOKENS):
    """Straightforward per-bit reference: 64 independent long sums."""
    toks = docs.select(
        "doc_id",
        F.explode(F.slice(tokens("text"), 1, max_tokens)).alias("token"),
    ).withColumn("h", F.xxhash64("token"))
    bits = [
        F.sum(F.expr(f"(h >> {i}) & 1")).alias(f"c{i}") for i in range(64)
    ]
    votes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"), *bits)
    sig = F.lit(0).cast("bigint")
    for i in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"c{i}") * 2 > F.col("n_tok"),
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {i})"),
            ).otherwise(F.lit(0).cast("bigint"))
        )
    return votes.select("doc_id", "n_tok", sig.alias("simhash"))


def _mega_corpus(spark):
    # ~70,600 tokens: overflowed the r4 16-bit packing (signed top lane
    # corrupts past ~32k tokens); must be exact under the 21-bit lanes.
    words = " ".join(f"tok{i % 997} w{i % 31}" for i in range(35_300))
    return spark.createDataFrame(
        [(1, words), (2, "short doc with a handful of tokens only")],
        "doc_id long, text string",
    )


def test_packed_matches_unpacked_on_mega_doc(spark):
    docs = _mega_corpus(spark)
    packed = {
        r.doc_id: (r.n_tok, r.simhash) for r in simhash_signatures(docs).collect()
    }
    ref = {
        r.doc_id: (r.n_tok, r.simhash) for r in _unpacked_simhash(docs).collect()
    }
    assert packed == ref
    assert packed[1][0] == 70_600  # under the 2M cap: nothing truncated


def test_truncation_is_prefix_semantics(spark):
    """Beyond max_tokens a doc's signature equals the signature of its
    first max_tokens tokens as an ordinary document — truncation, never
    corruption. (Exercised with a small cap; the default cap's lane
    exactness is proven by the worst-case bound, asserted above.)"""
    docs = _mega_corpus(spark).filter(F.col("doc_id") == 1)
    cap = 1_000
    prefix_text = docs.select(
        F.concat_ws(" ", F.slice(tokens("text"), 1, cap)).alias("text")
    ).collect()[0].text
    prefix = docs.sparkSession.createDataFrame(
        [(1, prefix_text)], "doc_id long, text string"
    )
    a = simhash_signatures(docs, max_tokens=cap).collect()[0]
    b = simhash_signatures(prefix).collect()[0]
    assert a.n_tok == cap
    assert (a.n_tok, a.simhash) == (b.n_tok, b.simhash)


def test_max_tokens_validation():
    with pytest.raises(ValueError):
        simhash_signatures(None, max_tokens=_SIMHASH_MAX_TOKENS + 1)
    with pytest.raises(ValueError):
        simhash_signatures(None, max_tokens=0)



def test_portable_hash_family_agrees_with_driver_reference(spark):
    """r15: the md5-derived portable hash (queries/dedup.py _md5_h64)
    must equal Python's own md5-first-16-hex-chars interpretation —
    the cross-engine contract the portable oracles rely on."""
    import hashlib

    from pyspark.sql import functions as F

    from hephaestus_spark.queries.dedup import _md5_h64

    words = ["hello", "world", "a", "zebra", "mixedCase"]
    sdf = spark.createDataFrame([(w,) for w in words], "token string")
    got = {
        r.token: r.h64
        for r in sdf.select(
            "token", F.expr(_md5_h64("token")).alias("h64")
        ).collect()
    }
    for w in words:
        u = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
        expect = u - (1 << 64) if u >= 1 << 63 else u
        assert got[w] == expect, w
