"""x_simhash_pairs: the banded Hamming join must be EXACTLY equivalent
to brute-force all-pairs Hamming at distance <= 3 (pigeonhole: <= 3
differing bits leave at least one of 4 16-bit bands identical)."""

from __future__ import annotations

from pyspark.sql import functions as F

import hephaestus_spark.queries  # noqa: F401 — registration
from hephaestus_spark.operators.textops import simhash_signatures
from hephaestus_spark.queries.dedup import _near_corpus
from hephaestus_spark.registry import QUERIES


def test_banded_equals_brute_force(spark, sf_dir):
    out = {
        (r.id_a, r.id_b, r.hamming)
        for r in QUERIES["x_simhash_pairs"](spark, sf_dir).collect()
    }
    sig = simhash_signatures(_near_corpus(spark, sf_dir)).select(
        "doc_id", "simhash"
    )
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert out == brute
    assert brute  # non-trivial: the synthesized near-corpus has close pairs


def test_exact_duplicates_at_distance_zero(spark, sf_dir):
    """q32-style exact copies hash to identical signatures."""
    from hephaestus_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    sig = simhash_signatures(d.union(dup)).select("doc_id", "simhash")
    by_id = {r.doc_id: r.simhash for r in sig.collect()}
    for v in [k for k in by_id if k >= 1000000]:
        assert by_id[v] == by_id[v - 1000000]
