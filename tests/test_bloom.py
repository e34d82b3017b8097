"""Bloom-filter semi-join pruning (operators/bloomjoin.py).

The filter is probabilistic, but its contract is exact and checkable:
- NO false negatives: the pruned fact is a superset of the true
  semi-join (a single miss would make downstream joins silently wrong);
- it actually prunes (non-matching keys mostly rejected at fpp=1%);
- the composed query (prune -> exact join) equals the plain join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import hephaestus_spark.queries  # noqa: F401 — registration
from hephaestus_spark.operators.bloomjoin import bloom_params, bloom_prune
from hephaestus_spark.registry import QUERIES
from hephaestus_spark.sources import load_table


def test_bloom_params_standard_calculus():
    n_bits, n_hashes = bloom_params(10_000, fpp=0.01)
    # ~9.59 bits/key, k=7 at 1% (standard Bloom sizing)
    assert 9 * 10_000 <= n_bits <= 10 * 10_000
    assert n_hashes == 7


def test_bloom_prune_no_false_negatives(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 5 == 0)
        .select("p_partkey")
    )
    pruned = bloom_prune(li, keys, "l_partkey", "p_partkey", expected_keys=500)
    true_semi = li.join(
        keys, li.l_partkey == keys.p_partkey, "left_semi"
    )
    # every true match survives the prune
    missing = true_semi.exceptAll(
        pruned.join(keys, pruned.l_partkey == keys.p_partkey, "left_semi")
    )
    assert missing.count() == 0


def test_bloom_prune_actually_prunes(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 5 == 0)
        .select("p_partkey")
    )
    total = li.count()
    true_matches = li.join(keys, li.l_partkey == keys.p_partkey, "left_semi").count()
    pruned_n = bloom_prune(
        li, keys, "l_partkey", "p_partkey", expected_keys=500, fpp=0.01
    ).count()
    # superset of matches, but false positives bounded well below the
    # non-matching population (loose 10x-fpp bound to stay flake-free)
    assert pruned_n >= true_matches
    assert pruned_n - true_matches <= max(50, 0.1 * (total - true_matches))


def test_bloom_query_equals_plain_join(spark, sf_dir):
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            # decimal-exact like the registered query (r4 discipline)
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    bloomed = (
        QUERIES["x_bloom_prune_join"](spark, sf_dir)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    assert bloomed.equals(plain)


def test_bloom_prune_empty_keyset_prunes_everything(spark, sf_dir):
    # empty dim -> empty word map -> every probe misses (element_at on
    # an empty/null map coalesces to 0) -> semi-join-equivalent: empty
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 0)
        .select("p_partkey")
    )
    assert bloom_prune(li, keys, "l_partkey", "p_partkey", expected_keys=10).count() == 0
