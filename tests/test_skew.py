"""Skew helpers: salted join/aggregate must be result-identical to the
plain versions — salting only changes the physical distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from hephaestus_spark.operators import skew


def _skewed_fact(spark):
    # one hot key (90% of rows) + a long tail — the shape that pins a task
    hot = spark.range(900).select(
        F.lit(1).alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(100).select(
        (F.col("id") % 10 + 2).alias("k"), F.col("id").cast("double").alias("v")
    )
    return hot.unionByName(tail)


def test_salted_join_matches_plain(spark):
    fact = _skewed_fact(spark)
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 12)], "k bigint, name string"
    )
    plain = fact.join(dim, "k").groupBy("k", "name").count()
    salted = skew.salted_join(fact, dim, ["k"], salt_n=4).groupBy("k", "name").count()
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_left_keeps_unmatched(spark):
    fact = _skewed_fact(spark)
    dim = spark.createDataFrame([(1, "one")], "k bigint, name string")
    out = skew.salted_join(fact, dim, ["k"], salt_n=3, how="left")
    assert out.count() == fact.count()
    assert out.filter(F.col("name").isNull()).count() == 100  # tail unmatched


def test_salted_aggregate_matches_plain(spark):
    fact = _skewed_fact(spark)
    plain = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in fact.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in skew.salted_aggregate(
            fact,
            ["k"],
            {"n": F.count("*"), "s": F.sum("v"), "mx": F.max("v")},
            salt_n=4,
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_rejects_non_decomposable(spark):
    fact = _skewed_fact(spark)
    try:
        skew.salted_aggregate(fact, ["k"], {"a": F.avg("v")})
    except ValueError as e:
        assert "non-decomposable" in str(e)
    else:
        raise AssertionError("avg must be rejected (needs sum+count split)")


def test_hot_keys_diagnostic(spark):
    fact = _skewed_fact(spark)
    hot = skew.hot_keys(fact, ["k"], threshold_rows=100).collect()
    assert [r["k"] for r in hot] == [1] and hot[0]["n_rows"] == 900
