"""Sketches: SURVEY.md §2.B Q26 — approximate aggregates.

Approximate outputs can't hash-match another engine, but the CHECK can:
each query computes its own exact value alongside the sketch IN THE
SAME AGGREGATION and emits `abs(approx - exact)/exact <= 0.05` as a
boolean (plus the engine-independent exact count). The DuckDB oracle
emits the same exact values with literal TRUEs — so the driver's hash
comparison passes iff every sketch landed within tolerance. Sketch
algorithms (HLL++, GK) are deterministic for fixed data, so this is a
stable check, not a flaky one.

The exact companion aggregates exist only for the audit; at 100 TB
you'd run the sketch alone — that's the point of it being mergeable
(partial sketches combine across partitions; the shuffle carries one
sketch per partition instead of the raw column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hephaestus_spark.registry import query
from hephaestus_spark.sources import load_table


def _within(approx: Column, exact: Column, tol: float = 0.05) -> Column:
    return F.abs(approx.cast("double") - exact.cast("double")) <= tol * F.abs(
        exact.cast("double")
    )


@query(
    "q26_sketches",
    oracle="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS parts_within_5pct,
           true AS p50_within_5pct,
           true AS p90_within_5pct,
           true AS p99_within_5pct
    FROM lineitem
    """,
)
def q26_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct count (rsd 1% — 5% tolerance is then a 5-sigma
    bound) + GK quantile sketch on lineitem, audited in-query against
    the exact aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("pq"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").alias("pe"),
    )
    return agg.select(
        F.col("exact_parts").cast("bigint").alias("exact_parts"),
        _within(F.col("approx_parts"), F.col("exact_parts")).alias("parts_within_5pct"),
        _within(F.col("pq")[0], F.col("pe")[0]).alias("p50_within_5pct"),
        _within(F.col("pq")[1], F.col("pe")[1]).alias("p90_within_5pct"),
        _within(F.col("pq")[2], F.col("pe")[2]).alias("p99_within_5pct"),
    )


@query(
    "q26_sketch_by_group",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS parts_within_5pct,
           true AS p50_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q26_sketch_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sketch variant (per returnflag), same in-query audit."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.expr("percentile(l_extendedprice, 0.5D)").alias("p50e"),
    )
    return agg.select(
        "l_returnflag",
        F.col("exact_parts").cast("bigint").alias("exact_parts"),
        _within(F.col("approx_parts"), F.col("exact_parts")).alias("parts_within_5pct"),
        _within(F.col("p50"), F.col("p50e")).alias("p50_within_5pct"),
    )
