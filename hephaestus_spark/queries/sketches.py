"""Sketches: SURVEY.md §2.B Q26 — approximate aggregates.

No oracle entry (BASELINE.md: Q26 is tolerance-checked, not
hash-matched — sketch outputs are approximate by construction). The
local test suite asserts <= 5% error against DuckDB's exact values;
the driver records a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hephaestus_spark.registry import query
from hephaestus_spark.sources import load_table


@query("q26_sketches")
def q26_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct count + GK quantile sketch on lineitem. Both are
    mergeable sketches: partial sketches combine across partitions, so
    the shuffle carries one sketch per partition — the only way exact-ish
    distinct/quantile stats are affordable on a 100 TB fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx(
            "l_extendedprice", [0.5, 0.9, 0.99], 10000
        ).alias("price_quantiles"),
    ).select(
        "approx_parts",
        F.col("price_quantiles")[0].alias("p50"),
        F.col("price_quantiles")[1].alias("p90"),
        F.col("price_quantiles")[2].alias("p99"),
    )


@query("q26_sketch_by_group")
def q26_sketch_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sketch variant (per returnflag)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
    )
