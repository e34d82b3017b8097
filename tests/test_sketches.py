"""Q26 tolerance discipline: sketches within 5% of exact values
(BASELINE.md comparison discipline for approx operators).

Two layers: the registered queries' in-query audit booleans (what the
driver hash-checks against the oracle's TRUE literals) must all be
true, and a direct raw-sketch-vs-DuckDB-exact comparison preserves the
original cross-engine tolerance check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import hephaestus_spark.queries  # noqa: F401
from hephaestus_spark.registry import QUERIES
from hephaestus_spark.sources import load_table


def test_sketch_audit_booleans_all_true(spark, oracle, sf_dir):
    row = QUERIES["q26_sketches"](spark, sf_dir).first()
    assert row["parts_within_5pct"] and row["p50_within_5pct"]
    assert row["p90_within_5pct"] and row["p99_within_5pct"]
    exact = oracle.execute(
        "SELECT count(DISTINCT l_partkey) FROM lineitem"
    ).fetchone()[0]
    assert row["exact_parts"] == exact
    for r in QUERIES["q26_sketch_by_group"](spark, sf_dir).collect():
        assert r["parts_within_5pct"] and r["p50_within_5pct"], r


def test_raw_sketches_within_tolerance(spark, oracle, sf_dir):
    row = (
        load_table(spark, sf_dir, "lineitem")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("nd"),
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.9, 0.99], 10000
            ).alias("pq"),
        )
        .first()
    )
    exact = oracle.execute(
        """
        SELECT count(DISTINCT l_partkey) AS nd,
               quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.9) AS p90,
               quantile_cont(l_extendedprice, 0.99) AS p99
        FROM lineitem
        """
    ).fetchone()

    def within(approx, truth, tol=0.05):
        return abs(approx - truth) <= tol * abs(truth)

    assert within(row["nd"], exact[0]), (row["nd"], exact[0])
    for i, name in enumerate(["p50", "p90", "p99"]):
        assert within(float(row["pq"][i]), float(exact[i + 1])), name
