"""Q26 tolerance check: sketches within 5% of DuckDB exact values
(BASELINE.md comparison discipline for approx operators)."""

from __future__ import annotations

import hephaestus_spark.queries  # noqa: F401
from hephaestus_spark.registry import QUERIES


def test_sketches_within_tolerance(spark, oracle, sf_dir):
    row = QUERIES["q26_sketches"](spark, sf_dir).first()
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

    assert within(row["approx_parts"], exact[0]), (row["approx_parts"], exact[0])
    assert within(row["p50"], exact[1]), (row["p50"], exact[1])
    assert within(row["p90"], exact[2]), (row["p90"], exact[2])
    assert within(row["p99"], exact[3]), (row["p99"], exact[3])
