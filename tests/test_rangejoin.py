"""Binned range join: equivalence to the naive plan, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import hephaestus_spark.queries  # noqa: F401 — registration
from hephaestus_spark.operators.rangejoin import bin_range_join
from hephaestus_spark.registry import QUERIES


def _inputs(spark):
    pts = spark.createDataFrame(
        [(1, 0.5), (2, 3.0), (3, 9.99), (4, -1.2), (5, 100.0)],
        "pid bigint, v double",
    )
    ivs = spark.createDataFrame(
        [
            (10, 0.0, 1.0),    # catches v=0.5
            (11, 0.5, 3.5),    # catches 0.5 and 3.0 (spans bins)
            (12, 9.99, 10.0),  # lo-inclusive boundary
            (13, 3.0, 3.0),    # empty interval
            (14, -2.0, -1.0),  # negative axis
        ],
        "iid bigint, lo double, hi double",
    )
    return pts, ivs


def test_equivalence_to_naive_join(spark):
    pts, ivs = _inputs(spark)
    binned = bin_range_join(pts, ivs, "v", "lo", "hi", bin_width=1.0)
    naive = pts.join(
        ivs, (F.col("lo") <= F.col("v")) & (F.col("v") < F.col("hi"))
    )
    got = sorted((r.pid, r.iid) for r in binned.collect())
    want = sorted((r.pid, r.iid) for r in naive.collect())
    assert got == want
    assert (1, 10) in got and (1, 11) in got and (2, 11) in got
    assert (3, 12) in got          # lo boundary is inclusive
    assert (4, 14) in got          # negative bins (floor, not trunc)
    assert all(i != 13 for _, i in got)  # empty interval matches nothing
    # no duplicate pairs without any dedup step
    assert len(got) == len(set(got))


def test_no_nested_loop_in_plan(spark, sf_dir):
    df = QUERIES["x_range_join_binned"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bad_bin_width(spark):
    pts, ivs = _inputs(spark)
    with pytest.raises(ValueError):
        bin_range_join(pts, ivs, "v", "lo", "hi", bin_width=0)
