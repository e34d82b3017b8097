"""Binned range (interval) join.

Spark plans a pure non-equi join — point-in-interval with no equality
key — as BroadcastNestedLoopJoin: every point row tested against every
interval, O(|P|x|I|), which is a non-starter at scale. The standard
fix is *binning*: quantize the value axis into fixed-width bins, emit
each interval once per bin it overlaps, map each point to its single
bin, equi-join on the bin id, and keep the exact predicate as a
residual filter.

Cost becomes O(|P| + |I| x avg_bins_per_interval + candidates): a plain
shuffle equi-join whose fan-out is controlled by ``bin_width`` (pick it
near the typical interval width so each interval lands in 1–2 bins).
No duplicate pairs are produced — a point lives in exactly one bin and
an interval appears at most once per bin — so no dedup pass is needed.

Reference parity: no counterpart in /root/reference; this is the scale
path for Q8-style inequality joins when there is no equi-key prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join points to intervals with ``lo <= point < hi``.

    Column names must be disjoint between the two inputs (rename
    upstream). Output = point columns + interval columns, one row per
    qualifying (point, interval) pair."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    pb = points.withColumn("_bin", F.floor(F.col(point_col) / F.lit(bin_width)))
    ib = (
        intervals.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / F.lit(bin_width)),
                    F.floor(F.col(hi_col) / F.lit(bin_width)),
                )
            ),
        )
    )
    return (
        pb.join(ib, "_bin")
        .filter(
            (F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bin")
    )
