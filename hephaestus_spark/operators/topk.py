"""Scalable per-group top-k.

A window `row_number() OVER (PARTITION BY g ORDER BY …) <= k` puts one
task per group value: fine when groups are plentiful (users, orderkeys),
a scale bomb when the group column has low cardinality (languages,
statuses) — each group's ENTIRE row set sorts in a single task.

``topk_per_group`` runs the exact same contract in two phases:
  1. bucket phase — salt each group into ``salt_n`` buckets by a hash of
     the tiebreak columns, take top-k per (group, bucket);
  2. final phase — top-k per group over the ≤ salt_n·k survivors.

Exactness: every row in the true global top-k of its group is also in
the top-k of its own bucket (the bucket is a subset, same total order),
so phase 1 never discards a winner. Requires a deterministic total
order (include tiebreak columns), which the oracle discipline demands
anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_n: int = 32,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group under a deterministic total order.

    ``order_cols``: ordered Column expressions incl. tiebreaks (e.g.
    ``[F.col('n').desc(), F.col('token').asc()]``). Output carries the
    final 1-based ``rank_col``."""
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_n))
    w1 = W.partitionBy(*group_cols, "_bkt").orderBy(*order_cols)
    survivors = (
        df.withColumn("_bkt", bucket)
        .withColumn("_brn", F.row_number().over(w1))
        .filter(F.col("_brn") <= k)
        .drop("_bkt", "_brn")
    )
    w2 = W.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
