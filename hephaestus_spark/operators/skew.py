"""Skew-aware join helpers for 100 TB-scale execution.

The reference never joins large tables (its only join is a scalar
subquery lookup, /root/reference/internal/repository/task.go:137-140),
but the declared relational surface (SURVEY.md §2.B Q3/Q5/Q8) shuffles
big facts on their keys. At cluster scale a handful of hot keys (one
huge customer, one dominant event_type) can pin a whole stage on one
task. Two remedies, in preference order:

1. AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
   on by default in our session) — zero code, handles *sort-merge*
   skew by splitting oversized partitions at runtime.
2. Explicit key salting — needed when AQE can't help: aggregations on
   skewed keys, or joins whose skewed side feeds a stateful operator.
   The helpers below implement it as plain DataFrame ops so Catalyst
   still owns the physical plan.

Salting trades one shuffle for two smaller ones:
``salted_aggregate`` does partial agg on (key, salt) then final agg on
key — the classic two-level combine; ``salted_join`` replicates the
small side ``salt_n`` ways so a skewed fact key spreads over ``salt_n``
tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__hs_salt"


def with_salt(df: DataFrame, salt_n: int) -> DataFrame:
    """Uniform random salt in [0, salt_n). Deterministic alternative:
    pass your own column (e.g. pmod(hash(other_col), n)) when replays
    must be stable."""
    return df.withColumn(SALT_COL, (F.rand(seed=42) * salt_n).cast("int"))


def replicate(df: DataFrame, salt_n: int) -> DataFrame:
    """Explode the (small) build side salt_n ways so every salted
    probe partition finds its match locally."""
    salts = F.array([F.lit(i) for i in range(salt_n)])
    return df.withColumn(SALT_COL, F.explode(salts))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side,
    replicate the other side, join on (keys + salt).

    ``small`` is replicated salt_n× — keep it the dimension side. For
    two large skewed sides, split hot keys out (filter) and union a
    broadcast join of just those keys instead.
    """
    s = with_salt(skewed, salt_n)
    r = replicate(small, salt_n)
    out = s.join(r, on=on + [SALT_COL], how=how)
    return out.drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt_n: int = 8,
) -> DataFrame:
    """Two-level aggregation for skewed group keys.

    ``aggs`` maps output column name -> *first-level* aggregate
    expression. Only decomposable aggregates are supported; the second
    level re-combines: sum→sum, count→sum, min→min, max→max. (Spark's
    own partial aggregation usually makes this unnecessary — use it
    when a single group is so hot that even partial agg leaves one
    reducer with most of the data, e.g. after an explode.)
    """
    salted = with_salt(df, salt_n)
    first = salted.groupBy(*keys, SALT_COL).agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )
    recombine = []
    for name, expr in aggs.items():
        # sql rendering of the first-level agg tells us how to merge
        fn = str(expr).removeprefix("Column<'").split("(")[0].strip().lower()
        col = F.col(f"__p_{name}")
        if fn.startswith("count") or fn.startswith("sum"):
            merged = F.sum(col)
        elif fn.startswith("min"):
            merged = F.min(col)
        elif fn.startswith("max"):
            merged = F.max(col)
        else:
            raise ValueError(f"non-decomposable aggregate for {name!r}: {fn or expr}")
        recombine.append(merged.alias(name))
    return first.groupBy(*keys).agg(*recombine)


def hot_keys(df: DataFrame, keys: list[str], threshold_rows: int) -> DataFrame:
    """Diagnostic: keys whose row count exceeds ``threshold_rows`` —
    the candidates worth isolating into a broadcast side-join."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > threshold_rows)
    )
