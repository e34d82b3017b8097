"""As-of (point-in-time) join, expressed Spark-first.

For each left row, attach the most recent right row with the same key
and ``right.ts <= left.ts`` (backward as-of, the kdb/Pandas/DuckDB
``ASOF JOIN`` semantics). Spark has no built-in as-of join; the naive
encoding — an equi-join with a range predicate plus a per-left-row
``row_number`` — materializes every (left, candidate) pair before
pruning, which is O(events x orders-per-key) and explodes at scale.

The scalable expression is a *union merge*: tag both sides, union them,
and within each key carry the last-seen right payload forward with
``last(..., ignorenulls=True)`` over an ordered window. One shuffle on
the key, strictly linear in total rows, no pairwise blow-up — the same
plan shape survives 100 TB because the window is per-key sequential and
keys partition freely across executors.

Determinism: right rows tying on timestamp are ordered by an explicit
``tiebreak`` column list, so "the" most recent row is well-defined. The
payload travels as ONE struct column so every output column comes from
the same right row even when the right side has NULLs in some payload
columns.

Reference parity: /root/reference has no as-of join (its only join is
the scalar-subquery executor lookup, internal/repository/task.go:137-140);
this is a north-star training-data-pipeline operator (feature lookup /
snapshot alignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tiebreak: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join.

    ``on``        — [(left_key, right_key), ...] equi-key pairs.
    ``payload``   — {output_name: right_column} columns to attach.
    ``tiebreak``  — right columns ordering equal-timestamp right rows
                    ascending; the LAST one wins (max tuple). Defaults
                    to the payload source columns.
    ``tolerance_seconds`` — if set, a match older than this many seconds
                    before ``left_ts`` is nulled out (Pandas
                    ``merge_asof(tolerance=...)`` semantics).

    Output schema: every left column, plus the payload columns.

    r16 (guide §2.3 shuffle fewer bytes): every non-key byte a row
    carries crosses the one exchange AND feeds the window sort, so the
    merged row holds each fact exactly once. (a) tiebreak values ride
    INSIDE the payload struct — a tiebreak that is also a payload
    column (the common case: x_asof_join breaks ties on o_orderkey,
    which it also emits) previously shuffled twice, once as ``_tbN``
    and once in ``_pay``; ordering by the struct field is identical
    (left rows have a NULL struct, whose field access is NULL — the
    same asc_nulls_first slot the old NULL ``_tbN`` filled). (b) the
    right timestamp ``_rts`` is carried only when ``tolerance_seconds``
    asks for it — without a tolerance it duplicated ``_ats`` on every
    right row. Measured at sf0.1: x_asof_join's exchange 6.3 -> 4.5 MB,
    output bit-identical (oracle + test_asof).
    """
    keys = [lc for lc, _ in on]
    carry = [c for c in left.columns if c not in keys and c != left_ts]
    tiebreak = tiebreak or list(payload.values())

    # payload fields: declared outputs, then any tiebreak column not
    # already present (hidden `_tb*` fields), then _rts if needed.
    rc_to_field = {rc: name for name, rc in payload.items()}
    tb_fields: list[str] = []
    extra_fields: list[Column] = []
    for i, t in enumerate(tiebreak):
        if t in rc_to_field:
            tb_fields.append(rc_to_field[t])
        else:
            tb_fields.append(f"_tb{i}")
            extra_fields.append(F.col(t).alias(f"_tb{i}"))
    if tolerance_seconds is not None:
        extra_fields.append(
            F.col(right_ts).cast("timestamp_ntz").alias("_rts")
        )
    pay_struct = F.struct(
        *[F.col(rc).alias(name) for name, rc in payload.items()],
        *extra_fields,
    )
    null_pay: Column = F.lit(None)

    lu = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).cast("timestamp_ntz").alias("_ats"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in carry],
        null_pay.alias("_pay"),
    )
    ru = right.select(
        *[F.col(rc).alias(lc) for lc, rc in on],
        F.col(right_ts).cast("timestamp_ntz").alias("_ats"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry],
        pay_struct.alias("_pay"),
    )
    # null _pay must cast to the struct type; unionByName reconciles it.
    lu = lu.withColumn("_pay", F.col("_pay").cast(ru.schema["_pay"].dataType))

    order = [
        F.col("_ats").asc(),
        F.col("_tag").asc(),
        *[F.col(f"_pay.{f}").asc_nulls_first() for f in tb_fields],
    ]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = (
        lu.unionByName(ru)
        .withColumn("_match", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if tolerance_seconds is not None:
        # timestamp_ntz has no direct long cast; hop via timestamp —
        # the session TZ is pinned UTC (session.py) so this is stable.
        age = F.col("_ats").cast("timestamp").cast("long") - F.col(
            "_match._rts"
        ).cast("timestamp").cast("long")
        in_range = age <= F.lit(int(tolerance_seconds))
        merged = merged.withColumn(
            "_match", F.when(in_range, F.col("_match"))
        )
    return merged.select(
        *[F.col(k) for k in keys],
        F.col("_ats").alias(left_ts),
        *[F.col(c) for c in carry],
        *[F.col(f"_match.{name}").alias(name) for name in payload],
    )
