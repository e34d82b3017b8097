"""As-of join operator semantics on tiny inline frames.

Covers the contract edges the oracle query can't isolate: timestamp
ties broken by the tiebreak column, left rows with no earlier right row
(NULL payload), backward-inclusive matching (right.ts == left.ts
matches), tolerance nulling stale matches, and row-consistency of the
payload (all output columns from the SAME right row even when some
payload values are NULL).
"""

from __future__ import annotations

import datetime as dt

from hephaestus_spark.operators.asof import asof_join_backward


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-05 00:00:00"), "e1"),   # after two rights
            (1, _ts("2024-01-01 00:00:00"), "e2"),   # exact tie with right ts
            (2, _ts("2024-01-02 00:00:00"), "e3"),   # key with no right rows
            (3, _ts("2024-01-01 00:00:00"), "e4"),   # before the only right
        ],
        "k int, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 10, 1.0),
            (1, _ts("2024-01-01 00:00:00"), 11, None),  # tie: higher id wins
            (1, _ts("2024-01-03 00:00:00"), 12, 3.0),
            (3, _ts("2024-01-02 00:00:00"), 30, 9.0),
        ],
        "rk int, rts timestamp_ntz, rid int, rv double",
    )
    return left, right


def _run(spark, **kw):
    left, right = _frames(spark)
    out = asof_join_backward(
        left,
        right,
        on=[("k", "rk")],
        left_ts="ts",
        right_ts="rts",
        payload={"rid": "rid", "rv": "rv"},
        tiebreak=["rid"],
        **kw,
    )
    return {r["tag"]: r.asDict() for r in out.collect()}


def test_backward_pick_tie_and_misses(spark):
    rows = _run(spark)
    assert rows["e1"]["rid"] == 12 and rows["e1"]["rv"] == 3.0
    # tie at identical ts: max tiebreak wins, and rv comes from THAT row
    # (NULL) — not from the earlier row whose rv is non-NULL.
    assert rows["e2"]["rid"] == 11 and rows["e2"]["rv"] is None
    assert rows["e3"]["rid"] is None and rows["e3"]["rv"] is None
    assert rows["e4"]["rid"] is None  # right row is later than left ts


def test_tolerance_nulls_stale_matches(spark):
    rows = _run(spark, tolerance_seconds=3 * 24 * 3600)
    assert rows["e1"]["rid"] == 12  # 2-day-old match within 3-day tolerance
    rows_tight = _run(spark, tolerance_seconds=3600)
    assert rows_tight["e1"]["rid"] is None  # match now too old
    assert rows_tight["e2"]["rid"] == 11  # zero-age match survives


def test_output_schema_is_left_plus_payload(spark):
    left, right = _frames(spark)
    out = asof_join_backward(
        left,
        right,
        on=[("k", "rk")],
        left_ts="ts",
        right_ts="rts",
        payload={"rid": "rid"},
        tiebreak=["rid"],
    )
    assert out.columns == ["k", "ts", "tag", "rid"]
    assert out.count() == 4
