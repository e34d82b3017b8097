"""Custom stateful streaming operators (applyInPandasWithState).

The reference keeps exactly one piece of custom per-stream state: the
content hash of the last upstream feed, used to skip unchanged data
(P1 — ``lastKnownHash``, /root/reference/internal/services/employees/
employees.go:26,88-101 and tasks/tasks.go:24,141-152). That state is
process-global because the reference is single-stream; at scale the
same idea is *keyed* — one hash per entity — which is exactly what
Spark's ``applyInPandasWithState`` gives us: partitioned, fault-
tolerant, checkpointed state with timeout-based eviction.

Two operators:

- ``changed_rows_stream``: per-key content-hash handshake. Emits a row
  only when the key's content hash differs from the hash in state —
  the streaming analogue of A10's skip-if-identical, pushed upstream
  of the sink so unchanged entities never reach the merge at all.
- ``session_stats_stream``: per-user session accumulator with an idle
  timeout — the custom-stateful generalization of Q27's
  ``session_window`` (emits when the gap expires rather than at
  watermark), demonstrating timeout-driven emission.

Both operators shuffle once on the grouping key and hold O(distinct
keys) state per partition — the state store scales horizontally with
executors, which is the 100 TB story: no driver-side state, no global
coordination.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

CHANGED_STATE_SCHEMA = "last_hash string"


def _row_hash(df: pd.DataFrame, cols: list[str]) -> pd.Series:
    joined = df[cols].astype("string").fillna("\x00").agg("\x1f".join, axis=1)
    return joined.map(lambda s: hashlib.sha256(s.encode()).hexdigest())


def changed_rows_stream(df: DataFrame, key: str, compare_cols: list[str]) -> DataFrame:
    """Keyed hash handshake: pass through only rows whose content hash
    differs from the stored per-key hash (first sight always emits).

    Input must be a streaming DataFrame; grouping shuffles on ``key``.
    Output schema = key + compare_cols + ``change`` ('new'|'changed').
    """
    out_schema = T.StructType(
        [df.schema[key]]
        + [df.schema[c] for c in compare_cols]
        + [T.StructField("change", T.StringType())]
    )

    def fn(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last_hash,) = state.get if state.exists else (None,)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_index()
            hashes = _row_hash(pdf, compare_cols)
            for i in range(len(pdf)):
                h = hashes.iloc[i]
                if h == last_hash:
                    continue  # P1: unchanged — skip all downstream work
                row = pdf.iloc[[i]][[key] + compare_cols].copy()
                row["change"] = "new" if last_hash is None else "changed"
                out.append(row)
                last_hash = h
        state.update((last_hash,))
        if out:
            yield pd.concat(out, ignore_index=True)

    return (
        df.groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=CHANGED_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# session bounds kept in MICROseconds since epoch: the events table
# carries microsecond timestamps and the oracle compares them exactly.
# sum kept in integer CENTS: event values are exact 2dp decimals, so
# round(v*100) is an exact int and the accumulation is order-independent
# — bit-identical to the oracle's cents sum no matter how batches or
# engines order the adds (the q14/q19/q34 cross-engine discipline).
SESSION_STATE_SCHEMA = (
    "start_us long, last_us long, n_events long, sum_cents long"
)
SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def session_stats_stream(
    df: DataFrame, gap_ms: int = 30 * 60 * 1000
) -> DataFrame:
    """Per-user session aggregation with idle-timeout emission.

    Expects streaming input with columns (user_id long, ts timestamp,
    value double) and an event-time watermark already applied (the
    state timeout is keyed off the watermark). A session closes —
    and its single summary row is emitted — when no event arrives
    within ``gap_ms`` of the last one (Q27 session_window semantics,
    but emitted by timeout instead of at query end).
    """

    def fn(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key_tuple

        def emit():
            start_us, last_us, n, sv = state.get
            state.remove()
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [sv / 100.0],
                }
            )

        if state.hasTimedOut:
            yield emit()
            return

        gap_us = gap_ms * 1000
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1_000).tolist()
        # exact 2dp values -> exact integer cents (never near a .5
        # rounding midpoint, so Python/DuckDB rounding modes agree)
        vals = [int(round(v * 100)) for v in rows["value"].astype(float)]
        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us, last_us, n, sv = ts_us[0], ts_us[0], 0, 0
        out = []
        for t, v in zip(ts_us, vals):
            # >= : sessions are half-open [start, last+gap) — an event
            # exactly gap after the last starts a NEW session, matching
            # F.session_window (see queries/streaming_q.py q27 oracle)
            if n > 0 and t - last_us >= gap_us:
                state.update((start_us, last_us, n, sv))
                out.append(emit())
                start_us, n, sv = t, 0, 0
            last_us = max(last_us, t)
            n += 1
            sv += v
        state.update((start_us, last_us, n, sv))
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        for o in out:
            yield o

    return df.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
