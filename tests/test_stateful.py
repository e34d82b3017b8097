"""Custom stateful operators (applyInPandasWithState).

changed_rows_stream: per-key hash handshake (P1/A10) — only new or
changed entity versions pass; re-sent identical rows are suppressed
across micro-batches (state survives batch boundaries).

session_stats_stream: idle-gap session accumulator with event-time
timeout emission.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from hephaestus_spark.streaming.stateful import (
    changed_rows_stream,
    session_stats_stream,
)


def _feed(spark, feed_dir, rows, schema, idx):
    df = spark.createDataFrame(rows, schema)
    tmp = os.path.join(feed_dir, f"_stage{idx}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part), os.path.join(feed_dir, f"{idx:05d}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def test_changed_rows_handshake(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)
    schema = "id long, fullname string, position string"
    # batch 0: two employees; batch 1: one identical (suppressed),
    # one changed, one brand new
    _feed(spark, feed, [(1, "Ann", "dev"), (2, "Bob", "ops")], schema, 0)
    _feed(spark, feed, [(1, "Ann", "dev"), (2, "Bob", "sre"), (3, "Cy", "qa")], schema, 1)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed)
    )
    out = changed_rows_stream(stream, "id", ["fullname", "position"])
    q = (
        out.writeStream.format("memory")
        .queryName("handshake_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r["id"], r["change"]): r for r in spark.sql("SELECT * FROM handshake_out").collect()}
    # 1 appears once (second send identical -> suppressed by state)
    assert set(rows) == {(1, "new"), (2, "new"), (2, "changed"), (3, "new")}
    assert rows[(2, "changed")]["position"] == "sre"


def test_session_stats_timeout_emission(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)
    schema = "user_id long, ts timestamp, value double"
    from datetime import datetime as DT

    t0 = DT(2024, 1, 1, 10, 0, 0)

    def at(m, s=0):
        return t0.replace(minute=m, second=s)

    # user 7: two events 5 min apart (one session), then nothing.
    # user 8: events 40 min apart -> two sessions (gap 30m).
    _feed(
        spark, feed,
        [(7, at(0), 1.0), (7, at(5), 2.0), (8, at(0), 5.0), (8, at(40), 7.0)],
        schema, 0,
    )
    # batch 1 advances the watermark far past everyone -> timeouts fire
    _feed(spark, feed, [(9, DT(2024, 1, 2, 0, 0, 0), 0.0)], schema, 1)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed)
    ).withWatermark("ts", "10 minutes")
    out = session_stats_stream(stream, gap_ms=30 * 60 * 1000)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM sessions_out ORDER BY user_id, session_start").collect()
    got = [(r["user_id"], r["n_events"], r["sum_value"]) for r in rows]
    # user 7: one 2-event session; user 8: split into two by the 40m gap
    assert (7, 2, 3.0) in got
    assert (8, 1, 5.0) in got and (8, 1, 7.0) in got
