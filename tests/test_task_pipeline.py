"""Task-sync pipeline test (A13–A20): upsert with conditional geocode
reset, bridge rewrite incl. shrink + unmatched executor, watermark
advance on empty days, backfill epoch on empty state.

Fixture values from the reference's own tests (task 101, executors
Executor1/Executor2 — internal/repository/task_test.go:161,207-208) and
FIXTURES.md B4/B6 edge cases.
"""

from __future__ import annotations

import datetime
import os
import shutil

from pyspark.sql import functions as F

from hephaestus_spark.streaming.pipeline import (
    BACKFILL_EPOCH,
    TaskSyncPipeline,
)

D = datetime.date


def _task(id, type_, addr, executors, closed=False, desc="Test Description"):
    ts = datetime.datetime(2024, 1, 5, 12, 0, 0)
    return (id, type_, ts, ts if closed else None, desc, addr,
            "Cust", "cust1", ["c1"], executors, closed)


def _write_feed(spark, feed_dir, rows, day, idx):
    df = spark.createDataFrame(
        [r + (day,) for r in rows],
        "id long, type string, created_at timestamp, closed_at timestamp,"
        " description string, address string, customer_name string,"
        " customer_login string, comments array<string>,"
        " executors array<string>, is_closed boolean, feed_date date",
    )
    tmp = os.path.join(feed_dir, f"_stage{idx}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dst = os.path.join(feed_dir, f"{idx:05d}.parquet")
    shutil.move(os.path.join(tmp, part), dst)
    shutil.rmtree(tmp, ignore_errors=True)
    os.utime(dst, (1_700_000_000 + idx, 1_700_000_000 + idx))


def test_task_sync_geocode_and_bridge(spark, tmp_path):
    wd = str(tmp_path)
    feed = os.path.join(wd, "feed")
    os.makedirs(feed)
    employees = os.path.join(wd, "employees")
    spark.createDataFrame(
        [("Executor1", 11), ("Executor2", 22)], "shortname string, emp_id long"
    ).write.parquet(employees)
    pipe = TaskSyncPipeline(
        feed,
        os.path.join(wd, "tasks"),
        os.path.join(wd, "bridge"),
        os.path.join(wd, "wm"),
        employees_path=employees,
    )

    # A19 empty state -> backfill epoch (tasks.go:182)
    assert pipe.last_processed_date(spark) == BACKFILL_EPOCH

    # ---- day 1: initial upserts ----
    _write_feed(
        spark, feed,
        [_task(101, "NewType", "a st", ["Executor1", "Executor2"]),
         _task(102, "Other", None, ["Ghost"])],
        D(2024, 1, 5), 0,
    )
    pipe.run_available_now(spark)
    tasks = {r["id"]: r for r in spark.read.parquet(pipe.tasks_path).collect()}
    assert tasks[101]["address"] == "a st" and tasks[101]["latitude"] is None
    bridge = {(r["task_id"], r["member"]): r["member_id"]
              for r in spark.read.parquet(pipe.bridge_path).collect()}
    assert bridge[(101, "Executor1")] == 11 and bridge[(101, "Executor2")] == 22
    assert bridge[(102, "Ghost")] is None  # unmatched -> NULL (B6)
    assert pipe.last_processed_date(spark) == D(2024, 1, 6)  # +1 day (A20)

    # simulate the external geocoder filling engine-owned columns
    snap = spark.read.parquet(pipe.tasks_path)
    geocoded = snap.withColumn(
        "latitude", F.when(F.col("id") == 101, F.lit(50.45)).otherwise(F.col("latitude"))
    ).withColumn(
        "longitude", F.when(F.col("id") == 101, F.lit(30.52)).otherwise(F.col("longitude"))
    ).withColumn(
        "geocoding_attempts", F.when(F.col("id") == 101, F.lit(2)).otherwise(F.col("geocoding_attempts"))
    )
    geocoded.write.mode("overwrite").parquet(pipe.tasks_path + ".g")
    shutil.rmtree(pipe.tasks_path)
    os.rename(pipe.tasks_path + ".g", pipe.tasks_path)

    # ---- day 2: same address for 101 (geocode KEPT), executor set shrinks;
    #      102 address NULL -> 'c st' (geocode reset is a no-op, was NULL) ----
    _write_feed(
        spark, feed,
        [_task(101, "NewType", "a st", ["Executor1"]),
         _task(102, "Other", "c st", ["Executor2"])],
        D(2024, 1, 6), 1,
    )
    pipe.run_available_now(spark)
    tasks = {r["id"]: r for r in spark.read.parquet(pipe.tasks_path).collect()}
    # address unchanged (IS NOT DISTINCT) -> geocode preserved (A14)
    assert tasks[101]["latitude"] == 50.45 and tasks[101]["geocoding_attempts"] == 2
    # NULL -> 'c st' IS DISTINCT -> reset applies (attempts zeroed)
    assert tasks[102]["address"] == "c st" and tasks[102]["geocoding_attempts"] == 0
    bridge = {(r["task_id"], r["member"]) for r in spark.read.parquet(pipe.bridge_path).collect()}
    assert bridge == {(101, "Executor1"), (102, "Executor2")}  # shrink + replace (A15)

    # ---- day 3: address CHANGES for 101 -> geocode reset (A14) ----
    _write_feed(spark, feed, [_task(101, "NewType", "b st", ["Executor1"])],
                D(2024, 1, 7), 2)
    pipe.run_available_now(spark)
    tasks = {r["id"]: r for r in spark.read.parquet(pipe.tasks_path).collect()}
    assert tasks[101]["address"] == "b st"
    assert tasks[101]["latitude"] is None and tasks[101]["longitude"] is None
    assert tasks[101]["geocoding_attempts"] == 0
    # 102 untouched this batch -> bridge row survives
    bridge = {(r["task_id"], r["member"]) for r in spark.read.parquet(pipe.bridge_path).collect()}
    assert bridge == {(101, "Executor1"), (102, "Executor2")}
    assert pipe.last_processed_date(spark) == D(2024, 1, 8)
