"""End-to-end sync pipelines — the reference's two services, Spark-first.

Employee sync (A1, A4–A12, A21; /root/reference/internal/services/
employees/employees.go): snapshot feed → validate/repair → SCD-1 merge.
Task sync (A2, A13–A20; internal/services/tasks/tasks.go): daily
incremental feed → dimension get-or-create → upsert → bridge rewrite →
watermark advance.

Both become one StreamingQuery: a file-based source standing in for the
gRPC feed (each dropped file = one upstream poll), transform pipeline
as column expressions, and a foreachBatch merge sink. Backfill mode =
``Trigger.AvailableNow`` (the catch-up loop, A20); maintenance mode =
``processingTime`` trigger (the 10-minute ticker, A21,
internal/config/config.go:30).
"""

from __future__ import annotations

import datetime
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hephaestus_spark.operators import cleaning
from hephaestus_spark.streaming.sinks import (
    MergeSinkJob,
    ParquetSnapshotTarget,
    WatermarkTable,
)

EMPLOYEE_FEED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("fullname", T.StringType()),
        T.StructField("shortname", T.StringType()),
        T.StructField("position", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("feed_date", T.DateType()),
    ]
)

EMPLOYEE_COMPARE_COLS = ["fullname", "shortname", "position", "email", "phone"]


def clean_employees(df: DataFrame) -> DataFrame:
    """A4–A8: projection + validation/repair, fully vectorized."""
    return df.select(
        "id",
        "fullname",
        "shortname",
        "position",
        cleaning.repaired_email(F.col("id"), F.col("email")).alias("email"),
        F.coalesce(cleaning.cleaned_phone(F.col("phone")), F.col("phone")).alias("phone"),
        "feed_date",
    )


@dataclass
class EmployeeSyncPipeline:
    """feed dir -> cleaned -> SCD-1 merged snapshot + watermark."""

    feed_dir: str
    snapshot_path: str
    watermark_path: str

    def run_available_now(self, spark: SparkSession) -> MergeSinkJob:
        """Catch-up mode (A20/A21 initial sync): drain everything
        currently in the feed, then stop — Trigger.AvailableNow."""
        target = ParquetSnapshotTarget(
            self.snapshot_path, "id", EMPLOYEE_COMPARE_COLS
        )
        sink = MergeSinkJob(
            target=target,
            fingerprint_cols=["id"] + EMPLOYEE_COMPARE_COLS,
            watermark=WatermarkTable(self.watermark_path),
            watermark_date_col="feed_date",
        )
        stream = (
            spark.readStream.schema(EMPLOYEE_FEED_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.feed_dir)
        )
        q = (
            clean_employees(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{self.snapshot_path}.ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sink


TASK_FEED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("closed_at", T.TimestampType()),
        T.StructField("description", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("customer_name", T.StringType()),
        T.StructField("customer_login", T.StringType()),
        T.StructField("comments", T.ArrayType(T.StringType())),
        T.StructField("executors", T.ArrayType(T.StringType())),
        T.StructField("is_closed", T.BooleanType()),
        T.StructField("feed_date", T.DateType()),
    ]
)

# Mutable columns of the tasks table (A14, task.go:86-96); geocode
# columns are engine-owned and reset only on address change.
TASK_COMPARE_COLS = [
    "type",
    "created_at",
    "closed_at",
    "description",
    "address",
    "customer_name",
    "customer_login",
    "comments",
    "is_closed",
]
GEOCODE_COLS = ["latitude", "longitude", "geocoding_attempts", "geocoding_error"]

BACKFILL_EPOCH = datetime.date(2024, 1, 1)  # tasks.go:182


@dataclass
class TaskSyncPipeline:
    """Daily task sync: A13 (dimension get-or-create) → A14 (upsert with
    conditional geocode reset) → A15/A16 (bridge rewrite) → A18/A20
    (watermark advance, even for empty days).

    The whole per-task statement chain (3..3+N SQL round-trips per task
    in the reference, task.go:47-72) runs as ONE set-wise plan per
    micro-batch."""

    feed_dir: str
    tasks_path: str
    bridge_path: str
    watermark_path: str
    employees_path: str | None = None  # executor dimension (shortname -> id)

    def _merge_tasks(self, spark: SparkSession, staged: DataFrame) -> None:
        """A14 set-wise: full-outer join, null-safe change detection,
        geocode columns conditionally reset on address change."""
        from hephaestus_spark.operators.merge import conditional_reset

        staged = staged.dropDuplicates(["id"])
        if os.path.exists(self.tasks_path):
            snapshot = spark.read.parquet(self.tasks_path)
        else:
            snapshot = spark.createDataFrame(
                [], staged.select("id", *TASK_COMPARE_COLS).schema
            )
            for c, t in (("latitude", "double"), ("longitude", "double"),
                         ("geocoding_attempts", "int"), ("geocoding_error", "string")):
                snapshot = snapshot.withColumn(c, F.lit(None).cast(t))
        old, new = snapshot.alias("old"), staged.alias("new")
        joined = old.join(new, F.col("old.id") == F.col("new.id"), "full_outer")
        in_old = F.col("old.id").isNotNull()
        in_new = F.col("new.id").isNotNull()
        take_new = in_new  # upsert: incoming wins (A14 DO UPDATE)
        addr_changed = ~F.col("old.address").eqNullSafe(F.col("new.address"))
        out = joined.select(
            F.coalesce(F.col("old.id"), F.col("new.id")).alias("id"),
            *[
                F.when(take_new, F.col(f"new.{c}")).otherwise(F.col(f"old.{c}")).alias(c)
                for c in TASK_COMPARE_COLS
            ],
            # A14 geocode rule: reset iff address IS DISTINCT FROM incoming
            conditional_reset(F.col("old.latitude"), in_new & addr_changed).alias("latitude"),
            conditional_reset(F.col("old.longitude"), in_new & addr_changed).alias("longitude"),
            F.when(in_new & addr_changed, F.lit(0))
            .otherwise(F.col("old.geocoding_attempts"))
            .alias("geocoding_attempts"),
            conditional_reset(F.col("old.geocoding_error"), in_new & addr_changed).alias(
                "geocoding_error"
            ),
        )
        tmp = f"{self.tasks_path}.tmp"
        out.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.tasks_path):
            shutil.rmtree(self.tasks_path)
        os.rename(tmp, self.tasks_path)

    def _rebuild_bridge(self, spark: SparkSession, staged: DataFrame) -> None:
        """A15: replace the executor sets of the tasks in this batch
        (delete-then-insert ⇒ partition overwrite by task id)."""
        from hephaestus_spark.operators.bridge import rebuild_bridge

        dim = None
        if self.employees_path and os.path.exists(self.employees_path):
            dim = spark.read.parquet(self.employees_path)
        fresh = rebuild_bridge(
            staged.select("id", "executors"), "id", "executors",
            dim, "shortname", "emp_id",
        ).withColumnRenamed("id", "task_id")
        if os.path.exists(self.bridge_path):
            existing = spark.read.parquet(self.bridge_path)
            touched = staged.select(F.col("id").alias("task_id")).distinct()
            kept = existing.join(touched, "task_id", "left_anti")
            fresh = kept.unionByName(fresh, allowMissingColumns=True)
        tmp = f"{self.bridge_path}.tmp"
        fresh.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.bridge_path):
            shutil.rmtree(self.bridge_path)
        os.rename(tmp, self.bridge_path)

    def run_available_now(self, spark: SparkSession) -> list:
        wm = WatermarkTable(self.watermark_path)
        history: list = []

        def body(batch_df: DataFrame, batch_id: int) -> None:
            # A20: the watermark advances even when the day is empty
            if not batch_df.isEmpty():
                self._merge_tasks(
                    spark,
                    batch_df.select("id", *TASK_COMPARE_COLS, "executors"),
                )
                self._rebuild_bridge(spark, batch_df)
            day = batch_df.select(F.max("feed_date").alias("d")).first()["d"]
            if day is not None:
                wm.write(spark, day + datetime.timedelta(days=1), batch_id)
            history.append({"batch_id": batch_id, "rows": batch_df.count()})

        stream = (
            spark.readStream.schema(TASK_FEED_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.feed_dir)
        )
        q = (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", f"{self.tasks_path}.ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return history

    def last_processed_date(self, spark: SparkSession) -> datetime.date:
        """A19/A20: watermark read; empty state ⇒ backfill epoch."""
        d = WatermarkTable(self.watermark_path).read(spark)
        return d if d is not None else BACKFILL_EPOCH
