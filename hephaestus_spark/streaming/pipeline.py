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
