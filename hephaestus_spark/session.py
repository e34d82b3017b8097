"""SparkSession factory.

Local-mode defaults tuned for the test harness (local[N], AQE on,
UTC session timezone — required for oracle agreement on date functions,
SURVEY.md §7 M0). At cluster scale the same confs apply; only master
and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and required) to apply at runtime on ANY session,
# including one handed to us by an external harness.
RUNTIME_CONFS = {
    # Oracle agreement: date/timestamp functions must evaluate in UTC.
    "spark.sql.session.timeZone": "UTC",
    # The driver-generated events.parquet stores TIMESTAMP(NANOS) which
    # Spark cannot map natively; read as long and convert in the loader
    # (see sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # AQE: runtime re-planning, partition coalescing, skew-join handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # r15 optimization (guide §2.2/§2.5): AQE coalesces with
    # parallelismFirst=true — target partition count = available cores
    # — but bounded BELOW by minPartitionSize (default 1m). On
    # compute-dense small shuffles (per-group array building, window
    # frames) that floor collapses the reduce side to 1-8 tasks while
    # the rest of the machine idles: measured at sf0.1, q20's 7 s
    # aggregation stage ran on 8 of 32 cores (9.1 MB shuffle / 1 MB
    # floor). 64k keeps parallelism-first in charge for small stages;
    # large stages are untouched (their total/cores quotient is far
    # above any floor), so the setting is scale-neutral: it only
    # matters when a stage's shuffle is smaller than cores x 1 MB,
    # exactly where extra parallelism is free. Env-overridable for
    # cluster tuning.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
        "SPARK_GRAFT_AQE_MIN_PARTITION", "64k"
    ),
    # Arrow for any pandas interchange (vector ops in Q34 etc.).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python Data Source filter pushdown (r8): lets format("txlog")
    # resolve Catalyst filters against the transaction log's zone maps
    # and skip whole files (sources/txlog_datasource.py). Runtime-
    # settable, so externally-created driver sessions get it too.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-created session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be locked by the host harness; best-effort.
            pass
    return spark


def get_session(app_name: str = "hephaestus_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a local session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (bench contract).
    shuffle.partitions ~= cores for local mode: the default 200 both
    over-schedules tiny data and under-partitions nothing here; at
    cluster scale this would be sized to ~2-3x total executor cores or
    left to AQE coalescing.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # UI off for tests (startup cost, port churn); bench.py turns it
        # on (SPARK_GRAFT_UI=true) to read per-stage shuffle/spill bytes
        # from the status REST API — measured scale evidence in BENCH.
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.ui.retainedStages", "5000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
