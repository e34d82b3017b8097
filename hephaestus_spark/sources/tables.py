"""Parquet table loaders for the driver-generated test data.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table per
scale factor.

The only special case is ``events``: its ``ts`` column is parquet
TIMESTAMP(NANOS), which Spark cannot map to a Catalyst type. We read it
as long (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
microseconds with *integer* division (float division at 1.7e18 ns loses
~256 ns to double rounding — enough to corrupt the microsecond digit).
DuckDB performs the identical ns→us truncation when it reads the same
file, so oracle comparisons agree.

At 100 TB scale these loaders stay valid: ``spark.read.parquet`` over a
directory of files gets partition pruning, predicate pushdown, and
column pruning from the Parquet datasource; nothing here materializes
or collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hephaestus_spark.session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes events.ts to TIMESTAMP_NTZ(us)."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        # ns-epoch long -> us-epoch long (integer DIV!) -> naive timestamp
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register temp views (same names DuckDB uses) for SQL-based builders."""
    for t in tables or TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
