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


# Per-session DataFrame cache (r15, VERDICT r14 #5): re-loading the
# same table re-reads parquet footers and re-round-trips Py4J every
# time — a measurable slice of the ~0.1 s per-query fixed floor when a
# query touches 4-6 tables. DataFrames are immutable plans, so reuse
# within one session is sound; the key carries the applicationId so a
# new session never sees another's plans. Static test inputs only: the
# parquet file listing is resolved at first load (appends to a test
# dir mid-session would be missed — the txlog datasource, not this
# loader, is the mutable-table path).
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes events.ts to TIMESTAMP_NTZ(us)."""
    apply_runtime_confs(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        # ns-epoch long -> us-epoch long (integer DIV!) -> naive timestamp
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    if len(_DF_CACHE) > 256:  # bound: sessions x dirs x tables in tests
        _DF_CACHE.clear()
    _DF_CACHE[key] = df
    return df


# Planned-split-count memo for spread_scan (r15): the probe
# (`df.rdd.getNumPartitions()`) costs ~0.2 s of physical planning +
# Py4J per FRESH DataFrame object, and every bench run constructs its
# query (and thus its pruned scan) from scratch. Scan split planning
# depends only on the input files (sizes, maxPartitionBytes packing) —
# projections and filters move columns, not split boundaries — so the
# count is memoized per (applicationId, input file set). Non-file
# sources (empty inputFiles) skip the memo and pay the direct probe.
_SPLITS_CACHE: dict[tuple[str, tuple[str, ...]], int] = {}


def spread_scan(df: DataFrame, key: str) -> DataFrame:
    """Raise scan parallelism for compute-dense per-row stages when the
    input cannot split (r15 optimization, guide §2.5 "input skew: one
    huge unsplittable file ... otherwise repartition immediately after
    the read").

    The local test parquet files are single-row-group, so every
    scan-adjacent stage runs as ONE task no matter the core count —
    measured at sf0.1: x_simhash's tokenize+vote stage 2.4 s of
    executor time on 1 of 32 cores, q21's JSON parse 0.84 s on 1.
    When (and only when) the planned scan yields fewer splits than the
    session's parallelism, hash-repartition on a unique key so the
    expensive per-row work (tokenize/JSON/dot-product) runs wide. The
    shuffle moves the scan's (pruned, filter-pushed) output once —
    cheap relative to the serialized compute it unblocks.

    Scale-adaptive by construction: at real scale a table yields far
    more splits than cores, the condition is false, and this is a
    no-op — the repartition never fires where it would be a pure extra
    shuffle. Hash partitioning on a unique key (not round-robin)
    spreads evenly, needs no sort-before-repartition, and keeps the
    row-to-partition map deterministic under task retry."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = tuple(sorted(df.inputFiles()))
        cache_key = (
            (spark.sparkContext.applicationId, files) if files else None
        )
        if cache_key is not None and cache_key in _SPLITS_CACHE:
            parts = _SPLITS_CACHE[cache_key]
        else:
            parts = df.rdd.getNumPartitions()
            if cache_key is not None:
                if len(_SPLITS_CACHE) > 256:
                    _SPLITS_CACHE.clear()
                _SPLITS_CACHE[cache_key] = parts
    except Exception:
        return df
    if parts * 2 <= target:
        return df.repartition(target, F.col(key))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register temp views (same names DuckDB uses) for SQL-based builders."""
    for t in tables or TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
