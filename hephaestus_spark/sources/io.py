"""General file-format I/O: readers, layout-aware writers, compaction.

The reference's only "formats" are protobuf-over-gRPC in and
JDBC/Postgres out (SURVEY §2.C; /root/reference internal/client/hermes,
internal/repository). A Spark-native engine additionally owns the lake
I/O surface, and at 100 TB the *layout* decisions made at write time —
partition columns, bucketing, file sizing — are what make every later
read cheap:

- **Partition columns** → partition pruning: a date-filtered query
  touches only matching directories, never opens the rest.
- **Bucketing** → shuffle-free joins/aggs: two tables bucketed on the
  same key with the same bucket count sort-merge-join with ZERO
  exchange (the dominant cost of large-large joins).
- **File sizing** → small-file compaction: a streaming sink emitting
  per-batch files degrades scans with per-file open overhead and
  scheduler pressure; periodic compaction to ~target-size files
  restores scan throughput.

Readers take EXPLICIT schemas by default: schema inference is a full
extra pass over the data (prohibitive at scale) and type-unstable
across samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

READ_FORMATS = ("parquet", "orc", "json", "csv")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Format-dispatched reader.

    For csv/json an explicit ``schema`` is required unless
    ``inferSchema``/``samplingRatio`` is passed deliberately — at scale
    inference is an extra full scan, so it must be opt-in."""
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {READ_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json") and "inferSchema" not in options and "samplingRatio" not in options:
        raise ValueError(
            f"{fmt} without an explicit schema requires opting into "
            "inference (inferSchema/samplingRatio) — it costs a full scan"
        )
    return reader.options(**options).load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    target_file_rows: int | None = None,
) -> None:
    """Write with directory partitioning (→ partition pruning on read).

    Repartitions by the partition columns first so each output directory
    is written by the tasks that own that key — without this, every task
    writes a sliver into every partition directory and a 1000-task job
    creates 1000× the file count. ``target_file_rows`` additionally
    splits giant partitions into multiple right-sized files."""
    out = df.repartition(*partition_by)
    writer = out.write.format(fmt).mode(mode).partitionBy(*partition_by)
    if target_file_rows:
        # engine-enforced file splitting: giant partitions roll over to
        # a new file every target_file_rows rows
        writer = writer.option("maxRecordsPerFile", str(target_file_rows))
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write a bucketed (+ optionally sorted) managed table.

    Joining two tables bucketed on the same keys with the same
    ``n_buckets`` plans a sort-merge join with NO Exchange on either
    side — the shuffle cost is paid once at write time and amortized
    over every subsequent join/agg on that key. This is the single
    biggest lever for repeated 100 TB fact-fact joins."""
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path is not None:
        # external table: data at an explicit location (catalog metadata
        # only records the layout); avoids stale managed-warehouse dirs
        w = w.option("path", path)
    w.saveAsTable(table)


def compact(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_rows_per_file: int = 1_000_000,
    schema: StructType | str | None = None,
) -> int:
    """Rewrite a directory of small files into ~target-sized files.

    Returns the output file (partition) count. Streaming sinks produce
    one-file-per-batch; compaction restores scan efficiency. Row count
    comes from metadata (cheap for parquet/orc), not a data scan.

    Targets FLAT single-directory datasets only: a Hive-partitioned
    layout (key=value subdirs) is refused — rewriting it flat would
    silently turn partition columns into data columns and destroy
    partition pruning for every downstream reader."""
    tmp_s = path.rstrip("/") + "._compact_tmp"
    old_s = path.rstrip("/") + "._compact_old"
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    tmp, old, live = jvm_path(tmp_s), jvm_path(old_s), jvm_path(path)
    # Stale markers from a crashed run would make the renames below
    # silently no-op (Hadoop rename reports failure by returning false,
    # not by throwing) — fail fast so the operator resolves which copy
    # is live instead of compact() destroying one.
    for p, label in ((tmp, tmp_s), (old, old_s)):
        if fs.exists(p):
            raise RuntimeError(
                f"compact: leftover {label} from a previous run — resolve it first"
            )
    for st in fs.listStatus(live):
        if st.isDirectory() and "=" in st.getPath().getName():
            raise RuntimeError(
                f"compact: {path} is Hive-partitioned ({st.getPath().getName()}) — "
                "compact each partition directory, or rewrite with partitionBy"
            )
    df = read_any(spark, path, fmt, schema=schema)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))  # ceil
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(tmp_s)
    # atomic-ish swap via filesystem rename (single-FS assumption, same
    # discipline a lakehouse table format does transactionally). Every
    # rename/delete return value is checked: false means it didn't
    # happen, and an unchecked false here loses the dataset.
    if not fs.rename(live, old):
        raise RuntimeError(f"compact: rename {path} -> {old_s} failed")
    if not fs.rename(tmp, live):
        # roll the original back so the dataset path never vanishes
        fs.rename(old, live)
        raise RuntimeError(f"compact: rename {tmp_s} -> {path} failed (rolled back)")
    if not fs.delete(old, True):
        raise RuntimeError(f"compact: could not delete {old_s} (data is live at {path})")
    return n_files
