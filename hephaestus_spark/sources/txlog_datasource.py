"""Native Spark data source for the transactional table layer (r8).

``spark.dataSource.register(TxLogDataSource)`` makes the txlog a
first-class format — the idiomatic Spark integration the layer was
missing (the PySpark 4 Python Data Source API,
``pyspark.sql.datasource``; same public API Delta/Iceberg connectors
express in Scala):

- **batch read** ``spark.read.format("txlog").load(path)``: scans the
  live snapshot (or ``option("version", v)`` for time travel), one
  input partition per data file, rows stamped with the
  ``_commit_version`` that added their file. Catalyst pushes filters
  into :meth:`TxLogBatchReader.pushFilters`, where the committed ZONE
  MAPS drop whole files before any I/O — predicate pushdown all the
  way to the transaction log, the thing that makes a 100 TB table
  answer a narrow filter by opening a handful of files. Every filter
  is also returned as residual, so Spark re-applies them row-level:
  the connector can only ever over-deliver, never under-deliver.
- **streaming read** ``spark.readStream.format("txlog").load(path)``:
  serves the append-only change feed. Offsets are LOG VERSIONS — the
  natural exactly-once cursor: each micro-batch is the files added by
  commits in ``(start, end]``, optimize commits contribute nothing,
  and row-rewriting commits fail the stream loudly (same contract as
  ``TxTable.read_changes``). Spark's checkpoint + offset tracking
  composes with the log's immutability for end-to-end replayability.
- **streaming write** ``df.writeStream.format("txlog")``: tasks land
  Arrow batches as parquet files directly in the table dir (no rename
  dance — files are invisible until the log references them), and the
  DRIVER commit calls ``TxTable.commit_stream_names`` with
  ``(app_id, batchId)``: the Delta ``txn`` pattern, so a replayed
  micro-batch after a restart commits nothing (its orphan task files
  are vacuum-bounded). Exactly-once with ZERO coordination beyond the
  log's atomic create.

Executor-side reads/writes use pyarrow directly (Arrow RecordBatches
in both directions — the Python data source fast path), so no Spark
session state is shipped to tasks; a partition is (absolute file
path, commit version), nothing else.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import LongType, StructField, StructType

from hephaestus_spark.sources.txlog import TxTable

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

VERSION_COL = "_commit_version"


@dataclass
class TxLogPartition(InputPartition):
    file_path: str
    commit_version: int


@dataclass
class TxLogCommitMessage(WriterCommitMessage):
    names: list[str]


def _table_schema(table: TxTable) -> "pa.Schema":
    """Arrow schema of the live data files (footer read, no Spark
    job). The newest-added file wins, matching parquet's mergeSchema
    last-writer precedence for the append-only evolution this layer
    allows."""
    import pyarrow.parquet as pq

    files = table.live_files()
    if not files:
        raise ValueError(f"txlog table {table.path} has no data")
    newest = max(files, key=lambda nv: nv[1])[0]
    return pq.read_schema(os.path.join(table.path, newest))


def _read_file_batches(
    file_path: str, commit_version: int
) -> Iterator["pa.RecordBatch"]:
    """Executor-side: stream a parquet file as Arrow batches with the
    provenance column appended. No Spark state, no row materialization."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(file_path)
    for batch in pf.iter_batches():
        yield batch.append_column(
            VERSION_COL, pa.array([commit_version] * batch.num_rows, pa.int64())
        )


def _zone_prunable(filters: list[Filter]) -> dict[str, list]:
    """Translate top-level-column filters into zone-map probes:
    {column: [probe, ...]} where a probe is ("range", lo, hi) or
    ("in", values). Unsupported filter shapes are simply absent —
    they prune nothing and Spark evaluates them row-level anyway."""
    probes: dict[str, list] = {}
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            continue  # nested columns carry no zone maps
        col = attr[0]
        if col == VERSION_COL:
            continue
        if isinstance(f, EqualTo):
            probes.setdefault(col, []).append(("range", f.value, f.value))
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            probes.setdefault(col, []).append(("range", f.value, None))
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            probes.setdefault(col, []).append(("range", None, f.value))
        elif isinstance(f, In):
            probes.setdefault(col, []).append(("in", list(f.value)))
    return probes


class TxLogBatchReader(DataSourceReader):
    def __init__(self, table: TxTable, version: int | None):
        self.table = table
        self.version = version
        self._keep: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        # Strict > / < are pruned with their inclusive zone bound —
        # sound (a keep-set can only widen), and the residual row
        # filter restores strictness.
        keep = {n for n, _v in self.table.live_files(self.version)}
        for col, plist in _zone_prunable(list(filters)).items():
            for kind, a, b in (
                (p[0], p[1], p[2] if p[0] == "range" else None) for p in plist
            ):
                if kind == "range":
                    names, _ = self.table.pruned_files(col, a, b, self.version)
                else:
                    names, _ = self.table.pruned_files_in(col, a, self.version)
                keep &= set(names)
        self._keep = keep
        # everything comes back as residual: zone maps prune FILES,
        # Spark still evaluates the predicate on the surviving rows
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        live = self.table.live_files(self.version)
        keep = self._keep if self._keep is not None else {n for n, _ in live}
        return [
            TxLogPartition(os.path.join(self.table.path, n), v)
            for n, v in live
            if n in keep
        ]

    def read(self, partition: TxLogPartition):  # type: ignore[override]
        yield from _read_file_batches(partition.file_path, partition.commit_version)


class TxLogStreamReader(DataSourceStreamReader):
    def __init__(self, table: TxTable, starting_version: int):
        self.table = table
        self.starting_version = starting_version

    def initialOffset(self) -> dict:
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        return {"version": self.table.latest_version()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [
            TxLogPartition(os.path.join(self.table.path, n), v)
            for n, v in self.table.change_files(start["version"], end["version"])
        ]

    def read(self, partition: TxLogPartition):  # type: ignore[override]
        yield from _read_file_batches(partition.file_path, partition.commit_version)

    def commit(self, end: dict) -> None:
        pass  # the log is the source of truth; nothing to release


class TxLogStreamWriter(DataSourceStreamArrowWriter):
    """Exactly-once streaming sink. Tasks write parquet directly into
    the table dir (invisible until committed — readers trust the log);
    the driver-side commit records (app_id, batchId) through the txn
    map, so restarts replaying a batch add nothing twice. Subclassing
    the ARROW writer means tasks receive RecordBatches — column data
    flows Spark→Arrow→parquet without row materialization."""

    def __init__(self, path: str, app_id: str):
        self.path = path
        self.app_id = app_id

    def write(self, iterator) -> TxLogCommitMessage:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark import TaskContext

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return TxLogCommitMessage(names=[])
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        name = f"part-stream-{uuid.uuid4().hex[:12]}-{pid:05d}.parquet"
        os.makedirs(self.path, exist_ok=True)  # first batch creates the table
        pq.write_table(pa.Table.from_batches(batches), os.path.join(self.path, name))
        return TxLogCommitMessage(names=[name])

    def commit(self, messages, batchId: int) -> None:
        names = [n for m in messages if m is not None for n in m.names]
        TxTable(self.path).commit_stream_names(names, self.app_id, batchId)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            for n in m.names:
                try:
                    os.remove(os.path.join(self.path, n))
                except OSError:
                    pass


class TxLogDataSource(DataSource):
    """format("txlog") — see module docstring. Options:

    - ``path``: table directory (required; ``.load(path)`` sets it)
    - ``version``: batch time travel (optional)
    - ``startingVersion``: stream start, exclusive (default -1 = all)
    - ``appId``: stream-writer txn app id (default
      ``txlog-writer-<table basename>``)
    """

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def _table(self) -> TxTable:
        path = self.options.get("path")
        if not path:
            raise ValueError("format('txlog') requires .load(<table path>)")
        return TxTable(path)

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        base = from_arrow_schema(_table_schema(self._table()))
        return StructType(
            list(base.fields) + [StructField(VERSION_COL, LongType(), False)]
        )

    def reader(self, schema: StructType) -> TxLogBatchReader:
        v = self.options.get("version")
        return self._reader_for(None if v is None else int(v))

    def _reader_for(self, version: int | None) -> TxLogBatchReader:
        return TxLogBatchReader(self._table(), version)

    def streamReader(self, schema: StructType) -> TxLogStreamReader:
        return TxLogStreamReader(
            self._table(), int(self.options.get("startingversion", -1))
        )

    def streamWriter(self, schema: StructType, overwrite: bool) -> TxLogStreamWriter:
        if overwrite:
            raise ValueError("txlog stream sink is append-only (exactly-once txn)")
        path = self.options.get("path")
        if not path:
            raise ValueError("txlog stream sink requires .option('path', ...)")
        app = self.options.get(
            "appid", f"txlog-writer-{os.path.basename(os.path.normpath(path))}"
        )
        return TxLogStreamWriter(path, app)
