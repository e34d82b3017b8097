"""Mid-stream schema widening on the txlog streaming source (r14,
VERDICT r13 #2): the semantics are PINNED, not incidental.

- A stream serving the auto-resolved table schema that crosses a
  widening commit FAILS that batch with a restart instruction
  (Delta's non-additive-change contract). Nothing is emitted from the
  failed batch; the offset log makes the restart exactly-once; the
  restarted query re-resolves the wider schema and serves pre-widening
  files with the new columns null-filled (``_align``).
- A stream with an EXPLICIT narrower ``.schema(...)`` is a declared
  projection: it keeps running and the new columns are dropped —
  documented down-projection, the user's contract.

Covers both processingTime micro-batches and the ``drain_capped``
backfill path (VERDICT's named scenarios).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.sources.txlog import TxTable
from hephaestus_spark.sources.txlog_datasource import (
    TxLogDataSource,
    drain_capped,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(TxLogDataSource)


def _narrow(spark, rows):
    return spark.createDataFrame(rows, "id long, val double")


def _wide(spark, rows):
    return spark.createDataFrame(rows, "id long, val double, tag string")


def _wait_for(pred, timeout=60.0):
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            if pred():
                return True
        except Exception:
            pass
        import time as _t

        _t.sleep(0.1)
    return False


def test_widening_guard_unit(spark, tmp_path):
    """Deterministic guard coverage: a reader constructed before the
    widening commit refuses to plan a batch across it; a reader
    constructed after (the restart) serves it."""
    from hephaestus_spark.sources.txlog_datasource import (
        TxLogStreamReader,
        _table_schema,
    )

    src = str(tmp_path / "src")
    t = TxTable(src)
    t.append(_narrow(spark, [(0, 0.0)]))
    narrow_schema = _table_schema(t)
    r = TxLogStreamReader(t, -1, narrow_schema)
    r.initialOffset()
    assert r.partitions({"version": -1}, {"version": 0})  # narrow era OK

    t.append(_wide(spark, [(1, 1.0, "x")]))
    with pytest.raises(ValueError, match="WIDENED.*restart the query"):
        r.partitions({"version": 0}, {"version": 1})

    # the restarted reader resolves the wider schema and plans fine
    t2 = TxTable(src)
    r2 = TxLogStreamReader(t2, -1, _table_schema(t2))
    assert r2.partitions({"version": 0}, {"version": 1})
    # project mode on the old schema keeps going instead
    r3 = TxLogStreamReader(t2, -1, narrow_schema, on_widening="project")
    assert r3.partitions({"version": 0}, {"version": 1})


def test_widening_fails_live_stream_then_restart_is_exactly_once(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = TxTable(src)
    t.append(_narrow(spark, [(0, 0.0), (1, 1.0)]))

    # a LIVE processingTime query crosses the widening commit
    q = (
        spark.readStream.format("txlog")
        .load(src)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        assert _wait_for(lambda: spark.read.parquet(out).count() == 2)
        t.append(_wide(spark, [(2, 2.0, "x")]))
        with pytest.raises(Exception, match="WIDENED.*restart the query"):
            q.awaitTermination(300)
            if q.exception() is not None:
                raise q.exception()
            raise AssertionError("stream crossed a widening commit silently")
    finally:
        q.stop()
    got = spark.read.option("mergeSchema", "true").parquet(out)
    assert got.count() == 2, "failed batch must emit nothing"

    # restart: the new query re-resolves the WIDER schema, resumes
    # from the committed offset, and replays the widening batch
    # exactly once with the new column served
    q = (
        spark.readStream.format("txlog")
        .load(src)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "restart did not terminate in time"
    got = spark.read.option("mergeSchema", "true").parquet(out)
    rows = {r["id"]: (r["val"], r["tag"]) for r in got.collect()}
    assert sorted(rows) == [0, 1, 2], "rows lost or duplicated"
    assert rows[2] == (2.0, "x")


def test_widening_mid_drain_capped_then_resume(spark, tmp_path):
    """drain_capped (1 file/batch) with a widening commit landing
    MID-drain: the drain fails at the widening batch; the next
    drain_capped call (fresh reader, wider schema) finishes the
    backlog exactly once with caps still honored."""
    import threading

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = TxTable(src)
    for i in range(6):
        t.append(_narrow(spark, [(i, float(i))]).coalesce(1))

    def writer():
        return (
            spark.readStream.format("txlog")
            .option("maxFilesPerTrigger", "1")
            .load(src)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
        )

    box: dict = {}

    def drain():
        try:
            box["summary"] = drain_capped(
                writer(),
                processing_time="300 milliseconds",
                table_path=src,
                checkpoint_location=ckpt,
            )
        except Exception as e:  # noqa: BLE001
            box["err"] = e

    th = threading.Thread(target=drain)
    th.start()
    # land the widening commit once the drain is demonstrably mid-way
    assert _wait_for(lambda: spark.read.parquet(out).count() >= 1)
    t.append(_wide(spark, [(10, 10.0, "w")]).coalesce(1))
    th.join(timeout=300)
    assert not th.is_alive()
    assert "err" in box, f"drain crossed the widening silently: {box}"
    assert "WIDENED" in str(box["err"]) and "restart the query" in str(
        box["err"]
    )

    # resume: fresh reader sees the wider schema; exactly-once overall
    drain_capped(writer(), table_path=src, checkpoint_location=ckpt)
    got = spark.read.option("mergeSchema", "true").parquet(out)
    rows = {r["id"]: r["tag"] for r in got.collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4, 5, 10], "rows lost or duplicated"
    assert rows[10] == "w" and rows[0] is None


def test_explicit_narrower_schema_implies_projection(spark, tmp_path):
    """A stream declared NARROWER than the table at start is a
    projection — a further widening never disturbs it."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = TxTable(src)
    t.append(_wide(spark, [(0, 0.0, "pre")]))  # table is already wide

    def start():
        return (
            spark.readStream.format("txlog")
            .schema(  # narrower than the table (provenance col stays)
                "id long, val double, _commit_version long"
            )
            .load(src)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    assert q.awaitTermination(300), "stream did not terminate in time"
    t.append(
        spark.createDataFrame(
            [(1, 1.0, "w", 7)], "id long, val double, tag string, extra long"
        )
    )
    q = start()
    assert q.awaitTermination(300), "stream did not terminate in time"
    # must NOT fail: projection is the contract
    assert q.exception() is None
    got = spark.read.parquet(out)
    assert sorted(r["id"] for r in got.collect()) == [0, 1]
    assert "tag" not in got.columns and "extra" not in got.columns


def test_on_schema_widening_project_option(spark, tmp_path):
    """onSchemaWidening=project keeps a LIVE query running across a
    widening commit, serving its declared columns (the case the
    narrower-schema heuristic cannot see: declared == table at start).
    The option governs the running instance — an auto-schema RESTART
    legitimately re-resolves the wider schema (pin a projection across
    restarts with an explicit .schema(...), covered above)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = TxTable(src)
    t.append(_narrow(spark, [(0, 0.0)]))

    q = (
        spark.readStream.format("txlog")
        .option("onSchemaWidening", "project")
        .load(src)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        assert _wait_for(lambda: spark.read.parquet(out).count() == 1)
        # widening lands MID-STREAM: the query must keep running and
        # deliver the new row with the new column dropped
        t.append(_wide(spark, [(1, 1.0, "dropped")]))
        assert _wait_for(
            lambda: spark.read.option("mergeSchema", "true")
            .parquet(out)
            .count()
            == 2
        ), "project-mode stream stalled on the widening commit"
        assert q.exception() is None
    finally:
        q.stop()
    got = spark.read.option("mergeSchema", "true").parquet(out)
    assert sorted(r["id"] for r in got.collect()) == [0, 1]
    assert "tag" not in got.columns  # dropped by the declared projection


def test_on_schema_widening_rejects_bad_value(spark, tmp_path):
    src = str(tmp_path / "src")
    TxTable(src).append(_narrow(spark, [(0, 0.0)]))
    q = (
        spark.readStream.format("txlog")
        .option("onSchemaWidening", "ignore")
        .load(src)
        .writeStream.format("memory")
        .queryName("badopt")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="onSchemaWidening"):
        q.awaitTermination(300)
        if q.exception() is not None:
            raise q.exception()
        raise AssertionError("invalid option accepted")
