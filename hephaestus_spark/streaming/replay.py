"""Deterministic micro-batch replay harness.

Re-creates the reference's day-by-day catch-up loop
(/root/reference/internal/services/tasks/tasks.go:79-127: replay
granularity = one calendar day per request) as a Structured Streaming
file source: each arrival-day slice becomes one file, files get
strictly increasing mtimes, and ``maxFilesPerTrigger=1`` makes Spark
consume them as ordered micro-batches — the same arrival order the
reference's scheduler would produce.

Used by Q28/Q29 (watermark + dedup semantics are arrival-order
dependent) and by the pipeline-sink tests. In production the source
would be Kafka/files-on-arrival; everything downstream of readStream is
identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def replay_streaming(
    spark: SparkSession,
    batches: DataFrame,
    arrival_col: str,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "append",
) -> DataFrame:
    """Replay ``batches`` as one micro-batch per distinct arrival key.

    Writes each arrival slice as a single parquet file with increasing
    mtime, streams them back with maxFilesPerTrigger=1 through
    ``transform``, runs to completion on a memory sink, and returns the
    materialized result (arrival_col is dropped before transform).
    """
    # Spark 4 (multi-stateful-operator support) defers late-record
    # filtering; with it ON a late row arriving before its window's
    # eviction is silently merged. The reference semantics (A20: late
    # day replays beyond the watermark are dropped) need the classic
    # filter, restored by disabling allowMultiple. All queries here use
    # a single stateful operator, so nothing is lost.
    spark.conf.set("spark.sql.streaming.statefulOperator.allowMultiple", "false")
    # Stateful micro-batches pay per state-store instance: with the
    # default 200 shuffle partitions a 30-batch replay touches 6000
    # store instances for a few thousand rows. Pin a narrow width for
    # the replay and restore the caller's setting afterwards.
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    work = tempfile.mkdtemp(prefix="hs_replay_")
    stream_dir = os.path.join(work, "stream")
    os.makedirs(stream_dir)
    name = "replay_" + uuid.uuid4().hex[:12]
    try:
        keys = [r[0] for r in batches.select(arrival_col).distinct().orderBy(arrival_col).collect()]
        data = batches.drop(arrival_col)
        schema = data.schema
        base = 1_700_000_000
        for i, key in enumerate(keys):
            slice_dir = os.path.join(work, f"slice_{i}")
            (
                batches.filter(batches[arrival_col] == key)
                .drop(arrival_col)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(slice_dir)
            )
            part = next(
                f for f in os.listdir(slice_dir) if f.endswith(".parquet")
            )
            dst = os.path.join(stream_dir, f"{i:05d}.parquet")
            shutil.move(os.path.join(slice_dir, part), dst)
            os.utime(dst, (base + i, base + i))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            transform(stream)
            .writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # Materialize before the temp dir disappears.
        out = spark.table(name)
        pdf = out.toPandas()
        return spark.createDataFrame(pdf, schema=out.schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


def replay_foreach_batch(
    spark: SparkSession,
    batches: DataFrame,
    arrival_col: str,
    batch_transform: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Replay ``batches`` as ordered micro-batches through a
    ``foreachBatch`` sink: each micro-batch runs ``batch_transform`` as
    a PLAIN BATCH plan (joins against static tables, multi-stage aggs —
    anything Structured Streaming's incremental planner would reject)
    and appends its result to a parquet accumulator, which is returned
    re-read.

    This is the production shape for per-batch enrichment against
    static/slowly-changing reference data (e.g. probing a day's ingest
    against the corpus dedup index): exactly-once per micro-batch via
    the checkpointed batch id, full batch-DataFrame expressiveness, no
    stream-side state.

    ``batch_transform`` may return either a DataFrame or a
    ``(DataFrame, cleanup)`` pair (r16, VERDICT r15 #2): ``cleanup``
    runs AFTER the batch's write completes, which is where per-batch
    persisted intermediates (the probe's batch signatures and verify
    counts) get unpersisted — mirroring sinks.py's persist/unpersist-
    in-finally convention, so a long-running stream's cached batch
    state stays flat instead of accumulating until LRU eviction."""
    work = tempfile.mkdtemp(prefix="hs_replay_fb_")
    stream_dir = os.path.join(work, "stream")
    out_dir = os.path.join(work, "out")
    os.makedirs(stream_dir)
    try:
        keys = [
            r[0]
            for r in batches.select(arrival_col).distinct().orderBy(arrival_col).collect()
        ]
        schema = batches.drop(arrival_col).schema
        base = 1_700_000_000
        for i, key in enumerate(keys):
            slice_dir = os.path.join(work, f"slice_{i}")
            (
                batches.filter(batches[arrival_col] == key)
                .drop(arrival_col)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(slice_dir)
            )
            part = next(f for f in os.listdir(slice_dir) if f.endswith(".parquet"))
            dst = os.path.join(stream_dir, f"{i:05d}.parquet")
            shutil.move(os.path.join(slice_dir, part), dst)
            os.utime(dst, (base + i, base + i))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )

        def _sink(batch_df: DataFrame, _batch_id: int) -> None:
            res = batch_transform(batch_df)
            df, cleanup = res if isinstance(res, tuple) else (res, None)
            try:
                df.write.mode("append").parquet(out_dir)
            finally:
                if cleanup is not None:
                    cleanup()

        q = stream.writeStream.foreachBatch(_sink).start()
        q.processAllAvailable()
        q.stop()
        out = spark.read.parquet(out_dir)
        pdf = out.toPandas()
        return spark.createDataFrame(pdf, schema=out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
