"""Auto-compaction + small-file bin-packing (r13 — Delta's autoCompact
and OPTIMIZE's minFileSize selection): `optimize(small_files_below=N)`
rewrites ONLY sub-threshold files (right-sized files keep their bytes),
and `set_auto_compact` triggers that sweep after appends / stream
batches once the small-file count crosses the threshold — the
streaming small-file problem handled at the table layer."""

from __future__ import annotations

import os

import pytest

from hephaestus_spark.sources.txlog import TxTable


def _one_row(spark, i):
    return spark.createDataFrame([(i, float(i))], "id long, val double")


def test_small_files_below_repacks_only_small_files(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    # one BIG file (10k rows) + four tiny ones
    big = spark.createDataFrame(
        [(i, float(i)) for i in range(10_000)], "id long, val double"
    ).coalesce(1)
    t.append(big)
    for i in range(4):
        t.append(_one_row(spark, 100_000 + i))
    files_before = set(t._snapshot_files())
    adds = t._fold_state()[0]
    big_file = max(files_before, key=lambda f: adds[f].get("bytes", 0))
    n_before = t.read(spark).count()
    v = t.optimize(spark, small_files_below=64 << 10)
    assert v == t.latest_version()
    files_after = set(t._snapshot_files())
    assert big_file in files_after  # right-sized file untouched
    # 4 tiny files became 1; the big one survived
    assert len(files_after) == 2
    assert t.read(spark).count() == n_before
    # below 2 selected files: no-op (nothing worth bin-packing)
    assert t.optimize(spark, small_files_below=64 << 10) == v


def test_small_files_below_refuses_with_purge(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_one_row(spark, 1))
    with pytest.raises(ValueError, match="small_files_below"):
        t.optimize(spark, purge_dvs=0.1, small_files_below=1 << 20)


def test_auto_compact_bounds_file_count(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_one_row(spark, 0))
    t.set_auto_compact(min_files=5, small_bytes=1 << 20, target_files=1)
    for i in range(1, 12):
        t.append(_one_row(spark, i))
    # without compaction this would be 12 files; the ticks keep it
    # under the threshold + the batch between sweeps
    n_files = len(t._snapshot_files())
    assert n_files <= 5, n_files
    got = sorted(r["id"] for r in t.read(spark).collect())
    assert got == list(range(12))  # bit-identical data throughout
    assert any(h["op"] == "optimize" for h in t.history())
    # disable: file count grows freely again
    t.set_auto_compact(enabled=False)
    base_files = len(t._snapshot_files())
    for i in range(20, 26):
        t.append(_one_row(spark, i))
    # growth is unchecked again (>= one new file per append; tiny
    # local appends can emit 2 part files each)
    assert len(t._snapshot_files()) >= base_files + 6


def test_auto_compact_streaming_sink(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_one_row(spark, 0))
    t.set_auto_compact(min_files=4, small_bytes=1 << 20, target_files=1)
    for b in range(1, 10):
        t.append_stream_batch(_one_row(spark, b), "appA", b)
    assert len(t._snapshot_files()) <= 4
    got = sorted(r["id"] for r in t.read(spark).collect())
    assert got == list(range(10))
    # replays still dedup exactly-once through the compacted history
    assert t.append_stream_batch(_one_row(spark, 5), "appA", 5) is None
