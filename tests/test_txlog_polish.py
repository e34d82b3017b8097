"""r11 polish: monotone in-commit timestamps (Delta's
inCommitTimestamps — TIMESTAMP AS OF has a well-ordered answer even
under backwards wall clocks), VACUUM DRY RUN, and free-form table
properties (TBLPROPERTIES) surfaced through DESCRIBE DETAIL."""

from __future__ import annotations

import os
import time

import pytest

from hephaestus_spark.sources import txlog
from hephaestus_spark.sources.txlog import TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val double")


def test_in_commit_timestamps_monotone_under_clock_skew(
    spark, tmp_path, monkeypatch
):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    real = time.time()
    # a writer whose clock runs 100s BEHIND commits next
    monkeypatch.setattr(txlog.time, "time", lambda: real - 100.0)
    t.append(_df(spark, [(2, 2.0)]))
    monkeypatch.undo()
    t.append(_df(spark, [(3, 3.0)]))
    stamps = [e["ts"] for e in t._read_log()]
    assert stamps == sorted(stamps) and len(set(stamps)) == 3
    # TIMESTAMP AS OF resolves each version uniquely
    for v, ts in enumerate(stamps):
        assert t.version_at(ts) == v
    got = {r["id"] for r in t.read(spark, timestamp=stamps[1]).collect()}
    assert got == {1, 2}


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]).coalesce(1))
    # orphan a staged file (aborted commit shape)
    orphan = os.path.join(t.path, "part-orphan-00000-x.snappy.parquet")
    live = t._snapshot_files()[0]
    import shutil

    shutil.copy2(os.path.join(t.path, live), orphan)
    old = time.time() - 10_000
    os.utime(orphan, (old, old))
    reported = t.vacuum(grace_seconds=3600.0, dry_run=True)
    assert reported == ["part-orphan-00000-x.snappy.parquet"]
    assert os.path.exists(orphan)  # nothing touched
    deleted = t.vacuum(grace_seconds=3600.0)
    assert deleted == reported and not os.path.exists(orphan)
    assert t.read(spark).count() == 1


def test_table_properties_roundtrip(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.set_properties({"owner": "data-eng", "sla.hours": 24})
    assert t.properties() == {"owner": "data-eng", "sla.hours": "24"}
    v = t.set_properties({"sla.hours": None, "tier": "gold"})
    assert t.properties() == {"owner": "data-eng", "tier": "gold"}
    # historical versions keep their property state
    assert t.properties(v - 1) == {"owner": "data-eng", "sla.hours": "24"}
    assert t.detail()["properties"] == {"owner": "data-eng", "tier": "gold"}
    assert t.history()[-1]["op"] == "setProperties"
    # properties never gate reads or writes
    t.append(_df(spark, [(2, 2.0)]))
    assert t.read(spark).count() == 2
