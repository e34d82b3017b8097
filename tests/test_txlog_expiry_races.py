"""Deterministic pins for the expiry-vs-reader races the destructive
cross-process fuzz targets (r15, VERDICT r14 #1): a concurrent
``expire_log`` can destroy a log entry (and the superseded checkpoint
that covered it) BETWEEN a reader's ``_versions`` listing and its
``_read_entry`` — the raw FileNotFoundError is not a defined outcome.
Contract after the fix:

- head-state folds and full log scans RETRY from a fresh listing (the
  newer checkpoint that justified the expiry covers the lost range);
- a fold pinned below the new horizon fails with the defined horizon
  ValueError, never ENOENT;
- the Spark metadata path re-picks the newer checkpoint;
- a change feed surfaces the same loud horizon error mid-read that
  its pre-loop guard gives up front (it must never silently drop
  expired commits' rows).

Each test stages the exact interleaving by triggering a sibling
handle's expire_log from inside the victim's first read of a doomed
entry — the deterministic twin of what the xproc fuzz does with real
processes.
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hephaestus_spark.sources import txlog
from hephaestus_spark.sources.txlog import TxTable


@pytest.fixture
def fast_ckpt(monkeypatch):
    monkeypatch.setattr(txlog, "CHECKPOINT_INTERVAL", 2)


def _mk(path, n_commits=6):
    os.makedirs(path, exist_ok=True)
    t = TxTable(path)
    for i in range(n_commits):
        name = f"part-{i:02d}.parquet"
        pq.write_table(
            pa.table({"id": pa.array([i], pa.int64())}),
            os.path.join(path, name),
        )
        t.commit_names([name])
    return t


def _racy_read_entry(monkeypatch, trigger_version, on_trigger):
    """Patch TxTable._read_entry so the FIRST read of
    ``trigger_version`` first runs ``on_trigger`` (the racing sibling)
    and then proceeds — entry gone by then, exactly the fuzz's window."""
    orig = TxTable._read_entry
    fired = {"done": False}

    def racy(self, v):
        if v == trigger_version and not fired["done"]:
            fired["done"] = True
            on_trigger()
        return orig(self, v)

    monkeypatch.setattr(TxTable, "_read_entry", racy)
    return fired


def test_pinned_fold_racing_expiry_gets_horizon_error(
    tmp_path, monkeypatch, fast_ckpt
):
    path = str(tmp_path / "t")
    _mk(path)  # versions 0..5, checkpoints at 2 and 4
    fired = _racy_read_entry(
        monkeypatch, 3, lambda: TxTable(path).expire_log(retain_versions=0)
    )
    cold = TxTable(path)
    with pytest.raises(ValueError, match="horizon"):
        cold._fold_state(3)
    assert fired["done"]


def test_head_log_scan_retries_past_racing_expiry(
    tmp_path, monkeypatch, fast_ckpt
):
    path = str(tmp_path / "t")
    _mk(path)
    fired = _racy_read_entry(
        monkeypatch, 1, lambda: TxTable(path).expire_log(retain_versions=0)
    )
    hist = TxTable(path).history()
    assert fired["done"]
    # the scan restarted from the post-expiry listing: horizon 4
    assert [e["version"] for e in hist] == [4, 5]


def test_head_fold_retries_past_racing_expiry(
    tmp_path, monkeypatch, fast_ckpt
):
    """A HEAD reader must never fail just because old entries expired:
    hide the newest checkpoint so the fold starts at the older one,
    expire mid-replay, restore the newest — the refold succeeds."""
    path = str(tmp_path / "t")
    t = _mk(path)
    expect = sorted(t._snapshot_files())
    ck4 = glob.glob(
        os.path.join(path, "_txlog", "*0004.checkpoint*.parquet")
    )
    assert ck4, "test premise: checkpoint at v4 exists"
    hidden = [(p, p + ".hidden") for p in ck4]
    for src, dst in hidden:
        shutil.move(src, dst)

    def race():
        for src, dst in hidden:
            shutil.move(dst, src)
        TxTable(path).expire_log(retain_versions=0)

    fired = _racy_read_entry(monkeypatch, 3, race)
    cold = TxTable(path)
    adds, _txns, _dvs, _meta = cold._fold_state()
    assert fired["done"]
    assert sorted(os.path.basename(p) for p in adds) == sorted(
        os.path.basename(p) for p in expect
    )


def test_live_frames_repicks_newer_checkpoint(
    spark, tmp_path, monkeypatch, fast_ckpt
):
    path = str(tmp_path / "t")
    t = _mk(path)
    expect = sorted(os.path.basename(p) for p in t._snapshot_files())
    ck4 = glob.glob(
        os.path.join(path, "_txlog", "*0004.checkpoint*.parquet")
    )
    hidden = [(p, p + ".hidden") for p in ck4]
    for src, dst in hidden:
        shutil.move(src, dst)

    def race():
        for src, dst in hidden:
            shutil.move(dst, src)
        TxTable(path).expire_log(retain_versions=0)

    fired = _racy_read_entry(monkeypatch, 3, race)
    frame, dv_names, _meta = TxTable(path)._live_frames(spark)
    assert fired["done"]
    got = sorted(r["path"] for r in frame.select("path").collect())
    assert got == expect and dv_names == []


def test_change_feed_mid_read_expiry_is_loud(
    tmp_path, monkeypatch, fast_ckpt
):
    path = str(tmp_path / "t")
    _mk(path)
    _racy_read_entry(
        monkeypatch, 3, lambda: TxTable(path).expire_log(retain_versions=0)
    )
    with pytest.raises(ValueError, match="expired below the log horizon"):
        list(TxTable(path)._change_entries(2, 5, True))
