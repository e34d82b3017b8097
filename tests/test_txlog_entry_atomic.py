"""Log-entry publication atomicity (r14 — found by the cross-process
fuzz, VERDICT r13 #1).

``_commit`` previously streamed JSON into the final entry name via
``open(N.json, "x"); json.dump(f)`` — visible at 0 bytes between the
create and the dump to any concurrent PROCESS (threads never saw it:
the GIL keeps two adjacent C-level calls effectively atomic against
pure-Python readers, which is exactly why the thread fuzz stayed green
while ``tests/test_txlog_xproc_fuzz.py`` hit JSONDecodeError on its
first gated run). Fix shape, pinned here:

1. write the complete JSON to ``N.json.<hex>.tmp`` (a name
   ``_versions`` cannot match), publish with ``os.link`` — atomic AND
   exclusive, so an entry is either absent or complete and
   first-writer-wins is preserved via EEXIST;
2. a crash before the link leaves no final entry (the version simply
   never committed) and the tmp is cleaned up on every exit path;
3. a PRE-r14 torn artifact on disk surfaces as a ValueError naming
   the file and the remediation, not a bare JSONDecodeError.
"""

from __future__ import annotations

import json
import os

import pytest

from hephaestus_spark.sources import txlog
from hephaestus_spark.sources.txlog import (
    CommitConflict,
    TxTable,
    _log_path,
)


def _t(spark, tmp_path, rows=3):
    path = str(tmp_path / "t")
    t = TxTable(path)
    t.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(rows)], "id long, val double"
        )
    )
    return t, path


def test_entry_final_name_absent_while_json_dumps(spark, tmp_path, monkeypatch):
    """At the moment a commit's JSON is being serialized, its final
    entry name must not exist — the exact torn window the old code
    exposed."""
    t, path = _t(spark, tmp_path)
    seen: list[bool] = []
    orig = json.dump

    def spy(obj, fp, *a, **kw):
        if isinstance(obj, dict) and "actions" in obj and "version" in obj:
            seen.append(os.path.exists(_log_path(path, obj["version"])))
        return orig(obj, fp, *a, **kw)

    monkeypatch.setattr(txlog.json, "dump", spy)
    t.append(spark.createDataFrame([(9, 9.0)], "id long, val double"))
    assert seen and not any(seen), seen


def test_crash_before_link_leaves_no_entry_and_no_tmp(
    spark, tmp_path, monkeypatch
):
    t, path = _t(spark, tmp_path)
    v_before = t.latest_version()

    def boom(src, dst):
        raise RuntimeError("simulated crash at publish")

    monkeypatch.setattr(txlog.os, "link", boom)
    with pytest.raises(RuntimeError):
        t.append(spark.createDataFrame([(9, 9.0)], "id long, val double"))
    monkeypatch.undo()
    t2 = TxTable(path)
    assert t2.latest_version() == v_before  # the version never committed
    logdir = os.path.join(path, "_txlog")
    assert not [f for f in os.listdir(logdir) if f.endswith(".tmp")]
    # the table keeps working (the staged-but-unreferenced files are
    # invisible; vacuum owns their cleanup)
    assert t2.read(spark).count() == 3


def test_losing_writer_gets_conflict_and_cleans_tmp(spark, tmp_path):
    t, path = _t(spark, tmp_path)
    v = t.latest_version() + 1
    # a racing winner has already published version v
    with open(_log_path(path, v), "w") as f:
        json.dump({"version": v, "op": "append", "actions": [], "ts": 1.0}, f)
    with pytest.raises(CommitConflict):
        t._commit(v, "append", [])
    logdir = os.path.join(path, "_txlog")
    assert not [f for f in os.listdir(logdir) if f.endswith(".tmp")]


def test_pre_r14_torn_entry_surfaces_with_remediation(spark, tmp_path):
    t, path = _t(spark, tmp_path)
    v = t.latest_version() + 1
    open(_log_path(path, v), "w").close()  # the old writer's 0-byte window
    t2 = TxTable(path)
    with pytest.raises(ValueError, match="torn log entry .* pre-r14"):
        t2.read(spark).count()
    # remediation works: removing the artifact restores the table
    os.remove(_log_path(path, v))
    assert TxTable(path).read(spark).count() == 3
