"""Checkpoint publication atomicity (r13 — VERDICT r12 #1 root cause).

The r12 multi-writer fuzz observed `ArrowInvalid('Parquet file size is
0 bytes')` in a writer thread. Root cause: `_checkpoint`'s driver path
streamed `pq.write_table` INTO the final checkpoint name via
`open(p, "xb")`, so between the create and the footer landing the file
was visible at 0 bytes / truncated. Any concurrent writer's
`_ckpt_live_rows` listed the version, `_complete_ckpt_parquet` served
it (`os.path.exists`), and pyarrow raised — a torn read in the layer
whose whole point is that torn reads cannot happen (the Spark
checkpoint path was already atomic: it hard-links fully-written part
files).

Fix shape, pinned here:
1. write-to-tmp + `os.link` publish — the final name is either absent
   or a complete parquet (first-writer-wins preserved via EEXIST);
2. `_complete_ckpt_parquet` rejects sub-minimum-size (<12-byte) parts,
   so a pre-fix torn file on disk marks the version incomplete instead
   of bricking every Spark reader of it forever;
3. `_ckpt_live_rows` treats pyarrow's ArrowInvalid (a ValueError) as
   "no usable checkpoint" instead of letting it escape into DML.
"""

from __future__ import annotations

import os

import pytest

from hephaestus_spark.sources.txlog import (
    CHECKPOINT_INTERVAL,
    TxTable,
    _ckpt_pq_path,
)


def _commit_to_checkpoint(spark, path):
    """Append until the table has at least one checkpoint version."""
    t = TxTable(path)
    # versions are 0-based: the interval checkpoint fires at version
    # CHECKPOINT_INTERVAL, i.e. the (INTERVAL+1)-th commit
    for i in range(CHECKPOINT_INTERVAL + 1):
        t.append(spark.createDataFrame([(i, float(i))], "id long, val double"))
    assert t._checkpoint_versions(), "expected an interval checkpoint"
    return t


def test_checkpoint_never_visible_incomplete(spark, tmp_path, monkeypatch):
    """The final checkpoint name must not exist while its bytes are
    still being written — the exact interleaving the r12 fuzz hit."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    seen: list[tuple[str, bool]] = []
    orig = pq.write_table

    def spy(tbl, where, *a, **kw):
        # At write time, NO final-name checkpoint parquet of a version
        # that is still being materialized may be on disk incomplete.
        d = os.path.join(path, "_txlog")
        if os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".parquet") and ".tmp" not in f:
                    p = os.path.join(d, f)
                    seen.append((f, os.path.getsize(p) >= 12))
        return orig(tbl, where, *a, **kw)

    monkeypatch.setattr(pq, "write_table", spy)
    _commit_to_checkpoint(spark, path)
    # every checkpoint file observed during any write was complete
    assert all(ok for _f, ok in seen), seen


def test_crashed_checkpoint_writer_leaves_no_final_file(
    spark, tmp_path, monkeypatch
):
    """A writer dying mid-checkpoint-write must leave the final name
    absent (the log regex ignores the .tmp leftover), so readers fall
    back to the fold instead of seeing a torn file."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    t = TxTable(path)
    for i in range(CHECKPOINT_INTERVAL):
        t.append(spark.createDataFrame([(i, float(i))], "id long, val double"))

    calls = {"n": 0}

    def boom(tbl, where, *a, **kw):
        calls["n"] += 1
        raise RuntimeError("simulated crash mid checkpoint write")

    monkeypatch.setattr(pq, "write_table", boom)
    # the interval commit triggers the checkpoint; the commit itself
    # must survive a checkpoint failure (checkpointing is best-effort)
    try:
        t.append(
            spark.createDataFrame([(99, 99.0)], "id long, val double")
        )
    except RuntimeError:
        pass  # acceptable: the append's data+log landed before
    assert calls["n"] >= 1
    v = t.latest_version()
    ck = _ckpt_pq_path(path, CHECKPOINT_INTERVAL)
    assert not os.path.exists(ck), "torn final checkpoint visible"
    assert t._complete_ckpt_parquet(CHECKPOINT_INTERVAL) == []
    # reads keep working off the fold
    monkeypatch.undo()
    assert t.read(spark).count() == v + 1


def test_zero_byte_checkpoint_is_invisible(spark, tmp_path):
    """A pre-r13 torn artifact (0-byte final checkpoint) on disk must
    be treated as an incomplete checkpoint everywhere: completeness,
    fold, Spark-side row estimate, and DML all fall back."""
    path = str(tmp_path / "t")
    t = _commit_to_checkpoint(spark, path)
    before = t.read(spark).count()
    v = t.latest_version()
    nxt = v + 1
    torn = _ckpt_pq_path(path, nxt)
    open(torn, "wb").close()  # the exact artifact the old writer exposed
    assert os.path.getsize(torn) == 0
    t2 = TxTable(path)
    assert t2._complete_ckpt_parquet(nxt) == []
    assert t2._load_checkpoint(nxt) is None
    t2._ckpt_live_rows()  # must not raise ArrowInvalid
    assert t2.read(spark).count() == before
    # DML planning (the r12 fuzz's failing call path) survives too
    t2.update(spark, "id = 0", {"val": "val + 1.0"})
    got = {r["id"]: r["val"] for r in t2.read(spark).collect()}
    assert got[0] == 1.0


def test_zero_byte_multipart_part_marks_set_incomplete(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _commit_to_checkpoint(spark, path)
    nxt = t.latest_version() + 1
    # a "complete-by-count" 2-part set with one torn part
    p1 = _ckpt_pq_path(path, nxt, 1, 2)
    p2 = _ckpt_pq_path(path, nxt, 2, 2)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"kind": ["add"], "path": ["x"]}), p1)
    open(p2, "wb").close()
    assert t._complete_ckpt_parquet(nxt) == []
