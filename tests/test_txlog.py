"""Transactional table layer (sources/txlog.py): commit atomicity,
snapshot isolation / time travel, SCD-1 copy-on-write merge, conflict
semantics, and vacuum safety."""

from __future__ import annotations

import os
import threading

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.sources.txlog import CommitConflict, TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, val double")


def test_append_read_and_history(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    assert t.latest_version() == -1
    v0 = t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    v1 = t.append(_df(spark, [(3, "c", 3.0)]))
    assert (v0, v1) == (0, 1)
    got = {r["id"] for r in t.read(spark).collect()}
    assert got == {1, 2, 3}
    assert [h["op"] for h in t.history()] == ["append", "append"]
    # time travel: version 0 predates the second append
    assert {r["id"] for r in t.read(spark, version=0).collect()} == {1, 2}
    with pytest.raises(ValueError):
        TxTable(str(tmp_path / "empty")).read(spark)


def test_merge_scd1_semantics_and_time_travel(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]))
    staged = _df(spark, [(2, "b", 20.0), (3, "c", 3.0), (4, "d", 4.0)])
    v = t.merge(spark, staged, "id", ["name", "val"])
    assert v == 1
    got = {r["id"]: r["val"] for r in t.read(spark).collect()}
    # update (2), keep untouched (1, 3), insert (4)
    assert got == {1: 1.0, 2: 20.0, 3: 3.0, 4: 4.0}
    # the pre-merge snapshot is still fully readable
    old = {r["id"]: r["val"] for r in t.read(spark, version=0).collect()}
    assert old == {1: 1.0, 2: 2.0, 3: 3.0}
    assert [h["op"] for h in t.history()] == ["append", "merge"]


def test_concurrent_appends_all_land(spark, tmp_path):
    """Eight threads race blind appends through the optimistic retry
    loop: every row lands exactly once, versions are distinct."""
    t = TxTable(str(tmp_path / "t"))
    dfs = [_df(spark, [(i, f"r{i}", float(i))]) for i in range(8)]
    errors: list = []

    def work(df):
        try:
            t.append(df)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=work, args=(d,)) for d in dfs]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert t.latest_version() == 7
    rows = t.read(spark).collect()
    assert sorted(r["id"] for r in rows) == list(range(8))


def test_commit_is_exclusive_and_merge_conflicts_loudly(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    # raw commit exclusivity: version 1 can be created exactly once
    t._commit(1, "append", [])
    with pytest.raises(CommitConflict):
        t._commit(1, "append", [])
    # a merge whose snapshot goes stale mid-flight must NOT blind-retry
    t2 = TxTable(str(tmp_path / "t"))
    original_stage = t2._stage

    def stage_with_interloper(df):
        names = original_stage(df)
        # another writer lands between this merge's read and commit
        TxTable(t2.path).append(_df(spark, [(99, "x", 9.0)]))
        return names

    t2._stage = stage_with_interloper
    with pytest.raises(CommitConflict):
        t2.merge(spark, _df(spark, [(1, "a", 5.0)]), "id", ["name", "val"])


def test_vacuum_removes_only_unreferenced_files(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    t.merge(spark, _df(spark, [(1, "a", 2.0)]), "id", ["name", "val"])
    orphan = os.path.join(t.path, "part-orphan-abandoned.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    # inside the grace window NOTHING unreferenced is deleted — the
    # in-flight-commit protection (a racing append's staged files look
    # exactly like this orphan until its log entry lands)
    assert t.vacuum() == []
    assert os.path.exists(orphan)
    deleted = t.vacuum(grace_seconds=0)
    assert deleted == ["part-orphan-abandoned.parquet"]
    # removed-but-historical files survive vacuum: time travel still works
    assert t.read(spark, version=0).collect()[0]["val"] == 1.0
    assert t.read(spark).collect()[0]["val"] == 2.0


def test_stream_batch_commits_are_idempotent(spark, tmp_path):
    """The Delta txn pattern: replaying a (app, batch) already in the
    log is a skip, a different app or batch id is a fresh commit."""
    t = TxTable(str(tmp_path / "t"))
    df = _df(spark, [(1, "a", 1.0)])
    assert t.append_stream_batch(df, "appA", 0) == 0
    assert t.append_stream_batch(df, "appA", 0) is None  # redelivery
    assert t.read(spark).count() == 1
    assert t.append_stream_batch(df, "appA", 1) == 1  # next batch
    assert t.append_stream_batch(df, "appB", 0) == 2  # other app
    assert t.read(spark).count() == 3
    ops = [h["op"] for h in t.history()]
    assert ops == ["streamAppend"] * 3


def test_stream_batch_race_lands_exactly_once(spark, tmp_path):
    """Two replicas racing the SAME micro-batch: the loser's exclusive
    create fails, it re-reads the log, finds its batch id, and skips."""
    t1 = TxTable(str(tmp_path / "t"))
    t2 = TxTable(str(tmp_path / "t"))
    df = _df(spark, [(1, "a", 1.0)])
    # force the race deterministically: t2 commits the batch between
    # t1's dedup check and t1's commit (stage hook, as in the merge test)
    original_stage = t1._stage

    def stage_with_racer(d):
        names = original_stage(d)
        t2.append_stream_batch(df, "app", 5)
        return names

    t1._stage = stage_with_racer
    assert t1.append_stream_batch(df, "app", 5) is None  # loser skips
    assert t1.read(spark).count() == 1


def test_optimize_compacts_without_changing_data(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    for i in range(6):  # six tiny commits -> many small files
        t.append(_df(spark, [(i, f"r{i}", float(i))]))
    before = sorted((r["id"], r["val"]) for r in t.read(spark).collect())
    n_files_before = len(t._snapshot_files())
    assert n_files_before >= 6
    v = t.optimize(spark)
    assert v == 6
    assert len(t._snapshot_files()) < n_files_before
    after = sorted((r["id"], r["val"]) for r in t.read(spark).collect())
    assert after == before
    # pre-compaction versions still resolve to the original files
    assert t.read(spark, version=2).count() == 3
    assert t.history()[-1]["op"] == "optimize"


def test_zone_map_file_skipping(spark, tmp_path):
    """Per-file min/max stats land in the commit and genuinely skip
    files: three disjoint-range appends, a range read scans ONE file
    and returns exactly what a full-scan filter would."""
    t = TxTable(str(tmp_path / "t"))
    for base in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(base + i, f"r{base + i}", float(base + i)) for i in range(10)],
                "id long, name string, val double",
            )
        )
    # stats recorded in the log for numeric cols only
    adds = t._snapshot_adds()
    assert all("id" in a["stats"] and "val" in a["stats"] for a in adds.values())
    assert all("name" not in a["stats"] for a in adds.values())

    keep, total = t.pruned_files("id", 105, 108)
    assert total >= 3 and len(keep) < total
    got = sorted(r["id"] for r in t.read_pruned(spark, "id", 105, 108).collect())
    want = sorted(
        r["id"]
        for r in t.read(spark).filter("id >= 105 AND id <= 108").collect()
    )
    assert got == want == [105, 106, 107, 108]
    # fully out-of-range: zero files survive, result is empty
    keep0, _ = t.pruned_files("id", 10_000, 20_000)
    assert keep0 == []
    assert t.read_pruned(spark, "id", 10_000, 20_000).count() == 0
    # open-ended ranges work and residual filter still applies
    assert t.read_pruned(spark, "id", lo=205).count() == 5
    # time travel composes with pruning: version 0 has only the first file
    keep_v0, total_v0 = t.pruned_files("id", 0, 999, version=0)
    assert total_v0 < total and len(keep_v0) == total_v0


def test_range_clustered_append_prunes_most_files(spark, sf_dir):
    """The x_txlog_pruned_scan layout, effectiveness pinned: orders
    range-clustered on price across 8 files -> a narrow band opens a
    strict minority of them."""
    import pyspark.sql.functions as F

    from hephaestus_spark.sources import load_table

    t = TxTable(str(spark.conf.get("spark.local.dir", "/tmp")) + "/prune-eff")
    import shutil
    shutil.rmtree(t.path, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t.append(
        o.repartitionByRange(8, F.col("o_totalprice")).sortWithinPartitions(
            "o_totalprice"
        )
    )
    keep, total = t.pruned_files("o_totalprice", 100000.0, 200000.0)
    assert total == 8 and 1 <= len(keep) <= 3, (len(keep), total)
    shutil.rmtree(t.path, ignore_errors=True)


def test_pruned_merge_rewrites_only_overlapping_files(spark, tmp_path):
    """prune_on_key merge: a delta touching one key band leaves the
    other files physically untouched (same names survive in the
    snapshot) and produces the IDENTICAL table a full rewrite would."""
    def build(path):
        t = TxTable(str(path))
        for base in (0, 100, 200):
            t.append(
                spark.createDataFrame(
                    [(base + i, f"r{base + i}", float(base + i)) for i in range(10)],
                    "id long, name string, val double",
                ).coalesce(1)  # one file per key band
            )
        return t

    staged = spark.createDataFrame(
        [(105, "r105", 5000.0), (150, "new", 150.0)],
        "id long, name string, val double",
    )
    t_full = build(tmp_path / "full")
    t_pruned = build(tmp_path / "pruned")
    before = set(t_pruned._snapshot_files())
    t_full.merge(spark, staged, "id", ["name", "val"])
    t_pruned.merge(spark, staged, "id", ["name", "val"], prune_on_key=True)
    after = set(t_pruned._snapshot_files())
    # files for bands 0-9 and 200-209 survived untouched in the pruned
    # table; the full rewrite replaced everything
    assert len(before & after) == 2
    assert not set(t_full._snapshot_files()) & before
    got_full = sorted(map(tuple, t_full.read(spark).collect()))
    got_pruned = sorted(map(tuple, t_pruned.read(spark).collect()))
    assert got_full == got_pruned
    # the delta landed: update + insert
    vals = {r["id"]: r["val"] for r in t_pruned.read(spark).collect()}
    assert vals[105] == 5000.0 and vals[150] == 150.0 and len(vals) == 31
