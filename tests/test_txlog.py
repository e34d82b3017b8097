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

    def stage_with_interloper(df, **kw):
        names = original_stage(df, **kw)
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

    def stage_with_racer(d, **kw):
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
    # stats recorded for numeric cols as [min, max]; strings (r8) as
    # bound dicts with exactness flags (short names here: exact)
    adds = t._snapshot_adds()
    assert all("id" in a["stats"] and "val" in a["stats"] for a in adds.values())
    for a in adds.values():
        st = a["stats"]["name"]
        assert st["lo_exact"] and st["hi_exact"] and st["lo"] <= st["hi"]

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


def test_checkpoint_bounds_log_reads_and_txn_map(spark, tmp_path):
    """r8 (VERDICT r7 #1): after N commits, checkpoint files exist at
    interval boundaries, a FRESH instance's snapshot fold opens at most
    interval+1 log entries (not all N), the per-app txn map survives
    the checkpoint (a checkpointed replay is still skipped without a
    full scan), and time travel to pre-checkpoint versions is intact."""
    from hephaestus_spark.sources import txlog as tx

    t = TxTable(str(tmp_path / "t"))
    df = _df(spark, [(1, "a", 1.0)])
    n = 2 * tx.CHECKPOINT_INTERVAL + 2  # 22 commits -> ckpts at 10, 20
    for i in range(n):
        assert t.append_stream_batch(df, "ingest", i) == i
    assert t._checkpoint_versions() == [
        tx.CHECKPOINT_INTERVAL,
        2 * tx.CHECKPOINT_INTERVAL,
    ]
    import json as _json
    import os as _os

    hint = _os.path.join(t.path, "_txlog", "_last_checkpoint")
    with open(hint) as f:
        assert _json.load(f)["version"] == 2 * tx.CHECKPOINT_INTERVAL

    # fresh instance (cold cache): count actual log-entry opens
    fresh = TxTable(str(tmp_path / "t"))
    opened: list[int] = []
    orig = TxTable._read_entry
    fresh._read_entry = lambda v: (opened.append(v), orig(fresh, v))[1]
    assert len(fresh._snapshot_files()) >= n  # >=1 data file per commit
    assert len(opened) <= tx.CHECKPOINT_INTERVAL + 1, opened
    assert all(v > 2 * tx.CHECKPOINT_INTERVAL for v in opened)

    # checkpointed (app, batch) replay: skipped via the txn map, again
    # without reading pre-checkpoint entries
    opened.clear()
    assert fresh.append_stream_batch(df, "ingest", 3) is None
    assert all(v > 2 * tx.CHECKPOINT_INTERVAL for v in opened)
    # warm instance: a second fold reads NOTHING (cache hit)
    opened.clear()
    fresh._snapshot_files()
    assert opened == []

    # time travel below / between checkpoints still resolves correctly
    assert fresh.read(spark, version=0).count() == 1
    assert fresh.read(spark, version=tx.CHECKPOINT_INTERVAL + 5).count() == (
        tx.CHECKPOINT_INTERVAL + 6
    )
    assert len(fresh.history()) == n  # audit path unaffected
    assert fresh.read(spark).count() == n


def test_string_zone_maps_prune_and_truncation_is_safe(spark, tmp_path):
    """r8 (VERDICT r7 #5): string zone maps prune when bounds are exact,
    and the classic truncation trap — long shared-prefix keys whose
    capped max UNDER-estimates the true max — widens instead of
    narrowing the keep-set (read_pruned == full-scan filter)."""
    # exact short strings: three disjoint key bands -> real pruning
    t = TxTable(str(tmp_path / "short"))
    for lo_ch in ("a", "m", "z"):
        t.append(
            spark.createDataFrame(
                [(f"{lo_ch}{i:02d}", i) for i in range(10)],
                "key string, v long",
            ).coalesce(1)
        )
    keep, total = t.pruned_files("key", "m00", "m99")
    assert total == 3 and len(keep) == 1
    got = sorted(r["key"] for r in t.read_pruned(spark, "key", "m00", "m99").collect())
    want = sorted(
        r["key"]
        for r in t.read(spark).filter("key >= 'm00' AND key <= 'm99'").collect()
    )
    assert got == want and len(got) == 10

    # truncation trap: keys share a 40-char prefix, far past the cap.
    # Capped bounds are identical prefixes with hi_exact=False; a naive
    # pruner would skip BOTH files for a band above the stored hi.
    p = "Q" * 40
    t2 = TxTable(str(tmp_path / "prefix"))
    t2.append(
        spark.createDataFrame(
            [(f"{p}{i:04d}", i) for i in range(100)], "key string, v long"
        ).coalesce(1)
    )
    t2.append(
        spark.createDataFrame(
            [(f"{p}{i:04d}", i) for i in range(5000, 5100)],
            "key string, v long",
        ).coalesce(1)
    )
    st = next(iter(t2._snapshot_adds().values()))["stats"]["key"]
    assert len(st["lo"]) == TxTable.STRING_STATS_CAP
    assert not st["hi_exact"]  # capped -> inexact upper bound
    lo_q, hi_q = f"{p}5050", f"{p}5060"
    keep2, total2 = t2.pruned_files("key", lo_q, hi_q)
    assert total2 == 2 and len(keep2) == 2  # inexact hi: nothing skipped
    got2 = sorted(
        r["key"] for r in t2.read_pruned(spark, "key", lo_q, hi_q).collect()
    )
    want2 = sorted(
        r["key"]
        for r in t2.read(spark)
        .filter((F.col("key") >= lo_q) & (F.col("key") <= hi_q))
        .collect()
    )
    assert got2 == want2 and len(got2) == 11


def test_optimize_cluster_by_restores_pruning(spark, tmp_path):
    """r8 (VERDICT r7 #6): interleaved appends destroy clustering (every
    file spans the whole key range -> zero pruning); OPTIMIZE with
    cluster_by rewrites into disjoint key ranges and a narrow band then
    prunes >= 80% of files, with the data bit-identical."""
    t = TxTable(str(tmp_path / "t"))
    for start in range(5):  # round-robin ids: every file spans 0..995
        t.append(
            spark.createDataFrame(
                [(i, f"r{i}", float(i)) for i in range(start, 1000, 5)],
                "id long, name string, val double",
            ).coalesce(1)
        )
    keep0, total0 = t.pruned_files("id", 100, 150)
    assert total0 == 5 and len(keep0) == 5  # no pruning possible
    before = sorted((r["id"], r["val"]) for r in t.read(spark).collect())

    t.optimize(spark, target_files=10, cluster_by="id")
    keep1, total1 = t.pruned_files("id", 100, 150)
    assert total1 >= 8  # range partitioner produced real file spread
    assert len(keep1) / total1 <= 0.2, (len(keep1), total1)
    after = sorted((r["id"], r["val"]) for r in t.read(spark).collect())
    assert after == before
    got = sorted(r["id"] for r in t.read_pruned(spark, "id", 100, 150).collect())
    assert got == list(range(100, 151))


def test_vacuum_reclaims_aborted_stage_dirs(spark, tmp_path):
    """r8 (ADVICE): a writer that dies inside _stage leaves its staging
    directory behind; vacuum sweeps it after the grace window and never
    inside it (in-flight commits stage before they log)."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    junk = os.path.join(t.path, "_stage-deadbeef0000")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-00000.parquet"), "wb") as f:
        f.write(b"abandoned")
    assert t.vacuum() == []  # grace window protects in-flight stages
    assert os.path.isdir(junk)
    assert t.vacuum(grace_seconds=0) == ["_stage-deadbeef0000"]
    assert not os.path.exists(junk)
    assert t.read(spark).count() == 1


def test_delete_rewrites_only_hit_files(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    rows = [(i, f"n{i}", float(i)) for i in range(40)]
    t.append(
        _df(spark, rows).repartitionByRange(4, F.col("id")).sortWithinPartitions("id")
    )
    pre = t.latest_version()
    # the range [10, 19] lives in one of the 4 ranged files
    v, rewritten, untouched = t.delete(
        spark, "id BETWEEN 10 AND 19", prune_column="id", lo=10, hi=19
    )
    assert v == pre + 1
    assert rewritten >= 1 and untouched >= 2, (rewritten, untouched)
    got = sorted(r["id"] for r in t.read(spark).collect())
    assert got == [i for i in range(40) if not 10 <= i <= 19]
    # time travel across the destructive op
    assert t.read(spark, version=pre).count() == 40
    # a delete with no matching rows rewrites nothing and keeps the version
    v2, rw2, _un2 = t.delete(spark, "id = 999", prune_column="id", lo=999, hi=999)
    assert (v2, rw2) == (v, 0)


def test_read_changes_skips_optimize_and_rejects_rewrites(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))          # v0
    t.append(_df(spark, [(2, "b", 2.0)]))          # v1
    t.optimize(spark)                              # v2: rehouses rows 1-2
    t.append(_df(spark, [(3, "c", 3.0)]))          # v3
    feed = t.read_changes(spark, since_version=0).collect()
    assert sorted((r["id"], r["_commit_version"]) for r in feed) == [(2, 1), (3, 3)]
    # empty range -> empty frame with the feed schema
    assert t.read_changes(spark, since_version=3).count() == 0
    # r11 (VERDICT r10 #2): a MERGE in range is served as Delta-CDF
    # rows — changed keys emit preimage+postimage, unchanged keys
    # (merely re-housed into new files) emit NOTHING
    t.merge(spark, _df(spark, [(1, "a", 10.0), (9, "i", 9.0)]), "id",
            ["name", "val"])                       # v4
    feed4 = t.read_changes(spark, since_version=3).collect()
    got = sorted((r["id"], r["_change_type"], r["val"]) for r in feed4)
    assert got == [
        (1, "update_postimage", 10.0),
        (1, "update_preimage", 1.0),
        (9, "insert", 9.0),
    ]
    # the file-level feed (streaming source) still refuses rewrites
    with pytest.raises(ValueError, match="append-only"):
        t.change_files(0)
    # a pre-r11 merge commit carries no operation info -> still raises
    import json as _json
    from hephaestus_spark.sources.txlog import _log_path

    p = _log_path(t.path, 4)
    entry = _json.loads(open(p).read())
    del entry["info"]
    os.remove(p)
    with open(p, "x") as f:
        _json.dump(entry, f)
    with pytest.raises(ValueError, match="operation info"):
        TxTable(t.path).read_changes(spark, since_version=3)


def test_optimize_zorder_two_keys_prunes_on_both_dimensions(spark, tmp_path):
    """Multi-key clustered OPTIMIZE: after z-order clustering, zone
    maps must skip files for a narrow filter on EITHER dimension —
    the property a single-column sort cannot give (sorting on x makes
    every file cover the full y range)."""
    t = TxTable(str(tmp_path / "t"))
    # 32x32 grid; ingest order is row-major = clustered on x only
    rows = [(i, i % 32, i // 32) for i in range(1024)]
    t.append(
        spark.createDataFrame(rows, "id long, x long, y long").coalesce(4)
    )
    t.optimize(spark, target_files=16, cluster_by=["x", "y"])
    kept_x, total = t.pruned_files("x", 0, 3)
    kept_y, _ = t.pruned_files("y", 0, 3)
    assert total >= 8
    assert len(kept_x) <= total // 2, (len(kept_x), total)
    assert len(kept_y) <= total // 2, (len(kept_y), total)
    # skipping loses nothing on either dimension
    assert t.read_pruned(spark, "x", 0, 3).count() == 4 * 32
    assert t.read_pruned(spark, "y", 0, 3).count() == 4 * 32


def test_parquet_checkpoints_format_parts_and_legacy(spark, tmp_path, monkeypatch):
    """r9 (VERDICT r8 #3): checkpoints are parquet — columnar,
    part-bounded, Spark-readable — not a driver-parsed JSON blob.
    Asserts (a) interval checkpoints land as .checkpoint.parquet,
    (b) a many-file table splits into the declared part set and a cold
    fold reads ONLY the parquet checkpoint + the log tail, (c) an
    incomplete part set is rejected in favor of the previous
    checkpoint (crash-mid-multipart safety), (d) checkpoint_df serves
    the state through Spark with typed columns, and (e) a pre-r9 JSON
    checkpoint still loads."""
    import json as _json

    from hephaestus_spark.sources import txlog as tx

    # (a)+(b): force multi-part with a tiny part bound; each append of
    # 4 files x 10 commits => 40-add fold at v9 -> 3 parts of <=16
    monkeypatch.setattr(tx, "CHECKPOINT_PART_ROWS", 16)
    t = TxTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, "x", float(i)) for i in range(8)], "id long, name string, val double"
    ).repartition(4)
    for i in range(tx.CHECKPOINT_INTERVAL + 2):  # 12 commits, ckpt at 9... 
        t.append_stream_batch(df, "ingest", i)
    cks = t._checkpoint_versions()
    assert cks, "no checkpoint written"
    files = t._checkpoint_paths(cks[-1])
    assert files and all(f.endswith(".parquet") for f in files)
    assert len(files) > 1, "expected a multi-part checkpoint"
    # declared part count matches the pointer
    hint = os.path.join(t.path, "_txlog", "_last_checkpoint")
    with open(hint) as f:
        ptr = _json.load(f)
    assert ptr["version"] == cks[-1] and ptr["parts"] == len(files)

    # cold fold: only tail entries are opened, result complete
    fresh = TxTable(str(tmp_path / "t"))
    opened: list[int] = []
    orig = TxTable._read_entry
    fresh._read_entry = lambda v: (opened.append(v), orig(fresh, v))[1]
    n_files = len(fresh._snapshot_files())
    assert n_files == 4 * (tx.CHECKPOINT_INTERVAL + 2)
    assert all(v > cks[-1] for v in opened), opened

    # (d) checkpoint_df: typed columns through Spark, no driver parse
    cdf = fresh.checkpoint_df(spark)
    assert cdf is not None
    assert {"kind", "path", "rows", "v", "payload"} <= set(cdf.columns)
    agg = cdf.filter(F.col("kind") == "add").agg(
        F.count("*").alias("files"), F.sum("rows").alias("rows")
    ).first()
    # state at the ckpt version v10 = commits v0..v10 inclusive
    assert agg["files"] == 4 * (tx.CHECKPOINT_INTERVAL + 1)
    assert agg["rows"] == 8 * (tx.CHECKPOINT_INTERVAL + 1)

    # (c) incomplete part set: drop one part of the newest checkpoint;
    # the loader must fall back (here: to folding more tail) yet stay
    # correct
    os.remove(files[0])
    assert fresh._load_checkpoint(cks[-1]) is None
    fresh2 = TxTable(str(tmp_path / "t"))
    assert len(fresh2._snapshot_files()) == n_files

    # (e) legacy JSON checkpoint loads: write the old format by hand at
    # the same version and confirm the loader prefers parquet when
    # present but accepts JSON when that's all there is
    t2 = TxTable(str(tmp_path / "legacy"))
    for i in range(tx.CHECKPOINT_INTERVAL + 1):
        t2.append_stream_batch(df.coalesce(1), "ingest", i)
    v = t2._checkpoint_versions()[-1]
    adds, txns, dvs, _meta = t2._fold_state(v)
    legacy = {"version": v, "adds": adds, "txns": txns, "dvs": dvs}
    for p in t2._checkpoint_paths(v):
        os.remove(p)
    with open(os.path.join(t2.path, "_txlog", f"{v:020d}.checkpoint.json"), "w") as f:
        _json.dump(legacy, f)
    cold = TxTable(str(tmp_path / "legacy"))
    opened2: list[int] = []
    cold._read_entry = lambda vv: (opened2.append(vv), orig(cold, vv))[1]
    assert len(cold._snapshot_files()) == tx.CHECKPOINT_INTERVAL + 1
    assert all(x > v for x in opened2), opened2


def test_column_mapping_rename_drop_and_time_travel(spark, tmp_path):
    """r9 (VERDICT r8 #5): metadata-only column rename/drop via a
    logical->physical mapping (Delta column-mapping idea). A rename
    touches no data file; pre-rename snapshots keep their names under
    time travel; post-rename appends write the SAME physical column;
    a drop hides the bytes without rewriting; name resurrection is
    refused; zone-map pruning follows the logical name; the mapping
    survives checkpoints into a cold instance."""
    from hephaestus_spark.sources import txlog as tx

    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    data_files_before = sorted(
        f for f in os.listdir(t.path) if f.endswith(".parquet")
    )

    v_ren = t.rename_column(spark, "val", "amount")
    # metadata-only: not one data file changed
    assert sorted(
        f for f in os.listdir(t.path) if f.endswith(".parquet")
    ) == data_files_before
    assert t.read(spark).columns == ["id", "name", "amount"]
    # time travel: the pre-rename snapshot keeps its old name AND data
    old = t.read(spark, version=v_ren - 1)
    assert old.columns == ["id", "name", "val"]
    assert {r["val"] for r in old.collect()} == {1.0, 2.0}

    # post-rename append under the NEW logical name: lands in the same
    # physical column, so old and new files read as ONE column
    t.append(
        spark.createDataFrame(
            [(3, "c", 30.0)], "id long, name string, amount double"
        )
    )
    got = {r["id"]: r["amount"] for r in t.read(spark).collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 30.0}

    # zone-map pruning translates the logical name to the physical one
    kept, total = t.pruned_files("amount", 25.0, 35.0)
    assert total >= 2 and len(kept) < total
    assert {r["id"] for r in t.read_pruned(spark, "amount", 25.0, 35.0).collect()} == {3}

    # merge on the renamed column goes through the same logical view
    t.merge(
        spark,
        spark.createDataFrame(
            [(2, "b", 200.0), (4, "d", 4.0)], "id long, name string, amount double"
        ),
        "id",
        ["name", "amount"],
    )
    assert {r["id"]: r["amount"] for r in t.read(spark).collect()} == {
        1: 1.0, 2: 200.0, 3: 30.0, 4: 4.0,
    }

    # drop: bytes stay, current reads lose the column, history keeps it
    v_drop = t.drop_column(spark, "name")
    assert t.read(spark).columns == ["id", "amount"]
    assert t.read(spark, version=v_drop - 1).columns == ["id", "name", "amount"]

    # resurrection refused for BOTH retired physicals ('val' renamed
    # away, 'name' dropped)
    with pytest.raises(ValueError, match="collides"):
        t.append(
            spark.createDataFrame([(9, "zz", 9.0)], "id long, name string, amount double")
        )
    with pytest.raises(ValueError, match="collides"):
        t.append(
            spark.createDataFrame([(9, 9.0, 9.0)], "id long, val double, amount double")
        )

    # a genuinely new column still widens in
    t.append(
        spark.createDataFrame([(5, 5.0, "ok")], "id long, amount double, note string")
    )
    assert set(t.read(spark).columns) == {"id", "amount", "note"}

    # mapping survives checkpoints: push past an interval boundary and
    # fold COLD from the checkpoint only (no full log scan)
    small = spark.createDataFrame([(100, 0.0)], "id long, amount double").coalesce(1)
    while t.latest_version() % tx.CHECKPOINT_INTERVAL != 0:
        t.append(small)
    cold = TxTable(str(tmp_path / "t"))
    opened: list[int] = []
    orig = TxTable._read_entry
    cold._read_entry = lambda v: (opened.append(v), orig(cold, v))[1]
    assert "amount" in cold.read(spark).columns
    assert "name" not in cold.read(spark).columns
    ck = cold._checkpoint_versions()[-1]
    assert all(v > ck for v in opened), (ck, opened)
    # and time travel across the rename still resolves from cold state
    assert cold.read(spark, version=v_ren - 1).columns == ["id", "name", "val"]


def test_unknown_reader_feature_refuses_to_serve(spark, tmp_path):
    """r9 protocol guard: a table whose metadata demands a feature this
    code doesn't implement must FAIL on read — the alternative is
    silently serving a wrong snapshot (the exact failure mode a
    column-mapped table causes in mapping-unaware code)."""
    import json as _json

    from hephaestus_spark.sources import txlog as tx

    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    t.rename_column(spark, "val", "amount")  # stamps column_mapping
    assert t.read(spark).columns == ["id", "name", "amount"]  # supported

    # forge a future feature the current code does not know
    v = t.latest_version() + 1
    entry = {
        "version": v,
        "op": "future_op",
        "actions": [
            {"meta": {"mapping": {}, "dropped": [], "features": ["row_tracking_v9"]}}
        ],
        "ts": 0,
    }
    with open(os.path.join(t.path, "_txlog", f"{v:020d}.json"), "w") as f:
        _json.dump(entry, f)
    cold = TxTable(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="row_tracking_v9"):
        cold.read(spark)
    # time travel BELOW the forged commit still serves fine
    assert cold.read(spark, version=v - 1).count() == 1


def test_unknown_writer_feature_refuses_to_commit(spark, tmp_path):
    """r10 protocol guard (writer half): a table whose metadata demands
    a WRITER feature this code doesn't implement must refuse to commit
    — readable-but-not-writable is a real state (reading a
    column-mapped table needs only the projection; writing it needs
    the name translation), so the read guard alone is not enough."""
    import json as _json

    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    # forge a meta demanding an exotic writer feature but no exotic
    # READER feature: the table stays readable, only commits refuse
    v = t.latest_version() + 1
    entry = {
        "version": v,
        "op": "future_op",
        "actions": [{"meta": {"writer_features": ["fancy_clustering_v12"]}}],
        "ts": 0,
    }
    with open(os.path.join(t.path, "_txlog", f"{v:020d}.json"), "w") as f:
        _json.dump(entry, f)
    cold = TxTable(str(tmp_path / "t"))
    assert cold.read(spark).count() == 1  # reads still fine
    with pytest.raises(ValueError, match="fancy_clustering_v12"):
        cold.append(_df(spark, [(2, "b", 2.0)]))
    with pytest.raises(ValueError, match="writer features"):
        cold.delete(spark, "id = 1")
    # the supported features commit freely (regression guard)
    t2 = TxTable(str(tmp_path / "t2"))
    t2.append(_df(spark, [(1, "a", 1.0)]))
    t2.rename_column(spark, "val", "amount")  # stamps column_mapping
    t2.append(
        spark.createDataFrame([(2, "b", 2.0)], "id long, name string, amount double")
    )
    assert t2.read(spark).count() == 2


def test_restore_republishes_an_old_snapshot(spark, tmp_path):
    """RESTORE (r10, Delta semantics): rollback lands as a NEW commit;
    every intermediate version stays readable; a later append works on
    the restored state; vacuum cannot reclaim restored files."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))      # v0
    t.append(_df(spark, [(3, "c", 3.0)]))                      # v1
    t.delete(spark, "id = 1")                                  # v2 (CoW)
    v = t.restore(spark, 0)                                    # v3
    assert v == 3
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2}
    # history is intact: the pre-restore states all still serve
    assert {r["id"] for r in t.read(spark, version=2).collect()} == {2, 3}
    assert {r["id"] for r in t.read(spark, version=1).collect()} == {1, 2, 3}
    assert t.history()[-1]["op"] == "restore"
    # the table keeps working after the restore
    t.append(_df(spark, [(4, "d", 4.0)]))                      # v4
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2, 4}
    # vacuum safety: the restored files are live references
    assert t.vacuum(grace_seconds=0.0) == []
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2, 4}
    # a no-op restore (already at the target state) commits nothing
    latest = t.latest_version()
    assert t.restore(spark, latest) == latest
    # out-of-range targets are refused loudly
    with pytest.raises(ValueError, match="log spans"):
        t.restore(spark, 99)


def test_restore_undoes_and_preserves_deletion_vectors(spark, tmp_path):
    """Restoring across delete_mor commits: a post-target tombstone is
    undone (its rows come back), a pre-target one is preserved (its
    rows stay hidden) — the remove+add diff clears vectors and the
    target version's vectors are re-attached in the same commit."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"n{i}", float(i)) for i in range(8)]))  # v0
    t.delete_mor(spark, "id = 1")                                     # v1
    t.delete_mor(spark, "id = 5")                                     # v2
    v = t.restore(spark, 1)                                           # v3
    got = {r["id"] for r in t.read(spark).collect()}
    assert got == {0, 2, 3, 4, 5, 6, 7}  # id=5 back, id=1 still gone
    # tombstone accounting agrees with the data
    s = t.stats_summary()
    assert (s["count"], s["count_exact"]) == (7, True)
    # time travel across the restore still shows both deletes
    assert {r["id"] for r in t.read(spark, version=2).collect()} == {
        0, 2, 3, 4, 6, 7,
    }
    # restore all the way to v0: every row returns
    t.restore(spark, 0)
    assert t.read(spark).count() == 8


def test_restore_conflicts_with_racing_writer(spark, tmp_path):
    """The restore diff depends on the snapshot read: a commit that
    lands in between must surface as CommitConflict, not be silently
    clobbered by the rollback."""
    import json as _json

    from hephaestus_spark.sources.txlog import _log_path

    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))  # v0
    t.append(_df(spark, [(2, "b", 2.0)]))  # v1

    orig_fold = t._fold_state
    raced = {"done": False}

    def fold_and_race(upto=None):
        out = orig_fold(upto)
        if not raced["done"]:
            raced["done"] = True
            winner = {"version": 2, "op": "append", "actions": [], "ts": 0.0}
            with open(_log_path(t.path, 2), "x") as f:
                _json.dump(winner, f)
        return out

    t._fold_state = fold_and_race
    with pytest.raises(CommitConflict):
        t.restore(spark, 0)


def test_restore_partitioned_table_keeps_layout(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "d1", 1.0), (2, "d2", 2.0)], "id long, day string, val double"
    )
    t.append(df, partition_by=["day"])                                # v0
    t.overwrite_partitions(
        spark,
        spark.createDataFrame([(9, "d1", 9.0)], "id long, day string, val double"),
    )                                                                 # v1
    t.restore(spark, 0)                                               # v2
    got = {r["id"]: r["day"] for r in t.read(spark).collect()}
    assert got == {1: "d1", 2: "d2"}
    assert t.partition_columns() == ["day"]
    # partition pruning still works on the restored snapshot
    keep, total = t.pruned_files("day", "d1", "d1")
    assert len(keep) == 1 and total == 2


def test_spark_side_metadata_avoids_driver_fold(spark, tmp_path, monkeypatch):
    """r10 (VERDICT r9 #6): COUNT and SHOW PARTITIONS on a cold
    instance must answer from the columnar checkpoint THROUGH Spark —
    with the driver-side checkpoint materialization monkeypatched to
    explode, count_spark/partitions_spark still serve the exact
    driver-fold answers (adds, tombstone discounts, partition values,
    tail commits past the checkpoint)."""
    day = ["2024-01-01", "2024-01-02", "2024-01-03"]
    t = TxTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, day[i % 3], float(i)) for i in range(4)],
            "id long, day string, val double",
        ),
        partition_by=["day"],
    )
    for i in range(4, 15):  # cross the interval-10 checkpoint boundary
        t.append(
            spark.createDataFrame(
                [(i, day[i % 3], float(i))], "id long, day string, val double"
            )
        )
    t.delete_mor(spark, "id IN (0, 14)")  # live tombstones (one in the tail)
    truth = t.stats_summary()
    truth_parts = t.partitions()
    assert truth == {"count": 13, "count_exact": True}

    cold = TxTable(t.path)

    def boom(self, version):
        raise AssertionError("driver-side checkpoint materialization")

    monkeypatch.setattr(TxTable, "_load_checkpoint", boom)
    assert cold.count_spark(spark) == truth
    assert cold.partitions_spark(spark) == truth_parts


def test_change_feed_serves_restore_as_row_diff(spark, tmp_path):
    """r10: a RESTORE commit is served by the change feed as its exact
    row-level diff — CoW-deleted rows resurface as inserts, appended
    rows vanish as deletes, and tombstone-state flips emit exactly the
    changed positions in both directions."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"n{i}", float(i)) for i in range(6)]))  # v0
    t.delete_mor(spark, "id = 0")                                     # v1
    t.append(_df(spark, [(10, "x", 10.0)]))                           # v2
    t.delete_mor(spark, "id = 3")                                     # v3
    t.restore(spark, 1)                                               # v4
    # post-restore snapshot: ids 1..5 (id=0 still tombstoned, 10 gone)
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2, 3, 4, 5}
    feed = t.read_changes(spark, since_version=3)
    got = {
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in feed.collect()
    }
    # the v2 append is rolled back (delete), the v3 tombstone is
    # undone (insert); id=0's tombstone predates the target and is
    # PRESERVED — it must not appear in the diff at all
    assert got == {(10, "delete", 4), (3, "insert", 4)}
    # a consumer replaying the whole feed nets out to the snapshot
    full = t.read_changes(spark, since_version=-1)
    ins = sorted(
        (r["id"], r["_commit_version"])
        for r in full.filter("_change_type = 'insert'").collect()
    )
    # 0..5 inserted at v0, 10 at v2, and 3 RE-inserted by the restore
    assert ins == [(0, 0), (1, 0), (2, 0), (3, 0), (3, 4), (4, 0), (5, 0), (10, 2)]
    dels = sorted(
        (r["id"], r["_commit_version"])
        for r in full.filter("_change_type = 'delete'").collect()
    )
    assert dels == [(0, 1), (3, 3), (10, 4)]
    # net replay (inserts minus deletes, latest wins) equals the snapshot
    net = {}
    for r in sorted(full.collect(), key=lambda r: r["_commit_version"]):
        net[r["id"]] = r["_change_type"]
    assert {k for k, v in net.items() if v == "insert"} == {1, 2, 3, 4, 5}


def test_history_operation_metrics(spark, tmp_path):
    """DESCRIBE HISTORY metrics (r10): per-commit files/rows
    added/removed and tombstone counts, from the log alone."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]).coalesce(1))  # v0
    t.delete_mor(spark, "id = 1")                                      # v1
    t.delete(spark, "id = 2")                                          # v2
    h = t.history()
    assert (h[0]["files_added"], h[0]["rows_added"]) == (1, 2)
    assert (h[1]["op"], h[1]["dv_files"], h[1]["files_added"]) == (
        "deleteMor", 1, 0,
    )
    assert h[2]["op"] == "delete" and h[2]["files_removed"] == 1
    assert all(isinstance(e["ts"], float) for e in h)


def test_new_tables_are_schema_tracked(spark, tmp_path):
    """r10 universal schema tracking: the FIRST commit of any table
    publishes the log-owned schema, so every read resolves its schema
    from the log (zero footer I/O at plan time — mergeSchema merges
    every live footer) and writes gain type enforcement for free."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    meta = t._fold_state()[3]
    assert meta and meta.get("schema"), "creation must publish the schema"
    # widening append publishes the union atomically, nulls backfill
    t.append(
        spark.createDataFrame(
            [(2, "b", 2.0, "x")], "id long, name string, val double, tag string"
        )
    )
    rows = {r["id"]: r["tag"] for r in t.read(spark).collect()}
    assert rows == {1: None, 2: "x"}
    # a type change is refused at WRITE time, not discovered at read
    bad = spark.createDataFrame([(3, "c", "oops")], "id long, name string, val string")
    with pytest.raises(ValueError, match="type changes"):
        t.append(bad)
    # stream commits create tracked tables too
    s = TxTable(str(tmp_path / "s"))
    s.append_stream_batch(_df(spark, [(1, "a", 1.0)]), "app", 0)
    assert (s._fold_state()[3] or {}).get("schema")
    with pytest.raises(ValueError, match="is DoubleType"):
        s.append_stream_batch(
            spark.createDataFrame([(2, "b", "no")], "id long, name string, val string"),
            "app",
            1,
        )


def test_legacy_untracked_tables_stay_on_mergeschema(spark, tmp_path):
    """Tables created before r10 carry no log-owned schema; they keep
    reading through mergeSchema and widening appends keep working —
    the upgrade is creation-time only, never a migration."""
    t = TxTable(str(tmp_path / "t"))
    names = t._stage(_df(spark, [(1, "a", 1.0)]))
    t._commit(0, "append", t._add_actions(names))  # pre-r10 shape: no meta
    assert (t._fold_state()[3] or {}) == {}
    assert t.read(spark).count() == 1
    t.append(
        spark.createDataFrame(
            [(2, "b", 2.0, "x")], "id long, name string, val double, tag string"
        )
    )
    assert (t._fold_state()[3] or {}) == {}  # still untracked
    rows = {r["id"]: r["tag"] for r in t.read(spark).collect()}
    assert rows == {1: None, 2: "x"}


def test_commit_names_creation_tracks_schema_from_footers(spark, tmp_path):
    """The native datasource's batch writer lands files and commits
    names; a CREATING commit_names must publish the footer schema so
    externally-written tables are schema-tracked too, and a
    type-conflicting later batch refuses."""
    t = TxTable(str(tmp_path / "t"))
    names = t._stage(_df(spark, [(1, "a", 1.0)]))
    t.commit_names(names)
    meta = t._fold_state()[3]
    assert meta and meta.get("schema")
    assert t.read(spark).count() == 1
    # a widening names-commit unions the schema
    names2 = t._stage(
        spark.createDataFrame(
            [(2, "b", 2.0, "y")], "id long, name string, val double, tag string"
        )
    )
    t.commit_names(names2)
    assert {r["id"]: r["tag"] for r in t.read(spark).collect()} == {1: None, 2: "y"}


def test_timestamp_as_of_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF (r10): reads pin to the newest commit at or
    before the given instant; a pre-history timestamp refuses loudly
    (after expiry the answer below the horizon is unknowable)."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))              # v0
    ts0 = t._read_entry(0)["ts"]
    t.append(_df(spark, [(2, "b", 2.0)]))              # v1
    ts1 = t._read_entry(1)["ts"]
    assert t.version_at(ts0) == 0
    assert t.version_at((ts0 + ts1) / 2) == 0
    assert t.version_at(ts1 + 1) == 1
    assert {r["id"] for r in t.read(spark, timestamp=ts0).collect()} == {1}
    assert {r["id"] for r in t.read(spark, timestamp=ts1).collect()} == {1, 2}
    with pytest.raises(ValueError, match="predates"):
        t.version_at(ts0 - 100)
    with pytest.raises(ValueError, match="not both"):
        t.read(spark, version=0, timestamp=ts0)


def test_spark_metadata_remove_then_readd_in_tail(spark, tmp_path):
    """r11 (ADVICE r10): a checkpoint-live file removed AND re-added
    in the log tail — exactly what restore emits when only a file's
    deletion-vector set changed — must be served ONCE by the
    Spark-side metadata path, with its checkpoint-era DV rows shed
    (the fold clears vectors on remove; the restore re-attaches none
    when the target version had none). The old code double-counted
    the file and kept its stale tombstones."""
    import hephaestus_spark.sources.txlog as tx

    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"n{i}", float(i)) for i in range(6)]))  # v0
    t.delete_mor(spark, "id = 0")  # v1: DV on the v0 file
    for i in range(10, 10 + tx.CHECKPOINT_INTERVAL - 1):  # cross ckpt
        t.append(_df(spark, [(i, "x", float(i))]))
    assert t._checkpoint_versions(), "test setup must cross a checkpoint"
    # tail: restore to v0 -> the v0 file's DV set differs, so the
    # restore commit removes and re-adds it (and re-attaches no DV)
    t.restore(spark, 0)  # drops the later appends, clears the DV
    truth = t.stats_summary()
    assert truth["count"] == 6

    cold = TxTable(t.path)
    adds = cold.live_adds_df(spark)
    paths = [r["path"] for r in adds.select("path").collect()]
    assert len(paths) == len(set(paths)) == len(cold._snapshot_files())
    assert cold.count_spark(spark) == truth


def test_spark_metadata_ignores_partial_multipart_checkpoint(spark, tmp_path):
    """r11 (ADVICE r10): a crash mid-multi-part checkpoint write
    leaves a partial part set; the Spark-side metadata path (and
    checkpoint_df) must refuse it — falling back to an older complete
    checkpoint or the driver fold — never silently serving a partial
    live set. Simulated by renaming a complete single-file checkpoint
    into a 1-of-2 part name."""
    import hephaestus_spark.sources.txlog as tx

    t = TxTable(str(tmp_path / "t"))
    for i in range(tx.CHECKPOINT_INTERVAL + 2):
        t.append(_df(spark, [(i, "x", float(i))]))
    cks = t._checkpoint_versions()
    assert cks
    paths = t._checkpoint_paths(cks[-1])
    pq = [p for p in paths if p.endswith(".parquet")]
    assert len(pq) == 1
    d, base = os.path.split(pq[0])
    partial = os.path.join(
        d, base.replace(".checkpoint.parquet", ".checkpoint.0001-of-0002.parquet")
    )
    os.rename(pq[0], partial)

    cold = TxTable(t.path)
    truth = {"count": tx.CHECKPOINT_INTERVAL + 2, "count_exact": True}
    assert cold.stats_summary() == truth  # driver fold falls back
    assert cold.count_spark(spark) == truth  # Spark path must too
    ckdf = cold.checkpoint_df(spark)
    assert ckdf is None  # no COMPLETE parquet checkpoint exists


def test_spark_side_pruned_read_avoids_driver_fold(spark, tmp_path, monkeypatch):
    """r11 (VERDICT r10 #6): a pruned range read planned entirely from
    Spark-side metadata — with driver-side checkpoint materialization
    monkeypatched to explode, pruned_files_spark/read_pruned_spark
    still serve the exact driver-fold answers (zone skipping, string
    zones, tombstone discounts, tail commits past the checkpoint),
    and the driver collects ONLY the surviving paths."""
    import hephaestus_spark.sources.txlog as tx

    t = TxTable(str(tmp_path / "t"))
    # key-clustered files -> disjoint id zones; string col zones too
    df = spark.createDataFrame(
        [(i, f"s{i:04d}", float(i)) for i in range(100)],
        "id long, name string, val double",
    )
    t.append(df.repartitionByRange(8, F.col("id")).sortWithinPartitions("id"))
    while t.latest_version() < tx.CHECKPOINT_INTERVAL:
        t.append(_df(spark, [(1000 + t.latest_version(), "zz", 0.0)]))
    t.delete_mor(spark, "id = 15")  # live tombstone inside the band
    truth_keep, truth_total = t.pruned_files("id", 10, 29)
    truth_rows = sorted(
        r["id"] for r in t.read_pruned(spark, "id", 10, 29).collect()
    )
    assert 15 not in truth_rows and len(truth_keep) < truth_total

    cold = TxTable(t.path)

    def boom(self, version):
        raise AssertionError("driver-side checkpoint materialization")

    monkeypatch.setattr(TxTable, "_load_checkpoint", boom)
    keep, total = cold.pruned_files_spark(spark, "id", 10, 29)
    assert (sorted(keep), total) == (sorted(truth_keep), truth_total)
    got = sorted(r["id"] for r in cold.read_pruned_spark(spark, "id", 10, 29).collect())
    assert got == truth_rows
    # string zones with exactness flags through the Spark path too
    cold2 = TxTable(t.path)
    sk, stot = cold2.pruned_files_spark(spark, "name", "s0010", "s0029")
    tk, ttot = t.pruned_files("name", "s0010", "s0029")
    assert (sorted(sk), stot) == (sorted(tk), ttot)


def test_change_feed_serves_overwrite_and_meta_commits(spark, tmp_path):
    """r11: overwrite commits serve the Delta CDF replace shape
    (delete every replaced visible row, insert every new row);
    metadata-only commits (rename) pass through carrying their schema
    instead of failing the range; dynamic partition overwrite emits
    exactly the replaced partition's rows."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))       # v0
    t.delete_mor(spark, "id = 1")                              # v1
    # v2: full overwrite — only VISIBLE old rows emit deletes
    t.commit_names(t._stage(_df(spark, [(9, "z", 9.0)])), overwrite=True)
    feed = t.read_changes(spark, since_version=1)
    got = sorted((r["id"], r["_change_type"]) for r in feed.collect())
    assert got == [(2, "delete"), (9, "insert")]
    # v3: rename rides the feed; later rows serve the NEW name
    t.rename_column(spark, "val", "amount")                    # v3
    t.append(
        spark.createDataFrame(
            [(10, "y", 10.0)], "id long, name string, amount double"
        )
    )                                                          # v4
    feed2 = t.read_changes(spark, since_version=2)
    assert "amount" in feed2.columns
    got2 = {(r["id"], r["_change_type"], r["amount"]) for r in feed2.collect()}
    assert got2 == {(10, "insert", 10.0)}

    # dynamic partition overwrite on a partitioned table
    p = TxTable(str(tmp_path / "p"))
    p.append(
        spark.createDataFrame(
            [(1, "d1", 1.0), (2, "d2", 2.0)], "id long, day string, val double"
        ),
        partition_by=["day"],
    )                                                          # v0
    p.overwrite_partitions(
        spark,
        spark.createDataFrame([(20, "d2", 20.0)], "id long, day string, val double"),
    )                                                          # v1
    feedp = p.read_changes(spark, since_version=0)
    gotp = sorted((r["id"], r["_change_type"], r["day"]) for r in feedp.collect())
    assert gotp == [(2, "delete", "d2"), (20, "insert", "d2")]
