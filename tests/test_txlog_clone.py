"""SHALLOW CLONE (sources/txlog.py r11 — Delta's CREATE TABLE ...
SHALLOW CLONE): a new table whose version-0 commit references the
source's live files in place (absolute-path adds, zero data movement),
evolving independently afterwards; zone-map/partition pruning carries
over, DV sidecars are copied so tombstones hold, OPTIMIZE detaches the
clone from the source, and an unaware reader version refuses via the
``clone`` reader feature."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.sources import txlog
from hephaestus_spark.sources.txlog import TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, val double")


def _seed(spark, path, n=40, files=4):
    t = TxTable(path)
    df = _df(spark, [(i, f"r{i}", float(i)) for i in range(n)])
    t.append(df.repartitionByRange(files, F.col("id")).sortWithinPartitions("id"))
    return t


def test_clone_is_metadata_only_and_reads_identically(spark, tmp_path):
    src = _seed(spark, str(tmp_path / "src"))
    clone = src.clone_to(str(tmp_path / "dst"))
    # zero data files under the clone root — pure metadata
    data_files = [
        f
        for _dir, _s, fs in os.walk(clone.path)
        for f in fs
        if f.endswith(".parquet") and "_txlog" not in _dir
    ]
    assert data_files == []
    assert {(r["id"], r["val"]) for r in clone.read(spark).collect()} == {
        (i, float(i)) for i in range(40)
    }
    assert clone.history()[0]["op"] == "clone"
    # stats rode along: metadata COUNT answers without data I/O
    assert clone.stats_summary()["count"] == 40


def test_clone_evolves_independently_of_source(spark, tmp_path):
    src = _seed(spark, str(tmp_path / "src"))
    clone = src.clone_to(str(tmp_path / "dst"))
    clone.append(_df(spark, [(1000, "x", 1.0)]).coalesce(1))
    clone.update(spark, "id = 0", {"val": "999.0"})
    src.append(_df(spark, [(2000, "y", 2.0)]).coalesce(1))
    got_clone = {r["id"]: r["val"] for r in clone.read(spark).collect()}
    got_src = {r["id"]: r["val"] for r in src.read(spark).collect()}
    assert 1000 in got_clone and 2000 not in got_clone
    assert got_clone[0] == 999.0
    assert 2000 in got_src and 1000 not in got_src and got_src[0] == 0.0


def test_clone_pruning_carries_over(spark, tmp_path):
    src = _seed(spark, str(tmp_path / "src"), n=100, files=4)
    clone = src.clone_to(str(tmp_path / "dst"))
    keep, total = clone.pruned_files("id", 10, 19)
    assert total == 4 and len(keep) == 1
    got = {r["id"] for r in clone.read_pruned(spark, "id", 10, 19).collect()}
    assert got == set(range(10, 20))


def test_clone_of_partitioned_table(spark, tmp_path):
    src = TxTable(str(tmp_path / "src"))
    df = spark.createDataFrame(
        [(i, "2024-01-01" if i % 2 == 0 else "2024-01-02", float(i)) for i in range(20)],
        "id long, day string, val double",
    )
    src.append(df, partition_by=["day"])
    clone = src.clone_to(str(tmp_path / "dst"))
    assert clone.partition_columns() == ["day"]
    got = {r["id"]: r["day"] for r in clone.read(spark).collect()}
    assert len(got) == 20 and got[0] == "2024-01-01" and got[1] == "2024-01-02"
    # partition listing and partition-scoped ops work on the clone
    assert {p["day"] for p in clone.partitions()} == {
        "2024-01-01",
        "2024-01-02",
    }
    # post-clone append lands LOCAL hive files; the mixed read unions
    # the two basePath groups correctly
    clone.append(
        spark.createDataFrame(
            [(100, "2024-01-03", 1.0)], "id long, day string, val double"
        )
    )
    got = {r["id"]: r["day"] for r in clone.read(spark).collect()}
    assert got[100] == "2024-01-03" and len(got) == 21


def test_clone_carries_tombstones(spark, tmp_path):
    src = _seed(spark, str(tmp_path / "src"), n=20, files=2)
    src.delete_mor(spark, "id IN (3, 4)")
    clone = src.clone_to(str(tmp_path / "dst"))
    got = {r["id"] for r in clone.read(spark).collect()}
    assert got == set(range(20)) - {3, 4}
    assert clone.stats_summary()["count"] == 18
    # and the clone's own MoR delete works on referenced files
    clone.delete_mor(spark, "id = 5")
    assert 5 not in {r["id"] for r in clone.read(spark).collect()}
    assert 5 in {r["id"] for r in src.read(spark).collect()}


def test_optimize_detaches_clone(spark, tmp_path):
    src = _seed(spark, str(tmp_path / "src"))
    clone = src.clone_to(str(tmp_path / "dst"))
    clone.optimize(spark, target_files=1)
    # every live file is now local — the source can vacuum freely
    assert all(
        not os.path.isabs(f) for f in clone._snapshot_files()
    )
    assert {r["id"] for r in clone.read(spark).collect()} == set(range(40))


def test_clone_of_clone(spark, tmp_path):
    src = _seed(spark, str(tmp_path / "a"), n=10, files=1)
    c1 = src.clone_to(str(tmp_path / "b"))
    c1.append(_df(spark, [(100, "x", 1.0)]).coalesce(1))
    c2 = c1.clone_to(str(tmp_path / "c"))
    got = {r["id"] for r in c2.read(spark).collect()}
    assert got == set(range(10)) | {100}
    # both roots recorded: a's files resolve under a, b's under b
    meta = c2._fold_state()[3]
    roots = meta["clone_roots"]
    assert len(roots) == 2


def test_unaware_reader_refuses_clone_table(spark, tmp_path, monkeypatch):
    src = _seed(spark, str(tmp_path / "src"), n=10, files=1)
    clone = src.clone_to(str(tmp_path / "dst"))
    monkeypatch.setattr(
        txlog,
        "SUPPORTED_READER_FEATURES",
        txlog.SUPPORTED_READER_FEATURES - {"clone"},
    )
    with pytest.raises(ValueError, match="reader features"):
        TxTable(clone.path).read(spark)
    # the SOURCE stays readable — its metadata never changed
    assert TxTable(src.path).read(spark).count() == 10


def test_clone_change_feed_serves_inception_as_inserts(spark, tmp_path):
    src = _seed(spark, str(tmp_path / "src"), n=10, files=1)
    src.delete_mor(spark, "id = 3")
    clone = src.clone_to(str(tmp_path / "dst"))
    clone.append(_df(spark, [(100, "x", 1.0)]).coalesce(1))
    ch = clone.read_changes(spark, -1).collect()
    by_ver = {}
    for r in ch:
        by_ver.setdefault(r["_commit_version"], []).append(
            (r["_change_type"], r["id"])
        )
    assert sorted(by_ver[0]) == [
        ("insert", i) for i in range(10) if i != 3
    ]
    assert by_ver[1] == [("insert", 100)]


def test_clone_refuses_existing_destination(spark, tmp_path):
    src = _seed(spark, str(tmp_path / "src"), n=10, files=1)
    dst = _seed(spark, str(tmp_path / "dst"), n=5, files=1)
    with pytest.raises(ValueError, match="already exists"):
        src.clone_to(dst.path)


def test_clone_at_past_version(spark, tmp_path):
    src = _seed(spark, str(tmp_path / "src"), n=10, files=1)
    src.append(_df(spark, [(100, "x", 1.0)]).coalesce(1))
    clone = src.clone_to(str(tmp_path / "dst"), version=0)
    assert {r["id"] for r in clone.read(spark).collect()} == set(range(10))


def test_native_datasource_reads_clone(spark, tmp_path):
    from hephaestus_spark.sources.txlog_datasource import TxLogDataSource

    spark.dataSource.register(TxLogDataSource)
    src = _seed(spark, str(tmp_path / "src"), n=20, files=2)
    src.delete_mor(spark, "id = 7")
    clone = src.clone_to(str(tmp_path / "dst"))
    got = {
        r["id"]
        for r in spark.read.format("txlog").load(clone.path).collect()
    }
    assert got == set(range(20)) - {7}


def test_stream_source_reads_clone_incrementally(spark, tmp_path):
    """readStream over a SHALLOW CLONE: the clone commit's referenced
    (absolute-path) files deliver as the first batch, post-clone
    appends deliver incrementally — the streaming source resolves
    clone references exactly like batch reads."""
    from hephaestus_spark.sources.txlog_datasource import TxLogDataSource

    spark.dataSource.register(TxLogDataSource)
    src = _seed(spark, str(tmp_path / "src"), n=20, files=2)
    clone = src.clone_to(str(tmp_path / "dst"))
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("txlog")
            .load(clone.path)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 20
    clone.append(_df(spark, [(100, "x", 1.0)]).coalesce(1))
    run()
    got = {r["id"] for r in spark.read.parquet(out).collect()}
    assert got == set(range(20)) | {100}


def test_change_feed_passes_metadata_only_commits(spark, tmp_path):
    """setProperties / setGenerated / setIdentity / addConstraint are
    metadata-only commits — the row-level feed crosses them
    contributing no rows, and later rows still serve."""
    src = _seed(spark, str(tmp_path / "t"), n=4, files=1)
    src.set_properties({"owner": "x"})
    src.add_check_constraint(spark, "v", "val >= 0")
    src.set_generated(spark, "name", "concat('r', cast(id as string))")
    src.append(
        spark.createDataFrame([(100, 5.0)], "id long, val double")
    )  # name filled
    ch = src.read_changes(spark, -1).collect()
    by_ver = {}
    for r in ch:
        by_ver.setdefault(r["_commit_version"], []).append(r["id"])
    assert sorted(by_ver[0]) == [0, 1, 2, 3]
    assert by_ver[4] == [100]
    assert set(by_ver) == {0, 4}  # metadata commits contributed no rows


# ---- REORG purge + clone-aware retention (r12, VERDICT r11 #6) ----


def test_optimize_purge_dvs_rewrites_only_high_tombstone_files(spark, tmp_path):
    """Delta's REORG … APPLY (PURGE): with ids 0..39 in 4 range files
    of 10, tombstone 60% of file0 and 10% of file1; purge_dvs=0.3
    rewrites EXACTLY file0 (its deletes materialized, vector shed)
    while file1 keeps both its bytes and its vector, and the visible
    rows are identical throughout."""
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_mor(spark, "id IN (0,1,2,3,4,5)")   # 6/10 of file0
    t.delete_mor(spark, "id = 15")               # 1/10 of file1
    before_files = set(t._snapshot_files())
    before_rows = sorted(r["id"] for r in t.read(spark).collect())
    assert t.detail()["num_deletion_vectors"] == 2
    v = t.optimize(spark, purge_dvs=0.3)
    assert v == t.latest_version() and t.history()[-1]["op"] == "optimize"
    after_files = set(t._snapshot_files())
    # exactly one file rewritten, three untouched
    assert len(before_files & after_files) == 3
    assert len(after_files) == 4
    assert sorted(r["id"] for r in t.read(spark).collect()) == before_rows
    # file1's vector survives; file0's is shed with its file
    assert t.detail()["num_deletion_vectors"] == 1
    # time travel still serves the pre-purge states
    assert t.read(spark, version=0).count() == 40


def test_optimize_purge_zero_threshold_sheds_every_vector(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_mor(spark, "id IN (3, 17, 33)")
    base = t.latest_version()
    v = t.optimize(spark, purge_dvs=0.0)
    assert v == base + 1
    assert t.detail()["num_deletion_vectors"] == 0
    assert sorted(r["id"] for r in t.read(spark).collect()) == sorted(
        i for i in range(40) if i not in (3, 17, 33)
    )
    # nothing covered -> no commit at all
    assert t.optimize(spark, purge_dvs=0.0) == v


def test_optimize_purge_rejects_cluster_by(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="cluster_by"):
        t.optimize(spark, purge_dvs=0.0, cluster_by="id")


def test_expire_log_refuses_past_live_clone_inception(spark, tmp_path):
    """The dangerous sequence — clone, then source expires its log past
    the clone point and vacuums — now refuses at the expire step while
    the clone is registered; ignore_clones + a detached/deleted clone
    both unblock it."""
    src = _seed(spark, str(tmp_path / "src"))
    clone = src.clone_to(str(tmp_path / "clone"))
    assert [m["dest"] for m in src.clone_markers()] == [
        os.path.abspath(clone.path)
    ]
    # roll the source far enough to own a checkpoint above the clone
    for i in range(12):
        src.append(_df(spark, [(100 + i, "x", 1.0)]).coalesce(1))
    src.delete(spark, "id < 10")  # rewrites: clone-referenced files die
    with pytest.raises(ValueError, match="shallow clone"):
        src.expire_log()
    # the clone still reads perfectly (nothing was reclaimed)
    assert clone.read(spark).count() == 40
    # explicit override: expiry + vacuum proceed (the documented
    # manual path — the operator has decided the clone's fate)
    expired = src.expire_log(ignore_clones=True)
    assert expired
    # deleting the clone makes its marker stale; the next expire_log
    # needs no override
    import shutil

    shutil.rmtree(clone.path)
    assert src.clone_markers() == []
    src.expire_log()  # no raise


def test_vacuum_after_guarded_expiry_keeps_clone_alive(spark, tmp_path):
    """End-to-end: with the guard honored (no expiry), the source's
    vacuum reclaims nothing a clone references."""
    src = _seed(spark, str(tmp_path / "src"))
    clone = src.clone_to(str(tmp_path / "clone"))
    src.delete(spark, "id < 20")  # source rewrites half its files
    with pytest.raises(ValueError, match="shallow clone"):
        # force a checkpoint so expire_log would have a horizon
        for i in range(12):
            src.append(_df(spark, [(200 + i, "y", 2.0)]).coalesce(1))
        src.expire_log()
    src.vacuum(grace_seconds=0.0)
    assert clone.read(spark).count() == 40
    assert {r["id"] for r in clone.read(spark).collect()} == set(range(40))


def test_optimize_partition_scoped(spark, tmp_path):
    """Delta's OPTIMIZE … WHERE (r12): compaction scoped to one
    partition's files — the other partitions keep their bytes, the
    selected one collapses to target_files, and the visible rows are
    identical. Small files come from 3 appends × 2 partitions."""
    t = TxTable(str(tmp_path / "t"))
    for c in range(3):
        t.append(
            spark.createDataFrame(
                [(c * 10 + i, ["a", "b"][i % 2], float(i)) for i in range(6)],
                "id long, day string, val double",
            ),
            partition_by=["day"] if c == 0 else None,
        )
    before = set(t._snapshot_files())
    before_rows = sorted(
        (r["id"], r["day"]) for r in t.read(spark).collect()
    )
    v = t.optimize(spark, target_files=1, partitions={"day": ["a"]})
    assert v == t.latest_version()
    after = set(t._snapshot_files())
    # every day=b file untouched; the day=a files collapsed
    b_files = {f for f in before if "day=b" in f}
    assert b_files <= after
    assert len([f for f in after if "day=a" in f]) == 1
    assert sorted(
        (r["id"], r["day"]) for r in t.read(spark).collect()
    ) == before_rows
    # scoping to a value with no files is a no-op, no commit
    assert t.optimize(spark, partitions={"day": ["zzz"]}) == v


def test_restore_and_clone_to_timestamp(spark, tmp_path):
    """RESTORE TO TIMESTAMP / CLONE … TIMESTAMP AS OF (r12): both
    resolve through version_at's monotone in-commit stamps."""
    t = _seed(spark, str(tmp_path / "t"), n=6, files=1)      # v0
    ts_v0 = t._read_entry(0)["ts"]
    t.append(_df(spark, [(100, "x", 1.0)]))                   # v1
    t.delete(spark, "id = 0")                                 # v2
    clone = t.clone_to(str(tmp_path / "c"), timestamp=ts_v0)
    assert {r["id"] for r in clone.read(spark).collect()} == set(range(6))
    v = t.restore(spark, timestamp=ts_v0)
    assert v == 3
    assert {r["id"] for r in t.read(spark).collect()} == set(range(6))
    with pytest.raises(ValueError, match="exactly one"):
        t.restore(spark)
    with pytest.raises(ValueError, match="at most one"):
        t.clone_to(str(tmp_path / "c2"), version=0, timestamp=ts_v0)
