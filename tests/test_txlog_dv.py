"""Merge-on-read deletion vectors (sources/txlog.py::delete_mor):
tombstones must hide rows from EVERY serving path without rewriting
any data file, survive checkpointed folds, die with their file on
compaction, and never resurrect through merge or copy-on-write
delete."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.sources.txlog import CHECKPOINT_INTERVAL, TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, val double")


def _seed(spark, path):
    t = TxTable(path)
    rows = [(i, f"n{i}", float(i)) for i in range(40)]
    t.append(
        _df(spark, rows).repartitionByRange(4, F.col("id")).sortWithinPartitions("id")
    )
    return t


def test_delete_mor_tombstones_without_rewriting_files(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    data_files_before = sorted(n for n, _ in t.live_files())
    v, covered, n_rows = t.delete_mor(
        spark, "id BETWEEN 10 AND 19", prune_column="id", lo=10, hi=19
    )
    assert (v, n_rows) == (1, 10)
    assert covered >= 1
    # ZERO write amplification: the live data file set is unchanged
    assert sorted(n for n, _ in t.live_files()) == data_files_before
    # every serving path hides the tombstoned rows
    expect = [i for i in range(40) if not 10 <= i <= 19]
    assert sorted(r["id"] for r in t.read(spark).collect()) == expect
    assert sorted(
        r["id"] for r in t.read_pruned(spark, "id", 0, 39).collect()
    ) == expect
    assert sorted(
        r["id"] for r in t.read_pruned_in(spark, "id", list(range(40))).collect()
    ) == [i for i in range(40) if not 10 <= i <= 19]
    # time travel still shows the pre-delete rows
    assert t.read(spark, version=0).count() == 40
    # re-deleting the same band finds nothing (tombstones are applied
    # to the hit scan itself)
    v2, covered2, n2 = t.delete_mor(spark, "id BETWEEN 10 AND 19")
    assert (v2, covered2, n2) == (1, 0, 0)


def test_delete_mor_does_not_resurrect_through_merge_or_cow_delete(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_mor(spark, "id < 5")
    # copy-on-write merge: staged rows update survivors; tombstoned
    # rows must not come back even though their file is rewritten
    staged = _df(spark, [(7, "n7", 700.0), (50, "x", 50.0)])
    t.merge(spark, staged, "id", ["name", "val"])
    got = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert 0 not in got and 4 not in got
    assert got[7] == 700.0 and got[50] == 50.0
    assert len(got) == 40 - 5 + 1
    # a later copy-on-write delete over a DV'd region must not
    # resurrect other tombstones either
    t2 = _seed(spark, str(tmp_path / "t2"))
    t2.delete_mor(spark, "id = 0")
    t2.delete(spark, "id BETWEEN 1 AND 2", prune_column="id", lo=1, hi=2)
    ids = sorted(r["id"] for r in t2.read(spark).collect())
    assert ids == list(range(3, 40))


def test_optimize_materializes_deletes_and_drops_vectors(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_mor(spark, "id % 2 = 1")
    assert t.dv_map()  # vectors live
    t.optimize(spark, target_files=2, cluster_by="id")
    assert t.dv_map() == {}  # compaction materialized them
    assert sorted(r["id"] for r in t.read(spark).collect()) == list(range(0, 40, 2))
    # vacuum keeps the DV parquet (old versions still time-travel)
    t.vacuum(grace_seconds=0.0)
    assert t.read(spark, version=1).count() == 20


def test_dv_fold_survives_checkpoints(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(i, "a", 1.0) for i in range(10)]))
    t.delete_mor(spark, "id = 3")
    # push past a checkpoint boundary with small appends
    nxt = 100
    while t.latest_version() < CHECKPOINT_INTERVAL + 1:
        t.append(_df(spark, [(nxt, "b", 2.0)]))
        nxt += 1
    assert t._checkpoint_versions(), "no checkpoint written"
    # a COLD instance folds from the checkpoint and must still see the DV
    cold = TxTable(t.path)
    assert cold.dv_map()
    assert 3 not in {r["id"] for r in cold.read(spark).collect()}


def test_native_datasource_masks_tombstones(spark, tmp_path):
    from hephaestus_spark.sources.txlog_datasource import TxLogDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TxLogDataSource)
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_mor(spark, "id BETWEEN 10 AND 19", prune_column="id", lo=10, hi=19)
    got = spark.read.format("txlog").load(t.path)
    assert sorted(r["id"] for r in got.collect()) == [
        i for i in range(40) if not 10 <= i <= 19
    ]
    # pruned + tombstoned together: the [5, 14] band spans a fully
    # live file and a tombstoned one
    band = got.filter(F.col("id").between(5, 14))
    assert sorted(r["id"] for r in band.collect()) == list(range(5, 10))
    # time travel ignores later DVs
    v0 = spark.read.format("txlog").option("version", 0).load(t.path)
    assert v0.count() == 40


def test_change_feed_rejects_dv_commits(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_mor(spark, "id = 1")
    with pytest.raises(ValueError, match="deleteMor"):
        t.read_changes(spark, since_version=-1)


def test_widening_append_schema_evolution(spark, tmp_path):
    """Widening appends: a later commit adds a column; older files
    surface it as nulls through every read path (mergeSchema in the
    Spark reads, batch alignment in the native datasource) with no
    data rewrite."""
    from hephaestus_spark.sources.txlog_datasource import TxLogDataSource

    spark.dataSource.register(TxLogDataSource)
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.append(
        spark.createDataFrame(
            [(3, "c", 3.0, "x")], "id long, name string, val double, tag string"
        )
    )
    got = t.read(spark)
    assert set(got.columns) == {"id", "name", "val", "tag"}
    rows = {r["id"]: r["tag"] for r in got.collect()}
    assert rows == {1: None, 2: None, 3: "x"}
    # change feed crosses the widening append
    feed = t.read_changes(spark, since_version=-1)
    assert feed.count() == 3 and "tag" in feed.columns
    # native datasource: newest-file schema, old files null-aligned
    nat = spark.read.format("txlog").load(t.path)
    assert {r["id"]: r["tag"] for r in nat.collect()} == {1: None, 2: None, 3: "x"}
    # zone maps on the NEW column: files without stats are kept (safe),
    # and the residual filter still returns exactly the right rows
    assert [r["id"] for r in t.read_pruned(spark, "tag", "x", "x").collect()] == [3]
