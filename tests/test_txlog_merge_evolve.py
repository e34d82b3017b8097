"""MERGE schema evolution (sources/txlog.py r12, VERDICT r11 #3 —
Delta's ``withSchemaEvolution`` merge): a source column the table has
never seen widens the target in the same commit; existing rows read it
as NULL, matched/inserted rows carry values, type changes still refuse,
and without the flag the new column raises a clear error."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.sources.txlog import TxTable


def _seed(spark, path, n=20):
    t = TxTable(path)
    t.append(
        spark.createDataFrame(
            [(i, f"r{i}", float(i)) for i in range(n)],
            "id long, name string, val double",
        ).repartitionByRange(2, F.col("id"))
    )
    return t


def _delta(spark, rows):
    return spark.createDataFrame(
        rows, "id long, name string, val double, tier string"
    )


def test_merge_evolution_widens_and_pads_null(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    delta = _delta(spark, [(5, "r5", 5.0, "gold"), (100, "new", -1.0, "raw")])
    v = t.merge(
        spark, delta, "id", ["name", "val", "tier"], schema_evolution=True
    )
    got = {r["id"]: (r["val"], r["tier"]) for r in t.read(spark).collect()}
    assert len(got) == 21
    assert got[5] == (5.0, "gold")      # matched row took the new value
    assert got[100] == (-1.0, "raw")    # insert carries it
    assert got[0] == (0.0, None)        # untouched rows read NULL
    # the widened schema is in the LOG, not inferred: an explicit-schema
    # read at the new version serves the column, the prior version not
    assert "tier" in t.read(spark, version=v).columns
    assert "tier" not in t.read(spark, version=v - 1).columns
    assert t.history()[-1]["op"] == "merge"


def test_merge_new_column_refused_without_flag(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    delta = _delta(spark, [(5, "r5", 5.0, "gold")])
    with pytest.raises(ValueError, match="schema_evolution"):
        t.merge(spark, delta, "id", ["name", "val", "tier"])
    assert t.latest_version() == 0  # nothing committed


def test_merge_evolution_type_change_refused(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    bad = spark.createDataFrame(
        [(5, "r5", "not-a-double")], "id long, name string, val string"
    )
    with pytest.raises(ValueError, match="type changes"):
        t.merge(spark, bad, "id", ["name", "val"], schema_evolution=True)


def test_merge_evolution_into_pruned_away_snapshot(spark, tmp_path):
    """Key-pruning that excludes EVERY file still widens the schema —
    the merge degenerates to an insert of the staged rows."""
    t = _seed(spark, str(tmp_path / "t"))
    delta = _delta(spark, [(1000, "far", 1.0, "x")])
    t.merge(
        spark, delta, "id", ["name", "val", "tier"],
        prune_on_key=True, schema_evolution=True,
    )
    got = t.read(spark)
    assert got.filter("tier IS NOT NULL").count() == 1
    assert got.count() == 21


def test_merge_evolution_cdf_sidecar_pads_preimage(spark, tmp_path):
    """With CDF on, the update_preimage of an evolved merge reads the
    new column as NULL (the row predates it) and the postimage carries
    the merged value."""
    t = _seed(spark, str(tmp_path / "t"), n=4)
    t.set_change_data_feed(True)
    delta = _delta(spark, [(2, "r2", 99.0, "gold")])
    v = t.merge(
        spark, delta, "id", ["name", "val", "tier"], schema_evolution=True
    )
    ch = {
        (r["_change_type"]): (r["val"], r["tier"])
        for r in t.read_changes(spark, v - 1, v).filter("id = 2").collect()
    }
    assert ch["update_preimage"] == (2.0, None)
    assert ch["update_postimage"] == (99.0, "gold")
