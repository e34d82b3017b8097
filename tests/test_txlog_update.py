"""Copy-on-write UPDATE ... SET (sources/txlog.py r11 — Delta's
UPDATE shape): file-minimal rewrite with zone/partition pruning,
SQL evaluate-against-the-old-row SET semantics, DV awareness (a
tombstoned row is neither updated nor resurrected), CHECK-constraint
enforcement on the rewritten rows, CDF update_preimage/postimage
(both the sidecar and the reconstruction path), and OCC rebase over
provably-disjoint interleaved appends."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.sources.txlog import (
    CommitConflict,
    ConstraintViolation,
    TxTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, val double")


def _seed(spark, path, n=100, files=4):
    t = TxTable(path)
    df = _df(spark, [(i, f"r{i}", float(i)) for i in range(n)])
    t.append(df.repartitionByRange(files, F.col("id")).sortWithinPartitions("id"))
    return t


def test_update_rewrites_only_hit_files(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    before = set(t._snapshot_files())
    v, rewritten, n_rows = t.update(
        spark, "id BETWEEN 10 AND 19", {"val": "val + 1000"}
    )
    assert v == 1 and n_rows == 10
    # ids 0..99 over 4 range files of 25 -> exactly one file hit
    assert rewritten == 1
    after = set(t._snapshot_files())
    # untouched files survive byte-identical (same names)
    assert len(before & after) == 3
    got = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert all(got[i] == i + 1000 for i in range(10, 20))
    assert all(got[i] == float(i) for i in range(100) if not 10 <= i <= 19)
    assert t.history()[-1]["op"] == "update"


def test_set_evaluates_against_old_row(spark, tmp_path):
    """SQL UPDATE semantics: every RHS binds the OLD row — a
    swap-shaped SET must actually swap, not chain."""
    path = str(tmp_path / "t")
    t = TxTable(path)
    t.append(
        spark.createDataFrame(
            [(1, 10.0, 20.0), (2, 3.0, 4.0)], "id long, a double, b double"
        )
    )
    t.update(spark, "id = 1", {"a": "b", "b": "a"})
    got = {r["id"]: (r["a"], r["b"]) for r in t.read(spark).collect()}
    assert got[1] == (20.0, 10.0)
    assert got[2] == (3.0, 4.0)


def test_update_no_match_leaves_version(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    v, rewritten, n_rows = t.update(spark, "id > 10000", {"val": "0.0"})
    assert (v, rewritten, n_rows) == (0, 0, 0)
    assert t.latest_version() == 0


def test_update_unknown_set_column_refused(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="unknown column"):
        t.update(spark, "id = 1", {"ghost": "1"})


def test_zone_pruned_update_skips_disjoint_files(spark, tmp_path, monkeypatch):
    """With prune_column declared, files whose zones cannot contain a
    match are never even scanned — pinned by counting _scan's candidate
    set."""
    t = _seed(spark, str(tmp_path / "t"))
    seen = {}
    orig = TxTable._scan

    def spy(self, spark_, files, version=None, keep_keys=False):
        seen.setdefault("first", list(files))
        return orig(self, spark_, files, version, keep_keys)

    monkeypatch.setattr(TxTable, "_scan", spy)
    v, rewritten, n_rows = t.update(
        spark,
        "id BETWEEN 30 AND 34",
        {"val": "-val"},
        prune_column="id",
        lo=30,
        hi=34,
    )
    assert v == 1 and rewritten == 1 and n_rows == 5
    # 4 disjoint range files; only the one holding [25, 49] is scanned
    assert len(seen["first"]) == 1
    got = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert all(got[i] == -float(i) for i in range(30, 35))


def test_tombstoned_rows_not_updated_nor_resurrected(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=20, files=1)
    t.delete_mor(spark, "id IN (5, 6)")
    v, _, n_rows = t.update(spark, "id BETWEEN 4 AND 7", {"val": "val + 100"})
    assert n_rows == 2  # only the visible 4 and 7
    got = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert 5 not in got and 6 not in got
    assert got[4] == 104.0 and got[7] == 107.0


def test_update_partition_column_moves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxTable(path)
    df = spark.createDataFrame(
        [(i, "2024-01-01" if i < 5 else "2024-01-02", float(i)) for i in range(10)],
        "id long, day string, val double",
    )
    t.append(df, partition_by=["day"])
    t.update(spark, "id = 1", {"day": "'2024-01-03'"})
    parts = {p["day"] for p in t.partitions()}
    assert "2024-01-03" in parts
    got = {r["id"]: r["day"] for r in t.read(spark).collect()}
    assert got[1] == "2024-01-03" and len(got) == 10


def test_update_respects_check_constraints(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.add_check_constraint(spark, "val_cap", "val < 10000")
    before = t.latest_version()
    with pytest.raises(ConstraintViolation):
        t.update(spark, "id < 10", {"val": "val + 1000000"})
    assert t.latest_version() == before
    assert {r["val"] for r in t.read(spark).filter("id < 3").collect()} == {
        0.0,
        1.0,
        2.0,
    }
    t.update(spark, "id < 10", {"val": "val + 1"})  # conforming
    assert t.read(spark).filter("id = 0").first()["val"] == 1.0


def test_cdf_sidecar_serves_pre_and_postimage(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _seed(spark, path, n=20, files=2)
    t.set_change_data_feed(True)
    base = t.latest_version()
    t.update(spark, "id IN (3, 4)", {"val": "val * 10"})
    # sidecar landed with the commit
    entry = t._read_entry(t.latest_version())
    assert any("cdc" in a for a in entry["actions"])
    ch = t.read_changes(spark, base).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], []).append((r["id"], r["val"]))
    assert sorted(by_type["update_preimage"]) == [(3, 3.0), (4, 4.0)]
    assert sorted(by_type["update_postimage"]) == [(3, 30.0), (4, 40.0)]


def test_cdf_reconstruction_without_sidecar(spark, tmp_path):
    """A table WITHOUT the CDF property still serves update commits
    row-exactly — reconstructed from the recorded predicate + SET."""
    path = str(tmp_path / "t")
    t = _seed(spark, path, n=20, files=2)
    base = t.latest_version()
    t.update(spark, "id IN (3, 4)", {"val": "val * 10"})
    entry = t._read_entry(t.latest_version())
    assert not any("cdc" in a for a in entry["actions"])
    ch = t.read_changes(spark, base).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], []).append((r["id"], r["val"]))
    assert sorted(by_type["update_preimage"]) == [(3, 3.0), (4, 4.0)]
    assert sorted(by_type["update_postimage"]) == [(3, 30.0), (4, 40.0)]


def test_update_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    racer = _df(spark, [(900, "keep", 9.0)]).coalesce(1)
    orig = TxTable._commit
    state = {"left": 1}

    def patched(self, version, op, actions, txn=None, info=None, **kw):
        if op == "update" and state["left"] > 0:
            state["left"] -= 1
            TxTable(path).append(racer)
        return orig(self, version, op, actions, txn=txn, info=info, **kw)

    monkeypatch.setattr(TxTable, "_commit", patched)
    v, rewritten, n_rows = t.update(
        spark,
        "id BETWEEN 10 AND 19",
        {"val": "val + 1000"},
        prune_column="id",
        lo=10,
        hi=19,
    )
    assert v == 2 and n_rows == 10
    got = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert got[900] == 9.0 and got[10] == 1010.0 and len(got) == 101


def test_update_without_prune_conflicts(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    racer = _df(spark, [(900, "keep", 9.0)]).coalesce(1)
    orig = TxTable._commit
    state = {"left": 1}

    def patched(self, version, op, actions, txn=None, info=None, **kw):
        if op == "update" and state["left"] > 0:
            state["left"] -= 1
            TxTable(path).append(racer)
        return orig(self, version, op, actions, txn=txn, info=info, **kw)

    monkeypatch.setattr(TxTable, "_commit", patched)
    with pytest.raises(CommitConflict):
        t.update(spark, "id BETWEEN 10 AND 19", {"val": "val + 1000"})
