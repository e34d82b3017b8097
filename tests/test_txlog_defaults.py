"""Column DEFAULT values (r13 — Delta's allowColumnDefaults):
`set_column_default(col, expr)` makes df-based writes that OMIT the
column materialize the constant (cast to the declared type); supplied
values win unvalidated; pre-declaration rows keep serving NULL
(write-time-only, no rewrite); the `column_defaults` writer feature
gates unaware writers; rename/drop of a defaulted column refuses."""

from __future__ import annotations

import pytest

from hephaestus_spark.sources.txlog import TxTable


def _t(spark, path):
    t = TxTable(path)
    t.append(
        spark.createDataFrame(
            [(1, "a", None)], "id long, name string, region string"
        )
    )
    return t


def test_default_fills_omitted_column(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    t.set_column_default(spark, "region", "'emea'")
    # omitted -> default; supplied -> wins
    t.append(spark.createDataFrame([(2, "b")], "id long, name string"))
    t.append(
        spark.createDataFrame(
            [(3, "c", "apac")], "id long, name string, region string"
        )
    )
    got = {r["id"]: r["region"] for r in t.read(spark).collect()}
    # pre-declaration row keeps its NULL: write-time only, no rewrite
    assert got == {1: None, 2: "emea", 3: "apac"}


def test_default_casts_to_declared_type(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1.5)], "id long, score double"))
    t.set_column_default(spark, "score", "1 + 1")  # int expr -> double col
    t.append(spark.createDataFrame([(2,)], "id long"))
    got = {r["id"]: r["score"] for r in t.read(spark).collect()}
    assert got[2] == 2.0 and isinstance(got[2], float)


def test_default_validation(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="constant"):
        t.set_column_default(spark, "region", "name")  # column ref
    with pytest.raises(ValueError, match="not in table schema"):
        t.set_column_default(spark, "nope", "'x'")
    t.set_identity(spark, "id")
    with pytest.raises(ValueError, match="IDENTITY"):
        t.set_column_default(spark, "id", "7")


def test_default_streaming_and_feature_gate(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    t.set_column_default(spark, "region", "'latam'")
    # exactly-once stream batches fill too
    t.append_stream_batch(
        spark.createDataFrame([(10, "s")], "id long, name string"),
        "app",
        0,
    )
    got = {r["id"]: r["region"] for r in t.read(spark).collect()}
    assert got[10] == "latam"
    # the writer feature rides the metadata
    meta = t._fold_state()[3]
    assert "column_defaults" in meta["writer_features"]
    # drop: feature retired with the last default, fills stop
    t.drop_column_default("region")
    meta = t._fold_state()[3]
    assert "column_defaults" not in (meta.get("writer_features") or [])
    t.append(spark.createDataFrame([(11, "t")], "id long, name string"))
    got = {r["id"]: r["region"] for r in t.read(spark).collect()}
    assert got[11] is None


def test_default_refuses_rename_drop(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    t.set_column_default(spark, "region", "'x'")
    with pytest.raises(ValueError, match="DEFAULT"):
        t.rename_column(spark, "region", "zone")
    with pytest.raises(ValueError, match="DEFAULT"):
        t.drop_column(spark, "region")
    t.drop_column_default("region")
    t.rename_column(spark, "region", "zone")  # now fine


def test_default_composes_with_generated(spark, tmp_path):
    """A generated expression may reference a defaulted column —
    defaults fill first."""
    t = TxTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, 10, 100)], "id long, qty int, total int"
        )
    )
    t.set_column_default(spark, "qty", "5")
    t.set_generated(spark, "total", "qty * 10")
    t.append(spark.createDataFrame([(2,)], "id long"))
    got = {r["id"]: (r["qty"], r["total"]) for r in t.read(spark).collect()}
    assert got[2] == (5, 50)


def test_describe_detail_surfaces_r13_governance(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    t.set_column_default(spark, "region", "'x'")
    t.set_bloom_filter(["name"])
    t.set_auto_compact(min_files=4)
    d = t.detail()
    assert d["column_defaults"] == {"region": {"expr": "'x'", "type": "string"}}
    assert d["bloom_columns"]["cols"] == ["name"]
    assert d["auto_compact"]["min_files"] == 4
    assert "column_defaults" in d["writer_features"]
