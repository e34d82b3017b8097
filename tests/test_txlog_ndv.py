"""Per-file NDV (HLL) sketch sidecars (r14 — Iceberg's puffin NDV
idea on the txlog): declare columns, every data stage writes a 4 KB
register sidecar per file, and table-level approximate distinct
counts fold from sidecars alone — no data I/O, mergeable across any
file subset by bytewise register max. Accuracy: 4096 registers give
rsd ~1.6%, asserted at 5% (3 sigma)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.sources.txlog import TxTable


def _seed(spark, path, n=5000):
    t = TxTable(path)
    df = spark.createDataFrame(
        [(i, i % 97, f"u{i % 997}") for i in range(n)],
        "id long, bucket long, user string",
    )
    t.append(df.repartition(4))
    return t


def test_ndv_summary_accuracy_and_coverage(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.set_ndv_columns(["id", "bucket", "user"])
    # declaration is write-forward: nothing covered yet
    s0 = t.ndv_summary()
    assert s0["id"]["covered_files"] == 0 and s0["id"]["ndv"] is None
    assert t.build_ndv(spark) == len(t._snapshot_files())
    s = t.ndv_summary()
    for col, exact in (("id", 5000), ("bucket", 97), ("user", 997)):
        e = s[col]
        assert e["covered_files"] == e["total_files"]
        assert abs(e["ndv"] - exact) / exact < 0.05, (col, e, exact)
    # the Spark-side fold agrees exactly (same registers, same merge)
    sp = t.ndv_summary_spark(spark)
    assert sp == s


def test_ndv_sidecars_ride_every_stage_and_merge(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=1000)
    t.set_ndv_columns(["user"])
    t.build_ndv(spark)
    # a new append stages WITH sidecars automatically and the merged
    # estimate reflects the union (500 brand-new users)
    t.append(
        spark.createDataFrame(
            [(10_000 + i, 0, f"w{i}") for i in range(500)],
            "id long, bucket long, user string",
        ).repartition(2)
    )
    s = t.ndv_summary()
    assert s["user"]["covered_files"] == s["user"]["total_files"]
    exact = 997 if 1000 >= 997 else 1000
    expect = min(1000, 997) + 500
    assert abs(s["user"]["ndv"] - expect) / expect < 0.05, s["user"]
    # time travel: the pre-append snapshot folds only its own files
    s0 = t.ndv_summary(version=0)
    assert s0["user"]["total_files"] < s["user"]["total_files"]
    assert abs(s0["user"]["ndv"] - min(1000, 997)) / 997 < 0.05


def test_ndv_declaration_gates_and_detail(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=100)
    with pytest.raises(ValueError, match="not in table schema"):
        t.set_ndv_columns(["missing"])
    with pytest.raises(ValueError, match="hash canonically"):
        # nested types have no canonical bytes
        t3 = TxTable(str(tmp_path / "n"))
        t3.append(
            spark.createDataFrame([(1, [1, 2])], "id long, v array<long>")
        )
        t3.set_ndv_columns(["v"])
    # doubles/dates/timestamps are distinct-countable (unlike blooms)
    t2 = TxTable(str(tmp_path / "f"))
    t2.append(
        spark.createDataFrame(
            [(i, float(i % 111), f"2024-01-{1 + i % 28:02d}") for i in range(400)],
            "id long, v double, d string",
        ).selectExpr("id", "v", "CAST(d AS DATE) AS d")
    )
    t2.set_ndv_columns(["v", "d"])
    t2.build_ndv(spark)
    s2 = t2.ndv_summary()
    assert abs(s2["v"]["ndv"] - 111) / 111 < 0.05
    assert abs(s2["d"]["ndv"] - 28) / 28 < 0.05
    t.set_ndv_columns(["user"])
    assert t.detail()["ndv_columns"] == {"cols": ["user"]}
    t.drop_ndv_columns()
    assert t.detail()["ndv_columns"] == {}
    with pytest.raises(ValueError, match="no NDV columns"):
        t.build_ndv(spark)


def test_maintain_backfills_missing_sidecars(spark, tmp_path):
    """r14: the housekeeping tick converges sidecar coverage — files
    landed by an 'unaware writer' (simulated by deleting a sidecar)
    get bloom AND NDV sidecars rebuilt; a covered table builds zero."""
    t = _seed(spark, str(tmp_path / "t"), n=300)
    t.set_bloom_filter(["user"])
    t.set_ndv_columns(["user"])
    t.build_blooms(spark)
    t.build_ndv(spark)
    victim = os.path.basename(t._snapshot_files()[0])
    os.remove(t._ndv_sidecar(victim))
    os.remove(t._bloom_sidecar(victim))
    out = t.maintain(spark, max_files=1000, vacuum_grace=3600.0)
    assert out.get("ndv_built") == 1 and out.get("blooms_built") == 1
    s = t.ndv_summary()
    assert s["user"]["covered_files"] == s["user"]["total_files"]
    # steady state: the next tick builds nothing
    out2 = t.maintain(spark, max_files=1000, vacuum_grace=3600.0)
    assert "ndv_built" not in out2 and "blooms_built" not in out2


def test_ndv_sidecars_vacuumed_with_their_files(spark, tmp_path):
    import json as _json

    t = _seed(spark, str(tmp_path / "t"), n=500)
    t.set_ndv_columns(["user"])
    t.build_ndv(spark)
    ndir = os.path.join(t.path, "_txlog", "_ndv")
    assert len(os.listdir(ndir)) == len(t._snapshot_files())
    # an unreferenced (aborted-stage-shaped) data file + its sidecar:
    # vacuum reclaims the file AND the sidecar rides along
    orphan = "part-orphan-sketched.parquet"
    with open(os.path.join(t.path, orphan), "wb") as f:
        f.write(b"junk")
    with open(t._ndv_sidecar(orphan), "w") as f:
        _json.dump({"p": 12, "cols": {}}, f)
    deleted = t.vacuum(grace_seconds=0)
    assert orphan in deleted
    assert not os.path.exists(t._ndv_sidecar(orphan))
    # a sidecar whose data file is ALREADY gone (pre-cleanup orphan)
    gone = "part-gone-sketched.parquet"
    with open(t._ndv_sidecar(gone), "w") as f:
        _json.dump({"p": 12, "cols": {}}, f)
    deleted = t.vacuum(grace_seconds=0)
    assert os.path.join("_txlog", "_ndv", f"{gone}.ndv.json") in deleted
    assert not os.path.exists(t._ndv_sidecar(gone))
    # the spark route shares the contract
    orphan2 = "part-orphan-sketched2.parquet"
    with open(os.path.join(t.path, orphan2), "wb") as f:
        f.write(b"junk")
    with open(t._ndv_sidecar(orphan2), "w") as f:
        _json.dump({"p": 12, "cols": {}}, f)
    gone2 = "part-gone-sketched2.parquet"  # file already reclaimed
    with open(t._ndv_sidecar(gone2), "w") as f:
        _json.dump({"p": 12, "cols": {}}, f)
    from hephaestus_spark.sources.txlog import TxTable as _T

    thr = _T.DML_SPARK_PLAN_THRESHOLD
    _T.DML_SPARK_PLAN_THRESHOLD = 0
    try:
        deleted2 = t.vacuum(grace_seconds=0, spark=spark)
    finally:
        _T.DML_SPARK_PLAN_THRESHOLD = thr
    assert orphan2 in deleted2
    assert not os.path.exists(t._ndv_sidecar(orphan2))
    assert os.path.join("_txlog", "_ndv", f"{gone2}.ndv.json") in deleted2
    assert not os.path.exists(t._ndv_sidecar(gone2))
    # live files keep their sidecars and the summary still serves
    s = t.ndv_summary()
    assert s["user"]["covered_files"] == s["user"]["total_files"]
    assert abs(s["user"]["ndv"] - 500) / 500 < 0.05
