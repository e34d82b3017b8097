"""REAL multi-writer races over one table (r11) — no monkeypatched
commit hooks: concurrent threads drive appends, predicate-scoped
UPDATE/DELETE/MERGE, and OPTIMIZE through their public retry contracts
(rebase via ``_commit_snapshot_dependent`` where the predicate allows,
CommitConflict + caller re-run where it does not) and the final table
must equal a model computed from the operations that REPORTED success.

This is the test the deterministic rebase suite cannot be: the race
windows fall wherever the OS scheduler puts them, so every interleaving
of stage/validate/commit is fair game, including multi-way pileups.
(Submitting jobs to one SparkSession from several threads is an
explicitly supported Spark pattern; each TxTable handle is independent
driver state.)"""

from __future__ import annotations

import threading

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.sources.txlog import CommitConflict, TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, band long, val double")


def _retry(fn, attempts=12):
    """The documented caller contract for un-rebasable conflicts:
    re-run against the fresh snapshot."""
    for _ in range(attempts):
        try:
            return fn()
        except CommitConflict:
            continue
    raise AssertionError("operation starved after 12 re-runs")


def test_concurrent_band_updates_and_appends_converge(spark, tmp_path):
    """4 writer threads: two band-scoped UPDATEs (disjoint key ranges,
    declared via prune_column so they can rebase over the appends),
    two blind appenders landing rows outside both bands. Every thread
    must finish; the final table must reflect ALL of them."""
    path = str(tmp_path / "t")
    t = TxTable(path)
    # bands: [0,99] and [100,199]; appenders write 1000+
    rows = [(i, i // 100, float(i)) for i in range(200)]
    t.append(
        _df(spark, rows)
        .repartitionByRange(4, F.col("id"))
        .sortWithinPartitions("id")
    )
    errs: list[BaseException] = []

    def run(fn):
        def inner():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 — surfaced below
                errs.append(e)

        return inner

    def update_band(lo, hi, bump):
        def op():
            TxTable(path).update(
                spark,
                f"id BETWEEN {lo} AND {hi}",
                {"val": f"val + {bump}"},
                prune_column="id",
                lo=lo,
                hi=hi,
            )

        _retry(op)

    def appender(base):
        for k in range(3):
            TxTable(path).append(
                _df(
                    spark, [(base + k, 99, float(base + k))]
                ).coalesce(1)
            )

    threads = [
        threading.Thread(target=run(lambda: update_band(0, 99, 10000))),
        threading.Thread(target=run(lambda: update_band(100, 199, 20000))),
        threading.Thread(target=run(lambda: appender(1000))),
        threading.Thread(target=run(lambda: appender(2000))),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errs, errs
    got = {r["id"]: r["val"] for r in TxTable(path).read(spark).collect()}
    assert len(got) == 206
    assert all(got[i] == i + 10000 for i in range(0, 100))
    assert all(got[i] == i + 20000 for i in range(100, 200))
    for base in (1000, 2000):
        assert all(got[base + k] == base + k for k in range(3))
    # the log tells the story: exactly 1 seed + 6 appends + 2 updates
    hist = TxTable(path).history()
    ops = [h["op"] for h in hist]
    assert ops.count("update") == 2 and ops.count("append") == 7


def test_concurrent_merges_same_key_serialize(spark, tmp_path):
    """Two un-scoped merges on the SAME key race: no rebase is legal
    (each read the whole table), so one must conflict and re-run. The
    surviving value must be one of the two written values — never a
    lost-update hybrid — and the key stays unique."""
    path = str(tmp_path / "t")
    t = TxTable(path)
    t.append(_df(spark, [(1, 0, 1.0), (2, 0, 2.0)]).coalesce(1))
    errs: list[BaseException] = []
    done = []

    def merger(val):
        def op():
            TxTable(path).merge(
                spark,
                _df(spark, [(1, 0, val)]),
                "id",
                ["band", "val"],
            )

        try:
            _retry(op)
            done.append(val)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [
        threading.Thread(target=merger, args=(100.0,)),
        threading.Thread(target=merger, args=(200.0,)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errs, errs
    assert sorted(done) == [100.0, 200.0]
    rows = TxTable(path).read(spark).filter("id = 1").collect()
    assert len(rows) == 1 and rows[0]["val"] in (100.0, 200.0)
    # both merges committed (serialized): two merge entries in the log
    assert [h["op"] for h in TxTable(path).history()].count("merge") == 2


def test_optimize_under_append_storm(spark, tmp_path):
    """OPTIMIZE rebases over pure appends (disjoint=True): under a
    storm of tiny appends it must still land without starving, and no
    appended row may be lost or duplicated by the compaction."""
    path = str(tmp_path / "t")
    t = TxTable(path)
    t.append(
        _df(spark, [(i, 0, float(i)) for i in range(50)])
        .repartitionByRange(8, F.col("id"))
    )
    errs: list[BaseException] = []
    stop = threading.Event()
    appended = []

    def storm():
        k = 0
        try:
            while not stop.is_set() and k < 12:
                TxTable(path).append(
                    _df(spark, [(10000 + k, 1, float(k))]).coalesce(1)
                )
                appended.append(10000 + k)
                k += 1
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    th = threading.Thread(target=storm)
    th.start()
    try:
        v = _retry(lambda: TxTable(path).optimize(spark, target_files=2))
    finally:
        stop.set()
        th.join(timeout=600)
    assert not errs, errs
    assert v >= 1
    got = {r["id"] for r in TxTable(path).read(spark).collect()}
    assert set(range(50)) <= got
    assert got - set(range(50)) == set(appended)
    assert TxTable(path).read(spark).count() == 50 + len(appended)
