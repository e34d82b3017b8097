"""Multi-writer contention on one transactional table (r9, VERDICT r8
#6): two concurrent streaming writers and a maintenance actor
(OPTIMIZE + vacuum + log expiry) race the same table through a
barrier-stepped, deterministic interleaving. Asserts exactly-once
delivery under redelivery, conflict-retry liveness for both appends
and compaction, vacuum never eating a live file mid-contention, and a
cold reader reconstructing the exact row set from the checkpointed
log afterwards.

The unit-level CommitConflict paths (exclusive create, merge
staleness) are covered in test_txlog.py; this file makes the three
actors collide ON PURPOSE, round after round, so retry loops and the
txn map are exercised under genuine interleaving rather than
single-shot races.
"""

from __future__ import annotations

import os
import threading

from hephaestus_spark.sources.txlog import CommitConflict, TxTable


ROUNDS = 14  # crosses the checkpoint interval with room to spare


def test_two_streams_and_maintenance_race_one_table(spark, tmp_path):
    from hephaestus_spark.sources import txlog as tx

    t_path = str(tmp_path / "t")
    barrier = threading.Barrier(3)
    errors: list = []

    def stream(app: str, offset: int) -> None:
        t = TxTable(t_path)
        try:
            for i in range(ROUNDS):
                barrier.wait(timeout=120)  # contention phase opens
                df = spark.createDataFrame(
                    [(offset + i, app, float(i))],
                    "id long, name string, val double",
                ).coalesce(1)
                # both streams + possibly OPTIMIZE commit in this phase:
                # the internal retry loop must land the batch exactly once
                assert t.append_stream_batch(df, app, i) is not None
                if i % 3 == 0:  # deterministic redelivery (restart model)
                    assert t.append_stream_batch(df, app, i) is None
                barrier.wait(timeout=120)  # round closes
        except Exception as e:  # pragma: no cover - failure reporting
            import traceback

            errors.append((app, traceback.format_exc()[-2000:], repr(e)))
            barrier.abort()

    def maintenance() -> None:
        t = TxTable(t_path)
        try:
            for i in range(ROUNDS):
                barrier.wait(timeout=120)
                if i % 4 == 3:
                    # OPTIMIZE races the two appends: it must either win
                    # its version or lose the exclusive create and retry
                    # on the fresh snapshot — never corrupt, never stall
                    for _ in range(60):
                        try:
                            t.optimize(spark, target_files=2)
                            break
                        except CommitConflict:
                            continue
                    else:  # pragma: no cover
                        raise AssertionError("optimize starved out")
                    # default grace: concurrently staged files are
                    # inside the window, so vacuum must delete NOTHING
                    assert t.vacuum() == []
                    t.expire_log()
                barrier.wait(timeout=120)
        except Exception as e:  # pragma: no cover - failure reporting
            import traceback

            errors.append(("maintenance", traceback.format_exc()[-2000:], repr(e)))
            barrier.abort()

    threads = [
        threading.Thread(target=stream, args=("appA", 0)),
        threading.Thread(target=stream, args=("appB", 100_000)),
        threading.Thread(target=maintenance),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    # exactly-once: every (app, batch) payload exactly once, none lost
    # to a lost race, none duplicated by a redelivery
    rows = [(r["id"], r["name"], r["val"]) for r in TxTable(t_path).read(spark).collect()]
    expected = {(i, "appA", float(i)) for i in range(ROUNDS)} | {
        (100_000 + i, "appB", float(i)) for i in range(ROUNDS)
    }
    assert sorted(rows) == sorted(expected)

    # a COLD reader reconstructs the same state from checkpoint + tail
    cold = TxTable(t_path)
    assert cold._checkpoint_versions(), "contention never crossed a checkpoint"
    assert cold.read(spark).count() == 2 * ROUNDS
    # the folded txn map still skips every historical batch id
    df0 = spark.createDataFrame([(0, "appA", 0.0)], "id long, name string, val double")
    for b in range(ROUNDS):
        assert cold.append_stream_batch(df0, "appA", b) is None

    # quiesced zero-grace vacuum: reclaims only unreferenced files
    # (compaction leftovers below the expired horizon) and the data
    # still reads back bit-identically afterwards
    cold.vacuum(grace_seconds=0)
    assert sorted(
        (r["id"], r["name"], r["val"]) for r in cold.read(spark).collect()
    ) == sorted(expected)
    # history stayed an audit log: no duplicate versions, ops sane
    hist = cold.history()
    versions = [h["version"] for h in hist]
    assert versions == sorted(set(versions))
    assert {h["op"] for h in hist} <= {"streamAppend", "optimize", "append"}
