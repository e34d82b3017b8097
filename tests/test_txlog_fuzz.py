"""Model-based lifecycle fuzz for the transactional table layer.

A seeded random walk drives a hive-partitioned TxTable through the
full mutation surface — appends, merge-on-read and copy-on-write
deletes, dynamic partition overwrite, compaction, RESTORE — while a
plain Python dict mirrors the expected rows per committed version.
After every step the live snapshot, the metadata COUNT, and a randomly
chosen historical version must equal the model exactly. This is the
test shape that catches cross-feature interactions no single-feature
test does (e.g. restore across a DV that predates an overwrite of the
same partition)."""

from __future__ import annotations

import random

import pytest

from hephaestus_spark.sources.txlog import TxTable

DAYS = ["2024-01-01", "2024-01-02", "2024-01-03"]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, d, v) for i, d, v in rows], "id long, day string, val double"
    )


def _snapshot(spark, t, version=None):
    return {
        r["id"]: (r["day"], r["val"])
        for r in t.read(spark, version).collect()
    }


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_lifecycle_fuzz_partitioned(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = TxTable(str(tmp_path / f"t{seed}"))
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        rows = [
            (next_id + i, rng.choice(DAYS), float(next_id + i)) for i in range(n)
        ]
        next_id += n
        return rows

    model: dict[int, tuple[str, float]] = {}
    states: dict[int, dict] = {}

    rows = fresh_rows(6)
    v = t.append(_df(spark, rows), partition_by=["day"])
    model = {i: (d, x) for i, d, x in rows}
    states[v] = dict(model)

    for step in range(12):
        op = rng.choice(
            [
                "append",
                "delete_mor",
                "delete",
                "optimize",
                "overwrite",
                "restore",
                "update",
                "clone",
            ]
        )
        if op == "append":
            rows = fresh_rows(rng.randint(1, 4))
            v = t.append(_df(spark, rows))
            model.update({i: (d, x) for i, d, x in rows})
        elif op in ("delete_mor", "delete"):
            k = rng.randint(2, 4)
            m = rng.randrange(k)
            pred = f"id % {k} = {m}"
            hit = {i for i in model if i % k == m}
            if op == "delete_mor":
                v = t.delete_mor(spark, pred)[0]
            else:
                v = t.delete(spark, pred)[0]
            if not hit:
                # no matching rows: no commit happened
                assert v == max(states)
                continue
            model = {i: dv for i, dv in model.items() if i not in hit}
        elif op == "optimize":
            if not model:
                continue  # nothing to compact; optimize refuses empty
            v = t.optimize(spark, target_files=1)
        elif op == "overwrite":
            day = rng.choice(DAYS)
            rows = [
                (next_id + j, day, float(next_id + j))
                for j in range(rng.randint(1, 3))
            ]
            next_id += len(rows)
            v = t.overwrite_partitions(spark, _df(spark, rows))
            model = {i: dv for i, dv in model.items() if dv[0] != day}
            model.update({i: (d, x) for i, d, x in rows})
        elif op == "update":
            # r11: random modulo-scoped UPDATE bumping val; the model
            # applies the same arithmetic to the same keys
            k = rng.randint(2, 4)
            m = rng.randrange(k)
            bump = float(rng.randint(1, 100))
            hit = {i for i in model if i % k == m}
            v = t.update(spark, f"id % {k} = {m}", {"val": f"val + {bump}"})[0]
            if not hit:
                assert v == max(states)
                continue
            model = {
                i: (d, x + bump) if i in hit else (d, x)
                for i, (d, x) in model.items()
            }
        elif op == "clone":
            # r11: shallow-clone the table mid-walk; the clone must
            # serve the model exactly, diverge independently, and the
            # ORIGINAL walk continues untouched
            cpath = str(tmp_path / f"clone{seed}-{step}")
            c = t.clone_to(cpath)
            assert _snapshot(spark, c) == model, f"seed={seed} step={step} clone"
            if model:
                c.delete(spark, "id % 2 = 0")
                assert _snapshot(spark, t) == model, (
                    f"seed={seed} step={step} clone-isolation"
                )
            continue  # no commit on the fuzzed table itself
        else:  # restore
            target = rng.choice(sorted(states))
            v = t.restore(spark, target)
            model = dict(states[target])
            if v in states:  # no-op restore: already at the target
                continue
        states[v] = dict(model)

        assert _snapshot(spark, t) == model, f"seed={seed} step={step} op={op}"
        s = t.stats_summary()
        assert (s["count"], s["count_exact"]) == (len(model), True)
        assert {p["day"] for p in t.partitions()} >= {d for d, _ in model.values()}
        # time travel to a random committed version matches its model
        old = rng.choice(sorted(states))
        if states[old]:
            assert _snapshot(spark, t, old) == states[old], (
                f"seed={seed} step={step} time-travel to {old} after {op}"
            )
