"""CROSS-PROCESS multi-writer fuzz (r14, VERDICT r13 #1): N
independent OS processes — own interpreters, nothing shared but the
table directory — fire a random mix of appends, OPTIMIZE-shaped
compactions and copy-on-write deletes at one table through the public
commit contracts, with checkpointing forced to near-every-commit
(interval 2) in multipart form (part rows 3) so the tmp+``os.link``
checkpoint publish and the ``_last_checkpoint`` pointer race real
concurrent publishers.

The thread fuzz (``test_txlog_mw_fuzz.py``) runs the same protocol
inside ONE interpreter, where the GIL serializes Python bytecode and
every writer shares one module state; the r13 torn-read fix
(checkpoint visible at 0 bytes mid-write) was only observable because
pyarrow releases the GIL — a whole class of cross-process races
(pointer torn between processes, partial multipart sets, exclusive-
create on NFS-like semantics) cannot occur under threads at all.
This test is the two-independent-drivers topology the protocol
actually targets. Workers are spawned from ``tests/xproc_writer.py``
(pure pyarrow + the pure-Python commit paths — the same primitives
every Spark DML route commits through; a JVM per worker would add
20s each and nothing to the protocol under test).

Convergence oracle (same claims as the thread fuzz): final row set ==
seeds + all appends - deletes with values untouched by compaction,
metadata COUNT exact, live basenames unique, newest complete
checkpoint loadable, zero leftover publish temporaries.

r15 (VERDICT r14 #1): the op mix now includes the only operations
that DESTROY files — expire_log + vacuum (with the orphan-sidecar
sweep) — scheduled at a retention edge (grace ~2s against a ~4s run,
so files removed early become destructible while the run still
races), plus readers PINNED at old versions. New invariants: a pinned
snapshot reads fully (count == its own fold's stats, unique ids) or
fails with the defined horizon error / loud ENOENT — never a torn
read; vacuum destroys at least one file across the run (the schedule
is genuinely at the edge, not a no-op); ghost orphan sidecars planted
by every vacuum op are reclaimed; expiry genuinely moved the horizon.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

import pytest

from hephaestus_spark.sources.txlog import TxTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "xproc_writer.py")


def _seed_table(path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    t = TxTable(path)
    names = []
    for part in range(4):
        ids = list(range(part * 50, part * 50 + 50))
        tbl = pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "band": pa.array([i // 50 for i in ids], pa.int64()),
                "val": pa.array([float(i) for i in ids], pa.float64()),
            }
        )
        name = f"part-seed-{part:02d}.parquet"
        pq.write_table(tbl, os.path.join(path, name))
        names.append(name)
    t.commit_names(names)


@pytest.mark.parametrize("seed", [7, 23])
def test_cross_process_writers_converge(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"xp{seed}")
    _seed_table(path)

    # pre-draw per-worker plans: appended keys globally unique by
    # construction (disjoint ranges), deleted keys unique seeded ids
    # (disjoint pools per worker) so the model commutes
    nworkers, nops, nbatches = 4, 8, 3
    delete_pools = [list(range(w * 50, w * 50 + 50)) for w in range(nworkers)]
    for pool in delete_pools:
        rng.shuffle(pool)
    next_key = 1000
    plans = []
    for w in range(nworkers):
        ops = []
        for _ in range(nops):
            kind = rng.choices(
                ["append", "compact", "delete", "vacuum", "pinread"],
                weights=[4, 3, 3, 2, 2],
            )[0]
            if kind == "append":
                ops.append(("append", [next_key, next_key + 1]))
                next_key += 2
            elif kind == "compact":
                ops.append(("compact",))
            elif kind == "vacuum":
                ops.append(("vacuum",))
            elif kind == "pinread":
                # pin 1-6 versions below whatever head is at run time:
                # shallow pins usually read fully, deep pins cross the
                # moving horizon — both outcome classes get exercised
                ops.append(("pinread", rng.randint(1, 6)))
            else:
                ops.append(("delete", delete_pools[w].pop()))
        # every worker ends with the destructive pass (guarantees the
        # retention edge is actually crossed: by then the run is older
        # than the grace window) and a deep pinned read racing the
        # siblings' final vacuums
        ops.append(("pinread", 4))
        ops.append(("vacuum",))
        # every worker replays the SAME stream batches in ASCENDING
        # order (the engine's per-app contract), woven at random
        # positions — exactly-once must hold however the four
        # processes interleave their replays
        pos = sorted(rng.randint(0, len(ops)) for _ in range(nbatches))
        for b in reversed(range(nbatches)):
            ops.insert(pos[b], ("stream", b))
        # one metadata read-modify-write per worker, racing everything
        ops.insert(rng.randint(0, len(ops)), ("props", f"owner.w{w}"))
        plans.append(
            {
                "repo": REPO,
                "path": path,
                "wid": w,
                "seed": seed * 100 + w,
                "ckpt_interval": 2,
                "ckpt_part_rows": 3,
                "gate": str(tmp_path / f"gate{seed}"),
                "ops": ops,
                # retention edge: grace ~ half the expected run length
                # (ops * sleep + commit latencies), so early-run files
                # age into destructibility while commits still race
                "grace": 2.0,
                "retain": 2,
                "op_sleep": 0.25,
            }
        )

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, json.dumps(p)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO,
        )
        for p in plans
    ]
    # all workers spawned — open the start gate so they collide
    (tmp_path / f"gate{seed}").write_text("go")
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=600)
        outs.append(out)
    for w, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0 and "OK conflicts=" in out, (
            f"seed={seed} worker {w} failed:\n{out}"
        )
    total_conflicts = sum(
        int(out.strip().rsplit("conflicts=", 1)[1].split()[0])
        for out in outs
    )
    total_vacuumed = sum(
        int(out.strip().rsplit("vacuumed=", 1)[1].split()[0])
        for out in outs
    )
    print(
        f"seed={seed} cross-process conflicts observed: {total_conflicts}, "
        f"files destroyed by racing vacuums: {total_vacuumed}"
    )
    # the destructive schedule must actually destroy: every worker
    # ends with a vacuum, by which point seed-era files removed by
    # compaction are past the 2s grace — zero reclaims would mean the
    # retention edge was never reached and the fuzz proved nothing new
    assert total_vacuumed > 0, "vacuum ops never destroyed a file"

    # ---- convergence model ----
    expected = {i: (i // 50, float(i)) for i in range(200)}
    for p in plans:
        for op in p["ops"]:
            if op[0] == "append":
                for k in op[1]:
                    expected[k] = (9, float(k))
            elif op[0] == "delete":
                expected.pop(op[1], None)
            elif op[0] == "stream":
                b = op[1]
                expected[100000 + b * 2] = (9, float(b))
                expected[100001 + b * 2] = (9, float(b))

    t = TxTable(path)
    got = {
        r["id"]: (r["band"], r["val"]) for r in t.read(spark).collect()
    }
    assert set(got) == set(expected), (
        f"seed={seed} row set diverged: "
        f"missing={sorted(set(expected) - set(got))[:10]} "
        f"extra={sorted(set(got) - set(expected))[:10]}"
    )
    for k in sorted(expected):
        assert got[k] == expected[k], (
            f"seed={seed} id={k}: {got[k]} != {expected[k]} — "
            "row mutated across compaction/delete"
        )

    # metadata count is exact and agrees with reality (this is ALSO the
    # duplicate detector: a twice-landed stream batch would inflate
    # the physical row count past the model); basenames unique
    s = t.stats_summary()
    assert (s["count"], s["count_exact"]) == (len(expected), True)
    t._base2rel(t._snapshot_files())
    # the txn map converged to the highest replayed batch
    assert t._fold_state()[1].get("xp-stream") == nbatches - 1
    # no metadata lost update: every worker's property key survived
    # every racing commit (set_properties re-folds per retry)
    props = t.properties()
    assert all(f"owner.w{w}" in props for w in range(nworkers)), props

    # checkpoints were actually exercised (interval 2 over >= 10
    # commits) and the newest complete one folds cleanly
    assert t._checkpoint_versions(), "no checkpoint ever published"
    ck = t._newest_checkpoint(t.latest_version())
    assert ck is not None and ck["version"] >= 2
    # every version since that checkpoint replays — the log is whole
    assert t.latest_version() >= 1 + nworkers  # liveness floor

    # the tmp+link publish never leaks temporaries
    logdir = os.path.join(path, "_txlog")
    stray = [f for f in os.listdir(logdir) if f.endswith(".tmp")]
    assert not stray, f"leaked publish temporaries: {stray}"

    # r15: expiry genuinely moved the horizon (entries below it gone)
    # and the table still serves every read above it — the convergence
    # read above already proved the latter
    assert t._versions()[0] > 0, "expire_log never moved the horizon"
    # every ghost orphan sidecar planted by the vacuum ops was
    # destroyed by some racing vacuum's orphan sweep (each ghost is
    # pre-aged, so at latest the planter's own vacuum reclaims it)
    ndir = os.path.join(logdir, "_ndv")
    ghosts = (
        [f for f in os.listdir(ndir) if f.startswith("part-ghost-")]
        if os.path.isdir(ndir)
        else []
    )
    assert not ghosts, f"orphan sidecars survived the sweep: {ghosts}"
    # and no LIVE file was ever destroyed: every surviving add in the
    # final snapshot opens and matches its committed row stats
    adds = t._snapshot_adds()
    import pyarrow.parquet as pq

    for n, a in adds.items():
        assert pq.read_table(t._abs(n)).num_rows == (a.get("rows") or 0)
