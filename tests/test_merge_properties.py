"""Property-based tests for the SCD-1 merge (A10–A14).

The reference has no property tests (SURVEY.md §5); these pin the merge
invariants the per-row Go loop guarantees implicitly, over randomized
snapshots/deltas with NULLs everywhere:

  P1 key completeness: result keys = snapshot keys ∪ staged keys
  P2 incoming-wins: for every staged key the result row equals the
     staged row (SCD-1 upsert)
  P3 untouched-keeps: keys absent from the delta are byte-identical
  P4 skip-detection is null-safe: action='skip' ⇔ rows equal through
     NULLs (no 'update' ever fires on an identical row — the
     IS DISTINCT FROM pitfall)
  P5 idempotence: merging the same delta twice = merging it once
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hephaestus_spark.operators.merge import scd1_merge

VAL = st.one_of(st.none(), st.sampled_from(["a", "b", "c", ""]))
ROW = st.tuples(st.integers(min_value=0, max_value=14), VAL, VAL)
TABLE = st.lists(ROW, max_size=12, unique_by=lambda r: r[0])

SCHEMA = "id int, x string, y string"
COLS = ["x", "y"]


def _df(spark, rows):
    return spark.createDataFrame(list(rows), SCHEMA)


def _by_key(rows):
    return {r[0]: (r[1], r[2]) for r in rows}


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snap=TABLE, delta=TABLE)
def test_merge_invariants(spark, snap, delta):
    out = scd1_merge(_df(spark, snap), _df(spark, delta), "id", COLS).collect()
    got = {r["id"]: ((r["x"], r["y"]), r["action"]) for r in out}
    old, new = _by_key(snap), _by_key(delta)

    # P1 — key completeness, no duplicates
    assert set(got) == set(old) | set(new)
    assert len(out) == len(got)

    for k, (vals, action) in got.items():
        if k in new:
            # P2 — incoming wins (null-safely)
            assert vals == new[k]
            if k not in old:
                assert action == "insert"
            elif old[k] == new[k]:
                # P4 — identical through NULLs must be 'skip', not 'update'
                assert action == "skip"
            else:
                assert action == "update"
        else:
            # P3 — untouched snapshot rows survive unchanged
            assert vals == old[k] and action == "keep"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snap=TABLE, delta=TABLE)
def test_merge_idempotent(spark, snap, delta):
    once = scd1_merge(
        _df(spark, snap), _df(spark, delta), "id", COLS, with_action=False
    )
    twice = scd1_merge(once, _df(spark, delta), "id", COLS, with_action=False)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
