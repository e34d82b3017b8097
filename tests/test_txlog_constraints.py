"""Table CHECK constraints (sources/txlog.py, r11): Delta's
ALTER TABLE ADD CONSTRAINT design — existing data validated at ADD
time, every row-introducing commit validated against only its new
files, writer-feature guarded so an unaware writer refuses the table,
SQL-standard NULL semantics (a NULL result passes), and schema
evolution refusing to orphan a stored expression."""

from __future__ import annotations

import pytest

from hephaestus_spark.sources import txlog
from hephaestus_spark.sources.txlog import (
    CommitConflict,
    ConstraintViolation,
    TxTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, val double")


def test_add_validates_existing_and_blocks_violating_append(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    v = t.add_check_constraint(spark, "val_pos", "val > 0")
    assert t.constraints() == {"val_pos": "val > 0"}
    assert t.history()[-1]["op"] == "addConstraint"

    before = t.latest_version()
    with pytest.raises(ConstraintViolation) as ei:
        t.append(_df(spark, [(3, "c", -1.0), (4, "d", 4.0), (5, "e", -2.0)]))
    # nothing committed, snapshot unchanged, counts reported
    assert t.latest_version() == before
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2}
    assert ei.value.counts == {"val_pos": 2}

    # a conforming append still lands
    t.append(_df(spark, [(6, "f", 6.0)]))
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2, 6}
    assert v == 1


def test_add_fails_when_current_rows_violate(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", -1.0)]))
    before = t.latest_version()
    with pytest.raises(ConstraintViolation):
        t.add_check_constraint(spark, "val_pos", "val > 0")
    assert t.latest_version() == before
    assert t.constraints() == {}


def test_null_result_passes_sql_standard(spark, tmp_path):
    """SQL-standard (and Delta/Postgres/DuckDB) CHECK: only a FALSE
    result violates — NULL name rows pass a LIKE constraint."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, None, 1.0)]))
    t.add_check_constraint(spark, "name_a", "name LIKE 'a%'")
    t.append(_df(spark, [(2, None, 2.0), (3, "ax", 3.0)]))
    with pytest.raises(ConstraintViolation):
        t.append(_df(spark, [(4, "bx", 4.0)]))
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2, 3}


def test_bad_expression_and_names_refused(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    with pytest.raises(Exception):  # analysis error: no such column
        t.add_check_constraint(spark, "ghost", "no_such_col > 0")
    with pytest.raises(ValueError):
        t.add_check_constraint(spark, "bad name!", "val > 0")
    t.add_check_constraint(spark, "val_pos", "val > 0")
    with pytest.raises(ValueError):  # duplicate
        t.add_check_constraint(spark, "val_pos", "val > 1")


def test_merge_validates_updates_and_inserts(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.add_check_constraint(spark, "val_pos", "val > 0")
    before = t.latest_version()
    # violating UPDATE (id=2 -> -5) must not land
    with pytest.raises(ConstraintViolation):
        t.merge(spark, _df(spark, [(2, "b", -5.0)]), "id", ["name", "val"])
    assert t.latest_version() == before
    assert {r["id"]: r["val"] for r in t.read(spark).collect()} == {
        1: 1.0,
        2: 2.0,
    }
    # conforming merge (update + insert) lands
    t.merge(spark, _df(spark, [(2, "b", 20.0), (3, "c", 3.0)]), "id", ["name", "val"])
    assert {r["id"]: r["val"] for r in t.read(spark).collect()} == {
        1: 1.0,
        2: 20.0,
        3: 3.0,
    }


def test_drop_constraint_restores_writes_and_retires_feature(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    t.add_check_constraint(spark, "val_pos", "val > 0")
    meta = t._fold_state()[3]
    assert "check_constraints" in meta["writer_features"]
    with pytest.raises(ValueError):
        t.drop_constraint("nope")
    t.drop_constraint("val_pos")
    assert t.constraints() == {}
    # last constraint gone -> writer feature retired
    meta = t._fold_state()[3]
    assert "check_constraints" not in (meta.get("writer_features") or [])
    t.append(_df(spark, [(2, "b", -2.0)]))  # now allowed
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2}


def test_unaware_writer_refuses_constrained_table(spark, tmp_path, monkeypatch):
    """The point of the writer feature: a writer version that would
    not ENFORCE constraints must refuse to commit at all."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    t.add_check_constraint(spark, "val_pos", "val > 0")
    monkeypatch.setattr(
        txlog,
        "SUPPORTED_WRITER_FEATURES",
        txlog.SUPPORTED_WRITER_FEATURES - {"check_constraints"},
    )
    t2 = TxTable(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="writer features"):
        t2.append(_df(spark, [(2, "b", 2.0)]))
    # reading needs no feature — constrained data is always safe to read
    assert {r["id"] for r in t2.read(spark).collect()} == {1}


def test_partition_column_constraint_enforced_on_append(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "2024-01-01", 1.0)], "id long, day string, val double"
    )
    t.append(df, partition_by=["day"])
    t.add_check_constraint(spark, "day_2024", "day >= '2024-01-01'")
    with pytest.raises(ConstraintViolation):
        t.append(
            spark.createDataFrame(
                [(2, "2023-12-31", 2.0)], "id long, day string, val double"
            )
        )
    t.append(
        spark.createDataFrame(
            [(3, "2024-02-01", 3.0)], "id long, day string, val double"
        )
    )
    assert {r["id"] for r in t.read(spark).collect()} == {1, 3}


def test_stream_batch_validates(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    t.add_check_constraint(spark, "val_pos", "val > 0")
    with pytest.raises(ConstraintViolation):
        t.append_stream_batch(_df(spark, [(2, "b", -2.0)]), "app", 0)
    assert t.append_stream_batch(_df(spark, [(2, "b", 2.0)]), "app", 0) == 2
    # replay of the same batch id is still a clean skip
    assert t.append_stream_batch(_df(spark, [(2, "b", 2.0)]), "app", 0) is None


def test_datasource_write_path_validates(spark, tmp_path):
    """The native connector's batch writer commits through
    commit_names — the gate must hold for externally-staged files."""
    from hephaestus_spark.sources.txlog_datasource import TxLogDataSource

    spark.dataSource.register(TxLogDataSource)
    t = TxTable(str(tmp_path / "t"))
    _df(spark, [(1, "a", 1.0)]).write.format("txlog").mode("append").save(
        t.path
    )
    t.add_check_constraint(spark, "val_pos", "val > 0")
    with pytest.raises(Exception, match="constraint violation"):
        _df(spark, [(2, "b", -2.0)]).write.format("txlog").mode(
            "append"
        ).save(t.path)
    assert {r["id"] for r in t.read(spark).collect()} == {1}
    _df(spark, [(3, "c", 3.0)]).write.format("txlog").mode("append").save(
        t.path
    )
    assert {r["id"] for r in TxTable(t.path).read(spark).collect()} == {1, 3}


def test_rename_and_drop_refuse_constrained_column(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    t.add_check_constraint(spark, "val_pos", "val > 0")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.rename_column(spark, "val", "amount")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.drop_column(spark, "val")
    # unrelated columns still evolve, and the constraint keeps biting
    t.rename_column(spark, "name", "label")
    with pytest.raises(ConstraintViolation):
        t.append(
            spark.createDataFrame(
                [(2, "b", -2.0)], "id long, label string, val double"
            )
        )
    # after dropping the constraint the rename goes through
    t.drop_constraint("val_pos")
    t.rename_column(spark, "val", "amount")
    assert set(t.read(spark).columns) == {"id", "label", "amount"}


def test_row_preserving_commits_skip_revalidation(spark, tmp_path, monkeypatch):
    """optimize/delete only keep existing (already-validated) rows —
    they must not pay a constraint scan. Pinned by monkeypatching the
    scan helper to explode if called."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]))
    t.add_check_constraint(spark, "val_pos", "val > 0")

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("row-preserving commit re-validated constraints")

    monkeypatch.setattr(TxTable, "_enforce_constraints", boom)
    t.optimize(spark, target_files=1)
    t.delete(spark, "id = 2")
    assert {r["id"] for r in t.read(spark).collect()} == {1, 3}


# ---- cross-engine agreement (r12, VERDICT r11 #5) ----
#
# The sessionless commit gate validates constraints with DuckDB
# (_duckdb_violations) while every session-ful path uses Spark
# (_raise_violations) — two expression engines in one commit path. The
# fuzz below asserts the verdicts AGREE (same violation counts, row for
# row) over NULL-heavy data for the portable-ANSI expression family the
# add-time binding probe admits; the probe tests pin that anything
# outside that family refuses at ADD time instead of at write time.

import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_NUM_ATOMS = [
    "val > 0",
    "val >= 0.5",
    "id <= 7",
    "id % 3 = 0",
    "val * 2 + id > 5",
    "abs(val) >= 0.25",
    "coalesce(val, 0.0) < 3",
    "id IN (1, 2, 3)",
    "val IS NULL",
    "id IS NOT NULL",
    "CASE WHEN val IS NULL THEN TRUE ELSE val < 2.5 END",
    "greatest(val, 1.0) > 1.5",
    "least(id, 5) = 5",
    "nullif(id, 4) IS NOT NULL",
]
_STR_ATOMS = [
    "name IS NOT NULL",
    "length(name) < 3",
    "upper(name) = name",
    "name LIKE 'a%'",
    "substr(name, 1, 1) = 'b'",
    "name = ''",
    "coalesce(name, 'zz') >= 'b'",
    "name IN ('a', 'bb', '')",
]


@st.composite
def _portable_exprs(draw):
    n = draw(st.integers(1, 3))
    parts = [draw(st.sampled_from(_NUM_ATOMS + _STR_ATOMS)) for _ in range(n)]
    e = parts[0]
    for p in parts[1:]:
        e = f"({e}) {draw(st.sampled_from(['AND', 'OR']))} ({p})"
    if draw(st.booleans()):
        e = f"NOT ({e})"
    return e


# NULL-heavy and boundary-heavy: every column ~30% NULL, empty strings,
# negatives, exact .5 boundaries, a value equal to each IN-list member
_FUZZ_ROWS = [
    (None, None, None),
    (0, "", 0.0),
    (1, "a", 0.5),
    (2, "ab", -1.25),
    (3, "B", 2.5),
    (4, "abc", None),
    (5, None, 3.0),
    (6, "zz", -0.25),
    (7, "a", 5.0),
    (None, "b", 0.25),
    (8, "A", None),
    (9, "", 1.0),
    (-3, "ba", -2.5),
    (12, "bb", 2.0),
    (None, "", None),
    (15, "aB", 0.75),
]


@pytest.fixture(scope="module")
def xengine_table(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("xengine"))
    pq.write_table(
        pa.table(
            {
                "id": pa.array([r[0] for r in _FUZZ_ROWS], pa.int64()),
                "name": pa.array([r[1] for r in _FUZZ_ROWS], pa.string()),
                "val": pa.array([r[2] for r in _FUZZ_ROWS], pa.float64()),
            }
        ),
        os.path.join(d, "staged.parquet"),
    )
    return d


@settings(
    max_examples=35,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=_portable_exprs())
def test_cross_engine_constraint_verdicts_agree(spark, xengine_table, expr):
    cons = {"c": expr}
    t = TxTable(xengine_table)
    t._probe_duckdb_binding(  # the family the probe admits...
        spark.read.parquet(os.path.join(xengine_table, "staged.parquet")).schema,
        cons,
    )
    try:  # ...must get the SAME verdict from both engines
        t._duckdb_violations(["staged.parquet"], None, cons)
        duck = {}
    except ConstraintViolation as e:
        duck = e.counts
    df = spark.read.parquet(os.path.join(xengine_table, "staged.parquet"))
    try:
        TxTable._raise_violations(df, cons)
        via_spark = {}
    except ConstraintViolation as e:
        via_spark = e.counts
    assert duck == via_spark, expr


def test_probe_refuses_spark_only_expression_at_add_time(spark, tmp_path):
    """A CHECK only Spark can bind refuses at ADD time (clear error,
    nothing committed) instead of bricking the first sessionless
    connector write after it lands."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 1.0)]))
    before = t.latest_version()
    with pytest.raises(ValueError, match="engine-portable"):
        t.add_check_constraint(spark, "sparky", "xxhash64(name) != 0")
    assert t.latest_version() == before
    assert t.constraints() == {}


def test_probe_admits_to_date_via_compat_macro(spark, tmp_path):
    """to_date maps exactly onto a DuckDB cast — the shared compat
    macro makes it bind in BOTH the probe and the sessionless gate."""
    t = TxTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "2024-03-01"), (2, "2024-03-02")], "id long, d string"
        )
    )
    t.add_check_constraint(
        spark, "d_recent", "to_date(d) >= DATE '2024-01-01'"
    )
    # the sessionless gate validates the same expression (good rows
    # pass, a violating staged file refuses)
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    _pq.write_table(
        _pa.table({"id": _pa.array([9], _pa.int64()),
                   "d": _pa.array(["1999-01-01"], _pa.string())}),
        os.path.join(t.path, "staged-bad.parquet"),
    )
    with pytest.raises(ConstraintViolation):
        t._duckdb_violations(
            ["staged-bad.parquet"], None, t.constraints()
        )
