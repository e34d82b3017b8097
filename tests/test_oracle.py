"""Every registered query with an oracle must hash-match DuckDB.

This is the local mirror of the driver's t2 correctness gate
(CORRECTNESS_r{N}.json): row count + column names + order-insensitive
value hash with doubles rounded to 4 decimals.
"""

from __future__ import annotations

import pytest

import hephaestus_spark.queries  # noqa: F401 — registration side effects
from hephaestus_spark.compare import compare_frames
from hephaestus_spark.registry import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, oracle, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    spark_pdf = df.toPandas()
    oracle_pdf = oracle.execute(ORACLES[name]).df()
    report = compare_frames(spark_pdf, oracle_pdf)
    assert report["match"], f"{name}: {report}"


def test_q14_quantity_is_integral(sf_dir):
    """Pin the data property q14's prefix-frame rewrite rests on (r15
    optimization): RANGE bounds are inclusive, so prefix(<= q-6) only
    equals "everything below the ±5 frame" when l_quantity is a whole
    number (TPC-H quantities are integers 1..50). If a future data
    generation ever produced fractional quantities, this fails before
    the oracle comparison can silently drift."""
    import duckdb

    frac = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/lineitem.parquet'"
        " WHERE l_quantity <> floor(l_quantity) OR l_quantity IS NULL"
    ).fetchone()[0]
    assert frac == 0


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    """No-oracle queries must at least run and return a stable schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# Scaled sweeps (pre-driver gate, VERDICT r2 item 6): the r1 rounding
# bugs (q14/q19) and the r2 one (q34) each appeared only one scale
# factor above the default suite's sf0.001. Run explicitly:
#   python -m pytest tests/test_oracle.py -m slow -q
# ---------------------------------------------------------------------------
_SWEEP_DIRS = [
    pytest.param("/root/testdata/sf0.01", id="sf0.01"),
    pytest.param("/root/testdata/sf0.1", id="sf0.1"),
]
_SWEEP_CONS: dict = {}


def _oracle_for(sfd: str):
    import duckdb

    from hephaestus_spark.sources import TABLES

    con = _SWEEP_CONS.get(sfd)
    if con is None:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfd}/{t}.parquet'")
        _SWEEP_CONS[sfd] = con
    return con


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(ORACLES))
@pytest.mark.parametrize("sfd", _SWEEP_DIRS)
def test_oracle_match_scaled(name, sfd, spark):
    df = QUERIES[name](spark, sfd)
    report = compare_frames(df.toPandas(), _oracle_for(sfd).execute(ORACLES[name]).df())
    assert report["match"], f"{name}@{sfd}: {report}"
