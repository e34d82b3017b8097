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


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    """No-oracle queries must at least run and return a stable schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0
