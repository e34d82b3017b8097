"""Dimension get-or-create (reference operator A13).

The reference resolves ``type_name -> type_id`` with a per-name
select/insert/re-select round-trip
(/root/reference/internal/repository/task.go:13-45). Set-wise and
deterministic (SURVEY.md §2.B Q22): surrogate ids are dense_rank over
the name ordering, then joined back — the join side is tiny (distinct
names), so it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def dense_surrogate_ids(df: DataFrame, name_col: str, id_col: str = "type_id") -> DataFrame:
    """Distinct names -> dense surrogate ids (1-based, name-ordered)."""
    names = df.select(name_col).distinct()
    w = W.orderBy(F.col(name_col).asc())
    return names.select(
        F.col(name_col),
        F.dense_rank().over(w).cast("bigint").alias(id_col),
    )


def attach_surrogate_ids(df: DataFrame, name_col: str, id_col: str = "type_id") -> DataFrame:
    """Get-or-create: every name resolves; new names mint new ids.

    The single-row window in dense_surrogate_ids is fine because it runs
    over the *distinct* name set (dimension-sized); the fact-side join is
    broadcast."""
    dim = dense_surrogate_ids(df, name_col, id_col)
    return df.join(F.broadcast(dim), on=name_col, how="left")
