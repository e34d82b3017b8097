"""Cross-engine result comparison (mirrors the driver's t2 discipline).

Discipline (BASELINE.md / FIXTURES.md): round DOUBLE columns to 4
decimals, sort rows by all output columns ascending (NULLS FIRST),
compare column-name-sorted value hashes. Used by the local test suite to
validate every registered oracle before the driver does.
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NULL"  # treat NaN as NULL (duckdb/pandas boundary)
        if math.isinf(f):
            return "Inf" if f > 0 else "-Inf"
        r = round(f, 4) + 0.0  # normalize -0.0
        return f"{r:.4f}"
    if isinstance(v, Decimal):
        return f"{float(v):.4f}"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        canon = tuple(_canon_cell(v) if not (isinstance(v, float) and pd.isna(v)) else "NULL" for v in row)
        out.append(canon)
    out.sort()
    return out


def hash_rows(rows: list[tuple[str, ...]]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> dict:
    """Return a comparison report dict; 'match' is the verdict."""
    report: dict = {
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(oracle_pdf),
        "spark_cols": sorted(spark_pdf.columns),
        "oracle_cols": sorted(oracle_pdf.columns),
    }
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        report["match"] = False
        report["why"] = "column-name mismatch"
        return report
    if len(spark_pdf) != len(oracle_pdf):
        report["match"] = False
        report["why"] = "row-count mismatch"
        return report
    a = canonical_rows(spark_pdf)
    b = canonical_rows(oracle_pdf)
    ha, hb = hash_rows(a), hash_rows(b)
    report["spark_hash"] = ha
    report["oracle_hash"] = hb
    report["match"] = ha == hb
    if not report["match"]:
        # surface the first few differing rows for debugging
        sa, sb = set(a), set(b)
        report["why"] = "value-hash mismatch"
        report["only_spark"] = sorted(sa - sb)[:5]
        report["only_oracle"] = sorted(sb - sa)[:5]
    return report
