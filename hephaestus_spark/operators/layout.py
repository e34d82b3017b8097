"""Z-order (Morton) clustering keys for multi-dimensional data layout.

Why this is an engine feature: at 100 TB, the cheapest query is the one
that never reads the file. Parquet/Delta min-max statistics prune files
only when the data is CLUSTERED on the filtered column — and sorting on
one column destroys locality on every other. Interleaving the bits of k
columns into one sort key (Morton order) gives every interleaved column
locality ~ |file_range|^(1/k), so min-max skipping works for filters on
ANY of them. This is the same layout trick Delta Lake's OPTIMIZE ZORDER
BY applies; here it is a plain column expression, so it composes with
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` + any writer.

The key is pure integer bit math (shifts/AND/OR-as-add), generated
identically for Spark and DuckDB by the two spellings below — one
formula, two renderings, hash-exact across engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each column (bigint).

    Bit ``i`` of column ``j`` lands at position ``i * len(cols) + j``;
    with the default 16 bits and 2 columns the key fits in 32 bits.
    Columns must be non-negative; values are masked to ``bits`` first
    (callers bucketize wider domains — quantile-rank or hash the
    column into 2^bits buckets — because Morton locality only needs
    the BUCKET to be right). The expression is ~bits*len(cols) codegen
    terms: scan-side, no shuffle, no UDF.
    """
    mask = (1 << bits) - 1
    terms = []
    for j, c in enumerate(cols):
        masked = F.col(c).cast("bigint").bitwiseAND(F.lit(mask))
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(masked, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + j,
                )
            )
    return reduce(lambda a, b: a + b, terms).alias("zkey")


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """DuckDB rendering of the SAME formula as :func:`zorder_key`.

    Generated from one loop so the two engines cannot drift: any edit
    to the bit placement changes both spellings together.
    """
    mask = (1 << bits) - 1
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"(((({c} & {mask}) >> {i}) & 1) << {i * len(cols) + j})"
            )
    return " + ".join(terms)
