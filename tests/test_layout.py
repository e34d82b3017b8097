"""Z-order layout: key correctness and clustering effectiveness.

The query oracle (x_zorder_key) proves the bit math matches DuckDB;
these tests prove the LAYOUT CLAIM — that sorting by the Morton key
actually shrinks per-file min-max ranges on BOTH interleaved columns,
which is what makes multi-dimensional file skipping work at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hephaestus_spark.operators.layout import zorder_key
from hephaestus_spark.sources import load_table


def test_zorder_key_matches_reference_interleave(spark, sf_dir):
    df = (
        spark.range(300)
        .select(
            (F.col("id") * 7 % 256).alias("a"),
            (F.col("id") * 13 % 256).alias("b"),
        )
        .withColumn("zkey", zorder_key(["a", "b"], bits=8))
    )
    for row in df.collect():
        expect = 0
        for i in range(8):
            expect |= ((row.a >> i) & 1) << (2 * i)
            expect |= ((row.b >> i) & 1) << (2 * i + 1)
        assert row.zkey == expect, (row.a, row.b)


def _avg_spans(rows, n_buckets):
    """Mean per-bucket (max-min) span for each of the two dims."""
    per = {}
    for b, p, s in rows:
        lo_p, hi_p, lo_s, hi_s = per.get(b, (1 << 62, -1, 1 << 62, -1))
        per[b] = (min(lo_p, p), max(hi_p, p), min(lo_s, s), max(hi_s, s))
    sp = [(hp - lp, hs - ls) for lp, hp, ls, hs in per.values()]
    return (
        sum(x for x, _ in sp) / len(sp),
        sum(y for _, y in sp) / len(sp),
    )


def test_zorder_shrinks_bounding_boxes_on_both_dims(spark):
    """Bucket a 2-d dataset into 16 equal files two ways — sorted by
    column `a` alone vs sorted by the z-key — and compare the mean
    per-file [min,max] span of each dimension. Single-column sort wins
    on its own column but leaves the OTHER column's span ~ the full
    domain; z-order must (a) cut the other column's span to well below
    the domain and (b) shrink the product of spans (the box area a
    2-predicate prune sees). Uses a balanced 256x256 synthetic domain:
    Morton tiles are power-of-2 squares, so a dimension narrower than
    the tile (e.g. sf0.001's 10-supplier column) cannot subdivide —
    callers bucketize skewed/narrow domains first, per the operator
    docstring."""
    df = (
        spark.range(8192)
        .select(
            ((F.col("id") * 2654435761) % 256).alias("a"),
            ((F.col("id") * 40503) % 256).alias("b"),
        )
        .withColumn("zkey", zorder_key(["a", "b"], bits=8))
    )
    n = df.count()
    n_buckets = 16
    by_a = [
        (i * n_buckets // n, r.a, r.b)
        for i, r in enumerate(df.orderBy("a", "b").collect())
    ]
    by_z = [
        (i * n_buckets // n, r.a, r.b)
        for i, r in enumerate(df.orderBy("zkey").collect())
    ]
    a_span_a, b_span_a = _avg_spans(by_a, n_buckets)
    a_span_z, b_span_z = _avg_spans(by_z, n_buckets)

    # single-column layout: `b` span per file ~ full 256 domain
    assert b_span_a > 0.8 * 255
    # z-order: both dims clustered — each span ~ Morton-tile sized,
    # far below the domain
    assert b_span_z < 0.5 * 255, (b_span_z,)
    assert a_span_z < 0.5 * 255, (a_span_z,)
    # The box AREA is ~ conserved by any space-filling curve
    # (~cells/buckets); the z-order win is BALANCE — the worst
    # dimension's span collapses, which is what lets a predicate on
    # EITHER column prune files instead of only the sort column.
    assert max(a_span_z, b_span_z) < 0.5 * max(a_span_a, b_span_a), (
        (a_span_z, b_span_z),
        (a_span_a, b_span_a),
    )
