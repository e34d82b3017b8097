"""Invariants for the from-scratch sketches (x_hll_custom, x_cms_custom)
beyond the oracle hash-match: structural guarantees that must hold on
ANY data, checked on the full key population (the registered queries
only emit the top-10 / per-group views).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hephaestus_spark.queries.sketches import (
    _CMS_MULTS,
    _CMS_W,
    _HLL_M,
    _cms_cell_col,
    _mix32_col,
)
from hephaestus_spark.sources import load_table


def test_cms_never_underestimates_any_key(spark, sf_dir):
    """CMS estimate >= exact for EVERY key, not just the emitted top-10
    (the one-sided error bound is the sketch's defining contract)."""
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    pair_arr = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _cms_cell_col(F.col("k"), d).alias("cell"))
            for d in range(len(_CMS_MULTS))
        ]
    )
    pairs = li.select(F.explode(pair_arr).alias("p")).select("p.d", "p.cell")
    cms = pairs.groupBy("d", "cell").agg(F.count("*").alias("c"))
    assert cms.count() <= len(_CMS_MULTS) * _CMS_W  # sketch size is bounded
    keys = li.groupBy("k").agg(F.count("*").alias("exact"))
    probe = keys.select("k", "exact", F.explode(pair_arr).alias("p")).select(
        "k", "exact", "p.d", "p.cell"
    )
    est = (
        probe.join(F.broadcast(cms), ["d", "cell"])
        .groupBy("k", "exact")
        .agg(F.min("c").alias("est"))
    )
    bad = est.filter(F.col("est") < F.col("exact")).count()
    assert bad == 0


def test_hll_registers_bounded_and_estimate_sane(spark, sf_dir):
    """Register table is <= m rows per group (the mergeable state bound)
    and the single-group estimate lands within 3 classical sigma
    (1.04/sqrt(m)) of the exact distinct count."""
    o = load_table(spark, sf_dir, "orders")
    mx = _mix32_col(F.col("o_custkey"))
    b = o.select(
        mx.bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"),
        F.shiftright(mx, 9).alias("w"),
    )
    rank = (
        F.when(F.col("w") == 0, F.lit(24))
        .otherwise(F.bit_count((F.col("w").bitwiseAND(-F.col("w"))) - 1) + 1)
    )
    regs = b.withColumn("r", rank).groupBy("bucket").agg(F.max("r").alias("m"))
    n_regs = regs.count()
    assert n_regs <= _HLL_M
    # rank domain: 1..24 by construction
    mm = regs.agg(F.min("m"), F.max("m")).collect()[0]
    assert 1 <= mm[0] and mm[1] <= 24

    from hephaestus_spark.registry import QUERIES

    rows = QUERIES["x_hll_custom"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact, est = r["exact_distinct"], r["hll_estimate"]
        assert abs(est - exact) <= 3 * (1.04 / (_HLL_M ** 0.5)) * exact + 3


def test_mix32_domain_and_determinism(spark):
    """The engine-independent mix stays in [0, 2^32) over extreme int64
    keys (incl. negatives — the pmod guard) and is stable across
    partitionings."""
    keys = [0, 1, -1, 2**62, -(2**62), 2**31, -(2**31), 123456789]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out1 = {
        r["k"]: r["mx"]
        for r in df.select("k", _mix32_col(F.col("k")).alias("mx")).collect()
    }
    out2 = {
        r["k"]: r["mx"]
        for r in df.repartition(7)
        .select("k", _mix32_col(F.col("k")).alias("mx"))
        .collect()
    }
    assert out1 == out2
    assert all(0 <= v < 2**32 for v in out1.values())


def test_hll_registers_merge_associatively(spark, sf_dir):
    """The 100 TB contract: per-partition partial registers max-merge to
    exactly the registers of the whole dataset (so sketches can be
    built per file/day and combined without touching raw data again)."""
    o = load_table(spark, sf_dir, "orders")

    def regs(df):
        mx = _mix32_col(F.col("o_custkey"))
        b = df.select(
            mx.bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"),
            F.shiftright(mx, 9).alias("w"),
        )
        rank = (
            F.when(F.col("w") == 0, F.lit(24))
            .otherwise(F.bit_count((F.col("w").bitwiseAND(-F.col("w"))) - 1) + 1)
        )
        return b.withColumn("r", rank).groupBy("bucket").agg(F.max("r").alias("m"))

    whole = {(r["bucket"], r["m"]) for r in regs(o).collect()}
    half_a = regs(o.filter(F.col("o_orderkey") % 2 == 0))
    half_b = regs(o.filter(F.col("o_orderkey") % 2 == 1))
    merged = {
        (r["bucket"], r["m"])
        for r in half_a.unionAll(half_b)
        .groupBy("bucket")
        .agg(F.max("m").alias("m"))
        .collect()
    }
    assert merged == whole


def _hdr_py(c: int):
    """Pure-Python mirror of the HDR bucket math (sketches.py)."""
    s = c
    for sh in (1, 2, 4, 8, 16, 32):
        s |= s >> sh
    e = bin(s & ((1 << 63) - 1)).count("1") - 1
    if e < 5:
        return c, c, 1
    sub = (c >> (e - 5)) & 31
    return e * 32 + sub, (32 + sub) * (1 << (e - 5)), 1 << (e - 5)


def test_hdr_bucket_identity_hypothesis():
    """For ANY positive int64 the HDR bucket brackets its value with
    width/lo <= 1/32 (the 3.1%% relative-error guarantee every quantile
    estimate in x_quantile_sketch / x_hdr_sliding_quantile rests on),
    and the bucket id is monotone in the value."""
    from hypothesis import given, settings, strategies as st

    @given(c=st.integers(min_value=1, max_value=2 ** 62))
    @settings(max_examples=3000, deadline=None)
    def check(c):
        bucket, lo, width = _hdr_py(c)
        assert lo <= c < lo + width
        assert width == 1 or width * 32 <= lo
        b2, _, _ = _hdr_py(c + 1)
        assert b2 >= bucket

    check()


def test_hdr_bucket_python_mirror_matches_spark(spark):
    """The Spark column chain (sketches._hdr_bucketize) and the Python
    mirror agree on adversarial values — powers of two, off-by-ones,
    boundary magnitudes."""
    from hephaestus_spark.queries.sketches import _hdr_bucketize

    vals = [1, 2, 31, 32, 33, 63, 64, 1023, 1024, 1025]
    vals += [(1 << k) + d for k in range(5, 62, 7) for d in (-1, 0, 1)]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = {
        r["c"]: (r["bucket"], r["lo"], r["width"])
        for r in _hdr_bucketize(df).collect()
    }
    for v in vals:
        assert got[v] == _hdr_py(v), v
