"""Sketches: SURVEY.md §2.B Q26 — approximate aggregates.

Approximate outputs can't hash-match another engine, but the CHECK can:
each query computes its own exact value alongside the sketch IN THE
SAME AGGREGATION and emits `abs(approx - exact)/exact <= 0.05` as a
boolean (plus the engine-independent exact count). The DuckDB oracle
emits the same exact values with literal TRUEs — so the driver's hash
comparison passes iff every sketch landed within tolerance. Sketch
algorithms (HLL++, GK) are deterministic for fixed data, so this is a
stable check, not a flaky one.

The exact companion aggregates exist only for the audit; at 100 TB
you'd run the sketch alone — that's the point of it being mergeable
(partial sketches combine across partitions; the shuffle carries one
sketch per partition instead of the raw column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hephaestus_spark.registry import query
from hephaestus_spark.sources import load_table


def _within(approx: Column, exact: Column, tol: float = 0.05) -> Column:
    return F.abs(approx.cast("double") - exact.cast("double")) <= tol * F.abs(
        exact.cast("double")
    )


@query(
    "q26_sketches",
    oracle="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS parts_within_5pct,
           true AS p50_within_5pct,
           true AS p90_within_5pct,
           true AS p99_within_5pct
    FROM lineitem
    """,
)
def q26_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct count (rsd 1% — 5% tolerance is then a 5-sigma
    bound) + GK quantile sketch on lineitem, audited in-query against
    the exact aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("pq"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").alias("pe"),
    )
    return agg.select(
        F.col("exact_parts").cast("bigint").alias("exact_parts"),
        _within(F.col("approx_parts"), F.col("exact_parts")).alias("parts_within_5pct"),
        _within(F.col("pq")[0], F.col("pe")[0]).alias("p50_within_5pct"),
        _within(F.col("pq")[1], F.col("pe")[1]).alias("p90_within_5pct"),
        _within(F.col("pq")[2], F.col("pe")[2]).alias("p99_within_5pct"),
    )


@query(
    "q26_sketch_by_group",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS parts_within_5pct,
           true AS p50_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q26_sketch_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sketch variant (per returnflag), same in-query audit."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.expr("percentile(l_extendedprice, 0.5D)").alias("p50e"),
    )
    return agg.select(
        "l_returnflag",
        F.col("exact_parts").cast("bigint").alias("exact_parts"),
        _within(F.col("approx_parts"), F.col("exact_parts")).alias("parts_within_5pct"),
        _within(F.col("p50"), F.col("p50e")).alias("p50_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Custom from-scratch sketches (r5): unlike q26's built-ins, these are
# implemented from first principles over an ENGINE-INDEPENDENT arithmetic
# hash (the 31-bit-split multiplicative mix from operators/curation.py),
# so the sketch registers — and therefore the ESTIMATES — are bit-identical
# in Spark and DuckDB and the driver hash-checks the estimate itself, not
# just a tolerance boolean. That is the strongest check a sketch can have.

_HLL_P = 9                      # 2^9 = 512 registers
_HLL_M = 1 << _HLL_P
_HLL_ALPHA = 0.7197831133217303  # 0.7213 / (1 + 1.079/m), m=512
_HLL_WBITS = 32 - _HLL_P        # rank domain: trailing zeros of a 23-bit word


def _mix32_sql(key: str) -> str:
    """DuckDB spelling of the engine-independent 32-bit mixed hash."""
    return (
        f"((((({key} & 2147483647) * 2654435761"
        f" + (({key} >> 31) & 2147483647) * 40503) % 4294967296)"
        f" + 4294967296) % 4294967296)"
    )


def _mix32_col(k: Column, mul_lo: int = 2654435761, mul_hi: int = 40503) -> Column:
    low = k.bitwiseAND(F.lit(2147483647))
    high = F.shiftright(k, 31).bitwiseAND(F.lit(2147483647))
    return F.pmod(low * F.lit(mul_lo) + high * F.lit(mul_hi), F.lit(4294967296))


_HLL_CUSTOM_SQL = f"""
    WITH h AS (
      SELECT o_orderpriority AS grp,
             {_mix32_sql('o_custkey')} AS mx
      FROM orders
    ), b AS (
      SELECT grp, mx & {_HLL_M - 1} AS bucket, mx >> {_HLL_P} AS w FROM h
    ), r AS (
      SELECT grp, bucket,
             max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                      ELSE bit_count((w & -w) - 1) + 1 END) AS m
      FROM b GROUP BY grp, bucket
    ), s AS (
      SELECT grp,
             sum(1.0 / CAST(CAST(1 AS BIGINT) << m AS DOUBLE)) AS s_present,
             CAST(count(*) AS BIGINT) AS nb
      FROM r GROUP BY grp
    ), e AS (
      SELECT grp, {_HLL_M} - nb AS v,
             CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
               / (s_present + ({_HLL_M} - nb)) AS e_raw
      FROM s
    ), est AS (
      SELECT grp,
             CASE WHEN v > 0 AND e_raw <= CAST({2.5 * _HLL_M} AS DOUBLE)
                  THEN CAST({_HLL_M} AS DOUBLE) * ln(CAST({_HLL_M} AS DOUBLE) / v)
                  ELSE e_raw END AS estimate
      FROM e
    ), ex AS (
      SELECT o_orderpriority AS grp,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
      FROM orders GROUP BY grp
    )
    SELECT ex.grp AS o_orderpriority, ex.exact_distinct,
           round(est.estimate, 6) AS hll_estimate,
           abs(est.estimate - ex.exact_distinct) <= 0.1 * ex.exact_distinct
             AS within_10pct
    FROM ex JOIN est ON ex.grp = est.grp
    """


@query("x_hll_custom", oracle=_HLL_CUSTOM_SQL)
def x_hll_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch HyperLogLog (p=9, 512 registers) per order priority,
    hash-checked on the ESTIMATE itself.

    Why the estimate is engine-exact (not just tolerance-close):

    - the register input is the arithmetic 32-bit mix (no engine hash),
      bucket = low 9 bits, rank = trailing zeros of the 23-bit remainder
      + 1 via ``bit_count((w & -w) - 1)`` — pure int64 ops both engines
      define identically;
    - registers are a ``max`` per (group, bucket): order-free;
    - the harmonic denominator sums terms ``2^-M`` (M <= 24), each an
      exact multiple of 2^-24 with the total < 2^10 — every partial sum
      fits in 34 significand bits, so double addition never rounds and
      the sum is order-independent and exact;
    - the estimate is then a handful of IEEE ops (and, in the
      linear-counting branch, one ln) on identical doubles.

    Mergeability at 100 TB: a register table is (group, bucket, max) —
    partial maxes combine associatively across partitions/days, and the
    shuffle carries <= 512 rows per group regardless of input size. The
    exact-distinct companion (a full distinct shuffle of the key) exists
    only for the audit."""
    o = load_table(spark, sf_dir, "orders")
    h = o.select(
        F.col("o_orderpriority").alias("grp"),
        _mix32_col(F.col("o_custkey")).alias("mx"),
    )
    b = h.select(
        "grp",
        F.col("mx").bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"),
        F.shiftright(F.col("mx"), _HLL_P).alias("w"),
    )
    rank = (
        F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(F.bit_count((F.col("w").bitwiseAND(-F.col("w"))) - 1) + 1)
    )
    regs = b.withColumn("rank", rank).groupBy("grp", "bucket").agg(
        F.max("rank").alias("m")
    )
    s = regs.groupBy("grp").agg(
        F.sum(1.0 / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)")).alias(
            "s_present"
        ),
        F.count("*").cast("bigint").alias("nb"),
    )
    v = F.lit(_HLL_M) - F.col("nb")
    e_raw = F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / (F.col("s_present") + v)
    est = s.select(
        "grp",
        F.when(
            (v > 0) & (e_raw <= F.lit(2.5 * _HLL_M)),
            F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v),
        )
        .otherwise(e_raw)
        .alias("estimate"),
    )
    ex = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count_distinct("o_custkey").cast("bigint").alias("exact_distinct")
    )
    return ex.join(est, "grp").select(
        F.col("grp").alias("o_orderpriority"),
        "exact_distinct",
        F.round("estimate", 6).alias("hll_estimate"),
        (
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            <= 0.1 * F.col("exact_distinct")
        ).alias("within_10pct"),
    )


# Count-min sketch geometry: d=3 independent hash rows, w=256 cells.
# Multiplier pairs (lo, hi) per row; products stay under 2^63 (31-bit
# low half x <2^32 multiplier), so int64 arithmetic never overflows in
# either engine (DuckDB checks; Spark ANSI would too).
_CMS_MULTS = [(2654435761, 40503), (2246822519, 52529), (3266489917, 60037)]
_CMS_W = 256


def _cms_cell_sql(key: str, d: int) -> str:
    lo, hi = _CMS_MULTS[d]
    return (
        f"(((((({key} & 2147483647) * {lo}"
        f" + (({key} >> 31) & 2147483647) * {hi}) % 4294967296)"
        f" + 4294967296) % 4294967296) & {_CMS_W - 1})"
    )


def _cms_cell_col(k: Column, d: int) -> Column:
    lo, hi = _CMS_MULTS[d]
    return _mix32_col(k, lo, hi).bitwiseAND(F.lit(_CMS_W - 1))


def _cms_oracle() -> str:
    pairs = "\n      UNION ALL ".join(
        f"SELECT {d} AS d, {_cms_cell_sql('l_partkey', d)} AS cell FROM lineitem"
        for d in range(len(_CMS_MULTS))
    )
    probe = "\n      UNION ALL ".join(
        f"SELECT k, {d} AS d, {_cms_cell_sql('k', d)} AS cell FROM keys"
        for d in range(len(_CMS_MULTS))
    )
    return f"""
    WITH pairs AS (
      {pairs}
    ), cms AS (
      SELECT d, cell, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY d, cell
    ), keys AS (
      SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM lineitem GROUP BY l_partkey
    ), probe AS (
      {probe}
    ), est AS (
      SELECT p.k, min(c.c) AS cms_est
      FROM probe p JOIN cms c USING (d, cell) GROUP BY p.k
    )
    SELECT keys.k AS l_partkey, keys.exact_cnt, est.cms_est,
           est.cms_est >= keys.exact_cnt AS never_underestimates
    FROM keys JOIN est ON est.k = keys.k
    ORDER BY keys.exact_cnt DESC, l_partkey ASC
    LIMIT 10
    """


@query("x_cms_custom", oracle=_cms_oracle())
def x_cms_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch count-min sketch (d=3, w=256) over l_partkey,
    hash-checked on the estimates for the top-10 heaviest keys.

    All-integer end to end (cell indices from the engine-independent
    mix, counts, min-of-counts), so the oracle matches bit-for-bit —
    plus the structural guarantee ``cms_est >= exact_cnt`` emitted as a
    column the hash check pins to TRUE.

    100 TB shape: the sketch itself is d*w = 768 cells no matter the
    input — the build is one map-side-combined groupBy over (d, cell)
    whose shuffle carries at most 768 rows per partition, and the probe
    side joins against the BROADCAST cell table (plan below hints it
    explicitly), so estimating any number of keys never shuffles the
    corpus. The exact-count companion exists only for the audit."""
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    nd = len(_CMS_MULTS)
    pair_arr = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _cms_cell_col(F.col("k"), d).alias("cell"))
            for d in range(nd)
        ]
    )
    pairs = li.select(F.explode(pair_arr).alias("p")).select("p.d", "p.cell")
    cms = pairs.groupBy("d", "cell").agg(F.count("*").cast("bigint").alias("c"))
    keys = li.groupBy("k").agg(F.count("*").cast("bigint").alias("exact_cnt"))
    probe = keys.select(
        "k", "exact_cnt", F.explode(pair_arr).alias("p")
    ).select("k", "exact_cnt", "p.d", "p.cell")
    est = (
        probe.join(F.broadcast(cms), ["d", "cell"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        est.orderBy(F.col("exact_cnt").desc(), F.col("k").asc())
        .limit(10)
        .select(
            F.col("k").alias("l_partkey"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("never_underestimates"),
        )
    )


@query(
    "x_hll_sliding_distinct",
    oracle=f"""
    WITH h AS (
      SELECT CAST(ts AS DATE) AS day,
             {_mix32_sql('user_id')} AS mx
      FROM events
    ), b AS (
      SELECT day, mx & {_HLL_M - 1} AS bucket, mx >> {_HLL_P} AS w FROM h
    ), dayreg AS (
      SELECT day, bucket,
             max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                      ELSE bit_count((w & -w) - 1) + 1 END) AS m
      FROM b GROUP BY day, bucket
    ), days AS (
      SELECT DISTINCT day FROM h
    ), merged AS (
      SELECT d.day, r.bucket, max(r.m) AS m
      FROM days d
      JOIN dayreg r
        ON r.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day, r.bucket
    ), s AS (
      SELECT day,
             sum(1.0 / CAST(CAST(1 AS BIGINT) << m AS DOUBLE)) AS s_present,
             CAST(count(*) AS BIGINT) AS nb
      FROM merged GROUP BY day
    ), e AS (
      SELECT day, {_HLL_M} - nb AS v,
             CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
               / (s_present + ({_HLL_M} - nb)) AS e_raw
      FROM s
    ), est AS (
      SELECT day,
             CASE WHEN v > 0 AND e_raw <= CAST({2.5 * _HLL_M} AS DOUBLE)
                  THEN CAST({_HLL_M} AS DOUBLE) * ln(CAST({_HLL_M} AS DOUBLE) / v)
                  ELSE e_raw END AS estimate
      FROM e
    ), ex AS (
      SELECT d.day, CAST(count(DISTINCT ev.user_id) AS BIGINT) AS exact_distinct
      FROM days d
      JOIN (SELECT CAST(ts AS DATE) AS day, user_id FROM events) ev
        ON ev.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT strftime(ex.day, '%Y-%m-%d') AS day, ex.exact_distinct,
           round(est.estimate, 6) AS hll_estimate,
           abs(est.estimate - ex.exact_distinct) <= 0.15 * ex.exact_distinct
             AS within_15pct
    FROM ex JOIN est ON ex.day = est.day
    """,
)
def x_hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window cardinality via sketch ROLLUP: 7-day distinct
    users per day, computed by max-merging the per-DAY HyperLogLog
    registers across the window — the textbook streaming-analytics
    problem where exact sliding distinct counts force either a rescan
    per window or O(window) state per key.

    Scale contrast (why this is the 100 TB plan): the exact companion
    re-touches every event row once per window it falls into (7x read
    amplification here; at 100 TB that is the difference between one
    pass and seven). The sketch path reads the raw data ONCE into
    day-partitioned registers — <= 512 rows per day regardless of
    volume — and every downstream window merge runs on registers, never
    on data. The day x 6-day-back register join is bounded at
    days x 512 rows, and estimates reuse x_hll_custom's
    exact-by-construction harmonic sum, so the ESTIMATE hash-matches
    the oracle. Register max-merge associativity is proven in
    tests/test_sketch_custom.py."""
    e = load_table(spark, sf_dir, "events")
    h = e.select(
        F.to_date("ts").alias("day"), _mix32_col(F.col("user_id")).alias("mx")
    )
    b = h.select(
        "day",
        F.col("mx").bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"),
        F.shiftright(F.col("mx"), _HLL_P).alias("w"),
    )
    rank = (
        F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(F.bit_count((F.col("w").bitwiseAND(-F.col("w"))) - 1) + 1)
    )
    dayreg = b.withColumn("rank", rank).groupBy("day", "bucket").agg(
        F.max("rank").alias("m")
    )
    days = h.select("day").distinct()
    merged = (
        days.alias("d")
        .join(
            dayreg.alias("r"),
            F.col("r.day").between(
                F.date_sub(F.col("d.day"), 6), F.col("d.day")
            ),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("r.bucket").alias("bucket"))
        .agg(F.max("r.m").alias("m"))
    )
    s = merged.groupBy("day").agg(
        F.sum(1.0 / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)")).alias(
            "s_present"
        ),
        F.count("*").cast("bigint").alias("nb"),
    )
    v = F.lit(_HLL_M) - F.col("nb")
    e_raw = F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / (F.col("s_present") + v)
    est = s.select(
        "day",
        F.when(
            (v > 0) & (e_raw <= F.lit(2.5 * _HLL_M)),
            F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v),
        )
        .otherwise(e_raw)
        .alias("estimate"),
    )
    ev = e.select(F.to_date("ts").alias("day"), "user_id")
    ex = (
        days.alias("d")
        .join(
            ev.alias("v"),
            F.col("v.day").between(F.date_sub(F.col("d.day"), 6), F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("v.user_id").cast("bigint").alias("exact_distinct"))
    )
    return ex.join(est, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "exact_distinct",
        F.round("estimate", 6).alias("hll_estimate"),
        (
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            <= 0.15 * F.col("exact_distinct")
        ).alias("within_15pct"),
    )


# ---------------------------------------------------------------------------
# Quantiles, the scale way (r5b): exact quantiles WITHOUT sorting raw
# rows (value-histogram + cumulative counts), and a mergeable
# HDR-histogram sketch whose buckets are pure integer bit-math — the
# third member of the sketch trio (HLL cardinality, CMS frequency,
# HDR quantiles), all engine-deterministic.

_QUANTS = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]


def _exact_rank_cte(val_expr: str = "l_extendedprice") -> str:
    """Shared oracle CTE: per-flag cents histogram + cumulative counts."""
    return f"""
    h AS (
      SELECT l_returnflag AS flag,
             CAST(floor({val_expr} * 100 + 0.5) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT flag, c, cnt,
             sum(cnt) OVER (PARTITION BY flag ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
             sum(cnt) OVER (PARTITION BY flag) AS n
      FROM h
    )"""


def _rank_expr(q: float) -> str:
    # rank of the q-quantile under the lower (type-1) definition:
    # smallest value whose cumulative count reaches ceil(q * n).
    return f"CAST(ceil({q} * n) AS BIGINT)"


@query(
    "x_exact_quantile_by_rank",
    oracle=f"""
    WITH {_exact_rank_cte()}
    SELECT flag AS l_returnflag,
           CAST(max(n) AS BIGINT) AS n,
           {", ".join(
             f"CAST(min(CASE WHEN cm >= {_rank_expr(q)} THEN c END) AS DOUBLE)"
             f" / 100.0 AS {name}"
             for name, q in _QUANTS)}
    FROM cum GROUP BY flag
    """,
)
def x_exact_quantile_by_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT type-1 (lower) quantiles with NO raw-row sort and NO
    per-group list materialization — the count-then-select method
    x_exact_quantiles' docstring defers to for 100 TB: build the
    (group, value) histogram (one keyed agg whose output is bounded by
    the number of DISTINCT values, not rows), take cumulative counts in
    value order, and the q-quantile is the smallest value whose
    cumulative count reaches ceil(q*n). Memory per group = distinct
    values, the shuffle carries histogram cells, and everything is
    int64 (cents, counts, ranks) until the final /100 — bit-exact on
    any engine, any partitioning."""
    from pyspark.sql.window import Window as W
    from hephaestus_spark.functions.money import scaled_long

    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        scaled_long(F.col("l_extendedprice")).alias("c"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    cum = h.select(
        "flag",
        "c",
        "cnt",
        F.sum("cnt")
        .over(
            W.partitionBy("flag")
            .orderBy("c")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cm"),
        F.sum("cnt").over(W.partitionBy("flag")).alias("n"),
    )
    aggs = [F.max("n").cast("bigint").alias("n")]
    for name, q in _QUANTS:
        rank = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
        aggs.append(
            (
                F.min(F.when(F.col("cm") >= rank, F.col("c"))).cast("double")
                / 100.0
            ).alias(name)
        )
    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(*aggs)


def _hdr_bucket_sql() -> str:
    """DuckDB lateral-alias chain computing the HDR bucket of cents `c`
    (floor-log2 via bit smearing + 5 mantissa sub-bits; all int64)."""
    return """
             c | (c >> 1) AS s1, s1 | (s1 >> 2) AS s2,
             s2 | (s2 >> 4) AS s3, s3 | (s3 >> 8) AS s4,
             s4 | (s4 >> 16) AS s5, s5 | (s5 >> 32) AS s6,
             CAST(bit_count(s6) AS BIGINT) - 1 AS e,
             CASE WHEN e < 5 THEN c
                  ELSE e * 32 + ((c >> (e - 5)) & 31) END AS bucket,
             CASE WHEN e < 5 THEN c
                  ELSE (32 + ((c >> (e - 5)) & 31))
                       * (CAST(1 AS BIGINT) << (e - 5)) END AS lo,
             CASE WHEN e < 5 THEN CAST(1 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) << (e - 5) END AS width"""


@query(
    "x_quantile_sketch",
    oracle=f"""
    WITH {_exact_rank_cte()}, hb AS (
      SELECT flag, c, cnt, {_hdr_bucket_sql()}
      FROM h
    ), sk AS (
      SELECT flag, bucket, max(lo) AS lo, max(width) AS width,
             sum(cnt) AS cnt
      FROM hb GROUP BY flag, bucket
    ), scum AS (
      SELECT flag, bucket, lo, width, cnt,
             sum(cnt) OVER (PARTITION BY flag ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
             sum(cnt) OVER (PARTITION BY flag) AS n
      FROM sk
    ), ex AS (
      SELECT flag,
             {", ".join(
               f"min(CASE WHEN cm >= {_rank_expr(q)} THEN c END) AS x_{name}"
               for name, q in _QUANTS)}
      FROM cum GROUP BY flag
    ), es AS (
      SELECT flag, CAST(max(n) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS sketch_cells,
             {", ".join(
               f"min(CASE WHEN cm >= {_rank_expr(q)} THEN lo END) AS lo_{name},"
               f" min(CASE WHEN cm >= {_rank_expr(q)} THEN lo + width END)"
               f" AS hi_{name}"
               for name, q in _QUANTS)}
      FROM scum GROUP BY flag
    )
    SELECT es.flag AS l_returnflag, es.n, es.sketch_cells,
           {", ".join(
             f"CAST(lo_{name} AS DOUBLE) / 100.0 AS {name}_est,"
             f" (lo_{name} <= x_{name} AND x_{name} < hi_{name})"
             f" AS {name}_bracketed"
             for name, _ in _QUANTS)}
    FROM es JOIN ex ON es.flag = ex.flag
    """,
)
def x_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram quantile sketch: every value maps to an integer
    bucket (floor-log2 via 6-step bit smearing + 5 mantissa sub-bits,
    so bucket width / lower-bound <= 1/32 — a 3.1% relative-error
    guarantee) and the sketch is the per-bucket count table: bounded at
    ~32*64 cells per group, MERGEABLE by summing counts (same contract
    as the HLL registers / CMS cells), and the q-quantile estimate is
    the lower bound of the bucket holding rank ceil(q*n) under
    cumulative counts.

    The driver hash-checks the ESTIMATE (pure int64 bit-math, exact in
    both engines) AND the bracketing guarantee: the true rank value —
    computed by the exact count-then-select method in the same query —
    provably lands inside [lo, lo+width) of the selected bucket, and
    the emitted booleans pin that proof. At 100 TB: one scan into
    per-partition cell counts, one tiny merge, quantiles at any q
    without re-touching data — and unlike GK/t-digest the result is
    independent of merge order, so backfills reproduce exactly."""
    from pyspark.sql.window import Window as W
    from hephaestus_spark.functions.money import scaled_long

    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        scaled_long(F.col("l_extendedprice")).alias("c"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    hb = h
    prev = "c"
    for i, sh in enumerate((1, 2, 4, 8, 16, 32), start=1):
        hb = hb.withColumn(f"s{i}", F.expr(f"{prev} | ({prev} >> {sh})"))
        prev = f"s{i}"
    hb = (
        hb.withColumn("e", F.bit_count(F.col("s6")) - 1)
        .withColumn(
            "bucket",
            F.when(F.col("e") < 5, F.col("c")).otherwise(
                F.col("e") * 32 + F.expr("(c >> (e - 5)) & 31")
            ),
        )
        .withColumn(
            "lo",
            F.when(F.col("e") < 5, F.col("c")).otherwise(
                F.expr(
                    "(32 + ((c >> (e - 5)) & 31))"
                    " * (shiftleft(CAST(1 AS BIGINT), e - 5))"
                )
            ),
        )
        .withColumn(
            "width",
            F.when(F.col("e") < 5, F.lit(1).cast("bigint")).otherwise(
                F.expr("shiftleft(CAST(1 AS BIGINT), e - 5)")
            ),
        )
    )
    sk = hb.groupBy("flag", "bucket").agg(
        F.max("lo").alias("lo"),
        F.max("width").alias("width"),
        F.sum("cnt").alias("cnt"),
    )
    wf = W.partitionBy("flag")
    scum = sk.select(
        "flag",
        "bucket",
        "lo",
        "width",
        "cnt",
        F.sum("cnt")
        .over(wf.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cm"),
        F.sum("cnt").over(wf).alias("n"),
    )
    cum = h.select(
        "flag",
        "c",
        F.sum("cnt")
        .over(wf.orderBy("c").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cm"),
        F.sum("cnt").over(wf).alias("n"),
    )
    ex_aggs, es_aggs = [], [
        F.max("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("sketch_cells"),
    ]
    for name, q in _QUANTS:
        rank_s = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
        ex_aggs.append(
            F.min(F.when(F.col("cm") >= rank_s, F.col("c"))).alias(f"x_{name}")
        )
        es_aggs.append(
            F.min(F.when(F.col("cm") >= rank_s, F.col("lo"))).alias(f"lo_{name}")
        )
        es_aggs.append(
            F.min(
                F.when(F.col("cm") >= rank_s, F.col("lo") + F.col("width"))
            ).alias(f"hi_{name}")
        )
    ex = cum.groupBy("flag").agg(*ex_aggs)
    es = scum.groupBy("flag").agg(*es_aggs)
    out_cols = [F.col("flag").alias("l_returnflag"), "n", "sketch_cells"]
    for name, _ in _QUANTS:
        out_cols.append(
            (F.col(f"lo_{name}").cast("double") / 100.0).alias(f"{name}_est")
        )
        out_cols.append(
            (
                (F.col(f"lo_{name}") <= F.col(f"x_{name}"))
                & (F.col(f"x_{name}") < F.col(f"hi_{name}"))
            ).alias(f"{name}_bracketed")
        )
    return es.join(ex, "flag").select(*out_cols)


@query(
    # Register max-merge is associative and batch-boundary independent
    # (proven in tests/test_sketch_custom.py), so the streamed register
    # table — and therefore the estimate — is bit-identical to the
    # one-shot batch sketch: the oracle is SHARED with x_hll_custom.
    "x_stream_hll_distinct",
    oracle=_HLL_CUSTOM_SQL,
)
def x_stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct-count sketch as it runs in streaming production:
    orders arrive as ordered micro-batches (one per order-year) and
    each batch emits only its (group, bucket, max-rank) HLL registers
    inside ``foreachBatch`` — <= 512 rows per group per batch, the
    log-structured accumulator never sees raw keys — and the final
    merge is one max per (group, bucket) over the accumulated partial
    registers. This is the third shared-oracle streaming/batch
    equivalence proof in the suite (after x_stream_incremental_dedup
    and x_stream_cdc_apply): merge associativity makes the streamed
    estimate bit-identical to x_hll_custom's one-shot estimate, and
    the shared oracle pins it.

    At 100 TB this is the maintained-sketch pattern: the daily job
    appends a bounded register delta; ANY window of days can later be
    estimated from register maxes without re-reading raw data."""
    from hephaestus_spark.streaming.replay import replay_foreach_batch

    o = load_table(spark, sf_dir, "orders")
    feed = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_custkey",
        F.year("o_orderdate").alias("arrival"),
    )

    def batch_registers(batch_df: DataFrame) -> DataFrame:
        mx = _mix32_col(F.col("o_custkey"))
        b = batch_df.select(
            "grp",
            mx.bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"),
            F.shiftright(mx, _HLL_P).alias("w"),
        )
        rank = (
            F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1))
            .otherwise(F.bit_count((F.col("w").bitwiseAND(-F.col("w"))) - 1) + 1)
        )
        return b.withColumn("rank", rank).groupBy("grp", "bucket").agg(
            F.max("rank").alias("m")
        )

    runs = replay_foreach_batch(spark, feed, "arrival", batch_registers)
    regs = runs.groupBy("grp", "bucket").agg(F.max("m").alias("m"))
    s = regs.groupBy("grp").agg(
        F.sum(1.0 / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)")).alias(
            "s_present"
        ),
        F.count("*").cast("bigint").alias("nb"),
    )
    v = F.lit(_HLL_M) - F.col("nb")
    e_raw = F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / (F.col("s_present") + v)
    est = s.select(
        "grp",
        F.when(
            (v > 0) & (e_raw <= F.lit(2.5 * _HLL_M)),
            F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v),
        )
        .otherwise(e_raw)
        .alias("estimate"),
    )
    ex = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count_distinct("o_custkey").cast("bigint").alias("exact_distinct")
    )
    return ex.join(est, "grp").select(
        F.col("grp").alias("o_orderpriority"),
        "exact_distinct",
        F.round("estimate", 6).alias("hll_estimate"),
        (
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            <= 0.1 * F.col("exact_distinct")
        ).alias("within_10pct"),
    )


@query(
    "x_winsorize",
    oracle=f"""
    WITH {_exact_rank_cte()}, qs AS (
      SELECT flag,
             min(CASE WHEN cm >= CAST(ceil(0.01 * n) AS BIGINT) THEN c END)
               AS p01c,
             min(CASE WHEN cm >= CAST(ceil(0.99 * n) AS BIGINT) THEN c END)
               AS p99c
      FROM cum GROUP BY flag
    ), rows_ AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
      FROM lineitem
    )
    SELECT rows_.flag AS l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN c < p01c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(sum(CASE WHEN c > p99c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           (CAST(sum(least(greatest(c, p01c), p99c)) AS DOUBLE) / 100.0)
             / count(*) AS winsorized_mean
    FROM rows_ JOIN qs ON rows_.flag = qs.flag
    GROUP BY rows_.flag
    """,
)
def x_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p01/p99-clipped) per-group statistics — the robust
    preprocessing step that stops a handful of outliers from dominating
    means and downstream normalization. The clip thresholds come from
    the rank-exact quantile machinery (x_exact_quantile_by_rank: cents
    histogram + cumulative counts, no raw sort), broadcast back as a
    3-row table; clipping is a scan-side clamp and the winsorized mean
    accumulates clamped CENTS — order-independent int64 adds, so the
    emitted mean hash-matches. Two passes over the fact (threshold
    derivation + clamp-aggregate), the unavoidable minimum for exact
    quantile clipping; at 100 TB pass one shrinks to the distinct-value
    histogram and pass two is the plain scan it replaces."""
    from pyspark.sql.window import Window as W
    from hephaestus_spark.functions.money import scaled_long

    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        scaled_long(F.col("l_extendedprice")).alias("c"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    wf = W.partitionBy("flag")
    cum = h.select(
        "flag",
        "c",
        F.sum("cnt")
        .over(wf.orderBy("c").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cm"),
        F.sum("cnt").over(wf).alias("n"),
    )
    qs = cum.groupBy("flag").agg(
        F.min(
            F.when(
                F.col("cm") >= F.ceil(F.lit(0.01) * F.col("n")).cast("bigint"),
                F.col("c"),
            )
        ).alias("p01c"),
        F.min(
            F.when(
                F.col("cm") >= F.ceil(F.lit(0.99) * F.col("n")).cast("bigint"),
                F.col("c"),
            )
        ).alias("p99c"),
    )
    rows = li.select(
        F.col("l_returnflag").alias("flag"),
        scaled_long(F.col("l_extendedprice")).alias("c"),
    )
    clamped = F.least(F.greatest(F.col("c"), F.col("p01c")), F.col("p99c"))
    return (
        rows.join(F.broadcast(qs), "flag")
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("c") < F.col("p01c"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("c") > F.col("p99c"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
            (
                (F.sum(clamped).cast("double") / 100.0) / F.count("*")
            ).alias("winsorized_mean"),
        )
    )


# --------------------------------------------------------------------------
# x_hll_set_algebra — sketch SET OPERATIONS (r6): union by register
# merge, intersection by inclusion-exclusion. The operational question
# at 100 TB is rarely "how many distinct in this table" but "how much
# do these two cohorts overlap" — computable from two 512-row register
# tables without ever co-shuffling the raw keys.
# --------------------------------------------------------------------------

_HLL_EST_SQL = f"""
      SELECT grp,
             CASE WHEN ({_HLL_M} - nb) > 0
                       AND CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
                           / (s_present + ({_HLL_M} - nb))
                           <= CAST({2.5 * _HLL_M} AS DOUBLE)
                  THEN CAST({_HLL_M} AS DOUBLE)
                       * ln(CAST({_HLL_M} AS DOUBLE) / ({_HLL_M} - nb))
                  ELSE CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
                       / (s_present + ({_HLL_M} - nb)) END AS estimate
      FROM s
"""

_HLL_SET_SQL = f"""
    WITH cohorts AS (
      SELECT 'A' AS grp, o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT 'B' AS grp, o_custkey AS k FROM orders WHERE o_orderpriority = '2-HIGH'
    ), b AS (
      SELECT grp, {_mix32_sql('k')} & {_HLL_M - 1} AS bucket,
             {_mix32_sql('k')} >> {_HLL_P} AS w
      FROM cohorts
    ), r AS (
      SELECT grp, bucket,
             max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                      ELSE bit_count((w & -w) - 1) + 1 END) AS m
      FROM b GROUP BY grp, bucket
    ), r_all AS (
      SELECT * FROM r
      UNION ALL
      SELECT 'U' AS grp, bucket, max(m) AS m FROM r GROUP BY bucket
    ), s AS (
      SELECT grp,
             sum(1.0 / CAST(CAST(1 AS BIGINT) << m AS DOUBLE)) AS s_present,
             CAST(count(*) AS BIGINT) AS nb
      FROM r_all GROUP BY grp
    ), est AS (
      {_HLL_EST_SQL}
    ), wide AS (
      SELECT max(CASE WHEN grp = 'A' THEN estimate END) AS ea,
             max(CASE WHEN grp = 'B' THEN estimate END) AS eb,
             max(CASE WHEN grp = 'U' THEN estimate END) AS eu
      FROM est
    ), ex AS (
      SELECT CAST(count(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
                                      THEN o_custkey END) AS BIGINT) AS exact_a,
             CAST(count(DISTINCT CASE WHEN o_orderpriority = '2-HIGH'
                                      THEN o_custkey END) AS BIGINT) AS exact_b,
             CAST(count(DISTINCT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                      THEN o_custkey END) AS BIGINT) AS exact_union
      FROM orders
    ), exi AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_intersection FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      )
    )
    SELECT ex.exact_a, ex.exact_b, ex.exact_union, exi.exact_intersection,
           round(w.ea, 6) AS hll_a, round(w.eb, 6) AS hll_b,
           round(w.eu, 6) AS hll_union,
           round(w.ea + w.eb - w.eu, 6) AS hll_intersection,
           abs(w.eu - ex.exact_union) <= 0.1 * ex.exact_union AS union_within_10pct
    FROM wide w, ex, exi
"""


@query("x_hll_set_algebra", oracle=_HLL_SET_SQL)
def x_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set algebra over two customer cohorts (urgent-order vs
    high-order customers): the UNION sketch is a pure register merge
    (max per bucket — associative, so cohort sketches built on
    different days/partitions combine without touching raw keys), and
    the INTERSECTION estimate is inclusion-exclusion over three
    estimates. All four estimates are hash-checked against the oracle
    (the x_hll_custom engine-exactness argument: arithmetic 32-bit mix,
    order-free register maxes, never-rounding harmonic sum of 2^-m
    terms, then identical IEEE ops); the exact set sizes ride along as
    the audit.

    Scale shape: each cohort's register table is <= 512 rows no matter
    the input; union/estimate stages touch registers only. The exact
    companion (full distinct + INTERSECT shuffles) exists only for the
    audit. Inclusion-exclusion error compounds (~1.04%/sqrt(m) per
    term), which is why the tolerance flag gates the union, while the
    intersection estimate is reported for the hash check."""
    o = load_table(spark, sf_dir, "orders")
    cohorts = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.lit("A").alias("grp"), F.col("o_custkey").alias("k"))
        .unionByName(
            o.filter(F.col("o_orderpriority") == "2-HIGH").select(
                F.lit("B").alias("grp"), F.col("o_custkey").alias("k")
            )
        )
    )
    mx = _mix32_col(F.col("k"))
    b = cohorts.select(
        "grp",
        mx.bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"),
        F.shiftright(mx, _HLL_P).alias("w"),
    )
    rank = (
        F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(F.bit_count((F.col("w").bitwiseAND(-F.col("w"))) - 1) + 1)
    )
    r = b.withColumn("m", rank).groupBy("grp", "bucket").agg(F.max("m").alias("m"))
    r_union = (
        r.groupBy("bucket").agg(F.max("m").alias("m")).select(F.lit("U").alias("grp"), "bucket", "m")
    )
    r_all = r.unionByName(r_union)
    s = r_all.groupBy("grp").agg(
        F.sum(1.0 / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)")).alias(
            "s_present"
        ),
        F.count("*").cast("bigint").alias("nb"),
    )
    v = F.lit(_HLL_M) - F.col("nb")
    e_raw = F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / (F.col("s_present") + v)
    est = s.select(
        "grp",
        F.when(
            (v > 0) & (e_raw <= F.lit(2.5 * _HLL_M)),
            F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v),
        )
        .otherwise(e_raw)
        .alias("estimate"),
    )
    wide = est.groupBy().agg(
        F.max(F.when(F.col("grp") == "A", F.col("estimate"))).alias("ea"),
        F.max(F.when(F.col("grp") == "B", F.col("estimate"))).alias("eb"),
        F.max(F.when(F.col("grp") == "U", F.col("estimate"))).alias("eu"),
    )
    ex = o.agg(
        F.count_distinct(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_custkey"))
        ).cast("bigint").alias("exact_a"),
        F.count_distinct(
            F.when(F.col("o_orderpriority") == "2-HIGH", F.col("o_custkey"))
        ).cast("bigint").alias("exact_b"),
        F.count_distinct(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
                F.col("o_custkey"),
            )
        ).cast("bigint").alias("exact_union"),
    )
    ea_set = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    eb_set = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey").distinct()
    exi = (
        ea_set.intersect(eb_set)
        .agg(F.count("*").cast("bigint").alias("exact_intersection"))
    )
    return (
        ex.crossJoin(exi)
        .crossJoin(wide)
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_intersection",
            F.round("ea", 6).alias("hll_a"),
            F.round("eb", 6).alias("hll_b"),
            F.round("eu", 6).alias("hll_union"),
            F.round(F.col("ea") + F.col("eb") - F.col("eu"), 6).alias(
                "hll_intersection"
            ),
            (
                F.abs(F.col("eu") - F.col("exact_union"))
                <= 0.1 * F.col("exact_union")
            ).alias("union_within_10pct"),
        )
    )


# --------------------------------------------------------------------------
# x_hdr_sliding_quantile — sliding-window percentiles by register
# rollup (r6): the x_hll_sliding_distinct story applied to the HDR
# histogram — per-day bucket tables, 7-day merges by SUMMING counts,
# p50/p95 from the merged table. One raw-data pass total; every window
# merge runs on <= 2048 register rows per day, never on data.
# --------------------------------------------------------------------------

_HDR_SLIDE_SQL = f"""
    WITH rows_ AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
      FROM lineitem
    ), dayhist AS (
      SELECT day, c, CAST(count(*) AS BIGINT) AS cnt FROM rows_ GROUP BY 1, 2
    ), days AS (
      SELECT DISTINCT day FROM dayhist
    ), winhist AS (
      SELECT d.day, r.c, sum(r.cnt) AS cnt
      FROM days d JOIN dayhist r
        ON r.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY 1, 2
    ), cum AS (
      SELECT day, c, cnt,
             sum(cnt) OVER (PARTITION BY day ORDER BY c
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
             sum(cnt) OVER (PARTITION BY day) AS n
      FROM winhist
    ), exact AS (
      SELECT day, CAST(max(n) AS BIGINT) AS n,
             min(CASE WHEN cm >= ceil(0.5 * n) THEN c END) AS p50c,
             min(CASE WHEN cm >= ceil(0.95 * n) THEN c END) AS p95c
      FROM cum GROUP BY day
    ), bucketed AS (
      SELECT day, cnt,{_hdr_bucket_sql()}
      FROM dayhist
    ), dayreg AS (
      SELECT day, bucket, sum(cnt) AS cnt, max(lo) AS lo, max(width) AS width
      FROM bucketed GROUP BY 1, 2
    ), merged AS (
      SELECT d.day, r.bucket, sum(r.cnt) AS cnt,
             max(r.lo) AS lo, max(r.width) AS width
      FROM days d JOIN dayreg r
        ON r.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY 1, 2
    ), scum AS (
      SELECT day, bucket, lo, width,
             sum(cnt) OVER (PARTITION BY day ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
             sum(cnt) OVER (PARTITION BY day) AS n
      FROM merged
    ), est AS (
      SELECT day,
             min(CASE WHEN cm >= ceil(0.5 * n) THEN lo END) AS p50lo,
             min(CASE WHEN cm >= ceil(0.5 * n) THEN width END) AS p50w,
             min(CASE WHEN cm >= ceil(0.95 * n) THEN lo END) AS p95lo,
             min(CASE WHEN cm >= ceil(0.95 * n) THEN width END) AS p95w
      FROM scum GROUP BY day
    )
    SELECT strftime(e.day, '%Y-%m-%d') AS day, x.n,
           CAST(x.p50c AS DOUBLE) / 100.0 AS exact_p50,
           CAST(e.p50lo AS DOUBLE) / 100.0 AS est_p50,
           x.p50c >= e.p50lo AND x.p50c < e.p50lo + e.p50w AS p50_bracketed,
           CAST(x.p95c AS DOUBLE) / 100.0 AS exact_p95,
           CAST(e.p95lo AS DOUBLE) / 100.0 AS est_p95,
           x.p95c >= e.p95lo AND x.p95c < e.p95lo + e.p95w AS p95_bracketed
    FROM est e JOIN exact x ON x.day = e.day
"""


def _hdr_bucketize(df: DataFrame) -> DataFrame:
    """Attach (e, bucket, lo, width) HDR columns to a frame with an
    int64 column ``c`` — the same floor-log2 bit smearing as
    x_quantile_sketch, factored for reuse."""
    prev = "c"
    for i, sh in enumerate((1, 2, 4, 8, 16, 32), start=1):
        df = df.withColumn(f"s{i}", F.expr(f"{prev} | ({prev} >> {sh})"))
        prev = f"s{i}"
    return (
        df.withColumn("e", F.bit_count(F.col("s6")) - 1)
        .withColumn(
            "bucket",
            F.when(F.col("e") < 5, F.col("c")).otherwise(
                F.col("e") * 32 + F.expr("(c >> (e - 5)) & 31")
            ),
        )
        .withColumn(
            "lo",
            F.when(F.col("e") < 5, F.col("c")).otherwise(
                F.expr(
                    "(32 + ((c >> (e - 5)) & 31))"
                    " * (shiftleft(CAST(1 AS BIGINT), e - 5))"
                )
            ),
        )
        .withColumn(
            "width",
            F.when(F.col("e") < 5, F.lit(1).cast("bigint")).otherwise(
                F.expr("shiftleft(CAST(1 AS BIGINT), e - 5)")
            ),
        )
        .drop("s1", "s2", "s3", "s4", "s5", "s6")
    )


@query("x_hdr_sliding_quantile", oracle=_HDR_SLIDE_SQL)
def x_hdr_sliding_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding p50/p95 of lineitem price per ship day, computed
    two ways in one query: EXACT count-then-select over the window's
    value histogram, and the HDR SKETCH route — per-day bucket tables
    (<= ~2048 cells/day at any volume) merged across the window by
    summing counts, quantile = lower bound of the bucket holding the
    rank. The emitted booleans prove the bracketing guarantee (the
    exact quantile provably lands inside the selected bucket, width/lo
    <= 1/32), and everything is int64 bit-math, so the driver
    hash-checks the ESTIMATES, not a tolerance.

    Scale contrast: the exact path's day x window join amplifies the
    HISTOGRAM (distinct values/day), already far smaller than rows —
    but still data-sized in the worst case; the sketch path bounds
    window-merge input at 2048 rows/day NO MATTER WHAT, the same
    register-rollup contract as x_hll_sliding_distinct, and counts
    sum-merge associatively so day tables build once and serve any
    window length."""
    from hephaestus_spark.functions.money import scaled_long

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        F.to_date("l_shipdate").alias("day"),
        scaled_long(F.col("l_extendedprice")).alias("c"),
    )
    dayhist = rows.groupBy("day", "c").agg(F.count("*").cast("bigint").alias("cnt"))
    days = dayhist.select("day").distinct()
    winhist = (
        days.alias("d")
        .join(
            dayhist.alias("r"),
            F.col("r.day").between(F.date_sub(F.col("d.day"), 6), F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("r.c").alias("c"))
        .agg(F.sum("r.cnt").alias("cnt"))
    )
    from pyspark.sql.window import Window as W

    cum = winhist.select(
        "day",
        "c",
        F.sum("cnt")
        .over(
            W.partitionBy("day").orderBy("c").rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cm"),
        F.sum("cnt").over(W.partitionBy("day")).alias("n"),
    )
    exact = cum.groupBy("day").agg(
        F.max("n").cast("bigint").alias("n"),
        F.min(F.when(F.col("cm") >= F.ceil(F.lit(0.5) * F.col("n")), F.col("c"))).alias("p50c"),
        F.min(F.when(F.col("cm") >= F.ceil(F.lit(0.95) * F.col("n")), F.col("c"))).alias("p95c"),
    )
    dayreg = (
        _hdr_bucketize(dayhist)
        .groupBy("day", "bucket")
        .agg(F.sum("cnt").alias("cnt"), F.max("lo").alias("lo"), F.max("width").alias("width"))
    )
    merged = (
        days.alias("d")
        .join(
            dayreg.alias("r"),
            F.col("r.day").between(F.date_sub(F.col("d.day"), 6), F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("r.bucket").alias("bucket"))
        .agg(
            F.sum("r.cnt").alias("cnt"),
            F.max("r.lo").alias("lo"),
            F.max("r.width").alias("width"),
        )
    )
    scum = merged.select(
        "day",
        "lo",
        "width",
        F.sum("cnt")
        .over(
            W.partitionBy("day").orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cm"),
        F.sum("cnt").over(W.partitionBy("day")).alias("n"),
    )
    est = scum.groupBy("day").agg(
        F.min(F.when(F.col("cm") >= F.ceil(F.lit(0.5) * F.col("n")), F.col("lo"))).alias("p50lo"),
        F.min(F.when(F.col("cm") >= F.ceil(F.lit(0.5) * F.col("n")), F.col("width"))).alias("p50w"),
        F.min(F.when(F.col("cm") >= F.ceil(F.lit(0.95) * F.col("n")), F.col("lo"))).alias("p95lo"),
        F.min(F.when(F.col("cm") >= F.ceil(F.lit(0.95) * F.col("n")), F.col("width"))).alias("p95w"),
    )
    return est.join(exact, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        (F.col("p50c").cast("double") / 100.0).alias("exact_p50"),
        (F.col("p50lo").cast("double") / 100.0).alias("est_p50"),
        (
            (F.col("p50c") >= F.col("p50lo"))
            & (F.col("p50c") < F.col("p50lo") + F.col("p50w"))
        ).alias("p50_bracketed"),
        (F.col("p95c").cast("double") / 100.0).alias("exact_p95"),
        (F.col("p95lo").cast("double") / 100.0).alias("est_p95"),
        (
            (F.col("p95c") >= F.col("p95lo"))
            & (F.col("p95c") < F.col("p95lo") + F.col("p95w"))
        ).alias("p95_bracketed"),
    )


# --------------------------------------------------------------------------
# x_weighted_quantile — exact WEIGHTED quantiles (r6): "the price below
# which half the UNITS (not half the rows) were shipped" — the
# inventory/revenue-weighted statistic dashboards actually want. Same
# count-then-select discipline as x_exact_quantiles, with cumulative
# integer WEIGHTS in place of row counts: no sort of raw data, state
# bounded by distinct values, every comparison integer-exact.
# --------------------------------------------------------------------------

_WQUANT_SQL = """
    WITH h AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT flag, c, w,
             sum(w) OVER (PARTITION BY flag ORDER BY c
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             sum(w) OVER (PARTITION BY flag) AS tw
      FROM h
    )
    SELECT flag AS l_returnflag, CAST(max(tw) AS BIGINT) AS total_units,
           CAST(min(CASE WHEN cw * 2 >= tw THEN c END) AS DOUBLE) / 100.0
             AS weighted_median,
           CAST(min(CASE WHEN cw * 10 >= tw * 9 THEN c END) AS DOUBLE) / 100.0
             AS weighted_p90
    FROM cum GROUP BY flag
"""


@query("x_weighted_quantile", oracle=_WQUANT_SQL)
def x_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quantiles per return flag: the q-th
    weighted quantile is the smallest value whose cumulative weight
    reaches q of the total. Thresholds are integer cross-multiplies
    (cw*2 >= tw, cw*10 >= 9*tw) — no double fraction can flip a
    boundary row, and the weighted sums are int64 (quantity is
    integral; cumulative weight per (flag, value-prefix) bounded by
    total units ~ 2^45 at 100 TB, well inside int64).

    Scale shape: one (flag, cents) pre-aggregation collapses the fact
    table to its value histogram (the only thing the quantile needs),
    then a histogram-sized window — the raw data is never sorted."""
    from pyspark.sql.window import Window as W

    from hephaestus_spark.functions.money import scaled_long

    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        scaled_long(F.col("l_extendedprice")).alias("c"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    cum = h.select(
        "flag",
        "c",
        F.sum("w")
        .over(
            W.partitionBy("flag").orderBy("c").rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cw"),
        F.sum("w").over(W.partitionBy("flag")).alias("tw"),
    )
    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.max("tw").cast("bigint").alias("total_units"),
        (
            F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("c"))).cast("double")
            / 100.0
        ).alias("weighted_median"),
        (
            F.min(
                F.when(F.col("cw") * 10 >= F.col("tw") * 9, F.col("c"))
            ).cast("double")
            / 100.0
        ).alias("weighted_p90"),
    )
