"""Relational surface: SURVEY.md §2.B Q1–Q16.

Pure built-in DataFrame ops — Catalyst provides predicate pushdown,
column pruning, join selection (broadcast vs sort-merge via AQE), and
partial/final aggregation. Scale notes per query in docstrings.

Reference parity: the reference (Go ETL, /root/reference) delegates all
of this to PostgreSQL as SQL text; the declared inventory is the t2
correctness contract (SURVEY.md §2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from hephaestus_spark.functions.money import scaled_long, sum_money, sum_money_sql
from hephaestus_spark.registry import query
from hephaestus_spark.sources import load_table, spread_scan


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q1 — scan + project
# --------------------------------------------------------------------------
@query("q01_scan_region", oracle="SELECT r_regionkey, r_name FROM region")
def q01_scan_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of `region`. Parquet scan: ReadSchema carries all cols."""
    return _t(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query("x_project_nation", oracle="SELECT n_name, n_regionkey FROM nation")
def x_project_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning: scan reads exactly 2 of 3 columns."""
    return _t(spark, sf_dir, "nation").select("n_name", "n_regionkey")


# --------------------------------------------------------------------------
# Q2 — filter / predicate pushdown
# --------------------------------------------------------------------------
@query(
    "q02_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q02_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate; all three conjuncts push to the Parquet scan
    (PushedFilters) so row groups outside the ranges are skipped — the
    mechanism that keeps a 100 TB scan from reading 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")


# --------------------------------------------------------------------------
# Q3 — inner equi-join (shuffle / sort-merge at scale)
# --------------------------------------------------------------------------
@query(
    "q03_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, l.l_extendedprice
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def q03_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi-join: shuffles both sides on the key (sort-merge);
    AQE may convert to broadcast at small SF. Both inputs are pruned to
    the join key + projected columns before the shuffle."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    return o.join(l, o.o_orderkey == l.l_orderkey, "inner").select(
        "o_orderkey", "o_totalprice", "l_extendedprice"
    )


# --------------------------------------------------------------------------
# Q4 — broadcast join chain (star-schema dimension joins)
# --------------------------------------------------------------------------
@query(
    "q04_join_broadcast",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    """,
)
def q04_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dims (nation 25, region 5 rows) broadcast explicitly: zero shuffle
    of the fact side regardless of its size. The r_name filter folds into
    the broadcast build side."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


# --------------------------------------------------------------------------
# Q5 — left outer join + count including empty groups
# --------------------------------------------------------------------------
@query(
    "q05_join_left_count",
    oracle="""
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q05_join_left_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(col) ignores the NULLs produced by the outer join, so
    customers with no orders report 0.

    r15 (guide §2.3 "aggregate before you shuffle"): the old form
    joined every order row to its customer and THEN counted —
    row-multiplication before reduction. Orders now aggregate to
    (o_custkey, n) first (map-side partial combine, so the exchange
    carries per-key partials, not rows), and the left join attaches
    counts to customers with coalesce-0 for the no-order case. At
    scale the join moves |customers| + |distinct custkeys| rows
    instead of |orders|. Exact-equivalent (count(o_orderkey) over the
    left join == per-custkey order count, null custkeys match no
    customer in both forms); verified by exceptAll both directions at
    sf0.1 + driver oracle. Interleaved A/B at sf0.1: 0.53 -> 0.36 s
    median."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    counts = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("_n"))
    )
    return c.join(counts, c.c_custkey == counts.o_custkey, "left").select(
        "c_custkey", F.coalesce("_n", F.lit(0)).cast("bigint").alias("n_orders")
    )


# --------------------------------------------------------------------------
# Q6 — left semi join (EXISTS)
# --------------------------------------------------------------------------
@query(
    "q06_join_semi",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
)
def q06_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: build side only needs the key column (pruned), no row
    multiplication. At scale the probe (part) streams; AQE broadcasts the
    distinct-key build when it fits."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").select("l_partkey")
    return p.join(l, p.p_partkey == l.l_partkey, "left_semi").select("p_partkey", "p_name")


# --------------------------------------------------------------------------
# Q7 — left anti join (NOT EXISTS)
# --------------------------------------------------------------------------
@query(
    "q07_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q07_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Q8 — theta / range join (equi-key + inequality residual)
# --------------------------------------------------------------------------
@query(
    "q08_join_range",
    oracle="""
    SELECT o.o_orderkey,
           CAST(count(CASE WHEN l.l_shipdate > o.o_orderdate THEN 1 END) AS BIGINT)
             AS n_shipped_after
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
    """,
)
def q08_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key join with an inequality residual: Spark plans the hash
    join on the equi key and evaluates the range predicate as a join
    residual — the scalable plan (a pure theta join would be a
    cartesian product).

    r15 (guide §1.2 the distributed algorithm / §3.1 build side): the
    old form LEFT-joined orders to lineitem and aggregated the joined
    rows, which forces LINEITEM — the larger side — to be the hash
    build (outer side must stream) and carries every joined row into
    the aggregation. Restructured as inner-join + count per key, then
    a zero-fill join back to orders: now ORDERS (4x smaller, and the
    side a real deployment could broadcast or bloom-prefilter) is the
    build side, the count aggregates map-side before its exchange,
    and the backfill join moves only (key, count) pairs. Exact-
    equivalent: count(l_orderkey) over the left join counts precisely
    the rows matching BOTH the key and the range predicate, which is
    the inner-join group count, and orders absent from the inner join
    coalesce to 0. Verified by exceptAll in both directions at sf0.1
    and the unchanged driver oracle. Measured min 1.86 -> 0.78 s at
    sf0.1 (the old form's repeated 600k-row broadcast also made it
    the bench's most contention-sensitive query)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # r15 (guide §2.5, same shape as q20's old spread): the BHJ probe +
    # per-key count run in the SCAN's stage, and the local files only
    # split 3 ways — the count cannot reduce map-side before the probe,
    # so spreading on the GROUP key replaces the aggregation exchange
    # (clustering already satisfied) and runs probe+agg at full width.
    # Interleaved A/B at sf0.1: min 0.585 -> 0.368 s, med 0.71 -> 0.52.
    # No-op at real scale (spread fires only on under-split scans).
    l = spread_scan(l, "l_orderkey")
    counts = (
        l.join(o, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate))
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("_n"))
    )
    all_o = _t(spark, sf_dir, "orders").select("o_orderkey")
    return all_o.join(counts, all_o.o_orderkey == counts.l_orderkey, "left").select(
        "o_orderkey", F.coalesce("_n", F.lit(0)).alias("n_shipped_after")
    )


# --------------------------------------------------------------------------
# Q9 — hash aggregation (TPC-H Q1 shape)
# --------------------------------------------------------------------------
@query(
    "q09_agg_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sum_money_sql('l_quantity')}                              AS sum_qty,
           {sum_money_sql('l_extendedprice')}                         AS sum_base_price,
           {sum_money_sql('l_extendedprice * (1 - l_discount)', 4)}   AS sum_disc_price,
           avg(l_quantity)                                            AS avg_qty,
           CAST(count(*) AS BIGINT)                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q09_agg_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic partial+final hash agg: map-side combine means the shuffle
    carries |groups| rows per partition, not |input| — the property that
    makes this a bandwidth no-op at 100 TB (6 groups total).

    Cross-engine discipline (the q14/q19/q34 failure class, audited r4;
    r5 replaced the decimal accumulators with scaled-long sums after the
    r4 bench flagged the 3x Decimal128 tax): money sums accumulate as
    scaled bigints in BOTH engines (functions/money.py) — same exact,
    order-independent, bit-identical-across-engines result, at
    whole-stage-codegen integer-add speed. avg_qty is safe raw:
    quantities are integral doubles, whose sums are exact in binary."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_money(F.col("l_quantity")).alias("sum_qty"),
            sum_money(F.col("l_extendedprice")).alias("sum_base_price"),
            sum_money(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), dp=4
            ).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Q10 — distinct aggregation
# --------------------------------------------------------------------------
@query(
    "q10_count_distinct",
    oracle="""
    SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q10_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct agg: Spark expands to a two-phase agg (distinct on
    (flag, suppkey) then count) — shuffle keyed on the pair, no driver
    materialization."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(F.countDistinct("l_suppkey").alias("n_supp"))


@query(
    "q10_distinct_rows",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def q10_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


# --------------------------------------------------------------------------
# Q11 — rollup / cube / grouping_id
# --------------------------------------------------------------------------
@query(
    "q11_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {sum_money_sql('o_totalprice')}                           AS sum_price,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # scaled-long exact sum (see q09 docstring): order-independent,
    # bit-identical across engines, integer-speed adds
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        sum_money(F.col("o_totalprice")).alias("sum_price"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


@query(
    "q11_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {sum_money_sql('o_totalprice')}                           AS sum_price,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        sum_money(F.col("o_totalprice")).alias("sum_price"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


# --------------------------------------------------------------------------
# Q12 — window: ranking (top-3 per group)
# --------------------------------------------------------------------------
@query(
    "q12_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             CAST(rank()       OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) WHERE rn <= 3
    """,
)
def q12_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window; deterministic tiebreak on
    o_orderkey. o_orderstatus has THREE values, so a naive per-status
    window sorts a third of the table in one task at scale — phase 1
    salts the rows and keeps top-3 per (status, bucket). Every row
    ranked above a survivor survives its own bucket too, so the final
    window's row_number/rank/dense_rank over survivors are the exact
    global values (operators/topk.py argument)."""
    from hephaestus_spark.operators.topk import topk_per_group

    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    survivors = topk_per_group(o, ["o_orderstatus"], order, k=3).drop("rn")
    w = W.partitionBy("o_orderstatus").orderBy(*order)
    return (
        survivors.select(
            "o_orderstatus",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# Q13 — window: analytic (lag/lead, running sum)
# --------------------------------------------------------------------------
@query(
    "q13_window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def q13_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead are source-value passthrough (bit-exact). The running
    sum accumulates as scaled longs in both engines (functions/money.py;
    see q09 docstring): a window cumulative sum is order-sensitive in
    double (DuckDB may use segment-tree reassociation), while int64
    accumulation is exact regardless — and integer-speed, unlike the r4
    decimal variant this replaces."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (
            # per-customer frame: int64-safe to ~9e11 rows PER CUSTOMER
            # at 2dp (~10 orders/customer at any SF) — no lane split
            F.sum(scaled_long(F.col("o_totalprice")))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            / 100.0
        ).alias("running_total"),
    )


# --------------------------------------------------------------------------
# Q14 — window: range frame (value-based)
# --------------------------------------------------------------------------
@query(
    "q14_window_range_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE)
                                                              AS sum_price_qty_pm5,
           CAST(count(*) OVER w AS BIGINT)                    AS n_qty_pm5
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity
                 RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
    """,
)
def q14_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on l_quantity: the frame holds all rows whose
    quantity is within ±5 of the current row's (value-based, not
    row-count-based).

    r15 (optimization, guide §1.2 "the distributed algorithm"): Spark's
    sliding RANGE frame is O(rows x frame) — aggregates are not
    subtractable, so every row re-sums its whole frame (measured 16 s
    of executor CPU at sf0.1, 27 us/row, the single most expensive
    stage in the bench). The bounded frame is replaced by the
    DIFFERENCE OF TWO ADD-ONLY PREFIX FRAMES over the same sort:
    sum[q-5, q+5] = prefix(<= q+5) - prefix(<= q-6), each an
    UnboundedPreceding..bound frame that Spark evaluates incrementally
    (O(rows) total), sharing one exchange + one sort. Measured 16.2 s
    -> 0.66 s stage CPU at sf0.1 with identical output.

    Exactness: the subtraction runs on SCALED-LONG cents (see q09/q13,
    functions/money.py) so the result is bit-exact integer arithmetic
    — strictly tighter than the old double sum + round(2) drift
    argument. cents/100.0 is IEEE-exact rounding to the nearest double
    of the true 2-dp decimal, which is precisely what the DuckDB
    oracle's CAST(round(decimal_sum, 2) AS DOUBLE) produces.
    prefix(<= q-6) captures exactly the rows with quantity < q-5
    because l_quantity is INTEGRAL in this schema (TPC-H quantities
    are whole numbers 1..50; pinned by test_oracle.py's integrality
    check) — RANGE bounds are inclusive, so for integral keys
    "<= q-6" and "< q-5" coincide. sum over an empty prefix is NULL ->
    coalesce(0); count over an empty frame is already 0."""
    li = _t(spark, sf_dir, "lineitem")
    cents = scaled_long(F.col("l_extendedprice"))
    base = W.partitionBy("l_suppkey").orderBy("l_quantity")
    w_hi = base.rangeBetween(W.unboundedPreceding, 5)
    w_lo = base.rangeBetween(W.unboundedPreceding, -6)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (
            (
                F.sum(cents).over(w_hi)
                - F.coalesce(F.sum(cents).over(w_lo), F.lit(0))
            )
            / 100.0
        ).alias("sum_price_qty_pm5"),
        (F.count("*").over(w_hi) - F.count("*").over(w_lo))
        .cast("bigint")
        .alias("n_qty_pm5"),
    )


# --------------------------------------------------------------------------
# Q15 — global sort / top-k
# --------------------------------------------------------------------------
@query(
    "q15_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 10
    """,
)
def q15_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy + limit plans as TakeOrderedAndProject: each partition
    keeps its local top-10, only 10*P rows reach the driver-side merge —
    never a global sort."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q16 — set operations
# --------------------------------------------------------------------------
_ASIA_SUPP = """
    SELECT s.s_suppkey FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
"""
_POSBAL_SUPP = "SELECT s_suppkey FROM supplier WHERE s_acctbal > 0"


def _q16_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    posbal = s.filter(F.col("s_acctbal") > 0).select("s_suppkey")
    return asia, posbal


@query("q16_union_all", oracle=f"{_ASIA_SUPP} UNION ALL {_POSBAL_SUPP}")
def q16_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _q16_sides(spark, sf_dir)
    return a.union(b)


@query("q16_union_distinct", oracle=f"{_ASIA_SUPP} UNION {_POSBAL_SUPP}")
def q16_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _q16_sides(spark, sf_dir)
    return a.union(b).distinct()


@query("q16_intersect", oracle=f"{_ASIA_SUPP} INTERSECT {_POSBAL_SUPP}")
def q16_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _q16_sides(spark, sf_dir)
    return a.intersect(b)


@query("q16_except", oracle=f"{_ASIA_SUPP} EXCEPT {_POSBAL_SUPP}")
def q16_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _q16_sides(spark, sf_dir)
    return a.subtract(b)


@query("x_except_all", oracle=f"{_ASIA_SUPP} EXCEPT ALL {_POSBAL_SUPP}")
def x_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics except (Spark exceptAll vs SQL EXCEPT ALL)."""
    a, b = _q16_sides(spark, sf_dir)
    return a.exceptAll(b)
