"""Lake I/O layout contracts: pruning, bucketing, compaction.

These assert the *plan-level* payoff of each write-time layout choice,
not just value round-trips — the point of the layout is what the
optimizer can elide on later reads (pruned partitions, elided
Exchanges), which is exactly what survives a 100x scale-up.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hephaestus_spark.sources import load_table
from hephaestus_spark.sources.io import (
    compact,
    read_any,
    write_bucketed,
    write_partitioned,
)


def test_read_any_rejects_inference_by_default(spark, tmp_path):
    p = str(tmp_path / "j")
    spark.range(3).write.json(p)
    with pytest.raises(ValueError, match="explicit schema"):
        read_any(spark, p, "json")
    out = read_any(spark, p, "json", schema="id bigint")
    assert out.count() == 3


def test_csv_json_orc_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    schema = "n_nationkey int, n_name string, n_regionkey int"
    for fmt in ("csv", "json", "orc"):
        p = str(tmp_path / fmt)
        nation.write.format(fmt).option("header", "true").save(p)
        back = read_any(spark, p, fmt, schema=schema)
        assert sorted(r.n_name for r in back.collect()) == sorted(
            r.n_name for r in nation.collect()
        )


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    p = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(orders, p, ["o_orderstatus"])
    # directory layout exists
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(p))
    back = read_any(spark, p, "parquet").filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # pruning happened at planning time: only the matching partition dir
    # is listed in the scan
    assert "o_orderstatus=F" in plan or "PartitionFilters" in plan
    assert back.count() == orders.filter("o_orderstatus = 'F'").count()


def test_partitioned_write_respects_max_records(spark, tmp_path):
    p = str(tmp_path / "split")
    df = spark.range(1000).withColumn("k", F.lit("a"))
    write_partitioned(df, p, ["k"], target_file_rows=100)
    files = [f for f in os.listdir(p + "/k=a") if f.endswith(".parquet")]
    assert len(files) >= 10


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    write_bucketed(
        orders,
        "t_orders_b",
        ["o_orderkey"],
        8,
        sort_by=["o_orderkey"],
        path=str(tmp_path / "t_orders_b"),
    )
    write_bucketed(
        li,
        "t_lineitem_b",
        ["l_orderkey"],
        8,
        sort_by=["l_orderkey"],
        path=str(tmp_path / "t_lineitem_b"),
    )
    # force the sort-merge path (broadcast would trivially skip the
    # shuffle for the wrong reason at this tiny SF)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert (
            joined.count()
            == orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compact_reduces_file_count(spark, tmp_path):
    p = str(tmp_path / "shards")
    spark.range(5000).repartition(50).write.parquet(p)
    before = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert before == 50
    n = compact(spark, p, target_rows_per_file=5000)
    assert n == 1
    after = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(after) == 1
    assert spark.read.parquet(p).count() == 5000


def test_compact_refuses_partitioned_layout(spark, tmp_path):
    p = str(tmp_path / "parts")
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("day", (F.col("id") % 3).cast("string"))
    df.write.partitionBy("day").parquet(p)
    with pytest.raises(RuntimeError, match="Hive-partitioned"):
        compact(spark, p)
    # layout untouched
    assert spark.read.parquet(p).count() == 100


def test_compact_refuses_stale_marker(spark, tmp_path):
    p = str(tmp_path / "flat")
    spark.range(100).coalesce(1).write.parquet(p)
    stale = p + "._compact_old"
    os.makedirs(stale)
    with pytest.raises(RuntimeError, match="_compact_old"):
        compact(spark, p)
    os.rmdir(stale)
    assert compact(spark, p, target_rows_per_file=1000) == 1
