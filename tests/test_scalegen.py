"""The scale generator must preserve what the scale gate relies on:
exact Nx row counts, disjoint key ranges per replica, referential
integrity (no orphans introduced), untouched value distributions, and
near-duplicate (not exact-duplicate) document replicas."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.scalegen import generate


@pytest.fixture(scope="module")
def sf2x(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale") / "x2")
    return generate(
        spark, base_dir="/root/testdata/sf0.001", out_dir=out, replicas=2
    )


def test_row_counts_scale_exactly(spark, sf2x):
    for t, verbatim in (("lineitem", False), ("orders", False), ("region", True)):
        base = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").count()
        big = spark.read.parquet(f"{sf2x}/{t}.parquet").count()
        assert big == (base if verbatim else 2 * base), t


def test_replica_keys_disjoint_and_fk_intact(spark, sf2x):
    li = spark.read.parquet(f"{sf2x}/lineitem.parquet")
    o = spark.read.parquet(f"{sf2x}/orders.parquet")
    # keys never collide across replicas: count distinct doubles too
    base_o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert o.select("o_orderkey").distinct().count() == 2 * base_o.count()
    # referential integrity: every lineitem still joins its order
    orphans = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count()
    assert orphans == 0
    # events.user_id is a custkey FK (ADVICE r6): it must shift in
    # lockstep with customer keys — every replica's events join their
    # replica's customers, and replicated customers DO get events
    e = spark.read.parquet(f"{sf2x}/events.parquet")
    c = spark.read.parquet(f"{sf2x}/customer.parquet")
    assert e.join(c, e.user_id == c.c_custkey, "left_anti").count() == 0
    base_c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    stride = base_c.agg(F.max("c_custkey")).first()[0] + 1
    assert e.filter(F.col("user_id") >= stride).count() == e.count() / 2
    # per-order group sizes are EXACTLY the base distribution
    base_sizes = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_orderkey").count().groupBy("count").count()
        .withColumnRenamed("count", "orders_with_size")
    )
    big_sizes = li.groupBy("l_orderkey").count().groupBy("count").count()
    got = {r[0]: r[1] for r in big_sizes.collect()}
    want = {r[0]: 2 * r[1] for r in base_sizes.collect()}
    assert got == want


def test_value_distribution_untouched(spark, sf2x):
    base = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").agg(
        F.sum("l_extendedprice"), F.min("l_extendedprice"), F.max("l_extendedprice")
    ).first()
    big = spark.read.parquet(f"{sf2x}/lineitem.parquet").agg(
        F.sum("l_extendedprice"), F.min("l_extendedprice"), F.max("l_extendedprice")
    ).first()
    assert math.isclose(big[0], 2 * base[0], rel_tol=1e-9)
    assert (big[1], big[2]) == (base[1], base[2])


def test_document_replicas_are_near_not_exact_duplicates(spark, sf2x):
    d = spark.read.parquet(f"{sf2x}/documents.parquet")
    base_n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert d.count() == 2 * base_n
    # exact-dup groups must NOT form across replicas (text mutated)…
    assert (
        d.groupBy(F.sha2("text", 256)).count().filter(F.col("count") > 1).count()
        == 0
    )
    # …but every replica-1 doc is a near-duplicate: the base text plus
    # the one-token " rep1" suffix, with n_chars adjusted in lockstep
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stride = base.agg(F.max("doc_id")).first()[0] + 1
    r1 = d.filter(F.col("text").endswith(" rep1")).select(
        (F.col("doc_id") - stride).alias("doc_id"),
        F.col("text").alias("t1"),
        F.col("n_chars").alias("n1"),
    )
    assert r1.count() == base_n
    j = base.join(r1, "doc_id")
    assert j.count() == base_n
    bad = j.filter(
        (F.col("t1") != F.concat(F.col("text"), F.lit(" rep1")))
        | (F.col("n1") != F.col("n_chars") + 5)
    ).count()
    assert bad == 0
