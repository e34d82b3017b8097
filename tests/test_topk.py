"""Two-phase salted top-k must equal the single-window top-k exactly
(including the rank column), for any salt width and tie pattern."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from hephaestus_spark.operators.topk import topk_per_group


def _corpus(spark):
    # many ties: n = id % 5 collides heavily; tiebreak on token
    return spark.range(500).select(
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("t"), F.lpad((F.col("id") % 100).cast("string"), 3, "0")).alias("token"),
        (F.col("id") % 5).alias("n"),
    ).dropDuplicates(["g", "token"])


def test_matches_single_window(spark):
    df = _corpus(spark)
    order = [F.col("n").desc(), F.col("token").asc()]
    w = W.partitionBy("g").orderBy(*order)
    plain = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
        .collect()
    )
    for salt_n in (1, 4, 64):
        salted = topk_per_group(df, ["g"], order, k=7, salt_n=salt_n).collect()
        assert sorted(map(tuple, salted)) == sorted(map(tuple, plain)), salt_n


def test_groups_smaller_than_k_survive_whole(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "z", 9)], "g string, token string, n long"
    )
    out = topk_per_group(
        df, ["g"], [F.col("n").desc(), F.col("token").asc()], k=10
    ).collect()
    assert len(out) == 3
    assert {(r["g"], r["rn"]) for r in out} == {("a", 1), ("a", 2), ("b", 1)}
