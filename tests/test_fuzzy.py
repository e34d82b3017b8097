"""Blocked fuzzy matching: multi-key recall + hot-key cap boundedness.

The skew scenario the cap exists for (VERDICT r2 item 4): a corpus
where one blocking key covers a constant fraction of rows. Without the
cap the within-block join is quadratic in that block; with it, the
hot key is excluded from BOTH sides and per-probe candidate fan-out is
bounded by n_keys * cap.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hephaestus_spark.operators.fuzzy import (
    blocked_best_match,
    blocking_keys,
    hot_keys,
)


def _skewed_corpus(spark, n_hot=300):
    """n_hot names all sharing digrams 'aa'/'bb'/'cc' (one hot block per
    key window) + a handful of distinctive names."""
    hot = [(i, f"aabbcc name {i:04d}") for i in range(n_hot)]
    rare = [
        (10_000, "zq wk vx alpha"),
        (10_001, "zq wk vx alphb"),  # dist 1 from a probe of alpha
        (10_002, "mn op qr other"),
    ]
    return spark.createDataFrame(hot + rare, "cand_id long, cand_name string")


def test_hot_keys_reports_zipf_blocks(spark):
    corpus = _skewed_corpus(spark)
    hot = hot_keys(corpus, "cand_name", cap=50).toPandas()
    # all three digram windows of the hot names exceed the cap
    assert set(hot._bkey) == {"aa", "bb", "cc"}
    assert (hot.block_rows == 300).all()


def test_cap_bounds_candidates_and_rare_keys_still_match(spark):
    corpus = _skewed_corpus(spark)
    probes = spark.createDataFrame(
        [(1, "aabbcc name 0099"), (2, "zq wk vx alpha")],
        "probe_id long, probe_name string",
    )
    out = blocked_best_match(
        probes, corpus, "probe_id", "probe_name", "cand_id", "cand_name",
        max_dist=2, cap=50,
    ).toPandas().set_index("probe_id")
    # probe 1's only keys are the three hot ones -> capped away, no match
    assert 1 not in out.index
    # probe 2 matches exactly via the rare 'zq'/' w'(etc.) keys
    assert out.loc[2, "cand_id"] == 10_000
    assert out.loc[2, "dist"] == 0

    # boundedness: with the hot keys removed, the candidate-pair fan-out
    # is tiny (rare blocks only), not n_hot per probe
    from hephaestus_spark.operators.fuzzy import _keyed

    hot = hot_keys(corpus, "cand_name", cap=50).select("_bkey")
    pk = _keyed(probes, "probe_name", ((1, 2), (3, 2), (5, 2))).join(
        F.broadcast(hot), "_bkey", "left_anti"
    )
    ck = _keyed(corpus, "cand_name", ((1, 2), (3, 2), (5, 2))).join(
        F.broadcast(hot), "_bkey", "left_anti"
    )
    n_pairs = pk.join(ck, "_bkey").count()
    assert n_pairs <= 3 * 50 * probes.count()


def test_no_cap_equals_naive_best_match(spark):
    """With the cap disabled (huge), the blocked plan must equal the
    naive all-pairs best match restricted to shared-key candidates —
    and for probes corrupted inside ONE key window, multi-key blocking
    has full recall, so it equals the unrestricted best match too."""
    corpus = _skewed_corpus(spark, n_hot=40)
    # drop 3rd char: breaks the 'ab'/'bc' windows but keeps window 1
    probes = corpus.select(
        (F.col("cand_id") + 1_000_000).alias("probe_id"),
        F.concat(
            F.substring("cand_name", 1, 2), F.expr("substring(cand_name, 4)")
        ).alias("probe_name"),
    )
    blocked = (
        blocked_best_match(
            probes, corpus, "probe_id", "probe_name", "cand_id", "cand_name",
            max_dist=2, cap=10**9,
        )
        .select("probe_id", "cand_id", "dist")
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    naive = (
        probes.crossJoin(corpus)
        .withColumn("dist", F.levenshtein("probe_name", "cand_name").cast("bigint"))
        .filter(F.col("dist") <= 2)
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("probe_id").orderBy(F.col("dist").asc(), F.col("cand_id").asc())
    naive_best = (
        naive.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_id", "cand_id", "dist")
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(blocked, naive_best)


def test_blocking_keys_dedup(spark):
    df = spark.createDataFrame([("ababab",)], "s string")
    keys = df.select(blocking_keys("s").alias("k")).first()["k"]
    assert keys == ["ab"]  # all three windows collapse to one key
