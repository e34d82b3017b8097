"""The r4 lane-packed simhash aggregate must be bit-for-bit the naive
64-column form (packing is a codegen optimization, not a semantic
change), and bench.py's regression parser must read both bench-line and
driver-wrapped records."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

import hephaestus_spark.queries  # noqa: F401 — registration
from hephaestus_spark.registry import QUERIES
from hephaestus_spark.sources import load_table


def _naive_simhash(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(split(regexp_replace(lower(text), '[^a-z ]', ' '), ' '),"
                " t -> t <> '')"
            )
        ).alias("token"),
    ).withColumn("h", F.xxhash64("token"))
    votes = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        *[F.sum(F.expr(f"(h >> {i}) & 1")).alias(f"b{i}") for i in range(64)],
    )
    sig = F.lit(0).cast("bigint")
    for i in range(64):
        bit = F.when(
            F.col(f"b{i}") * 2 > F.col("n_tok"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {i})"),
        ).otherwise(F.lit(0).cast("bigint"))
        sig = sig.bitwiseOR(bit)
    return votes.select("doc_id", sig.alias("simhash"))


def test_packed_simhash_equals_naive(spark, sf_dir):
    packed = (
        QUERIES["x_simhash"](spark, sf_dir)
        .select("doc_id", "simhash")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    naive = (
        _naive_simhash(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert packed.equals(naive)


def test_bench_regression_parser(tmp_path, monkeypatch):
    import bench

    # one bare bench line, one driver-wrapped record, one at another sf
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"qa": 1.0, "qb": 2.0}})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"n": 3, "rc": 0, "parsed": {"sf": 0.1, "queries": {"qa": 0.4}}})
    )
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"sf": 0.01, "queries": {"qa": 0.01}})
    )
    # r8: repo-local lossless records join the history (the driver's
    # wrapper truncates long stdout to a tail with parsed: null)
    (tmp_path / "BENCH_LOCAL_r04.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"qb": 1.2}})
    )
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    # r12: the operative reference is the median of recent rounds, not
    # the all-time min (VERDICT r11 #2). qa history at sf 0.1 =
    # [1.0 (r1), 0.4 (r2 wrapped; the 0.01-sf record is excluded)] ->
    # ref 1.0; qb = [2.0 (r1), 1.2 (LOCAL r4)] -> ref 2.0.
    best = bench._best_prior(0.1)
    assert best == {"qa": 0.4, "qb": 1.2}  # the ratchet, reference-only
    recent = bench._recent_reference(0.1)
    assert recent == {"qa": 1.0, "qb": 2.0}
    # an honest 0.9/2.1 run: NOT a regression vs recent (it would have
    # been flagged 2.25x/1.75x against the lucky ratcheted mins)
    assert bench._regressions_vs_ref({"qa": 0.9, "qb": 2.1}, recent, best) == {}
    # a genuine regression still flags, with both references attached
    out = bench._regressions_vs_ref({"qa": 2.0, "qb": 2.1}, recent, best)
    assert out == {
        "qa": {"now": 2.0, "recent_ref": 1.0, "best_prior": 0.4},
    }
