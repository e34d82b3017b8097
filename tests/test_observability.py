"""A23/A24 observability + JDBC statement parity (A11/A14)."""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import functions as F

from hephaestus_spark.observability import HealthChecker, observe_pipeline
from hephaestus_spark.streaming.sinks import GEOCODE_RESET_RULE, upsert_sql


def test_observe_pipeline_counters(spark):
    from pyspark.sql.observation import Observation

    df = spark.createDataFrame(
        [(1, "ok@example.com", "0961234567"), (2, "bad", "xx"), (3, "", "")],
        "id long, email string, phone string",
    )
    obs = Observation("hephaestus")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("hephaestus_processed_items_total"),
        F.sum((~F.col("email").rlike("@")).cast("long")).alias("fixed"),
    )
    observed.collect()
    m = obs.get
    assert m["hephaestus_processed_items_total"] == 3
    assert m["fixed"] == 2


def test_healthz_endpoint(spark):
    hc = HealthChecker(spark, checks={"source": lambda: True})
    srv = hc.serve(port=0)
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert r.status == 200
            body = json.loads(r.read())
            assert body == {"spark": "OK", "source": "OK"}
    finally:
        srv.shutdown()


def test_healthz_failing_dependency(spark):
    hc = HealthChecker(spark, checks={"db": lambda: (_ for _ in ()).throw(OSError("down"))})
    srv = hc.serve(port=0)
    try:
        port = srv.server_address[1]
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert "failed" in json.loads(e.read())["db"]
    finally:
        srv.shutdown()


def test_upsert_sql_reference_parity():
    """The generated statement must reproduce the reference's A11/A14
    semantics: ON CONFLICT upsert + conditional geocode reset guarded by
    IS DISTINCT FROM (task.go:81-113)."""
    sql = upsert_sql(
        "tasks",
        "task_id",
        ["task_type_id", "description", "address"],
        reset_rule=GEOCODE_RESET_RULE.format(t="tasks"),
    )
    assert sql.startswith("INSERT INTO tasks (task_id, task_type_id, description, address)")
    assert "ON CONFLICT (task_id) DO UPDATE SET" in sql
    assert "address = EXCLUDED.address" in sql
    assert "tasks.address IS DISTINCT FROM EXCLUDED.address" in sql
    assert "THEN NULL ELSE tasks.latitude" in sql
    assert "geocoding_attempts = CASE WHEN" in sql
    # A11 variant: plain insert-if-absent has DO NOTHING semantics via
    # empty update set -> covered by scd1 merge path; statement check:
    simple = upsert_sql("employees", "id", ["fullname", "email"])
    assert "ON CONFLICT (id) DO UPDATE SET fullname = EXCLUDED.fullname" in simple
