"""Invariants for the codec-free byte-histogram feature path."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import hephaestus_spark.queries  # noqa: F401
from hephaestus_spark.operators.multimodal import (
    byte_histogram_features,
    synthesize_media,
)
from hephaestus_spark.registry import QUERIES
from hephaestus_spark.sources import load_table


def test_histogram_invariants_and_python_reference(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    media = synthesize_media(d)
    rows = byte_histogram_features(media).collect()
    texts = {r.doc_id: r.text for r in d.collect()}
    assert rows
    for r in rows:
        payload = texts[r.doc_id].encode("utf-8")
        assert r.byte_len == len(payload)
        assert sum(r.hist) == r.byte_len
        assert len(r.hist) == 16
        # pure-Python reference histogram + entropy
        ref = [0] * 16
        for b in payload:
            ref[b >> 4] += 1
        assert r.hist == ref
        probs = [c / len(payload) for c in ref if c]
        ref_ent = -sum(p * math.log2(p) for p in probs)
        assert abs(r.byte_entropy - ref_ent) < 1e-9
        assert 0.0 <= r.byte_entropy <= 4.0  # log2(16) bound


def test_registered_query_runs_map_side(spark, sf_dir):
    df = QUERIES["x_multimodal_histogram"](spark, sf_dir)
    assert df.count() > 0
    plan_df = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_df  # map-side only, no shuffle
