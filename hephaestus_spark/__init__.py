"""hephaestus_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``UnknownOlympus/hephaestus`` (a Go incremental ETL/sync service; see
SURVEY.md) re-expressed Spark-first:

- The reference's pipeline semantics (CDC-style incremental sync, record
  validation/repair, SCD-1 upsert with null-safe change detection, bridge
  rewrite, date watermarking) become DataFrame transformations and
  Structured Streaming jobs (``operators/``, ``streaming/``).
- The relational surface the reference delegates to PostgreSQL (plus the
  declared analytic inventory in SURVEY.md §2.B) becomes a library of
  named DataFrame query builders (``queries/``) with ANSI-SQL oracles.
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal plumbing) live in ``operators/`` and ``queries/``.

Everything is declarative DataFrame/SQL so Catalyst + AQE pick physical
plans; Python UDFs appear only where built-ins cannot express the
semantics (vector math), and then only as Arrow-batched pandas UDFs.
"""

from hephaestus_spark.registry import QUERIES, ORACLES, query
from hephaestus_spark.session import get_session

__all__ = ["QUERIES", "ORACLES", "query", "get_session"]
__version__ = "0.1.0"
