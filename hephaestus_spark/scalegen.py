"""Deterministic scale-up of the driver test data (VERDICT r6 item 3).

The image has no network (DuckDB's tpch extension cannot download) and
/root/testdata is read-only, so larger scale factors are synthesized
from the largest driver-provided SF by KEY-SHIFTED REPLICATION: sfN =
N copies of sf0.1 with every entity key offset by ``replica * stride``
(stride = max base key + 1, so replicas can never collide). Value
columns are untouched — per-key group sizes, join fan-outs, selectivity
and value distributions all match the base exactly, which is what a
runtime-trend gate needs (a quadratic plan shows up as a ~N^2 time
ratio regardless of the data's provenance).

Two deliberate wrinkles:

- ``documents.text`` gets a per-replica suffix token, so replicas are
  NEAR-duplicates (Jaccard just under 1) rather than exact ones — the
  near-dedup family sees a genuinely denser pair graph at scale, not a
  degenerate exact-dup one.
- ``region``/``nation`` are fixed dimensions and are copied verbatim
  (their keys are foreign keys from the shifted tables' UNSHIFTED
  nation/region columns, which this generator leaves alone).

Everything is plain DataFrame code: one scan per table per replica,
unioned and written once — no driver-side rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# table -> columns sharing each key domain (shifted by the SAME stride
# so referential integrity survives replication)
_KEY_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
_VERBATIM = {"region", "nation"}


def _strides(spark: SparkSession, base_dir: str) -> dict[tuple[str, str], int]:
    """stride per (table, column) = max(base key over its domain) + 1."""
    out: dict[tuple[str, str], int] = {}
    for cols in _KEY_DOMAINS.values():
        mx = 0
        for table, col in cols:
            df = spark.read.parquet(f"{base_dir}/{table}.parquet")
            mx = max(mx, int(df.agg(F.max(col)).first()[0] or 0))
        for table, col in cols:
            out[(table, col)] = mx + 1
    return out


def _replica(
    df: DataFrame, table: str, r: int, strides: dict[tuple[str, str], int]
) -> DataFrame:
    for (t, col), stride in strides.items():
        if t == table:
            df = df.withColumn(col, F.col(col) + F.lit(r * stride))
    if table == "documents" and r > 0:
        # one extra token -> near-duplicate (high, sub-1.0 Jaccard)
        df = df.withColumn("text", F.concat(F.col("text"), F.lit(f" rep{r}")))
        df = df.withColumn("n_chars", F.col("n_chars") + F.lit(len(f" rep{r}")))
    return df


def generate(
    spark: SparkSession,
    base_dir: str = "/root/testdata/sf0.1",
    out_dir: str = "/tmp/hephaestus_sf1",
    replicas: int = 10,
    overwrite: bool = False,
) -> str:
    """Materialize ``replicas`` x ``base_dir`` under ``out_dir``;
    returns ``out_dir``. Idempotent: an existing complete output is
    reused unless ``overwrite``."""
    done_marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(done_marker) and not overwrite:
        return out_dir
    strides = _strides(spark, base_dir)
    for table in TABLES:
        base = spark.read.parquet(f"{base_dir}/{table}.parquet")
        if table in _VERBATIM:
            out = base
        else:
            parts = [_replica(base, table, r, strides) for r in range(replicas)]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
    with open(done_marker, "w") as f:
        f.write(f"base={base_dir} replicas={replicas}\n")
    return out_dir


if __name__ == "__main__":
    import sys

    from hephaestus_spark.session import get_session

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hephaestus_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    generate(get_session("hephaestus-scalegen"), out_dir=out, replicas=n,
             overwrite=True)
    print(out)
