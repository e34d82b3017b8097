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
    # events.user_id is a custkey FK (x_asof/x_funnel/x_attribution_*
    # join it to o_custkey), so it must shift with the SAME stride as
    # customer/orders — its own stride would land every replica's
    # events on replica-0 customers and give replicated customers zero
    # events, silently breaking the "join fan-outs match the base"
    # invariant the trend gate rests on (ADVICE r6).
    "custkey": [
        ("customer", "c_custkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "eventid": [("events", "event_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
_VERBATIM = {"region", "nation"}

# hot-key skew mode (VERDICT r6 item 2): FK columns the generator can
# concentrate onto ONE existing hot key, mapped to the columns whose
# (deterministic) hash selects which rows move. Only FK sides are
# skewed — primary keys stay unique, so joins stay valid and the hot
# key's fan-in is what explodes: exactly the shape AQE skew-join
# splitting and the salted operators exist for. Uniform replication
# can never produce this (per-key group sizes match the base), so the
# uniform trend gate alone never stresses the skew machinery.
_HOT_FKS: dict[tuple[str, str], list[str]] = {
    ("orders", "o_custkey"): ["o_orderkey"],
    ("lineitem", "l_orderkey"): ["l_orderkey", "l_linenumber"],
    ("events", "user_id"): ["event_id"],
}


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


def _hot_keys(spark: SparkSession, base_dir: str) -> dict[tuple[str, str], int]:
    """One hot target per skewable FK: the MIN base value of that FK
    column — a key that provably exists on the PK side (base FK values
    reference real rows, and replica 0 keeps base keys unshifted)."""
    out: dict[tuple[str, str], int] = {}
    for table, col in _HOT_FKS:
        df = spark.read.parquet(f"{base_dir}/{table}.parquet")
        out[(table, col)] = int(df.agg(F.min(col)).first()[0] or 0)
    return out


def _skew(
    df: DataFrame,
    table: str,
    hot_frac: float,
    hots: dict[tuple[str, str], int],
) -> DataFrame:
    """Route ``hot_frac`` of rows' FK values onto the hot key. The row
    selector is xxhash64 of the row's own identifying columns — no RNG,
    so regeneration is bit-reproducible."""
    for (t, col), sel in _HOT_FKS.items():
        if t == table:
            pick = F.pmod(F.xxhash64(*sel), F.lit(10_000)) < int(
                round(hot_frac * 10_000)
            )
            df = df.withColumn(
                col, F.when(pick, F.lit(hots[(t, col)])).otherwise(F.col(col))
            )
    return df


def generate(
    spark: SparkSession,
    base_dir: str = "/root/testdata/sf0.1",
    out_dir: str = "/tmp/hephaestus_sf1",
    replicas: int = 10,
    overwrite: bool = False,
    hot_frac: float = 0.0,
) -> str:
    """Materialize ``replicas`` x ``base_dir`` under ``out_dir``;
    returns ``out_dir``. Idempotent: an existing output is reused only
    when its _DONE marker records the SAME config (base, replicas,
    hot_frac, generator version) — a stale cache from an older
    generator regenerates automatically.

    ``hot_frac`` > 0 additionally routes that fraction of FK values
    (``_HOT_FKS``) onto one hot key per column — the adversarial
    variant for the skew gate (tests/test_scale_trend.py)."""
    stamp = (
        f"gen=2 base={base_dir} replicas={replicas} hot_frac={hot_frac}\n"
    )
    done_marker = os.path.join(out_dir, "_DONE")
    if not overwrite and os.path.exists(done_marker):
        with open(done_marker) as f:
            if f.read() == stamp:
                return out_dir
    strides = _strides(spark, base_dir)
    hots = _hot_keys(spark, base_dir) if hot_frac > 0 else {}
    for table in TABLES:
        base = spark.read.parquet(f"{base_dir}/{table}.parquet")
        if table in _VERBATIM:
            out = base
        else:
            parts = [_replica(base, table, r, strides) for r in range(replicas)]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            if hot_frac > 0:
                out = _skew(out, table, hot_frac, hots)
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
    with open(done_marker, "w") as f:
        f.write(stamp)
    return out_dir


if __name__ == "__main__":
    import sys

    from hephaestus_spark.session import get_session

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hephaestus_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    hf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    generate(get_session("hephaestus-scalegen"), out_dir=out, replicas=n,
             overwrite=True, hot_frac=hf)
    print(out)
