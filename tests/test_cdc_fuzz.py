"""Property test for the CDC op-log apply (x_cdc_apply semantics).

The oracle sweep checks the operator on the driver's synthetic orders;
this fuzz drives the SAME last-op-wins + tombstone semantics through
adversarial random op logs (duplicate timestamps, delete/re-insert
cycles, keys ending deleted, single-op keys) and compares the Spark
window plan against an independent pure-Python replay — guarding
against blind spots the fixed synthetic data can't reach (e.g. a tie
broken differently, a tombstone resurrecting).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# Small domains force collisions: few keys, few timestamps -> ties and
# long per-key chains are the common case, not the rare one.
_OPS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),      # key
        st.integers(min_value=0, max_value=5),      # ts
        st.integers(min_value=0, max_value=10**6),  # seq (unique-ified below)
        st.sampled_from(["U", "U", "U", "D"]),      # op, deletes ~25%
        st.integers(min_value=-100, max_value=100), # payload
    ),
    min_size=1,
    max_size=40,
)


def _py_apply(rows):
    """Independent reference: last (ts, seq) op per key wins; 'D' drops."""
    last = {}
    for k, ts, seq, op, v in rows:
        cur = last.get(k)
        if cur is None or (ts, seq) > (cur[0], cur[1]):
            last[k] = (ts, seq, op, v)
    return {
        k: (ts, seq, v)
        for k, (ts, seq, op, v) in last.items()
        if op == "U"
    }


@settings(max_examples=12, deadline=None)
@given(_OPS)
def test_cdc_apply_matches_reference(spark, ops):
    # seq must be a unique tiebreak (like o_orderkey); force uniqueness.
    rows = [
        (k, ts, i, op, v) for i, (k, ts, _s, op, v) in enumerate(ops)
    ]
    df = spark.createDataFrame(
        rows, "key long, ts long, seq long, op string, val long"
    )
    wk = W.partitionBy("key")
    out = (
        df.withColumn(
            "rn",
            F.row_number().over(
                wk.orderBy(F.col("ts").desc(), F.col("seq").desc())
            ),
        )
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select("key", "ts", "seq", "val")
        .collect()
    )
    got = {r["key"]: (r["ts"], r["seq"], r["val"]) for r in out}
    assert got == _py_apply(rows)
