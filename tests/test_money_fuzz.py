"""Property tests for the scaled-long exact-sum machinery
(functions/money.py) — the r5 replacement for decimal accumulation.

The claim under test: for any values that are EXACT dp-decimal numbers
(stored as their nearest doubles), ``floor(x * 10^dp + 0.5)`` recovers
the true scaled integer for every element, so the sum is exact and
order-independent, and equals the DECIMAL-arithmetic ground truth.

Hypothesis drives the per-element recovery property through millions of
adversarial values in pure Python (same IEEE ops as the JVM); one Spark
case then checks the column expression end-to-end against
decimal.Decimal ground truth on an adversarial fixture (boundary cents,
signs, magnitudes), including grouped sums under shuffled row order.
"""

from __future__ import annotations

import math
import random
from decimal import Decimal

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F
from hephaestus_spark.functions.money import scaled_long, sum_money


def _py_scaled(x: float, dp: int) -> int:
    # The exact Python mirror of F.floor(col * 10^dp + 0.5): Spark's
    # floor(double) and Python's math.floor compute the same IEEE op.
    return math.floor(x * (10 ** dp) + 0.5)


@given(
    cents=st.integers(min_value=-(10 ** 13), max_value=10 ** 13),
)
@settings(max_examples=2000, deadline=None)
def test_two_dp_recovery(cents):
    """Any 2dp value up to 1e11 in magnitude round-trips exactly
    through its double representation (money.py's headroom bound)."""
    x = cents / 100.0  # nearest double to the true decimal
    assert _py_scaled(x, 2) == cents


@given(
    a=st.integers(min_value=-(10 ** 7), max_value=10 ** 7),
    b=st.integers(min_value=0, max_value=10),
)
@settings(max_examples=2000, deadline=None)
def test_four_dp_product_recovery(a, b):
    """price * (1 - discount) with 2dp price (a/100) and 2dp discount
    (b/100): the product is an exact 4dp decimal; the computed DOUBLE
    carries rounding error well inside the 0.5 window, so the scaled
    long is the true 4dp integer."""
    price = a / 100.0
    disc = b / 100.0
    true_4dp = a * (100 - b)  # (a/100)*(1 - b/100)*10^4 exactly
    assert _py_scaled(price * (1 - disc), 4) == true_4dp


def test_sum_money_matches_decimal_ground_truth(spark):
    """End-to-end on Spark: grouped sum_money over an adversarial
    fixture equals Decimal arithmetic, independent of row order."""
    rng = random.Random(7)
    rows = []
    # boundary-heavy cents: .005-adjacent values, max magnitudes, signs
    interesting = [1, -1, 5, -5, 49, 50, 51, 99, 100, 101, 999999999]
    for i in range(4000):
        cents = rng.choice(
            [rng.randint(-10**9, 10**9)] + interesting
        ) * rng.choice([1, -1])
        rows.append((i % 7, cents))
    rng.shuffle(rows)
    truth = {}
    for g, cents in rows:
        truth[g] = truth.get(g, Decimal(0)) + Decimal(cents) / Decimal(100)
    df = spark.createDataFrame(
        [(g, cents / 100.0) for g, cents in rows], "g int, x double"
    )
    got = {
        r.g: r.s
        for r in df.groupBy("g").agg(sum_money(F.col("x")).alias("s")).collect()
    }
    for g, dec in truth.items():
        assert got[g] == float(dec), (g, got[g], dec)


def test_scaled_long_column_matches_python_mirror(spark):
    """The Spark column expression and the Python mirror agree
    element-wise (same IEEE floor) on adversarial values."""
    vals = [v / 100.0 for v in range(-500, 500)] + [
        10**11 / 100.0,
        -(10**11) / 100.0,
        0.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r.c for r in df.select(scaled_long(F.col("x")).alias("c")).collect()
    ]
    assert got == [_py_scaled(v, 2) for v in vals]
