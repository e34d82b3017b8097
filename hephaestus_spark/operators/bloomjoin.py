"""Bloom-filter semi-join pruning (join-side reduction).

The scale pattern: a selective dimension predicate should shrink the
FACT side before the join shuffle, but when the filtered dimension is
still too large (or too wide) to broadcast as a hash relation, Spark
plans a shuffle join and every fact row pays the shuffle. A Bloom
filter of the dimension keyset is orders of magnitude smaller than the
keyset itself (~10 bits/key at 1% false-positive rate), cheap to
broadcast, and prunes the fact scan down to ~|matching| + fpp*|fact|
rows BEFORE the shuffle — the classic semi-join reduction
(Spark's own runtime InjectRuntimeFilter does the same internally; the
`bloom_filter_agg` expression is not SQL-registered, so this builds the
filter from public built-ins).

Everything stays JVM-side and declarative:
- build: k salted xxhash64 positions per key -> bit_or-aggregated
  64-bit words -> ONE row holding a map<word_idx, word>. No driver
  collect; the single row is broadcast by the planner.
- probe: crossJoin(broadcast(bloom_row)) + a conjunction of
  element_at/bit tests — whole-stage-codegen'd scan-side filter.

Bloom membership is probabilistic (false positives only), so callers
keep the exact join AFTER the prune; results are exact regardless of
fpp, the filter only changes how much data reaches the shuffle.

Sizing: for n keys and target false-positive rate p,
m = -n*ln(p)/ln(2)^2 bits and k = (m/n)*ln(2) hashes
(standard Bloom calculus; e.g. p=0.01 -> ~9.6 bits/key, k=7).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOOM_COL = "_bloom_words"


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits, n_hashes) for an expected keyset size and target fpp."""
    n_keys = max(n_keys, 1)
    n_bits = max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    n_hashes = max(1, round(n_bits / n_keys * math.log(2)))
    return n_bits, n_hashes


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k deterministic bit positions per key: salted xxhash64, pmod'd
    into the bit space (pmod, not %, so negative hashes land in range)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, n_bits: int, n_hashes: int
) -> DataFrame:
    """Aggregate a key column into a one-row Bloom bitmap.

    Shape: explode each key into its k bit positions, bit_or the
    per-word masks (partial agg combines map-side), assemble the sparse
    word map. The single output row is what gets broadcast — never the
    keyset."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), n_bits, n_hashes))).alias("pos")
    )
    # call_function: the F.shiftleft wrapper only takes a Python int for
    # numBits; the SQL function itself accepts a column.
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), (F.col("pos") % 64).cast("int")
    )
    words = (
        pos.select((F.col("pos") / 64).cast("int").alias("word_idx"), mask.alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    return words.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias(
            _BLOOM_COL
        )
    )


def bloom_might_contain(key: Column, n_bits: int, n_hashes: int) -> Column:
    """Membership test against the broadcast `_bloom_words` map column:
    every one of the k salted positions must have its bit set. Missing
    words (element_at -> NULL) mean no bit in that word was ever set."""
    cond = F.lit(True)
    for pos in _positions(key, n_bits, n_hashes):
        # element_at on a MAP is key lookup (1-based indexing applies
        # only to arrays) — probe with the stored word_idx key itself.
        word = F.coalesce(
            F.element_at(F.col(_BLOOM_COL), (pos / 64).cast("int")),
            F.lit(0).cast("bigint"),
        )
        cond = cond & (
            F.call_function("shiftright", word, (pos % 64).cast("int")).bitwiseAND(
                F.lit(1)
            )
            == 1
        )
    return cond


def bloom_prune(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    expected_keys: int,
    fpp: float = 0.01,
) -> DataFrame:
    """Filter `fact` to rows whose key is probably in `dim_keys`.

    Returns a superset of the true semi-join (false positives only);
    compose with the exact join for exact results. The bloom row rides
    in via broadcast crossJoin, so the fact side sees one scan + one
    codegen'd filter, no shuffle."""
    n_bits, n_hashes = bloom_params(expected_keys, fpp)
    bloom = bloom_build(dim_keys, dim_key, n_bits, n_hashes)
    pruned = fact.crossJoin(F.broadcast(bloom)).filter(
        bloom_might_contain(F.col(fact_key), n_bits, n_hashes)
    )
    return pruned.drop(_BLOOM_COL)
