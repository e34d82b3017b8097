"""Training-data curation operators: chunking and deterministic sampling.

A pretraining pipeline's last mile is turning cleaned documents into
model-ready pieces: fixed-token-window chunks (with overlap so context
isn't severed at boundaries) and reproducible subsampling for
ablations/holdouts. Both are pure column expressions — no UDFs, no
collect — so they run scan-side at any scale.

Reference parity: no counterpart in /root/reference (an ETL sync
service); these are north-star LLM-pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_size`` tokens, sliding by ``chunk_size - overlap``.

    Emits (all input columns except the text, chunk_id, chunk_tokens,
    chunk_text). Every document yields >= 1 chunk (short docs pass
    through whole). The explode multiplies rows ~n_tokens/stride x — at
    100 TB that's fine because it's a narrow map-side transform: no
    shuffle, and downstream writes split files via maxRecordsPerFile.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")
    n = F.size(toks)
    last_idx = F.greatest(
        (F.ceil((n - F.lit(overlap)) / F.lit(stride)) - 1).cast("int"), F.lit(0)
    )
    carry = [c for c in df.columns if c != text_col]
    chunked = (
        df.withColumn("_toks", toks)
        .withColumn("_i", F.explode(F.sequence(F.lit(0), last_idx)))
        .withColumn(
            "_chunk", F.slice(F.col("_toks"), F.col("_i") * stride + 1, chunk_size)
        )
    )
    return chunked.select(
        *carry,
        F.col("_i").cast("bigint").alias("chunk_id"),
        F.size("_chunk").cast("bigint").alias("chunk_tokens"),
        F.concat_ws(" ", F.col("_chunk")).alias("chunk_text"),
    )


def hash_sample_pred(
    key: Column | str,
    fraction: float,
    modulus: int = 4_294_967_296,
    multiplier: int = 2_654_435_761,
) -> Column:
    """Deterministic sampling predicate via a Knuth multiplicative hash.

    Unlike ``df.sample`` (seed + partition-layout dependent, so not
    reproducible across engines or repartitionings) this is a pure
    arithmetic function of the key: the SAME rows are selected on any
    engine, any partitioning, any day — which is what makes ablation
    subsets and holdouts auditable.

    Correct over the FULL int64 key domain: the key is split into two
    31-bit halves via mask/shift (bitwise ops agree across engines even
    for negative two's-complement values), each half's product stays
    far below int64 overflow, and pmod keeps the residue non-negative —
    a plain ``%`` would go negative for negative keys and silently
    select 100% of them."""
    k = F.col(key) if isinstance(key, str) else key
    low = k.bitwiseAND(F.lit(2147483647))
    high = F.shiftright(k, 31).bitwiseAND(F.lit(2147483647))
    mixed = F.pmod(low * F.lit(multiplier) + high * F.lit(40503), F.lit(modulus))
    return mixed < F.lit(int(fraction * modulus))


def hash_sample(
    df: DataFrame,
    key: str,
    fraction: float,
    by: dict[str, float] | None = None,
    strata_col: str | None = None,
) -> DataFrame:
    """Filter to a deterministic ``fraction`` of rows by ``key``.

    With ``by`` + ``strata_col``, per-stratum fractions (e.g. language
    rebalancing: {"en": 0.1, "de": 0.5}); strata absent from the map
    fall back to ``fraction``."""
    if by is None:
        return df.filter(hash_sample_pred(key, fraction))
    pred = F.lit(None).cast("boolean")
    expr = None
    for stratum, frac in sorted(by.items()):
        cond = F.col(strata_col) == stratum
        branch = hash_sample_pred(key, frac)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    pred = expr.otherwise(hash_sample_pred(key, fraction))
    return df.filter(pred)


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight: str | Column,
    k: int,
    modulus: int = 4_294_967_296,
    multiplier: int = 2_654_435_761,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each row gets sort key ln(u)/w with u a
    deterministic uniform from the same engine-independent mixed hash
    as hash_sample_pred, and the k LARGEST keys are the sample —
    selection probability proportional to weight, reproducible on any
    engine/partitioning (no RNG state, no seed plumbing).

    At scale this is a TakeOrderedAndProject (per-partition heap of k,
    driver merges k rows per partition) — one pass, no global sort, no
    shuffle of the data itself. The classic distributed reservoir
    without coordination."""
    kcol = F.col(key)
    low = kcol.bitwiseAND(F.lit(2147483647))
    high = F.shiftright(kcol, 31).bitwiseAND(F.lit(2147483647))
    mixed = F.pmod(low * F.lit(multiplier) + high * F.lit(40503), F.lit(modulus))
    u = (mixed.cast("double") + 0.5) / F.lit(float(modulus))
    w = F.col(weight) if isinstance(weight, str) else weight
    skey = F.log(u) / w.cast("double")
    return (
        df.withColumn("_es_key", skey)
        .orderBy(F.col("_es_key").desc(), kcol.asc())
        .limit(k)
        .drop("_es_key")
    )
