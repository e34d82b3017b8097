"""Training-set assembly operators: sequence packing and negative
sampling — the last mile between a curated corpus and a training run.

Both are pure integer/window plans (no UDF, no driver loop) and both
are oracle-checked: all arithmetic is engine-independent by
construction (window sums of integers; Knuth-style multiplicative
hashes spelled out as plain bigint math in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from hephaestus_spark.registry import query
from hephaestus_spark.sources import load_table

# Whitespace token count — matches x_token_count's convention.
_NTOK = "size(filter(split(text, '\\\\s+'), t -> t <> ''))"
_NTOK_DUCK = "len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))"

_CTX = 2048  # pack context length (tokens)
_SHARDS = 8


@query(
    "x_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, doc_id % {_SHARDS} AS shard,
             CAST({_NTOK_DUCK} AS BIGINT) AS n_tok
      FROM documents
    ), runs AS (
      SELECT doc_id, shard, n_tok,
             sum(n_tok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tok AS start_tok
      FROM toks
    )
    SELECT doc_id, shard, n_tok,
           CAST(start_tok // {_CTX} AS BIGINT) AS pack_id,
           CAST(start_tok % {_CTX} AS BIGINT) AS pack_offset
    FROM runs
    """,
)
def x_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents into fixed-length
    training contexts (the standard streaming-concat packing every LLM
    data loader applies — docs are laid end-to-end per shard and cut
    into CTX-token windows; a doc starting in pack k at offset o may
    spill into k+1, which the loader handles with attention-mask
    resets).

    Why this shape at 100 TB: optimal bin packing is inherently
    sequential, but streaming-concat packing is embarrassingly
    parallel ACROSS shards — each shard's layout is one ordered
    running sum (a single window over the shard partition), shards
    never communicate, and the result is bit-deterministic given the
    (shard, doc_id) order. Wasted tokens vs optimal packing is
    bounded by the tail of each context, which at CTX=2048 and
    typical doc lengths is a few percent — the standard trade.

    All outputs are integers (token counts, integer div/mod): exact
    in both engines with zero tolerance machinery.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % _SHARDS).alias("shard"),
        F.expr(_NTOK).cast("bigint").alias("n_tok"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    runs = toks.withColumn("start_tok", F.sum("n_tok").over(w) - F.col("n_tok"))
    return runs.select(
        "doc_id",
        "shard",
        "n_tok",
        F.expr(f"div(start_tok, {_CTX})").alias("pack_id"),
        (F.col("start_tok") % _CTX).alias("pack_offset"),
    )


_K_NEG = 4
# Knuth multiplicative constants — plain bigint math, identical in both
# engines (same trick as operators/curation.py::hash_sample).
_MUL = 2654435761
_STEP = 40503
_OFF = 12345


@query(
    "x_negative_sampling",
    oracle=f"""
    WITH idx AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM documents
    ), cand AS (
      SELECT i.doc_id, i.idx, u.rank,
             (i.doc_id * {_MUL} + u.rank * {_STEP} + {_OFF}) % i.n AS partner_idx
      FROM idx i, UNNEST([0, 1, 2, 3]) AS u(rank)
    )
    SELECT c.doc_id, c.rank AS neg_rank, p.doc_id AS neg_doc_id
    FROM cand c JOIN idx p ON p.idx = c.partner_idx
    WHERE c.partner_idx <> c.idx
    """,
)
def x_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling: k pseudo-random partner
    documents per document (contrastive/retrieval training pairs),
    without randomness — partner index = (doc_id * A + rank * B + C)
    mod N over a dense row-number index, so the sample is reproducible
    across engines, runs, AND partitionings (df.sample is none of
    those). Self-pairs are dropped (k effective negatives may be k-1
    for the ~k/N docs that hash to themselves — the standard accept).

    Scale shape: the dense index is one window over doc_id — at 100 TB
    you'd zipWithIndex-per-partition or reuse a maintained id map, and
    the docstring's arithmetic is unchanged; the partner lookup is one
    keyed equi-join on the index (uniformly distributed by
    construction, no skew), k rows per doc via a literal explode, no
    cartesian anywhere.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = d.count()  # dimension-sized scalar; at scale: a maintained count
    wi = W.orderBy("doc_id")
    idx = d.select(
        "doc_id", (F.row_number().over(wi) - 1).cast("bigint").alias("idx")
    )
    cand = idx.select(
        "doc_id",
        "idx",
        F.explode(F.array(*[F.lit(i) for i in range(_K_NEG)])).alias("rank"),
    ).withColumn(
        "partner_idx",
        (F.col("doc_id") * _MUL + F.col("rank") * _STEP + _OFF) % F.lit(n),
    )
    p = idx.select(F.col("idx").alias("partner_idx"), F.col("doc_id").alias("neg_doc_id"))
    return (
        cand.filter(F.col("partner_idx") != F.col("idx"))
        .join(p, "partner_idx")
        .select("doc_id", F.col("rank").alias("neg_rank"), "neg_doc_id")
    )
