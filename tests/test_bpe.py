"""BPE tokenizer training (operators/bpe.py): the driver-side
incremental trainer, the distributed round-loop fallback, and a naive
from-the-paper reference must all learn the SAME merge sequence; plus
segmentation properties on the learned table."""

from __future__ import annotations

import duckdb
import pytest

from hephaestus_spark.operators.bpe import (
    EOW,
    segment_with_merges,
    train_bpe,
    train_bpe_distributed,
    word_type_table,
)
from hephaestus_spark.sources import load_table


def _naive_reference(word_counts: dict[str, int], n_merges: int):
    """Sennrich's algorithm exactly as published: full recount every
    round, no incremental bookkeeping — deliberately different code
    from BOTH production paths."""
    vocab = {tuple(list(w) + [EOW]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms, c in vocab.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        (left, right), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((left, right, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_trainer_matches_naive_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = train_bpe(spark, docs, n_merges=12)
    # independent word counts via DuckDB, same normalization
    wc = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""
            SELECT w, CAST(count(*) AS BIGINT) FROM (
              SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
              FROM '{sf_dir}/documents.parquet'
            ) WHERE w != '' GROUP BY w
            """
        ).fetchall()
    }
    want = _naive_reference(wc, 12)
    assert got == want, (got[:5], want[:5])


def test_distributed_rounds_match_driver_trainer(spark, sf_dir):
    """Same algorithm at two altitudes: the per-round Spark-job
    fallback must learn the identical sequence (a few merges — each
    distributed round costs ~3 jobs of overhead)."""
    docs = load_table(spark, sf_dir, "documents").limit(60)
    assert train_bpe_distributed(spark, docs, n_merges=4) == train_bpe(
        spark, docs, n_merges=4
    )


def test_word_table_is_the_only_corpus_shuffle(spark, sf_dir):
    plan = word_type_table(
        load_table(spark, sf_dir, "documents")
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial+final agg exchange only


def test_segmentation_round_trips_and_respects_merges(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges = [(l, r) for l, r, _ in train_bpe(spark, docs, n_merges=16)]
    for word in ["the", "tokenizer", "networks", "a", "zzzzq"]:
        segs = segment_with_merges(word, merges)
        # lossless: concatenating segments recovers the word + sentinel
        assert "".join(segs) == word + EOW
        # learned merges genuinely compress common words
    assert len(segment_with_merges("the", merges)) < len("the") + 1


def test_empty_and_degenerate_corpora(spark):
    df = spark.createDataFrame([("",), ("!!!",)], "text string")
    assert train_bpe(spark, df, n_merges=5) == []
    one = spark.createDataFrame([("aaa aaa",)], "text string")
    merges = train_bpe(spark, one, n_merges=5)
    assert merges and merges[0][:2] == ("a", "a")


def test_distributed_encode_matches_driver_segmentation(spark, sf_dir):
    import re

    docs = load_table(spark, sf_dir, "documents").limit(50)
    from hephaestus_spark.operators.bpe import encode_with_merges

    merges = [(l, r) for l, r, _ in train_bpe(spark, docs, n_merges=10)]
    got = {
        r["doc_id"]: (r["n_words"], r["n_subword_tokens"], r["n_chars_seen"])
        for r in encode_with_merges(docs, merges).collect()
    }
    token_re = re.compile(r"[a-z]+")
    for row in docs.collect():
        words = token_re.findall(row["text"].lower())
        want = (
            len(words),
            sum(len(segment_with_merges(w, merges)) for w in words),
            sum(len(w) for w in words),
        )
        assert got[row["doc_id"]] == want, row["doc_id"]
        # merged subwords never exceed characters (+EOW per word)
        n_words, n_tok, n_chars = want
        assert n_tok <= n_chars + n_words
