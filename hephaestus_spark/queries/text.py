"""Text-analysis queries: SURVEY.md §2.B Q31–Q32 plus the training-data
extensions (token counting, quality scoring, language-ID heuristic,
document fingerprinting) over the `documents` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from hephaestus_spark.registry import query
from hephaestus_spark.sources import load_table

# Shared normalization (must match operators/textops.py and the DuckDB
# spelling below — DuckDB needs the 'g' flag, Spark replaces all by default).
_TOKENS = "filter(split(regexp_replace(lower(text), '[^a-z ]', ' '), ' '), t -> t <> '')"
_TOKENS_DUCK = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' '),"
    " t -> t <> '')"
)


# --------------------------------------------------------------------------
# Q31 — text statistics + top tokens per language
# --------------------------------------------------------------------------
@query(
    "q31_lang_stats",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, avg(n_chars) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def q31_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.avg("n_chars").alias("avg_chars")
    )


@query(
    "q31_top_tokens",
    oracle=f"""
    WITH tok AS (
      SELECT lang, UNNEST({_TOKENS_DUCK}) AS token FROM documents
    ),
    counted AS (
      SELECT lang, token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY lang, token
    )
    SELECT lang, token, n FROM (
      SELECT lang, token, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rn
      FROM counted
    ) WHERE rn <= 20
    """,
)
def q31_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens per language, deterministic tiebreak (count desc,
    token asc). explode -> two-level agg (map-side combine carries only
    (lang, token) partials). The ranking runs as a two-phase salted
    top-k (operators/topk.py): `lang` has a handful of values, so a
    plain per-lang window would sort each language's whole vocabulary
    in ONE task at corpus scale — the salted phase bounds every sort at
    vocab/salt_n and stays exact."""
    from hephaestus_spark.operators.topk import topk_per_group

    # r15 negative result (guide §2.5 measured, not assumed): spreading
    # the scan by doc_id LOST the interleaved A/B here (0.59 -> 0.97 s
    # median) — the single-task map stage already collapses explode
    # output to tiny (lang, token) partials before its exchange, so the
    # extra text shuffle + stage sync cost more than the serial
    # tokenize it parallelized. Left as a plain scan deliberately.
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.expr(_TOKENS)).alias("token"))
    counted = tok.groupBy("lang", "token").agg(F.count("*").alias("n"))
    return topk_per_group(
        counted, ["lang"], [F.col("n").desc(), F.col("token").asc()], k=20
    ).select("lang", "token", "n")


# --------------------------------------------------------------------------
# Q32 — exact dedup by content hash
# --------------------------------------------------------------------------
# The driver corpus has no exact duplicates, so both engines synthesize
# the same enlarged corpus: a copy of every doc_id % 10 == 0 document
# re-ingested under a new id (the "same text crawled twice" case).
_DUP_CORPUS_DUCK = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return d.union(dup)


@query(
    "q32_exact_dedup",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_DUCK})
    SELECT sha256(text) AS text_hash,
           CAST(count(*) AS BIGINT) AS n_copies,
           min(doc_id) AS canonical_id
    FROM corpus
    GROUP BY sha256(text)
    HAVING count(*) > 1
    """,
)
def q32_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on sha2(text). One shuffle keyed on the
    content hash; at 100 TB you'd bucket the corpus by this hash so
    re-dedup after every ingest is shuffle-free."""
    corpus = _dup_corpus(spark, sf_dir)
    return (
        corpus.groupBy(F.sha2("text", 256).alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_copies") > 1)
    )


@query(
    "q32_dedup_keep_canonical",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_DUCK})
    SELECT doc_id FROM (
      SELECT doc_id, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
      FROM corpus
    ) WHERE rn = 1
    """,
)
def q32_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup *apply* step: keep min(doc_id) per content hash."""
    corpus = _dup_corpus(spark, sf_dir)
    w = W.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    return (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )


# --------------------------------------------------------------------------
# x — token counting (whitespace + BPE-ish regex)
# --------------------------------------------------------------------------
@query(
    "x_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
                AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
)
def x_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split, and a BPE-ish regex
    (letter runs / digit runs / single punctuation) — the cheap proxies a
    training pipeline uses for budget estimates before real tokenization."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("size(filter(split(text, '\\\\s+'), t -> t <> ''))")
        .cast("bigint")
        .alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
    )


# --------------------------------------------------------------------------
# x — quality scoring
# --------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")
_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@query(
    "x_quality_score",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_raw,
             CAST(len({_TOKENS_DUCK}) AS BIGINT) AS n_words,
             CAST(len(list_filter({_TOKENS_DUCK}, t -> t IN ({_STOP_LIST_SQL})))
                  AS BIGINT) AS stop_hits,
             CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS BIGINT) AS punct_chars
      FROM documents
    )
    SELECT doc_id, n_chars_raw, n_words,
           stop_hits  * 1.0 / greatest(n_words, 1)     AS stopword_ratio,
           punct_chars * 1.0 / greatest(n_chars_raw, 1) AS punct_ratio,
           (n_words >= 10 AND stop_hits * 1.0 / greatest(n_words,1) BETWEEN 0.01 AND 0.6
            AND punct_chars * 1.0 / greatest(n_chars_raw,1) < 0.2) AS passes_quality
    FROM feat
    """,
)
def x_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality gate (length / stopword ratio / punct
    ratio) — the C4/Gopher-style filters, as one codegen projection."""
    # r15 negative result: spread_scan(d, "doc_id") A/B'd a wash here
    # (median 0.44 -> 0.40 s but MIN 0.33 -> 0.37 — inside noise, and
    # the extra exchange buys nothing at scale where the scan splits).
    # Stays a pure scan-side projection: one pass, zero shuffle.
    d = load_table(spark, sf_dir, "documents")
    feat = d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_raw"),
        F.expr(f"size({_TOKENS})").cast("bigint").alias("n_words"),
        F.expr(f"size(filter({_TOKENS}, t -> t IN ({_STOP_LIST_SQL})))")
        .cast("bigint")
        .alias("stop_hits"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^a-z0-9\s]"), F.lit(0)))
        .cast("bigint")
        .alias("punct_chars"),
    )
    nw = F.greatest(F.col("n_words"), F.lit(1))
    nc = F.greatest(F.col("n_chars_raw"), F.lit(1))
    stop_ratio = F.col("stop_hits") * 1.0 / nw
    punct_ratio = F.col("punct_chars") * 1.0 / nc
    return feat.select(
        "doc_id",
        "n_chars_raw",
        "n_words",
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        (
            (F.col("n_words") >= 10)
            & stop_ratio.between(0.01, 0.6)
            & (punct_ratio < 0.2)
        ).alias("passes_quality"),
    )


# --------------------------------------------------------------------------
# x — language-ID heuristic (stopword n-gram voting)
# --------------------------------------------------------------------------
_LANG_STOPS = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
}


def _hits_sql(tokens_expr: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"size(list_filter({tokens_expr}, t -> t IN ({lst})))" if "list_filter" in tokens_expr else ""


@query(
    "x_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS labeled_lang,
             CAST(len(list_filter({_TOKENS_DUCK}, t -> t IN ('the','and','of','to','a','is'))) AS BIGINT) AS hits_en,
             CAST(len(list_filter({_TOKENS_DUCK}, t -> t IN ('der','die','das','und','ist','nicht'))) AS BIGINT) AS hits_de,
             CAST(len(list_filter({_TOKENS_DUCK}, t -> t IN ('le','la','les','et','est','une'))) AS BIGINT) AS hits_fr
      FROM documents
    )
    SELECT doc_id, labeled_lang, hits_en, hits_de, hits_fr,
           CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
                WHEN hits_de >= hits_fr THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM scored
    """,
)
def x_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-voting language ID (n-gram heuristic family). Ties break
    en > de > fr deterministically. A real deployment swaps the word
    lists for char-trigram tables; the plan shape is identical."""
    d = load_table(spark, sf_dir, "documents")

    def hits(words: tuple[str, ...]):
        lst = ", ".join(f"'{w}'" for w in words)
        return F.expr(f"size(filter({_TOKENS}, t -> t IN ({lst})))").cast("bigint")

    scored = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        hits(_LANG_STOPS["en"]).alias("hits_en"),
        hits(_LANG_STOPS["de"]).alias("hits_de"),
        hits(_LANG_STOPS["fr"]).alias("hits_fr"),
    )
    return scored.select(
        "*",
        F.when(
            (F.col("hits_en") >= F.col("hits_de")) & (F.col("hits_en") >= F.col("hits_fr")),
            F.lit("en"),
        )
        .when(F.col("hits_de") >= F.col("hits_fr"), F.lit("de"))
        .otherwise(F.lit("fr"))
        .alias("predicted_lang"),
    )


# --------------------------------------------------------------------------
# x — document fingerprint (rolling min-hash over char 8-grams)
# --------------------------------------------------------------------------
@query(
    "x_fingerprint",
    oracle="""
    SELECT doc_id,
           min(sha256(substr(text, CAST(i AS INTEGER), 8))) AS fingerprint
    FROM documents, UNNEST(range(1, greatest(length(text) - 6, 2))) AS t(i)
    GROUP BY doc_id
    """,
)
def x_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min content hash over all 8-char
    windows. Per-row explode + min re-agg — embarrassingly parallel, and
    the fingerprint column then drives exact-ish dedup joins at scale."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr("sequence(1, greatest(length(text) - 7, 1))")
        ).alias("i"),
        "text",
    ).select("doc_id", F.sha2(F.expr("substring(text, i, 8)"), 256).alias("h"))
    return grams.groupBy("doc_id").agg(F.min("h").alias("fingerprint"))


# --------------------------------------------------------------------------
# x — multimodal plumbing (binary columns + mapInPandas feature stub)
# --------------------------------------------------------------------------
@query(
    "x_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CASE (doc_id % 3) + 1 WHEN 1 THEN 'image/png'
                                 WHEN 2 THEN 'audio/wav'
                                 ELSE 'video/mp4' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           sha256(text) AS sha
    FROM documents
    """,
)
def x_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata surface (size/hash/type) — the part of the
    multimodal path that is pure Spark and oracle-checkable. The decode
    stage itself is a mapInPandas stub (operators/multimodal.py)."""
    from hephaestus_spark.operators.multimodal import synthesize_media

    d = load_table(spark, sf_dir, "documents")
    return synthesize_media(d).select("doc_id", "media_type", "byte_len", "sha")


@query(
    "x_multimodal_features",
    oracle="""
    SELECT doc_id, 'audio/wav' AS media_type,
           CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
           CAST(1 + (doc_id // 2) % 2 AS INT) AS n_channels,
           CAST(8000 + (doc_id % 5) * 2000 AS INT) AS sample_rate,
           CAST(50 + n_chars % 200 AS INT) AS n_frames,
           CAST((50 + n_chars % 200) * 1000
                // (8000 + (doc_id % 5) * 2000) AS BIGINT) AS duration_ms,
           CAST((50 + n_chars % 200) * (1 + (doc_id // 2) % 2) * 2
                AS BIGINT) AS payload_bytes
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, 'image/bmp',
           CAST(8 + doc_id % 32 AS INT), CAST(4 + n_chars % 32 AS INT),
           NULL, NULL, NULL, NULL,
           CAST((((8 + doc_id % 32) * 3 + 3) // 4) * 4
                * (4 + n_chars % 32) AS BIGINT)
    FROM documents WHERE doc_id % 2 = 1
    """,
)
def x_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stdlib decode over binary payloads (r6 upgrade from the
    rows-only fake-codec stub): even docs become genuine RIFF/WAVE
    containers, odd docs genuine 24-bpp BMPs — both synthesized with a
    hand-rolled struct writer and decoded by an INDEPENDENT parser (the
    stdlib ``wave`` module / header struct-unpack), Arrow-batched via
    mapInPandas (operators/multimodal.py). The oracle states every
    decoded field as arithmetic over the documents table, so a header
    layout or endianness bug on either side breaks the hash. The
    NotImplementedError stub remains only for MP4 (PNG and JPEG are
    real decodes too — x_multimodal_png_decode /
    x_multimodal_jpeg_decode). Scale shape: pure map-side, no
    shuffle."""
    from hephaestus_spark.operators.multimodal import (
        decode_bmp_features,
        decode_wav_features,
        synthesize_bmp_media,
        synthesize_wav_media,
    )

    d = load_table(spark, sf_dir, "documents")
    wav = decode_wav_features(
        synthesize_wav_media(d.filter(F.col("doc_id") % 2 == 0))
    ).select(
        "doc_id",
        F.lit("audio/wav").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        "n_channels",
        "sample_rate",
        "n_frames",
        "duration_ms",
        F.col("pcm_bytes").alias("payload_bytes"),
    )
    bmp = decode_bmp_features(
        synthesize_bmp_media(d.filter(F.col("doc_id") % 2 == 1))
    ).select(
        "doc_id",
        F.lit("image/bmp").alias("media_type"),
        "width",
        "height",
        F.lit(None).cast("int").alias("n_channels"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
        F.lit(None).cast("bigint").alias("duration_ms"),
        F.col("pixel_bytes").alias("payload_bytes"),
    )
    return wav.unionByName(bmp)


@query(
    "x_multimodal_png_decode",
    oracle="""
    SELECT doc_id,
           CAST(4 + doc_id % 24 AS INT) AS width,
           CAST(3 + n_chars % 21 AS INT) AS height,
           CAST(8 AS INT) AS bit_depth,
           CAST(2 AS INT) AS color_type,
           CAST(3 AS INT) AS n_chunks,
           CAST((4 + doc_id % 24) * 3 * (3 + n_chars % 21) AS BIGINT)
             AS pixel_bytes,
           TRUE AS pixels_roundtrip
    FROM documents
    """,
)
def x_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-format decode (VERDICT r6 item 5): every document
    becomes a genuine PNG — zlib-deflated IDAT of per-row-filtered RGB
    scanlines — and is decoded by an INDEPENDENT from-the-spec reader:
    hand-built CRC-32 chunk verification, a hand-rolled RFC 1950/1951
    inflate (stored/fixed/dynamic-Huffman blocks, adler32 trailer), and
    PNG unfiltering (operators/multimodal.py). ``pixels_roundtrip``
    compares sha256 of the RECOVERED pixels against the sha of the
    pre-compression bytes recomputed from the text by a separate map op
    — computed in-query, so the oracle hash pins it TRUE for every doc
    (the q26 tolerance-boolean pattern). The header fields are stated
    arithmetically by the oracle. Scale shape: two shuffle-free
    mapInPandas lanes + one doc_id equi-join (co-partitioned, and
    broadcastable when the decode side is the big one)."""
    from hephaestus_spark.operators.multimodal import (
        decode_png_features,
        synthesize_png_media,
    )

    d = load_table(spark, sf_dir, "documents")
    decoded = decode_png_features(synthesize_png_media(d))

    def expected_op(batches):
        import hashlib

        import pandas as pd

        from hephaestus_spark.operators.multimodal import (
            _png_params,
            _png_pixels,
        )

        for pdf in batches:
            shas = [
                hashlib.sha256(
                    _png_pixels(text, *_png_params(int(doc_id), int(n_chars)))
                ).hexdigest()
                for doc_id, text, n_chars in zip(
                    pdf["doc_id"], pdf["text"], pdf["n_chars"]
                )
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "expected_sha": shas}
            )

    expected = d.select("doc_id", "text", "n_chars").mapInPandas(
        expected_op, schema="doc_id long, expected_sha string"
    )
    return decoded.join(expected, "doc_id").select(
        "doc_id",
        "width",
        "height",
        "bit_depth",
        "color_type",
        "n_chunks",
        "pixel_bytes",
        (F.col("pixel_sha") == F.col("expected_sha")).alias("pixels_roundtrip"),
    )


@query(
    "x_multimodal_jpeg_decode",
    oracle="""
    SELECT doc_id,
           CAST(4 + doc_id % 12 AS INT) AS width,
           CAST(3 + n_chars % 11 AS INT) AS height,
           CAST(3 AS INT) AS n_components,
           CASE WHEN doc_id % 2 = 1 THEN '4:2:0' ELSE '4:4:4' END AS sampling,
           TRUE AS coeff_roundtrip,
           TRUE AS err_bounded
    FROM documents
    """,
)
def x_multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG, both halves from scratch (operators/jpegcodec.py
    — the image has no codec library to call): every document is
    encoded to a genuine T.81 baseline JPEG (DCT + Annex-K quant +
    canonical Huffman + byte stuffing) and decoded by the independent
    reader (tables rebuilt from the DHT bytes, own bit reader, IDCT).

    Two pinned booleans (the q26 in-query pattern):
    - ``coeff_roundtrip``: sha256 of the DECODED quantized coefficients
      equals the sha of coefficients recomputed from the source pixels
      by a separate forward pass — the entropy layer (zigzag, DC
      prediction, Huffman, stuffing) is lossless, so TRUE means the
      bitstream round-trips bit-for-bit.
    - ``err_bounded``: reconstructed pixels stay within the
      quantization-loss envelope (max |err| <= 200, mean <= 48 — the
      enforced bounds below; measured on this corpus max |err| tops out
      ~160 and the mean far under the ~85 a scrambled decode produces;
      exact IDCT/color inversion is separately unit-pinned at qt=1 in
      tests/test_jpegcodec.py).

    Scale shape: three shuffle-free mapInPandas lanes + one doc_id
    equi-join feeding a final Arrow compare op."""
    from hephaestus_spark.operators.multimodal import (
        decode_jpeg_features,
        synthesize_jpeg_media,
    )

    d = load_table(spark, sf_dir, "documents")
    decoded = decode_jpeg_features(synthesize_jpeg_media(d))

    def expected_op(batches):
        import hashlib

        import pandas as pd

        from hephaestus_spark.operators.jpegcodec import (
            jpeg_expected_coeff_blob,
        )
        from hephaestus_spark.operators.multimodal import (
            _jpeg_params,
            _jpeg_subsampled,
        )

        for pdf in batches:
            rows = []
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                w, h = _jpeg_params(int(doc_id), int(n_chars))
                need = w * h * 3
                raw = text.encode("utf-8") or b"\x00"
                pixels = (raw * (need // len(raw) + 1))[:need]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "exp_coeff_sha": hashlib.sha256(
                            jpeg_expected_coeff_blob(
                                pixels, w, h,
                                subsample=_jpeg_subsampled(int(doc_id)),
                            )
                        ).hexdigest(),
                        "exp_pixels": pixels,
                    }
                )
            yield pd.DataFrame(rows)

    expected = d.select("doc_id", "text", "n_chars").mapInPandas(
        expected_op, schema="doc_id long, exp_coeff_sha string, exp_pixels binary"
    )

    def compare_op(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                got, want = bytes(r["pixels"]), bytes(r["exp_pixels"])
                errs = [abs(a - b) for a, b in zip(got, want)]
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "width": r["width"],
                        "height": r["height"],
                        "n_components": r["n_components"],
                        "sampling": r["sampling"],
                        "coeff_roundtrip": r["coeff_sha"] == r["exp_coeff_sha"],
                        # 4:2:0 measured like-for-like with 4:4:4 on this
                        # data (max ~117 vs ~110, mean ~28 vs ~24); the
                        # max bound carries slack for tail docs, the mean
                        # is the discriminator (a scrambled decode reads
                        # ~85)
                        "err_bounded": len(got) == len(want)
                        and max(errs) <= 200
                        and sum(errs) * 1000 <= 48_000 * len(errs),
                    }
                )
            yield pd.DataFrame(rows)

    return decoded.join(expected, "doc_id").mapInPandas(
        compare_op,
        schema=(
            "doc_id long, width int, height int, n_components int,"
            " sampling string, coeff_roundtrip boolean, err_bounded boolean"
        ),
    )


@query(
    "x_multimodal_mp4_meta",
    oracle="""
    SELECT doc_id,
           'isom' AS major_brand,
           CAST(10000 + (doc_id % 4) * 5000 AS INT) AS timescale,
           CAST((10 + n_chars % 50) AS BIGINT) * 1000 AS duration_ms,
           CAST(1 AS INT) AS n_tracks,
           CAST(1 AS INT) AS track_id,
           CAST(160 + (doc_id % 8) * 16 AS INT) AS width,
           CAST(120 + (n_chars % 6) * 16 AS INT) AS height,
           'vide' AS handler,
           CAST((10000 + (doc_id % 4) * 5000) * 2 AS INT) AS media_timescale,
           CAST(10 + n_chars % 50 AS INT) AS n_samples,
           CAST(octet_length(encode(text)) AS BIGINT) AS mdat_bytes
    FROM documents
    """,
)
def x_multimodal_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4/ISO-BMFF container parse (r7): every document becomes a
    genuine minimal box tree (ftyp/moov(mvhd,trak(tkhd,mdia(mdhd,hdlr)))
    /mdat) written with struct.pack, and an INDEPENDENT recursive box
    walker recovers brand, movie/media timescales, duration, track
    geometry, handler and payload size — the metadata pass a video
    corpus runs for sharding/triage before any codec work
    (operators/multimodal.py). The codec bitstream inside mdat remains
    the one honestly-stubbed step (H.264/AV1 entropy decode needs a
    codec library this image lacks). Every parsed field is fixed
    arithmetic over (doc_id, n_chars), so the oracle states the full
    decode output. Scale shape: two shuffle-free mapInPandas lanes."""
    from hephaestus_spark.operators.multimodal import (
        decode_mp4_features,
        synthesize_mp4_media,
    )

    d = load_table(spark, sf_dir, "documents")
    return decode_mp4_features(synthesize_mp4_media(d))


# PII scrub: the test corpus is synthetic prose with no PII, so both
# engines inject the same deterministic contact block into every 5th
# document, then redact it — the redaction logic is what's checked.
_PII_BLOCK = " reach me at user<ID>@example.com or +1 555-01<ID>"


@query(
    "x_pii_scrub",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN text || ' reach me at user' || doc_id ||
                       '@example.com or +1 555-01' || doc_id
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text,
             '\\+?[0-9][0-9 -]{6,}[0-9]')) AS BIGINT) AS n_phones
    FROM seeded
    """,
)
def x_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training corpora: replace email addresses and
    phone-number shapes with typed placeholder tokens and count the
    redactions per document (the audit signal a curation pipeline keeps
    even after the raw PII is gone).

    Pure regexp_replace/regexp_extract_all column exprs — scan-side,
    codegen'd, zero shuffle; the patterns are RE2-compatible so the
    DuckDB oracle runs the identical regexes. Reference parity: this is
    the corpus-scale generalization of the reference's per-employee
    email/phone validation (internal/services/employees/employees.go:160-241)."""
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9][0-9 -]{6,}[0-9]"
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach me at user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1 555-01"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit(email_re), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(phone_re), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
    )


@query(
    "x_token_entropy",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_TOKENS_DUCK}) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS cnt
      FROM toks GROUP BY doc_id, token
    ),
    byd AS (
      SELECT doc_id, list_sort(list(cnt)) AS cs, sum(cnt) AS n,
             CAST(count(*) AS BIGINT) AS n_unique
      FROM tf GROUP BY doc_id
    )
    SELECT doc_id,
           -list_sum(list_transform(cs, c -> (c / n) * ln(c / n))) AS entropy,
           n_unique
    FROM byd
    """,
)
def x_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon token entropy per document — the repetition/diversity
    quality signal data-curation filters use (low entropy = boilerplate
    or degenerate repetition). Two keyed aggregations: term frequencies
    on (doc, token), then -sum(p ln p) per doc. Everything is built-in
    column math; shuffle keys are uniform (doc_id, token) hashes.

    Cross-engine discipline (audited r4): a grouped double sum of
    ``p*ln(p)`` terms is order-sensitive, so BOTH engines fold over the
    SORTED per-doc count list left-to-right (Spark ``aggregate`` /
    DuckDB ``list_sum``) — pinning the accumulation order makes the
    emitted double bit-identical. ``n`` is a sum of integral counts
    (exact in double, order-free). The per-doc list is bounded by the
    doc's unique-token count, so collect_list state stays small."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.expr(_TOKENS)).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("cnt")
    )
    byd = tf.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("cnt")).alias("cs"),
        F.sum("cnt").alias("n"),
        F.count("*").cast("bigint").alias("n_unique"),
    )
    entropy = -F.expr(
        "aggregate(cs, CAST(0 AS DOUBLE), (acc, c) -> acc + (c / n) * ln(c / n))"
    )
    return byd.select("doc_id", entropy.alias("entropy"), "n_unique")


@query(
    "x_frame_sample",
    oracle="""
    -- DuckDB cannot slice BLOBs; the corpus is pure ASCII (asserted by
    -- x_dq-style check: octet_length(encode(text)) == length(text) for
    -- every row), so char slicing == byte slicing and the oracle
    -- slices the VARCHAR then encodes.
    WITH f AS (
      SELECT doc_id, text, octet_length(encode(text)) AS bl
      FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) >= 64
    )
    SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
           sha256(substr(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS frame_sha
    FROM f, UNNEST(range(0, bl // 64, 4)) AS t(i)
    """,
)
def x_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling on binary media payloads with REAL byte slicing
    (no stub): treat each 'video' payload as fixed 64-byte frames and
    keep every 4th one — substring on the binary column inside a
    sequence/explode, all JVM-side, zero Python. This is the
    keyframe-subsample shape of video curation: sequence() builds the
    sampled indices WITHOUT materializing unsampled frames, so the
    scan emits len/stride rows per doc, not len rows. Partial trailing
    frames are dropped (bl // 64 full frames)."""
    from hephaestus_spark.operators.multimodal import synthesize_media

    d = load_table(spark, sf_dir, "documents")
    v = (
        synthesize_media(d)
        .filter(F.col("media_type") == "video/mp4")
        .filter(F.col("byte_len") >= 64)
    )
    idx = F.explode(
        F.sequence(
            F.lit(0).cast("bigint"),
            (F.floor(F.col("byte_len") / 64) - 1).cast("bigint"),
            F.lit(4).cast("bigint"),
        )
    ).alias("frame_idx")
    frames = v.select("doc_id", "payload", idx)
    frame = F.expr("substring(payload, CAST(frame_idx * 64 + 1 AS INT), 64)")
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.sha2(frame, 256).alias("frame_sha"),
    )


# --------------------------------------------------------------------------
# r4 curation extensions: repetition stats, benchmark contamination,
# training-mix composition
# --------------------------------------------------------------------------
@query(
    "x_repetition_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_DUCK} AS ts FROM documents
    ),
    grams AS (
      SELECT doc_id, len(ts) AS n_tok,
             list_transform(range(1, greatest(len(ts), 1)),
                            i -> ts[CAST(i AS INTEGER)] || ' ' || ts[CAST(i + 1 AS INTEGER)]) AS gs
      FROM toks
    ),
    gc AS (
      SELECT doc_id, n_tok, g, CAST(count(*) AS BIGINT) AS c
      FROM grams, UNNEST(gs) AS t(g)
      GROUP BY doc_id, n_tok, g
    )
    SELECT doc_id,
           CAST(max(n_tok) AS BIGINT) AS n_tok,
           CAST(max(c) AS DOUBLE) * 2 / max(n_tok) AS top_bigram_frac,
           CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
             / sum(c) AS dup_bigram_frac
    FROM gc GROUP BY doc_id
    """,
)
def x_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (the Gopher/MassiveText rule family):
    per doc, the fraction of tokens covered by its most frequent bigram
    and the fraction of bigram slots occupied by repeated bigrams —
    high values mean boilerplate/degenerate text a curation filter
    drops. One explode + one (doc, gram) agg + one doc agg, all keyed
    shuffles on uniform hash keys; no driver work. Both emitted ratios
    are int/int single IEEE divides — bit-identical across engines
    (COVERAGE.md float-determinism audit: int-exact). Docs shorter
    than 2 tokens emit no bigram rows and are excluded (same rows in
    both engines)."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.size(F.expr(_TOKENS)).alias("n_tok"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size({_TOKENS}) - 1, 1)),"
                f" i -> concat_ws(' ', slice({_TOKENS}, i, 2)))"
            )
        ).alias("g"),
    )
    gc = grams.groupBy("doc_id", "n_tok", "g").agg(F.count("*").alias("c"))
    return gc.groupBy("doc_id").agg(
        F.max("n_tok").cast("bigint").alias("n_tok"),
        (F.max("c").cast("double") * 2 / F.max("n_tok")).alias("top_bigram_frac"),
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("double")
            / F.sum("c")
        ).alias("dup_bigram_frac"),
    )


@query(
    "x_contamination",
    oracle=f"""
    WITH bench AS (
      SELECT doc_id AS bench_id, {_TOKENS_DUCK} AS ts
      FROM documents WHERE doc_id % 97 = 0
    ),
    bench_grams AS (
      SELECT DISTINCT g FROM (
        SELECT UNNEST(list_transform(range(1, greatest(len(ts) - 6, 1)),
               i -> array_to_string(list_slice(ts, CAST(i AS INTEGER), CAST(i + 7 AS INTEGER)), ' '))) AS g
        FROM bench)
    ),
    corpus AS (
      SELECT doc_id, {_TOKENS_DUCK} AS ts FROM documents WHERE doc_id % 97 <> 0
    ),
    corpus_grams AS (
      SELECT doc_id, len(ts) AS n_tok, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(ts) - 6, 1)),
               i -> array_to_string(list_slice(ts, CAST(i AS INTEGER), CAST(i + 7 AS INTEGER)), ' ')))) AS g
      FROM corpus
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(count(*) AS DOUBLE) / max(c.n_tok) AS hit_frac
    FROM corpus_grams c JOIN bench_grams b ON c.g = b.g
    GROUP BY c.doc_id
    """,
)
def x_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check (decontamination, the step every
    training corpus takes before evaluation is trustworthy): docs
    sharing 8-gram shingles with a held-out benchmark set (stand-in:
    every 97th doc) are flagged with their hit count and hits/token
    rate. The benchmark shingle set is SMALL by nature (eval suites,
    not corpora), so Spark broadcasts it and the check is a scan-side
    broadcast semi-join per corpus shingle — zero shuffle of the
    corpus, the only agg is per-doc hit counting. Counts and the
    count/n_tok divide are int-exact cross-engine."""
    from hephaestus_spark.operators.textops import tokens, word_shingles

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    bgrams = (
        bench.select(F.explode(word_shingles(tokens(), 8)).alias("g")).distinct()
    )
    cgrams = corpus.select(
        "doc_id",
        F.size(tokens()).alias("n_tok"),
        F.explode(word_shingles(tokens(), 8)).alias("g"),
    )
    hits = cgrams.join(F.broadcast(bgrams), "g")
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_hits"),
        (F.count("*").cast("double") / F.max("n_tok")).alias("hit_frac"),
    )


@query(
    "x_source_mix",
    oracle=f"""
    WITH per_doc AS (
      SELECT source, lang, len({_TOKENS_DUCK}) AS n_tok FROM documents
    ),
    tot AS (SELECT sum(n_tok) AS corpus_tok FROM per_doc)
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(n_tok) AS DOUBLE) / (SELECT corpus_tok FROM tot)
             AS token_share
    FROM per_doc GROUP BY source, lang
    """,
)
def x_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture composition: docs and tokens per (source, lang)
    with each cell's share of total corpus tokens — the table a data
    mixer reweights against (e.g. up-sample code, cap a crawl source).
    One scan-side token count + one keyed agg; the global total is a
    1-row broadcast joined back (no second scan, no driver collect).
    Token counts are integral sums (exact in double) and the share is
    a single divide of identical numerator/denominator — int-exact
    cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select("source", "lang", F.size(F.expr(_TOKENS)).alias("n_tok"))
    cells = per_doc.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    total = per_doc.agg(F.sum("n_tok").alias("corpus_tok"))
    return cells.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("corpus_tok")).alias("token_share"),
    )


@query(
    "x_blocklist_filter",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0
                  THEN text || ' Click Here To Subscribe today'
                  ELSE text END AS text,
             CASE WHEN doc_id % 3 = 0
                  THEN 'HTTPS://WWW.' || source || '.example.' || lang
                       || '/doc/' || CAST(doc_id AS VARCHAR)
                  ELSE 'http://' || source || '.example.' || lang
                       || '/path?q=' || CAST(doc_id AS VARCHAR) END AS url
      FROM documents
    ),
    normed AS (
      SELECT doc_id, text,
             regexp_extract(lower(url), '^[a-z]+://(www\\.)?([^/?]+)', 2) AS domain
      FROM urls
    )
    SELECT doc_id, domain,
           CASE WHEN len(list_filter(['src3.example', 'src7.example', 'src12.example'],
                                     b -> starts_with(domain, b || '.'))) > 0
                THEN 'blocked_domain'
                WHEN contains(lower(text), 'click here to subscribe')
                  OR contains(lower(text), 'lorem ipsum')
                THEN 'blocked_phrase'
                ELSE 'ok' END AS verdict
    FROM normed
    """,
)
def x_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-side blocklist filtering — the stage every web-scale
    training corpus runs before any content analysis: normalize each
    doc's URL (lowercase, strip scheme + www., drop path/query —
    operators/textops.py::url_domain), block registrable domains on a
    blocklist (matched across every TLD suffix), and block boilerplate
    phrases. Blocklists are tiny by nature, so both checks inline as
    literal-array `exists` / `contains` expressions: scan-side,
    codegen'd, ZERO shuffle and zero joins regardless of corpus size —
    at 100 TB this folds into whatever scan reads the corpus first.
    URLs are synthesized deterministically from (source, lang, doc_id)
    with mixed-case/scheme variants so the normalization is actually
    exercised; output is strings only (no float channel)."""
    from hephaestus_spark.operators.textops import url_domain

    d = load_table(spark, sf_dir, "documents")
    # seed a boilerplate phrase (mixed case) so the phrase gate fires
    text = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(F.col("text"), F.lit(" Click Here To Subscribe today")),
    ).otherwise(F.col("text"))
    url = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit("HTTPS://WWW."), F.col("source"), F.lit(".example."),
            F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example."),
            F.col("lang"), F.lit("/path?q="), F.col("doc_id").cast("string"),
        )
    )
    normed = d.select("doc_id", text.alias("text"), url.alias("url")).select(
        "doc_id", "text", url_domain("url").alias("domain")
    )
    blocked_domain = F.expr(
        "exists(array('src3.example', 'src7.example', 'src12.example'),"
        " b -> startswith(domain, concat(b, '.')))"
    )
    blocked_phrase = F.lower(F.col("text")).contains(
        "click here to subscribe"
    ) | F.lower(F.col("text")).contains("lorem ipsum")
    verdict = (
        F.when(blocked_domain, F.lit("blocked_domain"))
        .when(blocked_phrase, F.lit("blocked_phrase"))
        .otherwise(F.lit("ok"))
    )
    return normed.select("doc_id", "domain", verdict.alias("verdict"))


# --------------------------------------------------------------------------
# r5: TF-IDF keyword extraction (per-document top terms)
# --------------------------------------------------------------------------
@query(
    "x_tfidf_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST({_TOKENS_DUCK}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    )
    SELECT doc_id, token, tf, df, weight FROM (
      SELECT t.doc_id, t.token, t.tf, d.df,
             (t.tf * 1000000 * n.n_docs) // d.df AS weight,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY (t.tf * 1000000 * n.n_docs) // d.df DESC, t.token ASC
             ) AS rn
      FROM tf t JOIN df d USING (token), n
    ) WHERE rn <= 5
    """,
)
def x_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-5 terms by a TF-IDF-family
    rarity weight. The weight is the LINEAR-idf variant
    ``tf * S * N / df`` as one integer division (S = 1e6 resolution) —
    chosen over ``tf * ln(N/df)`` because ln() is libm-dependent and
    the two engines' last-ulp disagreement could flip a rank at some
    scale (the q34 failure class); the integer form is bit-identical
    everywhere, and per fixed (N, df) it orders docs exactly like the
    log form. Overflow bound: tf*S*N < 2^63 holds to N ≈ 9e12/tf docs;
    a 1e10-doc corpus with tf ≤ 1e3 would drop S to 1e3.

    Scale shape: tf is one (doc, token) hash-agg; df rides a
    whole-partition COUNT WINDOW over token on the tf output — a
    groupBy-then-join-back spelling re-scanned and re-aggregated the
    corpus (column pruning made the two tf subtrees non-identical, so
    even runtime ReuseExchange could not dedupe them; asserted in
    test_plans.py), while the window is one shuffle of the (doc,
    token, tf) rows and nothing else. Stopword keys make that shuffle
    skewed — the same skew the join had — and the whole-partition
    window state is a single count. The 1-row doc count broadcasts
    via crossJoin. The top-5 window partitions by doc_id: millions of
    tiny partitions, no global sort.
    """
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count("*").alias("n_docs"))
    tok = d.select("doc_id", F.explode(F.expr(_TOKENS)).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    scored = (
        tf.withColumn("df", F.count("*").over(W.partitionBy("token")))
        .crossJoin(F.broadcast(n))
        .withColumn("weight", F.expr("div(tf * 1000000 * n_docs, df)"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("weight").desc(), F.col("token").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "token", "tf", "df", "weight")
    )


@query(
    # r15: ORACLED — the payload is encode(text) and the 16-bin
    # histogram of (byte >> 4) is exactly the count of each first hex
    # nibble of hex(encode(text)), so DuckDB recomputes histogram and
    # entropy from hex digits with zero binary plumbing. 6dp rounding
    # on entropy absorbs bin-order float drift (the kmeans sq_dist
    # discipline).
    "x_multimodal_histogram",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             (['image/png','audio/wav','video/mp4'])[CAST(doc_id % 3 + 1 AS INTEGER)]
               AS media_type,
             hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
      FROM documents
    ),
    f AS (
      SELECT doc_id, media_type, byte_len,
             list_transform(range(0, 16), v -> CAST(len(list_filter(
               list_transform(range(1, CAST(len(hx) AS BIGINT) + 1, 2),
                 i -> strpos('0123456789ABCDEF',
                             substring(hx, CAST(i AS INTEGER), 1)) - 1),
               d -> d = v)) AS BIGINT)) AS hist
      FROM h
    )
    SELECT doc_id, media_type, byte_len,
           round(COALESCE(-list_sum(list_transform(
             list_filter(hist, x -> x > 0),
             x -> (x / CAST(greatest(byte_len, 1) AS DOUBLE))
                  * log2(x / CAST(greatest(byte_len, 1) AS DOUBLE)))), 0.0),
             6) AS byte_entropy,
           hist
    FROM f
    """,
)
def x_multimodal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free multimodal content features: 16-bin byte histogram +
    byte entropy per payload, vectorized numpy inside Arrow batches
    (operators/multimodal.py::byte_histogram_features). This is the
    pre-decode triage layer of a multimodal pipeline — corrupt-file
    detection, format drift, histogram-signature near-dup blocking —
    and unlike the decode stub it is fully REAL in this environment.
    Map-side only: no shuffle anywhere. Invariants (hist sums to
    byte_len, entropy bounds, agreement with a pure-Python reference)
    are asserted in tests/test_multimodal_hist.py."""
    from hephaestus_spark.operators.multimodal import (
        byte_histogram_features,
        synthesize_media,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = synthesize_media(d)
    return byte_histogram_features(media).select(
        "doc_id", "media_type", "byte_len", F.round("byte_entropy", 6).alias("byte_entropy"), "hist"
    )


@query(
    "x_bm25_search",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_DUCK} AS toks FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t
    ), st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(len(toks)) AS BIGINT) AS sumdl
      FROM t
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM t)
      WHERE term IN ('spark', 'window', 'merge')
      GROUP BY doc_id, term
    ), df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), sc AS (
      SELECT tf.doc_id,
             ln(CAST(1 AS DOUBLE)
                + (st.n - df.df + CAST(0.5 AS DOUBLE))
                  / (df.df + CAST(0.5 AS DOUBLE)))
             * ((tf.tf * CAST(2.2 AS DOUBLE))
                / (tf.tf + CAST(1.2 AS DOUBLE)
                   * (CAST(0.25 AS DOUBLE)
                      + CAST(0.75 AS DOUBLE)
                        * (dl.dl / (CAST(st.sumdl AS DOUBLE) / st.n))))) AS s
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
           list_sum(list_sort(list(s))) AS bm25
    FROM sc GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
    """,
)
def x_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 full-text retrieval (k1=1.2, b=0.75, Lucene idf) for a fixed
    3-term query, top-20 docs — the classic quality-retrieval primitive
    a curation stack uses for targeted corpus probes.

    Plan: tokenize scan-side, filter to the query terms BEFORE any
    shuffle (the corpus never shuffles unmatched tokens), one (doc,
    term) agg for tf, a 3-row df table and a 1-row corpus-stats table
    both broadcast back. At 100 TB the per-term posting extraction is
    the same scan + tiny-agg shape; only matched postings move.

    Cross-engine float discipline: every literal is spelled as DOUBLE
    in both engines (a bare 2.2 in DuckDB is DECIMAL(2,1) — its exact
    arithmetic would diverge from Spark's double path); per-(doc,term)
    scores are identical IEEE trees on identical int inputs, and the
    per-doc sum folds the SORTED score list in both engines (the
    x_token_entropy pinned-order pattern), so the emitted double is
    bit-identical."""
    d = load_table(spark, sf_dir, "documents")
    qterms = ["spark", "window", "merge"]
    t = d.select("doc_id", F.expr(_TOKENS).alias("toks"))
    dl = t.select("doc_id", F.size("toks").cast("bigint").alias("dl"))
    st = t.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.size("toks")).cast("bigint").alias("sumdl"),
    )
    tf = (
        t.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(qterms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    avgdl = F.col("sumdl").cast("double") / F.col("n")
    idf = F.log(
        F.lit(1.0).cast("double")
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    s = idf * (
        (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / avgdl))
        )
    )
    sc = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .select("doc_id", s.alias("s"))
    )
    agg = sc.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.expr(
            "aggregate(sort_array(collect_list(s)), CAST(0 AS DOUBLE),"
            " (acc, x) -> acc + x)"
        ).alias("bm25"),
    )
    return agg.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(20)


@query(
    "x_mix_temperature",
    oracle=f"""
    WITH t AS (
      SELECT source, {_TOKENS_DUCK} AS toks FROM documents
    ), s AS (
      SELECT source, CAST(sum(len(toks)) AS BIGINT) AS n_tokens
      FROM t GROUP BY source
    ), p AS (
      SELECT source, n_tokens,
             pow(n_tokens, CAST(0.7 AS DOUBLE)) AS pw
      FROM s
    ), tot AS (
      SELECT list_sum(list_sort(list(pw))) AS z FROM p
    )
    SELECT source, n_tokens,
           pw / z AS weight,
           (CAST(1000000 AS DOUBLE) * (pw / z)) / n_tokens AS epochs_at_1m
    FROM p CROSS JOIN tot
    """,
)
def x_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based training-mix weights (the multilingual/
    multi-source sampling rule from mBERT/XLM-R and most pretraining
    mixes): per-source sampling weight ∝ tokens^τ with τ=0.7 —
    upweighting small sources without letting the largest dominate —
    plus the implied epochs-per-source at a 1M-token budget (epochs > 1
    ⇒ the source repeats; the over-repetition signal mix designers
    watch).

    Plan: one keyed agg for per-source token counts (map-side combined),
    then the 20-row weight table is driver-free arithmetic: the
    normalizer folds the SORTED pow list (x_token_entropy pinned-order
    pattern) in both engines, and weight/epochs are single IEEE
    divides on identical operands. At 100 TB the heavy side is the one
    token-count scan; the mix math is O(#sources) regardless of data
    size."""
    d = load_table(spark, sf_dir, "documents")
    s = (
        d.select("source", F.size(F.expr(_TOKENS)).alias("ntok"))
        .groupBy("source")
        .agg(F.sum("ntok").cast("bigint").alias("n_tokens"))
    )
    p = s.select(
        "source", "n_tokens", F.pow(F.col("n_tokens"), F.lit(0.7)).alias("pw")
    )
    tot = p.agg(
        F.expr(
            "aggregate(sort_array(collect_list(pw)), CAST(0 AS DOUBLE),"
            " (acc, x) -> acc + x)"
        ).alias("z")
    )
    return p.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        (F.col("pw") / F.col("z")).alias("weight"),
        (
            (F.lit(1000000.0) * (F.col("pw") / F.col("z"))) / F.col("n_tokens")
        ).alias("epochs_at_1m"),
    )


@query(
    "x_dsir_weights",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKENS_DUCK} AS toks FROM documents
    ), occ AS (
      SELECT doc_id, source, unnest(toks) AS term FROM t
    ), vocab AS (
      SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM occ
    ), tgt AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c FROM occ
      WHERE source = 'src0' GROUP BY term
    ), ntgt AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM occ WHERE source = 'src0'
    ), raw AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c FROM occ
      WHERE source <> 'src0' GROUP BY term
    ), nraw AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM occ WHERE source <> 'src0'
    ), ratio AS (
      SELECT o.doc_id,
             ln((COALESCE(tgt.c, 0) + CAST(1 AS DOUBLE)) / (ntgt.n + vocab.v))
             - ln((COALESCE(raw.c, 0) + CAST(1 AS DOUBLE)) / (nraw.n + vocab.v))
               AS r
      FROM occ o
      LEFT JOIN tgt ON o.term = tgt.term
      LEFT JOIN raw ON o.term = raw.term
      CROSS JOIN ntgt CROSS JOIN nraw CROSS JOIN vocab
      WHERE o.source <> 'src0'
    ), agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             list_sum(list_sort(list(r))) AS log_weight
      FROM ratio GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, log_weight
    FROM agg ORDER BY log_weight DESC, doc_id ASC LIMIT 20
    """,
)
def x_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): treat source
    'src0' as the high-quality target distribution, every other source
    as the raw pool, fit add-1-smoothed unigram LMs to both, and score
    each pool doc by its log importance weight
    sum_t [ln p_target(t) - ln p_raw(t)] — the ranking a DSIR pass
    resamples from. Emits the top-20 most target-like pool docs.

    Plan: term counts are two tiny keyed aggs over one tokenized scan;
    the target/raw probability tables (|vocab| rows — hashed buckets in
    production, same shape) BROADCAST back onto the token stream, so
    scoring 100 TB of pool docs is scan + per-doc agg, no corpus
    shuffle. Float discipline: per-occurrence log-ratios are identical
    IEEE trees (counts + literal smoothing, all divides on identical
    operands), and the per-doc sum folds the SORTED ratio list in both
    engines (pinned-order pattern)."""
    d = load_table(spark, sf_dir, "documents")
    occ = d.select("doc_id", "source", F.explode(F.expr(_TOKENS)).alias("term"))
    tgt_occ = occ.filter(F.col("source") == "src0")
    raw_occ = occ.filter(F.col("source") != "src0")
    vocab = occ.agg(F.count_distinct("term").cast("bigint").alias("v"))
    tgt = tgt_occ.groupBy("term").agg(F.count("*").cast("bigint").alias("ct"))
    ntgt = tgt_occ.agg(F.count("*").cast("bigint").alias("nt"))
    raw = raw_occ.groupBy("term").agg(F.count("*").cast("bigint").alias("cr"))
    nraw = raw_occ.agg(F.count("*").cast("bigint").alias("nr"))
    r = (
        F.log(
            (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
            / (F.col("nt") + F.col("v"))
        )
        - F.log(
            (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1.0))
            / (F.col("nr") + F.col("v"))
        )
    )
    ratio = (
        raw_occ.join(F.broadcast(tgt), "term", "left")
        .join(F.broadcast(raw), "term", "left")
        .crossJoin(F.broadcast(ntgt))
        .crossJoin(F.broadcast(nraw))
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", r.alias("r"))
    )
    agg = ratio.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.expr(
            "aggregate(sort_array(collect_list(r)), CAST(0 AS DOUBLE),"
            " (acc, x) -> acc + x)"
        ).alias("log_weight"),
    )
    return agg.orderBy(F.col("log_weight").desc(), F.col("doc_id").asc()).limit(20)


@query(
    "x_pmi_cooccurrence",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_DUCK} AS toks FROM documents
    ), bg AS (
      SELECT toks[i] AS a, toks[i + 1] AS b
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, len(toks) - 1)) AS i
      )
    ), cab AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM bg GROUP BY a, b
    ), tot AS (
      SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM cab
    ), ca AS (
      SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY a
    ), cb AS (
      SELECT b, CAST(sum(c_ab) AS BIGINT) AS c_b FROM cab GROUP BY b
    )
    SELECT cab.a, cab.b, cab.c_ab,
           ln((CAST(tot.n AS DOUBLE) * cab.c_ab)
              / (CAST(ca.c_a AS DOUBLE) * cb.c_b)) AS pmi
    FROM cab JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot
    WHERE cab.c_ab >= 5
    ORDER BY pmi DESC, cab.a ASC, cab.b ASC
    LIMIT 20
    """,
)
def x_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram PMI phrase detection (the word2vec-phrases / collocation
    primitive): PMI(a,b) = ln(N * c_ab / (c_a * c_b)) over adjacent
    token pairs, min count 5, top-20 — the op that finds multi-word
    expressions worth merging into single tokens before training.

    Plan: bigrams are generated scan-side (sequence over the token
    array, no shuffle), one (a,b) groupBy produces the pair counts, and
    the marginals RE-AGGREGATE the pair table (|pairs| rows, far
    smaller than the corpus) rather than re-scanning the corpus; the
    total is a 1-row broadcast. Marginals computed from the pair table
    are exactly the bigram-position marginals, so the identity
    sum(c_ab over b) = c_a holds by construction. Floats: one ln per
    surviving pair on identical int-derived doubles — the two divides
    are spelled with identical association in both engines."""
    d = load_table(spark, sf_dir, "documents")
    bg = (
        d.select(F.expr(_TOKENS).alias("toks"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS a, toks[i] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    cab = bg.groupBy("a", "b").agg(F.count("*").cast("bigint").alias("c_ab"))
    tot = cab.agg(F.sum("c_ab").cast("bigint").alias("n"))
    ca = cab.groupBy("a").agg(F.sum("c_ab").cast("bigint").alias("c_a"))
    cb = cab.groupBy("b").agg(F.sum("c_ab").cast("bigint").alias("c_b"))
    pmi = F.log(
        (F.col("n").cast("double") * F.col("c_ab"))
        / (F.col("c_a").cast("double") * F.col("c_b"))
    )
    return (
        cab.filter(F.col("c_ab") >= 5)
        .join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tot))
        .select("a", "b", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(20)
    )


@query(
    "x_lm_perplexity",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_DUCK} AS toks FROM documents
    ), bg AS (
      SELECT doc_id, toks[i] AS a, toks[i + 1] AS b
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, len(toks) - 1)) AS i
      )
    ), cab AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM bg GROUP BY a, b
    ), ca AS (
      SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY a
    ), vocab AS (
      SELECT CAST(count(DISTINCT x) AS BIGINT) AS v
      FROM (SELECT unnest(toks) AS x FROM t)
    ), lp AS (
      SELECT bg.doc_id,
             ln((cab.c_ab + CAST(1 AS DOUBLE)) / (ca.c_a + vocab.v)) AS lnp
      FROM bg JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN vocab
    ), agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
             list_sum(list_sort(list(lnp))) AS ll
      FROM lp GROUP BY doc_id
    )
    SELECT doc_id, n_pairs,
           exp(-(ll / n_pairs)) AS perplexity
    FROM agg ORDER BY perplexity DESC, doc_id ASC LIMIT 20
    """,
)
def x_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filtering: per-doc perplexity under an
    add-1-smoothed bigram LM fit on the corpus itself — the top-20
    highest-perplexity (most out-of-distribution) docs are what a
    curation pass inspects or drops. Complements x_dsir_weights (which
    contrasts two corpora; this scores against one).

    Plan: bigram counts are one (a,b) agg over a scan-side pair
    explode; the conditional-probability tables broadcast back onto the
    per-doc pair stream (in production the LM tables are hashed/pruned
    — same broadcast shape), so scoring never shuffles the corpus.
    Float discipline: per-pair ln on identical int-derived doubles,
    per-doc sum folds the SORTED list, then exp of one identical
    double; ordering ties break on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    bg = (
        d.select("doc_id", F.expr(_TOKENS).alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS a, toks[i] AS b))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.a", "p.b")
    )
    cab = bg.groupBy("a", "b").agg(F.count("*").cast("bigint").alias("c_ab"))
    ca = cab.groupBy("a").agg(F.sum("c_ab").cast("bigint").alias("c_a"))
    vocab = (
        d.select(F.explode(F.expr(_TOKENS)).alias("x"))
        .agg(F.count_distinct("x").cast("bigint").alias("v"))
    )
    lnp = F.log(
        (F.col("c_ab") + F.lit(1.0)) / (F.col("c_a") + F.col("v"))
    )
    lp = (
        bg.join(F.broadcast(cab), ["a", "b"])
        .join(F.broadcast(ca), "a")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lnp.alias("lnp"))
    )
    agg = lp.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.expr(
            "aggregate(sort_array(collect_list(lnp)), CAST(0 AS DOUBLE),"
            " (acc, x) -> acc + x)"
        ).alias("ll"),
    )
    out = agg.select(
        "doc_id",
        "n_pairs",
        F.exp(-(F.col("ll") / F.col("n_pairs"))).alias("perplexity"),
    )
    return out.orderBy(F.col("perplexity").desc(), F.col("doc_id").asc()).limit(20)


# r15: BPE is "iterative" the same way Lloyd's k-means is — a FIXED
# number of deterministic rounds (argmax tie-broken count DESC, pair
# ASC; greedy leftmost-nonoverlap merge application) — so the x_kmeans
# unrolling trick applies: each merge round becomes three chained CTEs
# (pair counts -> argmax -> re-segmented vocab). The one non-obvious
# piece is the merge fold: DuckDB's list_reduce keeps the accumulator
# the ELEMENT type, so the running symbol list is serialized through a
# chr(31) unit separator (symbols are [a-z] and '</w>' composites —
# the separator can never occur) and split back after the fold.
# Training-state reuse: the round-16 vocab IS segment_with_merges()
# for every corpus word, so the encode oracle joins doc words to it.
# Parity caveat (same class as q33's bucket cap): train_bpe stops
# early if the best pair count falls below 2 — unreachable on the
# test corpora, and the oracle models no stop.
_BPE_FOLD = (
    "string_split(list_reduce(s, (acc, x) -> "
    "CASE WHEN list_extract(string_split(acc, chr(31)), -1) = l AND x = r "
    "THEN CASE WHEN len(acc) = len(list_extract(string_split(acc, chr(31)), -1)) "
    "THEN l || r "
    "ELSE substring(acc, 1, len(acc) - len(list_extract(string_split(acc, chr(31)), -1)) - 1)"
    " || chr(31) || l || r END "
    "ELSE acc || chr(31) || x END), chr(31))"
)

_BPE_WORDS = (
    "list_filter(string_split_regex(lower(text), '[^a-z]+'), w -> w <> '')"
)


def _bpe_duck(n_merges: int = 16) -> str:
    ctes = [
        f"""
    v0 AS MATERIALIZED (
      SELECT word, count,
             list_append(list_transform(range(1, len(word) + 1),
               i -> substring(word, CAST(i AS INTEGER), 1)), '</w>') AS s
      FROM (
        SELECT word, CAST(count(*) AS BIGINT) AS count FROM (
          SELECT UNNEST({_BPE_WORDS}) AS word FROM documents
        ) GROUP BY word
      )
    )"""
    ]
    for k in range(1, n_merges + 1):
        ctes.append(f"""
    p{k} AS (
      SELECT pr.l AS l, pr.r AS r, SUM(count) AS n FROM (
        SELECT count, UNNEST(list_transform(range(1, len(s)),
          i -> struct_pack(l := s[CAST(i AS INTEGER)],
                           r := s[CAST(i AS INTEGER) + 1]))) AS pr
        FROM v{k - 1}
      ) GROUP BY pr.l, pr.r
    ),
    m{k} AS MATERIALIZED (SELECT l, r, n FROM p{k} ORDER BY n DESC, l ASC, r ASC LIMIT 1),
    v{k} AS MATERIALIZED (
      SELECT word, count, {_BPE_FOLD} AS s
      FROM v{k - 1} CROSS JOIN m{k}
    )""")
    return ",".join(ctes)


_BPE_TRAIN_TAIL = " UNION ALL ".join(
    f"SELECT CAST({k} AS INT) AS rank, l AS \"left\", r AS \"right\","
    f" l || r AS merged, CAST(n AS BIGINT) AS pair_count FROM m{k}"
    for k in range(1, 17)
)


@query("x_bpe_train", oracle=f"WITH {_bpe_duck(16)} {_BPE_TRAIN_TAIL}")
def x_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training over the corpus (operators/bpe.py — the
    Sennrich subword algorithm at the right altitude): ONE distributed
    corpus scan builds the (word, count) type table — the only
    corpus-sized work — then the 16 merge rounds run driver-side over
    the collected vocabulary with incremental pair bookkeeping
    (vocabulary = model-sized state, the k-means-centroid budget class;
    the same split subword-nmt/HF tokenizers make). A per-round
    distributed fallback exists for vocabularies beyond driver memory
    and is equality-tested against this path. Ties break (count DESC,
    pair ASC) so the merge sequence is bit-reproducible — which is
    exactly what makes it ORACLE-able (r15): the 16 rounds unroll
    into chained DuckDB CTEs (see _bpe_duck above), the same
    fixed-iteration trick that oracles x_kmeans. tests/test_bpe.py
    additionally requires the SAME merge sequence from a naive
    from-the-paper reference over independently-computed (DuckDB) word
    counts, and pins segmentation round-trip properties."""
    from hephaestus_spark.operators.bpe import train_bpe

    d = load_table(spark, sf_dir, "documents")
    merges = train_bpe(spark, d, n_merges=16)
    return spark.createDataFrame(
        [
            (i + 1, left, right, left + right, n)
            for i, (left, right, n) in enumerate(merges)
        ],
        "rank int, left string, right string, merged string, pair_count bigint",
    )


_BPE_ENCODE_TAIL = f""",
    docw AS (
      SELECT doc_id, UNNEST({_BPE_WORDS}) AS word FROM documents
    ),
    enc AS (
      SELECT dw.doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(SUM(len(v.s)) AS BIGINT) AS n_subword_tokens,
             CAST(SUM(len(dw.word)) AS BIGINT) AS n_chars_seen
      FROM docw dw JOIN v16 v USING (word)
      GROUP BY dw.doc_id
    )
    SELECT d.doc_id,
           COALESCE(e.n_words, 0) AS n_words,
           COALESCE(e.n_subword_tokens, 0) AS n_subword_tokens,
           COALESCE(e.n_chars_seen, 0) AS n_chars_seen
    FROM documents d LEFT JOIN enc e USING (doc_id)
"""


@query("x_bpe_encode", oracle=f"WITH {_bpe_duck(16)} {_BPE_ENCODE_TAIL}")
def x_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer family's inference half: train 16 merges (one
    corpus scan + driver rounds, x_bpe_train), then ENCODE the corpus
    distributed — merges ride the task closure, segmentation runs in
    Arrow batches with a per-batch word cache, zero shuffles. The
    per-doc subword count is THE pre-training budget number (context
    packing, mixture weights, per-source token budgets all key on it).
    Oracled (r15): the unrolled training chain's round-16 vocabulary
    IS segment_with_merges() for every corpus word, so the oracle just
    joins each doc's words against it — no second merge replay.
    tests/test_bpe.py additionally pins distributed encode ==
    driver-side segmentation word-for-word and subword <= char counts."""
    from hephaestus_spark.operators.bpe import encode_with_merges, train_bpe

    d = load_table(spark, sf_dir, "documents")
    merges = [(l, r) for l, r, _ in train_bpe(spark, d, n_merges=16)]
    return encode_with_merges(d, merges)
