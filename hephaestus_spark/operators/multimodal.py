"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract is real and tested: payloads travel as
``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` operators so
each task processes whole record batches (the only shape that survives
at 100 TB — per-row Python UDFs would serialize row-at-a-time).

The actual codec step is STUBBED: the image/audio libraries are not in
this container. ``decode_image_stub`` raises NotImplementedError unless
``deterministic_fake=True``, in which case it derives fake-but-stable
"decoded" dimensions/features from the payload hash — enough to test
schema, batching, partitioning, and downstream joins end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, byte_len long, sha string"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, byte_len long,"
    " width int, height int, feature array<float>"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Wrap document text as opaque binary payloads with typed metadata —
    the ingestion shape of a multimodal corpus (payload column + sidecar
    metadata columns)."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    ).select(
        "doc_id",
        "media_type",
        "payload",
        F.length("payload").cast("long").alias("byte_len"),
        F.sha2("payload", 256).alias("sha"),
    )


def decode_and_featurize(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow record batches).

    Real deployment: replace the body with PIL/libav decode + model
    features. The Spark plumbing — schema, batch iteration, partition
    parallelism — is exactly what production uses."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "pass deterministic_fake=True for plumbing tests"
                )
            rows = []
            for _, r in pdf.iterrows():
                h = hashlib.sha256(bytes(r["payload"])).digest()
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "media_type": r["media_type"],
                        "byte_len": len(bytes(r["payload"])),
                        "width": 16 + h[0] % 64,
                        "height": 16 + h[1] % 64,
                        "feature": [float(b) / 255.0 for b in h[:8]],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the opaque payload: emit one row per sampled
    offset (stand-in for video frame extraction; same explode shape)."""
    return media.select(
        "doc_id",
        "media_type",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("byte_len") - 1, F.lit(0)), F.lit(every_n_bytes))
        ).alias("frame_offset"),
    )


HISTOGRAM_SCHEMA = (
    "doc_id long, media_type string, byte_len long,"
    " byte_entropy double, hist array<long>"
)


def byte_histogram_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """REAL (no stub) content features over the opaque payload:
    16-bin byte-value histogram + byte entropy per record, vectorized
    with numpy inside Arrow batches (``np.frombuffer`` + ``bincount``
    per payload — no per-row Python row objects, no codec libraries).

    This is the fingerprint/quality layer a multimodal pipeline runs
    BEFORE decode (corrupt-file triage, format drift detection, cheap
    near-dup blocking on histogram signature), so it being codec-free
    is the point, not a limitation. At 100 TB: pure map-side
    mapInPandas, no shuffle, batch-granular CPU."""
    import math

    shift = 8 - int(math.log2(bins))

    def op(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"].to_numpy(),
                "media_type": pdf["media_type"].to_numpy(),
                "byte_len": np.zeros(len(pdf), dtype="int64"),
                "byte_entropy": np.zeros(len(pdf), dtype="float64"),
                "hist": [None] * len(pdf),
            }
            for i, payload in enumerate(pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                h = np.bincount(b >> shift, minlength=bins).astype("int64")
                out["byte_len"][i] = b.size
                p = h[h > 0] / max(b.size, 1)
                out["byte_entropy"][i] = float(-(p * np.log2(p)).sum())
                out["hist"][i] = h.tolist()
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=HISTOGRAM_SCHEMA)
