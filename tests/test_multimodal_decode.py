"""Real stdlib WAV/BMP decode (r6): writer and parser are independent
implementations, so these tests catch header-layout bugs on either
side; the corrupt-payload path must fail loudly, never emit garbage."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.operators.multimodal import (
    _bmp_params,
    _wav_params,
    decode_bmp_features,
    decode_wav_features,
    synthesize_bmp_media,
    synthesize_wav_media,
)
from hephaestus_spark.sources import load_table


def test_wav_round_trip_matches_params(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(40)
    meta = {r["doc_id"]: r["n_chars"] for r in d.collect()}
    got = {
        r["doc_id"]: r
        for r in decode_wav_features(synthesize_wav_media(d)).collect()
    }
    assert set(got) == set(meta)
    for doc_id, n_chars in meta.items():
        ch, rate, frames = _wav_params(doc_id, n_chars)
        r = got[doc_id]
        assert (r["n_channels"], r["sample_rate"], r["n_frames"]) == (ch, rate, frames)
        assert r["sampwidth"] == 2
        assert r["pcm_bytes"] == frames * ch * 2
        assert r["duration_ms"] == frames * 1000 // rate


def test_wav_container_is_standard(spark, sf_dir):
    """The hand-rolled writer emits a container the stdlib reader (and
    by extension any RIFF parser) accepts, driver-side too."""
    d = load_table(spark, sf_dir, "documents").limit(3)
    for r in synthesize_wav_media(d).collect():
        with wave.open(io.BytesIO(bytes(r["payload"]))) as w:
            assert w.getcomptype() == "NONE"
            assert w.getnframes() > 0


def test_bmp_round_trip_matches_params(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(40)
    meta = {r["doc_id"]: r["n_chars"] for r in d.collect()}
    got = {
        r["doc_id"]: r
        for r in decode_bmp_features(synthesize_bmp_media(d)).collect()
    }
    for doc_id, n_chars in meta.items():
        w, h = _bmp_params(doc_id, n_chars)
        r = got[doc_id]
        stride = ((w * 3 + 3) // 4) * 4
        assert (r["width"], r["height"], r["bits_per_pixel"]) == (w, h, 24)
        assert r["row_stride"] == stride
        assert r["pixel_bytes"] == stride * h


def test_corrupt_bmp_fails_loudly(spark):
    bad = struct.pack("<2sIHHI", b"XX", 60, 0, 0, 54) + b"\x00" * 46
    df = spark.createDataFrame([(1, bytearray(bad))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="corrupt BMP|Py4J|PythonException"):
        decode_bmp_features(df).collect()


def test_truncated_wav_fails_loudly(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(1)
    row = synthesize_wav_media(d).collect()[0]
    clipped = bytes(row["payload"])[:20]  # RIFF header cut mid-fmt
    df = spark.createDataFrame(
        [(row["doc_id"], bytearray(clipped))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception):
        decode_wav_features(df).collect()
