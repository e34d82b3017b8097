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


# --------------------------------------------------------------------------
# PNG (r7): genuinely compressed container, independently decoded
# --------------------------------------------------------------------------
def test_png_round_trip_recovers_pixels(spark, sf_dir):
    import hashlib

    from hephaestus_spark.operators.multimodal import (
        _png_params,
        _png_pixels,
        decode_png_features,
        synthesize_png_media,
    )

    d = load_table(spark, sf_dir, "documents").limit(40)
    meta = {r["doc_id"]: (r["text"], r["n_chars"]) for r in d.collect()}
    got = {
        r["doc_id"]: r
        for r in decode_png_features(synthesize_png_media(d)).collect()
    }
    assert set(got) == set(meta)
    for doc_id, (text, n_chars) in meta.items():
        w, h = _png_params(doc_id, n_chars)
        r = got[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["bit_depth"], r["color_type"], r["n_chunks"]) == (8, 2, 3)
        assert r["pixel_bytes"] == w * 3 * h
        # zlib container overhead dominates only on tiny images
        assert 0 < r["idat_bytes"] <= w * 3 * h + h + 64
        # the decompress+unfilter recovered the EXACT pre-filter bytes
        want = hashlib.sha256(_png_pixels(text, w, h)).hexdigest()
        assert r["pixel_sha"] == want, doc_id
    # the deflate genuinely compresses once images are non-trivial
    big = [r for r in got.values() if r["pixel_bytes"] > 500]
    assert big and all(r["idat_bytes"] < r["pixel_bytes"] for r in big)


def test_png_corrupt_byte_fails_loudly(spark, sf_dir):
    from hephaestus_spark.operators.multimodal import (
        decode_png_features,
        synthesize_png_media,
    )

    d = load_table(spark, sf_dir, "documents").limit(1)
    payload = bytearray(
        synthesize_png_media(d).collect()[0]["payload"]
    )
    payload[60] ^= 0xFF  # flip one byte inside IDAT
    bad = spark.createDataFrame(
        [(1, bytes(payload))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="CRC mismatch|adler32|huffman|PNG"):
        decode_png_features(bad).collect()


def test_inflate_matches_zlib_across_block_types():
    """The hand-rolled RFC 1951 decoder against zlib ground truth:
    level 0 = stored blocks, level 1-9 = fixed/dynamic Huffman with
    long LZ77 matches; plus incompressible random bytes."""
    import random
    import zlib

    from hephaestus_spark.operators.multimodal import inflate

    rng = random.Random(99)
    cases = [
        b"",
        b"a",
        b"abc" * 7000,                                # long matches
        bytes(rng.randrange(256) for _ in range(50_000)),  # incompressible
        " ".join(f"tok{i % 97}" for i in range(20_000)).encode(),
    ]
    for raw in cases:
        for lvl in (0, 1, 6, 9):
            assert inflate(zlib.compress(raw, lvl)) == raw, (len(raw), lvl)


def test_inflate_rejects_corruption():
    import zlib

    from hephaestus_spark.operators.multimodal import inflate

    blob = zlib.compress(b"the quick brown fox" * 100, 6)
    # header corruption
    with pytest.raises(ValueError):
        inflate(b"\x00" + blob[1:])
    # payload corruption -> bad huffman code, window error, or adler32
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x5A
    with pytest.raises(ValueError):
        inflate(bytes(bad))


def test_png_unfilter_inverts_all_five_filters():
    """The reader handles every RFC 2083 filter type (the writer only
    emits 0-2): apply each filter forward here, assert the reader's
    unfilter recovers the source scanlines."""
    import random

    from hephaestus_spark.operators.multimodal import _png_unfilter

    rng = random.Random(5)
    w, h, bpp = 11, 10, 3
    stride = w * bpp
    pixels = bytes(rng.randrange(256) for _ in range(stride * h))
    filtered = bytearray()
    prev = b"\x00" * stride
    for y in range(h):
        row = pixels[y * stride:(y + 1) * stride]
        ft = y % 5
        filtered.append(ft)
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - a
            elif ft == 2:
                v = row[i] - b
            elif ft == 3:
                v = row[i] - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                v = row[i] - pred
            filtered.append(v & 0xFF)
        prev = row
    assert _png_unfilter(bytes(filtered), w, h, bpp) == pixels


# --------------------------------------------------------------------------
# MP4 / ISO-BMFF (r7): container-level parse
# --------------------------------------------------------------------------
def test_mp4_round_trip_matches_params(spark, sf_dir):
    from hephaestus_spark.operators.multimodal import (
        _mp4_params,
        decode_mp4_features,
        synthesize_mp4_media,
    )

    d = load_table(spark, sf_dir, "documents").limit(40)
    meta = {r["doc_id"]: (r["text"], r["n_chars"]) for r in d.collect()}
    got = {
        r["doc_id"]: r
        for r in decode_mp4_features(synthesize_mp4_media(d)).collect()
    }
    assert set(got) == set(meta)
    for doc_id, (text, n_chars) in meta.items():
        w, h, ts, ns = _mp4_params(doc_id, n_chars)
        r = got[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["timescale"], r["media_timescale"]) == (ts, ts * 2)
        assert r["duration_ms"] == ns * 1000
        assert (r["n_tracks"], r["track_id"], r["handler"]) == (1, 1, "vide")
        assert r["major_brand"] == "isom"
        assert r["mdat_bytes"] == len(text.encode("utf-8"))


def test_mp4_corrupt_box_fails_loudly(spark, sf_dir):
    import struct

    from hephaestus_spark.operators.multimodal import (
        decode_mp4_features,
        synthesize_mp4_media,
    )

    d = load_table(spark, sf_dir, "documents").limit(1)
    payload = bytes(synthesize_mp4_media(d).collect()[0]["payload"])

    def bad(df_payload):
        return spark.createDataFrame(
            [(1, df_payload)], "doc_id long, payload binary"
        )

    # oversized box length pointing past the buffer
    corrupt = struct.pack(">I", len(payload) + 100) + payload[4:]
    with pytest.raises(Exception, match="bad box size|truncated"):
        decode_mp4_features(bad(corrupt)).collect()
    # truncated mid-moov
    with pytest.raises(Exception, match="bad box size|truncated|missing"):
        decode_mp4_features(bad(payload[: len(payload) // 3])).collect()


def test_mp4_box_bodies_are_spec_sized(spark, sf_dir):
    """Byte-exact ISO 14496-12 layout (caught in review: tkhd was 86
    bytes): v0 full-box bodies must be exactly mvhd=100, tkhd=84,
    mdhd=24 so ANY conforming parser reads the same fields."""
    import struct

    from hephaestus_spark.operators.multimodal import synthesize_mp4_media

    d = load_table(spark, sf_dir, "documents").limit(3)
    want = {b"mvhd": 100, b"tkhd": 84, b"mdhd": 24}
    for r in synthesize_mp4_media(d).collect():
        b = bytes(r["payload"])
        pos, seen = 0, {}

        def walk(start, end):
            pos = start
            while pos < end:
                (size,) = struct.unpack_from(">I", b, pos)
                tag = b[pos + 4:pos + 8]
                if tag in (b"moov", b"trak", b"mdia"):
                    walk(pos + 8, pos + size)
                elif tag in want:
                    seen[tag] = size - 8
                pos += size

        walk(0, len(b))
        assert seen == {k: v for k, v in want.items()}, seen
        # spec offsets: tkhd duration at body+20, width at body+76
        i = b.index(b"tkhd") + 4
        (dur,) = struct.unpack_from(">I", b, i + 20)
        (wfx,) = struct.unpack_from(">I", b, i + 76)
        assert dur > 0 and (wfx >> 16) >= 160
