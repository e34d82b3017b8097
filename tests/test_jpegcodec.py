"""From-scratch baseline JPEG codec (operators/jpegcodec.py): the
encoder and decoder are independent implementations of ITU-T T.81, so
these tests pin (a) the lossless entropy layer bit-for-bit, (b) the
transform pair's exactness at unit quantization, and (c) loud failure
on corrupt or unsupported streams. Pure Python — no Spark session."""

from __future__ import annotations

import random

import pytest

from hephaestus_spark.operators.jpegcodec import (
    _dequant_idct,
    _fdct_quant,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    jpeg_decode,
    jpeg_encode,
    jpeg_expected_coeff_blob,
)


def test_entropy_layer_is_lossless_across_shapes():
    """Decoded quantized coefficients == independently recomputed ones,
    for multi-block, non-multiple-of-8, and degenerate 1x1 frames."""
    rng = random.Random(11)
    for (w, h) in [(8, 8), (16, 8), (11, 5), (27, 23), (1, 1), (9, 17)]:
        pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
        dw, dh, nc, rgb, blob = jpeg_decode(jpeg_encode(pixels, w, h))
        assert (dw, dh, nc) == (w, h, 3)
        assert blob == jpeg_expected_coeff_blob(pixels, w, h), (w, h)
        assert len(rgb) == w * h * 3


def test_transform_pair_inverts_at_unit_quantization():
    """With qt=1 the only loss is coefficient rounding: IDCT(DCT(x))
    must come back within 1 of x — pins both separable transforms."""
    rng = random.Random(7)
    one = [1] * 64
    for _ in range(20):
        blk = [rng.randrange(-128, 128) for _ in range(64)]
        back = _dequant_idct(_fdct_quant(blk, one), one)
        assert max(abs(a - b) for a, b in zip(blk, back)) <= 1


def test_color_conversion_round_trip():
    rng = random.Random(3)
    for _ in range(2000):
        r, g, b = rng.randrange(256), rng.randrange(256), rng.randrange(256)
        rr, gg, bb = _ycbcr_to_rgb(*_rgb_to_ycbcr(r, g, b))
        assert abs(rr - r) <= 2 and abs(gg - g) <= 2 and abs(bb - b) <= 2


def test_smooth_image_reconstruction_is_tight():
    """Quantization barely touches a low-frequency gradient: the full
    encode->decode loop must reproduce it closely (a scrambled zigzag,
    wrong table, or broken IDCT all blow this bound by 10x)."""
    w = h = 24
    pixels = bytes(
        ((x + y) * 4) % 256 for y in range(h) for x in range(w) for _ in range(3)
    )
    _, _, _, rgb, _ = jpeg_decode(jpeg_encode(pixels, w, h))
    errs = [abs(a - b) for a, b in zip(rgb, pixels)]
    assert max(errs) <= 12 and sum(errs) / len(errs) <= 4


def test_corrupt_and_unsupported_streams_fail_loudly():
    pixels = bytes(range(192))
    enc = bytearray(jpeg_encode(pixels, 8, 8))
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x00" + bytes(enc[2:]))  # bad SOI
    with pytest.raises(ValueError):
        jpeg_decode(bytes(enc[: len(enc) // 2]))  # truncated mid-stream
    prog = bytes(enc).replace(b"\xff\xc0", b"\xff\xc2", 1)  # progressive
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(prog)


def test_decoder_reads_tables_from_the_file_not_the_spec():
    """Swap the luma quantization table in the DQT segment: the decoder
    must dequantize with the FILE's table, changing the pixels, while
    the entropy layer still decodes the same coefficient stream."""
    pixels = bytes((i * 7) % 256 for i in range(8 * 8 * 3))
    enc = jpeg_encode(pixels, 8, 8)
    _, _, _, rgb0, blob0 = jpeg_decode(enc)
    # DQT body: marker(2) len(2) id(1) then 64 zigzag bytes — double the
    # DC quantizer of table 0 (first byte after the id)
    i = enc.index(b"\xff\xdb") + 5
    patched = enc[:i] + bytes([min(255, enc[i] * 2)]) + enc[i + 1:]
    _, _, _, rgb1, blob1 = jpeg_decode(patched)
    assert blob0 == blob1  # entropy layer untouched
    assert rgb0 != rgb1  # dequantization honored the patched table


def test_420_entropy_layer_is_lossless_across_shapes():
    """4:2:0 mode (r7): MCU = 4 Y blocks + downsampled Cb + Cr. The
    decoded coefficient stream must still equal an independent forward
    pass bit-for-bit, including frames not multiple of the 16px MCU."""
    rng = random.Random(23)
    for (w, h) in [(16, 16), (11, 5), (27, 23), (1, 1), (17, 16), (16, 8)]:
        pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
        enc = jpeg_encode(pixels, w, h, subsample=True)
        dw, dh, nc, rgb, blob = jpeg_decode(enc)
        assert (dw, dh, nc) == (w, h, 3)
        assert blob == jpeg_expected_coeff_blob(pixels, w, h, subsample=True)
        assert len(rgb) == w * h * 3
        # 4:2:0 genuinely differs from 4:4:4 on the wire
        assert blob != jpeg_expected_coeff_blob(pixels, w, h)


def test_420_smooth_reconstruction_is_tight():
    """Chroma subsampling loses nothing on a smooth gradient: the full
    4:2:0 encode->decode loop reproduces it closely."""
    w = h = 24
    pixels = bytes(
        ((x + y) * 4) % 256 for y in range(h) for x in range(w) for _ in range(3)
    )
    _, _, _, rgb, _ = jpeg_decode(jpeg_encode(pixels, w, h, subsample=True))
    errs = [abs(a - b) for a, b in zip(rgb, pixels)]
    assert max(errs) <= 12 and sum(errs) / len(errs) <= 4


def test_420_compresses_beyond_444():
    """The point of subsampling: 3/4 fewer chroma blocks on the wire."""
    w = h = 32
    pixels = bytes(((x * 7 + y * 3) % 256) for y in range(h) for x in range(w) for _ in range(3))
    assert len(jpeg_encode(pixels, w, h, subsample=True)) < len(
        jpeg_encode(pixels, w, h)
    )


def test_unsupported_sampling_factors_rejected():
    pixels = bytes(range(192))
    enc = jpeg_encode(pixels, 8, 8, subsample=True)
    # patch the Y sampling byte (0x22) in SOF to an unsupported 2x1
    i = enc.index(b"\xff\xc0") + 4 + 6 + 1  # marker+len+prec/h/w/nc, comp id
    assert enc[i] == 0x22
    bad = enc[:i] + bytes([0x21]) + enc[i + 1:]
    with pytest.raises(ValueError, match="sampling"):
        jpeg_decode(bad)
