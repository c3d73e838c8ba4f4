"""Pure-stdlib multimodal decoders: BMP / PGM / PPM / WAV round-trips,
feature extraction over real payloads, and per-row error isolation.

The encoders live next to the decoders (multimodal.encode_*) so the
fixtures are generated in-process — no binary blobs in the repo and no
PIL/ffmpeg dependency (the same pure-stdlib move as minipdf.py).
"""

import math

import numpy as np
import pytest

from unstract_spark.operators.multimodal import (
    audio_features,
    decode_bmp,
    decode_pnm,
    decode_wav,
    encode_bmp24,
    encode_pgm,
    encode_ppm,
    encode_wav16,
    image_features,
)

rng = np.random.default_rng(42)


def test_bmp24_roundtrip():
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    decoded = decode_bmp(encode_bmp24(px))
    assert decoded.shape == (5, 7, 3)
    assert np.array_equal(decoded, px)


def test_bmp_topdown_and_32bit():
    # hand-build a 2x2 top-down 32-bit BMP: negative height, BGRA pixels
    px_rgb = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
    )
    rows = b""
    for y in range(2):  # top-down: row 0 first
        for x in range(2):
            r, g, b = px_rgb[y, x]
            rows += bytes([b, g, r, 255])
    header = (
        b"BM"
        + (54 + len(rows)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + (-2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (32).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(rows).to_bytes(4, "little")
        + b"\x00" * 16
    )
    assert np.array_equal(decode_bmp(header + rows), px_rgb)


def test_bmp_8bit_gray_palette():
    # 3x2 8-bit BMP with identity grayscale palette -> (H, W) gray
    idx = np.array([[0, 128, 255], [10, 20, 30]], dtype=np.uint8)
    palette = b"".join(bytes([v, v, v, 0]) for v in range(256))
    row_size = (3 + 3) & ~3  # 3 px padded to 4
    rows = b""
    for y in (1, 0):  # bottom-up
        rows += idx[y].tobytes() + b"\x00" * (row_size - 3)
    pix_off = 54 + len(palette)
    header = (
        b"BM"
        + (pix_off + len(rows)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + pix_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (3).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(rows).to_bytes(4, "little")
        + b"\x00" * 8
        + (256).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    decoded = decode_bmp(header + palette + rows)
    assert decoded.shape == (2, 3)
    assert np.array_equal(decoded, idx)


def test_bmp_rejects_compressed_and_truncated():
    px = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    good = encode_bmp24(px)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-4])
    compressed = bytearray(good)
    compressed[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        decode_bmp(bytes(compressed))


def test_pgm_ppm_roundtrip():
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_pgm(gray)), gray)
    rgb = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_ppm(rgb)), rgb)


def test_pnm_header_comments_and_whitespace():
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    data = b"P5 # magic\n# a comment line\n  3\t2 #dims\n255\n" + gray.tobytes()
    assert np.array_equal(decode_pnm(data), gray)


def test_wav16_roundtrip():
    samples = rng.integers(-30000, 30000, size=200, dtype=np.int16)
    arr, rate = decode_wav(encode_wav16(samples, rate=16000))
    assert rate == 16000
    assert np.array_equal(arr, samples.astype(np.int64))


def test_wav_8bit_and_stereo():
    # hand-build: 8-bit unsigned stereo at 8 kHz
    raw = bytes([0, 128, 255, 1])  # L,R,L,R
    fmt = (
        (1).to_bytes(2, "little")
        + (2).to_bytes(2, "little")
        + (8000).to_bytes(4, "little")
        + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
    )
    data = (
        b"RIFF"
        + (4 + 8 + len(fmt) + 8 + len(raw)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(raw).to_bytes(4, "little")
        + raw
    )
    arr, rate = decode_wav(data)
    assert rate == 8000
    assert arr.shape == (2, 2)  # (frames, channels)
    assert np.array_equal(arr, [[-128, 0], [127, -127]])


def test_wav_rejects_non_pcm():
    bad = bytearray(encode_wav16(np.zeros(4, dtype=np.int16)))
    bad[20] = 3  # IEEE float format tag
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(bad))


def test_image_features_real_bmp(spark):
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("/img/real.bmp", bytearray(encode_bmp24(px)))],
        "file_path string, content binary",
    )
    row = image_features(df, fake=False).collect()[0]
    assert row.decode_error is None
    gray = px.astype(np.int64).sum(axis=2) // 3
    n = gray.size
    mean = int(gray.sum()) / n
    var = int((gray * gray).sum()) / n - mean * mean
    assert row.feat[0] == round(mean, 6)
    assert row.feat[1] == round(math.sqrt(max(var, 0.0)), 6)
    assert sum(row.feat[2:6]) == n  # histogram covers every pixel
    for i in range(4):
        assert row.feat[2 + i] == int(((gray // 64) == i).sum())


def test_image_features_mixed_real_and_error_rows(spark):
    gray = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            ("/img/ok.pgm", bytearray(encode_pgm(gray))),
            ("/img/bad.png", bytearray(b"\x89PNG not decodable")),
            ("/img/trunc.bmp", bytearray(encode_bmp24(
                rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8))[:-8])),
        ],
        "file_path string, content binary",
    )
    rows = {r.file_path: r for r in image_features(df, fake=False).collect()}
    assert rows["/img/ok.pgm"].decode_error is None
    assert rows["/img/ok.pgm"].feat[0] == round(int(gray.sum()) / 16, 6)
    assert "decode requires" in rows["/img/bad.png"].decode_error
    assert rows["/img/bad.png"].feat is None
    assert "truncated" in rows["/img/trunc.bmp"].decode_error


def test_audio_features_real_wav(spark):
    samples = rng.integers(-20000, 20000, size=128, dtype=np.int16)
    df = spark.createDataFrame(
        [("/a/clip.wav", bytearray(encode_wav16(samples, rate=8000)))],
        "file_path string, content binary",
    )
    row = audio_features(df).collect()[0]
    assert row.decode_error is None
    assert row.n_samples == 128
    assert row.sample_rate == 8000
    s = samples.astype(np.int64)
    mean = int(s.sum()) / 128
    assert row.amp_mean == round(mean, 6)
    assert row.amp_std == round(
        math.sqrt(max(int((s * s).sum()) / 128 - mean * mean, 0.0)), 6
    )


def test_audio_features_error_isolation(spark):
    df = spark.createDataFrame(
        [("/a/bad.mp3", bytearray(b"ID3 not a wav"))], "file_path string, content binary"
    )
    row = audio_features(df).collect()[0]
    assert row.amp_mean is None
    assert "RIFF" in row.decode_error
