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
            ("/img/bad.jpg", bytearray(b"\xff\xd8\xff\xe0 jpeg-ish")),
            ("/img/trunc.bmp", bytearray(encode_bmp24(
                rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8))[:-8])),
        ],
        "file_path string, content binary",
    )
    rows = {r.file_path: r for r in image_features(df, fake=False).collect()}
    assert rows["/img/ok.pgm"].decode_error is None
    assert rows["/img/ok.pgm"].feat[0] == round(int(gray.sum()) / 16, 6)
    # JPEG decode is real (minijpeg.py): a JPEG-magic payload with no
    # frame/scan now fails inside the decoder, still row-isolated
    assert "JPEG missing SOF/SOS" in rows["/img/bad.jpg"].decode_error
    assert rows["/img/bad.jpg"].feat is None
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


# -- PNG (pure stdlib: zlib inflate + scanline unfiltering) --------------


def test_png_roundtrip_gray_and_rgb_all_filters():
    import numpy as np

    from unstract_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for f in range(5):  # None/Sub/Up/Average/Paeth, each alone
        g = rng.integers(0, 256, size=(9, 7), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(g, filters=[f])), g)
        rgb = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(rgb, filters=[f])), rgb)
    # default cycles all five filters across rows
    big = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(big)), big)


def test_png_alpha_channels_dropped():
    import zlib

    import numpy as np

    from unstract_spark.operators.multimodal import _PNG_SIG, decode_png

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    # hand-built 2x2 RGBA (color type 6), filter 0 rows
    px = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(2))
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 6, 0, 0, 0])
    data = (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out, px[:, :, :3])
    # gray+alpha (color type 4) -> gray plane
    px2 = np.arange(2 * 2 * 2, dtype=np.uint8).reshape(2, 2, 2)
    raw2 = b"".join(b"\x00" + px2[y].tobytes() for y in range(2))
    ihdr2 = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 4, 0, 0, 0])
    data2 = (
        _PNG_SIG
        + chunk(b"IHDR", ihdr2)
        + chunk(b"IDAT", zlib.compress(raw2))
        + chunk(b"IEND", b"")
    )
    out2 = decode_png(data2)
    assert out2.shape == (2, 2)
    assert np.array_equal(out2, px2[:, :, 0])


def test_png_palette_color_type():
    import zlib

    import numpy as np

    from unstract_spark.operators.multimodal import _PNG_SIG, decode_png

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    # 2x2 palette image: indices 0..3, gray palette -> (H, W)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    gray_pal = bytes([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40])
    data = (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", gray_pal)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (2, 2)
    assert out.tolist() == [[10, 20], [30, 40]]
    # color palette -> (H, W, 3)
    color_pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])
    data_c = (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", color_pal)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out_c = decode_png(data_c)
    assert out_c.shape == (2, 2, 3)
    assert out_c[0, 0].tolist() == [255, 0, 0] and out_c[1, 1].tolist() == [9, 8, 7]


def test_png_rejects_interlaced_16bit_and_garbage():
    import zlib

    import numpy as np
    import pytest as _pytest

    from unstract_spark.operators.multimodal import _PNG_SIG, decode_png, encode_png

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    def with_ihdr(bit_depth, color_type, interlace):
        ihdr = (
            (2).to_bytes(4, "big")
            + (2).to_bytes(4, "big")
            + bytes([bit_depth, color_type, 0, 0, interlace])
        )
        return (
            _PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
            + chunk(b"IEND", b"")
        )

    # Adam7 (interlace=1) is SUPPORTED since round 6; method 2 isn't real
    with _pytest.raises(ValueError, match="interlace"):
        decode_png(with_ihdr(8, 0, 2))
    with _pytest.raises(ValueError, match="16-bit"):
        decode_png(with_ihdr(16, 0, 0))
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX not png")
    with _pytest.raises(ValueError, match="size mismatch"):
        g = np.zeros((4, 4), dtype=np.uint8)
        decode_png(decode_truncate(encode_png(g)))


def decode_truncate(data: bytes) -> bytes:
    """Rebuild the PNG with its IDAT inflate output one row short."""
    import zlib

    from unstract_spark.operators.multimodal import _PNG_SIG

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    # parse out IHDR, shrink the raw stream by one scanline
    ihdr = data[16:29]
    pos = 8
    idat = bytearray()
    while pos + 8 <= len(data):
        length = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += data[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    short = raw[: len(raw) - 5]  # drop one 4-wide gray scanline
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(short))
        + chunk(b"IEND", b"")
    )


def test_image_features_real_png(spark):
    import numpy as np

    from unstract_spark.operators.multimodal import encode_png, image_features

    g = np.full((8, 8), 100, dtype=np.uint8)
    g[0, 0] = 228  # one bright pixel: mean = (63*100 + 228)/64 = 102.0
    rgb = np.stack([g, g, g], axis=2)
    df = spark.createDataFrame(
        [
            ("/img/gray.png", bytearray(encode_png(g))),
            ("/img/color.png", bytearray(encode_png(rgb))),
            ("/img/interlaced.png", bytearray(b"\x89PNG\r\n\x1a\njunk")),
        ],
        "file_path string, content binary",
    )
    rows = {
        r.file_path: r
        for r in image_features(df, fake=False).collect()
    }
    for p in ("/img/gray.png", "/img/color.png"):
        assert rows[p].decode_error is None
        assert rows[p].feat[0] == 102.0  # identical luma for gray and RGB
        assert rows[p].feat[2] == 0.0 and rows[p].feat[3] == 63.0  # bins
    assert rows["/img/interlaced.png"].feat is None
    assert "PNG" in rows["/img/interlaced.png"].decode_error


# -- property-based PNG round-trip ---------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    rgb=st.booleans(),
    filt=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(w, h, rgb, filt, seed):
    """decode(encode(img, any filter sequence)) == img for arbitrary
    sizes, both color layouts, any per-row filter assignment."""
    import numpy as np

    from unstract_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(img, filters=filt))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


# --- Adam7 interlaced PNG --------------------------------------------


def _encode_adam7_png(img):
    """Hand-rolled Adam7 encoder for the round-trip test: split the
    image into the seven passes, filter-0 every scanline, one zlib
    stream, standard chunk layout."""
    import struct
    import zlib

    import numpy as np

    from unstract_spark.operators.multimodal import _ADAM7_PASSES

    h, w = img.shape[:2]
    channels = 1 if img.ndim == 2 else img.shape[2]
    ctype = 0 if channels == 1 else 2
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7_PASSES:
        rows = np.arange(y0, h, dy)
        cols = np.arange(x0, w, dx)
        if len(rows) == 0 or len(cols) == 0:
            continue
        sub = img[np.ix_(rows, cols)]
        for r in range(len(rows)):
            raw.append(0)  # filter None
            raw += sub[r].tobytes()

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)  # interlace=1
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_adam7_png_roundtrips_gray_and_rgb():
    import numpy as np

    from unstract_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(9)
    for shape in ((13, 9), (8, 8), (1, 7), (5, 1), (16, 24, 3)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(_encode_adam7_png(img))
        assert got.shape == img.shape, shape
        assert (got == img).all(), shape


def test_adam7_truncated_raises():
    import numpy as np
    import pytest

    from unstract_spark.operators.multimodal import decode_png

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = _encode_adam7_png(img)
    # chop the IDAT payload: re-assemble with half the stream
    import struct
    import zlib

    from unstract_spark.operators.multimodal import _ADAM7_PASSES  # noqa: F401

    sig, rest = data[:8], data[8:]
    # find IDAT
    pos = 0
    chunks = []
    while pos < len(rest):
        ln = int.from_bytes(rest[pos : pos + 4], "big")
        tag = rest[pos + 4 : pos + 8]
        body = rest[pos + 8 : pos + 8 + ln]
        chunks.append((tag, body))
        pos += 12 + ln
    out = sig
    for tag, body in chunks:
        if tag == b"IDAT":
            # decompress, drop the tail, recompress -> short stream
            raw = zlib.decompress(body)
            body = zlib.compress(raw[: len(raw) // 2])
        out += (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(out)
