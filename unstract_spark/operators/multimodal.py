"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Pattern: `binary` payload column + a `struct` of modality metadata
(mime, width/height or duration, codec). Decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` stages.

Decode is REAL for the formats a pure-stdlib decoder can handle —
uncompressed BMP (8-bit palette / 24-bit / 32-bit), binary PGM/PPM
(P5/P6), 8-bit non-interlaced PNG (zlib inflate + Sub/Up/Average/Paeth
unfiltering — zlib ships with Python), baseline sequential JPEG
(marker walk + Huffman + IDCT, `minijpeg.py` — gray and YCbCr incl.
subsampled chroma and restart markers), PCM WAV (8/16-bit), and
uncompressed-DIB AVI video (RIFF chunk walk + per-frame BMP-style
decode, `miniavi.py`) — the same move as minipdf.py for PDFs.
Compressed video codecs (H.264/MP4) would need ffmpeg, which is not in
this container: those raise unless `fake=True`, which substitutes a
deterministic fake decode (seeded from the payload hash) so the
Spark-side plumbing stays testable for any payload.

Feature extraction is integer-exact (int64 sums over pixel/sample
values, one final double division) so the feature vectors are
reproducible bit-for-bit by a SQL oracle — that is what gates the
decoders in the correctness registry (queries.mm_image_features /
mm_audio_features).

Scale notes: binaries are read with binaryFile (4 MiB chunk streaming
under the hood); `spark.sql.files.maxPartitionBytes` bounds task input;
feature extraction repartitions by payload size bucket so one giant
video doesn't straggle a task.

Reference parity: the reference treats non-text files as opaque blobs
routed to external OCR/LLM-vision adapters (sdk1 x2text adapters);
first-class image/audio columns are beyond-reference north-star scope.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


# ---------------------------------------------------------------------
# Pure-stdlib decoders (numpy for the pixel buffer only)
# ---------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed Windows BMP -> (H, W) gray or (H, W, 3) RGB uint8.

    Supports BITMAPINFOHEADER(+) with 8-bit palette, 24-bit BGR and
    32-bit BGRA pixels, bottom-up or top-down row order, BI_RGB only.
    """
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pix_off = int.from_bytes(data[10:14], "little")
    hdr_size = int.from_bytes(data[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs unsupported")
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    if width <= 0 or height == 0:
        raise ValueError("degenerate BMP dimensions")
    top_down = height < 0
    height = abs(height)
    row_size = ((bpp * width + 31) // 32) * 4
    need = pix_off + row_size * height
    if len(data) < need:
        raise ValueError("truncated BMP pixel array")
    raw = np.frombuffer(data, dtype=np.uint8, count=row_size * height, offset=pix_off)
    rows = raw.reshape(height, row_size)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        n_colors = int.from_bytes(data[46:50], "little") or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(-1, 4)
        idx = rows[:, :width]
        if np.all(pal[:, 0] == pal[:, 1]) and np.all(pal[:, 1] == pal[:, 2]):
            return pal[idx, 0]  # grayscale palette -> (H, W)
        return pal[idx][:, :, [2, 1, 0]]  # BGRA palette -> RGB
    if bpp == 24:
        px = rows[:, : width * 3].reshape(height, width, 3)
        return px[:, :, ::-1]  # BGR -> RGB
    if bpp == 32:
        px = rows[:, : width * 4].reshape(height, width, 4)
        return px[:, :, [2, 1, 0]]  # BGRA -> RGB
    raise ValueError(f"{bpp}-bit BMP unsupported")


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary PGM/PPM (P5/P6) -> (H, W) gray or (H, W, 3) RGB uint8.

    Header tokens may be separated by any whitespace and `#` comments;
    maxval must fit one byte (<=255).
    """
    if len(data) < 2 or data[0:1] != b"P" or data[1:2] not in b"56":
        raise ValueError("not a binary PGM/PPM (P5/P6) file")
    channels = 1 if data[1:2] == b"5" else 3
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixels
    width, height, maxval = tokens
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PNM dimensions")
    if not 0 < maxval <= 255:
        raise ValueError("multi-byte PNM maxval unsupported")
    n = width * height * channels
    if len(data) - pos < n:
        raise ValueError("truncated PNM pixel data")
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    if channels == 1:
        return px.reshape(height, width)
    return px.reshape(height, width, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> raw channel count (8-bit samples)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# Adam7 pass grid: (x_start, y_start, x_step, y_step), PNG spec 8.2
_ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Reverse the per-scanline filters over one (sub-)image's raw
    bytes -> (height, width*channels) uint8. Shared by the sequential
    path and each Adam7 pass (a pass filters against its own previous
    scanline, exactly like a small standalone image)."""
    stride = width * channels
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:  # None
            pass
        elif f == 2:  # Up — uint8 addition wraps mod 256, per spec
            line += prev
        elif f in (1, 3, 4):  # Sub/Average/Paeth need a left-to-right scan
            rec = np.empty(stride, dtype=np.int32)
            cur = line.astype(np.int32)
            pr = prev.astype(np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = pr[x]
                c = pr[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:  # Paeth predictor
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (cur[x] + pred) & 0xFF
            line = rec.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = line
        prev = line
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (H, W) gray or (H, W, 3) RGB uint8, pure stdlib.

    PNG is a chunk walk (IHDR/PLTE/IDAT/IEND) + zlib inflate (stdlib)
    + per-scanline unfiltering — the same "the format is simpler than
    its reputation" move as minipdf.py. Supported: 8-bit depth, color
    types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha, alpha
    dropped), 6 (RGBA, alpha dropped); BOTH interlace methods (none +
    Adam7 — each of the seven passes unfilters independently then
    scatters onto the 8x8 grid). Rejected loudly: 16-bit depth and
    sub-byte depths (each raises ValueError naming the limitation — a
    row-level error in the pipeline, never a wrong pixel).
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos = 8
    ihdr = plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing/short IHDR")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _, _, interlace = ihdr[8:13]
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if bit_depth != 8:
        raise ValueError(f"{bit_depth}-bit PNG unsupported (8-bit only)")
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"PNG color type {color_type} unsupported")
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PNG dimensions")
    import zlib

    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        stride = width * channels
        if len(raw) != (stride + 1) * height:
            raise ValueError("PNG pixel data size mismatch")
        out = _png_unfilter(raw, width, height, channels)
    else:
        # Adam7: seven independently-filtered sub-images scattered on
        # an 8x8 grid (PNG spec 8.2); each pass unfilters like a tiny
        # non-interlaced image, then its pixels land at
        # (y0 + i*dy, x0 + j*dx)
        out = np.zeros((height, width * channels), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * channels
            need = (pstride + 1) * ph
            if offset + need > len(raw):
                raise ValueError("PNG pixel data size mismatch (Adam7)")
            sub = _png_unfilter(raw[offset : offset + need], pw, ph, channels)
            offset += need
            rows = np.arange(y0, height, dy)[:ph]
            cols = np.arange(x0, width, dx)[:pw]
            px = sub.reshape(ph, pw, channels)
            grid = out.reshape(height, width, channels)
            grid[np.ix_(rows, cols)] = px
        if offset != len(raw):
            raise ValueError("PNG pixel data size mismatch (Adam7 tail)")
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8)[: (len(plte) // 3) * 3].reshape(-1, 3)
        px = pal[out]
        if np.all(px[:, :, 0] == px[:, :, 1]) and np.all(px[:, :, 1] == px[:, :, 2]):
            return px[:, :, 0]  # grayscale palette -> (H, W)
        return px
    if color_type == 0:
        return out
    px = out.reshape(height, width, channels)
    if color_type == 2:
        return px
    if color_type == 4:
        return px[:, :, 0]  # gray + alpha -> gray
    return px[:, :, :3]  # RGBA -> RGB


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (samples int64 [n] or [n, channels], sample_rate).

    RIFF chunk walk; `fmt ` must be PCM (format 1), 8-bit unsigned
    (centered to signed) or 16-bit signed little-endian.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_format = int.from_bytes(body[0:2], "little")
            if audio_format != 1:
                raise ValueError(f"non-PCM WAV (format {audio_format}) unsupported")
            fmt = {
                "channels": int.from_bytes(body[2:4], "little"),
                "rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt["bits"] == 16:
        arr = np.frombuffer(samples, dtype="<i2").astype(np.int64)
    elif fmt["bits"] == 8:
        arr = np.frombuffer(samples, dtype=np.uint8).astype(np.int64) - 128
    else:
        raise ValueError(f"{fmt['bits']}-bit PCM unsupported")
    ch = max(fmt["channels"], 1)
    if ch > 1:
        arr = arr[: len(arr) - len(arr) % ch].reshape(-1, ch)
    return arr, fmt["rate"]


def _decode_one(payload: bytes, fake: bool) -> np.ndarray:
    """Dispatch on magic bytes; `fake` substitutes a deterministic 4x4
    fake image for formats with no stdlib decoder (video frames/...)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:1] == b"P" and payload[1:2] in b"56":
        return decode_pnm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from unstract_spark.operators.minijpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from unstract_spark.operators.minigif import decode_gif

        return decode_gif(payload)
    if not fake:
        raise NotImplementedError(
            "unsupported image format (uncompressed BMP, binary PGM/PPM, "
            "8-bit PNG incl. Adam7, baseline/extended/PROGRESSIVE JPEG "
            "and GIF87a/89a decode natively — see minijpeg.py / "
            "minigif.py); pass fake=True for the deterministic test double"
        )
    # deterministic fake: 4x4 grayscale derived from content hash
    h = hashlib.sha256(payload or b"").digest()
    return np.frombuffer(h[:16], dtype=np.uint8).reshape(4, 4)


def _gray(img: np.ndarray) -> np.ndarray:
    """RGB -> integer luma (channel mean, floor). Keeps features in the
    exact-int domain so the SQL oracle can reproduce them."""
    if img.ndim == 3:
        return img.astype(np.int64).sum(axis=2) // img.shape[2]
    return img.astype(np.int64)


def _int_stats(values: np.ndarray) -> tuple[float, float, list[int]]:
    """(mean, population std, 4-bin histogram) with int64 accumulation.

    Every sum is exact; the only float ops are two divisions, one
    multiply/subtract, and a sqrt — each mirrored verbatim in the
    oracle SQL, so the doubles match bit-for-bit.
    """
    flat = values.reshape(-1)
    n = flat.size
    if n == 0:
        return 0.0, 0.0, [0, 0, 0, 0]
    s = int(flat.sum())
    ss = int((flat * flat).sum())
    mean = s / n
    var = ss / n - mean * mean
    std = math.sqrt(max(var, 0.0))
    bins = np.minimum(flat >> 6, 3)  # v // 64, clamped for v > 255
    counts = [int((bins == i).sum()) for i in range(4)]
    return mean, std, counts


def image_features(
    df: DataFrame,
    payload_col: str = "content",
    id_col: str = "file_path",
    fake: bool = True,
) -> DataFrame:
    """Decode + global feature vector per image.

    feat = [round(mean,6), round(std,6), b0, b1, b2, b3] over the
    integer luma plane (b_i = pixels with value//64 == i). Per-row
    errors are isolated into the error column — a failed decode never
    fails the job (reference per-file error isolation,
    legacy_executor.py:159-163).
    """
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("feat", T.ArrayType(T.DoubleType())),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, errs = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(rid)
                try:
                    img = _decode_one(bytes(payload) if payload is not None else b"", fake)
                    mean, std, counts = _int_stats(_gray(img))
                    feats.append(
                        [round(mean, 6), round(std, 6)] + [float(c) for c in counts]
                    )
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    feats.append(None)
                    errs.append(str(e)[:200])
            yield pd.DataFrame({id_col: ids, "feat": feats, "decode_error": errs})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def box_downscale(img: np.ndarray, factor: int) -> np.ndarray:
    """Integer box-average downscale (the standard thumbnail kernel).

    Output pixel = floor(mean of the factor x factor block), computed
    with int64 sums — exact-int domain, so a SQL oracle can reproduce
    downstream features. Trailing rows/cols that don't fill a block are
    dropped (consistent with how thumbnailers crop to the grid).
    """
    if factor < 1:
        raise ValueError("downscale factor must be >= 1")
    h, w = img.shape[0], img.shape[1]
    oh, ow = h // factor, w // factor
    if oh == 0 or ow == 0:
        raise ValueError(f"image {h}x{w} smaller than one {factor}x{factor} block")
    img = img[: oh * factor, : ow * factor]
    if img.ndim == 2:
        blocks = img.astype(np.int64).reshape(oh, factor, ow, factor)
        return (blocks.sum(axis=(1, 3)) // (factor * factor)).astype(np.uint8)
    c = img.shape[2]
    blocks = img.astype(np.int64).reshape(oh, factor, ow, factor, c)
    return (blocks.sum(axis=(1, 3)) // (factor * factor)).astype(np.uint8)


def resize_images(
    df: DataFrame,
    factor: int,
    payload_col: str = "content",
    id_col: str = "file_path",
    fake: bool = True,
) -> DataFrame:
    """Decode + box-downscale each image; emit raw pixels + dims.

    Output: (id, width, height, channels, pixels binary row-major,
    resize_error) — the thumbnail stage of an image-training pipeline,
    as an Arrow-batched mapInPandas with per-row error isolation.
    Downstream stages (feature extraction, re-encode, dedup on
    thumbnail hash) consume the raw buffer without re-decoding.
    """
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
            T.StructField("resize_error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(rid)
                try:
                    img = _decode_one(bytes(payload) if payload is not None else b"", fake)
                    small = box_downscale(img, factor)
                    ch = 1 if small.ndim == 2 else small.shape[2]
                    out["width"].append(small.shape[1])
                    out["height"].append(small.shape[0])
                    out["channels"].append(ch)
                    out["pixels"].append(small.tobytes())
                    out["resize_error"].append(None)
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["pixels"].append(None)
                    out["resize_error"].append(str(e)[:200])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def audio_features(
    df: DataFrame,
    payload_col: str = "content",
    id_col: str = "file_path",
) -> DataFrame:
    """Decode PCM WAV + per-clip amplitude stats.

    Output: (id, n_samples, sample_rate, amp_mean, amp_std,
    decode_error) — int-exact accumulation like image_features, so the
    registry oracle reproduces the doubles. Multi-channel clips are
    flattened (stats over all interleaved samples).
    """
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sample_rate", T.LongType()),
            T.StructField("amp_mean", T.DoubleType()),
            T.StructField("amp_std", T.DoubleType()),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(rid)
                try:
                    samples, rate = decode_wav(
                        bytes(payload) if payload is not None else b""
                    )
                    mean, std, _ = _int_stats(samples)
                    out["n_samples"].append(samples.size)
                    out["sample_rate"].append(rate)
                    out["amp_mean"].append(round(mean, 6))
                    out["amp_std"].append(round(std, 6))
                    out["decode_error"].append(None)
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    out["n_samples"].append(None)
                    out["sample_rate"].append(None)
                    out["amp_mean"].append(None)
                    out["amp_std"].append(None)
                    out["decode_error"].append(str(e)[:200])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------
# Encoders (test/fixture side — build real payloads without PIL)
# ---------------------------------------------------------------------


def encode_pgm(pixels: np.ndarray) -> bytes:
    """(H, W) uint8 -> binary PGM (P5)."""
    h, w = pixels.shape
    return b"P5\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6)."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """(H, W, 3) RGB uint8 -> 24-bit bottom-up BI_RGB BMP."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = (
        b"BM"
        + (54 + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(pixels[y, :, ::-1].astype(np.uint8).tobytes() + pad)  # RGB->BGR
    return header + b"".join(rows)


def _png_filter_lines(
    flat: np.ndarray, channels: int, filters: list[int]
) -> bytearray:
    """Filter one (sub-)image's scanlines (rows of width*channels int32)
    into the PNG line stream — shared by the sequential path and each
    Adam7 pass."""
    bpp = channels
    lines = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.int32)
    for y in range(flat.shape[0]):
        f = filters[y % len(filters)]
        cur = flat[y]
        if f == 0:
            enc = cur
        elif f == 1:
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = cur - a
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = cur - (a + prev) // 2
        elif f == 4:
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c)
            )
            enc = cur - pred
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        lines.append(f)
        lines += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    return lines


def encode_png(
    pixels: np.ndarray,
    filters: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> 8-bit PNG.

    `filters` picks the filter type per scanline (cycled); the default
    cycles 0..4 so a round-trip exercises EVERY unfilter path
    (None/Sub/Up/Average/Paeth) — that is what lets the oracle-gated
    registry query vouch for the whole decoder, not just filter 0.
    `interlace=True` emits Adam7: the seven passes are filtered
    independently (each against its own previous scanline) into one
    zlib stream, per spec.
    """
    import zlib

    if pixels.ndim == 2:
        color_type, channels = 0, 1
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError("encode_png expects (H, W) or (H, W, 3) uint8")
    px = pixels.astype(np.uint8)
    h, w = px.shape[0], px.shape[1]
    filters = filters or [0, 1, 2, 3, 4]
    if not interlace:
        flat = px.reshape(h, w * channels).astype(np.int32)
        lines = _png_filter_lines(flat, channels, filters)
    else:
        grid = px.reshape(h, w, channels)
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7_PASSES:
            rows = np.arange(y0, h, dy)
            cols = np.arange(x0, w, dx)
            if len(rows) == 0 or len(cols) == 0:
                continue
            sub = grid[np.ix_(rows, cols)].reshape(
                len(rows), len(cols) * channels
            ).astype(np.int32)
            lines += _png_filter_lines(sub, channels, filters)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, int(interlace)])
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def encode_wav16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> PCM WAV."""
    body = samples.astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    return (
        b"RIFF"
        + (4 + 8 + len(fmt) + 8 + len(body)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(body).to_bytes(4, "little")
        + body
    )


def _video_frame_thunks(payload: bytes):
    """((width, height), [lazy RGB decoders]) for any supported video
    container — uncompressed-DIB AVI or full-redraw animated GIF. The
    thunks defer the per-frame decode so sampling stays cheaper than
    decoding (AVI: DIB unpack; GIF: each block's LZW stream is
    self-contained)."""
    from unstract_spark.operators.miniavi import decode_frame, demux_avi
    from unstract_spark.operators.minigif import gif_frame_thunks

    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        meta, raw = demux_avi(payload)
        return (
            (meta.width, meta.height),
            [lambda r=r: decode_frame(meta, r) for r in raw],
        )
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return gif_frame_thunks(payload)
    raise ValueError("unsupported video container (uncompressed AVI or GIF)")


def frame_sample(
    df: DataFrame,
    payload_col: str = "content",
    id_col: str = "file_path",
    every_n: int = 30,
) -> DataFrame:
    """REAL video frame sampling: demux the container (AVI or animated
    GIF), keep every `every_n`-th frame, emit one row per sampled
    frame with its re-encoded still-image payload (PPM — downstream
    image stages decode it like any other image column).

    One input video row fans out to n_frames/every_n rows; the demux +
    per-frame decode runs inside one Arrow batch pass, and the SAMPLING
    happens before decode — skipped frames are never unpacked (at
    cluster scale the chunk walk is I/O-sequential, decode is the CPU
    cost). Per-row errors isolate into `decode_error` like every other
    multimodal stage.
    """
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("frame_number", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    (w, h), thunks = _video_frame_thunks(
                        bytes(payload) if payload is not None else b""
                    )
                    for i in range(0, len(thunks), max(every_n, 1)):
                        img = thunks[i]()
                        rows.append((rid, i, w, h, encode_ppm(img), None))
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    rows.append((rid, None, None, None, None, str(e)[:200]))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_number", "width", "height", "frame", "decode_error"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def video_frame_features(
    df: DataFrame,
    payload_col: str = "content",
    id_col: str = "file_path",
    every_n: int = 30,
) -> DataFrame:
    """Per-sampled-frame feature vectors straight off the demuxer.

    Same integer-exact stats as `image_features` ([mean, std, 4-bin
    histogram] over the luma plane), one row per (video, sampled
    frame) — fused demux+decode+feature in a single mapInPandas pass
    so sampled frames never round-trip through an image container.
    Containers: uncompressed-DIB AVI and full-redraw animated GIF.
    """
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("frame_number", T.LongType()),
            T.StructField("feat", T.ArrayType(T.DoubleType())),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _wh, thunks = _video_frame_thunks(
                        bytes(payload) if payload is not None else b""
                    )
                    for i in range(0, len(thunks), max(every_n, 1)):
                        mean, std, counts = _int_stats(_gray(thunks[i]()))
                        feat = [round(mean, 6), round(std, 6)] + [float(c) for c in counts]
                        rows.append((rid, i, feat, None))
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    rows.append((rid, None, None, str(e)[:200]))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_number", "feat", "decode_error"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    payload_col: str = "content",
    id_col: str = "file_path",
    every_n: int = 30,
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index.

    The size-estimate twin of `frame_sample` for opaque/compressed
    containers the stdlib demuxer rejects: the row-explosion plumbing
    (a 2h video becomes ~7k rows) is real — frame count is estimated
    from payload size, then posexplode.
    """
    est_frames = (F.coalesce(F.length(F.col(payload_col)), F.lit(0)) / 1024).cast("int") + 1
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(est_frames / every_n - 1, F.lit(0)).cast("int"))
        ).alias("sample_no", "frame_idx"),
    ).select(
        id_col, "sample_no", (F.col("frame_idx") * every_n).alias("frame_number")
    )


def decimate_pcm(
    samples: "np.ndarray", factor: int, rate: int
) -> tuple["np.ndarray", int]:
    """The exact-integer box-decimation kernel shared by
    downsample_audio and fused single-pass pipelines: each output
    sample is floor(mean) of its `factor`-group (int64 sums, floor
    division — no float), trailing partial group averaged over its
    actual length. Returns (int16 samples, new rate)."""
    s = samples.astype(np.int64)
    n = len(s)
    groups = (n + factor - 1) // factor
    sums = np.zeros(groups, dtype=np.int64)
    np.add.at(sums, np.arange(n) // factor, s)
    sizes = np.full(groups, factor, dtype=np.int64)
    if n % factor:
        sizes[-1] = n % factor
    small = np.floor_divide(sums, sizes).astype(np.int16)
    return small, max(1, rate // factor)


def downsample_audio(
    df: DataFrame,
    factor: int,
    payload_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode WAV + integer box-downsample by `factor`; emit the
    re-encoded WAV at rate/factor — the audio twin of resize_images
    (the standard pre-feature decimation stage).

    Each output sample is floor(mean) of its `factor`-sample group in
    the EXACT integer domain (int64 sums, floor division — no float in
    the kernel), so the result is reproducible bit-for-bit by a SQL
    oracle from the same source samples. A trailing partial group
    averages over its actual length. Per-row error isolation; output:
    (id, content, sample_rate, n_samples, resample_error).
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor!r}")
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("content", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("resample_error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(rid)
                try:
                    samples, rate = decode_wav(
                        bytes(payload) if payload is not None else b""
                    )
                    small, new_rate = decimate_pcm(samples, factor, rate)
                    out["content"].append(encode_wav16(small, rate=new_rate))
                    out["sample_rate"].append(new_rate)
                    out["n_samples"].append(len(small))
                    out["resample_error"].append(None)
                except Exception as ex:  # noqa: BLE001 — row-level isolation
                    out["content"].append(None)
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["resample_error"].append(f"{type(ex).__name__}: {ex}")
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def tile_images(
    df: DataFrame,
    tile: int,
    payload_col: str = "content",
    id_col: str = "file_path",
    fake: bool = True,
) -> DataFrame:
    """ViT-style patch extraction: decode each image and emit one row
    per `tile` x `tile` patch with integer-exact pixel stats — the
    prep stage before per-patch embedding (the row-per-patch layout is
    what a patch-embedding mapInPandas consumes downstream). Edge
    patches smaller than `tile` are kept with their true pixel count.

    Output: (id, tile_row, tile_col, tile_h, tile_w, px_sum,
    px_mean_floor = px_sum DIV n_px, tile_error). Sums accumulate in
    int64 over all channels, so every emitted number is reproducible
    by a SQL oracle from the source pixel values. Row-level error
    isolation like the other decode stages.
    """
    if tile < 1:
        raise ValueError(f"tile must be >= 1, got {tile!r}")
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("tile_row", T.IntegerType()),
            T.StructField("tile_col", T.IntegerType()),
            T.StructField("tile_h", T.IntegerType()),
            T.StructField("tile_w", T.IntegerType()),
            T.StructField("px_sum", T.LongType()),
            T.StructField("px_mean_floor", T.LongType()),
            T.StructField("tile_error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}

            def emit(rid, tr=None, tc=None, th=None, tw=None, s=None,
                     m=None, err=None):
                out[id_col].append(rid)
                out["tile_row"].append(tr)
                out["tile_col"].append(tc)
                out["tile_h"].append(th)
                out["tile_w"].append(tw)
                out["px_sum"].append(s)
                out["px_mean_floor"].append(m)
                out["tile_error"].append(err)

            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = _decode_one(
                        bytes(payload) if payload is not None else b"", fake
                    )
                    if img.ndim == 2:
                        img = img[:, :, None]
                    h, w = img.shape[0], img.shape[1]
                    ch = img.shape[2]
                    if h == 0 or w == 0:
                        # keep the every-input-produces-a-row contract:
                        # a degenerate image yields zero tiles, which
                        # would otherwise vanish silently
                        emit(rid, err="degenerate image: 0 pixels")
                        continue
                    for tr in range((h + tile - 1) // tile):
                        for tc in range((w + tile - 1) // tile):
                            patch = img[
                                tr * tile : (tr + 1) * tile,
                                tc * tile : (tc + 1) * tile,
                            ]
                            n_px = patch.shape[0] * patch.shape[1] * ch
                            s = int(patch.astype(np.int64).sum())
                            emit(
                                rid, tr, tc, patch.shape[0], patch.shape[1],
                                s, s // n_px,
                            )
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    emit(rid, err=str(e)[:200])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def augment_images(
    df: DataFrame,
    crop: int,
    payload_col: str = "content",
    id_col: str = "file_path",
    fake: bool = True,
) -> DataFrame:
    """Training-data image augmentation under integer-exact gates:
    horizontal flip then center crop — the two canonical deterministic
    augmentations (random variants are the same kernels with a seeded
    per-row choice).  Emitted stats are position-sensitive so the gate
    actually certifies geometry: `wcol_sum` weights each pixel by its
    POST-FLIP column index (a plain sum is flip-invariant and would
    gate nothing), `crop_sum` totals the centered crop window.

    Output: (id, h, w, wcol_sum, crop_h, crop_w, crop_sum, aug_error);
    int64 throughout, row-level error isolation like every decode
    stage.
    """
    if crop < 1:
        raise ValueError(f"crop must be >= 1, got {crop!r}")
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("h", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("wcol_sum", T.LongType()),
            T.StructField("crop_h", T.IntegerType()),
            T.StructField("crop_w", T.IntegerType()),
            T.StructField("crop_sum", T.LongType()),
            T.StructField("aug_error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}

            def emit(rid, h=None, w=None, ws=None, ch_=None, cw=None,
                     cs=None, err=None):
                out[id_col].append(rid)
                out["h"].append(h)
                out["w"].append(w)
                out["wcol_sum"].append(ws)
                out["crop_h"].append(ch_)
                out["crop_w"].append(cw)
                out["crop_sum"].append(cs)
                out["aug_error"].append(err)

            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = _decode_one(
                        bytes(payload) if payload is not None else b"", fake
                    )
                    if img.ndim == 2:
                        img = img[:, :, None]
                    h, w = img.shape[0], img.shape[1]
                    if h == 0 or w == 0:
                        emit(rid, err="degenerate image: 0 pixels")
                        continue
                    flipped = img[:, ::-1, :].astype(np.int64)
                    weights = np.arange(1, w + 1, dtype=np.int64)[None, :, None]
                    ws = int((flipped * weights).sum())
                    ch_ = min(crop, h)
                    cw = min(crop, w)
                    r0 = (h - ch_) // 2
                    c0 = (w - cw) // 2
                    cs = int(flipped[r0 : r0 + ch_, c0 : c0 + cw, :].sum())
                    emit(rid, h, w, ws, ch_, cw, cs)
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    emit(rid, err=str(e)[:200])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
