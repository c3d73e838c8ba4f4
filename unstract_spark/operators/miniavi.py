"""Pure-stdlib AVI (RIFF) mux/demux for uncompressed DIB video frames.

The reference engine treats every non-text payload as opaque bytes and
ships no video path at all; this module closes the video leg of the
multimodal column trio (image/audio/video) for training-data prep the
same way minipdf/minijpeg closed PDF and JPEG: the container format is
simpler than its reputation. An AVI file is a RIFF chunk tree —

    RIFF('AVI '
      LIST('hdrl' avih LIST('strl' strh strf))
      LIST('movi' 00db 00db ...)
      idx1)

— and with the stock uncompressed-DIB codec (``fccHandler='DIB '``,
``biCompression=BI_RGB``) each ``00db`` chunk is exactly a BMP pixel
array: bottom-up BGR rows padded to 4-byte stride, i.e. the decode the
BMP path already does minus the file header.

Scope (documented, deliberate): one 'vids' stream, 24-bit BI_RGB
frames. Compressed streams ('00dc' chunks or a non-zero
biCompression) raise ``ValueError`` — re-encoding real-world H.264 is
a library boundary, while frame *sampling*, the Spark-side plumbing,
and the uncompressed codec are fully real and oracle-gated
(queries.mm_video_features).
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


class AviMeta(NamedTuple):
    width: int
    height: int
    bpp: int
    n_frames: int
    usec_per_frame: int


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + size + body (+ pad byte to word-align)."""
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _dib_rows(frame: np.ndarray) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> bottom-up BGR rows, 4-byte
    aligned — the BMP/DIB pixel-array convention."""
    if frame.ndim == 2:
        frame = np.stack([frame, frame, frame], axis=2)
    if frame.ndim != 3 or frame.shape[2] != 3:
        raise ValueError("frame must be (H, W) gray or (H, W, 3) RGB")
    h, w, _ = frame.shape
    bgr = np.ascontiguousarray(frame[::-1, :, ::-1], dtype=np.uint8)  # flip + RGB->BGR
    row_size = ((24 * w + 31) // 32) * 4
    pad = row_size - w * 3
    if pad == 0:
        return bgr.tobytes()
    padded = np.zeros((h, row_size), dtype=np.uint8)
    padded[:, : w * 3] = bgr.reshape(h, w * 3)
    return padded.tobytes()


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Frames (all same shape, uint8 gray or RGB) -> uncompressed AVI."""
    if not frames:
        raise ValueError("empty frame list")
    first = frames[0]
    h, w = first.shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one (H, W)")
    row_size = ((24 * w + 31) // 32) * 4
    frame_bytes = row_size * h
    usec = 1_000_000 // max(fps, 1)

    avih = struct.pack(
        "<14I",
        usec,               # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,                  # dwPaddingGranularity
        _AVIF_HASINDEX,     # dwFlags
        len(frames),        # dwTotalFrames
        0,                  # dwInitialFrames
        1,                  # dwStreams
        frame_bytes,        # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,         # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4h",
        b"vids",
        b"DIB ",
        0,            # dwFlags
        0, 0,         # wPriority, wLanguage
        0,            # dwInitialFrames
        1,            # dwScale
        max(fps, 1),  # dwRate (fps = rate/scale)
        0,            # dwStart
        len(frames),  # dwLength
        frame_bytes,  # dwSuggestedBufferSize
        0xFFFFFFFF & -1,  # dwQuality (-1 = default)
        0,            # dwSampleSize (0: video frames vary)
        0, 0, w, h,   # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,           # biSize
        w,
        h,            # positive: bottom-up
        1,            # biPlanes
        24,           # biBitCount
        0,            # biCompression = BI_RGB
        frame_bytes,  # biSizeImage
        0, 0, 0, 0,   # resolution + palette fields
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    idx_entries = []
    for f in frames:
        # idx1 offsets are relative to the start of the 'movi' list
        # data (i.e. position of the fourcc within the LIST body)
        idx_entries.append((len(movi_body), frame_bytes))
        movi_body += _chunk(b"00db", _dib_rows(f))
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00db" + struct.pack("<3I", _AVIIF_KEYFRAME, off, size)
            for off, size in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated AVI chunk")
        yield fourcc, body, size
        pos = body + size + (size % 2)  # word-aligned


def demux_avi(data: bytes) -> tuple[AviMeta, list[bytes]]:
    """AVI bytes -> (meta, raw DIB pixel arrays, one per frame).

    Walks the chunk tree directly (no idx1 dependency — the index is
    optional and players rebuild it the same way). Compressed streams
    are rejected loudly.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF) file")
    riff_size = int.from_bytes(data[4:8], "little")
    end = min(len(data), 8 + riff_size)

    meta: AviMeta | None = None
    usec = 0
    n_frames_hdr = 0
    frames: list[bytes] = []

    def parse_hdrl(pos: int, lend: int) -> None:
        nonlocal meta, usec, n_frames_hdr
        bpp = 24
        compression = 0
        w = h = 0
        for fourcc, body, size in _walk_chunks(data, pos, lend):
            if fourcc == b"avih" and size >= 40:
                usec = int.from_bytes(data[body : body + 4], "little")
                n_frames_hdr = int.from_bytes(data[body + 16 : body + 20], "little")
                w = int.from_bytes(data[body + 32 : body + 36], "little")
                h = int.from_bytes(data[body + 36 : body + 40], "little")
            elif fourcc == b"LIST" and data[body : body + 4] == b"strl":
                for f2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                    if f2 == b"strf" and s2 >= 40:
                        w = int.from_bytes(data[b2 + 4 : b2 + 8], "little", signed=True)
                        h = int.from_bytes(data[b2 + 8 : b2 + 12], "little", signed=True)
                        bpp = int.from_bytes(data[b2 + 14 : b2 + 16], "little")
                        compression = int.from_bytes(data[b2 + 16 : b2 + 20], "little")
        if compression != 0:
            raise ValueError(f"compressed AVI stream (biCompression={compression}) unsupported")
        if w <= 0 or h == 0:
            raise ValueError("degenerate AVI dimensions")
        meta = AviMeta(w, abs(h), bpp, n_frames_hdr, usec)

    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = data[body : body + 4]
        if ltype == b"hdrl":
            parse_hdrl(body + 4, body + size)
        elif ltype == b"movi":
            for f2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if f2[2:4] == b"dc":
                    raise ValueError("compressed AVI frame chunk ('..dc') unsupported")
                if f2[2:4] == b"db":
                    frames.append(data[b2 : b2 + s2])
    if meta is None:
        raise ValueError("AVI missing hdrl header list")
    meta = meta._replace(n_frames=len(frames) or meta.n_frames)
    return meta, frames


def decode_frame(meta: AviMeta, payload: bytes) -> np.ndarray:
    """One DIB pixel array -> (H, W, 3) RGB uint8 (24-bit BI_RGB)."""
    if meta.bpp != 24:
        raise ValueError(f"{meta.bpp}-bit AVI frames unsupported (24-bit BI_RGB only)")
    w, h = meta.width, meta.height
    row_size = ((24 * w + 31) // 32) * 4
    if len(payload) < row_size * h:
        raise ValueError("truncated AVI frame")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h).reshape(h, row_size)
    px = rows[::-1, : w * 3].reshape(h, w, 3)  # bottom-up -> top-down
    return px[:, :, ::-1]  # BGR -> RGB
