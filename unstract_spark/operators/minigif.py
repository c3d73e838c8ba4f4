"""GIF decode/encode (GIF87a/89a), pure stdlib + numpy.

Same move as minipdf.py / minijpeg.py: the format is a header walk +
LZW — no external codec needed. GIF is lossless palette indexing, so
unlike JPEG the round trip is bit-exact for ANY image, which lets the
decoder sit directly under the byte-for-byte resize/feature gates.

Decoder scope: first image frame of GIF87a/GIF89a, global or local
color table, interlaced or sequential row order, full LZW (growing
code widths to 12 bits, CLEAR/EOI handling, deferred-clear streams).
Extensions (GCE/comment/application) are skipped; animation means
"first frame" by design — frame compositing is out of scope and
raises nothing (the first frame IS a valid decode of the file).

Encoder scope (fixture side): one frame, 256-entry palette (grayscale
ramp or provided), emitted with the classic uncompressed-LZW trick —
every pixel as a literal code with a CLEAR before the code width
would grow past 9 bits. Valid output per the spec; any conformant
decoder (including this one, which implements REAL dictionary-growing
LZW) reads it back exactly.
"""

from __future__ import annotations

import numpy as np


def _u16(data: bytes, off: int) -> int:
    return int.from_bytes(data[off : off + 2], "little")


# 4-pass Adam-style interlace row schedule per the GIF spec
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gray_collapse(px: np.ndarray) -> np.ndarray:
    if np.all(px[:, :, 0] == px[:, :, 1]) and np.all(px[:, :, 1] == px[:, :, 2]):
        return px[:, :, 0]  # grayscale palette -> (H, W)
    return px


def _iter_gif_blocks(data: bytes):
    """Walk the GIF block stream; yields (decode_fn, left, top,
    transparency_set) per image block — decode_fn() -> RGB pixels.
    Decode is LAZY per block (each block's LZW stream is
    self-contained), so a frame sampler can walk the container and
    unpack only the frames it keeps."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    flags = data[10]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        global_pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    transparent = False
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            label = data[pos + 1] if pos + 1 < len(data) else 0
            ext_pos = pos + 2
            if label == 0xF9 and ext_pos < len(data) and data[ext_pos] >= 4:
                transparent = bool(data[ext_pos + 1] & 0x01)  # GCE flags
            pos = ext_pos
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        left, top = _u16(data, pos + 1), _u16(data, pos + 3)
        w, h = _u16(data, pos + 5), _u16(data, pos + 7)
        iflags = data[pos + 9]
        pos += 10
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image has no color table")
        min_code = data[pos]
        pos += 1
        # collect LZW sub-blocks
        chunks = []
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1  # block terminator

        def decode_fn(chunks=chunks, min_code=min_code, w=w, h=h, iflags=iflags, pal=pal):
            indices = _lzw_decode(b"".join(chunks), min_code, w * h)
            idx = np.array(indices, dtype=np.int32).reshape(h, w)
            if iflags & 0x40:  # interlaced: stored rows in 4-pass order
                order = [
                    y for start, step in _INTERLACE for y in range(start, h, step)
                ]
                deinterlaced = np.empty_like(idx)
                for src_row, dst_row in enumerate(order):
                    deinterlaced[dst_row] = idx[src_row]
                idx = deinterlaced
            if np.any(idx >= len(pal)):
                raise ValueError("GIF index out of palette range")
            return pal[idx]

        yield decode_fn, left, top, (w, h), transparent
        transparent = False


def decode_gif(data: bytes) -> np.ndarray:
    """GIF -> (H, W) gray or (H, W, 3) RGB uint8 (first frame)."""
    for decode_fn, _left, _top, _wh, _t in _iter_gif_blocks(data):
        return _gray_collapse(decode_fn())
    sw, sh = _u16(data, 6), _u16(data, 8)
    raise ValueError(f"GIF has no image data ({sw}x{sh} screen)")


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """All frames of an animated GIF as independent full redraws.

    Honest scope: every frame must cover the full logical screen at
    (0, 0) and no graphic-control transparency may be set — the
    "unoptimized" animation form where each frame is a complete image.
    Partial-region frames or transparent compositing raise loudly
    (disposal-method state machines are a re-encode concern, not a
    frame-sampling one).
    """
    sw, sh = _u16(data, 6), _u16(data, 8)
    frames: list[np.ndarray] = []
    for decode_fn, left, top, (w, h), transparent in _iter_gif_blocks(data):
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            raise ValueError(
                f"partial GIF frame ({left},{top} {w}x{h} on {sw}x{sh} "
                "screen): compositing unsupported, re-encode as full redraws"
            )
        if transparent:
            raise ValueError("transparent GIF frames unsupported (compositing)")
        frames.append(_gray_collapse(decode_fn()))
    if not frames:
        raise ValueError(f"GIF has no image data ({sw}x{sh} screen)")
    return frames


def gif_frame_thunks(data: bytes):
    """(n_frames, decode_fns) for the frame sampler: validates the
    full-redraw contract for EVERY block (cheap header checks) but
    LZW-decodes none — the sampler calls only the thunks it keeps."""
    sw, sh = _u16(data, 6), _u16(data, 8)
    thunks = []
    for decode_fn, left, top, (w, h), transparent in _iter_gif_blocks(data):
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            raise ValueError("partial GIF frame: compositing unsupported")
        if transparent:
            raise ValueError("transparent GIF frames unsupported (compositing)")
        thunks.append(decode_fn)
    if not thunks:
        raise ValueError(f"GIF has no image data ({sw}x{sh} screen)")
    return (sw, sh), thunks


def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> list[int]:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/EOI codes, dict
    grows to 4096 entries, code width grows with the dict."""
    clear = 1 << min_code
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset() -> int:
        table.clear()
        table.extend([i] for i in range(clear))
        table.append([])  # clear slot
        table.append([])  # eoi slot
        return min_code + 1

    width = reset()
    buf = 0
    nbits = 0
    prev: list[int] | None = None
    for byte in data:
        buf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = buf & ((1 << width) - 1)
            buf >>= width
            nbits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("invalid first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_expected:
                return out[:n_expected]
    return out


class _LzwBits:
    """LSB-first bit packer chunked into <=255-byte GIF sub-blocks."""

    def __init__(self) -> None:
        self.bytes = bytearray()
        self.buf = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.buf |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.buf & 0xFF)
        blocks = bytearray()
        for i in range(0, len(self.bytes), 255):
            chunk = self.bytes[i : i + 255]
            blocks.append(len(chunk))
            blocks += chunk
        blocks.append(0)
        return bytes(blocks)


def _lzw_encode(indices: np.ndarray, min_code: int) -> _LzwBits:
    """Real GIF LZW compression: longest-match dictionary, growing code
    width, CLEAR+reset at the 4096-entry ceiling."""
    clear = 1 << min_code
    eoi = clear + 1
    bits = _LzwBits()

    def reset() -> tuple[dict, int, int]:
        return ({(i,): i for i in range(clear)}, eoi + 1, min_code + 1)

    table, next_code, width = reset()
    bits.put(clear, width)
    prev: tuple[int, ...] = ()
    for v in indices:
        cand = prev + (int(v),)
        if cand in table:
            prev = cand
            continue
        bits.put(table[prev], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4096:
            bits.put(clear, width)
            table, next_code, width = reset()
        prev = (int(v),)
    if prev:
        bits.put(table[prev], width)
    bits.put(eoi, width)
    return bits


def encode_gif(
    pixels: np.ndarray, palette: np.ndarray | None = None, compress: bool = True
) -> bytes:
    """(H, W) palette-index/gray uint8 -> GIF89a, one frame.

    Default palette is the 256-entry grayscale ramp, so gray pixels
    round-trip exactly. `compress=True` runs real LZW (dictionary
    matches, KwKwK sequences, width growth — the decoder's full
    machinery); `compress=False` emits every pixel as a literal code
    with a CLEAR before the width would pass 9 bits (the
    spec-conformant "uncompressed GIF" trick).
    """
    return encode_gif_frames([pixels], palette=palette, compress=compress)


def _gif_image_block(pixels: np.ndarray, compress: bool) -> bytes:
    """One 0x2C image block (full-screen, sequential, global palette)."""
    h, w = pixels.shape
    min_code = 8
    clear = 1 << min_code  # 256
    eoi = clear + 1
    flat = pixels.astype(np.uint8).reshape(-1)
    if compress:
        bits = _lzw_encode(flat, min_code)
    else:
        bits = _LzwBits()
        bits.put(clear, 9)
        next_code = eoi + 1
        for v in flat:
            bits.put(int(v), 9)
            next_code += 1
            if next_code == 511:  # next emit would need 10 bits: reset first
                bits.put(clear, 9)
                next_code = eoi + 1
        bits.put(eoi, 9)
    return (
        b"\x2c"
        + (0).to_bytes(2, "little") * 2
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + b"\x00"
        + bytes([min_code])
        + bits.finish()
    )


def encode_gif_frames(
    frames: list[np.ndarray],
    palette: np.ndarray | None = None,
    compress: bool = True,
) -> bytes:
    """Frames of (H, W) palette indices -> animated GIF89a where every
    frame is a full redraw (the exact form decode_gif_frames accepts)."""
    if not frames:
        raise ValueError("empty frame list")
    for f in frames:
        if f.ndim != 2:
            raise ValueError("encode_gif expects (H, W) uint8 palette indices")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one (H, W)")
    if palette is None:
        ramp = np.arange(256, dtype=np.uint8)
        palette = np.stack([ramp, ramp, ramp], axis=1)
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3) uint8")
    lsd_flags = 0x80 | 0x07  # global color table, 256 entries
    return (
        b"GIF89a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([lsd_flags, 0, 0])
        + palette.astype(np.uint8).tobytes()
        + b"".join(_gif_image_block(f, compress) for f in frames)
        + b"\x3b"
    )
