"""Hand-rolled PDF builders for extractor tests (no PDF lib in the
container, so fixtures are assembled byte-by-byte with valid xref
tables — realistic machine-generated PDFs, not golden files)."""

from __future__ import annotations

import zlib


def _assemble(objects: dict[int, bytes], root_num: int) -> bytes:
    """Serialize numbered objects with a correct xref + trailer."""
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_pos = len(out)
    maxnum = max(objects)
    out += b"xref\n0 %d\n" % (maxnum + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (maxnum + 1, root_num, xref_pos)
    )
    return bytes(out)


def _stream_obj(payload: bytes, extra_dict: bytes = b"", compress: bool = False) -> bytes:
    if compress:
        payload = zlib.compress(payload)
        extra_dict += b" /Filter /FlateDecode"
    return (
        b"<< /Length %d%s >>\nstream\n" % (len(payload), extra_dict)
        + payload
        + b"\nendstream"
    )


def simple_pdf(pages: list[str], compress: bool = False) -> bytes:
    """One content stream per page; Helvetica, literal strings, Tj/Td."""
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, text in enumerate(pages):
        page_num = 4 + 2 * i
        content_num = page_num + 1
        lines = text.split("\n")
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            esc = line.encode("latin-1").replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
            if j:
                ops.append(b"0 -14 Td")
            ops.append(b"(%s) Tj" % esc)
        ops.append(b"ET")
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>" % content_num
        )
        objs[content_num] = _stream_obj(b" ".join(ops), compress=compress)
    return _assemble(objs, 1)


def tj_array_pdf() -> bytes:
    """TJ arrays with kerning gaps, hex strings, escapes — compressed."""
    content = (
        b"BT /F1 10 Tf 72 720 Td "
        b"[(Invoice) -300 (Total:) -300 (\\(USD\\))] TJ "
        b"0 -14 Td <48656C6C6F> Tj "
        b"T* (line \\164hree) Tj "
        b"ET"
    )
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
        5: _stream_obj(content, compress=True),
    }
    return _assemble(objs, 1)


def type0_tounicode_pdf(text: str = "Unicode — café €") -> bytes:
    """Type0/Identity-H font, 2-byte codes mapped via a ToUnicode CMap
    (bfchar entries), the shape every modern generator emits."""
    codes = {ch: i + 1 for i, ch in enumerate(dict.fromkeys(text))}
    bfchars = b"\n".join(
        b"<%04X> <%s>" % (code, ch.encode("utf-16-be").hex().upper().encode())
        for ch, code in codes.items()
    )
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"%d beginbfchar\n%s\nendbfchar\n"
        b"endcmap\nend\n" % (len(codes), bfchars)
    )
    encoded = b"".join(b"%04X" % codes[ch] for ch in text)
    content = b"BT /F1 12 Tf 72 720 Td <%s> Tj ET" % encoded
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>"
        ),
        4: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
        5: _stream_obj(content, compress=True),
        6: _stream_obj(cmap, compress=True),
    }
    return _assemble(objs, 1)


def objstm_pdf(text: str = "packed in an object stream") -> bytes:
    """Catalog/Pages/Page dicts packed into a /Type /ObjStm (PDF 1.5+
    compressed object stream); only the content stream stays top-level."""
    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 6 0 R >> >> /Contents 4 0 R >>"
        ),
        6: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    header = bytearray()
    body = bytearray()
    for num, raw in inner.items():
        header += b"%d %d " % (num, len(body))
        body += raw + b"\n"
    payload = bytes(header) + bytes(body)
    first = len(header)
    esc = text.encode("latin-1").replace(b"(", b"\\(").replace(b")", b"\\)")
    content = b"BT /F1 12 Tf 72 720 Td (%s) Tj ET" % esc
    objs = {
        4: _stream_obj(content, compress=True),
        5: _stream_obj(
            payload,
            extra_dict=b" /Type /ObjStm /N %d /First %d" % (len(inner), first),
            compress=True,
        ),
    }
    # xref-stream-style files have no classic trailer /Root pointing at a
    # top-level object; the scanner must find the Catalog inside the ObjStm
    data = _assemble(objs, 1)
    return data


def encrypted_pdf() -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [] /Count 0 >>",
    }
    data = _assemble(objs, 1)
    return data.replace(
        b"trailer\n<<",
        b"trailer\n<< /Encrypt 9 0 R",
    )
