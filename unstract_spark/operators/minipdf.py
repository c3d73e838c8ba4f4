"""Minimal pure-Python PDF text extractor (no third-party deps).

The T1 x2text surface needs a real `application/pdf` adapter
(reference: sdk1/index.py:133-217 dispatches to LLMWhisperer /
Unstructured / LlamaParse; PDF is the first pattern class at
backend/workflow_manager/endpoint_v2/constants.py:151-163). No PDF
library ships in this container, so this module implements the subset
of ISO 32000 needed to pull text out of machine-generated PDFs:

- object scan (`N G obj ... endobj`) — tolerant of broken/absent xref
  tables, which real-world PDFs frequently have
- stream extraction with /Length-hinted + `endstream`-scan fallback
- filters: FlateDecode (zlib), ASCIIHexDecode, ASCII85Decode
- object streams (/Type /ObjStm) so PDF 1.5+ compressed catalogs work
- page-tree walk (Root -> Pages -> Kids) with scan-order fallback
- content-stream tokenization: BT/ET, Tf, Td/TD/T*/Tm, Tj/'/"/TJ
- string decoding: literal escapes, hex strings, UTF-16BE BOM,
  /ToUnicode CMap (bfchar + bfrange) for Type0/Identity-H fonts,
  Latin-1 fallback for simple fonts

Deliberately NOT handled (raise/skip, never crash): encrypted PDFs
(raise ValueError -> ERROR row), embedded-CMap-only CID fonts without
/ToUnicode (codes emitted via fallback), JBIG2/JPX image-only pages
(no text operators -> empty page, the OCR adapter's job, T2).

Pure bytes -> (text, n_pages): safe to call inside Arrow-batched
mapInPandas workers; no filesystem or network access.
"""

from __future__ import annotations

import base64
import re
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int) -> None:
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Ref({self.num},{self.gen})"


class Name(str):
    """A PDF name token (distinct from a decoded string)."""


class _Lexer:
    """Recursive-descent reader for PDF object syntax."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in (0x0A, 0x0D):
                    self.pos += 1
            else:
                return

    def peek_keyword(self) -> bytes:
        """Next regular-token bytes without consuming."""
        self.skip_ws()
        j = self.pos
        d, n = self.data, len(self.data)
        while j < n and d[j] not in _WS and d[j] not in _DELIM:
            j += 1
        return d[self.pos : j]

    def parse_value(self):
        self.skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise ValueError("unexpected EOF in PDF object")
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            return self._parse_dict()
        if c == 0x5B:  # [
            return self._parse_array()
        if c == 0x2F:  # /
            return self._parse_name()
        if c == 0x28:  # (
            return self._parse_literal_string()
        if c == 0x3C:  # < hex string
            return self._parse_hex_string()
        kw = self.peek_keyword()
        if kw in (b"true", b"false", b"null"):
            self.pos += len(kw)
            return {b"true": True, b"false": False, b"null": None}[kw]
        return self._parse_number_or_ref()

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict[str, object] = {}
        while True:
            self.skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self._parse_name()
            out[str(key)] = self.parse_value()

    def _parse_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self.skip_ws()
            if self.pos < len(self.data) and self.data[self.pos] == 0x5D:  # ]
                self.pos += 1
                return out
            out.append(self.parse_value())

    def _parse_name(self) -> Name:
        assert self.data[self.pos] == 0x2F
        self.pos += 1
        j = self.pos
        d, n = self.data, len(self.data)
        while j < n and d[j] not in _WS and d[j] not in _DELIM:
            j += 1
        raw = d[self.pos : j]
        self.pos = j
        # #xx hex escapes inside names
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
        return Name(raw.decode("latin-1"))

    def _parse_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        depth = 1
        out = bytearray()
        n = len(d)
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                esc = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C,
                       0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
                if e in esc:
                    out.append(esc[e])
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # \ooo octal, 1-3 digits
                    oct_digits = bytearray()
                    while self.pos < n and len(oct_digits) < 3 and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def _parse_hex_string(self) -> bytes:
        self.pos += 1
        j = self.data.find(b">", self.pos)
        if j < 0:
            j = len(self.data)
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos : j])
        self.pos = j + 1
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode())

    def _parse_number_or_ref(self):
        m = re.match(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", self.data[self.pos :])
        if not m:
            # unknown token: consume one char to guarantee progress
            self.pos += 1
            return None
        tok = m.group(0)
        self.pos += len(tok)
        if b"." in tok:
            return float(tok)
        num = int(tok)
        # lookahead for "G R" making this an indirect reference
        save = self.pos
        self.skip_ws()
        m2 = re.match(rb"(\d+)\s+R(?![\w])", self.data[self.pos :])
        if num >= 0 and m2:
            self.pos += m2.end()
            return Ref(num, int(m2.group(1)))
        self.pos = save
        return num


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    def __init__(self, data: bytes) -> None:
        self.data = data
        # (num -> (value, raw_stream|None)); later definitions win, which
        # matches incremental-update semantics (appended objects override)
        self.objects: dict[int, tuple[object, bytes | None]] = {}
        self._scan_objects()
        self._expand_object_streams()
        if self._encrypted():
            raise ValueError("encrypted PDF not supported")

    # ---- object table ----

    def _scan_objects(self) -> None:
        data = self.data
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            lex = _Lexer(data, m.end())
            try:
                value = lex.parse_value()
            except Exception:
                continue
            stream = None
            lex.skip_ws()
            if data.startswith(b"stream", lex.pos):
                start = lex.pos + 6
                if data.startswith(b"\r\n", start):
                    start += 2
                elif data.startswith(b"\n", start) or data.startswith(b"\r", start):
                    start += 1
                stream = self._slice_stream(value, start)
            self.objects[num] = (value, stream)

    def _slice_stream(self, sdict: object, start: int) -> bytes:
        data = self.data
        length = sdict.get("Length") if isinstance(sdict, dict) else None
        if isinstance(length, Ref):
            got = self.objects.get(length.num)
            length = got[0] if got else None
        if isinstance(length, int):
            end = start + length
            probe = data[end : end + 20]
            if b"endstream" in probe:
                return data[start:end]
        end = data.find(b"endstream", start)
        if end < 0:
            end = len(data)
        return data[start:end].rstrip(b"\r\n")

    def _expand_object_streams(self) -> None:
        for num in list(self.objects):
            value, stream = self.objects[num]
            if not (isinstance(value, dict) and value.get("Type") == "ObjStm" and stream):
                continue
            try:
                payload = self._decode_stream(value, stream)
                n = self.resolve(value.get("N"))
                first = self.resolve(value.get("First"))
                header = payload[:first].split()
                pairs = [(int(header[i]), int(header[i + 1])) for i in range(0, 2 * n, 2)]
                for objnum, off in pairs:
                    lex = _Lexer(payload, first + off)
                    try:
                        inner = lex.parse_value()
                    except Exception:
                        continue
                    if objnum not in self.objects:
                        self.objects[objnum] = (inner, None)
            except Exception:
                continue

    def _encrypted(self) -> bool:
        for value, _ in self.objects.values():
            if isinstance(value, dict) and "Encrypt" in value and "Root" in value:
                return True
        return b"/Encrypt" in self.data and b"trailer" in self.data and (
            re.search(rb"trailer.{0,400}/Encrypt", self.data, re.S) is not None
        )

    # ---- resolution + filters ----

    def resolve(self, v, depth: int = 0):
        while isinstance(v, Ref) and depth < 32:
            got = self.objects.get(v.num)
            if got is None:
                return None
            v = got[0]
            depth += 1
        return v

    def _decode_stream(self, sdict: dict, raw: bytes) -> bytes:
        filters = self.resolve(sdict.get("Filter"))
        if filters is None:
            return raw
        if not isinstance(filters, list):
            filters = [filters]
        out = raw
        for f in filters:
            f = self.resolve(f)
            if f == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error:
                    # tolerate truncated streams: best-effort partial inflate
                    dec = zlib.decompressobj()
                    out = dec.decompress(out)
            elif f == "ASCIIHexDecode":
                hx = re.sub(rb"[^0-9A-Fa-f]", b"", out.split(b">")[0])
                if len(hx) % 2:
                    hx += b"0"
                out = bytes.fromhex(hx.decode())
            elif f == "ASCII85Decode":
                body = out.rstrip()
                if body.endswith(b"~>"):
                    body = body[:-2]
                out = base64.a85decode(body, adobe=False)
            else:
                raise ValueError(f"unsupported PDF filter {f}")
        return out

    def stream_bytes(self, obj) -> bytes | None:
        if isinstance(obj, Ref):
            got = self.objects.get(obj.num)
            if got is None:
                return None
            value, raw = got
            if raw is None:
                return None
            return self._decode_stream(value if isinstance(value, dict) else {}, raw)
        return None

    # ---- page tree ----

    def pages(self) -> list[dict]:
        root_pages = None
        for value, _ in self.objects.values():
            if isinstance(value, dict) and value.get("Type") == "Catalog":
                root_pages = self.resolve(value.get("Pages"))
                break
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node, depth: int = 0) -> None:
            if not isinstance(node, dict) or depth > 64:
                return
            t = node.get("Type")
            if t == "Page":
                out.append(node)
            elif t == "Pages":
                for kid in self.resolve(node.get("Kids")) or []:
                    kid_id = kid.num if isinstance(kid, Ref) else id(kid)
                    if kid_id in seen:
                        continue
                    seen.add(kid_id)
                    walk(self.resolve(kid), depth + 1)

        walk(root_pages)
        if not out:  # no/broken page tree: scan order
            for num in sorted(self.objects):
                v = self.objects[num][0]
                if isinstance(v, dict) and v.get("Type") == "Page":
                    out.append(v)
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        refs = page.get("Contents")
        parts: list[bytes] = []
        if isinstance(refs, Ref):
            b = self.stream_bytes(refs)
            if b:
                parts.append(b)
        elif isinstance(contents, list):
            for r in contents:
                b = self.stream_bytes(r) if isinstance(r, Ref) else None
                if b:
                    parts.append(b)
        return b"\n".join(parts)

    def page_fonts(self, page: dict) -> dict[str, "FontInfo"]:
        res = self.resolve(page.get("Resources")) or {}
        fonts = self.resolve(res.get("Font")) or {}
        out: dict[str, FontInfo] = {}
        if isinstance(fonts, dict):
            for fname, fref in fonts.items():
                fdict = self.resolve(fref)
                if isinstance(fdict, dict):
                    out[fname] = FontInfo(self, fdict)
        return out


class FontInfo:
    """Per-font decode state: code width + optional ToUnicode map."""

    def __init__(self, doc: PdfDocument, fdict: dict) -> None:
        self.two_byte = (
            fdict.get("Subtype") == "Type0"
            or doc.resolve(fdict.get("Encoding")) in ("Identity-H", "Identity-V")
        )
        self.to_unicode: dict[int, str] | None = None
        tu = fdict.get("ToUnicode")
        if isinstance(tu, Ref):
            raw = doc.stream_bytes(tu)
            if raw:
                self.to_unicode = _parse_tounicode(raw)

    def decode(self, b: bytes) -> str:
        if self.to_unicode is not None:
            width = 2 if self.two_byte else 1
            out = []
            for i in range(0, len(b) - width + 1, width):
                code = int.from_bytes(b[i : i + width], "big")
                mapped = self.to_unicode.get(code)
                if mapped is None:
                    mapped = chr(code) if code >= 32 else ""
                out.append(mapped)
            return "".join(out)
        return _decode_simple(b)


def _decode_simple(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        try:
            return b[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            return b[2:].decode("utf-16-be", "replace")
    return b.decode("latin-1")


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _hex_to_text(hx: bytes) -> str:
    raw = bytes.fromhex(hx.decode())
    if len(raw) % 2 == 0:
        try:
            return raw.decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    return raw.decode("latin-1")


def _parse_tounicode(cmap: bytes) -> dict[int, str]:
    out: dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(cmap):
        toks = _HEX_RE.findall(m.group(1))
        for i in range(0, len(toks) - 1, 2):
            out[int(toks[i], 16)] = _hex_to_text(toks[i + 1])
    for m in _BFRANGE_RE.finditer(cmap):
        body = m.group(1)
        # two forms: <lo> <hi> <dst>  |  <lo> <hi> [<d0> <d1> ...]
        pos = 0
        while True:
            mm = re.match(
                rb"\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
                body[pos:],
            )
            if not mm:
                break
            lo, hi = int(mm.group(1), 16), int(mm.group(2), 16)
            dst = mm.group(3)
            if dst.startswith(b"["):
                targets = _HEX_RE.findall(dst)
                for off, t in enumerate(targets):
                    if lo + off <= hi:
                        out[lo + off] = _hex_to_text(t)
            else:
                base_hex = dst.strip(b"<>")
                base_raw = bytes.fromhex(base_hex.decode())
                base = int.from_bytes(base_raw, "big")
                width = len(base_raw)
                for off in range(hi - lo + 1):
                    out[lo + off] = _hex_to_text(
                        (base + off).to_bytes(max(width, 2), "big").hex().encode()
                    )
            pos += mm.end()
    return out


# ---- content-stream text assembly ----


def _page_text(doc: PdfDocument, page: dict) -> str:
    content = doc.page_content(page)
    if not content:
        return ""
    fonts = doc.page_fonts(page)
    lex = _Lexer(content)
    stack: list[object] = []
    cur_font: FontInfo | None = None
    parts: list[str] = []
    n = len(content)

    def emit(sb: object) -> None:
        if isinstance(sb, bytes):
            parts.append(cur_font.decode(sb) if cur_font else _decode_simple(sb))

    while True:
        lex.skip_ws()
        if lex.pos >= n:
            break
        c = content[lex.pos]
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B or 0x30 <= c <= 0x39 or c in (0x2B, 0x2D, 0x2E):
            try:
                stack.append(lex.parse_value())
            except Exception:
                lex.pos += 1
            continue
        kw = lex.peek_keyword()
        if not kw:
            lex.pos += 1
            continue
        lex.pos += len(kw)
        op = kw.decode("latin-1", "replace")
        if op == "Tf" and len(stack) >= 2:
            fname = stack[-2]
            if isinstance(fname, str):
                cur_font = fonts.get(fname, cur_font)
        elif op == "Tj" and stack:
            emit(stack[-1])
        elif op == "'" and stack:
            parts.append("\n")
            emit(stack[-1])
        elif op == '"' and stack:
            parts.append("\n")
            emit(stack[-1])
        elif op == "TJ" and stack and isinstance(stack[-1], list):
            for el in stack[-1]:
                if isinstance(el, bytes):
                    emit(el)
                elif isinstance(el, (int, float)) and el < -150:
                    parts.append(" ")  # big negative kern ~ word gap
        elif op in ("Td", "TD"):
            ty = stack[-1] if stack else 0
            if isinstance(ty, (int, float)) and ty != 0:
                parts.append("\n")
        elif op in ("T*", "ET"):
            parts.append("\n")
        elif op == "BI":
            # inline image: skip to EI to avoid lexing binary data
            j = content.find(b"EI", lex.pos)
            lex.pos = j + 2 if j >= 0 else n
        stack.clear()

    text = "".join(parts)
    # collapse runs of blank output while preserving line structure
    text = re.sub(r"[ \t]+\n", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip("\n")


def extract_pdf_text(content: bytes) -> tuple[str, int]:
    """bytes -> (text, page_count). Raises ValueError on non-PDF or
    encrypted input (callers map that to an ERROR row)."""
    if not content.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    doc = PdfDocument(content)
    pages = doc.pages()
    if not pages:
        raise ValueError("PDF has no parseable pages")
    texts = [_page_text(doc, p) for p in pages]
    return "\f".join(texts), len(pages)
