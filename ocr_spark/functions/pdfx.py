r"""Minimal deterministic PDF writer + content-stream text tokenizer.

Spec: BASELINE.json:6 — "tokenizes raw PDF byte-streams ... in batches,
applies layout-region classification (text-block vs figure vs table vs
boilerplate) via line-density and bounding-box heuristics".  Reference
code: REF:unavailable (SURVEY.md §0) — semantics are scoped to the
documented subset below, which our own corpus generator emits.

Supported PDF subset (documented per SURVEY.md §7 "hard parts"):
  - content streams (``stream ... endstream``), raw or /FlateDecode
    (zlib) per the stream object's own /Filter dict entry; a direct
    /Length slices the body exactly, else endstream-scan fallback
  - text objects ``BT ... ET`` with operators:
      ``Tf`` (font size), ``Td``/``TD`` (translate; TD also sets leading),
      ``TL`` (leading), ``T*`` (next line), ``Tm`` (set matrix — e,f used),
      ``Tj`` (show string), ``TJ`` (show array; kern < tj_space_kern
      inserts one space), ``'`` (T* + Tj)
  - string escapes: ``\\``, ``\(``, ``\)``, ``\n``, ``\r``, ``\t``, octal
  - hex strings ``<4869>`` (whitespace ignored, odd length zero-padded)
  - UTF-16BE text strings (FE FF BOM), literal or hex — the standard
    real-producer encoding for non-ASCII text
  - multi-page documents: one content stream per page, classified per
    stream so document order never interleaves pages
  - path ops ``x y w h re`` followed by ``f``/``S``/``B`` outside BT..ET
    are figure regions (drawings)

Everything here is pure Python over bytes/str — it runs vectorized over
Arrow batches inside mapInPandas (no Spark imports in this module).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ocr_spark.config import DEFAULT, ExtractConfig

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

# (?<!end): the bare keyword scan must not match the 'stream' suffix
# inside 'endstream', which would yield a phantom segment duplicating
# the next stream's content in multi-stream PDFs
_STREAM_KW_RE = re.compile(rb"(?<!end)stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![\s\d]*R)")
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|\s*/([A-Za-z0-9]+))")


def _dict_before(data: bytes, pos: int) -> bytes | None:
    """The ``<< ... >>`` object dictionary immediately preceding the
    ``stream`` keyword at ``pos`` (balanced for nested dicts), or None.

    Parsing the stream's OWN dict — instead of a fixed-size window scan —
    means a long dict can't hide its /Filter, and stray 'FlateDecode'
    bytes in a previous object can't mislabel a raw stream."""
    i = pos
    while i > 0 and data[i - 1 : i].isspace():
        i -= 1
    if data[i - 2 : i] != b">>":
        return None
    depth, j = 1, i - 2
    while j > 0 and depth:
        if data[j - 2 : j] == b">>":
            depth += 1
            j -= 2
        elif data[j - 2 : j] == b"<<":
            depth -= 1
            j -= 2
        else:
            j -= 1
    return data[j : i] if depth == 0 else None


def _stream_segments(data: bytes):
    """Yield (stream_dict, body) per content stream.  When the dict
    carries a direct /Length the body is sliced exactly (robust to
    'endstream' bytes occurring inside compressed payloads); otherwise
    fall back to scanning for the next ``endstream`` keyword."""
    for m in _STREAM_KW_RE.finditer(data):
        d = _dict_before(data, m.start())
        start = m.end()
        body = None
        if d is not None:
            lm = _LENGTH_RE.search(d)
            if lm:
                end = start + int(lm.group(1))
                if end <= len(data) and re.match(rb"\s*endstream", data[end:end + 16]):
                    body = data[start:end]
        if body is None:
            em = data.find(b"endstream", start)
            if em < 0:
                continue
            body = data[start:em]
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith((b"\n", b"\r")):
                body = body[:-1]
        yield d or b"", body


def _is_flate(stream_dict: bytes) -> bool:
    fm = _FILTER_RE.search(stream_dict)
    if not fm:
        return False
    arr, name = fm.groups()
    return b"FlateDecode" in (arr or name or b"")

# one token: PDF string (literal or hex), array, number, or operator name
_TOK_RE = re.compile(
    r"""\((?:\\.|[^\\()])*\)   # literal string (with escapes)
      | <[0-9A-Fa-f\s]*>       # hex string (whitespace allowed inside)
      | \[ | \]
      | /[A-Za-z0-9]+
      | [-+]?\d*\.?\d+
      | [A-Za-z'*"]+
    """,
    re.VERBOSE | re.DOTALL,
)

_ESC = {"\\": "\\", "(": "(", ")": ")", "n": "\n", "r": "\r", "t": "\t"}


def _pdf_text(s: str) -> str:
    """PDF text-string semantics: a string beginning with the UTF-16BE
    BOM (FE FF) is UTF-16BE — the standard encoding real producers use
    for any non-ASCII text; everything else is kept as the byte-literal
    (PDFDocEncoding ≈ latin-1 for our subset)."""
    if s.startswith("\xfe\xff"):
        try:
            return s.encode("latin-1").decode("utf-16-be")[1:]
        except Exception:
            return s
    return s


def _unescape(s: str) -> str:
    if "\\" not in s:  # overwhelmingly common case — no escape present
        return s
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt in _ESC:
                out.append(_ESC[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and s[j].isdigit():
                    j += 1
                out.append(chr(int(s[i + 1 : j], 8)))
                i = j
                continue
            i += 1  # lone backslash: skip
            continue
        out.append(c)
        i += 1
    return "".join(out)


@dataclass
class TextRun:
    x: float
    y: float
    text: str
    size: float
    page: int = 0


@dataclass
class PdfLine:
    y: float
    x0: float
    x1: float
    text: str
    size: float
    page: int = 0


@dataclass
class PdfBlock:
    kind: str                      # 'text-block' | 'table' | 'boilerplate' | 'figure'
    lines: list[PdfLine] = field(default_factory=list)
    bbox: tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    page: int = 0

    @property
    def text(self) -> str:
        return "\n".join(ln.text for ln in self.lines)


def tokenize_pdf(data: bytes, cfg: ExtractConfig = DEFAULT) -> tuple[list[TextRun], list[tuple[int, float, float, float, float]]]:
    """Parse content streams → positioned text runs + figure rects,
    PAGE-TAGGED: each content stream is one page with its own coordinate
    space, so runs carry their stream index and figures are
    (page, x, y, w, h) — every consumer (group_lines/group_blocks) keys
    on page first and document order never interleaves pages.

    Streams whose object dictionary declares ``/Filter /FlateDecode``
    (the overwhelmingly common real-world encoding) are zlib-inflated
    before tokenizing; raw streams are parsed as-is."""
    runs: list[TextRun] = []
    figures: list[tuple[int, float, float, float, float]] = []
    for page, content in enumerate(_stream_contents(data)):
        r, f = _parse_content(content, [], [], cfg)
        for tr in r:
            tr.page = page
        runs.extend(r)
        figures.extend((page, *fig) for fig in f)
    return runs, figures


def _stream_contents(data: bytes):
    """Decoded (inflated if /FlateDecode) content string per stream."""
    import zlib

    for sdict, raw in _stream_segments(data):
        if _is_flate(sdict):
            try:
                raw = zlib.decompress(raw)
            except Exception:
                continue  # corrupt compressed stream — skip deterministically
        try:
            yield raw.decode("latin-1")
        except Exception:
            continue


def _parse_content(content, runs, figures, cfg):
    toks = _TOK_RE.findall(content)
    x = y = 0.0
    size = 12.0
    leading = 14.0
    in_text = False
    stack: list = []  # operand stack (numbers / strings / arrays)
    arr: list | None = None
    for t in toks:
        if t == "[":
            arr = []
            continue
        if t == "]":
            stack.append(arr if arr is not None else [])
            arr = None
            continue
        if t.startswith("("):
            s = _pdf_text(_unescape(t[1:-1]))
            if arr is not None:
                arr.append(s)
            else:
                stack.append(s)
            continue
        if t.startswith("<"):
            # hex string: whitespace ignored, odd length padded with 0
            hx = re.sub(r"\s", "", t[1:-1])
            if len(hx) % 2:
                hx += "0"
            s = _pdf_text(bytes.fromhex(hx).decode("latin-1"))
            if arr is not None:
                arr.append(s)
            else:
                stack.append(s)
            continue
        if t.startswith("/"):
            continue  # names (font ids) — ignored
        if t[0] in "-+.0123456789":  # _TOK_RE guarantees a valid number here
            v = float(t)
            if arr is not None:
                arr.append(v)
            else:
                stack.append(v)
            continue
        # operator
        if t == "BT":
            in_text, x, y = True, 0.0, 0.0
        elif t == "ET":
            in_text = False
        elif t == "Tf" and len(stack) >= 1:
            size = float(stack[-1])
        elif t == "TL" and stack:
            leading = float(stack[-1])
        elif t in ("Td", "TD") and len(stack) >= 2:
            tx, ty = float(stack[-2]), float(stack[-1])
            x, y = x + tx, y + ty
            if t == "TD":
                leading = -ty if ty else leading
        elif t == "Tm" and len(stack) >= 6:
            x, y = float(stack[-2]), float(stack[-1])
        elif t == "T*":
            y -= leading
        elif t == "Tj" and stack and isinstance(stack[-1], str):
            if in_text and stack[-1]:
                runs.append(TextRun(x, y, stack[-1], size))
        elif t == "'" and stack and isinstance(stack[-1], str):
            y -= leading
            if in_text and stack[-1]:
                runs.append(TextRun(x, y, stack[-1], size))
        elif t == "TJ" and stack and isinstance(stack[-1], list):
            parts: list[str] = []
            for el in stack[-1]:
                if isinstance(el, str):
                    parts.append(el)
                elif isinstance(el, float) and el < cfg.tj_space_kern:
                    parts.append(" ")
            txt = "".join(parts)
            if in_text and txt:
                runs.append(TextRun(x, y, txt, size))
        elif t == "re" and len(stack) >= 4:
            rx, ry, rw, rh = (float(v) for v in stack[-4:])
            if not in_text:
                figures.append((rx, ry, rw, rh))
        if t not in ("[", "]"):
            stack = stack[-8:]  # bound the stack; operands are consumed loosely
    return runs, figures


def group_lines(runs: list[TextRun]) -> list[PdfLine]:
    """Group runs by (page, y) (y within 0.5pt) → lines; x-ordered text;
    line order = page, then top of page first."""
    lines: list[PdfLine] = []
    by_key: dict[tuple[int, float], list[TextRun]] = {}
    for r in runs:
        key = (r.page, round(r.y * 2) / 2)
        by_key.setdefault(key, []).append(r)
    for page, y in sorted(by_key, key=lambda k: (k[0], -k[1])):
        rs = sorted(by_key[(page, y)], key=lambda r: r.x)
        text = " ".join(r.text for r in rs)
        width = sum(0.5 * r.size * len(r.text) for r in rs)
        lines.append(PdfLine(y, rs[0].x, rs[0].x + width, text, rs[0].size, page))
    return lines


def group_blocks(lines: list[PdfLine], figures, cfg: ExtractConfig = DEFAULT) -> list[PdfBlock]:
    """Lines (page-major, top→bottom) → blocks split on page change or
    y-gap; classify each block; final order (page, descending top-y) —
    page keys first so multi-page documents never interleave."""
    blocks: list[PdfBlock] = []
    cur: list[PdfLine] = []
    prev_y = prev_page = None
    for ln in lines:
        if prev_y is not None and (
            ln.page != prev_page or (prev_y - ln.y) > cfg.block_gap
        ):
            blocks.append(_finish_block(cur, cfg))
            cur = []
        cur.append(ln)
        prev_y, prev_page = ln.y, ln.page
    if cur:
        blocks.append(_finish_block(cur, cfg))
    for fig in figures:
        pg, rx, ry, rw, rh = fig if len(fig) == 5 else (0, *fig)
        blocks.append(PdfBlock("figure", [], (rx, ry, rx + rw, ry + rh), pg))
    blocks.sort(key=lambda b: (b.page, -b.bbox[3]))
    return blocks


def _finish_block(lines: list[PdfLine], cfg: ExtractConfig) -> PdfBlock:
    x0 = min(ln.x0 for ln in lines)
    x1 = max(ln.x1 for ln in lines)
    y0 = min(ln.y for ln in lines)
    y1 = max(ln.y for ln in lines) + lines[0].size
    kind = _classify_text_block(lines, (x0, y0, x1, y1), cfg)
    return PdfBlock(kind, lines, (x0, y0, x1, y1), lines[0].page)


def _classify_text_block(lines, bbox, cfg: ExtractConfig) -> str:
    # boilerplate: a single short line in the top/bottom page band (header/footer)
    top_band = cfg.page_height * (1.0 - cfg.header_footer_band)
    bot_band = cfg.page_height * cfg.header_footer_band
    if len(lines) == 1 and (lines[0].y >= top_band or lines[0].y <= bot_band):
        return "boilerplate"
    # table: enough lines and most lines columnar (>= 2 runs of 2+ spaces)
    if len(lines) >= cfg.table_min_lines:
        columnar = sum(1 for ln in lines if len(re.findall(r"\s{2,}", ln.text)) >= 2)
        if columnar / len(lines) >= cfg.table_col_gap_frac:
            return "table"
    return "text-block"


def extract_pdf_blocks(data: bytes, cfg: ExtractConfig = DEFAULT) -> list[PdfBlock]:
    """Full E3+E5 for one PDF payload: tokenize → lines → classified
    blocks.  Page-awareness lives in the tokenizer (runs/figures are
    page-tagged and every grouping step keys on page first), so this is
    the plain composition and single-stream documents (the whole
    synthetic corpus) are unchanged from the historical grouping."""
    runs, figures = tokenize_pdf(data, cfg)
    return group_blocks(group_lines(runs), figures, cfg)


# ---------------------------------------------------------------------------
# writer (corpus generator side) — emits exactly the subset above
# ---------------------------------------------------------------------------

def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_content(blocks: list[dict]) -> str:
    parts = ["BT /F1 12 Tf 14 TL\n"]
    figs = []
    for b in blocks:
        if b["kind"] == "figure":
            figs.append(b)
            continue
        x, y = b["x"], b["y"]
        parts.append(f"1 0 0 1 {x:g} {y:g} Tm\n")
        for i, line in enumerate(b["lines"]):
            if i > 0:
                parts.append("T* ")
            parts.append(f"({_esc(line)}) Tj\n")
    parts.append("ET\n")
    for b in figs:
        parts.append(f"{b['x']:g} {b['y']:g} {b.get('w', 100):g} {b.get('h', 80):g} re f\n")
    return "".join(parts)


def _stream_obj(content: str, compress: bool) -> str:
    if compress:
        import zlib

        body = zlib.compress(content.encode("latin-1"))
        return (f"<< /Length {len(body)} /Filter /FlateDecode >>\nstream\n"
                + body.decode("latin-1") + "\nendstream")
    return f"<< /Length {len(content)} >>\nstream\n{content}\nendstream"


def write_pdf(blocks: list[dict], compress: bool = False) -> bytes:
    """Serialize blocks → a minimal well-formed single-page PDF.

    Each block dict: {"kind": "text"|"table"|"header"|"footer"|"figure",
    "lines": [str, ...], "x": float, "y": float}  (y = top line baseline).
    ``compress=True`` flate-encodes the content stream (the real-world
    default for PDF producers); the extractor handles both.
    """
    return write_pdf_pages([blocks], compress=compress)


def write_pdf_pages(pages: list[list[dict]], compress: bool = False) -> bytes:
    """Multi-page variant: one content stream per page, each page its
    own coordinate space (the standard producer layout the per-stream
    extractor ordering relies on)."""
    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs = [
        "<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>",
    ]
    for i, blocks in enumerate(pages):
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R >>"
        )
        objs.append(_stream_obj(_page_content(blocks), compress))
    out = ["%PDF-1.4\n"]
    offsets = []
    pos = len(out[0])
    for i, o in enumerate(objs, start=1):
        s = f"{i} 0 obj\n{o}\nendobj\n"
        offsets.append(pos)
        out.append(s)
        pos += len(s)
    xref_pos = pos
    xref = [f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n"]
    xref += [f"{off:010d} 00000 n \n" for off in offsets]
    out.append("".join(xref))
    out.append(f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
               f"startxref\n{xref_pos}\n%%EOF\n")
    return "".join(out).encode("latin-1")
