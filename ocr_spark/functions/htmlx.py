"""HTML DOM tokenizer + shallow-feature boilerplate scoring.

Spec: BASELINE.json:6 — "tokenizes ... HTML DOM fragments in batches"
and "strips boilerplate with text-density/link-ratio DOM scoring".
Algorithm family: Boilerpipe / Readability shallow text features
(Kohlschütter, Fankhauser, Nejdl, WSDM 2010 — [public]).  Reference
code: REF:unavailable (SURVEY.md §0).

Deterministic block model (the contract both the Spark pipeline and the
independent test oracle implement):
  - block-level tags: p div li h1-h6 td th pre blockquote article section
  - subtrees under nav/header/footer/aside/script/style/noscript are
    boilerplate wholesale (never emitted)
  - text binds to the innermost open block; ``<a>`` text also counts
    toward the block's link-char total
  - resource-bearing elements (``img``, ``video``, ``audio``,
    ``source``) emit a media item at their position in the block
    stream, media_ref = the src attribute, else ``data-src`` (the
    lazy-loading idiom), else the first ``srcset`` / ``data-srcset``
    candidate URL; non-img tags emit only when they carry a reference
  - keep a block iff  link_ratio <= html_max_link_ratio AND
    words >= html_min_words,  OR tag in h1..h6 AND
    words >= html_heading_min_words
  - ``<table>`` subtrees are LINEARIZED, not shredded: all cell text
    (td/th/caption) collects into one item (tag 'table') with cells
    joined by `` | `` and rows by `` ; `` — a data table survives as one
    content span instead of dying cell-by-cell under html_min_words,
    while a nav/layout table of links fails the link-ratio gate as a
    unit (the classic boilerplate signal).  Nested tables fold their
    linearized text into the enclosing cell; block tags inside cells
    bind their text to the cell; media items inside tables still emit
    (ordered after the table item, whose order is its open position).
    Keep rule: link_ratio <= html_max_link_ratio AND cell-word count
    (separators excluded) >= html_min_words
  - emitted text is whitespace-collapsed

Pure Python / stdlib html.parser — vectorized over Arrow batches in
mapInPandas; no Spark imports here.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser

from ocr_spark.config import DEFAULT, ExtractConfig

BLOCK_TAGS = {
    "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "td", "th", "pre", "blockquote", "article", "section",
}
SKIP_TAGS = {"nav", "header", "footer", "aside", "script", "style", "noscript"}
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
#: resource-bearing elements that emit media items.  <img> emits
#: unconditionally (legacy/golden behavior); the others only when they
#: actually carry a reference, so a bare <video> container wrapping
#: <source> children adds no empty item.  A <picture> fallback chain
#: (<source srcset> + <img src>) therefore emits one item per candidate
#: resource — downstream dedup by media_ref collapses them.
MEDIA_TAGS = {"img", "video", "audio", "source"}

_WS = re.compile(r"\s+")


def _media_ref(attrs: dict) -> str:
    """src, else data-src (the lazy-loading idiom — real pages park the
    URL there and let JS promote it, so an src-only reader drops every
    below-the-fold image), else the first srcset / data-srcset
    candidate URL ('url 640w, ...')."""
    src = attrs.get("src") or attrs.get("data-src") or ""
    if src:
        return src
    srcset = (attrs.get("srcset") or attrs.get("data-srcset") or "").strip()
    return srcset.split(",")[0].split()[0] if srcset else ""


@dataclass
class HtmlItem:
    kind: str              # 'text' | 'media'
    tag: str               # block tag ('' for media)
    text: str | None
    media_ref: str | None
    words: int
    link_ratio: float
    label: str             # 'content' | 'boilerplate' | 'media'


class _BlockParser(HTMLParser):
    """Streaming block extractor; document order = block-open order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.items: list[tuple[int, str, str | None]] = []  # (seq, type, payload)
        self._seq = 0
        self._skip = 0
        self._blocks: list[dict] = []   # stack of open blocks
        self._tables: list[dict] = []   # stack of open <table> collectors
        self._link = 0                  # <a> nesting depth

    # -- helpers --
    def _open_block(self, tag: str) -> None:
        self._blocks.append({"tag": tag, "chars": [], "link_chars": 0, "seq": self._seq})
        self._seq += 1

    def _close_block(self) -> None:
        if not self._blocks:
            return
        b = self._blocks.pop()
        text = _WS.sub(" ", "".join(b["chars"])).strip()
        n_chars = len(text)
        link_ratio = (b["link_chars"] / n_chars) if n_chars else 0.0
        self.items.append((b["seq"], "block", (b["tag"], text, link_ratio)))

    def _close_cell(self, t: dict) -> None:
        if t["cell"] is not None:
            text = _WS.sub(" ", "".join(t["cell"])).strip()
            t["row"].append(text)
            t["chars"] += len(text)
            t["cell"] = None

    def _close_row(self, t: dict) -> None:
        if t["row"] is not None:
            if any(t["row"]):
                t["rows"].append(t["row"])
            t["row"] = None

    def _close_table(self) -> None:
        t = self._tables.pop()
        self._close_cell(t)
        self._close_row(t)
        text = " ; ".join(" | ".join(r) for r in t["rows"])
        if self._tables and self._tables[-1]["cell"] is not None:
            # nested table: fold its linearized text into the enclosing
            # cell (its link chars carry up so the OUTER table's ratio
            # still sees nested nav links)
            parent = self._tables[-1]
            parent["cell"].append(" " + text + " ")
            parent["link_chars"] += t["link_chars"]
            return
        n_chars = t["chars"]
        link_ratio = (t["link_chars"] / n_chars) if n_chars else 0.0
        self.items.append((t["seq"], "table", (text, link_ratio)))

    # -- HTMLParser hooks --
    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "a":
            self._link += 1
        if tag in MEDIA_TAGS:
            ref = _media_ref(dict(attrs))
            if ref or tag == "img":
                self.items.append((self._seq, "media", ref))
                self._seq += 1
        if tag == "table":
            self._tables.append({"seq": self._seq, "rows": [],
                                 "row": None, "cell": None,
                                 "chars": 0, "link_chars": 0})
            self._seq += 1
            return
        if self._tables:
            t = self._tables[-1]
            if tag == "tr":
                self._close_cell(t)
                self._close_row(t)
                t["row"] = []
            elif tag in ("td", "th", "caption"):
                self._close_cell(t)
                if t["row"] is None:
                    t["row"] = []
                t["cell"] = []
            elif tag in BLOCK_TAGS and t["cell"] is not None:
                # block tags inside a cell bind their text to the cell;
                # a block boundary is a visual break, so inject a space
                # (collapsed later) to keep adjacent </p><p> words apart
                t["cell"].append(" ")
            return
        if tag in BLOCK_TAGS:
            self._open_block(tag)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in SKIP_TAGS and tag not in ("img", "source"):
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "a":
            self._link = max(0, self._link - 1)
        if self._tables:
            t = self._tables[-1]
            if tag in ("td", "th", "caption"):
                self._close_cell(t)
            elif tag == "tr":
                self._close_cell(t)
                self._close_row(t)
            elif tag == "table":
                self._close_table()
            elif tag in BLOCK_TAGS and t["cell"] is not None:
                t["cell"].append(" ")   # block boundary → visual break
            # other close tags inside a table are ignored (same
            # nesting-slop tolerance as blocks)
            return
        if tag in BLOCK_TAGS and self._blocks:
            # close innermost matching block (tolerate mild nesting slop)
            if self._blocks[-1]["tag"] == tag:
                self._close_block()

    def handle_data(self, data):
        if self._skip:
            return
        if self._tables:
            t = self._tables[-1]
            if t["cell"] is not None:
                t["cell"].append(data)
                if self._link:
                    t["link_chars"] += len(_WS.sub(" ", data).strip())
            return
        if not self._blocks:
            return
        b = self._blocks[-1]
        b["chars"].append(data)
        if self._link:
            b["link_chars"] += len(_WS.sub(" ", data).strip())

    def close(self):
        super().close()
        while self._tables:
            self._close_table()
        while self._blocks:
            self._close_block()


# Fast path: regex scanner emitting the same start/end/data event stream
# as html.parser drives into _BlockParser.  The stdlib parser was 65% of
# total extraction CPU (profiled); this scanner is ~6x faster on the
# same fragments.  tokenize_html_stdlib below keeps the stdlib path for
# cross-validation (tests assert identical items on every corpus doc).
_SCAN = re.compile(
    r"<!--.*?-->"                                   # comments
    r"|<!\[CDATA\[.*?\]\]>"                          # CDATA
    r"|<![^>]*>|<\?[^>]*>"                           # doctype / PI
    r"|<(/?)([a-zA-Z][^\s/>]*)((?:\"[^\"]*\"|'[^']*'|[^>])*?)(/?)>",
    re.S,
)
# (?<![-\w]) keeps plain src= from matching inside data-src= — the two
# attributes must stay distinct or the fast path would disagree with
# the stdlib parser's attribute dict on lazy-loaded images
_SRC = re.compile(
    r"""(?<![-\w])src\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)
_SRCSET = re.compile(
    r"""(?<![-\w])srcset\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)
_DATASRC = re.compile(
    r"""\bdata-src\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)
_DATASRCSET = re.compile(
    r"""\bdata-srcset\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)


def _scan_events(fragment: str, sink: "_BlockParser") -> None:
    """Drive sink's handle_* hooks from the regex scanner, mirroring
    html.parser's convert_charrefs=True behavior."""
    from html import unescape

    pos = 0
    for m in _SCAN.finditer(fragment):
        s, e = m.span()
        if s > pos:
            data = fragment[pos:s]
            sink.handle_data(unescape(data) if "&" in data else data)
        pos = e
        closing, tag, attrs_s, selfclose = m.group(1, 2, 3, 4)
        if tag is None:
            continue  # comment/doctype/CDATA — ignored, like the stdlib hooks
        tag = tag.lower()
        attrs_s = attrs_s or ""
        if closing:
            sink.handle_endtag(tag)
        else:
            # attrs parsed lazily: only media tags need any (src/srcset
            # + their data- lazy-load twins)
            attrs = []
            if tag in MEDIA_TAGS and "src" in attrs_s.lower():
                for name, rx in (("src", _SRC), ("srcset", _SRCSET),
                                 ("data-src", _DATASRC),
                                 ("data-srcset", _DATASRCSET)):
                    a = rx.search(attrs_s)
                    if a:
                        attrs.append(
                            (name, a.group(1) or a.group(2) or a.group(3)))
            if selfclose:
                sink.handle_startendtag(tag, attrs)
            else:
                sink.handle_starttag(tag, attrs)
    if pos < len(fragment):
        data = fragment[pos:]
        sink.handle_data(unescape(data) if "&" in data else data)


def tokenize_html(fragment: str, cfg: ExtractConfig = DEFAULT,
                  use_stdlib: bool = False) -> list[HtmlItem]:
    """E4+E5+E6 for one HTML payload → ordered classified items."""
    p = _BlockParser()
    try:
        if use_stdlib:
            p.feed(fragment)
            p.close()
        else:
            _scan_events(fragment, p)
            while p._tables:
                p._close_table()
            while p._blocks:
                p._close_block()
    except Exception:
        pass
    out: list[HtmlItem] = []
    for _seq, typ, payload in sorted(p.items, key=lambda t: t[0]):
        if typ == "media":
            out.append(HtmlItem("media", "", None, payload or None, 0, 0.0, "media"))
            continue
        if typ == "table":
            text, link_ratio = payload
            # word count excludes the cell/row separator tokens
            words = sum(1 for w in text.split() if w not in ("|", ";"))
            keep = (link_ratio <= cfg.html_max_link_ratio
                    and words >= cfg.html_min_words)
            out.append(HtmlItem(
                "text", "table", text or None, None, words, link_ratio,
                "content" if keep else "boilerplate",
            ))
            continue
        tag, text, link_ratio = payload
        words = len(text.split()) if text else 0
        keep = (link_ratio <= cfg.html_max_link_ratio and words >= cfg.html_min_words) or (
            tag in HEADING_TAGS and words >= cfg.html_heading_min_words
        )
        out.append(HtmlItem(
            "text", tag, text or None, None, words, link_ratio,
            "content" if keep else "boilerplate",
        ))
    return out


def extract_html_items(fragment: str, cfg: ExtractConfig = DEFAULT) -> list[HtmlItem]:
    """Only the surviving (content/media) items, in document order."""
    return [it for it in tokenize_html(fragment, cfg) if it.label != "boilerplate"]
