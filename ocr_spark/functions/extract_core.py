"""Per-document extraction core: dispatch + restitch (pure Python).

This is the single-document semantic the Spark stage vectorizes
(operators/extract.py) — spec: BASELINE.json:6 "re-stitches interleaved
text + media spans preserving offset order"; invariant tuple
(kind, text, media_ref, order) per BASELINE.json:15.

Order contract (SURVEY.md §7 "span-order determinism"): output ``order``
is dense 0..n-1, induced ONLY by sorting input spans on
(offset, input-array-index) — never by partition iteration order.
"""

from __future__ import annotations

import re

from ocr_spark.config import DEFAULT, ExtractConfig
from ocr_spark.functions.htmlx import extract_html_items
from ocr_spark.functions.pdfx import extract_pdf_blocks

#: input payload kinds (FIXTURES.md B1)
TEXT, HTML, PDF, MEDIA = "text", "html", "pdf_bytes", "media"

_HYPH = re.compile(r"(\w)-\n([a-z])")


def dehyphenate(text: str) -> str:
    """Join line-break hyphenations ("exam-\\nple" → "example") when the
    continuation starts lowercase; hyphens before capitals/digits are
    kept as real compounds split across lines ("X-\\nRay" stays)."""
    return _HYPH.sub(r"\1\2", text)


def extract_doc(doc_id: str, spans, cfg: ExtractConfig = DEFAULT) -> list[dict]:
    """spans: sequence of dict-like (kind, text, media_ref, offset) →
    ordered output spans [{kind, text, media_ref, order}, ...]."""
    indexed = sorted(
        enumerate(spans),
        key=lambda p: (p[1]["offset"] if p[1]["offset"] is not None else 0, p[0]),
    )
    out: list[dict] = []
    for _idx, sp in indexed:
        kind = sp["kind"]
        if kind == TEXT:
            if sp["text"]:
                out.append({"kind": "text", "text": sp["text"], "media_ref": None})
        elif kind == MEDIA:
            out.append({"kind": "media", "text": None, "media_ref": sp["media_ref"]})
        elif kind == HTML:
            for it in extract_html_items(sp["text"] or "", cfg):
                out.append({"kind": it.kind, "text": it.text, "media_ref": it.media_ref})
        elif kind == PDF:
            data = (sp["text"] or "").encode("latin-1", errors="ignore")
            fig = 0
            for b in extract_pdf_blocks(data, cfg):
                if b.kind == "boilerplate":
                    continue
                if b.kind == "link":
                    # hyperlink annotation: the URI itself is the ref
                    out.append({"kind": "media", "text": None,
                                "media_ref": b.uri})
                elif b.kind == "figure":
                    out.append({
                        "kind": "media", "text": None,
                        "media_ref": f"pdf:{doc_id}:{sp['offset']}:fig{fig}",
                    })
                    fig += 1
                else:  # text-block | table | toc (bookmark titles lead)
                    txt = b.text
                    if cfg.dehyphenate:
                        txt = dehyphenate(txt)
                    out.append({"kind": "text", "text": txt, "media_ref": None})
        # unknown kinds are dropped deterministically
    for i, o in enumerate(out):
        o["order"] = i
    return out
