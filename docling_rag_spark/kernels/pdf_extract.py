"""Deterministic PDF-layout parse kernel (MINIPDF format).

The reference parses real PDFs via docling's ``dlparse_v4`` backend into
page items with bbox provenance in reading order, with tables/figures as
distinct item kinds (reference src/ingestion/document.py:133,188; provenance
consumed at src/ingestion/chunker.py:35-42). Real PDF rasterization libs are
not available in this environment, so the *byte format* here is a
deterministic synthetic stand-in (MINIPDF) while the *semantics* — layout
blocks, column-aware reading-order sort, table/figure detection with media
refs, and the smart-OCR probe — are real and fully tested.

MINIPDF format (one text payload per document span, kind='pdf')::

    %MINIPDF 1
    block <page_no> <x0> <y0> <kind> <media_ref|-> <text...>

Block lines may appear in ARBITRARY order (the generator scrambles them);
the parser restores reading order. ``kind`` is one of ``text``, ``heading``,
``table``, ``figure``, ``rastertext`` (text only recoverable via OCR).

Reading order (two-column aware, page width 612pt):
    sort by (page_no, column = x0 // 306, y_band = y0 // 16, x0, y0, seq)
where seq is the line's position in the payload (final tiebreak).

Smart-OCR probe — exact thresholds of the reference
(src/ingestion/document.py:179-182): compare chars of no-OCR text
(kind=text) vs with-OCR text (text+rastertext) on the FIRST 2 PAGES; include
``rastertext`` blocks iff no-OCR chars == 0 or gain/no-OCR > 0.5.
"""

from __future__ import annotations

from .textutils import tidy

MAGIC = "%MINIPDF 1"
PAGE_WIDTH = 612
COLUMN_SPLIT = PAGE_WIDTH // 2  # 306
Y_BAND = 16
OCR_GAIN_THRESHOLD = 0.5  # reference src/ingestion/document.py:181
PROBE_PAGES = 2  # reference src/ingestion/document.py:151-156


def parse_minipdf(payload: str) -> list[dict]:
    """Parse a MINIPDF payload into block dicts (unsorted)."""
    lines = payload.splitlines()
    if not lines or lines[0].strip() != MAGIC:
        raise ValueError("not a MINIPDF payload")
    blocks = []
    for seq, line in enumerate(lines[1:]):
        line = line.strip()
        if not line or not line.startswith("block "):
            continue
        parts = line.split(" ", 6)
        if len(parts) < 6:
            continue
        _, page, x0, y0, kind, ref = parts[:6]
        text = parts[6] if len(parts) > 6 else ""
        blocks.append(
            {
                "page_no": int(page),
                "x0": int(x0),
                "y0": int(y0),
                "kind": kind,
                "media_ref": None if ref == "-" else ref,
                "text": tidy(text),
                "seq": seq,
            }
        )
    return blocks


def reading_order_key(b: dict) -> tuple:
    return (
        b["page_no"],
        b["x0"] // COLUMN_SPLIT,
        b["y0"] // Y_BAND,
        b["x0"],
        b["y0"],
        b["seq"],
    )


def ocr_probe_force(blocks: list[dict]) -> bool:
    """Decide force_ocr from the first PROBE_PAGES pages, exact reference
    thresholds (src/ingestion/document.py:179-182)."""
    probe = [b for b in blocks if b["page_no"] <= PROBE_PAGES]
    without = sum(len(b["text"]) for b in probe if b["kind"] == "text")
    withocr = without + sum(len(b["text"]) for b in probe if b["kind"] == "rastertext")
    if without == 0:
        return True
    return (withocr - without) / without > OCR_GAIN_THRESHOLD


def extract_pdf_blocks(payload: str) -> list[tuple[str, str, str | None, int]]:
    """MINIPDF payload → ordered [(kind, text, media_ref, page_no)].

    - text blocks → kind 'text'
    - heading blocks → kind 'heading' (section titles with layout provenance;
      heading-aware chunk merging consumes them, kernels/chunker.py spec v2)
    - rastertext blocks → kind 'text' IFF the OCR probe fires, else dropped
    - table blocks → kind 'table' (text = flattened cells, ' | '-joined by
      the generator), media_ref preserved
    - figure blocks → kind 'figure', empty text, media_ref preserved
    """
    blocks = parse_minipdf(payload)
    force_ocr = ocr_probe_force(blocks)
    out: list[tuple[str, str, str | None, int]] = []
    for b in sorted(blocks, key=reading_order_key):
        kind, text, ref, page = b["kind"], b["text"], b["media_ref"], b["page_no"]
        if kind == "rastertext":
            if not force_ocr:
                continue
            kind = "text"
        if kind == "text":
            if text:
                out.append(("text", text, None, page))
        elif kind == "heading":
            if text:
                out.append(("heading", text, None, page))
        elif kind == "table":
            out.append(("table", text, ref, page))
        elif kind == "figure":
            out.append(("figure", "", ref, page))
        # unknown kinds dropped
    return out


def page_count(payload: str) -> int:
    """Analog of the reference's pypdf page count
    (src/ingestion/document.py:94-102)."""
    try:
        blocks = parse_minipdf(payload)
    except ValueError:
        return 0
    return max((b["page_no"] for b in blocks), default=0)
