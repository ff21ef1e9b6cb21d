"""Deterministic HTML main-content extractor (jusText/Readability-style).

Replaces the reference's delegation of HTML conversion to docling-serve
(reference src/ingestion/document.py:116-147) with an in-process,
fully-specified link-density/text-density block scorer, per the north star
(BASELINE.json:6,14). The spec below is frozen — the Spark ``mapInPandas``
kernel and the single-process oracle both call :func:`extract_html_blocks`,
and tests/golden lock the behavior on handcrafted pages.

Spec
----
1. The page is scanned tag-by-tag. Content inside ``nav footer header aside
   script style form noscript head`` elements is *boilerplate context*.
2. Text is accumulated into blocks; a block boundary is any open/close of a
   block-level tag (``p h1..h6 li blockquote pre div td th tr table article
   section main body html ul ol br title``).
3. ``<table>…</table>`` (outside boilerplate) is captured wholesale: cell
   texts joined with ``" | "`` → one block of kind ``table``; boilerplate
   elements nested inside the table contribute no cell text.
4. ``<img src=X>`` outside boilerplate → block kind ``image``, empty text,
   ``media_ref = X`` (the reference preserves inline image markers,
   src/ingestion/document.py:113-114, and media MIME types :39-48).
5. A text block is GOOD (kept) iff:
   - it was not opened in boilerplate context, and
   - link density (chars inside <a> / total chars) <= 0.4, and
   - it is a heading (h1-h6) with >= 3 chars, OR has >= 25 chars, OR has
     stopword density >= 0.30 with >= 10 chars.
   Everything else is dropped (boilerplate). Kept heading blocks emit kind
   ``heading`` (heading-aware chunk merging consumes it, spec v2 in
   kernels/chunker.py — the reference chunker's heading context,
   src/ingestion/chunker.py:16-27); other kept blocks emit kind ``text``.
6. Output preserves document order: list of (kind, text, media_ref).
"""

from __future__ import annotations

import re

from .textutils import EN_STOPWORDS, tidy

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>")
_SRC_RE = re.compile(r"""src\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&#39;": "'", "&nbsp;": " "}

BOILER_TAGS = frozenset("nav footer header aside script style form noscript head".split())
BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li blockquote pre div td th tr table article "
    "section main body html ul ol br title".split()
)
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())

LINK_DENSITY_MAX = 0.4
MIN_GOOD_CHARS = 25
STOPWORD_DENSITY_MIN = 0.30
STOPWORD_MIN_CHARS = 10


def _unescape(s: str) -> str:
    if "&" not in s:  # hot path: most fragments carry no entities
        return s
    for k, v in _ENTITIES.items():
        s = s.replace(k, v)
    return s


def extract_html_blocks(html: str) -> list[tuple[str, str, str | None]]:
    """Extract ordered main-content blocks: [(kind, text, media_ref)]."""
    blocks: list[tuple[str, str, str | None]] = []
    boiler_depth = 0
    link_depth = 0
    heading: str | None = None
    in_table = 0
    table_cells: list[str] = []
    buf: list[str] = []
    link_chars = 0
    block_boiler = False  # boilerplate context when current block started

    def flush() -> None:
        nonlocal buf, link_chars, block_boiler, heading
        if not buf:  # hot path: most block-tag boundaries have no text
            block_boiler = boiler_depth > 0
            return
        if block_boiler:
            # a block opened in boilerplate context can never be good —
            # skip the tidy/unescape work entirely (its text is unused)
            buf, link_chars = [], 0
            block_boiler = boiler_depth > 0
            return
        text = tidy(_unescape("".join(buf)))
        lc = link_chars
        is_head = heading is not None
        buf, link_chars = [], 0
        if not text:
            block_boiler = boiler_depth > 0
            return
        n = len(text)
        good = not block_boiler and (lc / n) <= LINK_DENSITY_MAX
        if good:
            # length/heading rules first — the stopword-density scan (split
            # + per-token lookup) only runs for blocks the cheap rules
            # don't already keep (identical decision, most blocks skip it)
            good = (is_head and n >= 3) or n >= MIN_GOOD_CHARS
            if not good and n >= STOPWORD_MIN_CHARS:
                toks = text.split(" ")
                sw = sum(1 for w in toks if w.lower() in EN_STOPWORDS)
                good = sw / len(toks) >= STOPWORD_DENSITY_MIN
        if good:
            blocks.append(("heading" if is_head else "text", text, None))
        block_boiler = boiler_depth > 0

    pos = 0
    for m in _TAG_RE.finditer(html):
        raw = html[pos : m.start()]
        pos = m.end()
        if raw:
            if in_table:
                if boiler_depth == 0:  # script/style/nav inside a table is
                    t = tidy(_unescape(raw))  # boilerplate, not cell text
                    if t:
                        table_cells.append(t)
            else:
                buf.append(raw)
                if link_depth > 0:
                    link_chars += len(tidy(_unescape(raw)))
        g1, g2, attrs = m.group(1, 2, 3)
        closing, tag = g1 == "/", g2.lower()

        if tag == "a":
            link_depth = max(0, link_depth - 1) if closing else link_depth + 1
            continue
        if tag == "img" and not closing:
            if boiler_depth == 0 and not in_table:
                sm = _SRC_RE.search(attrs or "")
                src = (sm.group(1) or sm.group(2) or sm.group(3)) if sm else ""
                flush()
                blocks.append(("image", "", src or None))
            continue
        if tag == "table":
            if not closing:
                if in_table == 0 and boiler_depth == 0:
                    flush()
                    table_cells = []
                in_table += 1
            else:
                in_table = max(0, in_table - 1)
                if in_table == 0:
                    if boiler_depth == 0 and table_cells:
                        blocks.append(("table", " | ".join(table_cells), None))
                    table_cells = []
            block_boiler = boiler_depth > 0
            continue
        if tag in BOILER_TAGS:
            # handled even inside tables, so boiler depth stays balanced and
            # <script>/<nav> bodies never leak into table cells
            if not in_table:
                flush()
            boiler_depth = max(0, boiler_depth - 1) if closing else boiler_depth + 1
            block_boiler = boiler_depth > 0
            continue
        if in_table:
            continue
        if tag in BLOCK_TAGS:
            flush()
            if tag in HEADING_TAGS:
                heading = None if closing else tag
            else:
                heading = None
    # trailing text after the last tag
    if pos < len(html):
        buf.append(html[pos:])
    flush()
    return blocks
