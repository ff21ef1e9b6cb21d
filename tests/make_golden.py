"""(Re)generate tests/golden/extraction_golden.json — the FROZEN extraction
spec snapshot (FIXTURES.md F2). Run manually ONLY on a deliberate spec
change: `python tests/make_golden.py`. The test suite compares the live
kernels against this file; because the Spark kernel and the oracle share
code, only a frozen snapshot catches accidental spec drift."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docling_rag_spark.datagen import build_spans, make_html, make_minipdf  # noqa: E402
from docling_rag_spark.kernels.extract import extract_document_oracle  # noqa: E402

GOLDEN = Path(__file__).parent / "golden" / "extraction_golden.json"


def handcrafted_docs() -> dict[str, list[dict]]:
    docs: dict[str, list[dict]] = {}
    docs["hand_html"] = [
        {
            "kind": "html",
            "text": (
                "<html><head><title>x</title></head><body>"
                "<nav><a href='/'>Home</a> <a href='/p'>Products</a></nav>"
                "<h1>Quarterly Report</h1>"
                "<p>Revenue grew twelve percent compared to the previous year.</p>"
                "<div><a href='/1'>one</a> <a href='/2'>two</a> <a href='/3'>three</a></div>"
                "<table><tr><td>q1</td><td>10</td></tr><tr><td>q2</td><td>12</td></tr></table>"
                "<img src='img://chart'>"
                "<p>it is on the up and up</p>"
                "<footer><p>All rights reserved by the example company.</p></footer>"
                "</body></html>"
            ),
            "media_ref": None,
            "offset": 0,
        },
        {"kind": "image", "text": "", "media_ref": "img://stand-alone", "offset": 10},
    ]
    docs["hand_pdf"] = [
        {
            "kind": "pdf",
            "text": "\n".join(
                [
                    "%MINIPDF 1",
                    "block 2 0 40 text - page two paragraph",
                    "block 1 320 40 text - right column text",
                    "block 1 0 40 text - left column text",
                    "block 1 0 400 table tbl://x a | b | c",
                    "block 1 320 400 figure fig://y",
                    "block 1 0 760 rastertext - scanned only content that is long",
                ]
            ),
            "media_ref": None,
            "offset": 0,
        },
        {"kind": "text", "text": "  plain\t tail  ", "media_ref": None, "offset": 5},
    ]
    docs["hand_scrambled_offsets"] = [
        {"kind": "text", "text": "second", "media_ref": None, "offset": 20},
        {"kind": "audio", "text": "", "media_ref": "aud://a", "offset": 10},
        {"kind": "text", "text": "first piece of text", "media_ref": None, "offset": 0},
    ]
    # two datagen-derived docs (ties the generator into the frozen spec too)
    docs["gen_0"] = build_spans("0", "the fast key order sort table scan merge part")
    docs["gen_giant_probe"] = build_spans("g7", "alpha beta gamma delta epsilon zeta")
    return docs


def main() -> None:
    golden = {
        doc: [
            {"order": o, "kind": k, "text": t, "media_ref": r, "page_num": p}
            for (o, k, t, r, p) in extract_document_oracle(spans)
        ]
        for doc, spans in handcrafted_docs().items()
    }
    GOLDEN.parent.mkdir(exist_ok=True)
    GOLDEN.write_text(json.dumps(golden, indent=1, sort_keys=True))
    print(f"wrote {GOLDEN} ({sum(len(v) for v in golden.values())} spans)")


if __name__ == "__main__":
    main()
