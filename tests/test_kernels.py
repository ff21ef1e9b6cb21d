"""Unit tests for the deterministic kernels (the extraction spec itself)."""

from __future__ import annotations

import hashlib

from docling_rag_spark.kernels.extract import extract_span
from docling_rag_spark.kernels.html_extract import extract_html_blocks
from docling_rag_spark.kernels.pdf_extract import (
    extract_pdf_blocks,
    ocr_probe_force,
    page_count,
    parse_minipdf,
)
from docling_rag_spark.kernels.textutils import (
    chunk_id,
    detect_language,
    minhash_signature,
    rolling_fingerprint,
    simhash64,
    shingles,
    tidy,
    token_count,
)


def test_tidy_reference_recipe():
    # exact reference semantics (src/ingestion/document.py:113-114)
    assert tidy("a\r\nb") == "a b"
    assert tidy("x <!-- image --> y") == "x y"
    assert tidy("  a   b\t c ") == "a b c"
    assert tidy("") == ""


def test_chunk_id_recipe():
    assert chunk_id("d", 0, "t") == hashlib.md5(b"d_0_t").hexdigest()


def test_detect_language():
    assert detect_language("the cat and the dog of the house") == "en"
    assert detect_language("el perro de la casa que los gatos") == "es"
    assert detect_language("zzz qqq xxx") == "en"  # no markers → en
    assert detect_language("") == "en"


def test_html_extractor_boilerplate():
    html = (
        "<html><head><title>t</title></head><body>"
        "<nav><a href='/'>Home</a><a href='/x'>About</a></nav>"
        "<p>This is the real main content of the page with enough length.</p>"
        "<div><a href='/1'>link</a> <a href='/2'>link</a> <a href='/3'>link</a></div>"
        "<footer><p>Copyright someone, all rights reserved forever.</p></footer>"
        "</body></html>"
    )
    blocks = extract_html_blocks(html)
    assert blocks == [
        ("text", "This is the real main content of the page with enough length.", None)
    ]


def test_html_table_and_image():
    html = (
        "<body><h1>Title here</h1>"
        "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
        "<img src='img://x'>"
        "<p>Closing paragraph with sufficient character length here.</p></body>"
    )
    blocks = extract_html_blocks(html)
    assert blocks == [
        ("heading", "Title here", None),
        ("table", "a | b | c", None),
        ("image", "", "img://x"),
        ("text", "Closing paragraph with sufficient character length here.", None),
    ]


def test_html_short_low_stopword_dropped():
    assert extract_html_blocks("<p>xyzzy plugh</p>") == []
    # short but stopword-dense → kept
    assert extract_html_blocks("<p>it is on the way</p>") == [
        ("text", "it is on the way", None)
    ]


def test_minipdf_reading_order():
    payload = "\n".join(
        [
            "%MINIPDF 1",
            "block 2 0 40 text - second page",
            "block 1 320 40 text - right column",
            "block 1 0 40 text - left column",
            "block 1 0 700 table tbl://t a | b",
            "block 1 320 710 figure fig://f",
        ]
    )
    out = extract_pdf_blocks(payload)
    # column-major reading order: the whole left column (x0 < 306) before
    # the right column, pages in order
    assert out[0] == ("text", "left column", None, 1)
    assert out[1] == ("table", "a | b", "tbl://t", 1)
    assert out[2] == ("text", "right column", None, 1)
    assert out[3] == ("figure", "", "fig://f", 1)
    assert out[4] == ("text", "second page", None, 2)
    assert page_count(payload) == 2


def test_ocr_probe_thresholds():
    # no-OCR text empty → force
    blocks = parse_minipdf("%MINIPDF 1\nblock 1 0 0 rastertext - scanned stuff")
    assert ocr_probe_force(blocks) is True
    # gain 50%: exactly at threshold → NOT forced (strict >, reference :181)
    blocks = parse_minipdf(
        "%MINIPDF 1\nblock 1 0 0 text - aabb\nblock 1 0 20 rastertext - xy"
    )
    assert ocr_probe_force(blocks) is False
    # gain > 50% → forced
    blocks = parse_minipdf(
        "%MINIPDF 1\nblock 1 0 0 text - aabb\nblock 1 0 20 rastertext - xyz"
    )
    assert ocr_probe_force(blocks) is True
    # rastertext outside probe pages doesn't trigger
    blocks = parse_minipdf(
        "%MINIPDF 1\nblock 1 0 0 text - aabb\nblock 3 0 0 rastertext - xxxxxxxxxx"
    )
    assert ocr_probe_force(blocks) is False


def test_extract_span_dispatch():
    assert extract_span("text", "  a  b ", None) == [("text", "a b", None, None)]
    assert extract_span("image", "", "img://1") == [("image", "", "img://1", None)]
    assert extract_span("zorp", None, "ref://1") == [("zorp", "", "ref://1", None)]
    assert extract_span("pdf", "garbage", None) == [
        ("error", "invalid minipdf payload", None, None)
    ]
    assert extract_span("text", "   ", None) == []


def test_hash_primitives_deterministic():
    s = "the quick brown fox jumps over the lazy dog again and again"
    assert shingles("a b c d", 3) == ["a b c", "b c d"]
    assert minhash_signature(s) == minhash_signature(s)
    assert 0 <= simhash64(s) < (1 << 64)
    assert simhash64(s) == simhash64(s)
    assert rolling_fingerprint(s) == rolling_fingerprint(s)
    assert rolling_fingerprint("") == 0
    assert token_count("") == 0
