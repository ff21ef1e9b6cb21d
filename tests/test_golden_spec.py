"""Frozen-spec tests: compare live kernels against the checked-in golden
snapshot (tests/golden/extraction_golden.json). The kernel↔oracle parity
tests share code, so ONLY this snapshot catches accidental spec drift.
Regenerate deliberately with `python tests/make_golden.py`."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_rag_spark.kernels.extract import extract_document_oracle, extract_span
from docling_rag_spark.kernels.html_extract import extract_html_blocks
from docling_rag_spark.kernels.pdf_extract import extract_pdf_blocks, reading_order_key
from docling_rag_spark.kernels.textutils import tidy, token_count

GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "extraction_golden.json").read_text()
)


def _docs():
    import tests.make_golden as mg

    return mg.handcrafted_docs()


def test_oracle_matches_frozen_golden():
    docs = _docs()
    assert set(docs) == set(GOLDEN)
    for name, spans in docs.items():
        got = [
            {"order": o, "kind": k, "text": t, "media_ref": r, "page_num": p}
            for (o, k, t, r, p) in extract_document_oracle(spans)
        ]
        assert got == GOLDEN[name], f"spec drift in {name}"


def test_spark_kernel_matches_frozen_golden(spark):
    from docling_rag_spark.pipeline import run_extraction
    from docling_rag_spark.schemas import DOCUMENTS_SPANS_SCHEMA

    docs = _docs()
    df = spark.createDataFrame(list(docs.items()), schema=DOCUMENTS_SPANS_SCHEMA)
    extracted, _, _ = run_extraction(df, run_id="golden")
    got: dict[str, list] = {}
    for r in extracted.collect():
        got.setdefault(r["doc_id"], []).append(
            {"order": r["order"], "kind": r["kind"], "text": r["text"],
             "media_ref": r["media_ref"], "page_num": r["page_num"]}
        )
    for name in docs:
        assert sorted(got[name], key=lambda s: s["order"]) == GOLDEN[name], name


# --- property-based robustness (hypothesis) --------------------------------
@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_html_extractor_total(s):
    """Never crashes on arbitrary input; outputs are tidied, non-boilerplate."""
    for kind, text, ref in extract_html_blocks(s):
        assert kind in ("heading", "text", "table", "image")
        assert text == tidy(text)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300))
@settings(max_examples=200, deadline=None)
def test_extract_span_total(s):
    for kind in ("text", "html", "pdf", "image", "zzz"):
        out = extract_span(kind, s, None)
        for k, t, r, p in out:
            assert isinstance(k, str)


@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),  # page
            st.integers(0, 611),  # x0
            st.integers(0, 800),  # y0
            st.sampled_from(["text", "heading", "table", "figure", "rastertext"]),
            st.text(alphabet="ab ", min_size=1, max_size=10),
        ),
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_minipdf_reading_order_is_total_order(blocks):
    payload = "%MINIPDF 1\n" + "\n".join(
        f"block {p} {x} {y} {k} - {t}".replace("\n", " ")
        for (p, x, y, k, t) in blocks
    )
    parsed = extract_pdf_blocks(payload)
    # pages must be non-decreasing in output (reading order is page-major)
    pages = [p for (_, _, _, p) in parsed]
    assert pages == sorted(pages)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_token_count_consistent(s):
    assert token_count(s) == len([t for t in tidy(s).split(" ") if t])


def test_extract_golden_parquet_in_sync():
    """The committed golden parquet for the 4 extraction driver oracles
    (tests/golden/extract_*.parquet) must match a live regeneration — a spec
    or datagen change without `python tests/make_extract_golden.py` fails
    here instead of silently going stale. sf0.001 only (cheap)."""
    import pyarrow.parquet as pq

    import tests.make_extract_golden as mg

    live = mg.build_tables(["/root/testdata/sf0.001"])
    for kind, fname in mg.FILES.items():
        committed = pq.read_table(Path(__file__).parent / "golden" / fname)
        keys = set(live[kind].column("corpus_key").to_pylist())
        assert len(keys) == 1
        key = keys.pop()
        import pyarrow.compute as pc

        sl = committed.filter(pc.field("corpus_key") == key)
        assert sl.schema == live[kind].schema, kind
        assert sl.to_pylist() == live[kind].to_pylist(), kind


@settings(max_examples=400, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(alphabet=" \t\r\n\x0b\x0cab<!->ge imé ", max_size=6),
            st.just("<!-- image -->"),
            st.just("<!-- image"),
            st.just("image -->"),
        ),
        max_size=8,
    ).map("".join)
)
def test_tidy_single_pass_equals_reference_two_pass(s):
    """The optimized single-regex tidy must equal the reference two-pass
    recipe (sub('[\\r\\n]+|<!-- image -->',' ') then sub('\\s+',' '),
    ASCII \\s) on every input, including split/adjacent markers and
    non-breaking spaces (which are NOT separators)."""
    import re as _re

    cr = _re.sub(r"[\r\n]+|<!-- image -->", " ", s)
    expect = _re.sub(r"\s+", " ", cr, flags=_re.ASCII).strip()
    assert tidy(s) == expect


# round 4: random unicode rarely forms TAGS — this strategy interleaves
# real tag tokens (incl. unclosed/misnested/boilerplate/table/anchor/img)
# with text, driving the parser through its state machine far harder
_TAG_SOUP = st.lists(
    st.one_of(
        st.sampled_from(
            [
                "<p>", "</p>", "<div>", "</div>", "<h2>", "</h2>", "<li>",
                "<table>", "</table>", "<td>", "</td>", "<tr>", "</tr>",
                "<nav>", "</nav>", "<script>", "</script>", "<a href='x'>",
                "</a>", "<img src=pic.png>", "<img>", "<br>", "<TABLE>",
                "</NAV>", "<a>", "<h6>", "</h6>", "<aside>", "</aside>",
            ]
        ),
        st.text(alphabet="ab &<>/\"' .", min_size=1, max_size=12),
        st.sampled_from(["&amp;", "&lt;", "&nbsp;", "the of and"]),
    ),
    max_size=40,
).map("".join)


@given(_TAG_SOUP)
@settings(max_examples=300, deadline=None)
def test_html_extractor_total_on_tag_soup(s):
    """Arbitrarily misnested/unclosed markup: never raises, output kinds
    valid, text tidied, image refs only on image blocks, deterministic."""
    out = extract_html_blocks(s)
    assert out == extract_html_blocks(s)
    for kind, text, ref in out:
        assert kind in ("heading", "text", "table", "image")
        assert text == tidy(text)
        if ref is not None:
            assert kind == "image"
        if kind == "image":
            assert text == ""


@given(_TAG_SOUP)
@settings(max_examples=100, deadline=None)
def test_extract_span_html_total_on_tag_soup(s):
    """Full span dispatch on tag soup: valid block tuples, no exception —
    at 10^12 docs malformed markup must extract-or-dead-letter, not crash."""
    for k, t, r, p in extract_span("html", s, None):
        assert k in ("heading", "text", "table", "image")
        assert p is None
