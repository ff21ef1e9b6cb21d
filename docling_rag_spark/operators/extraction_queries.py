"""Driver-facing wrappers for the core extraction pipeline (SURVEY.md §2.2).

These run the real engine (corpus → mapInPandas extraction → window order →
chunker → lineage) at the given sf. HTML/PDF parsing is not
SQL-expressible, so these are rows-only driver checks; the hard correctness
gate — span-sequence equality vs the single-process oracle on
(kind, text, media_ref, order) — lives in tests/test_extraction_parity.py
per BASELINE.json:15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import chunk_spans, doc_metadata, extract_blocks, explode_spans, order_spans
from ..sources.corpus import corpus_for_sf


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = corpus_for_sf(spark, sf_dir)
    blocks = extract_blocks(explode_spans(corpus))
    return order_spans(blocks)


def extract_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _extracted(spark, sf_dir)


def extract_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_spans(_extracted(spark, sf_dir))


def doc_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = corpus_for_sf(spark, sf_dir)
    extracted = order_spans(extract_blocks(explode_spans(corpus)))
    chunks = chunk_spans(extracted)
    return doc_metadata(corpus, extracted, chunks)


def extract_span_kinds_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup of extracted span kinds — cheap smoke over the full pipeline."""
    return (
        _extracted(spark, sf_dir)
        .groupBy("kind")
        .agg(F.count("*").alias("n_spans"), F.countDistinct("doc_id").alias("n_docs"))
    )


QUERIES = {
    "extract_spans": extract_spans_q,
    "extract_chunks": extract_chunks_q,
    "extract_doc_metadata": doc_metadata_q,
    "extract_span_kinds": extract_span_kinds_q,
}
ORACLES: dict[str, str] = {}  # rows-only: extraction is not SQL-expressible
