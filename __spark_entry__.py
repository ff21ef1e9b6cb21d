"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline end-to-end on the
sf0.001-derived interleaved corpus. ``queries()`` exposes every implemented
operator from SURVEY.md §2 (+ the training-pipeline dedup/similarity/
text-analysis/multimodal operators); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from docling_rag_spark.operators import (  # noqa: E402
    attributes,
    bpe,
    dedup,
    embed,
    extraction_queries,
    multimodal,
    retrieval,
    similarity,
    temporal,
    textstats,
    training_set,
    visibility,
)

_MODULES = [
    extraction_queries,
    attributes,
    bpe,
    dedup,
    similarity,
    textstats,
    retrieval,
    temporal,
    training_set,
    visibility,
    embed,
    multimodal,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (interleaved spans → ordered spans
    → chunks) on the sf0.001-derived corpus."""
    from docling_rag_spark.pipeline import run_extraction
    from docling_rag_spark.sources.corpus import corpus_for_sf

    corpus = corpus_for_sf(spark, "/root/testdata/sf0.001")
    _extracted, chunks, _lineage = run_extraction(corpus, run_id="entry")
    return chunks


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out


# --- NOT part of the driver contract: queries retired from the 50-slot
# contract (subsumed by a stronger exposed variant) but still oracle-checked
# locally (tests/test_extended_oracles.py, tools/oracle_check.py --extra).
def extended_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(getattr(m, "EXTRA_QUERIES", {}))
    return out


def extended_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "EXTRA_ORACLES", {}))
    return out
