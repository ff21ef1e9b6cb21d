"""Embedding stage (E14) — Arrow-batched pandas UDF with a per-executor
model cache, mirroring the reference's SentenceTransformer singleton
(reference src/utils.py:39-99, batch 256 per src/config.py:33).

sentence-transformers is not installed in this container, so the model is a
clearly-marked deterministic stand-in (md5-seeded unit-normalized
projection, same pattern as the reference's own test fixtures —
tests/test_permission_visibility.py:63-66). The Spark-side plumbing
(Series→Series(array<float>) pandas_udf, Arrow batching, executor cache)
is the real production shape: swap `_encode_batch` for a real model.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .common import table

EMBED_DIM = 64  # matches the sandbox embeddings table; reference uses 768

_MODEL_CACHE: dict[str, object] = {}


def _load_model():
    """Per-executor singleton (reference src/utils.py:63-77). A real model
    would be loaded here; unavailable in this container."""
    if "model" not in _MODEL_CACHE:
        try:
            import sentence_transformers  # noqa: F401

            raise NotImplementedError(
                "real sentence-transformers path not wired in this sandbox"
            )
        except ImportError:
            _MODEL_CACHE["model"] = "deterministic-fake"
    return _MODEL_CACHE["model"]


def _fake_embed(text: str) -> list[float]:
    """Deterministic unit-normalized vector from md5 of 8-char text slices."""
    vals = []
    for i in range(EMBED_DIM):
        h = hashlib.md5(f"{i}|{text}".encode()).hexdigest()
        vals.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / norm for v in vals]


def _embed_fn(texts):
    import pandas as pd

    _load_model()
    return pd.Series([_fake_embed(t or "") for t in texts])


def embed_udf():
    """Built lazily — pandas_udf return-type parsing needs an active session
    (module-import-time construction breaks pytest collection)."""
    return pandas_udf(_embed_fn, "array<float>")


def embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, embedding, embedding_norm). rows-only check
    (vector output has no SQL oracle); determinism tested in pytest."""
    docs = table(spark, sf_dir, "documents")
    emb = docs.select("doc_id", embed_udf()(F.col("text")).alias("embedding"))
    return emb.select(
        "doc_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding").cast("array<double>"),
                        F.col("embedding").cast("array<double>"),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
            4,
        ).alias("embedding_norm"),
        F.size("embedding").alias("dim"),
    )


QUERIES = {"embed_documents": embed_documents}
ORACLES: dict[str, str] = {}  # rows-only: vector kernel, not SQL-expressible


def embed_chunks(chunks: DataFrame) -> DataFrame:
    """Attach embeddings to a chunks DataFrame (the reference's embed stage
    between chunking and the vector sink, src/ingestion/pipeline.py:39-44).
    Arrow-batched; per-executor model singleton."""
    return chunks.withColumn("embedding", embed_udf()(F.col("text")))
