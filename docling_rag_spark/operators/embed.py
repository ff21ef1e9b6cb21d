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
    """documents → (doc_id, embedding_norm, dim, e0, esum): a driver-sortable
    projection of the embedding stage. The fake model is md5-derived, so the
    DuckDB oracle replays the full encode (values, unit-normalization,
    float32 quantization) — e0/esum make the check value-sensitive, all
    rounded to 4 dp so a last-bit float32 boundary flip cannot flake it."""
    docs = table(spark, sf_dir, "documents")
    emb = docs.select("doc_id", embed_udf()(F.col("text")).alias("embedding"))
    d = F.col("embedding").cast("array<double>")
    return emb.select(
        "doc_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with(d, d, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
            4,
        ).alias("embedding_norm"),
        F.size("embedding").alias("dim"),
        F.round(F.element_at(d, 1), 4).alias("e0"),
        F.round(F.aggregate(d, F.lit(0.0), lambda a, x: a + x), 4).alias("esum"),
    )


def _embed_sql() -> str:
    from .common import hexn_to_bigint_sql

    h8 = hexn_to_bigint_sql("md5(i::varchar || '|' || coalesce(text, ''))", 8)
    return f"""
with raws as (
  select doc_id,
         list_transform(range(0, {EMBED_DIM}),
                        i -> ({h8}::double / 4294967295.0) * 2.0 - 1.0) as raw
  from documents
),
unit as (
  select doc_id,
         list_transform(raw,
           x -> (x / sqrt(list_sum(list_transform(raw, y -> y * y))))::float
         ) as emb
  from raws
)
select doc_id,
       round(sqrt(list_sum(list_transform(emb, x -> x::double * x::double))), 4)
         as embedding_norm,
       {EMBED_DIM}::int as dim,
       round(emb[1]::double, 4) as e0,
       round(list_sum(list_transform(emb, x -> x::double)), 4) as esum
from unit
"""


EMBED_SQL = _embed_sql()

QUERIES = {"embed_documents": embed_documents}
ORACLES: dict[str, str] = {"embed_documents": EMBED_SQL}


def embed_chunks(chunks: DataFrame) -> DataFrame:
    """Attach embeddings to a chunks DataFrame (the reference's embed stage
    between chunking and the vector sink, src/ingestion/pipeline.py:39-44).
    Arrow-batched; per-executor model singleton."""
    return chunks.withColumn("embedding", embed_udf()(F.col("text")))


def fake_embed_ctes(src: str, id_col: str, out: str, float32: bool = True) -> str:
    """DuckDB CTE pair ``<out>_raw`` → ``<out>``: the deterministic stand-in
    embedding of each row's ``text`` in ``src``, staged (raw values → unit
    normalization) exactly like _embed_sql. ``float32=True`` replays the
    pandas UDF's array<float> quantization; False keeps full doubles (the
    shape of a driver-side literal query vector)."""
    from .common import hexn_to_bigint_sql

    h8 = hexn_to_bigint_sql("md5(i::varchar || '|' || coalesce(text, ''))", 8)
    cast = "::float" if float32 else ""
    return f"""
{out}_raw as materialized (
  select {id_col}, list_transform(range(0, {EMBED_DIM}),
         i -> ({h8}::double / 4294967295.0) * 2.0 - 1.0) as raw
  from {src}
),
{out} as materialized (
  select {id_col},
         list_transform(raw,
           x -> (x / sqrt(list_sum(list_transform(raw, y -> y * y)))){cast}
         ) as emb
  from {out}_raw
)"""
