"""Multimodal column operators — binary media with typed metadata.

The reference ingests images/audio alongside documents (MIME map,
reference src/ingestion/document.py:24-53; picture description options
:130-146). At 100 TB media lives as opaque `binary` columns (or object-store
refs) with typed metadata; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` kernels.

Image/audio libs are NOT in this container, so the decode step is a
deterministic fake behind an import-try (clearly marked); the Spark-side
plumbing — schema, batch shape, UDF signature, partitioning — is real and
tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import table

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = (
    "doc_id long, media_ref string, media_kind string, content binary, "
    "width int, height int, duration_ms int"
)
FEATURES_SCHEMA = (
    "doc_id long, media_ref string, media_kind string, feat array<float>, "
    "width int, height int, decode_status string"
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from documents: binary payload
    = md5-stream bytes; typed metadata columns. Stands in for an Iceberg
    blob/metadata table."""
    docs = table(spark, sf_dir, "documents")
    payload = F.unhex(F.md5(F.concat_ws("|", "doc_id", "text")))
    return docs.select(
        "doc_id",
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.when(F.col("doc_id") % 3 == 0, "audio").otherwise("image").alias("media_kind"),
        payload.alias("content"),
        (F.col("doc_id") % 1920 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 1080 + 16).cast("int").alias("height"),
        F.when(F.col("doc_id") % 3 == 0, (F.col("doc_id") % 60000).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("duration_ms"),
    )


def _decode_features(content: bytes, kind: str) -> tuple[list[float], str]:
    """Decode + feature-extract. Real decoders unavailable → deterministic
    fake features from the bytes; the try/except gates the real path."""
    try:
        if kind == "image":
            import PIL  # noqa: F401

            raise NotImplementedError("real image decode not wired in sandbox")
        import soundfile  # noqa: F401

        raise NotImplementedError("real audio decode not wired in sandbox")
    except ImportError:
        h = hashlib.md5(content or b"").hexdigest()
        feat = [int(h[i : i + 2], 16) / 255.0 for i in range(0, 16, 2)]
        return feat, "fake-decode"


def _media_kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    for pdf in batches:
        feats, status = [], []
        for content, kind in zip(pdf["content"], pdf["media_kind"]):
            f, s = _decode_features(bytes(content) if content is not None else b"", kind)
            feats.append(f)
            status.append(s)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "media_kind": pdf["media_kind"],
                "feat": feats,
                "width": pdf["width"],
                "height": pdf["height"],
                "decode_status": status,
            }
        )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media table → per-item feature vectors via mapInPandas (the
    decode/feature-extract stage; frame-sampling/resize would be additional
    columns out of the same kernel)."""
    media = synth_media(spark, sf_dir)
    return media.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_media_kernel, schema=FEATURES_SCHEMA)


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup (pure relational; SQL-oracle-checkable)."""
    media = synth_media(spark, sf_dir)
    return media.groupBy("media_kind").agg(
        F.count("*").alias("n_items"),
        F.max("width").alias("max_width"),
        F.round(F.avg("duration_ms"), 6).alias("avg_duration_ms"),
        F.sum(F.length("content")).alias("total_bytes"),
    )


MEDIA_STATS_SQL = """
select case when doc_id % 3 = 0 then 'audio' else 'image' end as media_kind,
       count(*) as n_items,
       max((doc_id % 1920 + 16)::int) as max_width,
       round(avg(case when doc_id % 3 = 0 then (doc_id % 60000)::int end), 6)
         as avg_duration_ms,
       sum(octet_length(unhex(md5(doc_id::varchar || '|' || text)))) as total_bytes
from documents
group by 1
"""

QUERIES = {
    "media_features": media_features,  # rows-only (binary kernel)
    "media_stats": media_stats,
}
ORACLES = {"media_stats": MEDIA_STATS_SQL}
