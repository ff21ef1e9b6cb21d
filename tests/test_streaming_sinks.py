"""Streaming ingest exactly-once (checkpoint resume) + idempotent sinks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from docling_rag_spark.datagen import build_spans
from docling_rag_spark.schemas import DOCUMENTS_SPANS_SCHEMA
from docling_rag_spark.sources.sinks import idempotent_append
from docling_rag_spark.streaming.ingest import stream_ingest


def _write_batch(spark, path, ids):
    rows = [(d, build_spans(d, f"some text for {d} the and of")) for d in ids]
    df = spark.createDataFrame(rows, schema=DOCUMENTS_SPANS_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


def test_stream_ingest_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write_batch(spark, inp, [f"s{i}" for i in range(4)])
    stream_ingest(spark, inp, out)
    chunks1 = spark.read.parquet(os.path.join(out, "chunks"))
    docs1 = {r["doc_id"] for r in chunks1.select("doc_id").distinct().collect()}
    assert docs1 == {f"s{i}" for i in range(4)}

    # re-run with NO new files → checkpoint prevents reprocessing
    stream_ingest(spark, inp, out)
    assert spark.read.parquet(os.path.join(out, "chunks")).count() == chunks1.count()

    # new files arrive → only they are processed
    _write_batch(spark, inp, ["s4", "s5"])
    stream_ingest(spark, inp, out)
    chunks2 = spark.read.parquet(os.path.join(out, "chunks"))
    docs2 = {r["doc_id"] for r in chunks2.select("doc_id").distinct().collect()}
    assert docs2 == {f"s{i}" for i in range(6)}
    # no duplicate chunk ids
    assert chunks2.count() == chunks2.select("id").distinct().count()


def test_idempotent_append(spark, tmp_path):
    path = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], schema="id string, v int"
    )
    idempotent_append(spark, df, path)
    idempotent_append(spark, df, path)  # same batch twice
    got = spark.read.parquet(path)
    assert got.count() == 2
    df2 = spark.createDataFrame([("b", 9), ("c", 3)], schema="id string, v int")
    idempotent_append(spark, df2, path)
    got = spark.read.parquet(path).orderBy("id").collect()
    assert [(r["id"], r["v"]) for r in got] == [("a", 1), ("b", 2), ("c", 3)]


def test_idempotent_append_partial_target_not_overwritten(spark, tmp_path):
    """A target holding parquet WITHOUT a _SUCCESS marker (partially
    committed job / foreign writer) must be anti-joined against, never
    silently overwritten (ADVICE r1)."""
    import os

    from docling_rag_spark.sources.sinks import idempotent_append

    path = str(tmp_path / "t")
    first = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    first.coalesce(1).write.parquet(path)
    os.remove(os.path.join(path, "_SUCCESS"))  # simulate partial commit
    second = spark.createDataFrame([(2, "b"), (3, "c")], "id int, v string")
    idempotent_append(spark, second, path, key="id")
    got = sorted((r["id"], r["v"]) for r in spark.read.parquet(path).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]  # old rows survive, no dups
