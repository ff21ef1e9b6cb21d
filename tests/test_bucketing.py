"""Bucketed co-located joins: the shuffle-elimination path for repeated
doc_id joins (chunks ⋈ extracted_spans, top-k rehydration, resume
anti-joins). At 100 TB the chunks/spans tables are written BUCKETED BY
doc_id (Iceberg: `PARTITIONED BY (bucket(N, doc_id))`, SURVEY §2.1 S5) so
every later equi-join on doc_id is exchange-free; this test proves the
plan property on the parquet/bucketBy stand-in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    docs = spark.range(2000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7).alias("k"),
    )
    chunks = docs.select("doc_id", F.md5("doc_id").alias("chunk_text"))
    spark.sql("drop table if exists t_spans_b")
    spark.sql("drop table if exists t_chunks_b")
    (
        docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", str(tmp_path / "spans_b"))
        .saveAsTable("t_spans_b")
    )
    (
        chunks.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", str(tmp_path / "chunks_b"))
        .saveAsTable("t_chunks_b")
    )
    yield "t_spans_b", "t_chunks_b"
    spark.sql("drop table if exists t_spans_b")
    spark.sql("drop table if exists t_chunks_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables, tmp_path):
    ta, tb = bucketed_tables
    # merge hint: a broadcast join would trivially have no exchange —
    # the claim under test is that the SORT-MERGE path needs none
    joined = spark.table(ta).hint("merge").join(spark.table(tb), "doc_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # co-located: bucket joins bucket
    assert joined.count() == 2000
    # control: the same join over plain (unbucketed) parquet DOES shuffle
    spark.table(ta).write.parquet(str(tmp_path / "plain_a"))
    spark.table(tb).write.parquet(str(tmp_path / "plain_b"))
    # merge hint on the join INPUT (a post-join hint is ignored) so the
    # control takes the sort-merge path rather than a broadcast
    ctrl = (
        spark.read.parquet(str(tmp_path / "plain_a"))
        .hint("merge")
        .join(spark.read.parquet(str(tmp_path / "plain_b")), "doc_id")
    )
    ctrl_plan = ctrl._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in ctrl_plan  # a real shuffle
