"""jobs/select_job.py — the deployable selection flagship (round-5 verdict
#8): idempotent sink + per-doc selection lineage + kill-and-resume at the
selection stage."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

from docling_rag_spark.datagen import build_spans
from docling_rag_spark.pipeline import run_extraction
from docling_rag_spark.schemas import DOCUMENTS_SPANS_SCHEMA


@pytest.fixture(scope="module")
def chunks_path(spark, tmp_path_factory):
    """A small chunk table from the REAL extraction pipeline, with numeric
    doc ids (the holdout rule is doc_id % 50), duplicate texts (dedup must
    trigger) and a too-short doc (filtered status must appear)."""
    dup = "the quick brown fox jumps over the lazy dog and the hen of prose"
    rows = []
    for i in range(96, 112):  # 100 is an eval doc (100 % 50 == 0)
        text = dup if i in (97, 103, 109) else (
            f"word{i} stories of the old town and the river {i} "
            f"keep the lights on and the doors open number {i}"
        )
        rows.append((str(i), build_spans(str(i), text)))
    rows.append(("113", build_spans("113", "tiny doc")))  # -> filtered
    docs = spark.createDataFrame(rows, schema=DOCUMENTS_SPANS_SCHEMA)
    _, chunks, _ = run_extraction(docs, run_id="mk-chunks")
    out = str(tmp_path_factory.mktemp("sel") / "chunks.parquet")
    chunks.write.parquet(out)
    return out


def _run_job(monkeypatch, spark, argv):
    import jobs.select_job as J

    monkeypatch.setattr(sys, "argv", ["select_job.py"] + argv)
    # the job's spark.stop() must not kill the shared test session
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    J.main()


def test_select_job_kill_and_resume(spark, chunks_path, tmp_path, monkeypatch):
    import docling_rag_spark.sources.sinks as sinks

    ref_out = str(tmp_path / "ref")
    _run_job(monkeypatch, spark, ["--input", chunks_path, "--output", ref_out,
                                  "--run-id", "clean"])
    ref_sel = spark.read.parquet(f"{ref_out}/selected_chunks")
    ref_ids = {r["id"] for r in ref_sel.select("id").collect()}
    ref_lin = spark.read.parquet(f"{ref_out}/selection_lineage")
    statuses = {r["status"] for r in ref_lin.select("status").collect()}
    assert len(ref_ids) > 0
    assert statuses == {"selected", "filtered"}  # both outcomes exercised
    # holdout honored: no eval doc's chunks selected
    assert ref_sel.filter(F.col("doc_id").cast("bigint") % 50 == 0).count() == 0
    # lineage covers every input doc exactly once
    n_docs = spark.read.parquet(chunks_path).select("doc_id").distinct().count()
    assert ref_lin.count() == n_docs

    # ---- kill-and-resume: crash BETWEEN chunk append and lineage commit
    out = str(tmp_path / "crash")
    real = sinks.idempotent_append

    def crashing(spark_, df, path, key="id", **kw):
        if "selection_lineage" in path:
            raise RuntimeError("simulated crash before lineage commit")
        return real(spark_, df, path, key, **kw)

    monkeypatch.setattr(sinks, "idempotent_append", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _run_job(monkeypatch, spark, ["--input", chunks_path, "--output", out,
                                      "--run-id", "killed"])
    monkeypatch.setattr(sinks, "idempotent_append", real)
    # chunks were committed, lineage was not — the crash window
    assert spark.read.parquet(f"{out}/selected_chunks").count() > 0
    import os

    assert not os.path.isdir(f"{out}/selection_lineage")

    # ---- resume: replays are dropped by the id key; end state == clean run
    _run_job(monkeypatch, spark, ["--input", chunks_path, "--output", out,
                                  "--resume", "--run-id", "resumed"])
    sel = spark.read.parquet(f"{out}/selected_chunks")
    assert {r["id"] for r in sel.select("id").collect()} == ref_ids
    assert sel.count() == sel.select("id").distinct().count()  # exactly-once
    lin = spark.read.parquet(f"{out}/selection_lineage")
    assert lin.count() == n_docs
    assert {r["run_id"] for r in lin.select("run_id").distinct().collect()} == {
        "resumed"
    }

    # ---- a second resume run is a no-op: every doc already has lineage
    _run_job(monkeypatch, spark, ["--input", chunks_path, "--output", out,
                                  "--resume", "--run-id", "noop"])
    lin2 = spark.read.parquet(f"{out}/selection_lineage")
    assert lin2.count() == n_docs
    assert lin2.filter(F.col("run_id") == "noop").count() == 0
    assert spark.read.parquet(f"{out}/selected_chunks").count() == len(ref_ids)

    # ---- --pack on a resumed output packs the FULL committed selected
    # set (regenerated, not appended — offsets are global per bucket)
    from docling_rag_spark.operators.training_set import PACK_BUDGET

    _run_job(monkeypatch, spark, ["--input", chunks_path, "--output", out,
                                  "--resume", "--pack", "--run-id", "packed"])
    packed = spark.read.parquet(f"{out}/packed_sequences")
    rows = packed.collect()
    assert {r["id"] for r in rows} == ref_ids
    assert all(r["seq_id"] == r["tok_offset"] // PACK_BUDGET for r in rows)
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for members in by_bucket.values():
        members.sort(key=lambda r: (r["doc_id"], r["chunk_index"]))
        assert members[0]["tok_offset"] == 0  # each bucket stream starts at 0
        offs = [r["tok_offset"] for r in members]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)

    # ---- --pack on a resume that commits ZERO new docs must NOT repack:
    # the existing packed_sequences is already the packing of the
    # committed set (round-5 verdict wrong#3 — full repack was paid on
    # every no-op resume)
    before = {
        p: os.stat(os.path.join(f"{out}/packed_sequences", p)).st_mtime_ns
        for p in os.listdir(f"{out}/packed_sequences")
    }
    _run_job(monkeypatch, spark, ["--input", chunks_path, "--output", out,
                                  "--resume", "--pack", "--run-id", "repack"])
    after = {
        p: os.stat(os.path.join(f"{out}/packed_sequences", p)).st_mtime_ns
        for p in os.listdir(f"{out}/packed_sequences")
    }
    assert after == before  # untouched, byte-for-byte the same files

    # ---- the crash window the skip gate must NOT mask (round-6 review):
    # docs get committed + lineage'd but the job dies BEFORE the pack
    # swap. The next resume sees 0 new docs — yet packed_sequences still
    # reflects the PREVIOUS commit. Simulate by growing selected_chunks
    # via a resume run WITHOUT --pack (equivalent end state), then
    # resuming with --pack: the _PACKED_N marker mismatch must force the
    # repack even though this_run == 0.
    extra = spark.createDataFrame(
        [("501", build_spans(  # 501 % 50 != 0 — a training doc, not holdout
            "501",
            "the river keeps the old town lights on and the doors open "
            "stories of number five hundred and one flow on and on",
        ))],
        schema=DOCUMENTS_SPANS_SCHEMA,
    )
    _, extra_chunks, _ = run_extraction(extra, run_id="mk-extra")
    grown = str(tmp_path / "chunks_grown.parquet")
    spark.read.parquet(chunks_path).unionByName(extra_chunks).write.parquet(grown)
    _run_job(monkeypatch, spark, ["--input", grown, "--output", out,
                                  "--resume", "--run-id", "grow"])  # no --pack
    sel_ids = {
        r["id"]
        for r in spark.read.parquet(f"{out}/selected_chunks").select("id").collect()
    }
    assert sel_ids > ref_ids  # the committed set actually grew
    _run_job(monkeypatch, spark, ["--input", grown, "--output", out,
                                  "--resume", "--pack", "--run-id", "heal"])
    packed_ids = {
        r["id"]
        for r in spark.read.parquet(f"{out}/packed_sequences").select("id").collect()
    }
    assert packed_ids == sel_ids  # repacked despite this_run == 0


def test_non_numeric_doc_ids_are_not_silently_dropped(spark):
    """Round-5 review: a NULL holdout predicate (non-numeric doc_id casts
    to NULL) used to fail BOTH the eval and the training filter, so such
    docs' chunks vanished silently (masked as 'filtered' in lineage). A
    UUID-style chunk table must flow through selection as training docs."""
    from docling_rag_spark.operators.training_set import (
        select_training_chunks,
    )

    text = ("the quick brown fox jumps over the lazy dog and then the hen "
            "walks along the river bank past the old mill")
    rows = [
        (f"uuid-{i:04x}-doc", i, text + f" tail{i}", 22, f"id{i:04d}")
        for i in range(8)
    ]
    chunks = spark.createDataFrame(
        rows, "doc_id string, chunk_index int, text string, n_tokens int, id string"
    )
    out = select_training_chunks(chunks)
    got_docs = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    # nothing is eval (non-numeric ids), nothing vanishes: every doc that
    # passes the quality/lang/dedup gates appears, and at minimum SOME do
    assert len(got_docs) > 0
    assert got_docs <= {r[0] for r in rows}
    # every input doc is accounted for: present in output or dropped by a
    # REAL filter (here texts are near-identical -> LSH dedup drops the
    # non-minimum ids; the union of kept+dup-dropped must cover all docs)
    from docling_rag_spark.operators.dedup import lsh_bucket_dups, shingle_rows_from

    dup_ids = {
        r["id"]
        for r in lsh_bucket_dups(shingle_rows_from(chunks, "id"), "id").collect()
    }
    kept_ids = {r["id"] for r in out.collect()}
    assert kept_ids.isdisjoint(dup_ids)
    assert len(kept_ids) + len(dup_ids) == len(rows)


def test_select_job_partial_lineage_resume_skips_done(
    spark, chunks_path, tmp_path, monkeypatch
):
    """A run killed AFTER some docs' lineage committed: resume must skip
    exactly those docs (write side) while still deduplicating against the
    full corpus — final state equals a clean run."""
    ref_out = str(tmp_path / "ref2")
    _run_job(monkeypatch, spark, ["--input", chunks_path, "--output", ref_out,
                                  "--run-id", "clean"])
    ref_lin = spark.read.parquet(f"{ref_out}/selection_lineage")
    ref_sel = spark.read.parquet(f"{ref_out}/selected_chunks")
    ref_ids = {r["id"] for r in ref_sel.select("id").collect()}

    out = str(tmp_path / "partial")
    some_docs = [r["doc_id"] for r in ref_lin.select("doc_id").collect()][:5]
    partial_lin = ref_lin.filter(F.col("doc_id").isin(some_docs)).withColumn(
        "run_id", F.lit("killed")
    )
    partial_sel = ref_sel.filter(F.col("doc_id").isin(some_docs))
    partial_lin.write.parquet(f"{out}/selection_lineage")
    partial_sel.write.parquet(f"{out}/selected_chunks")

    _run_job(monkeypatch, spark, ["--input", chunks_path, "--output", out,
                                  "--resume", "--run-id", "resumed"])
    lin = spark.read.parquet(f"{out}/selection_lineage")
    sel = spark.read.parquet(f"{out}/selected_chunks")
    assert {r["id"] for r in sel.select("id").collect()} == ref_ids
    # the 5 pre-committed docs kept their original lineage rows (skipped)
    assert lin.filter(F.col("run_id") == "killed").count() == 5
    assert lin.count() == ref_lin.count()
