"""The exactly-once sink protocol over scheme-qualified paths.

Round-5 ADVICE (low, jobs/select_job.py:115): the protocol was local-POSIX
only — os.walk on an hdfs:// output reported "empty" and the append
silently overwrote prior runs. Scheme-qualified paths now route through
the Hadoop FileSystem API on the session JVM (sinks._HadoopFS). These
tests run the SAME crash-window and idempotence suite as
test_streaming_sinks.py but over ``file://`` URIs, which drives the exact
Hadoop code path (Path/FileSystem/rename/listFiles/create/open) against
local disk — the strongest proof available without a real HDFS.
"""

from __future__ import annotations

import os
import sys

import pytest

from docling_rag_spark.sources.sinks import (
    _fs,
    _has_parquet_files,
    _HadoopFS,
    _PosixFS,
    _recover_swap,
    delete_docs,
    idempotent_append,
    marker_read,
    marker_remove,
    marker_write,
)


def _uri(p) -> str:
    return "file://" + str(p)


def test_dispatch_is_by_scheme(spark, tmp_path):
    assert isinstance(_fs(str(tmp_path)), _PosixFS)
    assert isinstance(_fs(_uri(tmp_path)), _HadoopFS)
    # hdfs:// would dispatch to _HadoopFS too, but instantiating it needs a
    # reachable namenode — assert on the scheme regex instead
    from docling_rag_spark.sources.sinks import _SCHEME_RE

    assert _SCHEME_RE.match("hdfs://nn/warehouse/t")
    assert _SCHEME_RE.match("s3a://bucket/key")
    assert not _SCHEME_RE.match("/abs/local/path")


def test_idempotent_append_over_file_uri(spark, tmp_path):
    path = _uri(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    idempotent_append(spark, df, path)
    idempotent_append(spark, df, path)  # replay: same batch twice
    df2 = spark.createDataFrame([(2, "b"), (3, "c")], "id int, v string")
    idempotent_append(spark, df2, path)
    got = sorted((r["id"], r["v"]) for r in spark.read.parquet(path).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # the probe sees the URI table as non-empty (the round-5 gap)
    assert _has_parquet_files(path)
    assert not _has_parquet_files(_uri(tmp_path / "missing"))


def _seed_swap_state(spark, base_uri):
    path = base_uri + "/t"
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "doc_id string, v int"
    ).coalesce(1).write.parquet(path)
    spark.createDataFrame(
        [("a", 1), ("c", 3)], "doc_id string, v int"
    ).coalesce(1).write.parquet(path + ".tmp")
    return path, path + ".tmp"


def _rows(spark, path):
    return sorted(
        (r["doc_id"], r["v"]) for r in spark.read.parquet(path).collect()
    )


def test_swap_crash_windows_over_file_uri(spark, tmp_path):
    """The two crash windows whose recovery depends on FS renames actually
    executing over the URI scheme: (1) crash between the backup rename and
    the tmp adoption — the tmp is the only complete copy and must be
    adopted; (2) '.old' present with an INCOMPLETE tmp — backup restored."""
    fs = _fs(_uri(tmp_path))

    path, tmp = _seed_swap_state(spark, _uri(tmp_path / "w1"))
    fs.rename(path, path + ".old")  # swap step 1 done, crash before step 2
    _recover_swap(path)
    assert _rows(spark, path) == [("a", 1), ("c", 3)]
    assert not fs.exists(path + ".old") and not fs.exists(tmp)

    path, tmp = _seed_swap_state(spark, _uri(tmp_path / "w2"))
    fs.rename(path, path + ".old")
    fs.delete(tmp + "/_SUCCESS")  # tmp incomplete
    _recover_swap(path)
    assert _rows(spark, path) == [("a", 1), ("b", 2), ("c", 3)]
    assert not fs.exists(path + ".old") and not fs.exists(tmp)


def test_delete_docs_over_file_uri(spark, tmp_path):
    path, _ = _seed_swap_state(spark, _uri(tmp_path / "d"))
    delete_docs(spark, path, spark.createDataFrame([("b",)], "doc_id string"))
    assert _rows(spark, path) == [("a", 1), ("c", 3)]


def test_marker_roundtrip_over_file_uri(spark, tmp_path):
    m = _uri(tmp_path / "m" / "_MARK")
    os.makedirs(tmp_path / "m")
    assert marker_read(m) is None
    marker_write(m, "1234")
    assert marker_read(m) == "1234"
    marker_remove(m)
    assert marker_read(m) is None
    marker_remove(m)  # idempotent


def test_hadoop_rename_guards(spark, tmp_path):
    """Hadoop rename onto an existing dir nests src INSIDE it (mv
    semantics) — the adapter must refuse instead; and a False return
    (missing src) must raise, not silently no-op."""
    fs = _fs(_uri(tmp_path))
    os.makedirs(tmp_path / "src")
    os.makedirs(tmp_path / "dst")
    with pytest.raises(OSError, match="target already exists"):
        fs.rename(_uri(tmp_path / "src"), _uri(tmp_path / "dst"))
    with pytest.raises(OSError, match="rename failed"):
        fs.rename(_uri(tmp_path / "nope"), _uri(tmp_path / "dst2"))


def test_select_job_pack_and_resume_over_file_uri(spark, tmp_path, monkeypatch):
    """The deployable job end-to-end with --output file://...: first run
    commits + packs, second (resume, no new docs) must SKIP the repack via
    the marker read through the Hadoop adapter."""
    import jobs.select_job as J
    from docling_rag_spark.datagen import build_spans
    from docling_rag_spark.pipeline import run_extraction
    from docling_rag_spark.schemas import DOCUMENTS_SPANS_SCHEMA

    rows = [
        (
            str(i),
            build_spans(
                str(i),
                f"word{i} stories of the old town and the river {i} "
                f"keep the lights on and the doors open number {i}",
            ),
        )
        for i in range(96, 108)
    ]
    docs = spark.createDataFrame(rows, schema=DOCUMENTS_SPANS_SCHEMA)
    _, chunks, _ = run_extraction(docs, run_id="mk-uri")
    inp = str(tmp_path / "chunks.parquet")
    chunks.write.parquet(inp)

    out = _uri(tmp_path / "out")
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    for args in (
        ["--input", inp, "--output", out, "--run-id", "r1", "--pack"],
        ["--input", inp, "--output", out, "--run-id", "r2", "--pack",
         "--resume"],
    ):
        monkeypatch.setattr(sys, "argv", ["select_job.py"] + args)
        J.main()

    sel = spark.read.parquet(out + "/selected_chunks")
    assert sel.count() > 0
    packed = spark.read.parquet(out + "/packed_sequences")
    assert packed.count() > 0
    # marker written through the swap, readable through the adapter
    assert marker_read(out + "/packed_sequences/_PACKED_N") is not None
    # resume appended nothing and left exactly one lineage row per doc
    lin = spark.read.parquet(out + "/selection_lineage")
    assert lin.count() == lin.select("doc_id").distinct().count()
