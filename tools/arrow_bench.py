"""mapInPandas vs mapInArrow for the narrow extraction kernel (README
deferred item; round-2 verdict #10). Interleaved A/B reps on the bench
corpus with steady-state discipline (untimed warmup, then alternating
timed reps) so host drift hits both variants equally.

Usage: python tools/arrow_bench.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from docling_rag_spark.pipeline import extract_documents_narrow  # noqa: E402
from docling_rag_spark.session import get_spark  # noqa: E402


def _arrow_kernel(batches):
    """mapInArrow twin of pipeline._extract_doc_kernel: identical traversal
    and output, RecordBatch IO instead of pandas."""
    import traceback

    import pyarrow as pa
    from pyspark import TaskContext

    from docling_rag_spark.kernels.extract import extract_span

    schema = pa.schema(
        [("doc_id", pa.string()), ("order", pa.int32()), ("kind", pa.string()),
         ("text", pa.string()), ("media_ref", pa.string()),
         ("page_num", pa.int32()), ("error", pa.string()),
         ("n_spans_in", pa.int64()), ("partition_id", pa.int32())]
    )
    tc = TaskContext.get()
    pid = tc.partitionId() if tc else -1
    for batch in batches:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        out = {name: [] for name in schema.names}

        def emit(doc_id, order, kind, text, ref, page, err, n_in):
            out["doc_id"].append(doc_id)
            out["order"].append(order)
            out["kind"].append(kind)
            out["text"].append(text)
            out["media_ref"].append(ref)
            out["page_num"].append(page)
            out["error"].append(err)
            out["n_spans_in"].append(n_in)
            out["partition_id"].append(pid)

        for doc_id, spans in zip(doc_ids, spans_col):
            span_list = spans or []
            n_in = len(span_list)
            indexed = sorted(
                enumerate(span_list),
                key=lambda p: ((p[1].get("offset") or 0), p[0]),
            )
            blocks, err = [], None
            try:
                for _, s in indexed:
                    for k, t, r, page in extract_span(
                        s.get("kind"), s.get("text"), s.get("media_ref")
                    ):
                        if k == "error":
                            err = t
                            break
                        blocks.append((k, t, r, page))
                    if err:
                        break
            except Exception:
                err = traceback.format_exc(limit=2)
            if err is None:
                for order, (kind, text, ref, page) in enumerate(blocks):
                    emit(doc_id, order, kind, text, ref, page, None, n_in)
                emit(doc_id, len(blocks), "__doc", None, None, None, None, n_in)
            else:
                emit(doc_id, 0, "__doc", None, None, None, err, n_in)
        yield pa.RecordBatch.from_pydict(out, schema=schema)


_DDL = (
    "doc_id string, order int, kind string, text string, media_ref string, "
    "page_num int, error string, n_spans_in long, partition_id int"
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(master="local[32]", app_name="arrow-bench")
    spark.sparkContext.setLogLevel("ERROR")
    from bench import materialize_bench_corpus

    cache_root = str(Path(__file__).resolve().parent.parent / "data")
    corpus = spark.read.parquet(
        materialize_bench_corpus(spark, sf_dir, 16, cache_root)
    )

    def run_pandas():
        return extract_documents_narrow(corpus).filter(
            F.col("kind") != "__doc"
        ).write.format("noop").mode("overwrite").save()

    def run_arrow():
        return corpus.mapInArrow(_arrow_kernel, schema=_DDL).filter(
            F.col("kind") != "__doc"
        ).write.format("noop").mode("overwrite").save()

    # parity check first (cheap slice)
    small = corpus.limit(512)
    a = sorted(
        extract_documents_narrow(small).collect(),
        key=lambda r: (r["doc_id"], r["order"]),
    )
    b = sorted(
        small.mapInArrow(_arrow_kernel, schema=_DDL).collect(),
        key=lambda r: (r["doc_id"], r["order"]),
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "kernel outputs differ"
    print("parity ok on 512 docs")

    run_pandas()
    run_arrow()  # warmup both
    times = {"pandas": [], "arrow": []}
    for _ in range(reps):
        for name, fn in (("pandas", run_pandas), ("arrow", run_arrow)):
            t0 = time.time()
            fn()
            times[name].append(round(time.time() - t0, 3))
    print({k: {"reps": v, "min": min(v)} for k, v in times.items()})
    spark.stop()


if __name__ == "__main__":
    main()
