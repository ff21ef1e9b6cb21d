"""Round-7 optimization harness (NOT the driver bench — bench.py is frozen).

Times individual headline queries with the noop sink (guide §1.4), N warm
reps each, optional interleaving of several variants in ONE session, and
session-config overrides — so an optimization decision is made from an
interleaved min-of-N comparison instead of a single host window.

Usage:
  python tools/bench_extra.py [--reps N] [--conf k=v ...] [--sf DIR] q1 q2 ...
  python tools/bench_extra.py --extract [--mult 16] [--conf k=v ...]

Prints one JSON line: {"queries": {name: [rep..]}, "conf": {...}}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    raw = sys.argv[1:]
    reps = 3
    conf: dict[str, str] = {}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = 16
    do_extract = False
    names: list[str] = []
    i = 0
    while i < len(raw):
        a = raw[i]
        if a == "--reps":
            reps = int(raw[i + 1]); i += 2
        elif a == "--conf":
            k, v = raw[i + 1].split("=", 1); conf[k] = v; i += 2
        elif a == "--sf":
            sf_dir = raw[i + 1]; i += 2
        elif a == "--mult":
            mult = int(raw[i + 1]); i += 2
        elif a == "--extract":
            do_extract = True; i += 1
        else:
            names.append(a); i += 1

    from docling_rag_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        master=f"local[{cpus}]", app_name="bench-extra", extra_conf=conf
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, list[float]] = {}

    if do_extract:
        from pyspark.sql import functions as F

        from bench import materialize_bench_corpus
        from docling_rag_spark.pipeline import run_extraction

        cache_root = str(Path(__file__).resolve().parent.parent / "data")
        corpus_path = materialize_bench_corpus(spark, sf_dir, mult, cache_root)
        corpus = spark.read.parquet(corpus_path)
        run_extraction(corpus.limit(64), run_id="warm")[0].count()
        runs = []
        for r in range(reps):
            spark.catalog.clearCache()
            gc.collect(); spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            extracted, chunks, lineage = run_extraction(corpus, run_id=f"x{r}")
            extracted.count()
            runs.append(round(time.time() - t0, 3))
        out["extract_pipeline"] = runs
        spark.catalog.clearCache()

    if names:
        import __spark_entry__ as entrymod

        qs = {**entrymod.queries(), **entrymod.extended_queries()}
        # cold pass (compile) once per query, untimed
        for name in names:
            spark.sparkContext.setJobDescription(f"cold:{name}")
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        # interleaved warm reps: q1 q2 ... q1 q2 ... sheds window drift
        for name in names:
            out[name] = []
        for _ in range(reps):
            for name in names:
                spark.catalog.clearCache()
                gc.collect(); spark.sparkContext._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"warm:{name}")
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[name].append(round(time.time() - t0, 3))
    spark.stop()
    print(json.dumps({"queries": out, "conf": conf, "reps": reps}))


if __name__ == "__main__":
    main()
