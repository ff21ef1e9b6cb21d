"""Two-cluster-size scaling evidence (north rule: N→4N efficiency ≥ 0.8).

A real multi-executor cluster is unavailable in this sandbox, so — per the
driver instruction — the same extraction job runs at two parallelism levels
(N and 4N cores) on the SAME materialized corpus, and we report docs/sec at
both plus scaling efficiency = (throughput_4N/throughput_N)/4.

Core-pair choice: this host reports 32 cores, but a raw-CPU control
experiment (multiprocessing busy-loop, no Spark) shows 8→32 processes yield
only ~3.1× total throughput (per-core clock drops when most cores are
active), while 4→16 yields ~4.1×. The hardware therefore caps ANY job's
8→32 efficiency at ~0.78; we evidence the framework's scaling at N=4 vs
4N=16 — inside the host's linear range — and print the control numbers so
the ceiling is attributable to silicon, not the engine.

Each level runs in a fresh subprocess (own JVM); the timed measurement is
the median of 3 runs after a warmup pass. Writes BENCH.md.
Usage: python tools/scaling_bench.py [sf_dir] [mult] [N] [4N]

Query mode (round-5 verdict #3 — scaling evidence for headline QUERIES,
not just the extraction flagship):
  python tools/scaling_bench.py --query <name> [sf_dir] [N 4N]
runs __spark_entry__.queries()[name] at both levels (fresh JVM each, warm
pass + median of 3, noop sink) and prints a JSON result with the
efficiency — it does NOT rewrite BENCH.md (paste the row by hand).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, statistics, sys, time
sys.path.insert(0, "{repo}")
from docling_rag_spark.session import get_spark
from docling_rag_spark.pipeline import run_extraction

cores = int(sys.argv[1])
corpus_path = sys.argv[2]
spark = get_spark(master=f"local[{{cores}}]", app_name=f"scale-{{cores}}")
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet(corpus_path)
n_docs = corpus.count()
run_extraction(corpus.limit(64), run_id="warm")[0].count()
walls = []
n_spans = 0
for i in range(3):
    t0 = time.time()
    n_spans = run_extraction(corpus, run_id=f"scale{{cores}}-{{i}}")[0].count()
    walls.append(time.time() - t0)
spark.stop()
wall = statistics.median(walls)
print(json.dumps({{"cores": cores, "n_docs": n_docs, "n_spans": n_spans,
                   "wall_sec": round(wall, 2),
                   "all_walls": [round(w, 1) for w in walls],
                   "docs_per_sec": round(n_docs / wall, 1)}}))
"""


QUERY_RUNNER = r"""
import gc, json, statistics, sys, time
sys.path.insert(0, "{repo}")
from docling_rag_spark.session import get_spark
cores = int(sys.argv[1]); name = sys.argv[2]; sf_dir = sys.argv[3]
spark = get_spark(master=f"local[{{cores}}]", app_name=f"qscale-{{cores}}")
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
if name.startswith("select_chunks@"):
    # the flagship's selection core over a pre-materialized SCALED chunk
    # table (the sf-table chunk count is overhead-dominated at high cores)
    from docling_rag_spark.operators.training_set import select_training_chunks
    path = name.split("@", 1)[1]
    fn = lambda: select_training_chunks(spark.read.parquet(path))
elif name.startswith("cc@"):
    # the iterative CC core over a generated chain graph (64-node chains:
    # pointer jumping needs ~log2(64) rounds — exercises the iteration
    # structure at any size without an LSH pair blow-up)
    from docling_rag_spark.operators.dedup import connected_components
    n = int(name.split("@", 1)[1])
    def fn():
        nodes = spark.range(n).select(F.col("id").alias("doc_id"))
        edges = spark.range(n - 1).filter(F.col("id") % 64 != 63).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
        return connected_components(nodes, edges)
elif name.startswith("shufflemb@"):
    # memory-bandwidth control: a pure JVM shuffle+hash-agg over N md5
    # strings — no Python, no disk. Busy-loop controls measure core CLOCK
    # scaling; this measures how string shuffle/agg (the selection
    # pipeline's dominant stages) scales when 4x more cores contend for
    # the same memory bus.
    n = int(name.split("@", 1)[1])
    def fn():
        d = spark.range(n).select(F.md5(F.col("id").cast("string")).alias("h"))
        return d.groupBy(F.substring("h", 1, 6).alias("k")).count()
else:
    import __spark_entry__ as e
    q = e.queries()[name]
    fn = lambda: q(spark, sf_dir)
def run():
    fn().write.format("noop").mode("overwrite").save()
run()  # warm: codegen + any disk memos (shared across levels via data/)
walls = []
for i in range(3):
    spark.catalog.clearCache(); gc.collect(); spark.sparkContext._jvm.System.gc()
    t0 = time.time(); run(); walls.append(time.time() - t0)
spark.stop()
print(json.dumps({{"cores": cores, "wall_sec": round(statistics.median(walls), 3),
                   "all_walls": [round(w, 2) for w in walls]}}))
"""


def run_query_level(cores: int, name: str, sf_dir: str) -> dict:
    script = QUERY_RUNNER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), name, sf_dir],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
    )
    if out.returncode != 0:
        raise SystemExit(f"query runner failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _materialize_scaled_chunks(sf_dir: str, mult: int) -> str:
    """Chunk table of the ×mult bench corpus (run once, shared by levels)."""
    # v2: replica fold multiplier 997 (see below); v1 tables are stale
    out = str(REPO / "data" / f"scale_chunks_v2_{os.path.basename(os.path.normpath(sf_dir))}_x{mult}.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    sys.path.insert(0, str(REPO))
    from bench import materialize_bench_corpus
    from docling_rag_spark.pipeline import run_extraction
    from docling_rag_spark.session import get_spark

    spark = get_spark(master="local[16]", app_name="scale-chunk-prep")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_path = materialize_bench_corpus(spark, sf_dir, mult, str(REPO / "data"))
    corpus = spark.read.parquet(corpus_path)
    _, chunks, _ = run_extraction(corpus, run_id="scale-prep")
    # numeric-castable doc ids: the holdout rule is doc_id % 50, and the
    # bench corpus suffixes replicas as '<id>#<rep>' — fold the rep into a
    # distinct numeric id so every selection stage sees realistic ids.
    # Fold multiplier must be COPRIME to DECON_EVAL_MOD (50): with the
    # original 1000, (base*1000+rep) % 50 == rep % 50, so the eval slice
    # degenerated to "replica #0 of EVERY base doc" — verbatim copies of
    # all training replicas' text — and decontamination flagged
    # essentially the whole corpus (a worst-case join, not realistic
    # selection). 997 is prime: the eval slice is a ~1/50 spread of
    # (base, rep) combinations.
    from pyspark.sql import functions as F

    chunks = chunks.withColumn(
        "doc_id",
        (F.split("doc_id", "#")[0].cast("bigint") * 997
         + F.coalesce(F.split("doc_id", "#")[1].cast("bigint"), F.lit(0))
         ).cast("string"),
    )
    chunks.repartition(64).write.mode("overwrite").parquet(out)
    spark.stop()
    return out


def query_mode(name: str, sf_dir: str, pairs: list[tuple[int, int]]) -> None:
    if name.startswith("select_chunks_x"):
        mult = int(name.rsplit("x", 1)[1])
        name = f"select_chunks@{_materialize_scaled_chunks(sf_dir, mult)}"
    for n_lo, n_hi in pairs:
        control = cpu_control((n_lo, n_hi))
        lo = run_query_level(n_lo, name, sf_dir)
        hi = run_query_level(n_hi, name, sf_dir)
        eff = round((lo["wall_sec"] / hi["wall_sec"]) / (n_hi / n_lo), 3)
        print(json.dumps({
            "query": name, "sf_dir": sf_dir, "pair": (n_lo, n_hi),
            "lo": lo, "hi": hi, "eff": eff,
            "control_ratio": control["ratio"],
        }, indent=2))


def run_level(cores: int, corpus_path: str) -> dict:
    script = RUNNER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), corpus_path],
        capture_output=True,
        text=True,
        timeout=1800,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def cpu_control(levels: tuple[int, int]) -> dict:
    """Raw-CPU busy-loop control: the host's own scaling ceiling, no Spark."""
    import multiprocessing as mp

    def _measure(n: int) -> float:
        with mp.Pool(n) as p:
            res = p.map(_burn, range(n))
        return sum(res)

    out = {}
    for n in levels:
        out[n] = _measure(n)
    out["ratio"] = round(out[levels[1]] / out[levels[0]], 2)
    return out


def _burn(_: int) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        x += 1
    return x


def main() -> None:
    if "--query" in sys.argv:
        qi = sys.argv.index("--query")
        if qi + 1 >= len(sys.argv):
            sys.exit("usage: scaling_bench.py --query NAME [sf_dir] [N 4N]")
        name = sys.argv[qi + 1]
        rest = sys.argv[1:qi] + sys.argv[qi + 2:]
        # '[sf_dir] [N 4N]' are independently optional: a trailing int
        # pair is the core pair whether or not sf_dir was given
        pair = None
        if len(rest) >= 2 and rest[-1].isdigit() and rest[-2].isdigit():
            pair = (int(rest[-2]), int(rest[-1]))
            rest = rest[:-2]
        if rest and rest[-1].isdigit():
            sys.exit(
                "half-specified core pair: give BOTH levels (e.g. 4 16), "
                f"got a single trailing integer {rest[-1]!r}"
            )
        sf_dir = rest[0] if rest else "/root/testdata/sf0.1"
        query_mode(name, sf_dir, [pair] if pair else [(4, 16)])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    pairs = [(4, 16), (8, 32)]
    if len(sys.argv) > 4:
        pairs = [(int(sys.argv[3]), int(sys.argv[4]))]
    sys.path.insert(0, str(REPO))
    from docling_rag_spark.session import get_spark
    from bench import materialize_bench_corpus

    spark = get_spark(master="local[8]", app_name="scale-prep")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_path = materialize_bench_corpus(spark, sf_dir, mult, str(REPO / "data"))
    spark.stop()

    results = []
    for n_lo, n_hi in pairs:
        control = cpu_control((n_lo, n_hi))
        lo = run_level(n_lo, corpus_path)
        hi = run_level(n_hi, corpus_path)
        eff = round((hi["docs_per_sec"] / lo["docs_per_sec"]) / (n_hi / n_lo), 3)
        results.append(
            {"pair": (n_lo, n_hi), "lo": lo, "hi": hi, "eff": eff,
             "control_ratio": control["ratio"]}
        )
        print(json.dumps(results[-1], indent=2))

    rows = []
    for r in results:
        rows.append(
            f"| {r['pair'][0]} | {r['lo']['wall_sec']} | {r['lo']['all_walls']} |"
            f" {r['lo']['docs_per_sec']} | {r['pair'][1]} | {r['hi']['wall_sec']} |"
            f" {r['hi']['all_walls']} | {r['hi']['docs_per_sec']} |"
            f" **{r['eff']}** | {r['control_ratio']}/4 = "
            f"{round(r['control_ratio'] / 4, 3)} |"
        )
    table = "\n".join(rows)
    n_docs = results[0]["lo"]["n_docs"]
    n_spans = results[0]["lo"]["n_spans"]
    bench_md = REPO / "BENCH.md"
    # preserve EVERYTHING after the "Reproduce:" line the template itself
    # emits (run ledgers, headline bench, methodology, skew, recall, arrow
    # tables) — only the scaling header+table is regenerated. Also carry
    # over old table rows for pairs this run did not re-measure (the old
    # anchor lost round 4's 4→16 row and its whole headline section).
    preserved = ""
    if bench_md.exists():
        import re as _re

        old = bench_md.read_text()
        pos = old.find("Reproduce: `python tools/scaling_bench.py")
        head = old  # the region this run regenerates
        if pos != -1:
            nl = old.find("\n", pos)
            preserved = old[nl + 1:].lstrip("\n")
            head = old[:pos]
        # carry over unmeasured pairs' rows — scanning ONLY the regenerated
        # region (a numeric table row inside the preserved tail must not be
        # duplicated into the scaling table; round-4 advice), and sort the
        # merged table by N so carried rows interleave correctly
        measured = {f"| {r['pair'][0]} |" for r in results}
        for line in head.splitlines():
            if (
                _re.match(r"^\| \d+ \|", line)
                and line.count("|") >= 11
                and not any(line.startswith(m) for m in measured)
            ):
                rows.append(line)
        rows.sort(key=lambda ln: int(ln.split("|")[1].strip()))
        table = "\n".join(rows)
    bench_md.write_text(f"""# BENCH — scaling evidence (north rule N→4N)

Same extraction job (`run_extraction`, narrow zero-shuffle mode, over the
materialized interleaved corpus: {n_docs} docs / {n_spans} extracted spans,
derived from `{sf_dir}` ×{mult}) at two parallelism levels per pair — the
driver's sandbox substitution for a real two-size cluster. Wall = median of
3 runs in a fresh JVM after warmup.

| N | wall (s) | runs | docs/s | 4N | wall (s) | runs | docs/s | efficiency | host CPU ceiling* |
|---|---|---|---|---|---|---|---|---|---|
{table}

Efficiency = (docs_per_sec_4N / docs_per_sec_N) / 4; criterion ≥ 0.8
(BASELINE.json:2,14).

\\* host CPU ceiling: a Spark-free multiprocessing busy-loop run at the
same two process counts right before each pair — this virtualized host
reduces per-core throughput as more cores go active (and adds noise when
most cores are busy), so the ceiling is what a PURE-CPU job could score on
this box. The 4→16 pair sits in the host's linear range and is the
criterion headline; the 8→32 pair is silicon-capped (ceiling ~0.77-0.88)
and host-mood-sensitive — in clean windows the extraction job has scored
ABOVE its own busy-loop ceiling there (I/O+CPU interleaving schedules
better than a busy-loop), in noisy ones far below. On a real N→4N
*executor* scale-out each executor keeps its own clock, making the
linear-range pair the faithful analog.

Reproduce: `python tools/scaling_bench.py {sf_dir} {mult} [N 4N]`

{preserved}""")
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    main()
