"""The extraction pipeline: interleaved documents → ordered spans → chunks.

Replaces the reference's single-process orchestration
(reference src/ingestion/pipeline.py:13-54 — load → chunk → metadata →
embed → insert) with one declarative DataFrame DAG:

    read input table
      → [resume anti-join on lineage]                 (E16, postgres.py:253-262)
      → posexplode(spans)                             (narrow)
      → round-robin repartition                       (the ONE shuffle of raw
         bytes; defuses giant-document skew: a doc with 10^4 spans becomes
         10^4 independent rows spread across all tasks — SURVEY.md §7.3)
      → mapInPandas(extract kernel)                   (Arrow-vectorized; the
         only Python; 1 span row → N block rows)
      → window row_number over (doc_id | offset, span_idx, block_seq)
         = the total per-document span order          (SURVEY.md §7.3 #4)
      → chunk assembly: running-token-sum window → segment → groupBy
         (reference HybridChunker analog, src/ingestion/chunker.py:45-55)

Scale notes (100 TB):
- The explode is narrow; the single repartition is unavoidable if input
  files are skewed (one parquet row group can hold one multi-GB document).
  ``repartition(cols=None)`` is round-robin, so no hot keys exist by
  construction.
- The ordering window shuffles only *extracted* blocks (post-boilerplate,
  much smaller than input), partitioned by doc_id; AQE handles residual
  skew.
- Everything after the kernel is pure relational (whole-stage codegen).
"""

from __future__ import annotations

import traceback
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .kernels.extract import extract_span
from .kernels.textutils import LANG_MARKERS
from .schemas import BLOCKS_SCHEMA

if TYPE_CHECKING:
    import pandas as pd

MAX_TOKENS = 512  # reference src/config.py:34


# --------------------------------------------------------------------------
# stage 1: explode spans (narrow)
# --------------------------------------------------------------------------
def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans[]) → one row per span, carrying n_spans_in for lineage."""
    return docs.select(
        "doc_id",
        F.size("spans").alias("n_spans_in"),
        F.posexplode_outer("spans").alias("span_idx", "span"),
    ).select(
        "doc_id",
        "n_spans_in",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.coalesce(F.col("span.offset"), F.lit(0)).alias("offset"),
    )


# --------------------------------------------------------------------------
# stage 2: the extraction kernel (mapInPandas)
# --------------------------------------------------------------------------
def _extract_kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Arrow-batched span extraction. One input span row → N block rows.

    Per-span errors become dead-letter rows (error column set) instead of
    failing the task — the reference's DocumentLoadError taxonomy
    (src/ingestion/document.py:191-203, src/models.py) as data.
    """
    import pandas as pd
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId() if TaskContext.get() else -1
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "offset", "span_idx", "block_seq", "kind", "text",
            "media_ref", "page_num", "error", "n_spans_in", "partition_id")}
        for doc_id, off, sidx, kind, text, ref, n_in in zip(
            pdf["doc_id"], pdf["offset"], pdf["span_idx"], pdf["kind"],
            pdf["text"], pdf["media_ref"], pdf["n_spans_in"]
        ):
            try:
                blocks = extract_span(kind, text, ref)
            except Exception:
                blocks = [("error", traceback.format_exc(limit=2), None, None)]
            emitted = False
            for seq, (k, t, r, page) in enumerate(blocks):
                emitted = True
                err = t if k == "error" else None
                out["doc_id"].append(doc_id)
                out["offset"].append(off)
                out["span_idx"].append(sidx)
                out["block_seq"].append(seq)
                out["kind"].append("error" if err else k)
                out["text"].append(None if err else t)
                out["media_ref"].append(r)
                out["page_num"].append(page)
                out["error"].append(err)
                out["n_spans_in"].append(n_in)
                out["partition_id"].append(pid)
            if not emitted:
                # keep lineage complete: a span that extracts to nothing
                # still counts toward its document
                out["doc_id"].append(doc_id)
                out["offset"].append(off)
                out["span_idx"].append(sidx)
                out["block_seq"].append(-1)
                out["kind"].append("empty")
                out["text"].append(None)
                out["media_ref"].append(None)
                out["page_num"].append(None)
                out["error"].append(None)
                out["n_spans_in"].append(n_in)
                out["partition_id"].append(pid)
        yield pd.DataFrame(out)


_KERNEL_SCHEMA = (
    "doc_id string, offset int, span_idx int, block_seq int, kind string, "
    "text string, media_ref string, page_num int, error string, "
    "n_spans_in int, partition_id int"
)


def extract_blocks(spans: DataFrame, repartition_to: int | None = None) -> DataFrame:
    """Span rows → block rows. Round-robin repartition first (skew defuse)."""
    if repartition_to:
        spans = spans.repartition(repartition_to)
    else:
        spans = spans.repartition(
            spans.sparkSession.sparkContext.defaultParallelism * 2
        )
    return spans.mapInPandas(_extract_kernel, schema=_KERNEL_SCHEMA)


# --------------------------------------------------------------------------
# stage 3: total per-document span order (window)
# --------------------------------------------------------------------------
def order_spans(blocks: DataFrame) -> DataFrame:
    """Blocks → the FIXTURES.md F2 output: 0-based total order per doc.

    Never relies on batch arrival order (SURVEY.md §7.3 #4): the order is
    recomputed from (offset, span_idx, block_seq) after the shuffle.
    """
    order_w = Window.partitionBy("doc_id").orderBy("offset", "span_idx", "block_seq")
    real = blocks.filter(~F.col("kind").isin("error", "empty"))
    return real.select(
        "doc_id",
        (F.row_number().over(order_w) - 1).alias("order"),
        "kind",
        "text",
        "media_ref",
        "page_num",
    )


# --------------------------------------------------------------------------
# stage 4: chunk assembly (windows + groupBy — zero Python)
# --------------------------------------------------------------------------
def token_count_col(text: Column) -> Column:
    """Whitespace token count, identical to kernels.textutils.token_count
    and to the DuckDB oracle expression."""
    t = F.trim(F.regexp_replace(text, r"\s+", " "))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def detect_language_col(text: Column) -> Column:
    """Marker-word language vote, same spec as kernels.textutils.detect_language
    (first 500 chars, most marker hits, tie → earlier language, default en)."""
    toks = F.split(F.lower(F.trim(F.regexp_replace(F.substring(text, 1, 500), r"\s+", " "))), " ")
    best = F.lit("en")
    best_hits = F.lit(-1)
    for lang, markers in LANG_MARKERS:
        arr = F.array([F.lit(m) for m in sorted(markers)])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        cond = hits > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, hits).otherwise(best_hits)
    return F.when(best_hits > 0, best).otherwise(F.lit("en"))


def chunk_spans(extracted: DataFrame, max_tokens: int = MAX_TOKENS) -> DataFrame:
    """Ordered spans → chunks table (reference HybridChunker semantics,
    re-expressed as window ops — SURVEY.md §2.2 E11-E13).

    Frozen spec:
    - chunkable spans: kind ∈ {text, table} with non-empty text
    - tokens(span) = whitespace token count
    - segment = floor(exclusive-prefix-sum(tokens) / max_tokens)  — greedy
      512-token budget via running sum (oversized spans are NOT split; they
      occupy their own segment range)
    - chunk text = ' '-join of span texts in order
    - chunk_index = 0-based rank of segment within doc
    - id = md5('{doc_id}_{chunk_index}_{text}')  (exact reference recipe,
      src/ingestion/chunker.py:49)
    - page_num = the FIRST span's page (null if that span has no page
      provenance — exact reference semantics, src/ingestion/chunker.py:35-42:
      doc_items[0].prov[0].page_no or None)
    """
    w = Window.partitionBy("doc_id").orderBy("order")
    chunkable = (
        extracted.filter(
            F.col("kind").isin("text", "table")
            & F.col("text").isNotNull()
            & (F.length("text") > 0)
        )
        .withColumn("n_tok", token_count_col(F.col("text")))
        .withColumn(
            "segment",
            F.floor(
                (F.coalesce(
                    F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                ))
                / F.lit(max_tokens)
            ),
        )
    )
    grouped = chunkable.groupBy("doc_id", "segment").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("order"), F.col("text")))
                ),
                lambda s: s["text"],
            ),
            " ",
        ).alias("text"),
        F.min(F.struct(F.col("order"), F.col("page_num")))["page_num"].alias("first_page"),
        F.sum("n_tok").cast("int").alias("n_tokens"),
    )
    wseg = Window.partitionBy("doc_id").orderBy("segment")
    return grouped.select(
        "doc_id",
        (F.row_number().over(wseg) - 1).alias("chunk_index"),
        "text",
        F.col("first_page").alias("page_num"),
        "n_tokens",
    ).withColumn(
        "id", F.md5(F.concat_ws("_", F.col("doc_id"), F.col("chunk_index"), F.col("text")))
    )


# --------------------------------------------------------------------------
# per-document metadata (reference extract_metadata, document.py:206-221)
# --------------------------------------------------------------------------
def doc_metadata(docs: DataFrame, extracted: DataFrame, chunks: DataFrame) -> DataFrame:
    """doc_type from input span kinds (pdf > html > txt precedence — the
    analog of file-extension doc_type, document.py:210); language from the
    first 500 chars of the first chunk (document.py:212-218)."""
    kinds = docs.select(
        "doc_id",
        F.when(F.exists("spans", lambda s: s["kind"] == "pdf"), "pdf")
        .when(F.exists("spans", lambda s: s["kind"] == "html"), "html")
        .otherwise("txt")
        .alias("doc_type"),
    )
    lang = (
        chunks.filter(F.col("chunk_index") == 0)
        .select("doc_id", detect_language_col(F.col("text")).alias("language"))
    )
    counts = chunks.groupBy("doc_id").agg(
        F.count("*").alias("num_chunks"), F.sum("n_tokens").alias("num_tokens")
    )
    pages = extracted.groupBy("doc_id").agg(F.max("page_num").alias("num_pages"))
    return (
        kinds.join(lang, "doc_id", "left")
        .join(counts, "doc_id", "left")
        .join(pages, "doc_id", "left")
        .withColumn("language", F.coalesce("language", F.lit("en")))
        .withColumn("num_chunks", F.coalesce("num_chunks", F.lit(0)))
    )


# --------------------------------------------------------------------------
# lineage + resume (north_rule; reference skip-if-ingested, E16/E17)
# --------------------------------------------------------------------------
def lineage_from_blocks(blocks: DataFrame, run_id: str) -> DataFrame:
    """Per-document checkpoint/metrics rows (FIXTURES.md F4)."""
    return blocks.groupBy("doc_id").agg(
        F.lit(run_id).alias("run_id"),
        F.min("partition_id").alias("partition_id"),
        F.when(F.count(F.col("error")) > 0, "failed")
        .otherwise("processed")
        .alias("status"),
        F.first("error", ignorenulls=True).alias("error"),
        F.first("n_spans_in").cast("long").alias("n_spans_in"),
        F.sum((~F.col("kind").isin("error", "empty")).cast("long")).alias("n_blocks_out"),
    ).select("run_id", "partition_id", "doc_id", "status", "error",
             "n_spans_in", "n_blocks_out")


def resume_filter(docs: DataFrame, lineage: DataFrame | None) -> DataFrame:
    """Skip already-processed documents: left anti join on the checkpoint
    (the reference's document_exists skip, src/storage/postgres.py:253-262,
    cli/cli.py:166-168 — the resumability primitive of the north rule)."""
    if lineage is None:
        return docs
    done = lineage.filter(F.col("status") == "processed").select("doc_id").distinct()
    return docs.join(done, "doc_id", "left_anti")


# --------------------------------------------------------------------------
# end-to-end
# --------------------------------------------------------------------------
def run_extraction(
    docs: DataFrame,
    run_id: str = "run0",
    prior_lineage: DataFrame | None = None,
    repartition_to: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full pipeline → (extracted_spans, chunks, lineage)."""
    todo = resume_filter(docs, prior_lineage)
    blocks = extract_blocks(explode_spans(todo), repartition_to=repartition_to)
    failed = blocks.filter(F.col("error").isNotNull()).select("doc_id").distinct()
    ok_blocks = blocks.join(failed, "doc_id", "left_anti")
    extracted = order_spans(ok_blocks)
    chunks = chunk_spans(extracted)
    lineage = lineage_from_blocks(blocks, run_id)
    return extracted, chunks, lineage
