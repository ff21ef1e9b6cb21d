"""Text analysis operators over the `documents` table.

Training-pipeline first-class ops: language-ID (marker n-gram heuristic —
the deterministic replacement for the reference's langdetect,
src/utils.py:55-61), quality scoring (length/punct/stopword ratios), token
counting, document fingerprinting (rolling hash). All but the fingerprint
are pure Catalyst expressions with exact DuckDB mirrors.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import duckdb_sql as dsql
from ..functions.text import (
    detect_language_col,
    punct_ratio_col,
    stopword_ratio_col,
    tidy_col,
    token_count_col,
)
from .common import table

if TYPE_CHECKING:
    import pandas as pd


def tidy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 `tidy` as a projection (reference src/ingestion/document.py:113-114)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tidy_col(F.col("text")).alias("clean_text"),
        token_count_col(F.col("text")).alias("n_tokens"),
    )


TIDY_SQL = f"""
select doc_id, {dsql.tidy_sql('text')} as clean_text,
       {dsql.token_count_sql('text')} as n_tokens
from documents
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(tidy_col(F.col("text"))).alias("n_chars"),
        token_count_col(F.col("text")).alias("n_tokens"),
        F.round(punct_ratio_col(F.col("text")), 6).alias("punct_ratio"),
        F.round(stopword_ratio_col(F.col("text")), 6).alias("stopword_ratio"),
    )


QUALITY_SQL = f"""
select doc_id,
       length({dsql.tidy_sql('text')}) as n_chars,
       {dsql.token_count_sql('text')} as n_tokens,
       round({dsql.punct_ratio_sql('text')}, 6) as punct_ratio,
       round({dsql.stopword_ratio_sql('text')}, 6) as stopword_ratio
from documents
"""


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", detect_language_col(F.col("text")).alias("pred_lang")
    )


LANGID_SQL = f"""
select doc_id, {dsql.detect_language_sql('text')} as pred_lang
from documents
"""


# --------------------------------------------------------------------------
# rolling-hash fingerprint — modular arithmetic is not portably expressible
# in SQL, so this runs as an Arrow-batched kernel (rows-only driver check;
# exact parity vs kernels.textutils.rolling_fingerprint tested in pytest)
# --------------------------------------------------------------------------
def _fingerprint_kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    from ..kernels.textutils import rolling_fingerprint

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fingerprint": [rolling_fingerprint(t or "") for t in pdf["text"]],
            }
        )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", "text").mapInPandas(
        _fingerprint_kernel, schema="doc_id long, fingerprint long"
    )


# DuckDB mirror of kernels.textutils.rolling_fingerprint: HUGEINT (int128)
# carries the mod-2^61 polynomial arithmetic the kernel does in Python ints
# (direct per-window formula — algebraically identical to the rolling
# subtraction, property-verified). Powers of the base mod 2^61 are literals.
def _fingerprint_sql() -> str:
    from ..kernels.textutils import rolling_fingerprint  # noqa: F401  (spec)
    from .common import hexn_to_bigint_sql

    mod = 1 << 61
    base = 1_000_003
    w = 8
    pows = "[" + ", ".join(str(pow(base, k, mod)) for k in range(w)) + "]"
    return f"""
with toks as (
  select doc_id, {dsql.tokens_sql('text', lower=True)} as w from documents
),
vals as (
  select doc_id, len(w) as n,
         list_transform(w, t -> {hexn_to_bigint_sql('md5(t)', 8)}::hugeint) as v
  from toks
)
select doc_id,
  (case when n = 0 then 0 else
    list_min(list_transform(range(0, n - least({w}, n) + 1), i ->
      (list_sum(list_transform(range(0, least({w}, n)), j ->
          v[i + j + 1] * ({pows}::hugeint[])[least({w}, n) - j])) % {mod})
    )) end)::bigint as fingerprint
from vals
"""


FINGERPRINT_SQL = _fingerprint_sql()

QUERIES = {
    "text_tidy": tidy_docs,
    "text_quality": quality_scores,
    "text_langid": language_id,
    "text_fingerprint": fingerprints,
}
ORACLES = {
    "text_tidy": TIDY_SQL,
    "text_quality": QUALITY_SQL,
    "text_langid": LANGID_SQL,
    "text_fingerprint": FINGERPRINT_SQL,
}


# --------------------------------------------------------------------------
# BPE-ish subword token count: word pieces + standalone punctuation
# (prompt-mandated "token counting (whitespace + a BPE-ish regex)")
# --------------------------------------------------------------------------
def token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both counts per doc: whitespace tokens and regex subword tokens
    (\\w{1,4} chunks + single non-space punctuation — a deterministic
    BPE-budget proxy: every 4 word chars start a new piece, like a
    fixed-fanout merge table)."""
    docs = table(spark, sf_dir, "documents")
    t = tidy_col(F.col("text"))
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(r"\w{1,4}|[^\w\s]"), 0)).alias(
            "n_bpe_tokens"
        ),
    )


TOKEN_BPE_SQL = f"""
select doc_id,
       {dsql.token_count_sql('text')} as n_ws_tokens,
       len(regexp_extract_all({dsql.tidy_sql('text')}, '\\w{{1,4}}|[^\\w\\s]'))
         as n_bpe_tokens
from documents
"""

# --------------------------------------------------------------------------
# winnowing fingerprint SET (multi-fingerprint upgrade of the single rolling
# hash): distinct minima of each guarantee-window over the rolling window
# hashes — the standard plagiarism/dedup fingerprinting scheme. Output is a
# driver-sortable summary (count + md5 of the sorted set); the oracle
# replays the full scheme in HUGEINT SQL.
# --------------------------------------------------------------------------
WINNOW_WINDOW = 8
WINNOW_GUARANTEE = 4


def _winnowing_kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import hashlib

    import pandas as pd

    from ..kernels.textutils import winnowing_fingerprints

    for pdf in batches:
        ns, md5s = [], []
        for t in pdf["text"]:
            sel = winnowing_fingerprints(t or "", WINNOW_WINDOW, WINNOW_GUARANTEE)
            ns.append(len(sel))
            md5s.append(hashlib.md5(",".join(map(str, sel)).encode()).hexdigest())
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "n_fp": ns, "fp_md5": md5s})


def winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", "text").mapInPandas(
        _winnowing_kernel, schema="doc_id long, n_fp int, fp_md5 string"
    )


def _winnowing_sql() -> str:
    from .common import hexn_to_bigint_sql

    mod = 1 << 61
    base = 1_000_003
    w, g = WINNOW_WINDOW, WINNOW_GUARANTEE
    pows = "[" + ", ".join(str(pow(base, k, mod)) for k in range(w)) + "]"
    return f"""
with toks as (
  select doc_id, {dsql.tokens_sql('text', lower=True)} as w from documents
),
vals as (
  select doc_id, len(w) as n,
         list_transform(w, t -> {hexn_to_bigint_sql('md5(t)', 8)}::hugeint) as v
  from toks
),
hs as (
  select doc_id,
         list_transform(range(0, n - least({w}, n) + 1), i ->
           (list_sum(list_transform(range(0, least({w}, n)), j ->
               v[i + j + 1] * ({pows}::hugeint[])[least({w}, n) - j])) % {mod}))
           as H
  from vals where n > 0
),
sel as (
  select doc_id,
         list_sort(list_distinct(
           list_transform(range(0, len(H) - least({g}, len(H)) + 1), i ->
             list_min(H[i + 1 : i + least({g}, len(H))])))) as s
  from hs
)
select t.doc_id,
       coalesce(len(s.s), 0)::int as n_fp,
       md5(coalesce(array_to_string(s.s, ','), '')) as fp_md5
from toks t left join sel s on t.doc_id = s.doc_id
"""


WINNOWING_SQL = _winnowing_sql()

QUERIES["text_winnowing"] = winnowing
ORACLES["text_winnowing"] = WINNOWING_SQL

QUERIES["text_token_bpe"] = token_counts_bpe
ORACLES["text_token_bpe"] = TOKEN_BPE_SQL


# --------------------------------------------------------------------------
# Gopher/C4-style training-data quality filters (Rae et al. 2021 §A1.1;
# Raffel et al. 2020): word-count bounds, mean-word-length bounds, a
# ≥2-distinct-common-words rule, and the repetition signals — the char
# fraction of the single most frequent word 2-gram and 3-gram. All pure
# relational: one token explode feeding (a) per-doc token stats and (b)
# n-gram count groupBys; the per-doc argmax n-gram is a row_number window
# with a deterministic (count desc, gram asc) tie-break. At corpus scale:
# two doc_id-keyed shuffles, no UDFs, no driver loops.
# --------------------------------------------------------------------------
GOPHER_WORDS_MIN = 20
GOPHER_WORDS_MAX = 100_000
GOPHER_MWL_MIN = 3.0
GOPHER_MWL_MAX = 10.0
GOPHER_STOP_HITS_MIN = 2
GOPHER_TOP2_FRAC_MAX = 0.20
GOPHER_TOP3_FRAC_MAX = 0.18


def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 shape (verdict #4): TWO branches — a scalar-stats projection
    and ONE tagged n-gram pipeline for BOTH gram sizes (structs (n, gram)
    for n∈{2,3} out of a single Generate; per-(doc, n) top gram via a
    conditional struct-min argmax folded into one groupBy — round 7,
    replacing the window + pivot) — joined per doc. The old plan ran THREE
    branches (stats, top-2-gram, top-3-gram) = three scans + three
    tokenizations.

    Why not fold the stats under the gram Generate (true single scan)?
    Catalyst hoists non-generator expressions ABOVE the Generate, so the
    per-doc HOF stats (stop-hit filter, mean-len fold — interpreted, no
    CSE) would re-evaluate once per EMITTED GRAM row: measured 12.2s vs
    ~2s at sf0.1. Two scans of the source beat one scan plus a full-data
    token-array shuffle at any scale; the join side is one row per doc."""
    from ..functions.text import tokens_col
    from ..kernels.textutils import LANG_MARKERS

    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.length(tidy_col(F.col("text"))).alias("n_chars"),
        tokens_col(F.col("text"), lower=True).alias("toks"),
    )
    markers = sorted(dict(LANG_MARKERS)["en"])
    marr = F.array(*[F.lit(m) for m in markers])
    stats = base.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.round(
            F.when(F.size("toks") == 0, F.lit(0.0)).otherwise(
                F.aggregate(
                    "toks", F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
                )
                / F.size("toks")
            ),
            6,
        ).alias("mean_word_len"),
        F.size(
            F.array_distinct(F.filter("toks", lambda t: F.array_contains(marr, t)))
        ).alias("stop_hits"),
    )

    def tagged(n: int):
        # single-parameter def, NOT `lambda i, n=n:` — a 2-param pyspark HOF
        # lambda silently binds its 2nd arg to the ELEMENT INDEX
        def mk(i):
            return F.struct(
                F.lit(n).cast("int").alias("n"),
                F.concat_ws(" ", F.slice("toks", i + 1, n)).alias("gram"),
            )

        return F.when(
            F.size("toks") < n, F.array().cast("array<struct<n:int,gram:string>>")
        ).otherwise(F.transform(F.sequence(F.lit(0), F.size("toks") - n), mk))

    rows = base.select(
        "doc_id",
        "n_chars",
        F.explode(F.concat(tagged(2), tagged(3))).alias("g"),
    )
    counts = rows.groupBy(
        "doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
    ).agg(F.count("*").alias("cnt"), F.max("n_chars").alias("n_chars"))
    # per-(doc, n) argmax as a conditional struct-MIN aggregation (round 7),
    # replacing the row_number window + pivot groupBy: min over
    # struct(-cnt, gram) orders by (cnt desc, gram asc) — the identical
    # tie-break — and both gram sizes fold in ONE map-combined
    # groupBy(doc_id), so the plan drops the (doc_id, n) window
    # exchange+sort AND the separate pivot exchange (3 exchanges + 1 sort
    # over the gram rows → 2 exchanges, both map-side combined).
    def _best(n: int):
        return F.min(
            F.when(
                F.col("n") == n,
                F.struct(
                    (-F.col("cnt")).alias("nc"), F.col("gram").alias("gram")
                ),
            )
        ).alias(f"b{n}")

    folded = counts.groupBy("doc_id").agg(
        F.max("n_chars").alias("n_chars"), _best(2), _best(3)
    )

    def _frac_of(b):
        return F.when(b.isNull(), F.lit(None).cast("double")).otherwise(
            F.round(
                F.when(F.col("n_chars") == 0, F.lit(0.0)).otherwise(
                    (-b["nc"]) * F.length(b["gram"]) / F.col("n_chars")
                ),
                6,
            )
        )

    pivot = folded.select(
        "doc_id",
        _frac_of(F.col("b2")).alias("f2"),
        _frac_of(F.col("b3")).alias("f3"),
    )
    out = (
        stats.join(pivot, "doc_id", "left")
        .withColumn("top2_char_frac", F.coalesce("f2", F.lit(0.0)))
        .withColumn("top3_char_frac", F.coalesce("f3", F.lit(0.0)))
        .drop("f2", "f3")
    )
    keep = (
        F.col("n_words").between(GOPHER_WORDS_MIN, GOPHER_WORDS_MAX)
        & F.col("mean_word_len").between(GOPHER_MWL_MIN, GOPHER_MWL_MAX)
        & (F.col("stop_hits") >= GOPHER_STOP_HITS_MIN)
        & (F.col("top2_char_frac") <= GOPHER_TOP2_FRAC_MAX)
        & (F.col("top3_char_frac") <= GOPHER_TOP3_FRAC_MAX)
    )
    return out.withColumn("keep", keep)


def _top_gram_frac_sql(n: int, out: str) -> str:
    toks = dsql.tokens_sql("text", lower=True)
    return f"""
{out}_grams as (
  select doc_id, n_chars, w[i] || ' ' || {" || ' ' || ".join(f"w[i+{j}]" for j in range(1, n)) if n > 1 else ""} as gram
  from (select doc_id, length({dsql.tidy_sql('text')}) as n_chars,
               {toks} as w from documents),
       unnest(range(1, len(w) - {n - 1} + 1)) as t(i)
  where len(w) >= {n}
),
{out}_top as (
  select doc_id,
         round(case when n_chars = 0 then 0.0::double
               else cnt * length(gram) / n_chars::double end, 6) as {out}
  from (
    select doc_id, n_chars, gram, count(*) as cnt,
           row_number() over (partition by doc_id
                              order by count(*) desc, gram asc) as rn
    from {out}_grams group by doc_id, n_chars, gram
  ) where rn = 1
)"""


def _gopher_sql() -> str:
    from ..kernels.textutils import LANG_MARKERS

    markers = sorted(dict(LANG_MARKERS)["en"])
    marr = dsql.sql_list(markers)
    toks = dsql.tokens_sql("text", lower=True)
    return f"""
with stats as (
  select doc_id,
         len(w) as n_words,
         round(case when len(w) = 0 then 0.0::double
               else list_sum(list_transform(w, t -> length(t)))::bigint
                    / len(w)::double end, 6) as mean_word_len,
         len(list_distinct(list_filter(w, t -> list_contains({marr}, t))))
           as stop_hits
  from (select doc_id, {toks} as w from documents)
),
{_top_gram_frac_sql(2, "top2_char_frac").lstrip()},
{_top_gram_frac_sql(3, "top3_char_frac").lstrip()}
select s.doc_id, s.n_words, s.mean_word_len, s.stop_hits,
       coalesce(t2.top2_char_frac, 0.0::double) as top2_char_frac,
       coalesce(t3.top3_char_frac, 0.0::double) as top3_char_frac,
       (s.n_words between {GOPHER_WORDS_MIN} and {GOPHER_WORDS_MAX}
        and s.mean_word_len between {GOPHER_MWL_MIN} and {GOPHER_MWL_MAX}
        and s.stop_hits >= {GOPHER_STOP_HITS_MIN}
        and coalesce(t2.top2_char_frac, 0.0::double) <= {GOPHER_TOP2_FRAC_MAX}
        and coalesce(t3.top3_char_frac, 0.0::double) <= {GOPHER_TOP3_FRAC_MAX})
         as keep
from stats s
left join top2_char_frac_top t2 on t2.doc_id = s.doc_id
left join top3_char_frac_top t3 on t3.doc_id = s.doc_id
"""


QUERIES["text_gopher_filters"] = gopher_quality
ORACLES["text_gopher_filters"] = _gopher_sql()


# --------------------------------------------------------------------------
# PII redaction (training-data scrubbing): replace emails/phone numbers
# with typed placeholder tokens and count what was removed. Pure codegen
# (regexp_replace / regexp_count — Java regex); the DuckDB mirror uses the
# same patterns under RE2 — both engines are leftmost-first with greedy
# quantifiers, and the patterns avoid constructs where the engines differ (no
# backrefs, no lookaround). The driver corpus contains no PII, so the
# oracle run degenerates to identity+zero-counts; the REAL behavioral gate
# is tests/test_operators.py::test_pii_redaction_cross_engine, which
# plants PII and compares Spark vs DuckDB row-for-row.
# --------------------------------------------------------------------------
PII_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RX = r"\+?[0-9][0-9 ()-]{6,}[0-9]"


def redact_pii_cols(text_col):
    """(redacted, n_emails, n_phones) column triple — emails replaced
    first so phone matching never sees their digit runs."""
    n_emails = F.regexp_count(text_col, F.lit(PII_EMAIL_RX))
    no_email = F.regexp_replace(text_col, PII_EMAIL_RX, "<EMAIL>")
    n_phones = F.regexp_count(no_email, F.lit(PII_PHONE_RX))
    redacted = F.regexp_replace(no_email, PII_PHONE_RX, "<PHONE>")
    return redacted, n_emails, n_phones


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    redacted, n_emails, n_phones = redact_pii_cols(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(redacted).alias("redacted_md5"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
    )


REDACT_PII_SQL = f"""
select doc_id,
       md5(regexp_replace(regexp_replace(text, '{PII_EMAIL_RX}', '<EMAIL>', 'g'),
                          '{PII_PHONE_RX}', '<PHONE>', 'g'))
         as redacted_md5,
       len(regexp_extract_all(text, '{PII_EMAIL_RX}'))
         as n_emails,
       len(regexp_extract_all(regexp_replace(text, '{PII_EMAIL_RX}', '<EMAIL>', 'g'),
                              '{PII_PHONE_RX}'))
         as n_phones
from documents
"""

QUERIES["text_redact_pii"] = redact_pii
ORACLES["text_redact_pii"] = REDACT_PII_SQL


# --------------------------------------------------------------------------
# Word-blocklist filter (round 6): the C4-style "bad words" gate — count
# blocklisted tokens per doc and keep only clean docs (C4 drops any page
# with a single hit; the ratio is emitted so stricter/looser policies can
# mix on it). The list here is a deterministic stand-in for the configured
# blocklist a production run mounts (C4 uses a public profanity list);
# ONE tokenization, one interpreted membership filter per row, zero
# Exchange — the same single-pass projection class as quality_classifier.
# The driver corpus's 31-word vocabulary contains no blocklisted token, so
# the oracle run degenerates to all-clean; the behavioral gate is the
# planted cross-engine pytest (the PII pattern).
# --------------------------------------------------------------------------
BLOCKLIST_WORDS = ("casino", "jackpot", "lottery", "viagra", "xxx")


def blocklist_cols(text: Column) -> tuple[Column, Column]:
    """(n_blocked, blocked_ratio) — shared by the standalone filter query
    and the doc_attributes tagger row (the mixer gates on the attribute,
    so a blocklist-policy change re-mixes the narrow table instead of
    re-reading the corpus)."""
    from ..functions.text import tokens_col

    toks = tokens_col(text, lower=True)
    arr = F.array(*[F.lit(w) for w in BLOCKLIST_WORDS])
    n_hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    ratio = F.round(
        n_hits.cast("double") / F.greatest(F.size(toks), F.lit(1)), 6
    )
    return n_hits, ratio


def blocklist_n_sql(c: str) -> str:
    return (
        f"len(list_filter({dsql.tokens_sql(c, lower=True)}, "
        f"x -> list_contains({dsql.sql_list(BLOCKLIST_WORDS)}, x)))"
    )


def blocklist_ratio_sql(c: str) -> str:
    return (
        f"round(({blocklist_n_sql(c)}::double)"
        f" / greatest(len({dsql.tokens_sql(c, lower=True)}), 1), 6)"
    )


def blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_hits, ratio = blocklist_cols(F.col("text"))
    return docs.select(
        "doc_id",
        n_hits.alias("n_blocked"),
        ratio.alias("blocked_ratio"),
        (n_hits == 0).alias("keep"),
    )


BLOCKLIST_FILTER_SQL = f"""
select doc_id,
       {blocklist_n_sql('text')} as n_blocked,
       {blocklist_ratio_sql('text')} as blocked_ratio,
       ({blocklist_n_sql('text')} = 0) as keep
from documents
"""



# --------------------------------------------------------------------------
# TF-IDF keyword extraction (round 5): top-K terms per document by
# tf × ln(N/df) — the classic per-doc keyword/topic signal a corpus
# analysis pipeline wants next to language/quality. Relational shape: one
# (doc_id, term) count shuffle; df via groupBy("term").count() joined back
# on term — NOT a count-over-window partitioned by term: a window
# partition is a single task per key, so a hot term ("the" ≈ every doc)
# would be a straggler growing linearly with the corpus, while the
# groupBy+join-back shape is map-side-combined and AQE-skew-splittable
# (the span_boilerplate shape, extraction_queries.py). Corpus size N is a
# BROADCAST single-row aggregate (the BM25 corpus-stats pattern — never a
# driver action at plan-build time). Ranking orders by the ROUNDED score
# so cross-engine ties (identical tf/df) break identically on the term.
# --------------------------------------------------------------------------
K_KEYWORDS = 5


def doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import tokens_col

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"), lower=True)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_by_term = tf.groupBy("term").agg(F.count("*").alias("df"))
    tfdf = tf.join(df_by_term, "term")
    n_docs = docs.groupBy().agg(F.count("*").alias("n_docs"))
    tfidf = F.round(
        F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
    )
    scored = tfdf.crossJoin(F.broadcast(n_docs)).withColumn("tfidf", tfidf)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_KEYWORDS)
        .select("doc_id", "term", "tf", "tfidf", "rk")
    )


DOC_KEYWORDS_SQL = f"""
with toks as (
  select doc_id, unnest({dsql.tokens_sql('text', lower=True)}) as term
  from documents
),
tf as (select doc_id, term, count(*) as tf from toks group by doc_id, term),
tfdf as (
  select doc_id, term, tf, count(*) over (partition by term) as df from tf
),
n as (select count(*) as n_docs from documents)
select doc_id, term, tf, tfidf, rk from (
  select doc_id, term, tf,
         round(tf * ln(n_docs::double / df), 6) as tfidf,
         row_number() over (
           partition by doc_id
           order by round(tf * ln(n_docs::double / df), 6) desc, term asc
         ) as rk
  from tfdf, n
) where rk <= {K_KEYWORDS}
"""

# doc_keywords promoted into the 50-slot driver contract (round-6
# rotation, swapping with dedup_simhash — see dedup.py registry note)
QUERIES["doc_keywords"] = doc_keywords
ORACLES["doc_keywords"] = DOC_KEYWORDS_SQL


# --------------------------------------------------------------------------
# Linear quality classifier (round 6): the fasttext-style learned quality
# filter every production pipeline runs after the heuristic gates (CCNet /
# GPT-3's quality classifier, Gopher §A1.2). The model here is a FIXED
# linear scorer over the already-portable heuristic features — a
# deterministic stand-in for trained weights (which would arrive as a tiny
# broadcast weights row exactly like these literals); the Spark shape is
# the real thing: a pure per-row codegen projection, no Python, no
# shuffle, scan pruned to (doc_id, text).
# Features are the ROUND-6-stable ratios (so the cross-engine comparison
# never rides a last-ulp difference) plus ln(1+count) scale terms.
# --------------------------------------------------------------------------
QC_BIAS = -1.5
QC_W_LOG_TOKENS = 0.35
QC_W_STOPWORD = 2.0
QC_W_PUNCT = -3.0
QC_W_LOG_CHARS = 0.1


def qc_logit_from_features(
    n_tokens: Column,
    stopword_ratio_r6: Column,
    punct_ratio_r6: Column,
    n_chars: Column,
) -> Column:
    """THE quality-classifier linear combination over ALREADY-DERIVED
    features (ratios pre-rounded to 6 dp) — the ONE place the bias,
    weights, and association order live. qc_logit_col feeds it
    freshly-derived feature expressions; attributes.base_attributes_frame
    feeds it the staged feature columns — identical expression trees
    either way, so the doubles cannot drift (mirrored term-for-term by
    qc_logit_sql; the two engines must reproduce the doubles
    bit-for-bit)."""
    return (
        F.lit(QC_BIAS)
        + F.lit(QC_W_LOG_TOKENS) * F.log(F.lit(1.0) + n_tokens)
        + F.lit(QC_W_STOPWORD) * stopword_ratio_r6
        + F.lit(QC_W_PUNCT) * punct_ratio_r6
        + F.lit(QC_W_LOG_CHARS) * F.log(F.lit(1.0) + n_chars)
    )


def qc_logit_col(text: Column) -> Column:
    """THE quality-classifier logit over a text column — the single
    definition shared by quality_classifier, corpus_datacard, and
    token_budget_select, so the filter, the card that audits it, and the
    budget ranking can never drift apart. Rounded features, then
    qc_logit_from_features' linear combination."""
    return qc_logit_from_features(
        token_count_col(text),
        F.round(stopword_ratio_col(text), 6),
        F.round(punct_ratio_col(text), 6),
        F.length(tidy_col(text)),
    )


def qc_logit_sql(c: str) -> str:
    """DuckDB mirror of qc_logit_col — same terms, same order."""
    return (
        f"({QC_BIAS}"
        f" + {QC_W_LOG_TOKENS} * ln(1.0 + {dsql.token_count_sql(c)})"
        f" + {QC_W_STOPWORD} * round({dsql.stopword_ratio_sql(c)}, 6)"
        f" + {QC_W_PUNCT} * round({dsql.punct_ratio_sql(c)}, 6)"
        f" + {QC_W_LOG_CHARS} * ln(1.0 + length({dsql.tidy_sql(c)})))"
    )


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    logit = qc_logit_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.round(logit, 6).alias("quality_logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias(
            "quality_prob"
        ),
        (F.round(logit, 6) >= 0).alias("keep"),
    )


QUALITY_CLASSIFIER_SQL = f"""
with scored as (
  select doc_id, {qc_logit_sql('text')} as logit from documents
)
select doc_id,
       round(logit, 6) as quality_logit,
       round(1.0 / (1.0 + exp(-logit)), 6) as quality_prob,
       (round(logit, 6) >= 0) as keep
from scored
"""

# --------------------------------------------------------------------------
# Corpus data card (round 6): the per-(source, language) statistics report
# a production pipeline publishes alongside a training set (Dolma/
# RedPajama-style "data card" stage): document and token counts, mean
# document length, corpus-level EXACT-duplicate rate, and the mean of the
# quality_classifier score (identical scoring path — rounded features,
# then the linear logit — so the card agrees with the filter it audits).
# Scale shape: ONE corpus-sized shuffle to a (digest, source, lang)
# pre-aggregate (map-combined; digest = 16-byte unhex(md5), the binary
# payload convention), then the digest-size join-back over the ALREADY
# AGGREGATED frame (a dup group spanning sources/langs stays correct;
# groupBy + join-back, never a digest-partitioned window — an empty-text
# mega-dup would funnel into one window task, and an equi-join on a
# uniform digest key is AQE-skew-splittable), then a map-combined rollup
# to (source, lang) — a bounded cell space. Mean quality sums EXACT
# per-doc integers (round(prob·1e6) as bigint) so the cross-engine mean
# is bit-identical under any accumulation order (double sums are not).
# --------------------------------------------------------------------------


def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return datacard_frame(table(spark, sf_dir, "documents"))


def datacard_frame(docs: DataFrame) -> DataFrame:
    """Core over any (source, lang, text) frame — split from the sf_dir
    entry point so tests can plant cross-cell duplicate groups."""
    logit = qc_logit_col(F.col("text"))
    prob6 = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    base = docs.select(
        "source",
        "lang",
        token_count_col(F.col("text")).cast("bigint").alias("n_tok"),
        F.round(prob6 * F.lit(1000000.0)).cast("bigint").alias("q6"),
        F.unhex(F.md5("text")).alias("h"),
    )
    g1 = base.groupBy("h", "source", "lang").agg(
        F.count("*").alias("n"),
        F.sum("n_tok").alias("st"),
        F.sum("q6").alias("sq6"),
    )
    # null-safe link-back: NULL-text docs carry a NULL digest (groupBy
    # groups NULL keys together in both engines, matching exact_dedup's
    # accounting — two NULL-text docs ARE an exact-dup pair), and a plain
    # equi-join would silently drop the whole NULL group from the card
    sizes = g1.groupBy("h").agg(F.sum("n").alias("nh")).withColumnRenamed(
        "h", "h2"
    )
    flagged = g1.join(sizes, F.col("h").eqNullSafe(F.col("h2")))
    agg = flagged.groupBy("source", "lang").agg(
        F.sum("n").alias("n_docs"),
        F.sum("st").alias("total_tokens"),
        F.sum("sq6").alias("sq6"),
        F.sum(
            F.when(F.col("nh") > 1, F.col("n")).otherwise(F.lit(0))
        ).alias("dup_docs"),
    )
    return agg.select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double") / F.col("n_docs"), 2
        ).alias("mean_tokens"),
        "dup_docs",
        F.round(
            F.col("dup_docs").cast("double") / F.col("n_docs"), 6
        ).alias("dup_rate"),
        F.round(
            F.col("sq6") / F.lit(1000000.0) / F.col("n_docs"), 6
        ).alias("mean_quality"),
    )


CORPUS_DATACARD_SQL = f"""
with f1 as (
  select source, lang,
         ({dsql.token_count_sql('text')})::bigint as n_tok,
         round(round(1.0 / (1.0 + exp(-{qc_logit_sql('text')})), 6)
           * 1000000.0)::bigint as q6,
         md5(text) as h
  from documents
),
g1 as (
  select h, source, lang, count(*)::bigint as n,
         sum(n_tok)::bigint as st, sum(q6)::bigint as sq6
  from f1 group by 1, 2, 3
),
sizes as (select h, sum(n)::bigint as nh from g1 group by h)
select g1.source, g1.lang,
       sum(g1.n)::bigint as n_docs,
       sum(g1.st)::bigint as total_tokens,
       round((sum(g1.st)::bigint)::double / (sum(g1.n)::bigint), 2)
         as mean_tokens,
       sum(case when s.nh > 1 then g1.n else 0 end)::bigint as dup_docs,
       round((sum(case when s.nh > 1 then g1.n else 0 end)::bigint)::double
             / (sum(g1.n)::bigint), 6) as dup_rate,
       round(sum(g1.sq6)::bigint / 1000000.0 / (sum(g1.n)::bigint), 6)
         as mean_quality
from g1 join sizes s on g1.h is not distinct from s.h
group by 1, 2
"""

# --------------------------------------------------------------------------
# CCNet-style LM perplexity filter (round 6). CCNet (Wenzek et al. 2020)
# scores every crawled doc with a KenLM 5-gram model trained on a clean
# reference corpus and keeps/buckets by perplexity; the sandbox has no
# KenLM, so the model here is a bigram LM with add-one smoothing trained
# IN-ENGINE on a deterministic reference slice of the corpus itself
# (doc_id % LM_REF_MOD == 0 — the stand-in for "the Wikipedia model"; in
# production the model table is simply read from its own source). The
# whole thing is relational, so the expensive parts are exactly the shapes
# already benchmarked:
#   - ONE bigram explode → map-combined groupBy(doc_id, w1, w2) — the
#     only corpus-sized shuffle, compressed to distinct bigrams per doc;
#   - model tables derived FROM that compressed frame (filter slice →
#     groupBy(w1,w2) / groupBy(w1)) — map-combined, vocab-sized output;
#   - score = LEFT equi-joins doc-bigrams → model. The model side is
#     vocab-sized (sublinear but UNBOUNDED in the corpus), so no forced
#     broadcast — AQE decides, and the hot-context key ("the" as w1) is
#     join-skew-splittable, unlike a window partition;
#   - per-doc agg on doc_id.
# V (reference vocab) is a single-row aggregate — the sanctioned
# broadcast-stats class (BM25 pattern). Docs with <2 tokens carry
# n_bigrams=0 and NULL scores (never silently dropped). keep follows
# CCNet's "below-threshold" rule on the smoothed NLL; the production
# knob is the head/middle/tail percentile split, same plan shape.
# --------------------------------------------------------------------------
LM_REF_MOD = 10
# threshold sits inside the synthetic corpus's nll band (3.16-4.03 at
# sf0.01) so both keep outcomes are exercised by every oracle run
LM_NLL_KEEP_MAX = 3.6


def _lm_scored_frame(
    spark: SparkSession, sf_dir: str, extra_doc_cols: tuple[str, ...] = ()
) -> tuple[DataFrame, DataFrame]:
    """lm_perplexity's core, shared with ccnet_buckets: returns the
    docs ⟕ per-doc-NLL frame (plus ``extra_doc_cols`` carried through the
    one existing doc join — threading ``lang`` here is free, where a
    second corpus-sized doc_id join in the caller would not be) and the
    vocab-sized cached m2 model frame for the caller's scoped_cache."""
    from ..functions.text import tokens_col

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text"), lower=True).alias("arr")
    )
    # adjacent-pair structs; sequence(1, n-1) must be guarded — Spark's
    # sequence(1, 0) yields a DESCENDING [1, 0], not an empty array
    pair_t = "array<struct<w1:string,w2:string>>"
    pairs = F.when(
        F.size("arr") < 2, F.lit(None).cast(pair_t)
    ).otherwise(
        F.expr(
            "transform(sequence(1, size(arr) - 1),"
            " i -> struct(arr[i-1] as w1, arr[i] as w2))"
        )
    )
    # the compressed bigram frame feeds THREE consumers (doc scoring, the
    # m2 model agg, and m1 via m2) and Catalyst does NOT CSE the subtree
    # across join branches (the is_ref pushdown makes the slice branches'
    # exchanges differ from the doc side's, so ReuseExchange can't fire).
    # Measured at sf0.1 (interleaved, 5 reps): no-cache 0.542s / cache(big)
    # 0.525s / cache(m2) 0.534s — a wash locally, so the shape is chosen
    # for 100 TB: caching `big` persists a CORPUS-sized frame (unbounded
    # executor storage), while caching `m2` persists a VOCAB-sized model
    # and still collapses the duplicated reference-slice subtree (scan →
    # tokenize → explode → two groupBys) that would otherwise run again
    # for m1. The remaining duplicate work is one pushed-down 1/LM_REF_MOD
    # slice scan for vocab — bounded and cheap relative to any persist of
    # corpus-scale data. Cache released via scoped_cache on result drop.
    big = (
        toks.select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", "bg.w1", "bg.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )
    is_ref = F.col("doc_id") % LM_REF_MOD == 0
    m2 = (
        big.filter(is_ref)
        .groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("c2"))
        .cache()
    )
    # context counts from the bigram table itself (sum over w2), so the
    # smoothed probabilities sum to 1 per context by construction
    m1 = m2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        toks.filter(is_ref)
        .select(F.explode("arr").alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    scored = (
        big.join(m2, ["w1", "w2"], "left")
        .join(m1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "cnt",
            (
                F.col("cnt")
                * F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                )
            ).alias("ll"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            (-F.sum("ll") / F.sum("cnt")).alias("raw_nll"),
        )
    )
    out = docs.select("doc_id", *extra_doc_cols).join(scored, "doc_id", "left")
    nll = F.round(F.col("raw_nll"), 6)
    frame = out.select(
        "doc_id",
        *extra_doc_cols,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        nll.alias("nll"),
        F.round(F.exp(F.col("raw_nll")), 6).alias("ppl"),
        F.coalesce(nll <= LM_NLL_KEEP_MAX, F.lit(False)).alias("keep"),
    )
    return frame, m2


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import scoped_cache

    frame, m2 = _lm_scored_frame(spark, sf_dir)
    return scoped_cache(frame, m2)


# shared CTE chain (toks → … → scored), consumed by LM_PERPLEXITY_SQL and
# CCNET_BUCKETS_SQL so the two oracles can never drift apart
_LM_CORE_CTES = f"""
with toks as (
  select doc_id, {dsql.tokens_sql('text', lower=True)} as arr from documents
),
big0 as (
  select doc_id, unnest(range(1, len(arr))) as i, arr
  from toks where len(arr) >= 2
),
big as (
  select doc_id, arr[i] as w1, arr[i + 1] as w2, count(*) as cnt
  from big0 group by doc_id, arr[i], arr[i + 1]
),
m2 as (
  select w1, w2, sum(cnt) as c2 from big
  where doc_id % {LM_REF_MOD} = 0 group by w1, w2
),
m1 as (select w1, sum(c2) as c1 from m2 group by w1),
vocab as (
  select count(distinct t) as v from (
    select unnest(arr) as t from toks where doc_id % {LM_REF_MOD} = 0
  )
),
scored as (
  select b.doc_id, sum(b.cnt) as n_bigrams,
         -sum(b.cnt * ln((coalesce(m2.c2, 0) + 1.0)
                         / (coalesce(m1.c1, 0) + vocab.v)))
           / sum(b.cnt) as raw_nll
  from big b
  left join m2 on b.w1 = m2.w1 and b.w2 = m2.w2
  left join m1 on b.w1 = m1.w1
  cross join vocab
  group by b.doc_id
)"""

LM_PERPLEXITY_SQL = f"""{_LM_CORE_CTES}
select d.doc_id,
       coalesce(s.n_bigrams, 0)::bigint as n_bigrams,
       round(s.raw_nll, 6) as nll,
       round(exp(s.raw_nll), 6) as ppl,
       coalesce(round(s.raw_nll, 6) <= {LM_NLL_KEEP_MAX}, false) as keep
from documents d left join scored s on d.doc_id = s.doc_id
"""

# --------------------------------------------------------------------------
# CCNet head/middle/tail bucketing (round 6): the stage CCNet actually
# ships AFTER the perplexity score — per LANGUAGE, split the corpus into
# perplexity tertiles (head = most-fluent third; production trains on
# head+middle and drops or down-weights tail). Composes the lm_perplexity
# scorer above with the token_budget_select histogram discipline:
#   - per-doc NLL rides the ONE existing docs⟕scored join (lang threaded
#     through _lm_scored_frame — no second corpus join);
#   - tertile thresholds come from a QUANTIZED histogram: qb =
#     clamp(floor(nll·CCNET_Q), 0, CCNET_QB_MAX) → groupBy(lang,
#     qb) is map-combined over a STRUCTURALLY bounded key space (≤ langs ×
#     CCNET_QB_MAX+1 cells), the cumulative window runs over those
#     bounded histogram partitions (the sanctioned window class — never
#     over doc rows: a per-lang doc window would funnel each language into
#     one un-splittable sort task, the doc_keywords lesson);
#   - NULL-nll docs (<2 tokens) ride the histogram as a zero-count group
#     (conditional sum, NOT a filter — a pushed-down isnotnull on the
#     histogram branch would differentiate the two consumers' scored
#     subtrees and defeat ReusedExchange; with identical pruned branches
#     the final adaptive plan serves the doc side and the histogram side
#     from the SAME lm shuffles, plan-asserted) and come out with a NULL
#     bucket (never silently dropped);
#   - the threshold join back is the ONE broadcast hint this module's
#     bounded-side policy sanctions (≤ #languages rows — the K-centroid
#     class; its static estimate derives from the corpus-sized scored
#     child, and the join key `lang` is the worst possible shuffle key:
#     low-cardinality AND skewed, so doc rows must never hash on it).
# Bucket rule at cell granularity (deterministic, oracle-exact): t1/t2 =
# first cells where 3·cum ≥ n / ≥ 2n; a boundary cell goes wholly to the
# better bucket — the same "threshold cell resolves coarsely" contract as
# token_budget_select, which is also how CCNet applies its published
# per-language cutoffs.
# --------------------------------------------------------------------------
CCNET_Q = 100  # nll quantization: 0.01-nll-wide histogram cells
CCNET_QB_MAX = 2000  # clamp → the histogram is bounded by constants


def ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .common import scoped_cache

    base, m2 = _lm_scored_frame(spark, sf_dir, extra_doc_cols=("lang",))
    # explicit NULL guard: greatest/least SKIP nulls in both engines, so a
    # bare clamp would silently send a NULL-nll (<2-token) doc to cell 0 —
    # inflating its language's histogram AND mis-bucketing it 'head'
    # instead of the contracted NULL bucket
    qb = F.when(
        F.col("nll").isNotNull(),
        F.least(
            F.greatest(F.floor(F.col("nll") * CCNET_Q).cast("int"), F.lit(0)),
            F.lit(CCNET_QB_MAX),
        ),
    )
    # NOT cached (round-7 measurement): the static plan duplicates the lm
    # scoring subtree under both consumers (histogram + output join), but
    # the FINAL adaptive plan already serves both from the same corpus
    # bigram shuffle (ReusedExchange, plan-asserted) — caching the scored
    # frame measured a wash (2.9s ±0.1 either way at sf0.1) and would only
    # add executor storage, so the reuse shape stays.
    scored = base.select("doc_id", "lang", "nll", qb.alias("qb"))
    hist = scored.groupBy("lang", "qb").agg(
        F.sum(
            F.when(F.col("qb").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("cnt")
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("qb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hc = hist.select(
        "lang",
        "qb",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("lang")).alias("n"),
    )
    thr = hc.groupBy("lang").agg(
        F.min(
            F.when(
                F.col("qb").isNotNull() & (3 * F.col("cum") >= F.col("n")),
                F.col("qb"),
            )
        ).alias("t1"),
        F.min(
            F.when(
                F.col("qb").isNotNull()
                & (3 * F.col("cum") >= 2 * F.col("n")),
                F.col("qb"),
            )
        ).alias("t2"),
    )
    bucket = (
        F.when(
            F.col("qb").isNull() | F.col("t1").isNull(),
            F.lit(None).cast("string"),
        )
        .when(F.col("qb") <= F.col("t1"), F.lit("head"))
        .when(F.col("qb") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    out = scored.join(F.broadcast(thr), "lang", "left").select(
        "doc_id", "lang", "nll", bucket.alias("bucket")
    )
    return scoped_cache(out, m2)


CCNET_BUCKETS_SQL = f"""{_LM_CORE_CTES},
base as (
  select d.doc_id, d.lang, round(s.raw_nll, 6) as nll
  from documents d left join scored s on d.doc_id = s.doc_id
),
sc as (
  select *,
         case when nll is not null
              then least(greatest(cast(floor(nll * {CCNET_Q}) as int), 0),
                         {CCNET_QB_MAX}) end as qb
  from base
),
hist as (
  select lang, qb,
         sum(case when qb is not null then 1 else 0 end)::bigint as cnt
  from sc group by 1, 2
),
hc as (
  select *,
         sum(cnt) over (partition by lang order by qb
           rows between unbounded preceding and current row)::bigint as cum,
         sum(cnt) over (partition by lang)::bigint as n
  from hist
),
thr as (
  select lang,
         min(case when qb is not null and 3 * cum >= n then qb end) as t1,
         min(case when qb is not null and 3 * cum >= 2 * n then qb end) as t2
  from hc group by lang
)
select sc.doc_id, sc.lang, sc.nll,
       case when sc.qb is null or t.t1 is null then null
            when sc.qb <= t.t1 then 'head'
            when sc.qb <= t.t2 then 'middle'
            else 'tail' end as bucket
from sc left join thr t using (lang)
"""

EXTRA_QUERIES = {
    "quality_classifier": quality_classifier,
    "corpus_datacard": corpus_datacard,
    "blocklist_filter": blocklist_filter,
    "lm_perplexity": lm_perplexity,
    "ccnet_buckets": ccnet_buckets,
}
EXTRA_ORACLES = {
    "quality_classifier": QUALITY_CLASSIFIER_SQL,
    "corpus_datacard": CORPUS_DATACARD_SQL,
    "blocklist_filter": BLOCKLIST_FILTER_SQL,
    "lm_perplexity": LM_PERPLEXITY_SQL,
    "ccnet_buckets": CCNET_BUCKETS_SQL,
}
