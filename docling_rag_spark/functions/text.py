"""Column-expression library (JVM-side, whole-stage-codegen friendly).

Every function here has an exact DuckDB mirror in
``docling_rag_spark/functions/duckdb_sql.py`` — the two are generated from
the same frozen spec (kernels/textutils.py) so the driver's oracle compare
is meaningful. No Python UDFs: these are pure Catalyst expressions.

Reference recipes reproduced:
- tidy: src/ingestion/document.py:113-114
- chunk id: src/ingestion/chunker.py:49
- language fallback-to-en: src/ingestion/document.py:212-218
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels.textutils import EN_STOPWORDS, LANG_MARKERS

PUNCT_CLASS = r"[.,;:!?]"


def tidy_col(c: Column) -> Column:
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(c, r"[\r\n]+|<!-- image -->", " "), r"\s+", " "
        )
    )


def tokens_col(c: Column, lower: bool = False) -> Column:
    t = tidy_col(c)
    if lower:
        t = F.lower(t)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def token_count_col(c: Column) -> Column:
    return F.size(tokens_col(c))


def punct_ratio_col(c: Column) -> Column:
    t = tidy_col(c)
    n = F.length(t)
    punct = n - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n)


def stopword_ratio_col(c: Column) -> Column:
    toks = tokens_col(c)
    sw_arr = F.array(*[F.lit(w) for w in sorted(EN_STOPWORDS)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, F.lower(t))))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def lang_hits_col(c: Column, lang: str) -> Column:
    """Marker-token hits in the first 500 chars (kernels.textutils spec)."""
    markers = dict(LANG_MARKERS)[lang]
    toks = tokens_col(F.lower(F.substring(c, 1, 500)))
    arr = F.array(*[F.lit(m) for m in sorted(markers)])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def detect_language_col(c: Column) -> Column:
    """Most marker hits wins; ties → earlier language in LANG_MARKERS;
    all-zero → 'en'.

    Shape: ONE struct per language, argmax via array_max (struct compare:
    hits, then -index so the EARLIER language wins exact ties — identical
    to the strict-greater fold this replaces). The naive when-chain fold
    nested each accumulator twice per step, so early languages' marker
    scans appeared 2^L times in the tree — HOF filters are interpreted
    (no codegen CSE), which made every consumer pay the duplication
    (measured ~10× on a 42k-row chunk table)."""
    entries = [
        F.struct(
            lang_hits_col(c, lang).alias("hits"),
            F.lit(-idx).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for idx, (lang, _) in enumerate(LANG_MARKERS)
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("en"))


def shingles_col(c: Column, n: int = 3) -> Column:
    """Distinct lowercase word n-gram shingles (kernels.textutils.shingles)."""
    toks = tokens_col(c, lower=True)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


def term_frequency_col(c: Column, terms: list[str]) -> Column:
    """Total occurrences of the (lowercased) query terms in the text — the
    token-overlap fulltext score (stand-in for ts_rank_cd,
    reference src/storage/postgres.py:167-198)."""
    toks = tokens_col(c, lower=True)
    arr = F.array(*[F.lit(t.lower()) for t in terms])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def chunk_id_col(doc_id: Column, idx: Column, text: Column) -> Column:
    """md5('{doc_id}_{idx}_{text}') — exact reference recipe
    (src/ingestion/chunker.py:49)."""
    return F.md5(F.concat_ws("_", doc_id.cast("string"), idx.cast("string"), text))
