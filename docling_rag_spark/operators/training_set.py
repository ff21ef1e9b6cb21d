"""Training-set selection: the composed pipeline this engine exists for.

One declarative plan chaining the training-data operators: quality gates
(token window + stopword floor) ∧ language filter (predicted en) ∧ near-dup
removal (drop every doc that is the higher id in a strong MinHash-LSH
candidate pair — keep-first-canonical, the standard crawl-dedup rule).
At 100 TB each stage is the already-benchmarked operator; composition adds
one anti-join (broadcast-able: the drop-set is ~the dup rate × corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import duckdb_sql as dsql
from ..functions.text import detect_language_col, stopword_ratio_col, token_count_col
from .common import table
from .dedup import MINHASH_LSH_SQL, minhash_lsh_pairs

MIN_TOKENS = 20
MAX_TOKENS_DOC = 200
MIN_STOPWORD_RATIO = 0.02
STRONG_BANDS = 2  # pair strength for the drop rule


def training_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        F.round(stopword_ratio_col(F.col("text")), 6).alias("stopword_ratio"),
        detect_language_col(F.col("text")).alias("pred_lang"),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_tokens") <= MAX_TOKENS_DOC)
        & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
        & (F.col("pred_lang") == "en")
    )
    dups = (
        minhash_lsh_pairs(spark, sf_dir)
        .filter(F.col("n_shared_bands") >= STRONG_BANDS)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return kept.join(dups, "doc_id", "left_anti")


TRAINING_SUBSET_SQL = f"""
with pairs as (
  {MINHASH_LSH_SQL.strip()}
),
dups as (
  select distinct doc_b as doc_id from pairs where n_shared_bands >= {STRONG_BANDS}
),
scored as (
  select doc_id,
         {dsql.token_count_sql('text')} as n_tokens,
         round({dsql.stopword_ratio_sql('text')}, 6) as stopword_ratio,
         {dsql.detect_language_sql('text')} as pred_lang
  from documents
)
select s.doc_id, s.n_tokens, s.stopword_ratio, s.pred_lang
from scored s
where s.n_tokens between {MIN_TOKENS} and {MAX_TOKENS_DOC}
  and s.stopword_ratio >= {MIN_STOPWORD_RATIO}
  and s.pred_lang = 'en'
  and s.doc_id not in (select doc_id from dups)
"""

# --------------------------------------------------------------------------
# Deterministic stratified sampling — the standard training-mix op at corpus
# scale: take SAMPLE_K pseudo-random docs per (lang, source) stratum, with
# md5(seed|doc_id) as the portable random order (no RNG state, identical on
# every run/engine). One shuffle on the stratum key; the rate-based variant
# (filter on the hash alone) would be shuffle-free — this quota form is the
# harder, more useful one (balanced mixes regardless of stratum skew).
# --------------------------------------------------------------------------
SAMPLE_K = 20
SAMPLE_SEED = "mix1"


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    h = F.md5(F.concat_ws("|", F.lit(SAMPLE_SEED), F.col("doc_id")))
    w = Window.partitionBy("lang", "source").orderBy(h, F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "source", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("doc_id", "lang", "source", "rk")
    )


STRATIFIED_SAMPLE_SQL = f"""
select doc_id, lang, source, rk from (
  select doc_id, lang, source,
         row_number() over (
           partition by lang, source
           order by md5('{SAMPLE_SEED}' || '|' || doc_id::varchar), doc_id
         ) as rk
  from documents
) where rk <= {SAMPLE_K}
"""

# --------------------------------------------------------------------------
# Benchmark decontamination (GPT-3 appendix C / PaLM style): flag every
# training document sharing at least one word 13-gram with the held-out
# eval set. The eval set here is a deterministic slice of the corpus
# (doc_id % DECON_EVAL_MOD == 0 — in production, the benchmark table);
# its distinct 13-gram set is tiny relative to the corpus and BROADCASTS,
# so the scan-side plan is a broadcast semi-join with payload: no shuffle
# of training shingles at any corpus size. Output: contaminated docs with
# their shared-gram counts (the audit artifact a removal step consumes).
# --------------------------------------------------------------------------
DECON_NGRAM = 13
DECON_EVAL_MOD = 50


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import shingles_col

    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(shingles_col(F.col("text"), n=DECON_NGRAM)).alias("g"),
    )
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    eval_grams = sh.filter(is_eval).select("g").distinct()
    train = sh.filter(~is_eval)
    return (
        train.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
    )


DECONTAMINATE_SQL = f"""
with sh as (
  select doc_id, unnest({dsql.shingles_sql('text', n=DECON_NGRAM)}) as g
  from documents
),
ev as (select distinct g from sh where doc_id % {DECON_EVAL_MOD} = 0)
select doc_id, count(distinct g) as n_shared_grams
from sh join ev using (g)
where doc_id % {DECON_EVAL_MOD} != 0
group by doc_id
"""

QUERIES = {
    "training_subset": training_subset,
    "stratified_sample": stratified_sample,
    "decontaminate": decontaminate,
}
ORACLES = {
    "training_subset": TRAINING_SUBSET_SQL,
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
    "decontaminate": DECONTAMINATE_SQL,
}
