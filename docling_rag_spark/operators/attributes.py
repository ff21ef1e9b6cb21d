"""Dolma-style tagger/mixer attribute store (round 6).

The architecture layer that makes the per-doc operators USABLE as a
policy-iterating pipeline (Soldaini et al. 2024, "Dolma", arXiv:2402.00159
— taggers write attribute files once; a cheap "mixer" applies a keep
policy over them, so changing a threshold re-runs in seconds instead of
re-tokenizing the corpus): here the single-pass codegen taggers (token /
char counts, stopword & punct ratios, the shared quality_classifier
logit, the n-gram language id, the exact-dup digest) project into ONE
wide per-doc attributes row, and the mixer is a pure filter over those
columns — zero Exchange in both plans, every expensive expression
evaluated exactly once per doc.

Deployment shape: jobs/attributes_job.py persists the attributes table
with the same idempotent keyed append + resume anti-join as the
extraction job; `--mix` then regenerates the keep verdicts from the
COMMITTED attributes without touching document text at all (the point of
the split: at 100 TB the taggers are the corpus scan, the mixer is a
scan of a narrow numeric table ~1% the size). Heavier attribute families
(gopher stats, LM perplexity, dedup flags) keep their own operators —
in Dolma, too, each tagger ships its own attribute namespace; this table
is the always-on cheap family every policy consults.

Reference parity: the reference engine has no analog (its quality
decisions live inline in the ingestion path, src/ingestion/pipeline.py)
— this module exists for the training-pipeline mandate, not reference
parity.
"""

from __future__ import annotations

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
from .textstats import (
    blocklist_cols,
    blocklist_n_sql,
    blocklist_ratio_sql,
    qc_logit_sql,
)


def base_attributes_frame(docs: DataFrame) -> DataFrame:
    """The single-pass tagger family over any (doc_id, text) frame: pure
    projection, no Exchange, no Python. The digest is stored as lowercase
    hex (a PERSISTED table column read by humans and mixers — the
    16-byte-binary discipline applies to SHUFFLE keys, and nothing here
    shuffles).

    Round-7 shape: two stages behind a scoped cache barrier. qc_logit_col
    is DEFINED over the same ratio features emitted as sibling columns,
    and CollapseProject re-inlines any intermediate projection — so the
    flat round-6 select re-ran the tokenizer/HOF subtrees inside the logit
    and AGAIN inside the prob (interpreted lambdas get no codegen CSE,
    the round-4 lesson). Stage 1 evaluates every feature exactly once;
    the logit is then the SAME formula term-for-term over the staged
    columns (bit-identical doubles — the association order is qc_logit_col's;
    exact-frame-equality verified), with the cache as the CollapseProject
    barrier (the BM25 technique). Measured 2.04→1.81s warm at sf0.1.
    Callers that derive from this frame must carry_scope the result."""
    n_blocked, blocked_ratio = blocklist_cols(F.col("text"))
    from .common import scoped_cache
    from .textstats import qc_logit_from_features

    staged = docs.select(
        "doc_id",
        F.length(tidy_col(F.col("text"))).alias("n_chars"),
        token_count_col(F.col("text")).alias("n_tokens"),
        F.round(stopword_ratio_col(F.col("text")), 6).alias("stopword_ratio"),
        F.round(punct_ratio_col(F.col("text")), 6).alias("punct_ratio"),
        detect_language_col(F.col("text")).alias("pred_lang"),
        n_blocked.alias("n_blocked"),
        blocked_ratio.alias("blocked_ratio"),
        F.md5("text").alias("text_digest"),
    ).cache()
    # the ONE shared linear combination, read from the staged columns:
    # rounded ratios and counts are exactly what qc_logit_col feeds it,
    # so the doubles cannot differ
    logit = qc_logit_from_features(
        F.col("n_tokens"),
        F.col("stopword_ratio"),
        F.col("punct_ratio"),
        F.col("n_chars"),
    )
    out = staged.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "stopword_ratio",
        "punct_ratio",
        F.round(logit, 6).alias("quality_logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias(
            "quality_prob"
        ),
        "pred_lang",
        "n_blocked",
        "blocked_ratio",
        "text_digest",
    )
    return scoped_cache(out, staged)


def doc_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return base_attributes_frame(table(spark, sf_dir, "documents"))


DOC_ATTRIBUTES_SQL = f"""
select doc_id,
       length({dsql.tidy_sql('text')}) as n_chars,
       {dsql.token_count_sql('text')} as n_tokens,
       round({dsql.stopword_ratio_sql('text')}, 6) as stopword_ratio,
       round({dsql.punct_ratio_sql('text')}, 6) as punct_ratio,
       round({qc_logit_sql('text')}, 6) as quality_logit,
       round(1.0 / (1.0 + exp(-{qc_logit_sql('text')})), 6) as quality_prob,
       {dsql.detect_language_sql('text')} as pred_lang,
       {blocklist_n_sql('text')} as n_blocked,
       {blocklist_ratio_sql('text')} as blocked_ratio,
       md5(text) as text_digest
from documents
"""

# The default mix policy — ordered: the mixer reports the FIRST failing
# rule, so order is part of the contract (cheap rules first, the audit
# reads "why was this dropped" deterministically). A policy is DATA, not
# code (the Dolma mixer convention): jobs/attributes_job.py --policy
# points at a JSON file with any subset of these keys, so threshold
# iteration never edits source.
MIX_MIN_TOKENS = 15
MIX_MIN_STOPWORD = 0.02
MIX_MIN_PROB = 0.5
MIX_LANGS = ("en", "de", "es", "fr", "zh")

DEFAULT_POLICY: dict = {
    "min_tokens": MIX_MIN_TOKENS,
    "min_stopword": MIX_MIN_STOPWORD,
    "min_quality": MIX_MIN_PROB,
    "langs": list(MIX_LANGS),
    # C4 rule: a single blocklisted token drops the doc; raise to tolerate
    "max_blocked": 0,
}


def mix_verdict_cols(policy: dict | None = None) -> tuple[Column, Column]:
    """(keep, reason) over attribute COLUMNS — shared by the driver query
    and the job's --mix stage so the two can never disagree. Every rule is
    NULL-coalesced to a FAIL: a NULL attribute (a NULL-text doc's
    n_tokens/quality) must yield keep=false with its first failing rule
    named, never a NULL verdict that vanishes from both the keep and the
    drop audit. ``policy`` overrides any subset of DEFAULT_POLICY;
    unknown keys fail loud (a typo'd threshold must not silently apply
    the default)."""
    p = dict(DEFAULT_POLICY)
    if policy:
        unknown = set(policy) - set(p)
        if unknown:
            raise ValueError(f"unknown policy keys: {sorted(unknown)}")
        # value-type validation — fail loud on the easy JSON mistakes:
        # "langs": "en" would splat into isin('e', 'n') and silently drop
        # everything; a bool/str threshold would compare nonsensically
        for key in ("min_tokens", "min_stopword", "min_quality",
                    "max_blocked"):
            if key in policy and (
                isinstance(policy[key], bool)
                or not isinstance(policy[key], (int, float))
            ):
                raise ValueError(f"policy {key!r} must be numeric")
        if "langs" in policy and (
            not isinstance(policy["langs"], (list, tuple))
            or not all(isinstance(lg, str) for lg in policy["langs"])
            or not policy["langs"]
        ):
            raise ValueError("policy 'langs' must be a non-empty string list")
        p.update(policy)
    rules = [
        ("min_tokens", F.col("n_tokens") >= p["min_tokens"]),
        ("min_stopword", F.col("stopword_ratio") >= p["min_stopword"]),
        ("min_quality", F.col("quality_prob") >= p["min_quality"]),
        ("lang", F.col("pred_lang").isin(*p["langs"])),
        ("blocklist", F.col("n_blocked") <= p["max_blocked"]),
    ]
    rules = [(n, F.coalesce(c, F.lit(False))) for n, c in rules]
    keep = rules[0][1]
    for _, cond in rules[1:]:
        keep = keep & cond
    reason = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        reason = F.when(~cond, F.lit(name)).otherwise(reason)
    return keep, reason


def mixer_frame(attrs: DataFrame, policy: dict | None = None) -> DataFrame:
    """The verdict projection — ONE definition consumed by the driver
    query and the job's --mix stage (schema drift between the two would
    silently fork the audit format)."""
    keep, reason = mix_verdict_cols(policy)
    return attrs.select(
        "doc_id", keep.alias("keep"), reason.alias("reason")
    )


def attribute_mixer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import carry_scope

    # carry_scope: the mixer DERIVES from the scoped-cached attributes
    # frame — without attaching it, its cache would release before the
    # derived plan runs (the scoped_cache caller contract)
    attrs = base_attributes_frame(table(spark, sf_dir, "documents"))
    return carry_scope(mixer_frame(attrs), attrs)


def _mixer_sql() -> str:
    conds = {
        "min_tokens": f"coalesce(n_tokens >= {MIX_MIN_TOKENS}, false)",
        "min_stopword":
            f"coalesce(stopword_ratio >= {MIX_MIN_STOPWORD}, false)",
        "min_quality": f"coalesce(quality_prob >= {MIX_MIN_PROB}, false)",
        "lang": "coalesce(pred_lang in ("
        + ", ".join(f"'{lg}'" for lg in MIX_LANGS)
        + "), false)",
        "blocklist": "coalesce(n_blocked <= 0, false)",
    }
    whens = " ".join(
        f"when not ({c}) then '{name}'" for name, c in conds.items()
    )
    allc = " and ".join(f"({c})" for c in conds.values())
    return f"""
with attrs as ({DOC_ATTRIBUTES_SQL})
select doc_id,
       ({allc}) as keep,
       (case {whens} else null end) as reason
from attrs
"""


ATTRIBUTE_MIXER_SQL = _mixer_sql()

QUERIES: dict = {}
ORACLES: dict = {}
EXTRA_QUERIES = {
    "doc_attributes": doc_attributes,
    "attribute_mixer": attribute_mixer,
}
EXTRA_ORACLES = {
    "doc_attributes": DOC_ATTRIBUTES_SQL,
    "attribute_mixer": ATTRIBUTE_MIXER_SQL,
}
