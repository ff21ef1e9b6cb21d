"""J1: the RBAC visibility predicate — anti ∪ semi join.

The reference applies one predicate identically in five query functions
(reference src/storage/postgres.py:138-141, :179-182, :270-273, :817-821,
:862-866; contract CLAUDE.md:15-29):

    doc_id NOT IN (SELECT doc_id FROM document_permissions)        -- public
    OR doc_id IN (SELECT dp.doc_id FROM document_permissions dp
                  JOIN groups g ON g.id = dp.group_id
                  WHERE g.name = ANY(:groups))                     -- granted

The serving layer is out of build scope (BASELINE.json:6), but the
predicate itself is pure relational algebra — implemented here over
permission tables derived DETERMINISTICALLY from the documents view so the
DuckDB oracle sees identical inputs:

    groups:                (group_id g in 0..2, name 'grp_g')
    document_permissions:  docs with doc_id % 5 == 0 are restricted to
                           group (doc_id % 3); all other docs are public.

Visible to caller-groups {grp_0}: all public docs ∪ restricted docs whose
group is grp_0. At scale both sides broadcast (perm tables ≪ corpus) —
exactly the plan Postgres' nested-loop-over-index picks, Spark-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import table

CALLER_GROUPS = ["grp_0"]
RESTRICT_MOD = 5
GROUP_MOD = 3


def _perm_tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = table(spark, sf_dir, "documents")
    dp = docs.filter(F.col("doc_id") % RESTRICT_MOD == 0).select(
        "doc_id", (F.col("doc_id") % GROUP_MOD).alias("group_id")
    )
    groups = spark.range(GROUP_MOD).select(
        F.col("id").alias("group_id"),
        F.concat(F.lit("grp_"), F.col("id")).alias("name"),
    )
    return dp, groups


def visible_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents visible to CALLER_GROUPS: left_anti (public) ∪ left_semi
    (granted via broadcast dim join) — the reference's J1, Spark-shaped."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    dp, groups = _perm_tables(spark, sf_dir)
    public = docs.join(F.broadcast(dp.select("doc_id")), "doc_id", "left_anti")
    allowed_docs = dp.join(
        F.broadcast(groups.filter(F.col("name").isin(CALLER_GROUPS))), "group_id"
    ).select("doc_id")
    granted = docs.join(F.broadcast(allowed_docs), "doc_id", "left_semi")
    return public.unionByName(granted)


VISIBLE_SQL = f"""
with dp as (
  select doc_id, doc_id % {GROUP_MOD} as group_id from documents
  where doc_id % {RESTRICT_MOD} = 0
),
groups as (
  select g as group_id, 'grp_' || g as name
  from unnest(range(0, {GROUP_MOD})) as t(g)
)
select doc_id, lang, n_chars from documents
where doc_id not in (select doc_id from dp)
   or doc_id in (select dp.doc_id from dp
                 join groups g on g.group_id = dp.group_id
                 where g.name in ({', '.join(repr(g) for g in CALLER_GROUPS)}))
"""


def union_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: overlapping-subset union with dedup (reference seen-set across
    overlapping folder globs, src/utils.py:125-134)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 3 == 0)
    return a.unionByName(b).dropDuplicates(["doc_id"])


UNION_DEDUP_SQL = """
select distinct doc_id, source from (
  select doc_id, source from documents where doc_id % 2 = 0
  union all
  select doc_id, source from documents where doc_id % 3 = 0
)
"""

QUERIES = {
    "visible_documents": visible_documents,
    "union_dedup_docs": union_dedup_docs,
}
ORACLES = {
    "visible_documents": VISIBLE_SQL,
    "union_dedup_docs": UNION_DEDUP_SQL,
}
