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


# --------------------------------------------------------------------------
# J4/J5 (round 4, extended registry): ancestor-path prefix join — the
# reference rebuilds folder-level permissions by matching each chunk's
# file_path against permission PREFIXES (`chunks.file_path = pp.path OR
# file_path LIKE pp.path || '/%'`, cli/cli.py:475-483; ancestor expansion
# + = ANY(ancestors), src/storage/postgres.py:681-704). A LIKE-prefix
# theta join is a nested loop at any scale; the Spark-first rewrite
# EXPLODES each path's ancestor prefixes (a path of depth d has d of them
# — tiny) and equi-joins on the prefix, turning O(paths × perms) into one
# hash join. Paths and the permission-prefix table are derived
# deterministically from the documents view so the DuckDB oracle sees
# identical inputs: path = source/lang/doc_id; perms grant 'all' on every
# source root and 'en-only' on every source/en folder.
# --------------------------------------------------------------------------
def ancestor_prefix_grants(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    path_parts = F.array(
        F.col("source"), F.col("lang"), F.col("doc_id").cast("string")
    )
    # every proper ancestor prefix of the path (depth-1 and depth-2 here)

    def prefix(i):
        return F.array_join(F.slice(path_parts, 1, i), "/")

    ancestors = F.array(prefix(1), prefix(2))
    exploded = docs.select(
        "doc_id", F.explode(ancestors).alias("prefix")
    )
    perms = (
        docs.select(F.col("source").alias("prefix"), F.lit("all").alias("grant"))
        .distinct()
        .unionByName(
            docs.filter(F.col("lang") == "en")
            .select(
                F.concat_ws("/", "source", "lang").alias("prefix"),
                F.lit("en-only").alias("grant"),
            )
            .distinct()
        )
    )
    return (
        exploded.join(F.broadcast(perms), "prefix")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grants"),
            F.min("grant").alias("first_grant"),
        )
    )


ANCESTOR_GRANTS_SQL = """
with paths as (
  select doc_id, [source, lang, doc_id::varchar] as parts from documents
),
anc as (
  select doc_id, array_to_string(parts[1:i], '/') as prefix
  from paths, unnest(range(1, 3)) as t(i)
),
perms as (
  select distinct source as prefix, 'all' as g from documents
  union all
  select distinct source || '/' || lang as prefix, 'en-only' as g
  from documents where lang = 'en'
)
select doc_id, count(*) as n_grants, min(g) as first_grant
from anc join perms using (prefix)
group by doc_id
"""

EXTRA_QUERIES = {"ancestor_prefix_grants": ancestor_prefix_grants}
EXTRA_ORACLES = {"ancestor_prefix_grants": ANCESTOR_GRANTS_SQL}
