"""Shared helpers for operator modules (table readers, portable hashing)."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- portable hex→int (both engines lack a shared numeric hash; md5 hex is
# the common ground — digits are mapped via position in '0123456789abcdef')
_HEX = "0123456789abcdef"


def hexn_to_bigint_sql(expr: str, n: int) -> str:
    """First ``n`` hex chars of ``expr`` → bigint (DuckDB; n <= 15)."""
    parts = []
    for i in range(n):
        mult = 16 ** (n - 1 - i)
        parts.append(
            f"(strpos('{_HEX}', substring({expr}, {i + 1}, 1)) - 1) * {mult}"
        )
    return "(" + " + ".join(parts) + ")"


def scoped_cache(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Scope operator-local ``.cache()``s to the RESULT's lifetime: each
    ``cached`` input (a plain .cache()d DataFrame — lineage intact, so any
    post-release re-execution just recomputes, never errors) is unpersisted
    when the returned ``result`` object is garbage-collected — i.e. right
    after the caller's terminal action drops it (``fn(...).toPandas()``).
    A long-lived session running many queries (the driver gate runs the
    whole contract in one session) no longer accumulates dead shingle/
    signature tables in executor storage, and a caller that keeps the
    result alive keeps the cache warm.

    CALLER CONTRACT: hold the RETURNED object itself through your terminal
    action. A caller that keeps only a DERIVED DataFrame (a .filter()/
    .select() of the result) and drops the result releases the cache before
    the derived plan runs — correct (lineage recomputes) but the cache is
    silently wasted. Promptness also relies on CPython refcounting; on
    other runtimes release waits for GC. Entry points that fan a cached
    input into several outputs should unpersist explicitly after their own
    terminal action instead of using this helper.
    """
    import weakref

    for c in cached:

        def _release(jdf=c._jdf) -> None:
            try:
                jdf.unpersist(False)
            except Exception:
                pass  # session already stopped

        weakref.finalize(result, _release)
    return result


def carry_scope(derived: DataFrame, *upstream: DataFrame) -> DataFrame:
    """Extend scoped_cache lifetimes across a derivation: an operator that
    returns a join/groupBy OF a scoped_cache result must keep the UPSTREAM
    result object alive through the caller's terminal action — otherwise
    its finalizers release the cache before the derived plan ever runs
    (correct, lineage recomputes, but the cache is silently wasted — the
    scoped_cache caller contract). Attaching the upstream frames to the
    derived frame chains the refcounts: the caches release exactly when
    the DERIVED result is dropped."""
    derived._scope_upstream = upstream
    return derived


def banded_pairs(
    keyed: DataFrame, id_col: str, band_cols: list[str], payload_cols: list[str]
) -> DataFrame:
    """LSH-banded candidate self-join: distinct (a, b) id pairs (a < b)
    colliding in >=1 band column — the shared shape of the simhash and
    embedding near-dup candidate generators (union of per-band equi-joins,
    never all-pairs). ``payload_cols`` ride along as ``<name>_a``/``<name>_b``."""
    if not band_cols:
        raise ValueError("band_cols must be non-empty")
    cand = None
    for bc in band_cols:
        a = keyed.select(
            F.col(id_col).alias("id_a"),
            F.col(bc).alias("bk"),
            *[F.col(c).alias(f"{c}_a") for c in payload_cols],
        )
        b = keyed.select(
            F.col(id_col).alias("id_b"),
            F.col(bc).alias("bk"),
            *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        )
        p = a.join(b, "bk").filter(F.col("id_a") < F.col("id_b")).drop("bk")
        cand = p if cand is None else cand.unionByName(p)
    return cand.dropDuplicates(["id_a", "id_b"])


def banded_pairs_sql(
    keyed_cte: str, id_col: str, n_bands: int, payload_cols: list[str]
) -> str:
    """DuckDB mirror of :func:`banded_pairs` as a ``cand`` CTE body over a
    CTE named ``keyed`` with band columns b0..b{n-1}."""
    payload = "".join(
        f", a.{c} as {c}_a, b.{c} as {c}_b" for c in payload_cols
    )
    joins = "\n    union all\n    ".join(
        f"select a.{id_col} as id_a, b.{id_col} as id_b{payload} "
        f"from {keyed_cte} a join {keyed_cte} b "
        f"on a.b{i} = b.b{i} and a.{id_col} < b.{id_col}"
        for i in range(n_bands)
    )
    cols = ", ".join(["id_a", "id_b"] + [f"{c}_{s}" for c in payload_cols for s in "ab"])
    return f"select distinct {cols} from (\n    {joins}\n  )"
