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


def hex4_to_int_col(hex4: Column) -> Column:
    """First 4 hex chars → int in [0, 65535] via conv (Spark-side only)."""
    return F.conv(hex4, 16, 10).cast("int")


def hex4_to_int_sql(hex4: str) -> str:
    """DuckDB mirror: positional digit arithmetic (no conv() in DuckDB)."""
    return hexn_to_bigint_sql(hex4, 4)


def hexn_to_bigint_sql(expr: str, n: int) -> str:
    """First ``n`` hex chars of ``expr`` → bigint (DuckDB; n <= 15)."""
    parts = []
    for i in range(n):
        mult = 16 ** (n - 1 - i)
        parts.append(
            f"(strpos('{_HEX}', substring({expr}, {i + 1}, 1)) - 1) * {mult}"
        )
    return "(" + " + ".join(parts) + ")"
