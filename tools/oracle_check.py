"""Local replica of the driver's correctness gate: run every queries() entry
and compare against oracle_sql() in DuckDB (row count + sorted-value frame
equality).

Usage: python tools/oracle_check.py [sf_dir] [name ...]
       [--extra]             also include the extended registry
       [--extra-only]        ONLY the extended registry (round artifact)
       [--json PATH]         write driver-style per-query rows to PATH
                             (rows/schema/hash match booleans + counts) —
                             the committed CORRECTNESS_ext_r{N}.json
                             evidence for the extended queries."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as e  # noqa: E402
from docling_rag_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize like the driver: sorted columns/rows. Integer widths and
    timestamp resolutions are normalized (int32 vs int64 / ns vs us are
    engine-representation noise), but int-vs-float is NOT — DuckDB HUGEINT
    aggregates surfacing as float64 must fail here like they fail upstream."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    raw = sys.argv[1:]
    json_out = None
    if "--json" in raw:
        i = raw.index("--json")
        if i + 1 >= len(raw) or raw[i + 1].startswith("--"):
            print("usage: --json PATH (PATH missing)")
            return 1
        json_out = raw[i + 1]
        raw = raw[:i] + raw[i + 2:]
    flags = {a for a in raw if a.startswith("--")}
    argv = [a for a in raw if not a.startswith("--")]
    include_extra = "--extra" in flags or "--extra-only" in flags
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    spark = get_spark(master="local[8]", app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    if include_extra or (only and only - set(qs)):
        extra_qs, extra_oracles = e.extended_queries(), e.extended_oracle_sql()
        if "--extra-only" in flags:
            qs, oracles = extra_qs, extra_oracles
        else:
            qs = {**qs, **extra_qs}
            oracles = {**oracles, **extra_oracles}
    if only:
        missing = only - set(qs)
        if missing:
            print(f"unknown query names: {sorted(missing)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failed = []
    report: dict[str, dict] = {}

    def record(name, *, spark_rows=None, oracle_rows=None, rows=False,
               schema=False, hashm=False, err=None):
        report[name] = {
            "rows_match": rows, "schema_match": schema, "hash_match": hashm,
            "spark_rows": spark_rows, "oracle_rows": oracle_rows, "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            record(name, err=f"spark: {str(ex)[:200]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            # no oracle SQL → nothing was compared; record mode=rows-only
            # with rows_match=None so the committed evidence JSON cannot
            # overstate "returned rows" as "rows matched oracle"
            print(f"ok   {name}: rows-only, {len(got)} rows ({time.time()-t0:.1f}s)")
            record(name, spark_rows=len(got), rows=None)
            report[name]["mode"] = "rows-only"
            report[name]["returned_rows"] = len(got) > 0
            if len(got) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            want = con.execute(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            record(name, spark_rows=len(got), err=f"duckdb: {str(ex)[:200]}")
            continue
        a, b = norm(got), norm(want)
        rows_match = len(a) == len(b)
        schema_match = list(a.columns) == list(b.columns) and all(
            a[c].dtype == b[c].dtype for c in a.columns
        )
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=True)
            print(f"ok   {name}: {len(a)} rows match oracle ({time.time()-t0:.1f}s)")
            record(name, spark_rows=len(a), oracle_rows=len(b),
                   rows=True, schema=True, hashm=True)
        except AssertionError as ex:
            print(f"FAIL {name}: mismatch (spark={len(a)} duckdb={len(b)} rows)")
            print(str(ex)[:500])
            print("spark head:", a.head(3).to_dict("records"))
            print("duck  head:", b.head(3).to_dict("records"))
            failed.append(name)
            record(name, spark_rows=len(a), oracle_rows=len(b),
                   rows=rows_match, schema=schema_match, hashm=False)
    print(f"\n{len(qs) - len(failed)}/{len(qs)} ok; failed: {failed}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
