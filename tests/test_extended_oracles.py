"""Queries retired from the 50-slot driver contract keep their DuckDB
oracle checks HERE (round-4 verdict #1: exposed == driver-checked; nothing
loses its correctness evidence). Same canonicalization as
tools/oracle_check.py, run at sf0.001."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from tools.oracle_check import TABLES, norm  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _extended_names():
    qs = entry_mod.extended_queries()
    return sorted(qs)


@pytest.mark.parametrize("name", _extended_names())
def test_extended_query_matches_oracle(spark, duck, name):
    fn = entry_mod.extended_queries()[name]
    sql = entry_mod.extended_oracle_sql()[name]
    got = norm(fn(spark, SF).toPandas())
    want = norm(duck.execute(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    assert len(got) > 0


def test_contract_is_exactly_fifty():
    """The driver gate verifies the FIRST 50 queries() entries; the contract
    must therefore expose exactly 50 so exposed == checked, every query has
    an oracle, and the extended set never leaks into the contract."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) == 50, sorted(qs)
    assert set(oracles) == set(qs)
    assert not set(entry_mod.extended_queries()) & set(qs)
