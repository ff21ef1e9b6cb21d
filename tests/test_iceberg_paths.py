"""Shape-tests for the Iceberg branches of the sinks (round-4 verdict #8).

No Iceberg runtime jars exist in this sandbox, so the MERGE/DELETE can't
execute — but the statement text, per-call unique view lifecycle, and
identifier validation are all testable by forcing `iceberg_available` True
and intercepting SparkSession.sql. On a real cluster the same calls run
unchanged."""

from __future__ import annotations

import re

import pytest

import docling_rag_spark.sources.sinks as sinks


@pytest.fixture()
def captured_sql(spark, monkeypatch):
    recorded: list[str] = []
    real_sql = spark.sql

    def fake_sql(stmt, *a, **k):
        if stmt.lstrip().lower().startswith(("merge", "delete")):
            recorded.append(stmt)
            return spark.range(0)
        return real_sql(stmt, *a, **k)

    monkeypatch.setattr(sinks, "iceberg_available", lambda s: True)
    monkeypatch.setattr(spark, "sql", fake_sql)
    return recorded


def test_merge_statement_shape_and_view_cleanup(spark, captured_sql, tmp_path):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id long, v string")
    sinks.idempotent_append(
        spark, df, str(tmp_path / "unused"), key="id", iceberg_table="cat.db.chunks"
    )
    assert len(captured_sql) == 1
    m = re.fullmatch(
        r"merge into cat\.db\.chunks t using (_idem_src_[0-9a-f]{32}) s "
        r"on t\.id = s\.id when not matched then insert \*",
        captured_sql[0],
    )
    assert m, captured_sql[0]
    # the per-call unique source view must be dropped afterwards
    assert m.group(1) not in [t.name for t in spark.catalog.listTables()]


def test_merge_composite_key_on_clause(spark, captured_sql, tmp_path):
    df = spark.createDataFrame([(1, 0, "a")], "doc_id long, idx long, v string")
    sinks.idempotent_append(
        spark, df, str(tmp_path / "unused"), key=["doc_id", "idx"], iceberg_table="c.d.t"
    )
    assert "on t.doc_id = s.doc_id and t.idx = s.idx" in captured_sql[0]


def test_delete_statement_shape_and_view_cleanup(spark, captured_sql, tmp_path):
    ids = spark.createDataFrame([("7",), ("7",)], "doc_id string")
    sinks.delete_docs(spark, str(tmp_path / "unused"), ids, iceberg_table="cat.db.chunks")
    assert len(captured_sql) == 1
    m = re.fullmatch(
        r"delete from cat\.db\.chunks where doc_id in "
        r"\(select doc_id from (_del_ids_[0-9a-f]{32})\)",
        captured_sql[0],
    )
    assert m, captured_sql[0]
    assert m.group(1) not in [t.name for t in spark.catalog.listTables()]


def test_invalid_table_identifier_rejected(spark, captured_sql, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    for bad in ("cat.db.chunks; drop table x", "a-b.c", "t'--", "1tbl"):
        with pytest.raises(ValueError, match="invalid table identifier"):
            sinks.idempotent_append(
                spark, df, str(tmp_path / "unused"), key="id", iceberg_table=bad
            )
    assert captured_sql == []  # nothing reached the engine
    # and no leaked temp views from the aborted calls
    assert not [
        t.name for t in spark.catalog.listTables() if t.name.startswith("_idem_src_")
    ]
