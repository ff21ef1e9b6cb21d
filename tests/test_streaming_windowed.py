"""Watermarked windowed aggregation + bounded-state streaming dedup:
append-mode exactly-once emission, late-data folding inside the watermark,
too-late drop beyond it, and restart-from-checkpoint continuity."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from docling_rag_spark.streaming.windowed import (
    DOCS_STREAM_SCHEMA,
    EVENTS_SCHEMA,
    dedup_stream,
    windowed_counts_stream,
)

D0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _h(n):
    return dt.timedelta(hours=n)


def _d(n):
    return dt.timedelta(days=n)


def _win_rows(spark, out):
    path = os.path.join(out, "windows")
    return sorted(
        (r["day"], r["event_type"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(path).collect()
    )


def test_windowed_counts_watermark_lifecycle(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")

    # batch A: day-0 events + a day-2 event that advances the watermark
    # past day-0's window end (watermark = max_ts - 2h = day2+10h - 2h)
    rows_a = [
        (1, D0 + _h(1), 1, "click", 1.0, None),
        (2, D0 + _h(2), 2, "click", 2.5, None),
        (3, D0 + _h(3), 1, "view", None, None),
        (4, D0 + _d(2) + _h(10), 3, "click", 4.0, None),
    ]
    spark.createDataFrame(rows_a, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    windowed_counts_stream(spark, inp, out)
    got = _win_rows(spark, out)
    # day-0 and day-1(empty, never existed) close; day-2 stays open
    assert got == [
        (D0, "click", 2, 3.5),
        (D0, "view", 1, None),
    ]

    # batch B: a TOO-LATE day-0 event (window already emitted — must be
    # dropped, not re-emitted or double-counted), a day-2 event (folds into
    # the open window), and a day-5 event pushing the watermark past day-2
    rows_b = [
        (5, D0 + _h(4), 9, "click", 100.0, None),        # too late: dropped
        (6, D0 + _d(2) + _h(11), 4, "click", 6.0, None),  # folds into day-2
        (7, D0 + _d(5), 5, "view", 7.0, None),            # advances watermark
    ]
    spark.createDataFrame(rows_b, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    windowed_counts_stream(spark, inp, out)  # restart from checkpoint
    got = _win_rows(spark, out)
    assert got == [
        (D0, "click", 2, 3.5),               # NOT re-emitted, late row absent
        (D0, "view", 1, None),
        (D0 + _d(2), "click", 2, 10.0),      # both day-2 events, one row
    ]

    # replay with no new data: nothing re-emits
    windowed_counts_stream(spark, inp, out)
    assert _win_rows(spark, out) == got


def test_windowed_counts_match_batch_for_closed_windows(spark, tmp_path):
    """Every emitted window must equal the batch aggregation over the
    on-time events — same count and same decimal-cast sum."""
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    rows = [
        (i, D0 + _h(i % 20), i % 7, "e" + str(i % 3), float(i) / 3, None)
        for i in range(200)
    ] + [(999, D0 + _d(3), 1, "sentinel", 0.0, None)]
    spark.createDataFrame(rows, schema=EVENTS_SCHEMA).coalesce(2).write.mode(
        "append"
    ).parquet(inp)
    windowed_counts_stream(spark, inp, out)
    batch = (
        spark.read.parquet(inp)
        .filter(F.col("event_type") != "sentinel")
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
    )
    want = sorted(
        (r["day"], r["event_type"], r["n_events"], r["sum_value"])
        for r in batch.collect()
    )
    assert _win_rows(spark, out) == want


def _unique_rows(spark, out):
    path = os.path.join(out, "unique_docs")
    return sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(path).collect()
    )


def test_dedup_stream_bounded_state_and_keyed_backstop(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")

    rows_a = [
        (1, D0, "alpha text"),
        (2, D0 + _h(0.1), "alpha text"),      # in-batch replica: dropped
        (3, D0 + _h(0.2), "beta text"),
    ]
    spark.createDataFrame(rows_a, schema=DOCS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    dedup_stream(spark, inp, out)
    assert _unique_rows(spark, out) == [(1, "alpha text"), (3, "beta text")]

    # batch B: a replica arriving LONG after the digest aged out of the
    # watermark state (ingest_ts jumps 10h > the 1h watermark) — the state
    # store no longer remembers 'alpha text'; the keyed sink must drop it.
    # Plus one genuinely new doc.
    rows_b = [
        (4, D0 + _h(10), "alpha text"),
        (5, D0 + _h(10), "gamma text"),
    ]
    spark.createDataFrame(rows_b, schema=DOCS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    dedup_stream(spark, inp, out)  # restart from checkpoint
    assert _unique_rows(spark, out) == [
        (1, "alpha text"),
        (3, "beta text"),
        (5, "gamma text"),
    ]

    # replay: nothing duplicates
    dedup_stream(spark, inp, out)
    assert len(_unique_rows(spark, out)) == 3


def _attr_rows(spark, out):
    path = os.path.join(out, "attributed")
    return sorted(
        (r["view_id"], r["user_id"], r["click_id"])
        for r in spark.read.parquet(path).collect()
    )


def _write_events(spark, path, rows):
    from docling_rag_spark.streaming.windowed import EVENTS_SCHEMA

    spark.createDataFrame(rows, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_attribution_join_inner_lifecycle(spark, tmp_path):
    """Stream-stream interval join: a click within the 30-minute horizon
    matches its view; a click outside the horizon never does; a LATE
    click arriving in a later micro-batch still matches while the
    watermark keeps the view's join state alive; an idle restart on the
    same checkpoint re-emits nothing."""
    from docling_rag_spark.streaming.windowed import attribution_join_stream

    vdir, cdir, out = (
        str(tmp_path / "views"),
        str(tmp_path / "clicks"),
        str(tmp_path / "out"),
    )
    _write_events(
        spark,
        vdir,
        [
            (10, D0 + _h(1), 1, "view", None, None),
            (11, D0 + _h(1), 2, "view", None, None),
        ],
    )
    _write_events(
        spark,
        cdir,
        [
            (20, D0 + _h(1) + dt.timedelta(minutes=10), 1, "click", 1.0, None),
            # 90 min after user 2's view: outside the horizon, never matches
            (21, D0 + _h(2) + dt.timedelta(minutes=30), 2, "click", 2.0, None),
        ],
    )
    attribution_join_stream(spark, vdir, cdir, out)
    assert _attr_rows(spark, out) == [(10, 1, 20)]

    # late click for user 2, within horizon by EVENT time and above the
    # current watermark — the view's state must still be there to match
    _write_events(
        spark,
        cdir,
        [(22, D0 + _h(1) + dt.timedelta(minutes=15), 2, "click", 3.0, None)],
    )
    attribution_join_stream(spark, vdir, cdir, out)
    assert _attr_rows(spark, out) == [(10, 1, 20), (11, 2, 22)]

    # idle restart: nothing re-emits
    attribution_join_stream(spark, vdir, cdir, out)
    assert _attr_rows(spark, out) == [(10, 1, 20), (11, 2, 22)]


def test_attribution_join_left_outer_null_emission(spark, tmp_path):
    """leftOuter: a view with no click emits its NULL-click attribution
    row exactly once — and only after the watermark PROVES no click can
    arrive (view_ts + horizon + watermark delay passed on both sides);
    a click for that view arriving after the proof is too late and must
    NOT produce a second (now contradictory) row."""
    from docling_rag_spark.streaming.windowed import attribution_join_stream

    vdir, cdir, out = (
        str(tmp_path / "views"),
        str(tmp_path / "clicks"),
        str(tmp_path / "out"),
    )
    _write_events(
        spark,
        vdir,
        [
            (10, D0 + _h(1), 1, "view", None, None),
            (11, D0 + _h(1), 2, "view", None, None),  # never clicked
        ],
    )
    _write_events(
        spark,
        cdir,
        [(20, D0 + _h(1) + dt.timedelta(minutes=5), 1, "click", 1.0, None)],
    )
    attribution_join_stream(spark, vdir, cdir, out, how="leftOuter")
    got = _attr_rows(spark, out)
    assert (10, 1, 20) in got  # the match emits immediately

    # advance BOTH side watermarks far past view_ts + horizon
    _write_events(spark, vdir, [(98, D0 + _d(2), 98, "view", None, None)])
    _write_events(spark, cdir, [(99, D0 + _d(2), 99, "click", 0.0, None)])
    attribution_join_stream(spark, vdir, cdir, out, how="leftOuter")
    got = _attr_rows(spark, out)
    assert (11, 2, None) in got, got  # the no-conversion record
    assert got.count((11, 2, None)) == 1

    # too-late click for view 11: the state is gone and the NULL row is
    # already committed — no new output
    _write_events(
        spark,
        cdir,
        [(23, D0 + _h(1) + dt.timedelta(minutes=10), 2, "click", 9.0, None)],
    )
    attribution_join_stream(spark, vdir, cdir, out, how="leftOuter")
    after = _attr_rows(spark, out)
    assert after == got
