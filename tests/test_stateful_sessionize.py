"""Stateful streaming sessionization: state carries across micro-batches AND
query restarts; closed sessions match the batch operator exactly."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from docling_rag_spark.streaming.sessionize import sessionize_stream

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
T0 = dt.datetime(2024, 3, 1, 9, 0, 0, 123456)


def _mk_events():
    """Two users; gaps engineered around the 30-min threshold. Session
    boundaries by construction:
      user 1: [e1,e2,e3] (gaps 5m, 29m) | [e4] (gap 31m) | [e5,e6] (gap 2m)
      user 2: [e7] | [e8,e9] (gap 45m then 1m)
    The file split lands INSIDE user 1's third session (e5 in file A, e6 in
    file B) — that session must survive the restart boundary un-split.
    """
    m = dt.timedelta(minutes=1)
    rows = [
        (1, T0, 1, "a", 1.0, None),
        (2, T0 + 5 * m, 1, "a", 2.0, None),
        (3, T0 + 34 * m, 1, "b", 3.0, None),
        (4, T0 + 65 * m, 1, "a", 4.0, None),          # gap 31m → new session
        (5, T0 + 120 * m, 1, "c", 5.0, None),         # gap 55m → new session
        (7, T0, 2, "a", 7.0, None),
        (8, T0 + 45 * m, 2, "a", 8.0, None),          # gap 45m → new session
        (12, T0, 3, "a", None, None),                 # user 3: all-NULL values
        (13, T0 + 100 * m, 3, "a", None, None),       # gap 100m → new session
    ]
    rows_b = [
        (6, T0 + 122 * m, 1, "c", 6.0, None),         # continues session 3
        (9, T0 + 46 * m, 2, "b", 9.0, None),          # continues user-2 s2
        (10, T0 + 200 * m, 1, "d", 10.0, None),       # closes user-1 s3
        (11, T0 + 200 * m, 2, "d", 11.0, None),       # closes user-2 s2
        (14, T0 + 200 * m, 3, "d", 1.5, None),        # closes user-3 s2
    ]
    return rows, rows_b


def test_streaming_sessions_match_batch(spark, tmp_path):
    rows_a, rows_b = _mk_events()
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(rows_a, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    sessionize_stream(spark, inp, out)  # run 1
    spark.createDataFrame(rows_b, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    sessionize_stream(spark, inp, out)  # run 2 — a genuine query restart

    got = spark.read.parquet(os.path.join(out, "sessions"))
    streamed = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in got.collect()
    }
    m = dt.timedelta(minutes=1)
    expected_closed = {
        (1, T0, T0 + 34 * m, 3, 6.0),                      # s1 user1
        (1, T0 + 65 * m, T0 + 65 * m, 1, 4.0),             # s2 user1
        (1, T0 + 120 * m, T0 + 122 * m, 2, 11.0),          # s3 spans restart
        (2, T0, T0, 1, 7.0),                               # s1 user2
        (2, T0 + 45 * m, T0 + 46 * m, 2, 17.0),            # s2 spans restart
        (3, T0, T0, 1, None),                              # all-NULL → NULL sum
        (3, T0 + 100 * m, T0 + 100 * m, 1, None),          # (matches batch F.sum)
    }
    assert streamed == expected_closed
    assert all(r["closed_by"] == "gap" for r in got.collect())

    # cross-check against the batch spec on the same events: closed
    # streamed sessions ⊆ batch sessions; the open tails are the remainder
    full = spark.createDataFrame(rows_a + rows_b, schema=EVENTS_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = full.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        (
            F.col("prev_ts").isNull()
            | ((F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")) > 1800)
        ).cast("int"),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    batch_rows = (
        sess.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"), F.count("*").alias("n"))
        .collect()
    )
    batch_set = {(r["user_id"], r["s"], r["e"], r["n"]) for r in batch_rows}
    streamed_sen = {(u, s, e, n) for (u, s, e, n, _v) in streamed}
    assert streamed_sen <= batch_set
    # exactly the three open tails (one per user, at T0+200m) remain un-emitted
    assert len(batch_set - streamed_sen) == 3


def test_idle_session_closes_by_event_time_timeout(spark, tmp_path):
    """VERDICT #10: with event_time_timeout=True an idle user's open session
    is flushed once OTHER users' events advance the watermark past its
    end + gap — values matching the batch spec on the closed prefix."""
    m = dt.timedelta(minutes=1)
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    # file A: idle user 1 (two events, then silence) + user 2 heartbeat
    rows_a = [
        (1, T0, 1, "a", 1.25, None),
        (2, T0 + 1 * m, 1, "a", 2.5, None),
        (3, T0, 2, "hb", 0.0, None),
    ]
    # file B: only user 2 — advances max event time well past T0+31m
    rows_b = [(4, T0 + 120 * m, 2, "hb", 0.0, None)]
    # file C: one more batch so the checkpointed watermark (T0+120m) is
    # APPLIED (timeouts fire against the watermark of the previous batch)
    rows_c = [(5, T0 + 121 * m, 2, "hb", 0.0, None)]
    for rows in (rows_a, rows_b):
        spark.createDataFrame(rows, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
    sessionize_stream(spark, inp, out, event_time_timeout=True)
    spark.createDataFrame(rows_c, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    sessionize_stream(spark, inp, out, event_time_timeout=True)  # restart

    got = spark.read.parquet(os.path.join(out, "sessions")).collect()
    by_user = {(r["user_id"], r["closed_by"]): r for r in got}
    idle = by_user[(1, "timeout")]
    assert idle["session_start"] == T0
    assert idle["session_end"] == T0 + 1 * m
    assert idle["n_events"] == 2
    assert idle["sum_value"] == 3.75


def test_ordered_sessionize_tolerates_out_of_order_arrival(spark, tmp_path):
    """Watermark-buffered reorder (round-2 verdict #3): rows arrive ts-SHUFFLED
    within files and displaced ACROSS micro-batches; closed sessions must
    still equal the batch fold on every session provably closed under the
    final watermark (end + gap < max_ts - delay)."""
    from docling_rag_spark.streaming.sessionize import sessionize_stream_ordered

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    h = dt.timedelta(hours=1)
    gap = dt.timedelta(minutes=30)
    delay = dt.timedelta(hours=4)

    # 2 users x 6 sessions (every 2h), 4 events each (0/5/10/15 min)
    events = []  # (event_id, ts, user_id, value, session_idx)
    eid = 0
    for u in (1, 2):
        for s in range(6):
            for i in range(4):
                eid += 1
                ts = base + s * 2 * h + u * 3 * m + i * 5 * m
                events.append((eid, ts, u, float(u) + s * 0.1 + i * 0.01, s))

    # file k holds sessions {2k, 2k+1}; each session s<=3 DISPLACES its last
    # event into the next file (bounded cross-batch disorder < delay), and
    # every file is written in reverse-ts order (intra-batch disorder)
    files: list[list] = [[], [], []]
    for e, ts, u, v, s in events:
        k = s // 2
        is_last = (e - 1) % 4 == 3
        if is_last and s <= 3:
            k += 1
        files[k].append((e, ts, u, "a", v, None))
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    for k, rows in enumerate(files):
        rows.sort(key=lambda r: r[1], reverse=True)
        spark.createDataFrame(rows, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    sessionize_stream_ordered(spark, inp, out, watermark_delay="4 hours")

    # expected: python fold of the fully ordered stream, restricted to
    # sessions provably closed under the final watermark
    max_ts = max(ts for _e, ts, _u, _v, _s in events)
    final_wm = max_ts - delay
    expected = set()
    for u in (1, 2):
        evs = sorted((ts, v) for _e, ts, uu, v, _s in events if uu == u)
        cur = None
        sessions = []
        for ts, v in evs:
            if cur is None or ts - cur[1] > gap:
                if cur is not None:
                    sessions.append(cur)
                cur = [ts, ts, 1, v]
            else:
                cur[1], cur[2], cur[3] = ts, cur[2] + 1, round(cur[3] + v, 6)
        if cur is not None:
            sessions.append(cur)
        for st, en, n, sv in sessions:
            if en + gap < final_wm:
                expected.add((u, st, en, n, round(sv, 4)))

    got_rows = spark.read.parquet(os.path.join(out, "sessions")).collect()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["sum_value"], 4))
        for r in got_rows
    }
    assert len(got_rows) == len(got)  # no duplicate emissions
    assert got == expected
    assert len(expected) == 6  # sanity: 3 provably-closed sessions per user


def test_ordered_sessionize_emits_closed_session_despite_buffered_tail(
    spark, tmp_path
):
    """Round-3 advice: when the stream ENDS with events buffered beyond the
    watermark, an earlier open session whose end+gap is below the final
    watermark must still be emitted (closed_by='timeout'). The old `not
    rest` guard withheld it forever."""
    from docling_rag_spark.streaming.sessionize import sessionize_stream_ordered

    base = dt.datetime(2026, 2, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    h = dt.timedelta(hours=1)
    rows_a = [
        (1, base, 1, "a", 1.0, None),
        (2, base + 10 * m, 1, "a", 2.0, None),
    ]
    # a single far-future event: final watermark = base+10h-1h = base+9h,
    # which is PAST sessionA.end+gap (base+40m) but BEFORE this event — so
    # it stays buffered ("rest") when the stream ends
    rows_b = [(3, base + 10 * h, 1, "a", 3.0, None)]
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    for rows in (rows_a, rows_b):
        spark.createDataFrame(rows, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
    sessionize_stream_ordered(spark, inp, out, watermark_delay="1 hour")

    got = spark.read.parquet(os.path.join(out, "sessions")).collect()
    assert {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["sum_value"], r["closed_by"])
        for r in got
    } == {(1, base, base + 10 * m, 2, 3.0, "timeout")}
