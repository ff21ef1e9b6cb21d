"""Stateful streaming sessionization — applyInPandasWithState.

The streaming counterpart of operators/temporal.sessionize_events: gap-based
sessions over an unbounded event stream, with per-user state carried across
micro-batches (the prompt's "applyInPandasWithState for custom stateful
operators"). A session CLOSES when a later event arrives past the gap; closed sessions
are emitted, the open session stays in state across micro-batches.

Semantics match the batch operator for any prefix of the stream in which
events arrive in user-time order (the test feeds files in ts order), and the
value sum matches bit-for-bit: the state accumulates integer MICRO-UNITS of
the decimal(18,6) cast the batch operator applies (never binary floats), and
an all-NULL session emits a NULL sum exactly like batch F.sum.

Idle-session flush: with ``event_time_timeout=True`` the query adds a
watermark and an EventTimeTimeout — a session whose (end + gap) falls behind
the watermark is emitted with ``closed_by='timeout'`` even if its user never
sends another event. ProcessingTimeTimeout is deliberately NOT used —
combined with Trigger.AvailableNow it makes the query spin empty
micro-batches until the timeout fires (observed: 200+ epochs), since
AvailableNow keeps scheduling batches while timed-out state is pending.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal
from functools import partial
from typing import TYPE_CHECKING, Any

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.temporal import SESSION_GAP_MIN

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double, closed_by string"
)
STATE_SCHEMA = (
    "session_start long, session_end long, n_events long, "
    "sum_micros long, has_value boolean"
)
GAP_SEC = SESSION_GAP_MIN * 60

_MICRO = Decimal("0.000001")
_OUT_SCALE = Decimal("0.0001")


def _value_micros(value) -> int | None:
    """Mirror the batch cast(value as decimal(18,6)): Spark's double→decimal
    goes through the double's shortest string representation then HALF_UP to
    scale 6 — identical to Decimal(repr(v)).quantize here. Returns integer
    micro-units (exact), None for NULL."""
    import pandas as pd

    if pd.isna(value):
        return None
    return int(
        Decimal(repr(float(value))).quantize(_MICRO, rounding=ROUND_HALF_UP)
        * 1_000_000
    )


def _sum_value(sum_micros: int, has_value: bool) -> float | None:
    """round(sum::decimal, 4)::double of the batch operator; NULL when every
    event value was NULL (batch F.sum skips nulls, returns null on empty)."""
    if not has_value:
        return None
    return float(
        (Decimal(sum_micros) * _MICRO).quantize(_OUT_SCALE, rounding=ROUND_HALF_UP)
    )


def _sessionize_fn(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState,
    use_timeout: bool = False,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    (user_id,) = key

    def _rows(closed: list) -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [_sum_value(c[3], c[4]) for c in closed],
                "closed_by": [c[5] for c in closed],
            }
        )

    if use_timeout and state.hasTimedOut:
        # watermark passed (session_end + gap): flush the idle session
        cur = list(state.get)
        state.remove()
        yield _rows([(*cur, "timeout")])
        return

    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    # state carries MICROSECOND epochs (int) — second-truncation would make
    # streamed session bounds diverge from the batch operator's timestamps
    cur: list[Any] | None = list(state.get) if state.exists else None
    closed = []
    for ts, value in zip(rows["ts"], rows["value"]):
        t = int(pd.Timestamp(ts).value // 1_000)  # epoch µs
        mv = _value_micros(value)
        if cur is None:
            cur = [t, t, 1, mv or 0, mv is not None]
        elif t - cur[1] > GAP_SEC * 1_000_000:
            closed.append((*cur, "gap"))
            cur = [t, t, 1, mv or 0, mv is not None]
        else:
            cur[1] = t
            cur[2] += 1
            if mv is not None:
                cur[3] += mv
                cur[4] = True
    if cur is not None:
        state.update(tuple(cur))
        if use_timeout:
            # event-time timeout in ms: fire when watermark > end + gap
            state.setTimeoutTimestamp(cur[1] // 1000 + GAP_SEC * 1000)
    if closed:
        yield _rows(closed)


def sessionize_stream(
    spark, input_dir: str, out_dir: str, event_time_timeout: bool = False,
    watermark_delay: str = "0 seconds",
) -> None:
    """File-source event stream → closed sessions parquet (AvailableNow).

    ``event_time_timeout=True`` additionally closes idle sessions once the
    watermark (max event time across ALL users, minus ``watermark_delay``)
    passes their end + gap; the NoTimeout default emits only gap-closed
    sessions (exact batch-prefix semantics)."""
    events_schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file → state
        .format("parquet")                # genuinely carries across batches
        .load(input_dir)
    )
    if event_time_timeout:
        stream = stream.withWatermark("ts", watermark_delay)
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        partial(_sessionize_fn, use_timeout=event_time_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if event_time_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
