"""Stateful streaming sessionization — applyInPandasWithState.

The streaming counterpart of operators/temporal.sessionize_events: gap-based
sessions over an unbounded event stream, with per-user state carried across
micro-batches (the prompt's "applyInPandasWithState for custom stateful
operators"). A session CLOSES when a later event arrives past the gap; closed sessions
are emitted, the open session stays in state across micro-batches.

Semantics match the batch operator for any prefix of the stream in which
events arrive in user-time order (the test feeds files in ts order).
Production notes: a long-running query would add a watermark + EventTime
timeout to flush idle sessions; ProcessingTimeTimeout is deliberately NOT
used — combined with Trigger.AvailableNow it makes the query spin empty
micro-batches until the timeout fires (observed: 200+ epochs), since
AvailableNow keeps scheduling batches while timed-out state is pending.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
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
    "session_start long, session_end long, n_events long, sum_value double"
)
GAP_SEC = SESSION_GAP_MIN * 60


def _sessionize_fn(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    (user_id,) = key
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    # state carries MICROSECOND epochs (int) — second-truncation would make
    # streamed session bounds diverge from the batch operator's timestamps
    cur: list[Any] | None = list(state.get) if state.exists else None
    closed = []
    for ts, value in zip(rows["ts"], rows["value"]):
        t = int(pd.Timestamp(ts).value // 1_000)  # epoch µs
        # pd.isna, not `value or 0.0`: NaN is truthy and would poison the
        # session sum (batch F.sum skips nulls)
        v = 0.0 if pd.isna(value) else float(value)
        if cur is None:
            cur = [t, t, 1, v]
        elif t - cur[1] > GAP_SEC * 1_000_000:
            closed.append((*cur, "gap"))
            cur = [t, t, 1, v]
        else:
            cur[1] = t
            cur[2] += 1
            cur[3] += v
    if cur is not None:
        state.update(tuple(cur))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [round(c[3], 4) for c in closed],
                "closed_by": [c[4] for c in closed],
            }
        )


def sessionize_stream(spark, input_dir: str, out_dir: str) -> None:
    """File-source event stream → closed sessions parquet (AvailableNow)."""
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
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
