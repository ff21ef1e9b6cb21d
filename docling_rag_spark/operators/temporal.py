"""Temporal operators Spark lacks natively: as-of join and sessionization.

The reference has neither (SURVEY.md §2.4: "no as-of/range/interval joins")
— these are the prompt-mandated custom-operator showcases, built as
compositions of existing DataFrame ops (option (a) of the custom-operator
ladder), with exact DuckDB oracles (ASOF JOIN / window SQL).

Scale notes:
- as-of: the union-tag trick turns a range join into ONE shuffle on the key
  + a running last_value window — no O(n·m) range explosion, no skew beyond
  the key distribution (AQE handles that).
- sessionize: lag + cumulative-sum windows over (user_id, ts) — one shuffle,
  all codegen. The streaming variant (applyInPandasWithState) lives in
  streaming/sessionize.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import table

SESSION_GAP_MIN = 30


def asof_join_orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each order: the customer's latest event with ts <= o_orderdate
    (users keyed by o_custkey % 100 = user_id — the sandbox tables share no
    real key, so the mapping is part of the frozen query spec).

    Implementation: tag both sides, union on (key, time), then
    last_value(event over rows-unbounded-preceding) per key ordered by
    (time, is_order) — each order row reads the running latest event.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 100).alias("user_id"),
        F.col("o_orderdate").alias("t"),
    )
    events = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").alias("t"), "event_id", "event_type"
    )
    tagged = events.select(
        "user_id", "t", F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "event_id", "event_type",
    ).unionByName(
        orders.select(
            "user_id", "t", F.lit(1).alias("is_order"), "o_orderkey",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("string").alias("event_type"),
        )
    )
    # events sort before orders at identical t (is_order asc) → "<=" semantics;
    # among simultaneous events the larger event_id wins (deterministic).
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_order", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = tagged.withColumn(
        "last_event_id", F.last("event_id", ignorenulls=True).over(w)
    ).withColumn("last_event_type", F.last("event_type", ignorenulls=True).over(w))
    return (
        joined.filter(F.col("is_order") == 1)
        .select(
            "o_orderkey",
            "user_id",
            F.col("last_event_id").alias("event_id"),
            F.col("last_event_type").alias("event_type"),
        )
    )


# DuckDB oracle: same union-window formulation (portable, no ASOF-JOIN
# tie-break ambiguity — the spec above IS the semantics)
ASOF_SQL = """
with tagged as (
  select user_id, ts as t, 0 as is_order,
         null::bigint as o_orderkey, event_id, event_type
  from events
  union all
  select o_custkey % 100 as user_id, o_orderdate as t, 1 as is_order,
         o_orderkey, null::bigint as event_id, null::varchar as event_type
  from orders
),
run as (
  select *,
         last_value(event_id ignore nulls) over (
           partition by user_id order by t, is_order, event_id
           rows between unbounded preceding and current row) as last_event_id,
         last_value(event_type ignore nulls) over (
           partition by user_id order by t, is_order, event_id
           rows between unbounded preceding and current row) as last_event_type
  from tagged
)
select o_orderkey, user_id, last_event_id as event_id,
       last_event_type as event_type
from run where is_order = 1
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions: a new session starts when the user's inter-event
    gap exceeds SESSION_GAP_MIN minutes. session_id = cumulative count of
    session starts per user; output one row per session with bounds/size."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap in MICROSECONDS: unix_timestamp() truncates to seconds, which
    # would diverge from the DuckDB oracle (fractional epoch) and the
    # streaming operator (µs state) on sub-second-precision timestamps
    marked = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        (
            F.col("prev_ts").isNull()
            | (
                # NTZ→timestamp cast: unix_micros rejects TIMESTAMP_NTZ; the
                # session-TZ shift cancels in the difference
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                )
                > SESSION_GAP_MIN * 60 * 1_000_000
            )
        ).cast("int"),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("sum_value"),
    )


SESSIONIZE_SQL = f"""
with marked as (
  select *,
         case when lag(ts) over (partition by user_id order by ts, event_id)
                   is null
              or epoch_us(ts) - epoch_us(lag(ts) over (partition by user_id
                                                       order by ts, event_id))
                 > {SESSION_GAP_MIN * 60 * 1_000_000}
              then 1 else 0 end as new_session
  from events
),
sess as (
  select *,
         -- cast: DuckDB windowed sum(int) is HUGEINT -> float64 in pandas;
         -- Spark's is int64
         cast(sum(new_session) over (partition by user_id order by ts, event_id
                                     rows between unbounded preceding
                                     and current row) as bigint) as session_id
  from marked
)
select user_id, session_id,
       min(ts) as session_start, max(ts) as session_end,
       count(*) as n_events,
       round(sum(value::decimal(18,6)), 4)::double as sum_value
from sess group by user_id, session_id
"""

# --------------------------------------------------------------------------
# range join: for each event, the same user's FOLLOWING events within
# RANGE_HOURS (the session-neighborhood query). Spark has no native range
# join; the naive theta join is O(n·m) per user. Scale-safe shape:
# time-bucket both sides at the window width — the probe side explodes to
# the ≤2 buckets its window overlaps, the join is a plain equi-join on
# (user_id, bucket), and the exact range predicate filters the candidates.
# Each build-side event lives in exactly ONE bucket, so no pair can match
# twice (no distinct needed). At 100 TB both sides shuffle once on
# (user_id, bucket) — bounded fan-out, AQE handles residual skew.
# --------------------------------------------------------------------------
RANGE_HOURS = 6
_RANGE_US = RANGE_HOURS * 3_600 * 1_000_000


def range_join_event_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("te"),
    )
    build = ev.select(
        "user_id",
        F.col("event_id").alias("next_event_id"),
        F.col("event_type").alias("next_event_type"),
        F.col("te").alias("tn"),
    ).withColumn("bucket", F.floor(F.col("tn") / _RANGE_US))
    probes = ev.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.col("te") / _RANGE_US),
                F.floor(F.col("te") / _RANGE_US) + 1,
            )
        ),
    )
    return (
        probes.join(build, ["user_id", "bucket"])
        .filter(
            (F.col("next_event_id") != F.col("event_id"))
            & (F.col("tn") >= F.col("te"))
            & (F.col("tn") < F.col("te") + _RANGE_US)
        )
        .select("user_id", "event_id", "next_event_id", "next_event_type")
    )


# oracle: the plain inequality join (DuckDB plans it natively) —
# result-set equality proves the bucketed rewrite is lossless
RANGE_JOIN_SQL = f"""
select a.user_id, a.event_id, b.event_id as next_event_id,
       b.event_type as next_event_type
from events a join events b
  on a.user_id = b.user_id and b.event_id != a.event_id
 and epoch_us(b.ts) >= epoch_us(a.ts)
 and epoch_us(b.ts) < epoch_us(a.ts) + {_RANGE_US}
"""

# --------------------------------------------------------------------------
# Distributed percentiles (round 6): exact-at-quantization order statistics
# over an unbounded numeric column — the scale-correct alternative to
# Spark's exact `percentile` aggregate, whose per-group buffer holds every
# value of the group in one task (a corpus-sized group = an OOM, the same
# reason the suite bans unbounded windows). Here the values fold into a
# CLAMPED 0.01-wide histogram first (groupBy(event_type, qv) —
# map-combined, structurally ≤ types × PCTL_QB_MAX+1 cells), the
# cumulative window runs over those bounded cells (the token_budget /
# ccnet discipline), and each percentile is the lower bound of the first
# cell whose cumulative count covers it. Threshold tests are exact
# integer comparisons (2·cum ≥ n, 20·cum ≥ 19·n, 100·cum ≥ 99·n), so the
# engines can never disagree on a boundary; the contract is "exact to the
# cell" (±0.01) WITHIN the saturating window [PCTL_QB_MIN, PCTL_QB_MAX]/Q
# = [−1000, 1000] — values outside it land in the boundary cells (the
# HDR-histogram convention: a saturated percentile reads exactly ±1000.0,
# which is the honest "at or beyond the window edge" answer, never a
# silently-wrong interior value). approx_percentile promises the same ε
# class — but non-deterministically and without a DuckDB-checkable
# oracle. NULL values ride the histogram as zero-count cells (the
# identical-subtree rule), never a filter; a NULL-only group reports
# n_values = 0 and NULL percentiles.
# --------------------------------------------------------------------------
PCTL_Q = 100
PCTL_QB_MAX = 100_000
PCTL_QB_MIN = -100_000


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_percentiles_frame(table(spark, sf_dir, "events"))


def value_percentiles_frame(ev: DataFrame) -> DataFrame:
    """Core over any (event_type, value) frame — split from the sf_dir
    entry point so tests can plant negative / out-of-window values."""
    qv = F.when(
        F.col("value").isNotNull(),
        F.least(
            F.greatest(
                F.floor(F.col("value") * PCTL_Q).cast("bigint"),
                F.lit(PCTL_QB_MIN),
            ),
            F.lit(PCTL_QB_MAX),
        ),
    )
    hist = (
        ev.select("event_type", qv.alias("qv"))
        .groupBy("event_type", "qv")
        .agg(
            F.sum(
                F.when(F.col("qv").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("cnt")
        )
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("qv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hc = hist.select(
        "event_type",
        "qv",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )

    def cell(cond):
        return F.min(F.when(F.col("qv").isNotNull() & cond, F.col("qv")))

    return hc.groupBy("event_type").agg(
        F.max("n").alias("n_values"),
        (cell(2 * F.col("cum") >= F.col("n")) / F.lit(float(PCTL_Q))).alias(
            "p50"
        ),
        (
            cell(20 * F.col("cum") >= 19 * F.col("n")) / F.lit(float(PCTL_Q))
        ).alias("p95"),
        (
            cell(100 * F.col("cum") >= 99 * F.col("n"))
            / F.lit(float(PCTL_Q))
        ).alias("p99"),
    )


EVENT_PERCENTILES_SQL = f"""
with q as (
  select event_type,
         case when value is not null then
           least(greatest(cast(floor(value * {PCTL_Q}) as bigint),
                          {PCTL_QB_MIN}),
                 {PCTL_QB_MAX}) end as qv
  from events
),
hist as (
  select event_type, qv,
         sum(case when qv is not null then 1 else 0 end)::bigint as cnt
  from q group by 1, 2
),
hc as (
  select *,
         sum(cnt) over (partition by event_type order by qv
           rows between unbounded preceding and current row)::bigint as cum,
         sum(cnt) over (partition by event_type)::bigint as n
  from hist
)
select event_type, max(n)::bigint as n_values,
       min(case when qv is not null and 2 * cum >= n then qv end)
         / {PCTL_Q}.0 as p50,
       min(case when qv is not null and 20 * cum >= 19 * n then qv end)
         / {PCTL_Q}.0 as p95,
       min(case when qv is not null and 100 * cum >= 99 * n then qv end)
         / {PCTL_Q}.0 as p99
from hc group by event_type
"""

QUERIES = {
    "asof_join": asof_join_orders_events,
    "sessionize_events": sessionize_events,
    "range_join": range_join_event_neighbors,
}
ORACLES = {
    "asof_join": ASOF_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "range_join": RANGE_JOIN_SQL,
}
EXTRA_QUERIES = {
    "event_percentiles": event_value_percentiles,
}
EXTRA_ORACLES = {
    "event_percentiles": EVENT_PERCENTILES_SQL,
}
