"""Event-stream batch operator family over the `events` table: gaps-and-
islands sessionization, interval (1-D range) join via a time-bucket
stencil, exact grouped order statistics, pivot/wide reshape, and the
ordered conversion funnel.

These are the batch twins of the reference's incremental/watch loop
shapes (SURVEY §2.5/§2.10; ref watch loop 06:40-86 re-aggregates per
tick) generalized to the operators any event pipeline needs. Each query
is oracle-paired; the oracles use structurally different DuckDB plans
where possible.

Monetary/metric doubles are compared as integer cents
(``floor(value*100 + 0.5)`` — identical FP op order on both sides, see
memory note on driver-gate hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .sources import derived

# -- shared constants (mirrored literally in the DuckDB oracles) --------
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-min inactivity ends a session

# intervals: K windows of length 30 min, pitch 2 h, offset 15 min past
# the epoch-aligned grid (so every interval straddles exactly two
# 30-min stencil cells — the general, unaligned case).
T0_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros
IV_K = 400
IV_PITCH_US = 7_200_000_000
IV_OFFSET_US = 900_000_000
IV_LEN_US = 1_800_000_000
CELL_US = IV_LEN_US  # stencil cell width = max interval length

QUANTILES = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    derived.load_testdata(spark, sf_dir)
    return spark.table("events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        (F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)))
        .cast("bigint")
        .alias("val_e2"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization (gaps-and-islands): a session ends after
    SESSION_GAP_US of inactivity. Batch twin of the streaming
    applyInPandasWithState sessionizer (streaming/stateful.py), with an
    exact SQL oracle the stateful path can't have.

    Scale shape: ONE shuffle total. The lag/cumsum windows hash-partition
    on user_id; the closing groupBy(user_id, session_idx) is then
    shuffle-FREE because HashPartitioning(user_id) already satisfies
    ClusteredDistribution(user_id, session_idx) — plan-asserted in
    tests/test_perf_plans.py. Sessions are never buffered whole: both
    window frames are running (lag-1 / cumulative sum), so memory per
    task is O(1) beyond the sort.
    """
    ev = _events_us(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        "val_e2",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > F.lit(SESSION_GAP_US)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    )
    sessed = flagged.select(
        "user_id",
        "ts_us",
        "val_e2",
        F.sum("new_sess")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("session_idx"),
    )
    return sessed.groupBy("user_id", "session_idx").agg(
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("val_e2").alias("sum_value_e2"),
    )


def _intervals(spark: SparkSession) -> DataFrame:
    return spark.range(IV_K).select(
        F.col("id").alias("interval_id"),
        (F.lit(T0_US) + F.col("id") * F.lit(IV_PITCH_US) + F.lit(IV_OFFSET_US)).alias(
            "start_us"
        ),
        (F.col("id") % 3).alias("severity"),
    )


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (1-D range) join: count/sum events falling inside K
    deterministic maintenance windows. Spark has no RANGE JOIN operator
    and the naive θ-join is a BroadcastNestedLoop; the scale-correct
    formulation is the 1-D analog of geo/cells.disc_stencil: bucket time
    into cells of width = max interval length, explode each interval to
    the ≤2 cells it overlaps, EQUI-join on the cell, and keep the exact
    bounds as a residual filter. Intervals are tiny → broadcast; with a
    large interval table the same plan becomes a hash join on the cell
    key (still no quadratic blowup: each event meets only the intervals
    sharing its cell).

    The DuckDB oracle is structurally different: non-overlapping
    intervals mean each event has at most ONE candidate k, derived in
    closed form — an equality join on that candidate (never a bare
    inequality join: DuckDB 1.0 IEJoin livelock, FIXTURES.md).
    """
    from .operators.intervals import interval_join

    ev = _events_us(spark, sf_dir)
    iv = _intervals(spark)
    hits = interval_join(
        ev, iv, len_us=IV_LEN_US, cell_us=CELL_US, hint_broadcast=True
    )
    return hits.groupBy("interval_id", "severity").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("val_e2").alias("sum_value_e2"),
    )


def q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped order statistics (percentile_disc-lower p50/p90/p99
    of the event value per event_type) via rank selection: row_number
    against floor((n-1)·q). Deterministic tie-break on event_id.

    Scale shape: ONE shuffle (the rank window on event_type); the closing
    groupBy(event_type) reuses the partitioning. The full per-group sort
    is inherent to EXACT quantiles — at 100 TB with huge groups you'd
    swap in approx_percentile (t-digest) and lose the oracle; this query
    is the exact baseline that validates it.
    """
    ev = _events_us(spark, sf_dir)
    wo = W.partitionBy("event_type").orderBy("val_e2", "event_id")
    wp = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "val_e2",
        (F.row_number().over(wo) - 1).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for label, q in QUANTILES:
        idx = F.floor((F.col("cnt") - 1).cast("double") * F.lit(q)).cast("bigint")
        aggs.append(
            F.max(F.when(F.col("rn") == idx, F.col("val_e2"))).alias(f"{label}_e2")
        )
    return ranked.groupBy("event_type").agg(*aggs)


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide reshape: daily event counts pivoted to one column per type.
    The pivot values are EXPLICIT (EVENT_TYPES) so Spark skips the extra
    distinct-scan job it otherwise runs to discover them — at 100 TB that
    implicit first pass doubles the read. One shuffle on the groupBy key;
    pivot itself is a pure map-side projection of the aggregate."""
    derived.load_testdata(spark, sf_dir)
    ev = spark.table("events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    )
    wide = (
        ev.groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("day")]
    total = None
    for t in EVENT_TYPES:
        c = F.coalesce(F.col(t), F.lit(0)).cast("bigint")
        cols.append(c.alias(f"n_{t}"))
        total = c if total is None else total + c
    cols.append(total.alias("n_total"))
    return wide.select(*cols)


# ---------------------------------------------------------------------
# DuckDB oracles (dialect notes: e-notation doubles, `//` int division,
# CAST sums to BIGINT, ROWS frame spelled out, FILTER for pivot).
# ---------------------------------------------------------------------

ORACLE: dict[str, str] = {}

ORACLE["events_sessionize"] = f"""
WITH b AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100.0e0 + 0.5e0) AS BIGINT) AS val_e2
  FROM events
), m AS (
  SELECT user_id, ts_us, event_id, val_e2,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM b
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), s AS (
  SELECT user_id, ts_us, val_e2,
         CAST(sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_idx
  FROM m
)
SELECT user_id, session_idx,
       min(ts_us) AS start_us, max(ts_us) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(val_e2) AS BIGINT) AS sum_value_e2
FROM s GROUP BY user_id, session_idx
"""

# equality join on the closed-form candidate interval (non-overlapping
# pitch > length guarantees at most one k per event); bounds kept as a
# residual. NEVER a bare-inequality join (IEJoin livelock).
ORACLE["events_range_join"] = f"""
WITH iv AS (
  SELECT CAST(k AS BIGINT) AS interval_id,
         {T0_US} + CAST(k AS BIGINT) * {IV_PITCH_US} + {IV_OFFSET_US} AS start_us,
         CAST(k AS BIGINT) % 3 AS severity
  FROM range(0, {IV_K}) t(k)
), ev AS (
  SELECT epoch_us(ts) AS ts_us,
         CAST(floor(value * 100.0e0 + 0.5e0) AS BIGINT) AS val_e2,
         CASE WHEN epoch_us(ts) >= {T0_US} + {IV_OFFSET_US}
              THEN (epoch_us(ts) - {T0_US} - {IV_OFFSET_US}) // {IV_PITCH_US}
              ELSE -1 END AS k_cand
  FROM events
)
SELECT iv.interval_id, iv.severity,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(ev.val_e2) AS BIGINT) AS sum_value_e2
FROM ev JOIN iv ON iv.interval_id = ev.k_cand
WHERE ev.ts_us >= iv.start_us AND ev.ts_us < iv.start_us + {IV_LEN_US}
GROUP BY iv.interval_id, iv.severity
"""

_Q_SEL = ",\n       ".join(
    f"CAST(max(CASE WHEN rn = CAST(floor(CAST(cnt - 1 AS DOUBLE) * {q:.17e}) AS BIGINT)"
    f" THEN val_e2 END) AS BIGINT) AS {label}_e2"
    for label, q in QUANTILES
)
ORACLE["events_quantiles"] = f"""
WITH b AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100.0e0 + 0.5e0) AS BIGINT) AS val_e2
  FROM events
), r AS (
  SELECT event_type, val_e2,
         row_number() OVER (PARTITION BY event_type ORDER BY val_e2, event_id) - 1 AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM b
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       {_Q_SEL}
FROM r GROUP BY event_type
"""

_P_SEL = ",\n       ".join(
    f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
    for t in EVENT_TYPES
)
ORACLE["events_pivot"] = f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       {_P_SEL},
       CAST(count(*) AS BIGINT) AS n_total
FROM events GROUP BY 1
"""

QUERIES = {
    "events_sessionize": q_events_sessionize,
    "events_range_join": q_events_range_join,
    "events_quantiles": q_events_quantiles,
    "events_pivot": q_events_pivot,
}


FUNNEL_STEPS = ("signup", "click", "purchase")


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (sequential pattern matching): per user, the
    earliest signup, the earliest click AT OR AFTER that signup, and the
    earliest purchase at or after that click — the classic conversion
    funnel, with per-user step timestamps (null = fell out).

    Scale shape: ONE scan, ONE shuffle. The three step refinements are
    chained UNORDERED windows over the same user_id partitioning (each
    conditional min reads the previous step's column, so they stack on a
    single exchange with no sort — an unordered window frame is the
    whole partition), and the closing groupBy(user_id) reuses that
    partitioning too (plan-asserted). The naive formulation — aggregate,
    join back, re-aggregate, twice — scans the events table three times;
    at 100 TB the rescans are the whole cost. The DuckDB oracle IS that
    naive three-stage join-back refinement: structurally different plan,
    same answer."""
    ev = _events_us(spark, sf_dir).select("user_id", "event_type", "ts_us")
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "t1",
        F.min(
            F.when(F.col("event_type") == FUNNEL_STEPS[0], F.col("ts_us"))
        ).over(w),
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STEPS[1])
                & (F.col("ts_us") >= F.col("t1")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STEPS[2])
                & (F.col("ts_us") >= F.col("t2")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    return (
        s3.groupBy("user_id")
        .agg(
            F.max("t1").alias("t1"),
            F.max("t2").alias("t2"),
            F.max("t3").alias("t3"),
        )
        .filter(F.col("t1").isNotNull())
    )


ORACLE["events_funnel"] = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), s1 AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts_us END) AS t1
  FROM ev GROUP BY user_id
), s2 AS (
  SELECT ev.user_id, max(s1.t1) AS t1,
         min(CASE WHEN ev.event_type = 'click' AND ev.ts_us >= s1.t1
                  THEN ev.ts_us END) AS t2
  FROM ev JOIN s1 ON ev.user_id = s1.user_id GROUP BY ev.user_id
), s3 AS (
  SELECT ev.user_id, max(s2.t1) AS t1, max(s2.t2) AS t2,
         min(CASE WHEN ev.event_type = 'purchase' AND ev.ts_us >= s2.t2
                  THEN ev.ts_us END) AS t3
  FROM ev JOIN s2 ON ev.user_id = s2.user_id GROUP BY ev.user_id
)
SELECT user_id, t1, t2, t3 FROM s3 WHERE t1 IS NOT NULL
"""

QUERIES["events_funnel"] = q_events_funnel


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by their first-activity
    day (the cohort), counted on each subsequent day they return —
    (cohort_day, day_offset, n_users), the matrix every growth dashboard
    plots.

    Scale shape (r6, the r5 verdict's #2 fix): ONE shuffle on user_id —
    ``groupBy(user_id).agg(collect_set(day))`` dedups user-days map-side
    (partial collect_set), the cohort is ``array_min(days)`` computed
    before the days array is exploded back to rows, and the final count
    re-shuffles only the ~|cohorts × offsets| aggregate. No join, no
    window sort, and crucially no broadcast of a per-USER table (users
    are unbounded: at 10^9 users the old ``F.broadcast(cohorts)`` hint
    was a guaranteed driver/executor OOM that AQE could not override).
    The per-user array is bounded by the calendar (distinct DAYS a user
    was active), not by event volume."""
    ev = _events_us(spark, sf_dir).select(
        "user_id", F.expr(f"ts_us DIV {86_400_000_000}").alias("day")
    )
    per_user = ev.groupBy("user_id").agg(F.collect_set("day").alias("_days"))
    return (
        per_user.select(
            F.array_min("_days").alias("cohort_day"),
            F.explode("_days").alias("day"),
        )
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ORACLE["events_retention"] = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), c AS (
  SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id
)
SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud JOIN c ON ud.user_id = c.user_id
GROUP BY c.cohort_day, ud.day - c.cohort_day
"""

QUERIES["events_retention"] = q_events_retention
