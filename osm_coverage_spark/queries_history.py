"""History/time-series query family over the derived `history` table
(name, date ISO-string, total, missing, corrections — from `events`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import history as H
from .sources import derived

TOPK_DAYS = 7
TOPK_K = 10


def _history(spark: SparkSession, sf_dir: str) -> DataFrame:
    derived.register_derived_views(spark, sf_dir)
    return spark.table("history")


def q_history_topk_improvers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return H.topk_improvers(_history(spark, sf_dir), days=TOPK_DAYS, k=TOPK_K)


def q_history_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return H.lag_delta(_history(spark, sf_dir))


def q_history_retro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retro-propagation with a deterministic synthetic delta per name
    (as if the current run's corrections count moved by len(name)%3+1)."""
    hist = _history(spark, sf_dir)
    deltas = (
        hist.select("name")
        .distinct()
        .withColumn(
            "delta_corrections", (F.length("name") % 3 + 1).cast("bigint")
        )
    )
    return H.retro_propagate(hist, deltas).select(
        "name", "date", "total", "missing", "corrections", "coverage"
    )


def q_history_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """--adjust-history variant: deterministic synthetic 'current run' for
    HALF the names (length(name)%2=0 — the other half must pass through
    untouched, as the reference leaves un-run districts' history intact);
    shifts total by len%5-2, missing by len%4-1, corrections by len%3;
    all past rows of adjusted names absorb the corrections delta (clamped)
    plus the residual total/missing shift (unclamped), coverage recomputed."""
    hist = _history(spark, sf_dir)
    latest = hist.filter(F.length("name") % 2 == 0).groupBy("name").agg(
        F.max_by("total", "date").alias("total"),
        F.max_by("missing", "date").alias("missing"),
        F.max_by("corrections", "date").alias("corrections"),
    )
    new_entries = latest.select(
        "name",
        (F.col("total") + F.length("name") % 5 - 2).alias("total"),
        (F.col("missing") + F.length("name") % 4 - 1).alias("missing"),
        (F.col("corrections") + F.length("name") % 3).alias("corrections"),
    )
    return H.adjust_history(hist, new_entries).select(
        "name", "date", "total", "missing", "corrections", "coverage"
    )


def q_history_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE shape: overwrite each name's latest entry + append one new
    date; both batches synthesized deterministically from the table."""
    hist = _history(spark, sf_dir)
    latest = hist.groupBy("name").agg(
        F.max("date").alias("date"),
        F.max_by("total", "date").alias("total"),
        F.max_by("missing", "date").alias("missing"),
        F.max_by("corrections", "date").alias("corrections"),
    )
    overwrite = latest.withColumn(
        "missing", F.greatest(F.col("missing") - 1, F.lit(0))
    )
    append = latest.withColumn("date", F.lit("2099-01-01")).withColumn(
        "total", F.col("total") + 5
    )
    new_entries = overwrite.unionByName(append).select(
        "name", "date", "total", "missing", "corrections"
    )
    return H.upsert_history(
        hist.select("name", "date", "total", "missing", "corrections"), new_entries
    )


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def _prelude() -> str:
    return derived.oracle_prelude_history()


ORACLE: dict[str, str] = {}

ORACLE["history_topk_improvers"] = f"""{_prelude()},
latest AS (
  SELECT name,
         max(date) AS latest_date,
         max_by(missing, date) AS latest_missing,
         min(date) AS oldest_date,
         min_by(missing, date) AS oldest_missing,
         count(*) AS n_entries
  FROM history GROUP BY name
),
tgt AS (
  SELECT *, CAST(CAST(latest_date AS DATE) - {TOPK_DAYS} AS STRING) AS target_date
  FROM latest
),
past AS (
  SELECT t.name, t.latest_missing, t.oldest_missing, t.n_entries,
         min_by(h.missing, h.date) FILTER (WHERE h.date >= t.target_date)
           AS past_missing_window
  FROM tgt t JOIN history h ON h.name = t.name
  GROUP BY t.name, t.latest_missing, t.oldest_missing, t.n_entries
)
SELECT name,
       CAST(coalesce(past_missing_window, oldest_missing) - latest_missing AS BIGINT)
         AS delta,
       latest_missing,
       CAST(coalesce(past_missing_window, oldest_missing) AS BIGINT) AS past_missing
FROM past
WHERE n_entries >= 2
ORDER BY delta DESC, name ASC
LIMIT {TOPK_K}
"""

_COV = "CASE WHEN total = 0 THEN 100.0 ELSE round((total - missing) / CAST(total AS DOUBLE) * 100, 1) END"

ORACLE["history_lag_delta"] = f"""{_prelude()},
hc AS (
  SELECT name, date, {_COV} AS coverage FROM history
)
SELECT name, date, coverage,
       round(coverage - lag(coverage, 1) OVER (PARTITION BY name ORDER BY date), 1)
         AS delta
FROM hc
"""

ORACLE["history_retro"] = f"""{_prelude()},
deltas AS (
  SELECT DISTINCT name, CAST(length(name) % 3 + 1 AS BIGINT) AS d FROM history
),
rw AS (
  SELECT h.name, h.date, h.total,
         greatest(h.missing - d.d, 0) AS missing,
         h.corrections + d.d AS corrections
  FROM history h JOIN deltas d ON h.name = d.name
)
SELECT name, date, total, CAST(missing AS BIGINT) AS missing,
       CAST(corrections AS BIGINT) AS corrections,
       {_COV} AS coverage
FROM rw
"""

ORACLE["history_adjust"] = f"""{_prelude()},
latest AS (
  SELECT name,
         max_by(total, date) AS total,
         max_by(missing, date) AS missing,
         max_by(corrections, date) AS corrections
  FROM history WHERE length(name) % 2 = 0 GROUP BY name
),
deltas AS (
  SELECT name,
         length(name) % 5 - 2 AS dt,
         length(name) % 4 - 1 AS dm,
         length(name) % 3 AS dc
  FROM latest
),
adj AS (
  SELECT h.name, h.date,
         h.total + coalesce(d.dt, 0) AS total,
         greatest(h.missing - coalesce(d.dc, 0), 0)
           + coalesce(d.dm, 0) + coalesce(d.dc, 0) AS missing,
         h.corrections + coalesce(d.dc, 0) AS corrections
  FROM history h LEFT JOIN deltas d ON h.name = d.name
)
SELECT name, date, CAST(total AS BIGINT) AS total,
       CAST(missing AS BIGINT) AS missing,
       CAST(corrections AS BIGINT) AS corrections,
       {_COV} AS coverage
FROM adj
"""

ORACLE["history_upsert"] = f"""{_prelude()},
latest AS (
  SELECT name, max(date) AS date,
         max_by(total, date) AS total,
         max_by(missing, date) AS missing,
         max_by(corrections, date) AS corrections
  FROM history GROUP BY name
),
new_entries AS (
  SELECT name, date, total, greatest(missing - 1, 0) AS missing, corrections
  FROM latest
  UNION ALL
  SELECT name, '2099-01-01' AS date, total + 5 AS total, missing, corrections
  FROM latest
)
SELECT name, date, CAST(total AS BIGINT) AS total,
       CAST(missing AS BIGINT) AS missing,
       CAST(corrections AS BIGINT) AS corrections
FROM (
  SELECT * FROM history h
  WHERE NOT EXISTS (
    SELECT 1 FROM new_entries n WHERE n.name = h.name AND n.date = h.date)
  UNION ALL
  SELECT * FROM new_entries
)
"""

QUERIES = {
    "history_topk_improvers": q_history_topk_improvers,
    "history_lag_delta": q_history_lag_delta,
    "history_retro": q_history_retro,
    "history_adjust": q_history_adjust,
    "history_upsert": q_history_upsert,
}
