"""History time-series operators: MERGE-style upsert, retroactive delta
propagation, windowed top-k improvers, per-point lag deltas.

Reference semantics: scripts/04_compare_optimized.py:509-579,625-704 (upsert
+ retro-propagation as in-place JSON mutation) and
site/src/modules/ui.js:177-260 (client-side windowed top-k / global diff).
Here each is a deterministic recompute over a ``history(name, date:string
ISO, total, missing, corrections)`` DataFrame — the Iceberg-MERGE shape
without requiring an Iceberg catalog in this sandbox.

Dates are ISO-8601 strings compared lexicographically, exactly like the
reference (04:576; check_geofabrik_export_date.py:75).

Engine-defined determinism detail: the reference's JS sorts improvers with
an unstable comparator; we tie-break ``(delta DESC, name ASC)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coverage_expr(total: F.Column, missing: F.Column, scale: int = 1) -> F.Column:
    return F.when(total == 0, F.lit(100.0)).otherwise(
        F.round((total - missing) / total * 100, scale)
    )


def upsert_history(history: DataFrame, new_entries: DataFrame) -> DataFrame:
    """Overwrite rows with matching (name, date), append the rest —
    the reference's append-or-overwrite-last (04:576-579) generalized to a
    keyed MERGE. Anti-join + union: one shuffle, no window."""
    keep = history.join(new_entries.select("name", "date"), ["name", "date"], "left_anti")
    return keep.unionByName(new_entries)


def retro_propagate(history: DataFrame, deltas: DataFrame,
                    scale: int = 1) -> DataFrame:
    """Propagate per-name correction-count deltas to ALL past rows:
    ``corrections += d; missing = max(missing - d, 0)``, coverage
    recomputed — the reference's unconditional retro loop (04:534-553)
    expressed as a deterministic partition recompute, not a mutation.

    ``deltas``: (name, delta_corrections)."""
    joined = history.join(F.broadcast(deltas), "name", "inner")
    new_missing = F.greatest(F.col("missing") - F.col("delta_corrections"), F.lit(0))
    return (
        joined.withColumn("corrections", F.col("corrections") + F.col("delta_corrections"))
        .withColumn("missing", new_missing)
        .withColumn("coverage", coverage_expr(F.col("total"), F.col("missing"), scale))
        .drop("delta_corrections")
    )


def adjust_history(history: DataFrame, new_entries: DataFrame,
                   scale: int = 1) -> DataFrame:
    """``--adjust-history`` retro-propagation (04:529-572 districts,
    04:661-702 global): the new run's (total, missing, corrections) are
    diffed against each name's LATEST history entry, then every past row of
    that name gets, in the reference's order:

    1. unconditional corrections propagation — ``corrections += Δc``,
       ``missing = max(missing − Δc, 0)`` (clamped);
    2. the flag-gated residual logic shift — ``total += Δt``,
       ``missing += Δm + Δc`` (UNclamped, faithfully — the reference does
       not clamp this step);

    coverage recomputed last. ``new_entries``: one row per name with the
    current run's (name, total, missing, corrections); callers upsert them
    afterwards, exactly like the reference appends after adjusting.

    Names absent from ``new_entries`` pass through UNtouched (delta 0) —
    the reference's --adjust-history leaves other districts' history rows
    intact, so an inner join here would silently drop them from a caller
    that writes the result back as the history table.

    One groupBy for the latest-entry lookup + a broadcast LEFT join of the
    per-name deltas (names ≈ districts — bounded, dimension-sized)."""
    ref = history.groupBy("name").agg(
        F.max_by("total", "date").alias("_rt"),
        F.max_by("missing", "date").alias("_rm"),
        F.max_by("corrections", "date").alias("_rc"),
    )
    deltas = new_entries.join(ref, "name").select(
        "name",
        (F.col("total") - F.col("_rt")).alias("_dt"),
        (F.col("missing") - F.col("_rm")).alias("_dm"),
        (F.col("corrections") - F.col("_rc")).alias("_dc"),
    )
    j = history.join(F.broadcast(deltas), "name", "left")
    for c in ("_dt", "_dm", "_dc"):
        j = j.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    j = j.withColumn("corrections", F.col("corrections") + F.col("_dc"))
    j = j.withColumn("missing", F.greatest(F.col("missing") - F.col("_dc"), F.lit(0)))
    j = j.withColumn("total", F.col("total") + F.col("_dt"))
    j = j.withColumn("missing", F.col("missing") + F.col("_dm") + F.col("_dc"))
    return j.withColumn(
        "coverage", coverage_expr(F.col("total"), F.col("missing"), scale)
    ).drop("_dt", "_dm", "_dc")


def topk_improvers(history: DataFrame, days: int = 7, k: int = 10) -> DataFrame:
    """Per name: latest entry vs the first entry dated >= latest - N days
    (fallback: oldest); delta = past.missing - latest.missing; top-k desc.
    Names with fewer than 2 entries are skipped (ui.js:188).
    One groupBy with min_by/max_by + conditional min_by — single shuffle."""
    latest = history.groupBy("name").agg(
        F.max("date").alias("latest_date"),
        F.max_by("missing", "date").alias("latest_missing"),
        F.min("date").alias("oldest_date"),
        F.min_by("missing", "date").alias("oldest_missing"),
        F.count(F.lit(1)).alias("n_entries"),
    )
    latest = latest.withColumn(
        "target_date",
        F.date_sub(F.to_date("latest_date"), days).cast("string"),
    )
    h = history.select("name", F.col("date").alias("h_date"), F.col("missing").alias("h_missing"))
    joined = latest.join(h, "name")
    past = joined.groupBy(
        "name", "latest_missing", "oldest_missing", "n_entries", "target_date"
    ).agg(
        F.expr(
            "min_by(h_missing, h_date) FILTER (WHERE h_date >= target_date)"
        ).alias("past_missing_window")
    )
    out = (
        past.filter(F.col("n_entries") >= 2)
        .withColumn(
            "past_missing",
            F.coalesce(F.col("past_missing_window"), F.col("oldest_missing")),
        )
        .withColumn("delta", F.col("past_missing") - F.col("latest_missing"))
        .select("name", "delta", "latest_missing", "past_missing")
        .orderBy(F.col("delta").desc(), F.col("name").asc())
        .limit(k)
    )
    return out


def lag_delta(history: DataFrame, value_col: str = "coverage",
              scale: int = 1) -> DataFrame:
    """Per-point tooltip delta: value(i) - value(i-1) over date order
    (ui.js:47-70). First point per name gets NULL."""
    w = Window.partitionBy("name").orderBy("date")
    hist = history.withColumn(
        "coverage", coverage_expr(F.col("total"), F.col("missing"), scale)
    )
    return hist.select(
        "name",
        "date",
        "coverage",
        F.round(F.col("coverage") - F.lag("coverage", 1).over(w), scale).alias(
            "delta"
        ),
    )
