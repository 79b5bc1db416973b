"""Per-cell checkpoint/resume ledger (north_rule: "per-partition lineage +
metrics checkpointed so a killed job resumes without recomputing completed
cells").

The reference's only incrementality is skip-if-artifact-newer
(scripts/03_import_pbf_optimized.py:180-185); at 10^12-image scale the unit
of recovery must be the spatial partition. Design:

- work is keyed by a geocell column (the tile id);
- a ledger table (parquet; Iceberg in production) holds one row per
  COMPLETED cell: (cell, run_id, n_rows, out_rows, wall_ms, finished_at);
- on (re)start the driver anti-joins the work list against the ledger and
  processes only missing cells;
- results for a batch of cells are written BEFORE their ledger rows, so a
  crash between the two at worst re-processes (idempotent overwrite by
  cell), never skips.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = (
    "cell long, run_id string, n_rows long, out_rows long, wall_ms long, "
    "finished_at double"
)


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    try:
        return spark.read.parquet(ledger_path)
    except Exception:
        return spark.createDataFrame([], LEDGER_SCHEMA)


def pending_work(work: DataFrame, ledger: DataFrame, cell_col: str = "cell") -> DataFrame:
    done = ledger.select(F.col("cell").alias(cell_col)).distinct()
    return work.join(done, cell_col, "left_anti")


def run_with_resume(
    spark: SparkSession,
    work: DataFrame,
    process,
    out_path: str,
    ledger_path: str,
    run_id: str,
    cell_col: str = "cell",
) -> dict:
    """Process only cells absent from the ledger; append results + ledger.

    ``process(todo_df) -> DataFrame`` must keep ``cell_col`` in its output.
    Returns run metrics. Deterministic given (work, ledger state)."""
    ledger = read_ledger(spark, ledger_path)
    todo = pending_work(work, ledger, cell_col)

    t0 = time.perf_counter()
    in_counts = todo.groupBy(cell_col).agg(F.count(F.lit(1)).alias("n_rows"))
    result = process(todo)
    # 1) results first (idempotent by cell), 2) then the lineage rows
    result.write.mode("append").parquet(out_path)
    out_counts = (
        spark.read.parquet(out_path)
        .groupBy(cell_col)
        .agg(F.count(F.lit(1)).alias("out_rows"))
    )
    wall_ms = int((time.perf_counter() - t0) * 1000)
    new_rows = (
        in_counts.join(out_counts, cell_col, "left")
        .select(
            F.col(cell_col).alias("cell"),
            F.lit(run_id).alias("run_id"),
            F.col("n_rows").cast("long"),
            F.coalesce(F.col("out_rows"), F.lit(0)).cast("long").alias("out_rows"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.lit(time.time()).alias("finished_at"),
        )
    )
    new_rows.write.mode("append").parquet(ledger_path)
    n_cells = new_rows.count()
    return {"run_id": run_id, "cells_processed": n_cells, "wall_ms": wall_ms}
