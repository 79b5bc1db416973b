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
- results are written partitioned BY CELL with dynamic partition overwrite
  (only the partitions present in this run's output are replaced), and
  BEFORE their ledger rows — so a crash between the two re-processes the
  in-flight cells on resume and the overwrite replaces, never duplicates,
  their output;
- per-cell output counts come from THIS run's result DataFrame (persisted
  across the write), never from re-reading the accumulated output table —
  a resume at 10^12-image scale must not scan all prior results.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

LEDGER_SCHEMA = (
    "cell long, run_id string, n_rows long, out_rows long, wall_ms long, "
    "finished_at double"
)


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    """Empty ledger ONLY when the path does not exist yet; a transient or
    corrupt read must propagate — silently returning an empty ledger would
    re-process every cell (and before the dynamic-overwrite fix, would have
    duplicated the entire prior output)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(ledger_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], LEDGER_SCHEMA)
        raise


def pending_work(work: DataFrame, ledger: DataFrame, cell_col: str = "cell") -> DataFrame:
    done = ledger.select(F.col("cell").alias(cell_col)).distinct()
    return work.join(done, cell_col, "left_anti")


def write_results(result: DataFrame, out_path: str, cell_col: str = "cell") -> None:
    """Idempotent-by-cell results write: partitioned by the cell column with
    dynamic partition overwrite, so re-processing a cell REPLACES its files
    (a crash between results write and ledger write is safe to retry)."""
    (
        result.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(cell_col)
        .parquet(out_path)
    )


def run_with_resume(
    spark: SparkSession,
    work: DataFrame,
    process,
    out_path: str,
    ledger_path: str,
    run_id: str,
    cell_col: str = "cell",
) -> dict:
    """Process only cells absent from the ledger; overwrite-by-cell results,
    then append the lineage rows.

    ``process(todo_df) -> DataFrame`` must keep ``cell_col`` in its output.
    Returns run metrics. Deterministic given (work, ledger state)."""
    ledger = read_ledger(spark, ledger_path)
    todo = pending_work(work, ledger, cell_col)

    t0 = time.perf_counter()
    in_counts = todo.groupBy(cell_col).agg(F.count(F.lit(1)).alias("n_rows"))
    # persist bridges the write and the per-cell count: one computation of
    # process(), and the count reflects exactly this run's rows (cells the
    # process emitted nothing for still get a ledger row with out_rows=0
    # via the left join below, so they are not re-processed forever).
    result = process(todo).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # 1) results first (idempotent overwrite by cell), 2) lineage rows
        write_results(result, out_path, cell_col)
        out_counts = result.groupBy(cell_col).agg(
            F.count(F.lit(1)).alias("out_rows")
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
        # materialize the lineage rows BEFORE appending them: the count
        # re-evaluates the todo anti-join, and the ledger scan re-lists the
        # path — counting after the append would see this run's own rows
        # and report 0
        new_rows = new_rows.persist(StorageLevel.MEMORY_AND_DISK)
        n_cells = new_rows.count()
        new_rows.write.mode("append").parquet(ledger_path)
        new_rows.unpersist()
    finally:
        result.unpersist()
    return {"run_id": run_id, "cells_processed": n_cells, "wall_ms": wall_ms}
