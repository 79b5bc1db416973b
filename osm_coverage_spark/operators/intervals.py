"""1-D interval (range) join via a time-bucket stencil — the temporal
analog of geo/cells.disc_stencil.

Spark has no RANGE JOIN operator: a bare ``e.ts BETWEEN i.start AND
i.end`` join plans as BroadcastNestedLoopJoin (every event against every
interval — dead at 100 TB). The scale-correct shape buckets time into
cells of width >= the maximum interval length: each interval overlaps at
most 2 cells (explode), each event belongs to exactly 1, and the join
becomes an EQUI-join on the cell with the exact bounds as a cheap
residual filter. Candidates per event = only the intervals sharing its
cell — linear, not quadratic.

Join strategy is Catalyst's choice: with a dimension-sized interval
table AQE broadcasts it (optionally forced via ``hint_broadcast``); with
a fact-sized interval table the same plan degrades gracefully to a
shuffled hash join on the cell key. Both paths are plan-asserted in
tests/test_perf_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts_us",
    start_col: str = "start_us",
    len_us: int = 1_800_000_000,
    cell_us: int | None = None,
    hint_broadcast: bool = True,
) -> DataFrame:
    """Rows of ``events`` matched to the ``intervals`` whose
    ``[start, start+len_us)`` window contains ``ts_col``. ``cell_us``
    must be >= the longest interval (defaults to ``len_us``)."""
    cell_us = cell_us or len_us
    if len_us > cell_us:
        raise ValueError("cell width must cover the longest interval")
    iv_cells = intervals.withColumn(
        "cell",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"{start_col} DIV {cell_us}"),
                    F.expr(f"({start_col} + {len_us} - 1) DIV {cell_us}"),
                )
            )
        ),
    )
    if hint_broadcast:
        iv_cells = F.broadcast(iv_cells)
    return (
        events.withColumn("cell", F.expr(f"{ts_col} DIV {cell_us}"))
        .join(iv_cells, "cell")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(start_col) + F.lit(len_us))
        )
        .drop("cell")
    )
