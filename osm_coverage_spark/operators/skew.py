"""Hot-cell skew handling: explicit salting on top of AQE skew-join.

north_rule: dense urban cells hold a large share of rows (the derived
images table plants ~20% of rows in a ~100 m blob). AQE's skew-join split
handles join-side skew at runtime; for groupBy/repartition paths we salt
explicitly with the two-pass pattern (cheap count → salt map → salted
repartition), per SURVEY §4.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_hot_cells(df: DataFrame, cell_col: str, hot_fraction: float = 0.01) -> DataFrame:
    """Cells holding more than ``hot_fraction`` of all rows (pass 1)."""
    total = df.count()
    threshold = max(1, int(total * hot_fraction))
    return (
        df.groupBy(cell_col)
        .count()
        .filter(F.col("count") > threshold)
        .select(cell_col, F.col("count").alias("cell_rows"))
    )


def salted(
    df: DataFrame,
    cell_col: str,
    salt_key_col: str,
    n_salt: int = 16,
    hot_fraction: float = 0.01,
) -> DataFrame:
    """Append a ``salt`` column: 0 for cold cells, hash-spread 0..n_salt-1
    for hot cells; repartition on (cell, salt) so no single task owns a
    hotspot. Deterministic (xxhash64 of the row key), so tile assignments
    stay stable across parallelism levels."""
    hot = find_hot_cells(df, cell_col, hot_fraction).select(
        F.col(cell_col).alias("_hot_cell")
    )
    out = (
        df.join(
            F.broadcast(hot), df[cell_col] == hot["_hot_cell"], "left"
        )
        .withColumn(
            "salt",
            F.when(
                F.col("_hot_cell").isNotNull(),
                F.pmod(F.xxhash64(F.col(salt_key_col)), F.lit(n_salt)),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot_cell")
    )
    return out.repartition(F.col(cell_col), F.col("salt"))


def salted_cell_counts(
    df: DataFrame, cell_col: str, salt_key_col: str, n_salt: int = 16
) -> DataFrame:
    """Two-level aggregation over salted partitions: partial per (cell,salt)
    then final per cell — the classic hot-key-safe count. Results are
    identical to a direct groupBy (pytest asserts this); the win is that no
    reducer receives a whole hotspot."""
    s = df.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(salt_key_col)), F.lit(n_salt))
    )
    partial = s.groupBy(cell_col, "salt").agg(F.count(F.lit(1)).alias("c"))
    return partial.groupBy(cell_col).agg(F.sum("c").alias("n_rows"))
