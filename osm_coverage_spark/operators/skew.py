"""Hot-cell skew handling: explicit salting on top of AQE skew-join.

north_rule: dense urban cells hold a large share of rows (the derived
images table plants ~20% of rows in a ~100 m blob). AQE's skew-join split
handles join-side skew at runtime; for groupBy/repartition paths we salt
explicitly with the two-pass pattern (cheap count → salt map → salted
repartition), per SURVEY §4.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def banded_self_pairs(
    df: DataFrame,
    band_cols: list[str],
    id_col: str,
    payload_cols: tuple[str, ...] = (),
    hot_threshold: int = 64,
    target_block: int = 64,
) -> DataFrame:
    """All ordered pairs (id_a < id_b) within each band bucket — EXACT, with
    degenerate buckets spread across tasks.

    The LSH families (MinHash bands, phash bands) self-join on a band value;
    a boilerplate bucket of S rows emits S² candidate pairs, and a plain
    equi-join hands the whole bucket to ONE task — the quadratic hot key
    that kills the job at 10^12 rows. Guard (results provably unchanged):

    - bucket sizes come from a window count over the band key (same shuffle
      key as the join, so Catalyst reuses one exchange for every branch —
      no persist, no second computation of the band table);
    - cold buckets (≤ ``hot_threshold`` rows) join as before;
    - hot buckets split into ``ceil(S / target_block)`` blocks: the right
      side hashes each row to one block, the left side replicates each row
      to every block, and the join key gains the block id — per-task pair
      count drops from S² to S × target_block (linear in S), task count
      grows to S / target_block. Every pair appears exactly once (a row's
      block is a function of its id).

    Returns columns ``id_a, id_b`` plus ``<p>_a, <p>_b`` per payload column.
    Pairs found via multiple bands are NOT deduped here — callers
    ``.distinct()`` after their residual filter, as before."""
    w = Window.partitionBy(*band_cols)
    sized = df.withColumn("_bn", F.count(F.lit(1)).over(w))

    def side(d: DataFrame, suffix: str, blk=None) -> DataFrame:
        cols = [F.col(id_col).alias(f"id_{suffix}")]
        cols += [F.col(p).alias(f"{p}_{suffix}") for p in payload_cols]
        cols += [F.col(c) for c in band_cols]
        if blk is not None:
            cols.append(blk.alias("_blk"))
        return d.select(*cols)

    out_cols = [f"id_{s}" for s in "ab"] + [
        f"{p}_{s}" for p in payload_cols for s in "ab"
    ]
    lt = F.col("id_a") < F.col("id_b")

    cold = sized.filter(F.col("_bn") <= hot_threshold)
    pairs = side(cold, "a").join(side(cold, "b"), band_cols).filter(lt)

    hot = sized.filter(F.col("_bn") > hot_threshold)
    n_blk = F.ceil(F.col("_bn") / F.lit(target_block)).cast("long")
    left_h = side(hot, "a", blk=F.explode(F.sequence(F.lit(0).cast("long"), n_blk - 1)))
    right_h = side(hot, "b", blk=F.pmod(F.xxhash64(F.col(id_col)), n_blk))
    pairs_hot = (
        left_h.join(right_h, band_cols + ["_blk"]).filter(lt).drop("_blk")
    )
    return pairs.select(out_cols).unionByName(pairs_hot.select(out_cols))


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
