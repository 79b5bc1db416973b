"""Table-format abstraction: Iceberg when a catalog is configured, else
partitioned-parquet stand-in (this sandbox ships no Iceberg runtime jar —
FIXTURES.md F5 explicitly allows the parquet stand-in).

The engine's Iceberg mapping (SURVEY §1.3, §2.5):
- graft payload + derived tables → `spark.table("catalog.db.images")`,
  partitioned by H3-prefix (`geo/cells.parent_expr` at a coarse res);
- history upsert → `MERGE INTO history ON (name, date)`;
- checkpoint ledger → append-only Iceberg table (snapshots give the
  reference's history-backup behavior for free, SURVEY §2.10).

Every call site goes through these helpers so a real catalog drops in with
one config (`spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    identifier_or_path: str,
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Iceberg `writeTo(...).createOrReplace()` when the identifier names a
    catalog table and Iceberg is on the classpath; parquet otherwise."""
    spark = df.sparkSession
    if "." in identifier_or_path and iceberg_available(spark):
        w = df.writeTo(identifier_or_path)
        if partition_cols:
            w = w.partitionedBy(*[F.col(c) for c in partition_cols])
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()
        return
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(identifier_or_path)


def read_table(spark: SparkSession, identifier_or_path: str) -> DataFrame:
    if "." in identifier_or_path and iceberg_available(spark):
        return spark.table(identifier_or_path)
    return spark.read.parquet(identifier_or_path)


def merge_upsert(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
) -> None:
    """MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT.

    Iceberg executes the real MERGE; the parquet stand-in rewrites the
    target deterministically via anti-join + union (the same semantics
    operators/history.upsert_history uses for the lazy in-plan form)."""
    if iceberg_available(spark) and "." in target:
        updates.createOrReplaceTempView("_merge_src")
        on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
        spark.sql(
            f"MERGE INTO {target} t USING _merge_src s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
        return
    current = read_table(spark, target)
    keep = current.join(updates.select(*key_cols), list(key_cols), "left_anti")
    merged = keep.unionByName(updates)
    # parquet has no transactional replace: write to a temp dir, move the
    # old target to a backup, move the new one into place, drop the backup —
    # a crash at any point leaves either the old or the new table intact
    # (never neither, which rmtree-then-rename risked)
    import os
    import shutil
    import uuid

    token = uuid.uuid4().hex[:8]
    tmp = f"{target}__merge_{token}"
    bak = f"{target}__bak_{token}"
    merged.write.mode("overwrite").parquet(tmp)
    os.rename(target, bak)
    try:
        os.rename(tmp, target)
    except Exception:
        os.rename(bak, target)  # roll back; tmp left behind for inspection
        raise
    shutil.rmtree(bak)
