"""Table-format abstraction: parquet stand-in MERGE semantics."""

import os
import tempfile

from osm_coverage_spark.sources import tables


def test_merge_upsert_parquet_standin(spark):
    with tempfile.TemporaryDirectory() as tmp:
        target = os.path.join(tmp, "hist")
        base = spark.createDataFrame(
            [("a", "2024-01-01", 10), ("a", "2024-01-02", 11), ("b", "2024-01-01", 5)],
            "name string, date string, missing int",
        )
        tables.write_table(base, target)
        upd = spark.createDataFrame(
            [("a", "2024-01-02", 99), ("b", "2024-01-02", 6)],
            "name string, date string, missing int",
        )
        tables.merge_upsert(spark, target, upd, ("name", "date"))
        got = {
            (r["name"], r["date"]): r["missing"]
            for r in tables.read_table(spark, target).collect()
        }
        assert got == {
            ("a", "2024-01-01"): 10,
            ("a", "2024-01-02"): 99,  # matched → updated
            ("b", "2024-01-01"): 5,
            ("b", "2024-01-02"): 6,  # not matched → inserted
        }


def test_iceberg_detection_is_false_in_sandbox(spark):
    assert tables.iceberg_available(spark) is False
