"""Checkpoint/resume lineage + streaming smoke tests."""

import tempfile

from pyspark.sql import functions as F

from osm_coverage_spark.geo import cells
from osm_coverage_spark.sources import derived
from osm_coverage_spark.streaming import checkpoint, incremental


def _work(spark, sf_dir):
    derived.register_derived_views(spark, sf_dir)
    img = spark.table("images")
    return img.withColumn(
        "cell", cells.cell_expr(F.col("lat"), F.col("lon"), 12)
    ).select("image_id", "phash", "cell")


def _process(df):
    return df.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"), F.min("image_id").alias("first_id")
    )


def test_resume_skips_completed_cells(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        out, ledger = f"{tmp}/out", f"{tmp}/ledger"
        work = _work(spark, sf_dir)
        all_cells = work.select("cell").distinct()
        n_cells = all_cells.count()

        # simulate a killed job: first run covers only half the cells
        half = work.filter(F.col("cell") % 2 == 0)
        m1 = checkpoint.run_with_resume(
            spark, half, _process, out, ledger, run_id="r1"
        )
        assert 0 < m1["cells_processed"] < n_cells

        # resume over the FULL work list: only missing cells processed
        m2 = checkpoint.run_with_resume(
            spark, work, _process, out, ledger, run_id="r2"
        )
        assert m1["cells_processed"] + m2["cells_processed"] == n_cells

        # combined output equals a from-scratch run
        resumed = spark.read.parquet(out).orderBy("cell")
        fresh = _process(work).orderBy("cell")
        assert [r.asDict() for r in resumed.collect()] == [
            r.asDict() for r in fresh.collect()
        ]

        # third run: nothing left to do
        m3 = checkpoint.run_with_resume(
            spark, work, _process, out, ledger, run_id="r3"
        )
        assert m3["cells_processed"] == 0

        # lineage metrics present per cell
        led = spark.read.parquet(ledger)
        assert led.filter(F.col("n_rows") <= 0).count() == 0
        assert set(led.select("run_id").distinct().toPandas().run_id) >= {"r1", "r2"}


def test_streaming_windowed_counts(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .withColumn("event_type", (F.col("value") % 3).cast("string"))
        .withColumnRenamed("timestamp", "ts")
    )
    out = incremental.windowed_event_counts(stream, window="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 30
    rows = 0
    while time.time() < deadline:
        rows = spark.sql("SELECT count(*) FROM win_counts").collect()[0][0]
        if rows > 0:
            break
        time.sleep(1)
    q.stop()
    assert rows > 0


def test_staleness_gate(spark):
    with tempfile.TemporaryDirectory() as tmp:
        ctl = f"{tmp}/control"
        assert incremental.needs_rerun(spark, ctl, "2026-01-30")
        incremental.mark_processed(spark, ctl, "2026-01-30")
        assert not incremental.needs_rerun(spark, ctl, "2026-01-30")
        assert incremental.needs_rerun(spark, ctl, "2026-01-31")
