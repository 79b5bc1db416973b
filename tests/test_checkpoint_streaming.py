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


def test_crash_between_result_and_ledger_writes_no_duplicates(spark, sf_dir):
    """Kill the job between the results write and the ledger write: on
    resume the in-flight cells are re-processed and their output REPLACED
    (dynamic partition overwrite), never appended twice; ledger out_rows
    match the actual final per-cell output exactly."""
    with tempfile.TemporaryDirectory() as tmp:
        out, ledger = f"{tmp}/out", f"{tmp}/ledger"
        work = _work(spark, sf_dir)

        # run 1 completes normally on even cells
        checkpoint.run_with_resume(
            spark, work.filter(F.col("cell") % 2 == 0), _process, out, ledger,
            run_id="r1",
        )

        # crash: results for the odd cells hit disk (and are even WRONG —
        # computed from a partial input, as a half-written task would be),
        # but the ledger write never happened
        crashed = work.filter(
            (F.col("cell") % 2 == 1) & (F.col("image_id") > "a")
        )
        checkpoint.write_results(_process(crashed), out)

        # resume over the full work list: odd cells absent from the ledger
        # are re-processed from the FULL input, overwriting the crash debris
        checkpoint.run_with_resume(spark, work, _process, out, ledger, run_id="r2")

        resumed = spark.read.parquet(out)
        fresh = _process(work)
        assert resumed.count() == fresh.count()  # no appended duplicates
        assert [r.asDict() for r in resumed.orderBy("cell").collect()] == [
            r.asDict() for r in fresh.orderBy("cell").collect()
        ], "crash debris must be replaced by the resumed recompute"

        # ledger accounting is exact: out_rows per cell == rows on disk
        led = spark.read.parquet(ledger).select("cell", "out_rows")
        disk = resumed.groupBy("cell").agg(F.count(F.lit(1)).alias("disk_rows"))
        bad = led.join(disk, "cell").filter(
            F.col("out_rows") != F.col("disk_rows")
        )
        assert bad.count() == 0


def test_read_ledger_propagates_real_failures(spark, tmp_path):
    import pytest

    missing = str(tmp_path / "nope")
    assert checkpoint.read_ledger(spark, missing).count() == 0  # path-missing OK
    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-0.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        checkpoint.read_ledger(spark, str(corrupt)).collect()


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


def test_streaming_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """The event-time stateful sessionizer's closed sessions must equal the
    batch gaps-and-islands query exactly (same gap, same aggregates). Two
    micro-batches (maxFilesPerTrigger=1): the real events, then one
    far-future sentinel per user that deterministically closes every open
    tail — exercising open-session state carried ACROSS batches."""
    import shutil

    from pyspark.sql import functions as F

    from osm_coverage_spark import queries_events as qe
    from osm_coverage_spark.streaming.stateful import sessionize_event_time

    src = tmp_path / "stream_in"
    src.mkdir()

    ev = qe._events_us(spark, sf_dir).select(
        "user_id", "ts_us", "event_id", "val_e2"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    max_us = ev.agg(F.max("ts_us")).collect()[0][0]
    sentinel_us = max_us + 10 * 86_400 * 1_000_000
    sentinels = (
        ev.select("user_id").distinct()
        .withColumn("ts_us", F.lit(sentinel_us))
        .withColumn("event_id", F.lit(10**12))
        .withColumn("val_e2", F.lit(0).cast("bigint"))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )

    def write_one(df, name):
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.move(str(part), str(src / f"{name}.parquet"))

    write_one(ev, "b0")
    write_one(sentinels, "b1")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "0 seconds")
    )
    q = (
        sessionize_event_time(stream)
        .writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = (
        spark.table("sess_parity")
        .filter(F.col("start_us") < sentinel_us)
        .toPandas()
        .sort_values(["user_id", "start_us"])
        .reset_index(drop=True)
    )
    want = (
        qe.q_events_sessionize(spark, sf_dir)
        .drop("session_idx")
        .toPandas()[got.columns.tolist()]
        .sort_values(["user_id", "start_us"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert got.equals(want), (got.compare(want) if len(got) == len(want) else "len")


def test_streaming_sessionize_timeout_flushes_tails(spark, tmp_path):
    """Liveness branch: a user whose stream simply STOPS must still get
    their open-tail session emitted once the event-time watermark (driven
    by OTHER users' progress) passes last_seen + gap — the
    EventTimeTimeout path, with no sentinel for the stopped users."""
    import shutil

    from pyspark.sql import functions as F

    from osm_coverage_spark.streaming.stateful import sessionize_event_time

    src = tmp_path / "in"
    src.mkdir()
    t0 = 1_704_067_200_000_000
    day = 86_400_000_000

    def mk(rows):
        df = spark.createDataFrame(
            rows, "user_id long, ts_us long, event_id long, val_e2 long"
        ).withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        return df

    def write_one(df, name):
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.move(str(part), str(src / f"{name}.parquet"))

    # batch 0: three users, two events each (one session per user), then
    # they go silent forever
    rows0 = []
    for u in (1, 2, 3):
        rows0 += [(u, t0 + u * 1000, u * 10, 5), (u, t0 + u * 1000 + 60_000_000, u * 10 + 1, 7)]
    write_one(mk(rows0), "b0")
    # batches 1..2: an unrelated user keeps the event-time clock moving
    write_one(mk([(99, t0 + 10 * day, 990, 1)]), "b1")
    write_one(mk([(99, t0 + 20 * day, 991, 1)]), "b2")

    df0 = mk(rows0)
    stream = (
        spark.readStream.schema(df0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "0 seconds")
    )
    q = (
        sessionize_event_time(stream)
        .writeStream.format("memory")
        .queryName("sess_timeout")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        r["user_id"]: (r["start_us"], r["end_us"], r["n_events"], r["sum_value_e2"])
        for r in spark.table("sess_timeout").filter(F.col("user_id") < 99).collect()
    }
    assert got == {
        u: (t0 + u * 1000, t0 + u * 1000 + 60_000_000, 2, 12) for u in (1, 2, 3)
    }, got
