"""Table-format abstraction: parquet stand-in MERGE semantics."""

import os
import tempfile

from pyspark.sql import functions as F

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


def test_merge_standin_equals_inplan_upsert_contract(spark):
    """Contract test (no Iceberg jar ships here): the parquet stand-in
    MERGE and the lazy in-plan operators/history.upsert_history must
    produce identical tables from the same inputs — a real Iceberg MERGE
    replaces both without changing results."""
    from osm_coverage_spark.operators import history as H

    with tempfile.TemporaryDirectory() as tmp:
        target = os.path.join(tmp, "hist")
        base = spark.createDataFrame(
            [
                ("a", "2024-01-01", 10, 3, 0),
                ("a", "2024-01-02", 11, 2, 1),
                ("b", "2024-01-01", 5, 5, 0),
            ],
            "name string, date string, total int, missing int, corrections int",
        )
        upd = spark.createDataFrame(
            [("a", "2024-01-02", 12, 1, 2), ("c", "2024-01-03", 7, 7, 0)],
            "name string, date string, total int, missing int, corrections int",
        )
        tables.write_table(base, target)
        tables.merge_upsert(spark, target, upd, ("name", "date"))
        via_merge = sorted(
            tuple(r) for r in tables.read_table(spark, target).collect()
        )
        via_plan = sorted(tuple(r) for r in H.upsert_history(base, upd).collect())
        assert via_merge == via_plan


def test_merge_concurrent_commit_not_lost(spark, monkeypatch):
    """Snapshot-isolation contract (Iceberg optimistic concurrency): writer
    B commits between writer A's read and A's swap. A must retry on the
    fresh state (version-token check under the commit lock) — B's
    non-conflicting row SURVIVES, instead of the naive last-writer-wins
    lost update."""
    from osm_coverage_spark.sources.tables import _table_version as real_ver

    with tempfile.TemporaryDirectory() as tmp:
        target = os.path.join(tmp, "hist")
        base = spark.createDataFrame(
            [("a", "2024-01-01", 1)], "name string, date string, missing int"
        )
        tables.write_table(base, target)
        upd_a = spark.createDataFrame(
            [("a", "2024-01-02", 2)], "name string, date string, missing int"
        )
        upd_b = spark.createDataFrame(
            [("b", "2024-01-01", 9)], "name string, date string, missing int"
        )
        state = {"first": True}

        def interleaved(path):
            if state["first"]:
                state["first"] = False
                stale = real_ver(path)
                # B's full merge lands while A believes the table is at
                # the stale version
                tables.merge_upsert(spark, target, upd_b, ("name", "date"))
                return stale
            return real_ver(path)

        monkeypatch.setattr(tables, "_table_version", interleaved)
        tables.merge_upsert(spark, target, upd_a, ("name", "date"))
        monkeypatch.undo()
        got = {
            (r["name"], r["date"]): r["missing"]
            for r in tables.read_table(spark, target).collect()
        }
        assert got == {
            ("a", "2024-01-01"): 1,
            ("a", "2024-01-02"): 2,  # A's row committed
            ("b", "2024-01-01"): 9,  # B's concurrent row NOT lost
        }


def test_merge_swap_failure_leaves_recoverable_table(spark, monkeypatch):
    """A crash during the swap must leave the old table readable (the
    backup-rename protocol), never a missing target."""
    with tempfile.TemporaryDirectory() as tmp:
        target = os.path.join(tmp, "hist")
        base = spark.createDataFrame(
            [("a", "2024-01-01", 1)], "name string, date string, missing int"
        )
        tables.write_table(base, target)
        upd = spark.createDataFrame(
            [("a", "2024-01-02", 2)], "name string, date string, missing int"
        )
        real_rename = os.rename
        calls = {"n": 0}

        def failing_rename(src, dst):
            calls["n"] += 1
            if calls["n"] == 2:  # the tmp -> target step
                raise OSError("simulated crash mid-swap")
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", failing_rename)
        import pytest

        with pytest.raises(OSError):
            tables.merge_upsert(spark, target, upd, ("name", "date"))
        monkeypatch.undo()
        got = [tuple(r) for r in tables.read_table(spark, target).collect()]
        assert got == [("a", "2024-01-01", 1)]  # old table intact


def test_snapshot_time_travel_reads(spark):
    """Iceberg `VERSION AS OF` contract on the stand-in: every MERGE
    commit retains the pre-commit state as a numbered snapshot;
    read_table_at replays any retained version and expire_snapshots
    bounds retention."""
    with tempfile.TemporaryDirectory() as tmp:
        target = os.path.join(tmp, "hist")
        v1 = spark.createDataFrame(
            [("a", "2024-01-01", 1)], "name string, date string, missing int"
        )
        tables.write_table(v1, target)
        tables.merge_upsert(
            spark,
            target,
            spark.createDataFrame([("a", "2024-01-01", 2)], v1.schema),
            ("name", "date"),
        )
        tables.merge_upsert(
            spark,
            target,
            spark.createDataFrame([("b", "2024-01-02", 3)], v1.schema),
            ("name", "date"),
        )
        assert tables.snapshots(target) == [1, 2]

        def rows(df):
            return sorted((r["name"], r["date"], r["missing"]) for r in df.collect())

        # v1 = initial write, v2 = after first merge, live = after second
        assert rows(tables.read_table_at(spark, target, 1)) == [
            ("a", "2024-01-01", 1)
        ]
        assert rows(tables.read_table_at(spark, target, 2)) == [
            ("a", "2024-01-01", 2)
        ]
        live = [("a", "2024-01-01", 2), ("b", "2024-01-02", 3)]
        assert rows(tables.read_table_at(spark, target)) == live
        assert rows(tables.read_table_at(spark, target, 3)) == live  # = live

        import pytest as _pt

        assert tables.expire_snapshots(target, keep_last=1) == [1]
        assert tables.snapshots(target) == [2]
        with _pt.raises(ValueError):
            tables.read_table_at(spark, target, 1)
        # retained snapshot still readable after expiry of older ones
        assert rows(tables.read_table_at(spark, target, 2)) == [
            ("a", "2024-01-01", 2)
        ]


def test_expire_snapshots_respects_commit_lock(spark, tmp_path):
    """expire_snapshots must take the merge commit lock: a held lock
    blocks (and times out) instead of silently racing the snapshot log
    (r4 ADVICE — a concurrent merge's log entry could be lost)."""
    import os

    import pytest

    from osm_coverage_spark.sources import tables

    target = str(tmp_path / "t")
    spark.range(5).withColumn("v", F.lit(1)).write.parquet(target)
    tables.merge_upsert(
        spark, target, spark.range(3).withColumn("v", F.lit(2)), ("id",)
    )
    lock = f"{target}__commitlock"
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        with pytest.raises(TimeoutError):
            tables.expire_snapshots(target, keep_last=0, timeout_s=0.2)
    finally:
        os.close(fd)
        os.unlink(lock)
    # lock released -> expiry proceeds and empties the retained log
    expired = tables.expire_snapshots(target, keep_last=0)
    assert expired == [1] and tables.snapshots(target) == []


def test_changelog_roundtrip_history_upsert(spark, tmp_path):
    """r4 verdict #7: read_changes must expose every merge_upsert as
    insert/delete rows such that old_state + changelog == new_state
    exactly, and the incremental mirror sync must move ONLY the delta."""
    from osm_coverage_spark.streaming import incremental

    target = str(tmp_path / "hist")
    mirror = str(tmp_path / "mirror")
    control = str(tmp_path / "ctl")
    base = spark.createDataFrame(
        [("a", "2026-01-01", 10), ("b", "2026-01-01", 20)],
        "name string, date string, n int",
    )
    base.write.parquet(target)

    # bootstrap sync (version 1, full copy)
    st = incremental.sync_incremental(spark, target, mirror, control)
    assert st["mode"] == "full" and st["to"] == 1

    # commit 1: update one key, insert one key
    upd = spark.createDataFrame(
        [("a", "2026-01-01", 11), ("c", "2026-01-01", 30)],
        "name string, date string, n int",
    )
    tables.merge_upsert(spark, target, upd, ("name", "date"))
    assert tables.current_version(target) == 2

    ch = tables.read_changes(spark, target, 1, 2).collect()
    got = {(r["_change_type"], r["name"], r["n"]) for r in ch}
    # update = delete(old) + insert(new); plain insert has no delete
    assert got == {("delete", "a", 10), ("insert", "a", 11),
                   ("insert", "c", 30)}

    # changelog round-trip: old + changelog == new, exactly
    old = tables.read_table_at(spark, target, 1)
    ins = [r for r in ch if r["_change_type"] == "insert"]
    dels = spark.createDataFrame(
        [(r["name"], r["date"], r["n"]) for r in ch
         if r["_change_type"] == "delete"] or [],
        "name string, date string, n int",
    )
    replayed = old.exceptAll(dels).unionByName(
        spark.createDataFrame([(r["name"], r["date"], r["n"]) for r in ins],
                              "name string, date string, n int")
    )
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, tables.read_table(spark, target).collect())
    )

    # incremental sync applies exactly the delta
    st = incremental.sync_incremental(spark, target, mirror, control)
    assert st == {"mode": "delta", "from": 1, "to": 2,
                  "inserts": 2, "deletes": 1}
    assert sorted(map(tuple, spark.read.parquet(mirror).collect())) == sorted(
        map(tuple, tables.read_table(spark, target).collect())
    )
    # nothing new -> noop
    assert incremental.sync_incremental(spark, target, mirror, control)[
        "mode"] == "noop"


def test_merge_schema_evolution(spark, tmp_path):
    """Iceberg mergeSchema analog: evolve_schema=True lets updates carry a
    new column (old rows → NULL), the default rejects mismatches loudly,
    retained snapshots keep their pre-evolution schema, and read_changes
    diffs across the boundary on the superset schema."""
    import pytest

    target = str(tmp_path / "evo")
    spark.createDataFrame(
        [("a", "2026-01-01", 1)], "name string, date string, n int"
    ).write.parquet(target)
    wide = spark.createDataFrame(
        [("b", "2026-01-01", 2, "extra")],
        "name string, date string, n int, note string",
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        tables.merge_upsert(spark, target, wide, ("name", "date"))
    tables.merge_upsert(spark, target, wide, ("name", "date"),
                        evolve_schema=True)
    rows = {r["name"]: r for r in tables.read_table(spark, target).collect()}
    assert rows["a"]["note"] is None and rows["b"]["note"] == "extra"
    # snapshot keeps the old schema; changelog spans the evolution
    assert "note" not in tables.read_table_at(spark, target, 1).columns
    ch = {(r["_change_type"], r["name"], r["note"])
          for r in tables.read_changes(spark, target, 1, 2).collect()}
    assert ch == {("insert", "b", "extra")}
    # narrower updates also merge under evolution (missing col → NULL)
    narrow = spark.createDataFrame(
        [("a", "2026-01-01", 9)], "name string, date string, n int"
    )
    tables.merge_upsert(spark, target, narrow, ("name", "date"),
                        evolve_schema=True)
    rows = {r["name"]: r for r in tables.read_table(spark, target).collect()}
    assert rows["a"]["n"] == 9 and rows["a"]["note"] is None


def test_incremental_pyramid_maintenance_equals_full_rebuild(spark, sf_dir, tmp_path):
    """IVM contract: pyramid(v1) + changelog-deltas(v1→v2) must equal the
    full pyramid rebuild over v2 — across inserts, and updates that MOVE
    points between cells (pre/post-image pair)."""
    from pyspark.sql import functions as F

    from osm_coverage_spark.queries_graft import pyramid_counts
    from osm_coverage_spark.sources import derived, tables
    from osm_coverage_spark.streaming import incremental

    derived.register_derived_views(spark, sf_dir)
    img = spark.table("images").select("image_id", "lat", "lon", "w", "h")
    target = str(tmp_path / "img_table")
    tables.write_table(img, target)

    pyr1 = incremental_base = pyramid_counts(tables.read_table(spark, target))
    pyr1_rows = incremental_base.collect()  # materialize BEFORE the commit

    # commit: move every 7th image ~2 base cells north + grow it, and
    # insert 10 brand-new images in a fresh area
    img_no = F.regexp_extract("image_id", r"(\d+)", 1).cast("long")
    moved = (
        img.filter(img_no % 7 == 0)
        .withColumn("lat", F.col("lat") + F.lit(0.025))
        .withColumn("w", F.col("w") + F.lit(8))
    )
    fresh = spark.range(10).select(
        F.concat(F.lit("new_"), F.col("id").cast("string")).alias("image_id"),
        (F.lit(53.5) + F.col("id") * 0.001).alias("lat"),
        (F.lit(9.9) + F.col("id") * 0.001).alias("lon"),
        F.lit(64).cast("int").alias("w"),
        F.lit(48).cast("int").alias("h"),
    )
    tables.merge_upsert(
        spark, target, moved.unionByName(fresh), ("image_id",)
    )
    assert tables.current_version(target) == 2

    changes = tables.read_changes(spark, target, 1, 2)
    pyr1_df = spark.createDataFrame(pyr1_rows, pyr1.schema)
    inc = incremental.maintain_pyramid(pyr1_df, changes)
    full = pyramid_counts(tables.read_table(spark, target))

    got = sorted(map(tuple, inc.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(got) > 0


def test_rollback_table_restores_and_preserves_history(spark, tmp_path):
    """Rollback contract: live state returns to the target snapshot, the
    undone state is itself retained (history is append-only, never
    rewritten), and read_changes across the rollback is the inverse of
    the diff it undid."""
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, v int"
    )
    base.write.parquet(target)
    tables.merge_upsert(
        spark,
        target,
        spark.createDataFrame([("b", 20), ("c", 30)], "k string, v int"),
        ("k",),
    )
    assert tables.current_version(target) == 2

    new_live = tables.rollback_table(target, 1)
    assert new_live == 3
    # live state == snapshot 1 exactly
    assert sorted(map(tuple, tables.read_table(spark, target).collect())) == [
        ("a", 1), ("b", 2)
    ]
    # the undone v2 state is retained as snapshot 2 (history preserved)
    assert tables.snapshots(target) == [1, 2]
    assert sorted(
        map(tuple, tables.read_table_at(spark, target, 2).collect())
    ) == [("a", 1), ("b", 20), ("c", 30)]
    # changelog across the rollback = inverse of the merge's diff
    ch = {(r["_change_type"], r["k"], r["v"])
          for r in tables.read_changes(spark, target, 2, 3).collect()}
    assert ch == {("delete", "b", 20), ("delete", "c", 30), ("insert", "b", 2)}
