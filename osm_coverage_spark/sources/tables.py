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


# ---------------------------------------------------------------------------
# Snapshot history / time travel (Iceberg `VERSION AS OF` analog)
# ---------------------------------------------------------------------------
# Every merge_upsert commit RETAINS the pre-commit table directory as a
# numbered snapshot (Iceberg retains old data files + metadata; the
# stand-in retains the old directory) and appends to a JSON snapshot log.
# `read_table_at` replays any retained version; `expire_snapshots` is the
# `expireSnapshots` maintenance analog.

def _snap_dir(target: str) -> str:
    return f"{target}__snapshots"


def _snap_log(target: str) -> str:
    return f"{target}__snaplog.json"


def _read_snaplog(target: str) -> list[dict]:
    import json
    import os

    if not os.path.exists(_snap_log(target)):
        return []
    with open(_snap_log(target)) as f:
        return json.load(f)


def _append_snapshot(target: str, bak_dir: str) -> int:
    """Move the pre-commit directory into the snapshot store and log it.
    Caller holds the commit lock. Returns the new snapshot id."""
    import json
    import os

    log = _read_snaplog(target)
    sid = (log[-1]["id"] + 1) if log else 1
    os.makedirs(_snap_dir(target), exist_ok=True)
    dest = os.path.join(_snap_dir(target), f"v{sid}")
    os.rename(bak_dir, dest)
    log.append({"id": sid, "dir": dest})
    tmp = _snap_log(target) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(log, f)
    os.replace(tmp, _snap_log(target))
    return sid


def snapshots(target: str) -> list[int]:
    """Retained snapshot ids, oldest first (the live table is one newer
    than the last retained id)."""
    return [e["id"] for e in _read_snaplog(target)]


def read_table_at(spark: SparkSession, target: str,
                  version: int | None = None) -> DataFrame:
    """Time-travel read — `SELECT … VERSION AS OF version` analog.
    version=None (or one past the last retained id) reads the live table;
    otherwise the retained pre-commit state with that id is replayed."""
    log = _read_snaplog(target)
    if version is None or not log or version > log[-1]["id"]:
        return read_table(spark, target)
    for e in log:
        if e["id"] == version:
            return spark.read.parquet(e["dir"])
    raise ValueError(
        f"snapshot {version} of {target} not retained "
        f"(have {[e['id'] for e in log]})"
    )


def expire_snapshots(target: str, keep_last: int = 3,
                     timeout_s: float = 5.0) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots (Iceberg
    `expireSnapshots` analog). Returns the expired ids.

    Holds the same ``__commitlock`` merge_upsert commits under while
    rewriting the snapshot log (ADVICE r4): without it, a concurrent
    merge appending a snapshot between our read and our os.replace would
    have its log entry silently dropped (orphaned snapshot dir)."""
    import json
    import os
    import shutil
    import time

    lock = f"{target}__commitlock"
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"expire_snapshots: commit lock {lock} busy > {timeout_s}s"
                )
            time.sleep(0.02)
    try:
        log = _read_snaplog(target)
        expired = log[:-keep_last] if keep_last else log
        kept = log[-keep_last:] if keep_last else []
        for e in expired:
            shutil.rmtree(e["dir"], ignore_errors=True)
        tmp = _snap_log(target) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(kept, f)
        os.replace(tmp, _snap_log(target))
        return [e["id"] for e in expired]
    finally:
        os.close(fd)
        os.unlink(lock)


def current_version(target: str) -> int:
    """State-version of the LIVE table: snapshot id v retains the state
    BEFORE commit v, so after k commits the live state is version k+1
    (and version 1 before any commit)."""
    log = _read_snaplog(target)
    return (log[-1]["id"] + 1) if log else 1


def read_changes(
    spark: SparkSession,
    target: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Iceberg changelog (incremental read / CDC) analog: the row-level
    diff between two retained state versions, as the source rows plus a
    ``_change_type`` column ('insert' | 'delete'; an update appears as a
    delete of the old row + an insert of the new one — Iceberg's
    pre/post-image pair). ``to_version=None`` diffs against the live
    table.

    The stand-in computes the diff with two multiset ``exceptAll``s over
    the retained snapshot directories (raises if ``from_version`` was
    expired); real Iceberg derives the same rows from manifest metadata
    without scanning both states — call sites written against this
    contract swap over with table identifiers alone."""
    if to_version is None:
        to_version = current_version(target)
    if from_version > to_version:
        raise ValueError(
            f"from_version {from_version} is newer than to_version {to_version}"
        )
    old = read_table_at(spark, target, from_version)
    new = read_table_at(spark, target, to_version)
    if set(old.columns) != set(new.columns):
        # schema evolved between the versions: diff on the superset
        # schema, missing columns as NULL (a row whose new column is
        # non-NULL correctly shows up as delete(pre) + insert(post))
        for c in new.columns:
            if c not in old.columns:
                old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
        for c in old.columns:
            if c not in new.columns:
                new = new.withColumn(c, F.lit(None).cast(old.schema[c].dataType))
        new = new.select(*old.columns)
    ins = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
    dels = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
    return ins.unionByName(dels)


def _table_version(target: str) -> tuple[int, int]:
    """Commit token of the parquet stand-in: the target directory's inode +
    mtime. Every committed swap replaces the directory (rename), so a
    changed token == someone else committed — Iceberg's snapshot-id
    analog."""
    import os

    st = os.stat(target)
    return (st.st_ino, st.st_mtime_ns)


def merge_upsert(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    max_retries: int = 5,
    evolve_schema: bool = False,
) -> None:
    """MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT.

    Iceberg executes the real MERGE; the parquet stand-in rewrites the
    target deterministically via anti-join + union (the same semantics
    operators/history.upsert_history uses for the lazy in-plan form) —
    with Iceberg's OPTIMISTIC CONCURRENCY contract: the table version
    (snapshot id analog) is captured at read, re-checked under a commit
    lock before the swap, and a concurrent commit triggers a re-read +
    re-merge retry instead of a lost update. Last-writer-wins applies only
    per conflicting key (exactly MERGE semantics); non-conflicting rows
    from a concurrent commit survive.

    ``evolve_schema``: Iceberg ``mergeSchema`` analog — updates may carry
    NEW columns (existing rows get NULL there) and may omit existing
    non-key columns (inserted/updated rows get NULL there). Retained
    snapshots keep their own (pre-evolution) schema, exactly like
    Iceberg's per-snapshot schema id; read_changes aligns the two schemas
    before diffing. Off by default: an unexpected schema mismatch should
    fail loudly, not silently widen the table."""
    if iceberg_available(spark) and "." in target:
        updates.createOrReplaceTempView("_merge_src")
        on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
        spark.sql(
            f"MERGE INTO {target} t USING _merge_src s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
        return
    import os
    import shutil
    import time
    import uuid

    lock = f"{target}__commitlock"
    for _ in range(max_retries):
        ver = _table_version(target)
        current = read_table(spark, target)
        if not evolve_schema and set(updates.columns) != set(current.columns):
            raise ValueError(
                f"merge_upsert schema mismatch (target {current.columns} vs "
                f"updates {updates.columns}); pass evolve_schema=True to "
                "widen the table"
            )
        keep = current.join(
            updates.select(*key_cols), list(key_cols), "left_anti"
        )
        merged = keep.unionByName(updates, allowMissingColumns=evolve_schema)
        token = uuid.uuid4().hex[:8]
        tmp = f"{target}__merge_{token}"
        bak = f"{target}__bak_{token}"
        try:
            # executes the read: a swap racing this write can yank files —
            # surfaces as an IO error, handled as a conflict (retry)
            merged.write.mode("overwrite").parquet(tmp)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            time.sleep(0.05)
            continue
        # commit lock: one swapper at a time (O_EXCL creation)
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            shutil.rmtree(tmp, ignore_errors=True)
            time.sleep(0.05)
            continue
        try:
            if _table_version(target) != ver:
                # someone committed since our read → retry on fresh state
                shutil.rmtree(tmp, ignore_errors=True)
                continue
            # crash-safe swap: at any point either the old or the new
            # table exists (never neither)
            os.rename(target, bak)
            try:
                os.rename(tmp, target)
            except Exception:
                os.rename(bak, target)  # roll back; tmp left for inspection
                raise
            # retain the pre-commit state as a numbered snapshot
            # (time-travel reads via read_table_at; expire_snapshots
            # bounds retention) — Iceberg keeps old data files the same way
            _append_snapshot(target, bak)
            return
        finally:
            os.close(fd)
            os.unlink(lock)
    raise RuntimeError(
        f"merge_upsert: gave up after {max_retries} concurrent-commit retries"
    )


def rollback_table(target: str, version: int, timeout_s: float = 5.0) -> int:
    """Iceberg `rollback_to_snapshot` analog: make the retained snapshot
    ``version`` the LIVE table state again — as a NEW commit, never by
    rewriting history (the replaced live state is itself retained as the
    next snapshot, so a rollback is visible in the log and `read_changes`
    across it yields the inverse diff of the commits it undid).

    Runs under the same ``__commitlock`` as merge_upsert/expire_snapshots
    with the identical crash-safe swap: at any instant either the old or
    the new live directory exists. The log read AND the snapshot copy both
    happen under the lock (r5 ADVICE #2): outside it, a concurrent
    expire_snapshots could delete ``entry['dir']`` mid-copytree and the
    validated log could be stale by swap time. Returns the new live
    version id."""
    import os
    import shutil
    import time

    staging = f"{target}__rollback_tmp"
    bak = f"{target}__rollback_bak"

    lock = f"{target}__commitlock"
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"rollback_table: commit lock {lock} busy > {timeout_s}s"
                )
            time.sleep(0.02)
    try:
        log = _read_snaplog(target)
        entry = next((e for e in log if e["id"] == version), None)
        if entry is None:
            raise ValueError(
                f"snapshot {version} of {target} not retained "
                f"(have {[e['id'] for e in log]})"
            )
        shutil.rmtree(staging, ignore_errors=True)
        shutil.copytree(entry["dir"], staging)
        os.rename(target, bak)
        try:
            os.rename(staging, target)
        except Exception:
            os.rename(bak, target)
            raise
        _append_snapshot(target, bak)
        return current_version(target)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        os.close(fd)
        os.unlink(lock)
