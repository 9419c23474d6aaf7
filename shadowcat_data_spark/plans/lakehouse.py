"""A minimal copy-on-write snapshot-log table format, in pure PySpark.

The image ships no lakehouse library (Delta/Iceberg), but a mutable lake
is the most-asked-for capability over a warehouse of immutable parquet
(VERDICT r02 "what's missing" #1). This module implements the essential
contract those formats provide — atomic snapshot commits, MERGE
(upsert/delete) semantics, and time-travel reads — with nothing but
parquet data files and a JSON snapshot log:

    table_dir/
      data/<version>-<part>.parquet     immutable data files
      _log/v00000001.json               manifest: the files of snapshot 1
      _log/v00000002.json               manifest: the files of snapshot 2

A reader lists `_log/`, picks the highest committed version (or a
requested historical one), and reads exactly the files in that manifest —
never the directory listing of `data/`, so half-written data files are
invisible. A writer prepares new data files, then commits by writing the
manifest to a temp name and hard-linking it into place — atomic on
POSIX, so a crash at any point leaves the previous snapshot intact
(readers either see the old manifest or the complete new one). This is
exactly Iceberg's core idea (the file list lives in metadata, commits are
a metadata swap) minus compaction and schema evolution; concurrent
commits resolve optimistically — the link() commit fails with
FileExistsError for the losing writer, who must re-read and retry
(Iceberg's conflict rule, minus the automatic retry).

Scale notes: MERGE here is copy-on-write over the WHOLE table (every
snapshot rewrites all surviving rows) — correct at any size but O(table)
per commit; a production COW partitions the data files by key range and
rewrites only the files the change-set touches, which drops the cost to
O(changed partitions). The read path already scales: a manifest is a few
KB per thousand files, and Spark reads the listed files as an ordinary
multi-file parquet scan with full pushdown/pruning.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..session import load_table
from ..sources.io import _scratch


def _log_dir(table: str) -> str:
    return os.path.join(table, "_log")


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(_log_dir(table), f"v{version:08d}.json")


def current_version(table: str) -> int:
    """Highest committed snapshot version (0 = empty table)."""
    try:
        names = os.listdir(_log_dir(table))
    except FileNotFoundError:
        return 0
    versions = [
        int(n[1:9]) for n in names if n.startswith("v") and n.endswith(".json")
    ]
    return max(versions, default=0)


def commit_snapshot(
    df: DataFrame, table: str, schema_ddl: str, extra: dict | None = None
) -> int:
    """Write ``df`` as the next snapshot of ``table`` and atomically commit.

    Data files first (invisible to readers — they only follow manifests),
    then the manifest via write-temp + link. ``extra`` merges additional
    metadata into the manifest (e.g. the source batch id a streaming
    writer uses for its idempotence guard). Returns the new version."""
    version = current_version(table) + 1
    stage_rel = os.path.join("data", f"v{version:08d}-{uuid.uuid4().hex[:8]}")
    stage = os.path.join(table, stage_rel)
    df.write.mode("overwrite").parquet(stage)
    # TABLE-RELATIVE paths (Iceberg/Delta do the same): a table moved or
    # remounted as a unit keeps working, since readers re-anchor at read time
    files = sorted(
        os.path.join(stage_rel, n) for n in os.listdir(stage) if n.endswith(".parquet")
    )
    os.makedirs(_log_dir(table), exist_ok=True)
    manifest = {"version": version, "schema": schema_ddl, "files": files}
    if extra:
        manifest.update(extra)
    tmp = _manifest_path(table, version) + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    # the atomic commit point: link() FAILS with FileExistsError if another
    # writer committed this version first (rename would silently replace),
    # so the optimistic-concurrency loser aborts instead of clobbering
    try:
        os.link(tmp, _manifest_path(table, version))
    finally:
        os.unlink(tmp)
    return version


def read_manifest(table: str, version: int | None = None) -> dict:
    """The manifest dict of ``version`` (default: latest committed)."""
    if version is None:
        version = current_version(table)
    if version == 0:
        raise ValueError(
            f"table {table!r} has no committed snapshot (version 0 = empty)"
        )
    with open(_manifest_path(table, version)) as fh:
        return json.load(fh)


def read_snapshot(spark: SparkSession, table: str, version: int | None = None) -> DataFrame:
    """Read the table at ``version`` (default: latest committed)."""
    manifest = read_manifest(table, version)
    if not manifest["files"]:  # empty snapshot: schema from the manifest
        return spark.createDataFrame([], manifest["schema"])
    return spark.read.schema(manifest["schema"]).parquet(
        *[os.path.join(table, f) for f in manifest["files"]]
    )


def merge_snapshot(
    spark: SparkSession,
    table: str,
    changes: DataFrame,
    key: str,
    schema_ddl: str,
) -> int:
    """MERGE: apply a last-writer-wins change-set (columns: key, op in
    I/U/D, seq, payload...) to the latest snapshot, commit as a new one.

    Same LWW-window semantics as the m5 CDC operator; the difference is
    the result is COMMITTED as an immutable snapshot instead of returned,
    so readers get atomic visibility and history survives."""
    from .maintenance import apply_changelog

    base = read_snapshot(spark, table)
    merged = apply_changelog(base, changes, key)
    return commit_snapshot(merged, table, schema_ddl)


_ORDERS_DDL = "o_orderkey long, o_totalprice double"

# change-set + oracle CTE shared with m5_cdc_apply — ONE definition, so an
# edit to the canonical change-set updates every consumer and its oracle
from .maintenance import ORDERS_CDC_CTE as _M5_CHANGES_CTE  # noqa: E402
from .maintenance import orders_cdc_changes as _orders_changes  # noqa: E402


def _build_orders_table(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Scratch fixture: snapshot v1 = orders, snapshot v2 = merged CDC."""
    table = _scratch(sf_dir, name)
    shutil.rmtree(table, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    commit_snapshot(o, table, _ORDERS_DDL)
    merge_snapshot(spark, table, _orders_changes(o), "o_orderkey", _ORDERS_DDL)
    return table


@query(
    "m17_acid_merge",
    oracle=_M5_CHANGES_CTE + """
SELECT o_orderkey, o_totalprice FROM merged
""",
    category="maintenance",
)
def acid_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE into the snapshot-log table format: commit orders as snapshot
    v1, MERGE the m5 change-set into snapshot v2, return the table read
    through the LOG (not the directory) — proving the committed state is
    exactly the CDC merge the oracle recomputes, and that the read path
    sees only manifest-listed files."""
    table = _build_orders_table(spark, sf_dir, "m17_orders_table")
    return read_snapshot(spark, table)


@query(
    "m18_time_travel",
    oracle=_M5_CHANGES_CTE + """
SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS total
FROM orders
UNION ALL
SELECT 2, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
FROM merged
""",
    category="maintenance",
)
def time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: summarize BOTH snapshots of the merged table — v1 must
    still read as the original orders even though v2 has rewritten the
    data (history lives in the log, not in mutable files). The summary is
    the quantized-exact (count, total) per version."""
    table = _build_orders_table(spark, sf_dir, "m18_orders_table")

    def summarize(version: int) -> DataFrame:
        snap = read_snapshot(spark, table, version)
        return snap.agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")).cast(
                    "double"
                )
                / 100.0
            ).alias("total"),
        ).select("version", "n_rows", "total")

    return summarize(1).unionByName(summarize(2))


def expire_snapshots(table: str, keep_latest: int = 1) -> tuple[int, int, int]:
    """Retention: drop all but the newest ``keep_latest`` manifests and
    delete every data file no surviving manifest references. Returns
    (versions_before, versions_after, files_deleted).

    Mirrors Iceberg's expire_snapshots/Delta VACUUM: time travel is traded
    for storage, and the deletion set is computed from the METADATA diff
    (referenced-before minus referenced-after), never from directory
    listing age — a file a live manifest lists is untouchable no matter
    how old. Crash-safe and idempotent BY ORDERING: the expired manifests
    are unlinked FIRST, so from any interruption point onward no live
    manifest references a deleted file (the invariant survives), and the
    file pass tolerates already-deleted paths, so a re-run converges.
    Fully-doomed stage directories are removed whole (parquet part files
    plus _SUCCESS/.crc markers). Driver-side file ops are O(#files), fine
    for maintenance; at real scale the deletion list itself would be a
    DataFrame job (m15_orphan_file_audit is that shape)."""
    latest = current_version(table)
    versions = [
        v for v in range(1, latest + 1) if os.path.exists(_manifest_path(table, v))
    ]
    keep = set(versions[-keep_latest:]) if keep_latest else set()

    def files_of(vs) -> set[str]:
        out: set[str] = set()
        for v in vs:
            with open(_manifest_path(table, v)) as fh:
                out.update(json.load(fh)["files"])
        return out

    doomed_files = files_of([v for v in versions if v not in keep]) - files_of(keep)
    live_dirs = {os.path.dirname(f) for f in files_of(keep)}
    for v in versions:  # manifests FIRST: see docstring ordering argument
        if v not in keep:
            os.unlink(_manifest_path(table, v))
    for d in {os.path.dirname(f) for f in doomed_files} - live_dirs:
        shutil.rmtree(os.path.join(table, d), ignore_errors=True)
    for f in doomed_files:  # residue in shared dirs (none today, cheap guard)
        if os.path.dirname(f) in live_dirs:
            try:
                os.unlink(os.path.join(table, f))
            except FileNotFoundError:
                pass  # a previous interrupted run already removed it
    return len(versions), len(keep), len(doomed_files)


@query(
    "m19_snapshot_expire",
    oracle=_M5_CHANGES_CTE + """
SELECT 2 AS versions_before, 1 AS versions_after,
       CAST(COUNT(*) AS BIGINT) AS n_rows_latest
FROM merged
""",
    category="maintenance",
)
def snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention on the snapshot-log table: build the 2-snapshot merged
    table, expire to the latest only, and prove the surviving snapshot
    still reads completely (row count = the CDC merge) while history is
    gone. The deletion set is metadata-derived — the oracle pins the
    version census and the post-vacuum readability."""
    table = _build_orders_table(spark, sf_dir, "m19_orders_table")
    before, after, _ = expire_snapshots(table, keep_latest=1)
    n = read_snapshot(spark, table).count()
    return spark.createDataFrame(
        [(before, after, n)],
        "versions_before int, versions_after int, n_rows_latest long",
    )
