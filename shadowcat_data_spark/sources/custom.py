"""Custom connector via the Python Data Source API (Spark 4).

The reference's ecosystem pulls from bespoke feeds (dumps, HTTP APIs);
Spark 4's ``DataSource`` API is the idiomatic way to wrap such a feed as a
first-class, partition-parallel ``spark.read.format(...)`` — no JVM code.
This module registers a deterministic synthetic feed ("rangelog") that
stands in for any record-oriented external source: the reader declares its
partitions up front, each partition streams its slice independently on an
executor, and Catalyst sees an ordinary relation (projection pushdown
works; filters evaluate above the scan like for any non-indexed feed).

Scale note: partition count is the parallelism contract — a real feed
wrapper maps shards/pages/byte-ranges to ``InputPartition``s exactly like
this, and 1000 executors each pull only their slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..session import load_table  # noqa: F401  (kept for API symmetry)

try:  # the Python Data Source API exists in PySpark 4.x
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    _HAVE_PYDS = True
except ImportError:  # pragma: no cover - older PySpark
    _HAVE_PYDS = False
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]


class _RangeLogPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RangeLogReader(DataSourceReader):
    """Reader: N log records split into P partitions of contiguous ranges."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))
        return [
            _RangeLogPartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangeLogPartition):
        for i in range(partition.start, partition.end):
            yield (i, f"log-{i}", i % 5)


class RangeLogDataSource(DataSource):
    """``spark.read.format("rangelog").option("n", ...)`` source."""

    @classmethod
    def name(cls) -> str:
        return "rangelog"

    def schema(self) -> str:
        return "i bigint, msg string, level int"

    def reader(self, schema) -> RangeLogReader:
        return RangeLogReader(self.options)


def register_rangelog(spark: SparkSession) -> None:
    """Idempotent registration on the given session."""
    if _HAVE_PYDS:
        spark.dataSource.register(RangeLogDataSource)


@query(
    "s12_python_datasource",
    oracle="""
SELECT CAST(level AS INTEGER) AS level,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(i) AS BIGINT) AS sum_i,
       MIN(msg) AS first_msg
FROM (SELECT i, concat('log-', i) AS msg, i % 5 AS level FROM range(1000) t(i))
GROUP BY 1
""",
    category="source",
)
def python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the registered custom Python data source and aggregate.
    The feed is deterministic (range-derived), so DuckDB reproduces it from
    ``range()`` — proving the connector delivers exactly the declared
    relation, partition-parallel. Raises NotImplementedError only if the
    runtime predates the Python Data Source API (PySpark < 4)."""
    if not _HAVE_PYDS:
        raise NotImplementedError("Python Data Source API requires PySpark 4+")
    register_rangelog(spark)
    feed = (
        spark.read.format("rangelog")
        .option("n", "1000")
        .option("partitions", "8")
        .load()
    )
    return feed.groupBy(F.col("level").cast("int").alias("level")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("i").cast("long").alias("sum_i"),
        F.min("msg").alias("first_msg"),
    )


# ---------------------------------------------------------------------------
# Custom SINK via the Python Data Source writer API
# ---------------------------------------------------------------------------

if _HAVE_PYDS:
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _JsonlCommit(WriterCommitMessage):
        def __init__(self, path: str, rows: int):
            self.path = path
            self.rows = rows

    class JsonlWriter(DataSourceWriter):
        """Per-partition writer: each task streams its rows to ONE .jsonl
        part file and reports it in the commit message — the same
        task-commit protocol every distributed sink needs (files become
        visible only if the job commits; a failed task's file is simply
        never reported)."""

        def __init__(self, options):
            self.path = options.get("path")

        def write(self, iterator):
            import json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
            n = 0
            with open(part, "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict()) + "\n")
                    n += 1
            return _JsonlCommit(part, n)

        def commit(self, messages):
            import json
            import os

            manifest = [
                {"path": m.path, "rows": m.rows} for m in messages if m is not None
            ]
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
                json.dump(manifest, fh)

        def abort(self, messages):
            import os
            import shutil

            shutil.rmtree(self.path, ignore_errors=True)

    class JsonlSinkDataSource(DataSource):
        """``df.write.format("jsonlsink").option("path", ...)`` sink."""

        @classmethod
        def name(cls) -> str:
            return "jsonlsink"

        def writer(self, schema, overwrite: bool) -> JsonlWriter:
            return JsonlWriter(self.options)

    def register_jsonl_sink(spark: SparkSession) -> None:
        spark.dataSource.register(JsonlSinkDataSource)


@query(
    "s13_python_datasink",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    category="sink",
)
def python_datasink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write nation through the custom Python sink (per-task part files +
    job-commit manifest), then read the .jsonl back with an explicit
    schema. Round-trip equality against the source table proves the sink
    loses nothing and the commit protocol reported every partition."""
    if not _HAVE_PYDS:
        raise NotImplementedError("Python Data Source API requires PySpark 4+")
    import json
    import os
    import shutil
    import tempfile

    register_jsonl_sink(spark)
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(tempfile.gettempdir(), "shadowcat_jsonl_sink", tag)
    shutil.rmtree(path, ignore_errors=True)
    n = load_table(spark, sf_dir, "nation")
    n.write.format("jsonlsink").option("path", path).mode("append").save()
    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert sum(m["rows"] for m in manifest) == n.count(), "manifest undercounts"
    return (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .json(os.path.join(path, "part-*.jsonl"))
    )


# ---------------------------------------------------------------------------
# Custom STREAMING source via SimpleDataSourceStreamReader
# ---------------------------------------------------------------------------

if _HAVE_PYDS:
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class RangeLogStreamReader(SimpleDataSourceStreamReader):
        """Offset-tracked micro-batch feed: each poll emits one
        deterministic batch and advances the offset; replay between two
        committed offsets regenerates identical rows — the property that
        gives a custom source exactly-once semantics under checkpoint
        recovery (offsets are durable, data is re-derivable)."""

        def __init__(self, options):
            self.batches = int(options.get("batches", 5))
            self.rows = int(options.get("rows_per_batch", 200))

        def initialOffset(self):
            return {"batch": 0}

        def _rows(self, b: int):
            return [(b, b * self.rows + i) for i in range(self.rows)]

        def read(self, start):
            b = int(start["batch"])
            if b >= self.batches:
                return (iter([]), start)
            return (iter(self._rows(b)), {"batch": b + 1})

        def readBetweenOffsets(self, start, end):
            out = []
            for b in range(int(start["batch"]), int(end["batch"])):
                out.extend(self._rows(b))
            return iter(out)

    class RangeLogStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "rangelogstream"

        def schema(self) -> str:
            return "batch int, value bigint"

        def simpleStreamReader(self, schema) -> RangeLogStreamReader:
            return RangeLogStreamReader(self.options)

    def register_rangelog_stream(spark: SparkSession) -> None:
        spark.dataSource.register(RangeLogStreamDataSource)


@query(
    "t14_python_stream_source",
    oracle="""
SELECT CAST(i // 200 AS INTEGER) AS batch,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(i) AS BIGINT) AS sum_value
FROM range(1000) t(i)
GROUP BY 1
""",
    category="streaming",
)
def python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream from the custom Python source (5 deterministic micro-batches
    of 200 rows), aggregate per batch in complete mode. The oracle
    reproduces the feed from ``range()`` — the source delivered every
    offset exactly once."""
    if not _HAVE_PYDS:
        raise NotImplementedError("Python Data Source API requires PySpark 4+")
    register_rangelog_stream(spark)
    stream = (
        spark.readStream.format("rangelogstream")
        .option("batches", "5")
        .option("rows_per_batch", "200")
        .load()
    )
    agg = stream.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").cast("long").alias("sum_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t14_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("t14_out")


# ---------------------------------------------------------------------------
# T20 — stream the lakehouse change data feed (snapshot versions as offsets)
# ---------------------------------------------------------------------------

if _HAVE_PYDS:

    def _cdf_rows_for_version(table: str, v: int, key: str, val_cols: list[str]):
        """Driver-side incremental CDF for ONE commit: diff only the files
        the commit replaced/added (carried files are the same file — no
        diff by construction), via pyarrow. This mirrors
        ``lakehouse.snapshot_changes_incremental`` row for row; the
        executor-sized variant is that DataFrame job — a stream SOURCE
        polls on the driver, so it reads only O(changed partitions) per
        batch, which is what keeps tailing a 100 TB table feasible."""
        import os

        import pyarrow.parquet as pq

        from ..plans.lakehouse import read_manifest

        prev = read_manifest(table, v - 1)
        cur = read_manifest(table, v)
        prev_files, cur_files = set(prev["files"]), set(cur["files"])

        def load(files):
            out = {}
            for f in sorted(files):
                t = pq.read_table(os.path.join(table, f))
                cols = {c: t.column(c).to_pylist() if c in t.column_names
                        else [None] * t.num_rows
                        for c in [key, *val_cols]}
                for i in range(t.num_rows):
                    out[cols[key][i]] = tuple(cols[c][i] for c in val_cols)
            return out

        old = load([f for f in prev["files"] if f not in cur_files])
        new = load([f for f in cur["files"] if f not in prev_files])
        rows = []
        for k in sorted(set(old) | set(new), key=lambda x: (x is None, x)):
            if k not in old:
                rows.append((k, "I", *new[k]))
            elif k not in new:
                rows.append((k, "D", *([None] * len(val_cols))))
            elif old[k] != new[k]:
                rows.append((k, "U", *new[k]))
        return rows

    class SnapshotCDFStreamReader(SimpleDataSourceStreamReader):
        """The lakehouse table AS A STREAM: offsets are snapshot
        versions, each micro-batch is one commit's incremental change
        feed. Replay between committed offsets re-derives identical rows
        from the immutable snapshots — the exactly-once-under-recovery
        property t14's range source demonstrates, here on real data:
        offsets are durable, CDF rows are re-derivable forever (until
        expire_snapshots trades that history for storage)."""

        def __init__(self, options):
            self.table = options["table"]
            self.key = options["key"]
            self.val_cols = [c for c in options["val_cols"].split(",") if c]
            self.start = int(options.get("start_version", 1))

        def initialOffset(self):
            return {"version": self.start}

        def read(self, start):
            from ..plans.lakehouse import current_version

            v = int(start["version"])
            if v >= current_version(self.table):
                return (iter([]), start)
            return (
                iter(_cdf_rows_for_version(self.table, v + 1, self.key, self.val_cols)),
                {"version": v + 1},
            )

        def readBetweenOffsets(self, start, end):
            rows = []
            for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
                rows.extend(
                    _cdf_rows_for_version(self.table, v, self.key, self.val_cols)
                )
            return iter(rows)

    class SnapshotCDFStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "snapshotcdf"

        def schema(self) -> str:
            return self.options["ddl"]

        def simpleStreamReader(self, schema) -> SnapshotCDFStreamReader:
            return SnapshotCDFStreamReader(self.options)

    def register_snapshot_cdf_stream(spark: SparkSession) -> None:
        spark.dataSource.register(SnapshotCDFStreamDataSource)


@query(
    "t20_stream_lakehouse_cdf",
    oracle="""
WITH changes AS (
  SELECT o_orderkey AS k, 'U' AS op, 1 AS seq, o_totalprice + 10.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 5 = 1 AND o_orderkey BETWEEN 1 AND 400
  UNION ALL
  SELECT o_orderkey, 'U', 2, o_totalprice + 20.0
  FROM orders WHERE o_orderkey % 5 = 1 AND o_orderkey % 3 = 0 AND o_orderkey BETWEEN 1 AND 400
  UNION ALL
  SELECT o_orderkey, 'D', 1, NULL
  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey BETWEEN 1 AND 400
  UNION ALL
  SELECT o_orderkey + 30000000, 'I', 1, o_totalprice
  FROM orders WHERE o_orderkey % 5 = 2 AND o_orderkey BETWEEN 1 AND 400
),
latest AS (
  SELECT k, op, o_totalprice
  FROM changes QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) = 1
),
merged AS (
  SELECT k AS o_orderkey, o_totalprice FROM (
    SELECT s.o_orderkey AS k,
           CASE WHEN c.op = 'U' THEN c.o_totalprice ELSE s.o_totalprice END AS o_totalprice,
           c.op
    FROM orders s LEFT JOIN latest c ON s.o_orderkey = c.k
    WHERE c.op IS NULL OR c.op = 'U'
    UNION ALL
    SELECT k, o_totalprice, op FROM latest WHERE op = 'I'
  )
)
SELECT COALESCE(m.o_orderkey, s.o_orderkey) AS o_orderkey,
       CASE WHEN s.o_orderkey IS NULL THEN 'I'
            WHEN m.o_orderkey IS NULL THEN 'D'
            ELSE 'U' END AS op,
       m.o_totalprice
FROM orders s FULL OUTER JOIN merged m ON s.o_orderkey = m.o_orderkey
WHERE s.o_orderkey IS NULL OR m.o_orderkey IS NULL
   OR s.o_totalprice IS DISTINCT FROM m.o_totalprice
UNION ALL
SELECT o_orderkey, 'D', CAST(NULL AS DOUBLE)
FROM merged WHERE o_orderkey % 11 = 0 AND o_orderkey BETWEEN 1 AND 200
""",
    category="streaming",
)
def stream_lakehouse_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read-side completion of the streaming+lakehouse matrix (t18/
    t19 write INTO the table; this streams OUT of it): a custom source
    whose offsets are snapshot versions feeds each commit's incremental
    change feed as one micro-batch. Two commits after the start version
    → two batches; the accumulated stream must equal the two diffs the
    oracle recomputes (ranged CDC merge, then ranged deletes — a delete
    of an already-deleted key must NOT re-appear in the feed)."""
    if not _HAVE_PYDS:
        raise NotImplementedError("Python Data Source API requires PySpark 4+")
    from pyspark.sql import functions as F

    from ..plans.lakehouse import (
        _fresh_partitioned_orders,
        _orders_ranged_changes,
        merge_partitioned,
    )

    table = _fresh_partitioned_orders(spark, sf_dir, "t20_orders_ptable")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    merge_partitioned(spark, table, _orders_ranged_changes(o))  # v2
    dels = o.filter(
        (F.col("o_orderkey") % 11 == 0) & F.col("o_orderkey").between(1, 200)
    ).select(
        "o_orderkey", F.lit("D").alias("op"), F.lit(1).alias("seq"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    merge_partitioned(spark, table, dels)  # v3
    register_snapshot_cdf_stream(spark)
    stream = (
        spark.readStream.format("snapshotcdf")
        .option("table", table)
        .option("key", "o_orderkey")
        .option("val_cols", "o_totalprice")
        .option("ddl", "o_orderkey long, op string, o_totalprice double")
        .option("start_version", "1")
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t20_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("t20_out")


# ---------------------------------------------------------------------------
# Batch source for snapshot-log tables: spark.read.format("snapshotlog")
# ---------------------------------------------------------------------------

if _HAVE_PYDS:

    class _SnapFilePartition(InputPartition):
        """One manifest data file = one scan task, carrying everything the
        executor needs: the file's absolute path, its commit seq, and the
        (path, seq) list of equality-delete files — so MERGE-ON-READ
        delete application happens PER TASK with zero driver involvement,
        exactly how an Iceberg reader schedules v2 deletes."""

        def __init__(self, path: str, seq: int, deletes: list, key: str, cols: list):
            self.path = path
            self.seq = seq
            self.deletes = deletes  # [(abs_path, seq)]
            self.key = key
            self.cols = cols

    class SnapshotLogReader(DataSourceReader):
        """Plans one partition per manifest-listed data file of the
        requested version (options: ``path``, optional ``version``)."""

        def __init__(self, options):
            self.table = options["path"]
            self.version = options.get("version")

        def partitions(self):
            import os

            from ..plans.lakehouse import read_manifest

            man = read_manifest(
                self.table, int(self.version) if self.version else None
            )
            stats = man.get("stats") or {}
            dfiles = [
                (os.path.join(self.table, rel), int(st["seq"]))
                for rel, st in (man.get("delete_files") or {}).items()
            ]
            key = (man.get("partition") or {}).get("key", "")
            # column order from the DDL (flat schemas only — the snapshot
            # tables this format manages are scalar-columned by design;
            # a nested type's comma would need a real DDL parser)
            cols = [c.split()[0] for c in man["schema"].split(",")]
            parts = [
                _SnapFilePartition(
                    os.path.join(self.table, f),
                    int(stats.get(f, {}).get("seq", 0)),
                    dfiles,
                    key,
                    cols,
                )
                for f in man["files"]
            ]
            # zero-file snapshot: one no-op partition keeps the scan valid
            return parts or [_SnapFilePartition("", 0, [], key, cols)]

        def read(self, partition: _SnapFilePartition):
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            if not partition.path:
                return
            # task-local equality-delete set: keys from every delete file
            # that postdates this data file's commit (the seq rule)
            doomed = None
            applicable = [p for p, s in partition.deletes if s > partition.seq]
            if applicable:
                doomed = pa.concat_tables(
                    [pq.read_table(p, columns=[partition.key]) for p in applicable]
                )[partition.key]
            for batch in pq.ParquetFile(partition.path).iter_batches():
                t = pa.Table.from_batches([batch]).select(partition.cols)
                if doomed is not None and len(doomed):
                    t = t.filter(
                        pc.invert(pc.is_in(t[partition.key], value_set=doomed))
                    )
                yield from t.to_batches()

    class SnapshotLogDataSource(DataSource):
        """``spark.read.format("snapshotlog").option("path", table)`` —
        the snapshot-log table format as a first-class Spark relation.
        The schema comes from the manifest (not file inference), time
        travel is ``option("version", N)``, and merge-on-read delete
        files are applied inside each scan task from Arrow batches."""

        @classmethod
        def name(cls) -> str:
            return "snapshotlog"

        def schema(self) -> str:
            from ..plans.lakehouse import read_manifest

            v = self.options.get("version")
            return read_manifest(self.options["path"], int(v) if v else None)[
                "schema"
            ]

        def reader(self, schema) -> SnapshotLogReader:
            return SnapshotLogReader(self.options)

    def register_snapshotlog(spark: SparkSession) -> None:
        spark.dataSource.register(SnapshotLogDataSource)


@query(
    "s17_snapshotlog_source",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_now,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_now,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_v1
FROM orders
WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey BETWEEN 1 AND 2000)
""",
    category="source",
)
def snapshotlog_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lakehouse as a registered Spark format: a partitioned orders
    table takes a merge-on-read DELETE, then is read back with
    ``spark.read.format("snapshotlog")`` — one scan task per manifest
    file, equality-delete keys subtracted task-locally from Arrow
    batches (no driver-side anti-join anywhere in the plan), plus a
    time-travel read of v1 through ``option("version")`` proving the
    pre-delete state. Must equal the raw-parquet oracle on both counts."""
    if not _HAVE_PYDS:
        raise NotImplementedError("Python Data Source API requires PySpark 4+")
    from ..plans.lakehouse import _fresh_partitioned_orders
    from ..plans.lakehouse_mor import delete_mor

    table = _fresh_partitioned_orders(spark, sf_dir, "s17_orders_ptable")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    delete_mor(
        spark,
        table,
        o.filter(
            (F.col("o_orderkey") % 5 == 0) & F.col("o_orderkey").between(1, 2000)
        ).select("o_orderkey"),
    )
    register_snapshotlog(spark)
    now = spark.read.format("snapshotlog").option("path", table).load()
    v1 = (
        spark.read.format("snapshotlog")
        .option("path", table)
        .option("version", "1")
        .load()
    )
    return now.agg(
        F.count(F.lit(1)).alias("n_now"),
        (
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")).cast(
                "double"
            )
            / 100.0
        ).alias("total_now"),
    ).crossJoin(v1.agg(F.count(F.lit(1)).alias("n_v1")))
