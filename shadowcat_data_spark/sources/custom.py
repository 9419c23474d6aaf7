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
