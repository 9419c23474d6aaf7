"""Data-layout operators: range clustering, z-order keys, compaction.

At 100 TB the dominant cost is how much of the table a scan must touch.
These operators control layout so parquet min/max statistics (and, on a
real lake, partition/file pruning) skip data:

- **Range clustering** — ``repartitionByRange(key) + sortWithinPartitions``
  gives each output file a disjoint key range, so a key-range filter reads
  one file instead of all of them (file-level skipping; property-tested).
- **Z-order key** — bit-interleaving two dimensions into one sort key keeps
  *both* columns' min/max ranges tight per file, the standard multi-column
  clustering trick (Delta/Iceberg OPTIMIZE ZORDER does the same).
- **Compaction** — rewrite many small files into few large ones; the
  small-file problem (per-file open/footer overhead, task-per-file
  scheduling) is a top-3 operational issue on large tables.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..registry import query
from ..session import load_table
from .io import _scratch


def clustered_write(df: DataFrame, path: str, cols: list[str], n_files: int) -> None:
    """Write ``df`` as ``n_files`` parquet files with disjoint sorted key
    ranges: a range shuffle assigns each row's file by sampled quantiles of
    the cluster key, then an in-partition sort makes every row group's
    min/max stats tight."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


@query(
    "s7_clustered_layout",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS total_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
""",
    category="sink",
)
def clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rewrite lineitem clustered by l_shipdate, then answer a one-month
    range query FROM THE CLUSTERED COPY. Values must equal querying the
    original (the oracle does); the pruning payoff — the filter touches ~1
    of the 8 files — is asserted separately in test_plans via footer
    min/max stats."""
    li = load_table(spark, sf_dir, "lineitem")
    path = _scratch(sf_dir, "lineitem_by_shipdate")
    clustered_write(li, path, ["l_shipdate"], 8)
    back = spark.read.parquet(path).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.floor(F.col("l_extendedprice") * 1000000.0 + 0.5).cast("bigint"))
            .cast("double")
            / 1000000.0
        ).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) key — multi-dimensional clustering
# ---------------------------------------------------------------------------

_ZBITS = 16


def zorder_key(x: Column, y: Column, bits: int = _ZBITS) -> Column:
    """Morton key interleaving the low ``bits`` of two non-negative ints:
    bit i of x → bit 2i, bit i of y → bit 2i+1. Pure JVM bit arithmetic
    (2·bits shift/mask terms, whole-stage codegen folds them); sort by the
    result before writing and BOTH columns cluster."""
    terms = [
        F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ] + [
        F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    return functools.reduce(lambda a, b: a + b, terms).cast("bigint")


def _zorder_sql(x: str, y: str, bits: int = _ZBITS) -> str:
    terms = [f"((({x} >> {i}) & 1) << {2 * i})" for i in range(bits)] + [
        f"((({y} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@query(
    "s8_zorder_key",
    oracle=f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       {_zorder_sql("l_partkey", "l_suppkey")} AS zkey
FROM lineitem
""",
    category="sink",
)
def zorder_key_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-order key over (l_partkey, l_suppkey) for every line — the
    sort key a ZORDER-style rewrite would range-cluster on so filters on
    EITHER column skip files. The oracle recomputes the identical bit
    interleave in SQL; integer bit ops are exact everywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zorder_key(F.col("l_partkey"), F.col("l_suppkey")).alias("zkey"),
    )


# ---------------------------------------------------------------------------
# Compaction — many small files → few right-sized files
# ---------------------------------------------------------------------------


@query(
    "s9_compaction",
    oracle="""
SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
FROM events
""",
    category="sink",
)
def compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately shatter events into 64 tiny files, then compact to 4
    with ``coalesce`` (no shuffle — files are concatenated by task) and
    return the compacted content, which must be byte-identical to the
    source. On a lake this runs as scheduled maintenance keyed on
    file-count/size thresholds."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    small = _scratch(sf_dir, "events_small_files")
    ev.repartition(64).write.mode("overwrite").parquet(small)
    compacted = _scratch(sf_dir, "events_compacted")
    spark.read.parquet(small).coalesce(4).write.mode("overwrite").parquet(compacted)
    n_small = len([f for f in os.listdir(small) if f.endswith(".parquet")])
    n_big = len([f for f in os.listdir(compacted) if f.endswith(".parquet")])
    # an (near-)empty source writes one file on both sides — nothing to
    # compact, which is success, not an invariant violation
    assert n_big < n_small or n_small <= 4, (n_big, n_small)
    return spark.read.parquet(compacted)


# ---------------------------------------------------------------------------
# S16 — bucket pruning: equality filters read only the matching bucket
# ---------------------------------------------------------------------------


@query(
    "s16_bucket_pruning",
    oracle="""
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_spend
FROM orders WHERE o_custkey IN (7, 11)
GROUP BY o_custkey
""",
    category="source",
)
def bucket_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key lookup on a bucketed table: the IN filter on the bucketing
    column scans ONLY the matching buckets (SelectedBucketsCount in the
    plan — asserted in tests/test_plans.py) and the groupBy on the same
    column needs NO shuffle — layout as both index and pre-partitioning,
    zero auxiliary structures. (The aggregation is what keeps the scan
    bucketed: Spark's planner falls back to a plain file scan when nothing
    downstream exploits bucketing.) The complement of j11's shuffle-free
    join — same write-time investment, two more payoffs."""
    from ..operators.joins import write_bucketed

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    table = f"o_bucket_prune_{tag}"
    path = _scratch(sf_dir, "orders_bucketed_prune")
    write_bucketed(o, table, "o_custkey", 16, path)
    return (
        spark.table(table)
        .filter(F.col("o_custkey").isin(7, 11))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")).cast(
                    "double"
                )
                / 100.0
            ).alias("total_spend"),
        )
    )
