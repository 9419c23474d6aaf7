"""Database-maintenance jobs (the reference's core workload, SURVEY.md
§1.1 [RECON]: collection scan → per-record check/transform → report),
re-expressed as declarative Spark plans.

Each job is one pass over the table(s) with the work pushed into
aggregates/joins — no per-record cursor loop, no driver-side iteration.
At 100 TB these are the jobs you schedule nightly: diff two snapshots,
audit referential integrity, profile column health, fill calendar gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import query
from ..session import load_table

# ---------------------------------------------------------------------------
# M1 — snapshot diff (added / removed / changed between two table versions)
# ---------------------------------------------------------------------------


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key``: one output row per
    difference, labeled added/removed/changed. A single full-outer join on
    the key with a content-hash compare — the content hash collapses the
    change check to one column regardless of table width."""
    h = F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in compare_cols]), 256)
    o = old.select(F.col(key).alias("k"), h.alias("h_old"))
    n = new.select(F.col(key).alias("k"), h.alias("h_new"))
    j = o.join(n, "k", "full_outer")
    return j.select(
        F.col("k").alias(key),
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "changed")
        .alias("change"),
    ).filter(F.col("change").isNotNull())


@query(
    "m1_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT c_custkey, sha256(concat_ws(chr(31), CAST(c_name AS VARCHAR),
                                     CAST(c_acctbal AS VARCHAR))) AS h
  FROM customer WHERE c_custkey % 10 <> 0
), new AS (
  SELECT c_custkey, sha256(concat_ws(chr(31), CAST(c_name AS VARCHAR),
    CAST(CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 50.0 ELSE c_acctbal END AS VARCHAR))) AS h
  FROM customer WHERE c_custkey % 11 <> 0
)
SELECT COALESCE(old.c_custkey, new.c_custkey) AS c_custkey,
       CASE WHEN old.h IS NULL THEN 'added'
            WHEN new.h IS NULL THEN 'removed'
            WHEN old.h <> new.h THEN 'changed' END AS change
FROM old FULL OUTER JOIN new ON old.c_custkey = new.c_custkey
WHERE CASE WHEN old.h IS NULL THEN 'added'
           WHEN new.h IS NULL THEN 'removed'
           WHEN old.h <> new.h THEN 'changed' END IS NOT NULL
ORDER BY c_custkey
""",
    category="maintenance",
)
def snapshot_diff_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two synthetic customer snapshots (old = drops every 10th key,
    new = drops every 11th and bumps every 7th balance) — the nightly
    'what changed since yesterday' reconciliation job."""
    c = load_table(spark, sf_dir, "customer")
    old = c.filter(F.col("c_custkey") % 10 != 0)
    new = c.filter(F.col("c_custkey") % 11 != 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 50.0).otherwise(
            F.col("c_acctbal")
        ),
    )
    return snapshot_diff(old, new, "c_custkey", ["c_name", "c_acctbal"]).orderBy(
        "c_custkey"
    )


# ---------------------------------------------------------------------------
# M2 — referential-integrity audit (orphaned foreign keys across relations)
# ---------------------------------------------------------------------------


@query(
    "m2_fk_audit",
    oracle="""
SELECT relation, CAST(n_orphans AS BIGINT) AS n_orphans FROM (
  SELECT 'lineitem.l_orderkey -> orders' AS relation, COUNT(*) AS n_orphans
  FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
  UNION ALL
  SELECT 'orders.o_custkey -> customer', COUNT(*)
  FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
  UNION ALL
  SELECT 'customer.c_nationkey -> nation', COUNT(*)
  FROM customer WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
)
ORDER BY relation
""",
    category="maintenance",
)
def fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count orphaned foreign keys for each declared relation — the
    integrity sweep a registry runs after every bulk load. Each check is
    an anti join (dimension side broadcast when small); the per-relation
    counts union into one report."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def orphans(child: DataFrame, ck: str, parent: DataFrame, pk: str, label: str):
        return (
            child.join(parent.select(pk), child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("relation"), "n_orphans")
        )

    return (
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey -> orders")
        .unionByName(orphans(o, "o_custkey", c, "c_custkey", "orders.o_custkey -> customer"))
        .unionByName(orphans(c, "c_nationkey", n, "n_nationkey", "customer.c_nationkey -> nation"))
        .orderBy("relation")
    )


# ---------------------------------------------------------------------------
# M3 — column-health profile (null/distinct/min/max per column, one pass)
# ---------------------------------------------------------------------------


@query(
    "m3_table_profile",
    oracle="""
SELECT col, CAST(n_null AS BIGINT) AS n_null,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       min_str, max_str
FROM (
  SELECT 'o_orderstatus' AS col, COUNT(*) - COUNT(o_orderstatus) AS n_null,
         COUNT(DISTINCT o_orderstatus) AS n_distinct,
         CAST(MIN(o_orderstatus) AS VARCHAR) AS min_str,
         CAST(MAX(o_orderstatus) AS VARCHAR) AS max_str
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
         COUNT(DISTINCT o_orderpriority),
         CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey),
         CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
  FROM orders
)
ORDER BY col
""",
    category="maintenance",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-health profile of ``orders`` (nulls, distincts, min/max as
    strings) — the data-quality report. All three columns profile in ONE
    scan: the per-column aggregates run side-by-side in a single agg, then
    unpivot into the (col, stats) report shape."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    wide = o.agg(
        *[
            a
            for c in cols
            for a in (
                (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
                F.countDistinct(c).alias(f"{c}__n_distinct"),
                # min/max on the NATIVE type (numeric order for ints), cast
                # the result to string for the uniform report schema
                F.min(F.col(c)).cast("string").alias(f"{c}__min_str"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max_str"),
            )
        ]
    )
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__n_null").alias("n_null"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_str").alias("min_str"),
                F.col(f"{c}__max_str").alias("max_str"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(per_col).alias("p"))
        .select("p.col", "p.n_null", "p.n_distinct", "p.min_str", "p.max_str")
        .orderBy("col")
    )


# ---------------------------------------------------------------------------
# M4 — calendar gap-fill + last-observation-carried-forward (time series)
# ---------------------------------------------------------------------------


@query(
    "m4_gap_fill_locf",
    oracle="""
WITH daily AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < 10 GROUP BY 1, 2
), bounds AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
), calendar AS (
  SELECT u.user_id, g.day
  FROM (SELECT DISTINCT user_id FROM daily) u,
       LATERAL (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
                FROM bounds) g
)
SELECT c.user_id, c.day,
       COALESCE(d.n, 0) AS n,
       COALESCE(d.n,
         (SELECT d2.n FROM daily d2
          WHERE d2.user_id = c.user_id AND d2.day < c.day
          ORDER BY d2.day DESC LIMIT 1)
       ) AS n_locf
FROM calendar c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
ORDER BY c.user_id, c.day
""",
    category="maintenance",
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily event counts: generate the full calendar
    (sequence + explode — no driver-side date loop), left-join observed
    days, then last-observation-carried-forward via ``last(ignorenulls)``
    over an unbounded-preceding window. The standard hypertable
    gap-fill/interpolate operation."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    calendar = (
        daily.select("user_id")
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    joined = calendar.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.last("n", ignorenulls=True).over(w).alias("n_locf"),
    ).orderBy("user_id", "day")
