"""Composite analytics plans: classic warehouse query shapes exercised
end-to-end (SQL-string API, correlated subqueries, statistical aggregates,
cohort/retention, sessionization, SCD-style merge).

The SQL-string queries here go through ``spark.sql`` over temp views on
purpose — same Catalyst plan as the DataFrame API (SURVEY.md §3.3), and it
proves the engine's second query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import query
from ..session import load_table

# ---------------------------------------------------------------------------
# TPC-H Q3 shape — via the SQL-string API
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    category="plan",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 open-revenue orders for one segment (TPC-H Q3 shape), written
    as a SQL string — identical plan to the DataFrame formulation."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — correlated EXISTS
# ---------------------------------------------------------------------------


@query(
    "q4_late_shipments",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
""",
    category="plan",
)
def late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (Catalyst decorrelates to a left-semi join)."""
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""
    )


# ---------------------------------------------------------------------------
# Statistical aggregates (stddev/var/corr) — rounded: merge order differs
# ---------------------------------------------------------------------------


@query(
    "stat_aggregates",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_discount), 6) AS var_disc,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregate",
)
def stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welford-style moments; partial-merge order differs across engines →
    rounded to 6 dp (tolerance asserted, not bit-equality)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
    )


@query(
    "exact_median",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS median_price,
       quantile_cont(l_quantity, 0.25) AS q1_qty
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregate",
)
def exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (not the sketch): Spark percentile ≡
    DuckDB quantile_cont, both (a+b)/2-interpolate — bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("median_price"),
        F.percentile("l_quantity", F.lit(0.25)).alias("q1_qty"),
    )


# ---------------------------------------------------------------------------
# Event analytics: DAU, retention cohorts, sessionization
# ---------------------------------------------------------------------------


@query(
    "dau_daily_active",
    oracle="""
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
""",
    category="plan",
)
def dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + event volume."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('day', CAST(ts AS TIMESTAMP))) AS cohort
  FROM events GROUP BY user_id
), acts AS (
  SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events
)
SELECT cohort, CAST(date_diff('day', cohort, day) AS INTEGER) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM firsts JOIN acts USING (user_id)
GROUP BY cohort, day_offset
""",
    category="plan",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention triangle: first-seen day x activity-day offset.

    One narrow shuffle on user_id (both sides pre-aggregated) then a
    cohort-grain aggregate — no row explosion."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(day).alias("cohort"))
    acts = e.select("user_id", day.alias("day")).distinct()
    return (
        firsts.join(acts, "user_id")
        .select("cohort", F.datediff(F.col("day"), F.col("cohort")).alias("day_offset"))
        .groupBy("cohort", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def sessionize(df: DataFrame, key: str, ts: str, gap_minutes: int) -> DataFrame:
    """Batch sessionization: lag + cumulative-sum of gap breaks. One window
    over (key, ts) — the canonical scalable formulation."""
    w = W.partitionBy(key).orderBy(ts)
    # µs integer arithmetic: cast-to-long truncates to seconds, which shifts
    # session boundaries for sub-second gaps
    gap = F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w)
    brk = F.when(gap.isNull() | (gap >= gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return df.withColumn("__brk", brk).withColumn(
        "session_id",
        F.sum("__brk").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    ).drop("__brk")


@query(
    "batch_sessionize",
    oracle="""
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
g AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec
FROM s GROUP BY user_id, sid
""",
    category="plan",
)
def batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session stats per (user, session) — batch twin of t3_session_window."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    s = sessionize(e, "user_id", "ts", 30)
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) DIV 1000000").alias(
            "duration_sec"
        ),
    )


# ---------------------------------------------------------------------------
# Hypertable-style multi-granularity time rollup (one pass, GROUPING SETS)
# ---------------------------------------------------------------------------


@query(
    "time_rollup_multigrain",
    oracle="""
WITH e AS (
  SELECT event_type,
         date_trunc('day',  CAST(ts AS TIMESTAMP)) AS day,
         date_trunc('week', CAST(ts AS TIMESTAMP)) AS week,
         value
  FROM events
)
SELECT * FROM (
  SELECT 'day' AS grain, day AS bucket, event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS total
  FROM e GROUP BY day, event_type
  UNION ALL
  SELECT 'week', week, event_type,
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
  FROM e GROUP BY week, event_type
)
""",
    category="plan",
)
def time_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: day + week grains in ONE
    pass via GROUPING SETS (the Expand operator fans each row into its
    grains; one shuffle total instead of one per grain)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("week", F.col("ts")).alias("week"),
        "value",
    )
    e.createOrReplaceTempView("events_grains")
    return spark.sql(
        """
SELECT CASE WHEN day IS NOT NULL THEN 'day' ELSE 'week' END AS grain,
       coalesce(day, week) AS bucket, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS total
FROM events_grains
GROUP BY GROUPING SETS ((day, event_type), (week, event_type))
"""
    )


# ---------------------------------------------------------------------------
# SCD-style merge (upsert emulation: anti-join + union)
# ---------------------------------------------------------------------------


def merge_upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE emulation without Delta: keep current rows not in updates,
    union the updates. At scale both sides shuffle once on the key; with
    bucketed tables the anti-join is shuffle-free."""
    kept = current.join(updates, key, "left_anti")
    return kept.unionByName(updates)


@query(
    "scd_merge_upsert",
    oracle="""
WITH updates AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT * FROM (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
  UNION ALL
  SELECT * FROM updates
)
""",
    category="plan",
)
def scd_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert 10% modified customer rows into the dimension."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    updates = c.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    return merge_upsert(c, updates, "c_custkey")
