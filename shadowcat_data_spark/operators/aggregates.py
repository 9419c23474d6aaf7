"""Aggregation operators (SURVEY.md §2.4, A1–A10).

All hash aggregations are expressed declaratively so Catalyst plans
partial (map-side) + final aggregation automatically; at 100 TB the only
knobs that matter are shuffle partitioning (AQE-coalesced) and measure
determinism, handled by the exact-decimal-sum idiom:

    F.sum(col.cast("decimal(p,s)")).cast("double")

Decimal sums are exact and associative → identical results under any
partitioning on Spark AND any thread order on the DuckDB oracle, so the
driver's value-hash matches deterministically. Never sum raw doubles in
an oracle-checked aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..session import load_table


def money_sum(col: F.Column, alias: str, scale: str = "decimal(22,6)") -> F.Column:
    """Exact, order-independent sum of a money-like double, as double.

    Decimal accumulation — the unbounded-scale default (no overflow until
    precision 32). ~3× slower per row than quantized_sum below; use that on
    hot paths where the group-size bound holds.
    """
    return F.sum(col.cast(scale)).cast("double").alias(alias)


def quantized_sum(col: F.Column, alias: str, scale: float = 1e6) -> F.Column:
    """Exact sum via int64 quantization: floor(x*scale+0.5) summed as long,
    returned as double. Runs at integer-sum speed (≈3× faster than decimal).

    Overflow bound: |x|*scale*rows_per_group < 9.2e18 — e.g. prices ≤1e5 at
    scale 1e6 are safe to ~9e7 rows per group. Beyond that (full 100 TB
    single-group aggregates) use money_sum.
    """
    return (F.sum(F.floor(col * scale + 0.5).cast("long")).cast("double") / scale).alias(alias)


# ---------------------------------------------------------------------------
# A1 — flagship: TPC-H-Q1-shaped pricing summary (multi-measure hash agg)
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
  CAST(SUM(CAST(FLOOR(l_discount * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS avg_disc,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → groupBy(2) → 8 measures → sort. The flagship (entry) query.

    Hot path → quantized_sum (int64-speed exact sums; bound documented on the
    helper holds to ~1e8 rows/group here). Averages derive from the same sums
    so the whole thing is one pass, partial-aggregated map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            quantized_sum(F.col("l_quantity"), "sum_qty", 100.0),
            quantized_sum(F.col("l_extendedprice"), "sum_base_price", 100.0),
            quantized_sum(disc_price, "sum_disc_price", 1e6),
            quantized_sum(charge, "sum_charge", 1e6),
            quantized_sum(F.col("l_discount"), "sum_disc", 1e6),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        (F.col("sum_disc") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


query(
    "a1_pricing_summary",
    oracle=Q1_ORACLE,
    category="aggregate",
    description="TPC-H-Q1-style multi-measure hash aggregation over lineitem",
)(pricing_summary)


# ---------------------------------------------------------------------------
# A2 — exact count distinct
# ---------------------------------------------------------------------------


@query(
    "a2_count_distinct",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderstatus
""",
    category="aggregate",
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) alongside plain counts (expand-based rewrite)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# A3 — approx count distinct (HLL++) — no hash oracle; tolerance-tested in CI
# ---------------------------------------------------------------------------


@query("a3_approx_count_distinct", category="aggregate")
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate per group (sketch; mergeable at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# ---------------------------------------------------------------------------
# A4 — approx quantiles — no hash oracle; tolerance-tested in CI
# ---------------------------------------------------------------------------


@query("a4_approx_quantile", category="aggregate")
def approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna) — mergeable across partitions.
    Output is one row per (group, percentile): the grading comparator
    canonicalizes with pandas and cannot sort array cells, so the quantile
    vector is exploded to scalar rows."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), 10000).alias("pcts"),
    )
    return pcts.select(
        "l_returnflag",
        F.posexplode("pcts").alias("pct_idx", "pct_value"),
    )


# ---------------------------------------------------------------------------
# A5 — cube / rollup / grouping sets
# ---------------------------------------------------------------------------


@query(
    "a5_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    category="aggregate",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain aggregation: CUBE with grouping_id disambiguation.
    Quantized sum — Expand multiplies input rows ×4, so the per-row
    aggregate cost matters here more than in a plain groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        quantized_sum(F.col("l_quantity"), "sum_qty", 100.0),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "a5_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,6))) AS DOUBLE) AS sum_price
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    category="aggregate",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag → flag+status → grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        money_sum(F.col("l_extendedprice"), "sum_price")
    )


# ---------------------------------------------------------------------------
# A6 — pivot
# ---------------------------------------------------------------------------


@query(
    "a6_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O,
       CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregate",
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categories → columns. Explicit value list avoids the extra distinct scan."""
    li = load_table(spark, sf_dir, "lineitem")
    df = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(22,6)")).cast("double"))
    )
    return df.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


# ---------------------------------------------------------------------------
# A7 — unpivot
# ---------------------------------------------------------------------------


@query(
    "a7_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
""",
    category="aggregate",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long (melt). Narrow projection first so the scan stays pruned."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )


# ---------------------------------------------------------------------------
# A8 — HAVING (post-aggregation filter)
# ---------------------------------------------------------------------------


@query(
    "a8_having",
    oracle="""
SELECT o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(22,6))) AS DOUBLE) AS total_spend,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
""",
    category="aggregate",
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING — filter composes onto the aggregate, no extra pass."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            money_sum(F.col("o_totalprice"), "total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 12)
    )


# ---------------------------------------------------------------------------
# A9 — collect_list / collect_set (repeated-field rollup)
# ---------------------------------------------------------------------------


@query(
    "a9_collect_set",
    oracle="""
SELECT n_name,
       array_to_string(list_sort(list(DISTINCT s_name)), '|') AS suppliers,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
    category="aggregate",
)
def collect_set_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group → sorted array (order-insensitive via sort_array for determinism).
    Emitted as a '|'-joined string: the grading comparator canonicalizes with
    pandas and cannot sort array cells. Supplier names are ASCII, so Spark's
    binary string sort and DuckDB's default collation agree."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("s_name")), "|").alias("suppliers"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


# ---------------------------------------------------------------------------
# A10 — conditional aggregation (FILTER clause)
# ---------------------------------------------------------------------------


@query(
    "a10_conditional_agg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,6))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS hi_disc_rev,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,6))) FILTER (WHERE l_discount <= 0.05) AS DOUBLE) AS lo_disc_rev,
       CAST(COUNT(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS big_lines
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregate",
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregation via sum(when(...)) — one pass, no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    price_dec = F.col("l_extendedprice").cast("decimal(22,6)")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_discount") > 0.05, price_dec)).cast("double").alias("hi_disc_rev"),
        F.sum(F.when(F.col("l_discount") <= 0.05, price_dec)).cast("double").alias("lo_disc_rev"),
        F.count(F.when(F.col("l_quantity") >= 25, F.lit(1))).alias("big_lines"),
    )


# ---------------------------------------------------------------------------
# A5c — explicit GROUPING SETS (arbitrary grain list, not cube/rollup)
# ---------------------------------------------------------------------------

_A5C_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag, l_linestatus
"""
# (GROUPING takes ONE arg in Spark; the two-bit gid is composed by hand so
# the identical SQL text runs on both engines.)


@query("a5c_grouping_sets", oracle=_A5C_SQL, category="aggregate")
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the arbitrary-grain list that cube/rollup
    are sugar for; same single-Expand plan, only the requested grains."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_A5C_SQL)


# ---------------------------------------------------------------------------
# A11 — bitwise aggregates (flag accumulation)
# ---------------------------------------------------------------------------


@query(
    "a11_bitwise_agg",
    oracle="""
SELECT l_returnflag,
       CAST(BIT_OR(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS flags_or,
       CAST(BIT_AND(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS flags_and,
       CAST(BIT_XOR(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS flags_xor
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregate",
)
def bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise OR/AND/XOR aggregation — permission-mask / feature-flag
    rollups; associative+commutative, so partial aggregation applies."""
    li = load_table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.bit_or(ln).alias("flags_or"),
        F.bit_and(ln).alias("flags_and"),
        F.bit_xor(ln).alias("flags_xor"),
    )


# ---------------------------------------------------------------------------
# A12 — two-level HLL sketch rollup (Apache DataSketches, Spark 3.5+)
# ---------------------------------------------------------------------------


@query("a12_hll_sketch_rollup", category="aggregate")
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per region via MERGEABLE sketches: build one HLL
    sketch per nation (`hll_sketch_agg`), then UNION the binary sketches up
    to region (`hll_union_agg`) — never re-touching the base table. This
    two-level rollup is THE 100 TB distinct-count pattern: per-partition
    sketches are a few KB each, re-aggregate at any grain in fixed space,
    and persist for incremental refresh (yesterday's sketch ∪ today's
    delta). Estimates are engine-hash-specific → rows-only check here;
    accuracy vs exact counts asserted in tests/test_properties.py."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", F.lit(14)).alias("sk")
    )
    return (
        per_nation.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey")
        .agg(F.hll_union_agg("sk").alias("merged"))
        .select(
            "n_regionkey",
            F.hll_sketch_estimate("merged").alias("approx_customers"),
        )
    )


# ---------------------------------------------------------------------------
# A13 — approximate frequent items (ApproxTopK sketch)
# ---------------------------------------------------------------------------


@query(
    "a13_approx_top_k",
    oracle="""
SELECT o_orderpriority AS item, CAST(COUNT(*) AS BIGINT) AS count
FROM orders GROUP BY o_orderpriority
""",
    category="aggregate",
)
def approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (Spark 4 ``approx_top_k``, a DataSketches
    ItemsSketch) over order priority, exploded to (item, count) rows. With
    maxItemsTracked ≥ the distinct count the sketch degrades gracefully to
    EXACT counts — which is what makes this oracle-checkable; the
    high-cardinality regime (vocab ≫ tracked) is covered by a property
    test against the exact top-k. At 100 TB the sketch is the point:
    KB-sized mergeable state per partition instead of a full groupBy of a
    skewed key domain."""
    o = load_table(spark, sf_dir, "orders")
    return (
        # k=10 ≥ any realistic priority vocabulary, so the sketch returns
        # every item exactly — including a NULL item, which approx_top_k
        # tracks like any other value — matching the oracle's plain GROUP
        # BY; the high-cardinality truncating regime is property-tested
        # separately
        o.agg(F.expr("approx_top_k(o_orderpriority, 10, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("count"))
    )


# ---------------------------------------------------------------------------
# A14 — linear-regression aggregates (regr_* family)
# ---------------------------------------------------------------------------


@query(
    "a14_regression_agg",
    oracle="""
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregate",
)
def regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit of extendedprice on quantity via the regr_* family
    (co-moment accumulators: partial-aggregable, single pass, no shuffle
    beyond the final groupBy). Rounded to 6dp — co-moments are doubles and
    partial-merge order varies with partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# A16 — ordered string aggregation (LISTAGG WITHIN GROUP)
# ---------------------------------------------------------------------------


@query(
    "a16_listagg",
    oracle="""
SELECT n_regionkey,
       string_agg(n_name, '|' ORDER BY n_name) AS nations,
       CAST(COUNT(*) AS BIGINT) AS n
FROM nation GROUP BY n_regionkey
""",
    category="aggregate",
)
def listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (ORDER BY ...) — the ANSI ordered string
    aggregation (Spark 4). The WITHIN GROUP ordering is what makes the
    result deterministic under any partitioning; an unordered listagg is
    partition-order-dependent and would never hash-match."""
    n = load_table(spark, sf_dir, "nation")
    n.createOrReplaceTempView("a16_nation")
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name) AS nations,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM a16_nation GROUP BY n_regionkey
        """
    )


# ---------------------------------------------------------------------------
# A17 — boolean aggregates
# ---------------------------------------------------------------------------


@query(
    "a17_bool_agg",
    oracle="""
SELECT l_returnflag,
       bool_and(l_discount < 0.1) AS all_low_disc,
       bool_or(l_quantity > 49) AS any_bulk,
       bool_and(l_extendedprice > 0) AS all_priced,
       bool_or(l_tax > 0.07) AS any_high_tax
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregate",
)
def bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI EVERY/ANY as bool_and/bool_or — constant-state partial
    aggregation (a single AND/OR per partition), the cheapest possible
    group invariant check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") < 0.1).alias("all_low_disc"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_bulk"),
        F.bool_and(F.col("l_extendedprice") > 0).alias("all_priced"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
    )


# ---------------------------------------------------------------------------
# A18 — deterministic mode
# ---------------------------------------------------------------------------


@query(
    "a18_mode",
    oracle="""
SELECT l_returnflag, l_quantity AS mode_qty
FROM (
  SELECT l_returnflag, l_quantity, COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag, l_quantity
)
QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag
                           ORDER BY n DESC, l_quantity) = 1
""",
    category="aggregate",
)
def mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value per group via Spark 4's deterministic mode
    (ties → lowest value), oracle'd by the explicit count+rank rewrite.
    Native mode keeps a per-group value→count map in the aggregation
    buffer — fine for bounded domains like quantity; for unbounded
    domains use the count+rank rewrite the oracle shows, which shuffles
    (group, value) pairs instead."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_quantity", True).alias("mode_qty")
    )


# ---------------------------------------------------------------------------
# A6b — pivot with multiple aggregates per cell
# ---------------------------------------------------------------------------


@query(
    "a6b_pivot_multi_agg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT))
            FILTER (WHERE l_linestatus = 'F') AS DOUBLE) / 100.0 AS F_sum_qty,
       CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS F_n,
       CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT))
            FILTER (WHERE l_linestatus = 'O') AS DOUBLE) / 100.0 AS O_sum_qty,
       CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS O_n
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregate",
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with TWO aggregates per pivoted value (sum + count) — Spark
    names the columns {value}_{agg alias}, which the oracle mirrors as
    FILTER-ed aggregates (the universal pivot desugaring)."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            quantized_sum(F.col("l_quantity"), "sum_qty", 100.0),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # pivot leaves an absent (flag, status) cell NULL even for COUNT;
    # SQL's COUNT(*) FILTER is 0 there — align the count cells
    return pv.select(
        "l_returnflag",
        "F_sum_qty",
        F.coalesce(F.col("F_n"), F.lit(0).cast("long")).alias("F_n"),
        "O_sum_qty",
        F.coalesce(F.col("O_n"), F.lit(0).cast("long")).alias("O_n"),
    )


# ---------------------------------------------------------------------------
# A19 — argmin/argmax (min_by / max_by with a unique ordering key)
# ---------------------------------------------------------------------------


@query(
    "a19_min_by_max_by",
    oracle="""
WITH keyed AS (
  SELECT s_nationkey, s_name,
         CAST(FLOOR(s_acctbal * 100.0 + 0.5) AS BIGINT) * 100000 + s_suppkey AS ord
  FROM supplier
)
SELECT s_nationkey,
       min_by(s_name, ord) AS poorest_supplier,
       max_by(s_name, ord) AS richest_supplier,
       CAST(COUNT(*) AS BIGINT) AS n
FROM keyed GROUP BY s_nationkey
""",
    category="aggregate",
)
def min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax per group: the supplier name at the lowest/highest
    account balance. min_by/max_by are UNDEFINED on ordering ties, so the
    ordering key is made unique by construction — quantized cents composed
    with the primary key — giving one deterministic answer on both engines
    (the idiom any oracle-checked argmin needs)."""
    s = load_table(spark, sf_dir, "supplier")
    ord_key = (
        F.floor(F.col("s_acctbal") * 100.0 + 0.5).cast("long") * 100000
        + F.col("s_suppkey")
    )
    keyed = s.select("s_nationkey", "s_name", ord_key.alias("ord"))
    return keyed.groupBy("s_nationkey").agg(
        F.min_by("s_name", "ord").alias("poorest_supplier"),
        F.max_by("s_name", "ord").alias("richest_supplier"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# A20 — sketch set algebra: HLL intersection via inclusion–exclusion
# ---------------------------------------------------------------------------


@query("a20_hll_intersection", category="aggregate")
def hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from sketches alone: customers active in
    BOTH order-status segments, estimated as |A| + |B| − |A∪B| over HLL
    sketches (inclusion–exclusion — HLL has no native intersect). At 100 TB
    the segments' sketches are KBs and the overlap of ANY segment pair is
    answerable without re-scanning facts — the sketch-algebra payoff.
    Estimates are engine-hash-specific → rows-only; accuracy vs the exact
    semi-join overlap is asserted in tests/test_properties.py."""
    o = load_table(spark, sf_dir, "orders")
    seg = o.filter(F.col("o_orderstatus").isin("F", "O")).select(
        "o_orderstatus", "o_custkey"
    )
    sketches = seg.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk")
    )
    union_all = seg.select(F.lit("ALL").alias("o_orderstatus"), "o_custkey").groupBy(
        "o_orderstatus"
    ).agg(F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"))
    ests = sketches.unionByName(union_all).select(
        "o_orderstatus", F.hll_sketch_estimate("sk").alias("est")
    )
    pivoted = ests.groupBy().pivot("o_orderstatus", ["F", "O", "ALL"]).agg(
        F.first("est")
    )
    return pivoted.select(
        F.col("F").cast("long").alias("est_f"),
        F.col("O").cast("long").alias("est_o"),
        F.col("ALL").cast("long").alias("est_union"),
        (F.col("F") + F.col("O") - F.col("ALL")).cast("long").alias("est_overlap"),
    )


# ---------------------------------------------------------------------------
# A21 — product aggregate (composed: exp of an exact log-sum)
# ---------------------------------------------------------------------------


@query(
    "a21_log_product",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(ln(1.0 + l_discount) * 1000000.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 1000000.0 AS log_product,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregate",
)
def log_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product aggregate for engines without one: Π(1+discount) per group
    computed as Σ ln(1+x), with each log quantized to integer micro-nats
    BEFORE summing — the compounding-factor (returns/interest) aggregate,
    made exactly associative (raw double log-sums drift with partial-merge
    order). Emitted in log space; exp() is a display decision, and staying
    in logs avoids overflow at any group size."""
    li = load_table(spark, sf_dir, "lineitem")
    term = F.floor(F.log(F.lit(1.0) + F.col("l_discount")) * 1e6 + 0.5).cast("long")
    return li.groupBy("l_returnflag").agg(
        (F.sum(term).cast("double") / 1e6).alias("log_product"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# A22 — grouping_id: which grain produced each rollup row
# ---------------------------------------------------------------------------


@query(
    "a22_grouping_id",
    oracle="""
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    category="aggregate",
)
def grouping_id_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rows tagged with grouping_id so a consumer can tell a real
    NULL key from a rolled-up subtotal — the disambiguator every
    multi-grain materialization needs (a5 produces the grains; this is
    how downstream filters select one). gid is the bitmask of rolled-up
    columns (MSB = first key), identical in Spark and ANSI GROUPING()
    arithmetic. Same single Expand+agg shuffle as a5_cube."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# A23 — mergeable histogram quantiles (deterministic sketch, exact oracle)
# ---------------------------------------------------------------------------


@query(
    "a23_histogram_quantile",
    oracle="""
WITH b AS (
  SELECT event_type, CAST(FLOOR(value / 10.0) AS BIGINT) AS bin, COUNT(*) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), t AS (
  SELECT event_type, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM b
)
SELECT event_type,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST((MIN(CASE WHEN cum >= 0.5 * n THEN bin END) + 1) * 10.0 AS DOUBLE) AS p50,
       CAST((MIN(CASE WHEN cum >= 0.9 * n THEN bin END) + 1) * 10.0 AS DOUBLE) AS p90,
       CAST((MIN(CASE WHEN cum >= 0.99 * n THEN bin END) + 1) * 10.0 AS DOUBLE) AS p99
FROM t GROUP BY event_type
""",
    category="aggregate",
)
def histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram quantiles — the DETERMINISTIC mergeable
    quantile sketch. Contrast with a4 (approx_percentile): that sketch
    is engine-internal so only a tolerance check is possible; this one's
    state is (bin → count), exactly associative integer partials, so
    partial histograms combine map-side, merge across partitions/days/
    tables in any order with NO error, and the quantile (upper edge of
    the first bin where the cumulative count crosses q·n) is reproduced
    bit-for-bit by the SQL oracle. Error is bounded by bin width by
    construction — the knob a 100 TB pipeline tunes, not a sketch
    internals gamble. One narrow shuffle on (event_type, bin); the bin
    domain (~50 rows/group) makes the window stage metadata-sized."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.col("value") / 10.0).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t = b.select(
        "event_type",
        "bin",
        "c",
        F.sum("c").over(W.partitionBy("event_type").orderBy("bin")).alias("cum"),
        F.sum("c").over(W.partitionBy("event_type")).alias("n"),
    )

    def pq(q: float, name: str):
        return (
            (
                F.min(F.when(F.col("cum") >= F.lit(q) * F.col("n"), F.col("bin")))
                + 1
            )
            * 10.0
        ).cast("double").alias(name)

    return t.groupBy("event_type").agg(
        F.sum("c").alias("n_events"),
        pq(0.5, "p50"),
        pq(0.9, "p90"),
        pq(0.99, "p99"),
    )
