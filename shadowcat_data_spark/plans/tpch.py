"""Remaining TPC-H query shapes (Q2, Q6-Q9, Q11, Q13, Q15, Q16, Q20, Q21),
adapted to the fixture schema (FIXTURES.md): no partsupp table — lineitem's
distinct (l_partkey, l_suppkey) pairs serve as the part↔supplier relation;
no l_commitdate/l_receiptdate — "late" is shipdate vs orderdate + interval.

Together with plans/analytics.py (Q1/Q3/Q4/Q5/Q10/Q12/Q14/Q17/Q18/Q19/Q22)
this completes all 22 TPC-H shapes.

Scale notes are per-query in docstrings; the common rules:
- every money/quantity aggregate uses int64 quantization
  (``floor(x*1e6+0.5)`` summed as long) — bit-identical across engines and
  3x faster than decimal sums (registry.py module docstring);
- thresholds against averages/fractions are integer cross-multiplications,
  never divisions, so boundary rows can't tie-break differently;
- dimensions (part, supplier, nation, region) broadcast; only lineitem and
  orders shuffle, and always after the largest possible pushed-down filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import query
from ..session import load_table

_REV_Q_SQL = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)"


def _rev_q():
    """Quantized revenue term. Built lazily — classic-API Column construction
    needs an active SparkContext, and this module imports at registry load,
    before any session exists."""
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000.0 + 0.5
    ).cast("long")


# ---------------------------------------------------------------------------
# Q2 shape — minimum-balance supplier per part (correlated MIN → window)
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
  FROM part JOIN ps ON p_partkey = l_partkey
            JOIN eu ON l_suppkey = s_suppkey
  WHERE p_size BETWEEN 10 AND 14 AND p_type = 'STANDARD'
),
m AS (SELECT p_partkey AS mk, MIN(s_acctbal) AS min_bal FROM cand GROUP BY p_partkey)
SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal
FROM cand JOIN m ON p_partkey = mk AND s_acctbal = min_bal
""",
    category="plan",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each qualifying part, the EUROPE supplier(s) with the minimum
    account balance (TPC-H Q2 shape; lineitem's distinct pairs stand in for
    partsupp). The textbook correlated MIN subquery is a window-min +
    equality filter — one shuffle on p_partkey instead of a re-scan per
    part. Ties (several suppliers at the min) are all kept, so the result
    is a deterministic set with no tiebreak dependence. The min/equality is
    on the raw double — no arithmetic touches it, so cross-engine compare
    is exact. Scale: the pair-distinct is the only lineitem shuffle;
    supplier/nation/region broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 14) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    cand = pairs.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).join(
        F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey")
    )
    w = W.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Q6 shape — forecast revenue change (pure scan-side filter + one sum)
# ---------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    category="plan",
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue that would vanish if discounts in a band were dropped (TPC-H
    Q6): the canonical scan-dominated query. All four predicates push to the
    parquet scan (min/max row-group skipping on l_shipdate at scale); the
    single global sum ships one long per partition. The discount BETWEEN
    compares raw doubles with no arithmetic — exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_rev = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * 1000000.0 + 0.5
    ).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(disc_rev).cast("double") / 1000000.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q7 shape — volume shipping between two nations, by year
# ---------------------------------------------------------------------------


@query(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM({_REV_Q_SQL}) AS DOUBLE) / 1000000.0 AS revenue
FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
""",
    category="plan",
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between two nations by ship year (TPC-H Q7).
    The nation pair disjunction can't prune either fact side alone, but both
    nation joins broadcast and the semi-filtering supplier/customer sides
    stay small; the only big shuffle is lineitem⋈orders. Year extraction is
    int in both engines (DuckDB year()→BIGINT is cast to INTEGER)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    # nation joins twice (supplier side + customer side): rename BOTH the key
    # and the payload per role, or Spark flags the self-join as ambiguous
    n1 = n.select(F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nk"))
        .filter(pair | rpair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(_rev_q()).cast("double") / 1000000.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape — national market share within a region (conditional ratio/year)
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV_Q_SQL} ELSE 0 END) AS DOUBLE)
         / CAST(SUM({_REV_Q_SQL}) AS DOUBLE) AS mkt_share
FROM lineitem JOIN part     ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              JOIN region   ON n2.n_regionkey = r_regionkey
WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_year
""",
    category="plan",
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of a region's STANDARD-part order revenue per year
    (TPC-H Q8): ratio of a conditional sum over the total. Both sums are
    quantized int64; each is cast to double before the divide so the ratio
    is the same IEEE operation in both engines. Part filter broadcasts and
    semi-reduces lineitem before the orders shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n2 = (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .filter(F.col("r_name") == "AMERICA")
        .select(F.col("n_nationkey").alias("cust_nationkey"))
    )
    n1 = n.select(
        F.col("n_nationkey").alias("supp_nationkey"), F.col("n_name").alias("supp_nation")
    )
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", _rev_q()).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nationkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nat_rev).cast("double") / F.sum(_rev_q()).cast("double")).alias(
                "mkt_share"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape — product-line profit by supplier nation and year
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)
              - CAST(FLOOR(p_retailprice * l_quantity * 10000.0 + 0.5) AS BIGINT) * 100) AS DOUBLE)
         / 1000000.0 AS profit
FROM lineitem JOIN part     ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
""",
    category="plan",
)
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on 'red' parts by supplier nation and order year (TPC-H Q9;
    p_retailprice*l_quantity stands in for the absent ps_supplycost as the
    cost term). Each term quantizes independently before the subtraction —
    cost at 1e4 then scaled, so its product (price up to ~2k * qty 50 * 1e4)
    stays far from int64 overflow even at 100TB row counts per group. The
    p_name LIKE filter broadcasts part and semi-reduces lineitem first."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost_q = F.floor(
        F.col("p_retailprice") * F.col("l_quantity") * 10000.0 + 0.5
    ).cast("long")
    profit_q = _rev_q() - cost_q * 100
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(profit_q).cast("double") / 1000000.0).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q11 shape — important stock: per-part value above a global fraction
# ---------------------------------------------------------------------------


@query(
    "q11_important_stock",
    oracle="""
WITH v AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS vq
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
  GROUP BY l_partkey
),
t AS (SELECT CAST(SUM(vq) AS BIGINT) AS tq FROM v)
SELECT l_partkey, CAST(vq AS DOUBLE) / 100.0 AS part_value
FROM v, t
WHERE vq * 500 > tq
""",
    category="plan",
)
def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from three nations exceeds 1/500 of the
    total (TPC-H Q11 shape; lineitem value stands in for partsupp stock).
    The HAVING-against-global-total is a scalar aggregate broadcast to every
    group row; the threshold is the integer cross-multiplication
    ``vq*500 > tq`` — no division, no boundary ties. Value quantizes at 1e2
    (price*qty ~ 5e6 → 5e8/row), keeping vq*500 ~ 1e14·500 well under int64
    at sf0.1; at 100 TB switch the scale constant down or sum decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2"))
        .select("n_nationkey")
    )
    val_q = F.floor(
        F.col("l_extendedprice") * F.col("l_quantity") * 100.0 + 0.5
    ).cast("long")
    v = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(val_q).alias("vq"))
    )
    total = v.agg(F.sum("vq").alias("tq"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("vq") * 500 > F.col("tq"))
        .select("l_partkey", (F.col("vq").cast("double") / 100.0).alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q13 shape — customer order-count distribution (outer join + double agg)
# ---------------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    category="plan",
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-customer order counts, keeping zero-order customers
    (TPC-H Q13): LEFT OUTER join with a non-key ON-predicate (the priority
    exclusion must live in the join condition, not WHERE, or zero-order
    customers vanish), then two aggregations. COUNT(o_orderkey) counts only
    matched rows — the outer-join null row contributes 0. The second agg is
    over ~50 distinct counts — a near-free final shuffle."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    joined = c.join(
        o,
        (c["c_custkey"] == o["o_custkey"]) & (o["o_orderpriority"] != "5-LOW"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q15 shape — top supplier(s) by quarterly revenue (scalar MAX subquery)
# ---------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_REV_Q_SQL}) AS BIGINT) AS rq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rq AS DOUBLE) / 1000000.0 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE rq = (SELECT MAX(rq) FROM rev)
""",
    category="plan",
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum revenue in one quarter (TPC-H Q15: the
    view + scalar MAX subquery). Revenue per supplier aggregates once and
    is reused for both the MAX and the equality filter (Spark reuses the
    exchange; see [[spark-shuffle-materialization]]). The comparison is on
    the quantized BIGINT, so "equals the max" can't float-drift; ties all
    surface, keeping the result set deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_q()).alias("rq")
    )
    mx = rev.agg(F.max("rq").alias("max_rq"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rq") == F.col("max_rq"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", (F.col("rq").cast("double") / 1000000.0).alias("total_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape — supplier counts per part attribute, with supplier exclusion
# ---------------------------------------------------------------------------


@query(
    "q16_parts_supplier_relation",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN ps ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
GROUP BY p_brand, p_type, p_size
""",
    category="plan",
)
def parts_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many suppliers serve each (brand, type, size) bucket, excluding
    flagged suppliers (TPC-H Q16; negative account balance stands in for
    the complaints LIKE). The NOT IN is a broadcast anti join (safe here:
    s_suppkey is non-null by schema — NOT IN's null trap doesn't bite);
    count-distinct of the already-distinct pair relation. At scale the
    pair-distinct and the count-distinct share the same l_partkey-major
    shuffle; part is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        pairs.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 shape — suppliers with a dominant share of a part's shipped volume
# ---------------------------------------------------------------------------


@query(
    "q20_excess_stock_suppliers",
    oracle="""
WITH sq AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS supp_q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
tq AS (SELECT l_partkey AS pk, CAST(SUM(supp_q) AS BIGINT) AS total_q FROM sq GROUP BY l_partkey),
red AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
dominant AS (
  SELECT DISTINCT l_suppkey
  FROM sq JOIN tq ON l_partkey = pk
          JOIN red ON l_partkey = p_partkey
  WHERE supp_q * 5 > total_q
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
""",
    category="plan",
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping more than 20% of some 'red' part's 1996 volume
    (TPC-H Q20 shape: the nested semi-join chain, with shipped volume for
    the absent partsupp availability). Two-level aggregation — (part,
    supplier) then part — reuses one shuffle since the second groups a
    prefix of the first's key. Threshold is cross-multiplied on quantized
    longs. The final IN is a left-semi join, so suppliers dedup without a
    distinct. Scale: only lineitem shuffles; part/supplier/nation
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    q100 = F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long")
    sq = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(q100).alias("supp_q"))
    tq = sq.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("supp_q").alias("total_q")
    )
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    dominant = (
        sq.join(tq, F.col("l_partkey") == F.col("pk"))
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("supp_q") * 5 > F.col("total_q"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(dominant, s["s_suppkey"] == dominant["l_suppkey"], "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Q21 shape — suppliers who alone delayed multi-supplier orders
# ---------------------------------------------------------------------------


@query(
    "q21_waiting_orders",
    oracle="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
""",
    category="plan",
)
def waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late lines whose supplier was the ONLY late supplier on a
    multi-supplier finished order (TPC-H Q21; late = shipped >60 days after
    order date, replacing the absent commit/receipt dates). The oracle's
    EXISTS / NOT EXISTS pair re-scans lineitem twice; here it collapses to
    ONE per-order aggregate — count of distinct suppliers and of distinct
    late suppliers — joined back to the late lines. Same one-pass shape the
    correlated form must decorrelate into at 100 TB anyway, but explicit
    and with the order-grain frame reused across both flags."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    flags = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    guilty_lines = (
        lo.filter(F.col("is_late"))
        .join(
            flags.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)).select(
                F.col("l_orderkey").alias("fk")
            ),
            F.col("l_orderkey") == F.col("fk"),
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        guilty_lines.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
