"""Projection / filter / predicate operators and sort / limit / set ops / dedup
(SURVEY.md §2.2 P1–P6 and §2.6 O1–O5).

Everything here is a pure Catalyst-built-in composition: predicates and
projections push down to the parquet scan (verify with
``df.explain(True)`` → ``PushedFilters`` / ``ReadSchema``), so at 100 TB
these cost exactly one pruned columnar scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import query
from ..session import load_table

# ---------------------------------------------------------------------------
# P1 — projection with computed columns
# ---------------------------------------------------------------------------


@query(
    "p1_project",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       l_quantity * 2.0 AS double_qty
FROM lineitem
""",
    category="relational",
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + computed expressions (per-row IEEE math: deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (F.col("l_quantity") * F.lit(2.0)).alias("double_qty"),
    )


# ---------------------------------------------------------------------------
# P2 — compound predicates
# ---------------------------------------------------------------------------


@query(
    "p2_filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE (l_quantity >= 30 AND l_discount BETWEEN 0.02 AND 0.06)
   OR (NOT l_returnflag = 'N' AND l_quantity < 5)
""",
    category="relational",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """&, |, ~ predicate tree — pushed to the parquet reader by Catalyst."""
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_quantity") >= 30) & F.col("l_discount").between(0.02, 0.06)
    ) | (~(F.col("l_returnflag") == "N") & (F.col("l_quantity") < 5))
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


# ---------------------------------------------------------------------------
# P3 — null predicates (fixtures are null-free: manufacture nulls via NULLIF)
# ---------------------------------------------------------------------------


@query(
    "p3_null_predicates",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS maybe_price
  FROM orders
)
SELECT o_orderkey, maybe_price,
       maybe_price IS NULL AS is_missing,
       COALESCE(maybe_price, -1.0) AS price_or_default,
       maybe_price IS NOT DISTINCT FROM NULL AS null_safe_is_null
FROM t
WHERE maybe_price IS NULL OR maybe_price > 300000
""",
    category="relational",
)
def null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isNull / isNotNull / eqNullSafe / coalesce over a manufactured null col."""
    o = load_table(spark, sf_dir, "orders")
    maybe = F.when(F.col("o_orderstatus") == "P", F.lit(None).cast("double")).otherwise(
        F.col("o_totalprice")
    )
    t = o.select("o_orderkey", maybe.alias("maybe_price"))
    return t.select(
        "o_orderkey",
        "maybe_price",
        F.col("maybe_price").isNull().alias("is_missing"),
        F.coalesce(F.col("maybe_price"), F.lit(-1.0)).alias("price_or_default"),
        F.col("maybe_price").eqNullSafe(F.lit(None).cast("double")).alias("null_safe_is_null"),
    ).filter(F.col("maybe_price").isNull() | (F.col("maybe_price") > 300000))


# ---------------------------------------------------------------------------
# P4 — IN / BETWEEN / LIKE
# ---------------------------------------------------------------------------


@query(
    "p4_in_between_like",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND c_acctbal BETWEEN 0 AND 5000
  AND c_name LIKE 'Customer#%1'
""",
    category="relational",
)
def in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership / range / pattern predicates."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_acctbal").between(0, 5000)
        & F.col("c_name").like("Customer#%1")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


# ---------------------------------------------------------------------------
# P5 — CASE WHEN
# ---------------------------------------------------------------------------


@query(
    "p5_case_when",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 250000 THEN 'medium'
            ELSE 'large' END AS size_bucket,
       CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'other' END AS status_name
FROM orders
""",
    category="relational",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched + simple CASE expressions."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 250000, "medium")
        .otherwise("large")
        .alias("size_bucket"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_name"),
    )


# ---------------------------------------------------------------------------
# P6 — cast / coalesce
# NOTE: double→int CAST truncates in Spark but ROUNDS in DuckDB — never put a
# bare double→int cast in an oracle-checked query; go through FLOOR/ROUND.
# ---------------------------------------------------------------------------


@query(
    "p6_cast_coalesce",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm
FROM orders
""",
    category="relational",
)
def cast_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type conversions + null defaulting."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor(F.col("o_totalprice")).cast("long").alias("price_floor"),
        # never emit DecimalType in a result schema: Spark→Decimal objects vs
        # DuckDB→float64 breaks the value-hash; round-trip through double.
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_norm"),
    )


# ---------------------------------------------------------------------------
# O1 — global sort (range-partitioned shuffle) — verified via deterministic rank
# ---------------------------------------------------------------------------


@query(
    "o1_global_sort",
    oracle="""
SELECT s_suppkey, s_name, s_acctbal,
       CAST(ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS pos
FROM supplier
""",
    category="relational",
)
def global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total order with unique tiebreaker; emits rank so order is hash-visible
    (the driver's compare is order-insensitive, so we materialize position)."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select("s_suppkey", "s_name", "s_acctbal").withColumn(
        "pos", F.row_number().over(w).cast("long")
    )


# ---------------------------------------------------------------------------
# O2 — top-N global (TakeOrderedAndProject — no full sort materialization)
# ---------------------------------------------------------------------------


@query(
    "o2_top_n",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    category="relational",
)
def top_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → per-partition top-N then merge (no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# O3 — union all / union distinct
# ---------------------------------------------------------------------------


@query(
    "o3_union",
    oracle="""
SELECT * FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
) UNION SELECT n_nationkey FROM nation WHERE n_regionkey = 0
""",
    category="relational",
)
def union_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag) then UNION (set): unionByName + distinct."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    bag = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    ).unionByName(
        s.filter(F.col("s_acctbal") > 9000).select(F.col("s_nationkey").alias("nationkey"))
    )
    return bag.unionByName(
        n.filter(F.col("n_regionkey") == 0).select(F.col("n_nationkey").alias("nationkey"))
    ).distinct()


# ---------------------------------------------------------------------------
# O4 — intersect / except
# ---------------------------------------------------------------------------


@query(
    "o4_intersect_except",
    oracle="""
SELECT 'both' AS side, k FROM (
  SELECT c_custkey AS k FROM customer
  INTERSECT
  SELECT o_custkey FROM orders
)
UNION ALL
SELECT 'only_customer', k FROM (
  SELECT c_custkey AS k FROM customer
  EXCEPT
  SELECT o_custkey FROM orders
)
""",
    category="relational",
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection and difference, tagged and unioned."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    both = c.intersect(o).select(F.lit("both").alias("side"), "k")
    only_c = c.exceptAll(o).distinct().select(F.lit("only_customer").alias("side"), "k")
    return both.unionByName(only_c)


# ---------------------------------------------------------------------------
# O5 — deterministic keyed dedup (keep latest by ordering, not dropDuplicates,
# which keeps an arbitrary row and would break the value-hash)
# ---------------------------------------------------------------------------


@query(
    "o5_dedup_latest",
    oracle="""
SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
""",
    category="relational",
)
def dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup via window rank (deterministic; at scale this
    is one shuffle on the dedup key — same cost as dropDuplicates but stable)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# O6 — TABLESAMPLE (block/Bernoulli sampling at the scan)
# ---------------------------------------------------------------------------


@query("o6_tablesample", oracle=None, category="relational")
def tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLESAMPLE — sampling applied during the scan (before any
    downstream operator), the cheap way to develop against a slice of a
    100 TB table. Seeded per-partition RNG → rows-only check (the
    deterministic alternative is the md5 hash-sampling in l11*)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders TABLESAMPLE (10 PERCENT) REPEATABLE (42)"
    )


# ---------------------------------------------------------------------------
# O7 — scalable global enumeration (the zipWithIndex problem, done right)
# ---------------------------------------------------------------------------


def _enumerate_batches(batches):
    """Arrow-batch enumerator: assigns 0-based positions WITHIN one input
    partition. The iterator covers exactly one partition in order, so a
    running counter across batches yields the partition-local rank."""
    import pyarrow as pa

    pos = 0
    for batch in batches:
        n = batch.num_rows
        idx = pa.array(range(pos, pos + n), type=pa.int64())
        pos += n
        yield batch.append_column("local_rn", idx)


def global_enumerate(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Total-order global index WITHOUT a single-partition window.

    ``row_number() OVER (ORDER BY ...)`` funnels every row through ONE task
    — the classic 100 TB deadend. The scalable idiom: (1) range-shuffle +
    local sort (same machinery as ORDER BY, fully parallel), (2) enumerate
    WITHIN each partition (no shuffle — one Arrow pass), (3) per-partition
    counts (32-row aggregate) → running-sum offsets, broadcast back. One
    big shuffle total; the only global coordination is the tiny offset
    table. Correctness does not depend on where the range sampler places
    partition boundaries, only on the order columns forming a unique tuple."""
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("pid", F.spark_partition_id())
    )
    schema_str = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in ranged.schema.fields)
    local = ranged.mapInArrow(_enumerate_batches, schema_str + ", local_rn long")
    offsets = (
        local.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("pid", "offset")
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("global_id", F.col("offset") + F.col("local_rn") + 1)
        .drop("pid", "local_rn", "offset")
    )


@query(
    "o7_global_enumerate",
    oracle="""
SELECT o_orderkey, CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS global_id
FROM orders
""",
    category="relational",
)
def global_enumerate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 1-based ids over orders in o_orderkey order — equals the
    oracle's single-window ROW_NUMBER, computed with the parallel
    range+offset plan (docstring above). The id column every training-shard
    manifest / stable-export job needs."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    return global_enumerate(o, ["o_orderkey"]).select("o_orderkey", "global_id")


# ---------------------------------------------------------------------------
# O3b — union with schema evolution (allowMissingColumns)
# ---------------------------------------------------------------------------


@query(
    "o3b_union_missing_columns",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal
FROM (
  SELECT c_custkey, c_mktsegment, CAST(NULL AS DOUBLE) AS c_acctbal
  FROM customer WHERE c_custkey % 2 = 0
  UNION ALL
  SELECT c_custkey, CAST(NULL AS VARCHAR), c_acctbal
  FROM customer WHERE c_custkey % 2 = 1
)
""",
    category="relational",
)
def union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolved union: two batches projected with DIFFERENT columns
    combine via unionByName(allowMissingColumns=True) — each side is
    null-padded for the columns it lacks. This is the append path when a
    feed adds/drops fields between batches; column resolution is BY NAME,
    never by position, so reordered producers can't silently corrupt."""
    c = load_table(spark, sf_dir, "customer")
    old_batch = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_mktsegment")
    new_batch = c.filter(F.col("c_custkey") % 2 == 1).select("c_custkey", "c_acctbal")
    return old_batch.unionByName(new_batch, allowMissingColumns=True).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# O9 — explode_outer: 1→N expansion that KEEPS empty/null parents
# ---------------------------------------------------------------------------


@query(
    "o9_explode_outer",
    oracle="""
WITH src AS (
  SELECT n_nationkey,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL
              ELSE string_split(n_name, 'A') END AS pieces
  FROM nation
)
SELECT n_nationkey, piece FROM (
  SELECT n_nationkey, UNNEST(pieces) AS piece FROM src WHERE pieces IS NOT NULL
  UNION ALL
  SELECT n_nationkey, NULL FROM src WHERE pieces IS NULL
)
""",
    category="relational",
)
def explode_outer_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: the 1→N expansion that PRESERVES parents whose array
    is NULL (as a single null-valued row) instead of dropping them — the
    difference between 'docs with no chunks vanish' and 'docs with no
    chunks are visibly empty' in downstream joins. The oracle desugars it
    as unnest ∪ null-parents, which is exactly what inner explode forgets."""
    n = load_table(spark, sf_dir, "nation")
    pieces = F.when(F.col("n_nationkey") % 5 == 0, None).otherwise(
        F.split(F.col("n_name"), "A")
    )
    return n.select(
        "n_nationkey", F.explode_outer(pieces).alias("piece")
    )


# ---------------------------------------------------------------------------
# O10 — keyset + offset pagination
# ---------------------------------------------------------------------------


@query(
    "o10_pagination",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 20 OFFSET 40
""",
    category="relational",
)
def pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 of a ranked listing: ORDER BY + OFFSET + LIMIT (the API
    pagination idiom). Spark's offset() + limit() compile to a single
    TakeOrdered-style global top-(offset+limit) — no full sort is
    materialized, so a deep-but-bounded page stays cheap at any table
    size (the known anti-pattern is UNBOUNDED offset depth, not this).
    Tie-broken by the unique key so every page is deterministic on both
    engines."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .offset(40)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# O11 — observed metrics: audit counters collected during the query itself
# ---------------------------------------------------------------------------


@query(
    "o11_observed_metrics",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_price
FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'
""",
    category="relational",
)
def observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline audit counters via ``df.observe``: row count, predicate
    count and a quantized-exact sum accumulated DURING the main query's
    own execution — no second scan. This is how a production job gets
    its data-quality counters for free (the alternative — a separate
    aggregate over the same input — doubles the read at 100 TB); the
    metrics are merged per-task by the AccumulatorV2 machinery, so the
    quantized integer sum is exact under any partitioning. The observed
    map is re-emitted as a one-row DataFrame so the driver can
    hash-check it against a plain aggregate oracle."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")).alias(
            "price_cents"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    cents = got["price_cents"]  # SUM over zero rows is NULL, like the oracle
    return spark.createDataFrame(
        [
            (
                int(got["n_rows"]),
                int(got["n_discounted"]),
                float(cents) / 100.0 if cents is not None else None,
            )
        ],
        "n_rows long, n_discounted long, total_price double",
    )
