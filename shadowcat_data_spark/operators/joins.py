"""Join operators (SURVEY.md §2.3, J1–J10).

Catalyst picks the physical join (broadcast-hash / sort-merge / shuffled-hash)
and AQE re-plans at runtime (broadcast switch, skew split). We only hint
``F.broadcast`` for the genuinely small dimensions (region/nation/supplier) —
at 100 TB those are still tiny, so the hint stays valid at scale.

Two operators Spark lacks natively are implemented as composable rewrites:

- ``asof_join``   — union-tag + running max-struct over a window. One shuffle
  on (keys), one sort; no per-group pandas, no driver collect. Scales as a
  single sort-merge pass. (pd.merge_asof via applyInPandas would move every
  row through Arrow→Python — only worth it for exotic tolerance semantics.)
- ``range_join``  — band-expansion: explode each [lo,hi) range into fixed-width
  bands, equi-join on the band key, then residual-filter. Turns an O(n·m)
  nested-loop into a hash join; band width trades build-side duplication
  against probe fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from ..registry import query
from ..session import load_table

# ---------------------------------------------------------------------------
# Composable operators
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` keys (ties broken by the
    lexicographically greatest payload — deterministic).

    Plan shape: union the two inputs, one window (shuffle on `on`, sort by
    ts), filter back to left rows. Cost ≈ one sort-merge join, no matter how
    wide the time skew — this is the 100 TB-safe formulation.
    """
    payload = F.struct(F.col(right_ts).alias("__ts"), *[F.col(c) for c in payload_cols])
    r = right.select(
        *on, F.col(right_ts).alias("__t"), F.lit(0).alias("__side"), payload.alias("__p")
    )
    l = left.select(
        "*", F.col(left_ts).alias("__t"), F.lit(1).alias("__side"), F.lit(None).alias("__p")
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # side=0 sorts before side=1 at equal ts → right rows at ts == left_ts match.
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.withColumn("__asof", F.max("__p").over(w))
    return (
        matched.filter(F.col("__side") == 1)
        .drop("__t", "__side", "__p")
        .withColumn("__asof_ts", F.col("__asof.__ts"))
    )


def range_join(
    probe: DataFrame,
    ranges: DataFrame,
    value: str,
    lo: str,
    hi: str,
    band_width: float,
) -> DataFrame:
    """Join rows where ``lo <= value < hi`` via band-expansion equi-join.

    Each range [lo, hi) is exploded into ceil((hi-lo)/band_width) band keys;
    the probe side computes its single band key. The equi-join on band then a
    residual filter reproduces the interval predicate with hash-join cost.
    """
    banded = ranges.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / band_width).cast("long"),
                F.floor((F.col(hi) - 1e-12) / band_width).cast("long"),
            )
        ),
    )
    keyed = probe.withColumn("__band", F.floor(F.col(value) / band_width).cast("long"))
    return (
        keyed.join(banded, on="__band", how="inner")
        .filter((F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi)))
        .drop("__band")
    )


# ---------------------------------------------------------------------------
# J1 — inner equi-join
# ---------------------------------------------------------------------------


@query(
    "j1_inner_join",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS gross
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    category="join",
)
def inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim equi-join + aggregate; Catalyst/AQE choose the strategy.
    Money sum is int64-quantized (exact, order-independent, ~3× faster than
    the decimal-cast idiom on the hot path)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.sum(F.floor(F.col("l_extendedprice") * 1000000.0 + 0.5).cast("bigint"))
                .cast("double")
                / 1000000.0
            ).alias("gross"),
        )
    )


# ---------------------------------------------------------------------------
# J2 — outer joins
# ---------------------------------------------------------------------------


@query(
    "j2_left_outer",
    oracle="""
SELECT c_custkey,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(22,6))), 0) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
    category="join",
)
def left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN keeping order-less customers (count of non-null = 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(22,6)")).cast("double"),
                F.lit(0.0),
            ).alias("total_spend"),
        )
    )


@query(
    "j2_full_outer",
    oracle="""
SELECT COALESCE(cn.k, sn.k) AS nationkey, cn.n_cust, sn.n_supp
FROM (SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_cust FROM customer GROUP BY 1) cn
FULL JOIN (SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_supp FROM supplier GROUP BY 1) sn
ON cn.k = sn.k
""",
    category="join",
)
def full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER over two aggregated sides (nulls where a side is absent)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_cust"))
    sn = s.groupBy(F.col("s_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_supp"))
    return cn.join(sn, cn.k == sn.k, "full").select(
        F.coalesce(cn.k, sn.k).alias("nationkey"), "n_cust", "n_supp"
    )


# ---------------------------------------------------------------------------
# J3 — broadcast join (explicit hint)
# ---------------------------------------------------------------------------


@query(
    "j3_broadcast_join",
    oracle="""
SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    category="join",
)
def broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim tables broadcast — zero shuffle for the joins; only the final
    aggregation shuffles. Same results as j1 semantics, different physical plan."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# J4/J5 — semi / anti
# ---------------------------------------------------------------------------


@query(
    "j4_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""",
    category="join",
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi: no row multiplication, right side only probed."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "j5_anti_join",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    category="join",
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti (customers that never ordered)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# J6 — multi-way star join (TPC-H Q5 shape)
# ---------------------------------------------------------------------------


@query(
    "j6_star_join",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
    category="join",
)
def star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star: local-supplier revenue by nation for one region/year.

    Join order is chosen for scale, not left to chance: the region-filtered
    supplier dimension (1/5 of nations survive) broadcasts against the fact
    FIRST, semi-reducing lineitem ~5× before anything shuffles; only then
    do the two fact-side shuffles (orderkey, custkey) run, each on the
    reduced row set. The same plan at 100 TB: the most selective broadcast
    dimension always joins first, and the shuffle joins see only surviving
    rows. AQE still gets the last word (it can switch the customer join to
    broadcast at small sf)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s_asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o_year = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s_asia), li.l_suppkey == F.col("s_suppkey"))
        .join(o_year, li.l_orderkey == F.col("o_orderkey"))
        .join(
            c,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000.0
                        + 0.5
                    ).cast("bigint")
                )
                .cast("double")
                / 1000000.0
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# J7 — cross / theta join
# ---------------------------------------------------------------------------


@query(
    "j7_cross_join",
    oracle="""
SELECT a.r_name AS r1, b.r_name AS r2
FROM region a, region b
WHERE a.r_name < b.r_name
""",
    category="join",
)
def cross_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered pairs via crossJoin + theta predicate (BNLJ; both sides tiny —
    at scale a cross join is only ever allowed against a broadcast-bounded side)."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("r1"))
    b = r.select(F.col("r_name").alias("r2"))
    return a.crossJoin(b).filter(F.col("r1") < F.col("r2"))


@query(
    "j7_theta_join",
    oracle="""
SELECT s_suppkey, c_custkey
FROM supplier JOIN customer
  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal AND c_acctbal > 9500
""",
    category="join",
)
def theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + inequality residual — hash join with a post-filter, not BNLJ."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500)
    return s.join(
        c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal)
    ).select("s_suppkey", "c_custkey")


# ---------------------------------------------------------------------------
# J8 — range join via band expansion
# ---------------------------------------------------------------------------


@query(
    "j8_range_join",
    oracle="""
WITH tiers(lo, hi, tier) AS (
  VALUES (0.0, 10.0, 'XS'), (10.0, 25.0, 'S'), (25.0, 40.0, 'M'), (40.0, 100.0, 'L')
)
SELECT tier,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,6))) AS DOUBLE) AS rev
FROM lineitem JOIN tiers ON l_quantity >= lo AND l_quantity < hi
GROUP BY tier
""",
    category="join",
)
def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join rewritten as banded equi-join (see range_join docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    tiers = spark.createDataFrame(
        [(0.0, 10.0, "XS"), (10.0, 25.0, "S"), (25.0, 40.0, "M"), (40.0, 100.0, "L")],
        "lo double, hi double, tier string",
    )
    joined = range_join(li, tiers, "l_quantity", "lo", "hi", band_width=8.0)
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(22,6)")).cast("double").alias("rev"),
    )


# ---------------------------------------------------------------------------
# J9 — as-of join
# ---------------------------------------------------------------------------


@query(
    "j9_asof_join",
    oracle="""
WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       MAX(c.ts) AS click_ts,
       MAX(CASE WHEN c.ts IS NOT NULL THEN {'__ts': c.ts, 'event_id': c.event_id} END).event_id AS click_id
FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
GROUP BY p.event_id, p.user_id, p.ts
""",
    category="join",
)
def asof_purchases_to_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the latest click at-or-before it (same user).
    Spark side is the scalable union+window rewrite; the oracle uses the
    O(pairs) grouped formulation — same semantics, ties broken identically
    by (ts, event_id) lexicographic max."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    joined = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts", payload_cols=["event_id"]
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("__asof.__ts").alias("click_ts"),
        F.col("__asof.event_id").alias("click_id"),
    )


# ---------------------------------------------------------------------------
# J10 — self join (funnel)
# ---------------------------------------------------------------------------


@query(
    "j10_self_join_funnel",
    oracle="""
SELECT s.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM events s JOIN events p
  ON s.user_id = p.user_id AND CAST(p.ts AS TIMESTAMP) > CAST(s.ts AS TIMESTAMP)
WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
GROUP BY s.user_id
""",
    category="join",
)
def self_join_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup→purchase pairs per user via self-join on the events table."""
    e = load_table(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("user_id"), F.col("ts").alias("s_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        s.join(p, (s.user_id == p.p_user) & (p.p_ts > s.s_ts))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# J11 — bucketed co-located join (no shuffle at join time)
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int, path: str
) -> None:
    """Persist ``df`` bucketed+sorted by ``key``: the bucket id is a function
    of the key, so two tables bucketed the same way join WITHOUT a shuffle
    or sort — the single biggest lever for repeated fact-to-fact joins at
    100 TB (pay the shuffle once at write time, amortize over every join)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders with both sides bucketed by orderkey — the join
    plan is a SortMergeJoin over bucketed scans with ZERO Exchange nodes
    (asserted in tests/test_plans.py)."""
    import os
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(tempfile.gettempdir(), "shadowcat_bucketed", tag)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    write_bucketed(li, f"li_bucketed_{tag.replace('.', '_')}", "l_orderkey", 8,
                   os.path.join(base, "lineitem"))
    write_bucketed(o, f"o_bucketed_{tag.replace('.', '_')}", "o_orderkey", 8,
                   os.path.join(base, "orders"))
    lib = spark.table(f"li_bucketed_{tag.replace('.', '_')}")
    ob = spark.table(f"o_bucketed_{tag.replace('.', '_')}")
    # hint MERGE: at fixture scale Catalyst would broadcast the small side
    # (and ignore bucketing); at 100 TB both sides are fact-sized and
    # sort-merge over co-located buckets is the only sane plan — the hint
    # pins the plan this operator exists to demonstrate.
    return lib.hint("merge").join(ob, F.col("l_orderkey") == F.col("o_orderkey"))


@query(
    "j11_bucketed_join",
    oracle="""
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
    category="join",
)
def bucketed_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as a plain orders⋈lineitem join — but co-located: both
    sides were bucketed by the join key at write time, so the join itself
    shuffles nothing."""
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000.0 + 0.5
    ).cast("long")
    return (
        bucketed_orders_lineitem(spark, sf_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(rev).cast("double") / 1000000.0).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J12 — salted join (deterministic skew mitigation)
# ---------------------------------------------------------------------------


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_expr: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join where the big side's hot keys are split across ``n_salts``
    sub-keys and the small side is replicated n_salts×. Result is identical
    to the plain join; each hot key's rows now land on n_salts reducers
    instead of one. ``salt_expr`` must be DETERMINISTIC (e.g. pmod of a
    row-identifying hash) — F.rand() would break retries/speculation.
    Complementary to AQE skew-join: salting also fixes skewed AGGREGATIONS
    downstream, which AQE's join splitting does not."""
    b = big.withColumn("__salt", salt_expr)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(
        s, (F.col(big_key) == F.col(small_key)) & (b["__salt"] == s["__salt"])
    ).drop("__salt")


@query(
    "j12_salted_join",
    oracle="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS volume
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
""",
    category="join",
)
def salted_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ supplier through the salting rewrite — hash-matches the
    plain join, proving salting changes the distribution, not the result."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(8)).cast("int")
    vol = F.floor(F.col("l_extendedprice") * 1000000.0 + 0.5).cast("long")
    return (
        salted_join(li, s, "l_suppkey", "s_suppkey", salt)
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(vol).cast("double") / 1000000.0).alias("volume"),
        )
    )


# ---------------------------------------------------------------------------
# J13 — interval-overlap join (interval × interval, bucket-expansion rewrite)
# ---------------------------------------------------------------------------


def interval_overlap_join(
    L: DataFrame,
    R: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_days: int = 7,
) -> DataFrame:
    """Equi-join rewrite of ``L ⋈ R ON l_lo < r_hi AND r_lo < l_hi``
    (half-open date intervals). Each interval explodes to the day-buckets
    it covers, the join runs on bucket, and a pair is emitted only in the
    FIRST bucket both share (``wk = bucket(greatest(lo))``) so no distinct
    pass is needed. Output: all L columns then all R columns. Fan-out per
    row is interval_len/bucket_days + 1 — pick the bucket near the typical
    interval length."""

    def bucket(c: Column) -> Column:
        return F.floor(F.datediff(c, F.lit("1970-01-01").cast("date")) / bucket_days)

    Lw = L.withColumn("__wk", F.explode(F.sequence(bucket(F.col(l_lo)), bucket(F.col(l_hi)))))
    Rw = R.withColumn("__wk", F.explode(F.sequence(bucket(F.col(r_lo)), bucket(F.col(r_hi)))))
    return (
        Lw.join(Rw, "__wk")
        .filter(
            (F.col(l_lo) < F.col(r_hi))
            & (F.col(r_lo) < F.col(l_hi))
            & (F.col("__wk") == bucket(F.greatest(l_lo, r_lo)))
        )
        .select(*L.columns, *R.columns)
    )


@query(
    "j13_interval_overlap",
    oracle="""
WITH L AS (
  SELECT o_orderkey AS l_id, CAST(o_orderdate AS DATE) AS l_lo,
         CAST(o_orderdate AS DATE) + 7 AS l_hi
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-03-01'
), R AS (
  SELECT o_orderkey AS r_id, CAST(o_orderdate AS DATE) AS r_lo,
         CAST(o_orderdate AS DATE) + 7 AS r_hi
  FROM orders
  WHERE o_orderpriority = '5-LOW'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-03-01'
)
SELECT l_id, r_id,
       CAST(date_diff('day', GREATEST(l_lo, r_lo), LEAST(l_hi, r_hi)) AS BIGINT)
         AS overlap_days
FROM L JOIN R ON l_lo < r_hi AND r_lo < l_hi
""",
    category="join",
)
def interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (urgent-order activity windows vs
    low-priority windows, 7-day half-open intervals): the join predicate
    ``l_lo < r_hi AND r_lo < l_hi`` has no equi key, so a naive plan is a
    BNLJ cross product. The rewrite: explode each interval to the ISO
    weeks it covers, equi-join on week (hash join, shuffles only matching
    weeks), keep exactly the FIRST shared week (``wk = week(greatest(l_lo,
    r_lo))`` — a dedup-free emit condition), then apply the residual
    overlap predicate. Scales as Σ per-bucket products like j8's band
    join; bucket width tunes fan-out vs selectivity. The oracle states the
    same join in its natural theta form."""
    o = load_table(spark, sf_dir, "orders")

    def windows(prio: str, lid: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderpriority") == prio)
                & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-03-01").cast("timestamp"))
            )
            .select(
                F.col("o_orderkey").alias(lid),
                F.col("o_orderdate").cast("date").alias(f"{lid[0]}_lo"),
                F.date_add(F.col("o_orderdate").cast("date"), 7).alias(f"{lid[0]}_hi"),
            )
        )

    joined = interval_overlap_join(
        windows("1-URGENT", "l_id"), windows("5-LOW", "r_id"),
        "l_lo", "l_hi", "r_lo", "r_hi", bucket_days=7,
    )
    return joined.select(
        "l_id",
        "r_id",
        F.datediff(F.least("l_hi", "r_hi"), F.greatest("l_lo", "r_lo"))
        .cast("long")
        .alias("overlap_days"),
    )


# ---------------------------------------------------------------------------
# J14 — LATERAL correlated subquery join (top-N per row)
# ---------------------------------------------------------------------------


@query(
    "j14_lateral_join",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_mktsegment = 'BUILDING'
""",
    category="join",
)
def lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each customer's top-2 orders by price.
    Catalyst decorrelates this into a join + per-key window rank (see
    DomainJoin in the analyzed plan) — the same physical shape as the W2
    rewrite, but declared in ANSI form. Deterministic via the unique
    o_orderkey tiebreaker."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("j14_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("j14_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM j14_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM j14_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


# ---------------------------------------------------------------------------
# J15 — Bloom-style pre-filtered join (coarse-bucket semi join before shuffle)
# ---------------------------------------------------------------------------

_J15_BUCKETS = 8192


@query(
    "j15_bloom_prefilter_join",
    oracle="""
SELECT l.l_orderkey, l.l_partkey, p.p_brand,
       CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#23'
""",
    category="join",
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈selective-dim with an explicit Bloom-style pre-filter: the
    filtered dim's key set is collapsed to coarse hash buckets (a 1-hash
    Bloom filter with 8192 cells), broadcast, and semi-joined against the
    fact BEFORE the exact join. False positives are removed by the exact
    join; the result is identical to the plain join (the oracle). At 100 TB
    the bucket semi-join prunes most fact rows before the wide shuffle —
    the manual twin of Spark's runtime bloom-filter injection
    (spark.sql.optimizer.runtime.bloomFilter.enabled), kept explicit so the
    plan shape is inspectable and engine-version-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    bucket_of = lambda c: F.pmod(F.xxhash64(c), F.lit(_J15_BUCKETS))  # noqa: E731
    dim_buckets = p.select(bucket_of(F.col("p_partkey")).alias("bkt")).distinct()
    pre = li.join(
        F.broadcast(dim_buckets),
        bucket_of(F.col("l_partkey")) == F.col("bkt"),
        "left_semi",
    )
    return pre.join(F.broadcast(p), pre.l_partkey == p.p_partkey).select(
        "l_orderkey",
        "l_partkey",
        "p_brand",
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long").alias("price_cents"),
    )


# ---------------------------------------------------------------------------
# J16 — physical join-strategy control via hints (SHUFFLE_HASH)
# ---------------------------------------------------------------------------


@query(
    "j16_shuffle_hash_hint",
    oracle="""
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
    category="join",
)
def shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as a plain lineitem⋈part, with the physical strategy
    PINNED to ShuffledHashJoin via hint — no sort on either side, one hash
    table per partition. The right call when both sides are too big to
    broadcast but one side's PER-PARTITION slice fits memory (sort-merge
    pays two sorts it doesn't need). Hints override Catalyst where the
    operator author knows the data shape; the plan is asserted in
    tests/test_plans.py."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").hint("shuffle_hash")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.sum(F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long")).cast(
                    "double"
                )
                / 100.0
            ).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# J17 — null-safe equi-join (NULL keys match NULL keys)
# ---------------------------------------------------------------------------


@query(
    "j17_null_safe_join",
    oracle="""
WITH l AS (
  SELECT o_orderkey, CASE WHEN o_orderkey % 7 = 0 THEN NULL
                          ELSE o_custkey % 50 END AS k
  FROM orders
), r AS (
  SELECT CASE WHEN g % 5 = 0 THEN NULL ELSE g END AS k,
         'grp_' || CAST(g AS VARCHAR) AS label
  FROM (SELECT UNNEST(generate_series(0, 49)) AS g)
)
SELECT l.o_orderkey, r.label
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
""",
    category="join",
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantics a dimension
    lookup with an explicit 'unknown' bucket needs. Still plans as a hash
    join (null-safe equality is an equi-key after null boxing), not a
    nested loop; a plain = join silently drops the NULL population, the
    classic reconciliation bug this operator exists to avoid."""
    o = load_table(spark, sf_dir, "orders")
    left = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_custkey") % 50)
        .alias("k"),
    )
    right = (
        load_table(spark, sf_dir, "orders")
        .sparkSession.range(0, 50)
        .select(
            F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("rk"),
            F.concat(F.lit("grp_"), F.col("id").cast("string")).alias("label"),
        )
    )
    return left.join(
        F.broadcast(right), left["k"].eqNullSafe(right["rk"]), "inner"
    ).select("o_orderkey", "label")


# ---------------------------------------------------------------------------
# J18 — dynamic partition pruning (Spark-native DPP over a Hive layout)
# ---------------------------------------------------------------------------


@query(
    "j18_dynamic_partition_pruning",
    oracle="""
WITH dim AS (
  SELECT DISTINCT o_orderpriority,
         TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS prio_rank
  FROM orders
)
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total
FROM orders o JOIN dim d USING (o_orderpriority)
WHERE d.prio_rank <= 2
GROUP BY o.o_orderpriority
""",
    category="join",
)
def dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-NATIVE dynamic partition pruning, the engine-built-in twin
    of m40's manifest-level runtime filter: the fact table is laid out
    as Hive partitions on o_orderpriority, the dim side carries a
    selective non-partition filter, and Catalyst injects a
    ``dynamicpruning`` subquery into the fact scan's PartitionFilters —
    whole partition DIRECTORIES are skipped at runtime using the dim's
    actual rows, before any fact file is opened (plan-asserted in
    pytest). At 100 TB this is the free 5×-50× on every star join whose
    fact is partitioned on the join key; the write below plays the role
    of the already-partitioned warehouse table."""
    import shutil

    from ..sources.io import _scratch

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    scratch = _scratch(sf_dir, "j18_orders_part")
    shutil.rmtree(scratch, ignore_errors=True)
    o.write.partitionBy("o_orderpriority").mode("overwrite").parquet(scratch)
    # explicit schema: an EMPTY staged layout (zero-row orders) has no
    # files to infer from — inference would throw UNABLE_TO_INFER_SCHEMA;
    # partition discovery still runs, so DPP is unaffected (plan-asserted)
    fact = spark.read.schema(o.schema).parquet(scratch)
    dim = (
        o.select("o_orderpriority")
        .distinct()
        # try_cast: NULL / '' / non-numeric priorities yield a NULL rank
        # (dropped by the <= filter) instead of an ANSI cast error —
        # mirrored by TRY_CAST in the oracle
        .withColumn(
            "prio_rank", F.substring("o_orderpriority", 1, 1).try_cast("int")
        )
        .filter(F.col("prio_rank") <= 2)
    )
    return (
        fact.join(dim, "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(
                    F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
                ).cast("double")
                / 100.0
            ).alias("total"),
        )
    )
