"""Database-maintenance jobs (the reference's core workload, SURVEY.md
§1.1 [RECON]: collection scan → per-record check/transform → report),
re-expressed as declarative Spark plans.

Each job is one pass over the table(s) with the work pushed into
aggregates/joins — no per-record cursor loop, no driver-side iteration.
At 100 TB these are the jobs you schedule nightly: diff two snapshots,
audit referential integrity, profile column health, fill calendar gaps.
"""

from __future__ import annotations

import os

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


# ---------------------------------------------------------------------------
# M5 — CDC apply: merge a change log into a snapshot, last-writer-wins
# ---------------------------------------------------------------------------


def apply_changelog(snapshot: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Apply an insert/update/delete change log to a snapshot.

    ``changes`` columns: key, ``op`` ('I'/'U'/'D'), ``seq`` (version order),
    plus the new column values. Last-writer-wins: only the highest-``seq``
    change per key applies. One window over the changelog (small relative to
    the snapshot) + one shuffle join on the key — the snapshot is never
    rewritten per-change, which is what makes this the 100 TB CDC pattern
    (the same shape Delta/Iceberg MERGE compiles to).

    Partial updates: a snapshot column ABSENT from the change-set keeps
    its snapshot value on 'U' rows and is NULL on 'I' rows — the SQL
    MERGE "WHEN MATCHED THEN UPDATE SET <only these>" contract. (The
    pre-r04 behavior took the column list from the CHANGES, so a
    narrower change-set silently dropped — then null-padded — every
    unmentioned column of the rows it touched.)"""
    w = W.partitionBy(key).orderBy(F.col("seq").desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "seq")
    )
    val_cols = [c for c in snapshot.columns if c != key]
    change_cols = set(latest.columns)
    extra = [c for c in latest.columns if c not in (key, "op") and c not in snapshot.columns]
    if extra:
        raise ValueError(
            f"change-set columns {extra} do not exist in the snapshot schema"
        )
    merged = snapshot.alias("s").join(latest.alias("c"), key, "left")
    kept = merged.filter(F.col("c.op").isNull() | (F.col("c.op") == "U")).select(
        key,
        *[
            (
                F.when(F.col("c.op") == "U", F.col(f"c.{c}"))
                .otherwise(F.col(f"s.{c}"))
                if c in change_cols
                else F.col(f"s.{c}")
            ).alias(c)
            for c in val_cols
        ],
    )
    schema = {f.name: f.dataType for f in snapshot.schema.fields}
    inserts = latest.filter(F.col("op") == "I").select(
        key,
        *[
            (F.col(c) if c in change_cols else F.lit(None).cast(schema[c])).alias(c)
            for c in val_cols
        ],
    )
    return kept.unionByName(inserts)


def orders_cdc_changes(o: DataFrame) -> DataFrame:
    """The canonical deterministic orders change-set shared by m5 and the
    lakehouse MERGE queries (m17/m18/m19): updates on keys %5==1 (two
    versions, seq-2 wins), deletes on %5==0, inserts of new keys for
    %5==2. One definition, one oracle CTE (ORDERS_CDC_CTE) — an edit here
    changes every consumer and its oracle together."""
    upd1 = o.filter(F.col("o_orderkey") % 5 == 1).select(
        "o_orderkey", F.lit("U").alias("op"), F.lit(1).alias("seq"),
        (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
    )
    upd2 = o.filter(
        (F.col("o_orderkey") % 5 == 1) & (F.col("o_orderkey") % 3 == 0)
    ).select(
        "o_orderkey", F.lit("U").alias("op"), F.lit(2).alias("seq"),
        (F.col("o_totalprice") + 20.0).alias("o_totalprice"),
    )
    dels = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", F.lit("D").alias("op"), F.lit(1).alias("seq"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    ins = o.filter(F.col("o_orderkey") % 5 == 2).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        F.lit("I").alias("op"), F.lit(1).alias("seq"), F.col("o_totalprice"),
    )
    return upd1.unionByName(upd2).unionByName(dels).unionByName(ins)


ORDERS_CDC_CTE = """
WITH changes AS (
  SELECT o_orderkey AS k, 'U' AS op, 1 AS seq, o_totalprice + 10.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 5 = 1
  UNION ALL
  SELECT o_orderkey, 'U', 2, o_totalprice + 20.0
  FROM orders WHERE o_orderkey % 5 = 1 AND o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, 'D', 1, NULL FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, 'I', 1, o_totalprice
  FROM orders WHERE o_orderkey % 5 = 2
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
"""


@query(
    "m5_cdc_apply",
    oracle=ORDERS_CDC_CTE + """
SELECT o_orderkey, o_totalprice FROM merged
""",
    category="maintenance",
)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a deterministic synthetic change log to the orders snapshot:
    updates on keys %5==1 (two versions — the seq-2 one must win), deletes
    on %5==0, inserts of new keys for %5==2. The +10.0/+20.0 double adds are
    IEEE-exact in both engines. Exercises the full CDC merge: LWW window,
    delete filter, update substitution, insert union."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return apply_changelog(o, orders_cdc_changes(o), "o_orderkey").select(
        "o_orderkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# M6 — delete propagation: cascade a key delete-set through FK chains
# ---------------------------------------------------------------------------


@query(
    "m6_delete_propagation",
    oracle="""
WITH del_cust AS (SELECT c_custkey FROM customer WHERE c_custkey % 17 = 0),
del_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM del_cust)
),
del_lines AS (
  SELECT 1 AS one FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)
)
SELECT * FROM (
  SELECT 'customer' AS table_name,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM del_cust) AS n_deleted,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) - (SELECT COUNT(*) FROM del_cust) AS n_kept
  UNION ALL
  SELECT 'orders',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM del_orders),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) - (SELECT COUNT(*) FROM del_orders)
  UNION ALL
  SELECT 'lineitem',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM del_lines),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) - (SELECT COUNT(*) FROM del_lines)
)
""",
    category="maintenance",
)
def delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style cascade: a customer delete-set propagates through
    customer→orders→lineitem, reporting deleted/kept counts per table.
    Each hop is a semi join against the previous hop's keys (broadcast
    while the delete-set is small; at 100 TB a shuffle semi join on the FK).
    The real job would anti-join-rewrite each table; counting both sides
    here proves the partition without materializing the rewrite twice.
    Everything is ONE plan (flag column + conditional count per table,
    union of one-row frames) — no driver-side count loop, so the three
    table scans run as one job and can share the scheduler wave."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    del_cust = c.filter(F.col("c_custkey") % 17 == 0)
    del_orders = o.join(
        F.broadcast(del_cust), o["o_custkey"] == del_cust["c_custkey"], "left_semi"
    ).select("o_orderkey")

    def counted(name: str, df: DataFrame, is_del) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.when(is_del, 1)).alias("n_deleted"),
            F.count(F.when(~is_del, 1)).alias("n_kept"),
        )

    cust_counts = counted("customer", c, F.col("c_custkey") % 17 == 0)
    ord_flag = o.join(
        F.broadcast(del_cust), o["o_custkey"] == del_cust["c_custkey"], "left"
    )
    ord_counts = counted("orders", ord_flag, F.col("c_custkey").isNotNull())
    line_flag = li.join(
        del_orders.withColumnRenamed("o_orderkey", "del_ok"),
        li["l_orderkey"] == F.col("del_ok"),
        "left",
    )
    line_counts = counted("lineitem", line_flag, F.col("del_ok").isNotNull())
    return cust_counts.unionByName(ord_counts).unionByName(line_counts)


# ---------------------------------------------------------------------------
# M7 — catalog surface: managed tables, metadata listing, integrity
# ---------------------------------------------------------------------------


@query(
    "m7_catalog_roundtrip",
    oracle="""
SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations
FROM nation GROUP BY n_regionkey
""",
    category="maintenance",
)
def catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metastore path end-to-end: ``saveAsTable`` a managed table into
    a dedicated database, confirm it via the catalog API, query it back by
    NAME (not path), drop-safe. A registry/catalog system lives on this
    surface — named tables are what downstream consumers bind to, and the
    catalog is where stats for CBO (`ANALYZE TABLE`) attach. The result is
    computed from the round-tripped managed table; the oracle reads the
    original parquet — equality proves a lossless catalog round-trip."""
    # stable per-sf_dir name (Python hash() is process-salted — it would
    # mint a fresh database every run and litter the warehouse dir)
    import hashlib
    import shutil
    from urllib.parse import urlparse

    tag = "sc_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {tag}")
    # the warehouse DIRECTORY outlives the in-memory catalog: a table dir
    # left by a previous process isn't in THIS session's catalog, and
    # saveAsTable then fails with LOCATION_ALREADY_EXISTS even in
    # overwrite mode — drop both the entry and the stale location first
    spark.sql(f"DROP TABLE IF EXISTS {tag}.nation_managed")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, f"{tag}.db", "nation_managed"), ignore_errors=True)
    n = load_table(spark, sf_dir, "nation")
    n.write.mode("overwrite").saveAsTable(f"{tag}.nation_managed")
    assert any(
        t.name == "nation_managed" for t in spark.catalog.listTables(tag)
    ), "catalog listing missing the managed table"
    back = spark.table(f"{tag}.nation_managed")
    return back.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n_nations"))


# ---------------------------------------------------------------------------
# M8 — governed views: row-level + column-level security (Lakeguard pattern)
# ---------------------------------------------------------------------------


def governed_customer_view(spark: SparkSession, sf_dir: str, segment: str) -> DataFrame:
    """Tenant-scoped secure view over customer: row filter (only the
    tenant's market segment) + column masking (names redacted to a stable
    token, balances bucketed to quartiles of their absolute range). The
    enforcement point is the VIEW DEFINITION — consumers never see the
    base table, which is how fine-grained access control composes with a
    shared engine (cf. PAPERS.md: Databricks Lakeguard, SIGMOD 2025). At
    scale the row filter pushes down to the scan like any predicate."""
    c = load_table(spark, sf_dir, "customer")
    masked_name = F.concat(F.lit("cust-"), F.sha2(F.col("c_name"), 256).substr(1, 8))
    bal_bucket = F.least(
        F.greatest(F.floor(F.col("c_acctbal") / 2500.0).cast("int"), F.lit(-1)),
        F.lit(4),
    )
    return c.filter(F.col("c_mktsegment") == segment).select(
        "c_custkey",
        masked_name.alias("masked_name"),
        bal_bucket.alias("balance_bucket"),
        "c_mktsegment",
    )


@query(
    "m8_governed_view",
    oracle="""
SELECT c_custkey,
       concat('cust-', substr(sha256(c_name), 1, 8)) AS masked_name,
       CAST(LEAST(GREATEST(FLOOR(c_acctbal / 2500.0), -1), 4) AS INTEGER) AS balance_bucket,
       c_mktsegment
FROM customer
WHERE c_mktsegment = 'BUILDING'
""",
    category="maintenance",
)
def governed_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILDING tenant's governed view: row-filtered, name-masked,
    balance-bucketed. sha256 and floor are bit-identical across engines, so
    even the masking is oracle-checkable."""
    return governed_customer_view(spark, sf_dir, "BUILDING")


# ---------------------------------------------------------------------------
# M9 — declarative data-quality expectation suite
# ---------------------------------------------------------------------------


@query(
    "m9_expectation_suite",
    oracle="""
SELECT 'customer.c_custkey.not_null' AS rule_id,
       CAST(COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS BIGINT) AS violations
FROM customer
UNION ALL
SELECT 'customer.c_custkey.unique',
       CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer
UNION ALL
SELECT 'customer.c_acctbal.in_range',
       CAST(COUNT(CASE WHEN c_acctbal NOT BETWEEN -1000.0 AND 10000.0 THEN 1 END)
            AS BIGINT) FROM customer
UNION ALL
SELECT 'customer.c_mktsegment.in_set',
       CAST(COUNT(CASE WHEN c_mktsegment NOT IN
            ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
            THEN 1 END) AS BIGINT) FROM customer
UNION ALL
SELECT 'orders.o_totalprice.positive',
       CAST(COUNT(CASE WHEN o_totalprice <= 0.0 THEN 1 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders.o_custkey.fk_customer',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
""",
    category="maintenance",
)
def expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite (the dbt-test / Great-Expectations
    job shape): each rule reduces to ONE violation count — null check,
    uniqueness, numeric range, value-set membership, FK integrity — and
    the suite is a union of tiny aggregates. Catalyst collapses the
    per-table rules into shared scans; the FK rule is an anti join, never
    a correlated probe. The (rule_id, violations) relation is the contract
    a pipeline gate consumes: non-zero rows block the publish step. At
    100 TB every rule is a scan-local partial aggregate except the anti
    join, which shuffles only keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

    def rule(df: DataFrame, rule_id: str, violation) -> DataFrame:
        return df.agg(
            F.count(F.when(violation, 1)).cast("long").alias("violations")
        ).select(F.lit(rule_id).alias("rule_id"), "violations")

    unique = c.agg(
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).cast("long").alias("violations")
    ).select(F.lit("customer.c_custkey.unique").alias("rule_id"), "violations")
    orphans = (
        o.join(c.select("c_custkey"), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .select(F.lit("orders.o_custkey.fk_customer").alias("rule_id"), "violations")
    )
    return (
        rule(c, "customer.c_custkey.not_null", F.col("c_custkey").isNull())
        .unionByName(unique)
        .unionByName(
            rule(c, "customer.c_acctbal.in_range", ~F.col("c_acctbal").between(-1000.0, 10000.0))
        )
        .unionByName(
            rule(c, "customer.c_mktsegment.in_set", ~F.col("c_mktsegment").isin(segs))
        )
        .unionByName(rule(o, "orders.o_totalprice.positive", F.col("o_totalprice") <= 0.0))
        .unionByName(orphans)
    )


# ---------------------------------------------------------------------------
# M10 — incremental aggregate maintenance (merge partials ≡ full recompute)
# ---------------------------------------------------------------------------


@query(
    "m10_incremental_agg",
    oracle="""
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS total_value
FROM events GROUP BY 1, 2
""",
    category="maintenance",
)
def incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the daily summary is
    kept as MERGEABLE partials (count + quantized sum), so applying a new
    batch is agg(delta) ∪ summary → re-agg — never a full recompute. The
    oracle IS the full recompute, proving merge ≡ rebuild. The split date
    models 'summary so far + tonight's batch'. At 100 TB the summary table
    is tiny relative to the fact, so maintenance cost is O(delta), the
    whole point of incremental view maintenance. Quantized integer sums
    make the merge exactly associative — double partials would drift."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        "value",
        F.col("ts"),
    )
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1e6 + 0.5).cast("long")).alias("sum_q"),
        )

    base = partials(e.filter(F.col("ts") < cutoff))  # existing summary
    delta = partials(e.filter(F.col("ts") >= cutoff))  # tonight's batch
    merged = (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_q").alias("sum_q"))
    )
    return merged.select(
        "day",
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("sum_q").cast("double") / 1e6).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# M11 — SCD type-2 history build (validity intervals from a change feed)
# ---------------------------------------------------------------------------


@query(
    "m11_scd2_history",
    oracle="""
WITH versions AS (
  SELECT o_orderkey AS k, 0 AS seq, o_totalprice AS price
  FROM orders WHERE o_orderkey % 5 = 1
  UNION ALL
  SELECT o_orderkey, 1, o_totalprice + 10.0 FROM orders WHERE o_orderkey % 5 = 1
  UNION ALL
  SELECT o_orderkey, 2, o_totalprice + 20.0
  FROM orders WHERE o_orderkey % 5 = 1 AND o_orderkey % 3 = 0
)
SELECT k AS o_orderkey, CAST(seq AS INTEGER) AS valid_from, price,
       CAST(LEAD(seq) OVER (PARTITION BY k ORDER BY seq) AS INTEGER) AS valid_to,
       LEAD(seq) OVER (PARTITION BY k ORDER BY seq) IS NULL AS is_current
FROM versions
""",
    category="maintenance",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2: fold a versioned change feed into
    validity intervals — each version row gets [valid_from, valid_to) from
    its own sequence number and the NEXT version's (lead), with the open
    interval marking the current row. One window over (key, seq); at scale
    this is a single shuffle on the dimension key, and the change feed is
    the same deterministic synthetic CDC used by m5/t13 (two updates on
    keys %5==1, the second only on %3==0)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = o.filter(F.col("o_orderkey") % 5 == 1)
    v0 = base.select(
        F.col("o_orderkey").alias("k"), F.lit(0).alias("seq"), F.col("o_totalprice").alias("price")
    )
    v1 = base.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("seq"),
        (F.col("o_totalprice") + 10.0).alias("price"),
    )
    v2 = base.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"), F.lit(2).alias("seq"), (F.col("o_totalprice") + 20.0).alias("price")
    )
    versions = v0.unionByName(v1).unionByName(v2)
    w = W.partitionBy("k").orderBy("seq")
    nxt = F.lead("seq").over(w)
    return versions.select(
        F.col("k").alias("o_orderkey"),
        F.col("seq").cast("int").alias("valid_from"),
        "price",
        nxt.cast("int").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# M12 — backfill planner (which partitions are missing from a summary?)
# ---------------------------------------------------------------------------


@query(
    "m12_backfill_plan",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
), summary AS (
  SELECT * FROM daily WHERE CAST(extract(day FROM day) AS INTEGER) % 3 <> 0
), bounds AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
), cal AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
)
SELECT c.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_to_backfill
FROM cal c LEFT JOIN daily d ON c.day = d.day
WHERE NOT EXISTS (SELECT 1 FROM summary s WHERE s.day = c.day)
""",
    category="maintenance",
)
def backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planner: compare a (hole-injected) summary table against
    the full calendar spanned by the fact and emit the partitions a
    backfill job must rebuild, with the row count each would write.
    Calendar generation is sequence+explode in executors; the summary
    comparison is an anti join — at 100 TB both sides are summary-sized
    (days), never fact-sized, so the planning query is free regardless of
    fact volume. Holes are injected deterministically (day-of-month %3==0)
    to model lost partitions."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    summary = daily.filter(F.dayofmonth("day") % 3 != 0)
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    missing = cal.join(summary, "day", "left_anti")
    return missing.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_to_backfill")
    )


# ---------------------------------------------------------------------------
# M13 — dynamic partition overwrite (rebuild ONE day, leave the rest intact)
# ---------------------------------------------------------------------------


@query(
    "m13_dynamic_partition_overwrite",
    oracle="""
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CASE WHEN date_trunc('day', CAST(ts AS TIMESTAMP)) = TIMESTAMP '2024-01-05'
                 THEN 1 ELSE 0 END AS INTEGER) AS rebuilt
FROM events GROUP BY 1, 2
""",
    category="maintenance",
)
def dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped rebuild: a day-partitioned summary table gets ONE
    day rewritten (with a marker column flipped) via dynamic partition
    overwrite — only partitions present in the incoming frame are
    replaced; every other day's files are untouched. This is the nightly
    restatement primitive at 100 TB: overwrite cost ∝ restated partitions,
    never the table. The per-write option (not the global conf) scopes the
    behavior to this writer."""
    from ..sources.io import _scratch

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    base = daily.withColumn("rebuilt", F.lit(0)).withColumn(
        "day_key", F.date_format("day", "yyyy-MM-dd")
    )
    path = _scratch(sf_dir, "m13_daily")
    base.write.mode("overwrite").partitionBy("day_key").parquet(path)
    # restate ONE day: dynamic mode touches only the partitions in the frame
    restated = base.filter(F.col("day_key") == "2024-01-05").withColumn(
        "rebuilt", F.lit(1)
    )
    (
        restated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day_key")
        .parquet(path)
    )
    # explicit schema: an empty source writes zero files under partitionBy
    # and inference on the bare directory throws (empty in → empty out)
    back = spark.read.schema(base.schema).parquet(path)
    return back.select("day", "event_type", F.col("n").cast("long").alias("n"), "rebuilt")


# ---------------------------------------------------------------------------
# M14 — join-key skew report (the "will this shuffle straggle?" diagnostic)
# ---------------------------------------------------------------------------


@query(
    "m14_skew_report",
    oracle="""
SELECT col, CAST(n_keys AS BIGINT) AS n_keys, CAST(max_n AS BIGINT) AS max_n,
       med_n, round(max_n / (total * 1.0 / n_keys), 6) AS skew_factor
FROM (
  SELECT 'lineitem.l_suppkey' AS col, COUNT(*) AS n_keys, MAX(n) AS max_n,
         median(n) AS med_n, SUM(n) AS total
  FROM (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
  UNION ALL
  SELECT 'lineitem.l_partkey', COUNT(*), MAX(n), median(n), SUM(n)
  FROM (SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
  UNION ALL
  SELECT 'orders.o_custkey', COUNT(*), MAX(n), median(n), SUM(n)
  FROM (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1)
)
ORDER BY col
""",
    category="maintenance",
)
def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic for the table's hot join keys: per key
    column, the key count, the heaviest key's row count, the median, and
    the skew factor (max/mean). skew_factor ≫ 1 predicts a straggler task
    in any shuffle keyed on that column — the number AQE's skew-join
    threshold and manual salting decisions should be read against. Each
    column's profile is a two-level aggregation (key counts → distribution
    stats); the per-column reports union into one plan."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def profile(df: DataFrame, key: str, label: str) -> DataFrame:
        per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
        return per_key.agg(
            F.lit(label).alias("col"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").alias("max_n"),
            F.median("n").alias("med_n"),
            F.sum("n").alias("total"),
        )
    rep = (
        profile(li, "l_suppkey", "lineitem.l_suppkey")
        .unionByName(profile(li, "l_partkey", "lineitem.l_partkey"))
        .unionByName(profile(o, "o_custkey", "orders.o_custkey"))
    )
    return rep.select(
        "col",
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("max_n").cast("long").alias("max_n"),
        "med_n",
        F.round(
            F.col("max_n") / (F.col("total") / F.col("n_keys")), 6
        ).alias("skew_factor"),
    ).orderBy("col")


# ---------------------------------------------------------------------------
# M15 — orphan-file audit (directory listing vs commit manifest)
# ---------------------------------------------------------------------------


@query(
    "m15_orphan_file_audit",
    oracle="SELECT 'orphan_0001.jsonl' AS orphan_file, CAST(1 AS BIGINT) AS n_orphans",
    category="maintenance",
)
def orphan_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lakehouse vacuum precursor: list the table directory and
    anti-join it against the commit manifest — files on disk that no
    commit references (crashed writers, speculative task leftovers) are
    orphans, safe to delete after a retention window. Listing rides the
    binaryFile source (distributed, no driver os.walk at scale); the
    manifest side is by definition small → broadcast. One deterministic
    orphan is injected so the audit provably detects it."""
    import json as _json
    import shutil as _shutil
    import tempfile as _tempfile

    from ..sources.custom import _HAVE_PYDS, register_jsonl_sink

    if not _HAVE_PYDS:
        raise NotImplementedError("Python Data Source API requires PySpark 4+")
    register_jsonl_sink(spark)
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_tempfile.gettempdir(), "shadowcat_jsonl_sink", f"{tag}_m15")
    _shutil.rmtree(path, ignore_errors=True)
    n = load_table(spark, sf_dir, "nation")
    n.write.format("jsonlsink").option("path", path).mode("append").save()
    with open(os.path.join(path, "orphan_0001.jsonl"), "w") as fh:  # crashed writer
        fh.write('{"n_nationkey": 99}\n')
    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        manifest = _json.load(fh)
    committed = spark.createDataFrame(
        [(os.path.basename(m["path"]),) for m in manifest], "fname string"
    )
    listed = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.jsonl")
        .load(path)
        .select(F.regexp_extract("path", r"([^/]+)$", 1).alias("fname"))
    )
    orphans = listed.join(F.broadcast(committed), "fname", "left_anti")
    # one pass: total via empty-frame window, not a second listing+anti-join
    return orphans.select(
        F.col("fname").alias("orphan_file"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n_orphans"),
    )


# ---------------------------------------------------------------------------
# M16 — partition-size report (the small-file diagnosis)
# ---------------------------------------------------------------------------


@query(
    "m16_partition_size_report",
    oracle="""
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       CAST(1 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events GROUP BY 1
""",
    category="maintenance",
)
def partition_size_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition file census over a day-partitioned table:
    input_file_name() grouped by partition gives files-per-partition and
    rows-per-partition in one scan — the report that catches small-file
    explosions before they throttle a 100 TB scan (the fix being s9's
    compaction). The fixture layout is written with one file per day, so
    the expected census is deterministic and oracle-checkable; in
    production the same query runs unmodified and the numbers are the
    finding."""
    from ..sources.io import _scratch

    e = load_table(spark, sf_dir, "events")
    keyed_schema = e.withColumn("day_key", F.lit("x")).schema  # for empty read-back
    path = _scratch(sf_dir, "m16_daily_events")
    # repartition("day_key") alone gives the one-file-per-day layout the
    # oracle expects: each day_key hashes to exactly one shuffle partition,
    # so each day directory is written by exactly one task (no coalesce —
    # a fixed-width coalesce would cap write parallelism at any cluster
    # size and tie the fixture layout to a magic number).
    (
        e.withColumn("day_key", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
        .repartition("day_key")
        .write.mode("overwrite")
        .partitionBy("day_key")
        .parquet(path)
    )
    # input_file_name() is non-deterministic to the analyzer: materialize it
    # as a projection column first, then aggregate over the column
    back = spark.read.schema(keyed_schema).parquet(path).withColumn(
        "fname", F.input_file_name()
    )
    return (
        back.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("fname").cast("long").alias("n_files"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
