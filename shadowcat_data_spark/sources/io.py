"""Sources & sinks (SURVEY.md §2.1, S1–S6).

Parquet is the native format (columnar, pushdown, partition pruning).
CSV/JSON readers always take an explicit schema — ``inferSchema`` costs an
extra full scan and guesses types, both unacceptable at 100 TB. Sinks write
partitioned parquet (``partitionBy``) so downstream scans prune.

S5 (JDBC) is a stub: the image ships no database/driver. The entry point
builds the reader spec and fails with a clear message — swap in a real URL
and it runs unchanged.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..registry import query
from ..session import load_table

_SCRATCH = os.path.join(tempfile.gettempdir(), "shadowcat_io")


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_SCRATCH, tag, name)


# ---------------------------------------------------------------------------
# S1 — parquet scan with pushdown
# ---------------------------------------------------------------------------


@query(
    "s1_parquet_pruned_scan",
    oracle="""
SELECT p_partkey, p_brand, p_retailprice
FROM part WHERE p_size >= 40 AND p_type LIKE 'ECONOMY%'
""",
    category="source",
)
def parquet_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + projection land in the parquet reader (PushedFilters /
    ReadSchema in explain) — the scan reads 3 columns, not 6."""
    p = load_table(spark, sf_dir, "part")
    return p.filter((F.col("p_size") >= 40) & F.col("p_type").like("ECONOMY%")).select(
        "p_partkey", "p_brand", "p_retailprice"
    )


# ---------------------------------------------------------------------------
# S2 — CSV round-trip with explicit schema
# ---------------------------------------------------------------------------

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


@query(
    "s2_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    category="source",
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → csv sink → schema'd csv scan; values survive the text hop."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    path = _scratch(sf_dir, "nation_csv")
    n.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(NATION_SCHEMA).option("header", True).csv(path)


# ---------------------------------------------------------------------------
# S3 — JSON round-trip with explicit schema
# ---------------------------------------------------------------------------

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


@query(
    "s3_json_roundtrip",
    oracle="""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_len
FROM documents GROUP BY lang
""",
    category="source",
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → newline-JSON sink → schema'd json scan → aggregate."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    path = _scratch(sf_dir, "docs_json")
    d.write.mode("overwrite").json(path)
    back = spark.read.schema(DOC_SCHEMA).json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_len"),
    )


# ---------------------------------------------------------------------------
# S4 — partitioned parquet sink
# ---------------------------------------------------------------------------


@query(
    "s4_partitioned_sink",
    oracle="""
SELECT NULLIF(l_returnflag, '') AS l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY 1, l_linestatus
""",
    category="sink",
)
def partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate → write partitionBy(l_returnflag) → re-read → return.
    Re-reading proves the sink round-trips values AND that partition columns
    re-attach with correct types (they come back as scan partition keys that
    downstream filters prune on).

    Hive-layout caveat, spelled identically on BOTH sides as
    NULLIF(l_returnflag, ''): both NULL and '' partition values land in the
    __HIVE_DEFAULT_PARTITION__ directory and read back as NULL — an
    empty-string partition key does NOT round-trip through partitionBy on
    any Hive-layout engine. Canonicalizing '' → NULL BEFORE the aggregate
    (not just in the oracle) keeps the two groups merged on both sides;
    grouping them separately would produce two post-read-back NULL rows
    where the oracle has one merged row."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "l_returnflag", F.nullif(F.col("l_returnflag"), F.lit(""))
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(22,6)")).cast("double").alias("sum_qty"),
    )
    path = _scratch(sf_dir, "pricing_by_flag")
    agg.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    # explicit schema: a partitionBy write of an EMPTY frame produces no
    # files at all, and schema inference on that directory throws — the
    # declared schema keeps the round-trip total (empty in → empty out)
    back = spark.read.schema(agg.schema).parquet(path)
    return back.select("l_returnflag", "l_linestatus", "n", "sum_qty")


# ---------------------------------------------------------------------------
# S5b — ORC round-trip (second columnar format, built into Spark)
# ---------------------------------------------------------------------------


@query(
    "s5_orc_roundtrip",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
""",
    category="source",
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → ORC sink → ORC scan; proves the second columnar format
    (predicate pushdown + column pruning work the same as parquet).
    The oracle reads the ORIGINAL table — equality shows lossless transit."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    path = _scratch(sf_dir, "supplier_orc")
    s.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


# ---------------------------------------------------------------------------
# S5 — JDBC source (stub: no database in the image)
# ---------------------------------------------------------------------------


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
):
    """Partitioned JDBC reader spec. With partition_column + bounds, Spark
    issues num_partitions range-sliced queries in parallel — the only sane
    way to pull a big table over JDBC. Raises if no driver is present."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1_000_000)
        )
    try:
        return reader.load()
    except Exception as exc:  # no driver jar in this image
        raise NotImplementedError(
            f"JDBC source configured for {url}/{table} but no JDBC driver is "
            "available in this environment; add the driver jar to the classpath."
        ) from exc


# ---------------------------------------------------------------------------
# S10 — schema evolution: mergeSchema across parquet batches
# ---------------------------------------------------------------------------


@query(
    "s10_schema_evolution",
    oracle="""
SELECT r_regionkey, r_name, NULL AS ingest_batch FROM region
UNION ALL
SELECT r_regionkey, r_name, 2 AS ingest_batch FROM region
""",
    category="source",
)
def schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two ingest batches with DIFFERENT schemas (batch 2 adds an
    ``ingest_batch`` column) land in one dataset dir; ``mergeSchema``
    reconciles the footers into the union schema, old rows null-padded.
    This is how a long-lived 100 TB dataset absorbs additive schema change
    without rewriting history. (Production note: mergeSchema reads every
    file footer — pin the merged schema explicitly once known.)"""
    r = load_table(spark, sf_dir, "region")
    path = _scratch(sf_dir, "evolving")
    shutil.rmtree(path, ignore_errors=True)
    r.write.mode("overwrite").parquet(path)
    r.withColumn("ingest_batch", F.lit(2)).write.mode("append").parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(path).select(
        "r_regionkey", "r_name", F.col("ingest_batch").cast("int").alias("ingest_batch")
    )


# ---------------------------------------------------------------------------
# S11 — malformed-record quarantine on JSON ingest (PERMISSIVE mode)
# ---------------------------------------------------------------------------


@query(
    "s11_corrupt_record_quarantine",
    oracle="""
SELECT 'good' AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM region
HAVING COUNT(*) > 0
UNION ALL
SELECT 'bad', 2
""",
    category="source",
)
def corrupt_record_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real feeds contain garbage lines. PERMISSIVE JSON ingest routes
    unparseable records into ``_corrupt_record`` instead of failing the
    job (FAILFAST) or silently dropping them (DROPMALFORMED); the plan
    then splits good rows from quarantined ones in one pass. The count
    contract: rows parsed == clean input rows, corrupt == injected bad
    lines. At scale the quarantine bucket becomes a partitioned sink that
    feeds a repair/replay queue."""
    r = load_table(spark, sf_dir, "region")
    path = _scratch(sf_dir, "dirty_json")
    shutil.rmtree(path, ignore_errors=True)
    r.select(F.to_json(F.struct("r_regionkey", "r_name")).alias("value")).coalesce(
        1
    ).write.mode("overwrite").text(path)
    with open(os.path.join(path, "bad.txt"), "w") as fh:
        fh.write('{"r_regionkey": 99, "r_name": \n')  # truncated JSON
        fh.write("not json at all\n")
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()  # required: _corrupt_record queries must not re-infer per branch
    )
    bucket = F.when(F.col("_corrupt_record").isNull(), "good").otherwise("bad")
    return parsed.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# S14 — CSV with embedded delimiters/quotes/newlines (RFC-4180 quoting)
# ---------------------------------------------------------------------------

TRICKY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("tricky", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


@query(
    "s14_csv_quoted_roundtrip",
    oracle="""
SELECT doc_id,
       'a,"b" ' || lang || chr(10) || 'tail' AS tricky,
       lang
FROM documents
""",
    category="source",
)
def csv_quoted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip where every value contains a comma, an embedded
    double quote, AND a newline — written RFC-4180 style (escape = double
    quote, not Spark's backslash default) and read back with multiLine.
    multiLine is the scale caveat: quoted-newline files are NOT splittable
    by row, so each file becomes one task — keep such files small at
    ingest, or re-encode newline-free. The oracle reconstructs the value
    from the source columns, proving byte fidelity through the text hop."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit('a,"b" '), F.col("lang"), F.lit("\ntail")).alias("tricky"),
        "lang",
    )
    path = _scratch(sf_dir, "docs_tricky_csv")
    (
        d.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(path)
    )
    return (
        spark.read.schema(TRICKY_SCHEMA)
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )


# ---------------------------------------------------------------------------
# S15 — raw text source (line-oriented ingest)
# ---------------------------------------------------------------------------


@query(
    "s15_text_source",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(doc_id AS VARCHAR) || '|' || lang AS line
FROM documents WHERE lang IS NOT NULL
""",
    category="source",
)
def text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text ingest: write one 'doc_id|lang' line per doc,
    read it back with spark.read.text (the raw-log entry path), and parse
    the fields out with split — the classic schema-on-read hop for logs
    that predate structure. Text files split by line at any size, so this
    path parallelizes like CSV without the quoting machinery. Rows with a
    NULL field are excluded on BOTH sides: a raw line format cannot
    represent NULL (the writer emits '' and the read-back cast explodes —
    dirty-probe find, r08), which is precisely why logs that outgrow this
    hop move to CSV/parquet."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    lines = d.select(
        F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("lang")).alias("value")
    )
    path = _scratch(sf_dir, "docs_text")
    lines.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    parts = F.split(F.col("value"), r"\|")
    return back.select(
        F.element_at(parts, 1).cast("long").alias("doc_id"),
        F.element_at(parts, 2).alias("lang"),
        F.col("value").alias("line"),
    )
