"""User-defined function surface (SURVEY.md §2.10, U1–U4).

Every UDF here is Arrow-batched (pandas_udf / applyInPandas / mapInPandas)
— row-at-a-time Python UDFs are deliberately absent; they are never the
right tool (per-row serde, no vectorization). Determinism across engines
comes from the integer-cents idiom: money doubles → int64 cents → exact
integer aggregation → back to dollars.

Escalation order when built-ins can't express an operator:
(1) compose built-ins → (2) these Arrow UDFs → (3) custom Catalyst
expression in Scala (not wired in this image; see SURVEY.md §2.10).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..registry import query
from ..session import load_table

# ---------------------------------------------------------------------------
# U1 — scalar vectorized (pandas) UDF
# ---------------------------------------------------------------------------


@F.pandas_udf(T.DoubleType())
def net_price(extended: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized net price — one Arrow batch in, one out."""
    return extended * (1.0 - discount)


@query(
    "u1_pandas_udf",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS net_revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
    category="udf",
)
def pandas_udf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF in the projection; aggregation stays JVM-side with
    the exact-decimal idiom (float multiply is IEEE-identical in numpy/JVM)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("net", net_price("l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("net").cast("decimal(22,6)")).cast("double").alias("net_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# U2 — grouped-map (applyInPandas)
# ---------------------------------------------------------------------------

_U2_SCHEMA = "l_returnflag string, n bigint, total_dollars double, max_line double"


def _flag_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    # SQL aggregate semantics by hand: SUM/MAX skip NULLs (NaN here — Arrow
    # hands floats over as float64) and are NULL over an all-NULL group;
    # a bare astype(int64) of NaN would instead poison the sum with INT64_MIN
    vals = pdf["l_extendedprice"].to_numpy()
    ok = ~np.isnan(vals)
    cents = np.floor(vals[ok] * 100 + 0.5).astype(np.int64)
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "n": [len(pdf)],
            "total_dollars": [cents.sum() / 100.0 if ok.any() else None],
            "max_line": [vals[ok].max() if ok.any() else None],
        }
    )


@query(
    "u2_apply_in_pandas",
    oracle="""
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_dollars,
       MAX(l_extendedprice) AS max_line
FROM lineitem GROUP BY l_returnflag
""",
    category="udf",
)
def apply_in_pandas_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group pandas aggregation (integer-cents sum ≡ the oracle's exact
    decimal sum; order-independent)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    return li.groupBy("l_returnflag").applyInPandas(_flag_stats, _U2_SCHEMA)


# ---------------------------------------------------------------------------
# U3 — partition-map (mapInPandas)
# ---------------------------------------------------------------------------

_U3_SCHEMA = "l_orderkey long, is_high boolean, net_cents long"


def _classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        q = pdf["l_quantity"].to_numpy()
        net = pdf["l_extendedprice"].to_numpy() * (1.0 - pdf["l_discount"].to_numpy())
        # SQL three-valued logic by hand: NULL quantity → NULL is_high (its
        # own group), NULL price/discount → NULL cents — pandas NULLABLE
        # dtypes carry the NULLs through Arrow; a bare numpy comparison
        # would silently fold NaN into False
        is_high = pd.array(q >= 25, dtype="boolean")
        is_high[np.isnan(q)] = pd.NA
        cents_f = np.floor(net * 100 + 0.5)
        net_cents = pd.array(
            np.where(np.isnan(cents_f), 0, cents_f).astype(np.int64), dtype="Int64"
        )
        net_cents[np.isnan(cents_f)] = pd.NA
        yield pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "is_high": is_high,
                # half-up via floor(x+0.5): np.rint is banker's and DuckDB
                # round() is decimal-string-aware — only floor is IEEE-portable
                "net_cents": net_cents,
            }
        )


@query(
    "u3_map_in_pandas",
    oracle="""
SELECT l_quantity >= 25 AS is_high,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_net_cents
FROM lineitem GROUP BY 1
""",
    category="udf",
)
def map_in_pandas_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition Arrow transform (no shuffle) feeding a JVM aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    classified = li.mapInPandas(_classify, _U3_SCHEMA)
    return classified.groupBy("is_high").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("net_cents").alias("total_net_cents"),
    )


# ---------------------------------------------------------------------------
# U4 — UDAF (one-row-out applyInPandas)
# ---------------------------------------------------------------------------

_U4_SCHEMA = "c_mktsegment string, n bigint, avg_balance double"


def _segment_avg(pdf: pd.DataFrame) -> pd.DataFrame:
    # mirrors the oracle exactly: SUM skips NULL balances (NULL if all are),
    # the divisor is COUNT(*) over ALL rows
    vals = pdf["c_acctbal"].to_numpy()
    ok = ~np.isnan(vals)
    cents = np.floor(vals[ok] * 100 + 0.5).astype(np.int64)
    return pd.DataFrame(
        {
            "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
            "n": [len(pdf)],
            "avg_balance": [(cents.sum() / 100.0) / len(pdf) if ok.any() else None],
        }
    )


@query(
    "u4_udaf_segment_avg",
    oracle="""
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_balance
FROM customer GROUP BY c_mktsegment
""",
    category="udf",
)
def udaf_segment_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as one-row-out grouped-map (the PySpark UDAF pattern;
    a Scala Aggregator would fuse into partial aggregation — TODO if a JVM
    toolchain lands)."""
    c = load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    return c.groupBy("c_mktsegment").applyInPandas(_segment_avg, _U4_SCHEMA)


# ---------------------------------------------------------------------------
# U5 — Python UDTF (table function): one row in → many rows out
# ---------------------------------------------------------------------------


def _make_chunk_udtf():
    """Build the UDTF class lazily (the decorator needs a live Spark)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, chunk_idx: bigint, chunk_text: string, n_tokens: bigint")
    class ChunkDoc:
        """Split one document into fixed-size token chunks (size 20,
        no overlap) — the standard pre-tokenization chunking pass. A UDTF
        is the right surface for 1→N row expansion with per-row Python
        logic; Spark runs it per-partition, so it scales like any map."""

        def eval(self, doc_id: int, text: str):  # noqa: D401
            # NULL text = token-less: yields no chunks, like the SQL twin's
            # unnest(NULL) (dirty-probe find, r08 — .split on None raised)
            toks = [t for t in text.split(" ") if t] if text is not None else []
            # a token-less doc yields no chunks (matches the SQL twin)
            for i in range(0, len(toks), 20):
                chunk = toks[i : i + 20]
                yield doc_id, i // 20, " ".join(chunk), len(chunk)

    return ChunkDoc


@query(
    "u5_udtf_chunking",
    oracle="""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), w AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS i
  FROM t
)
SELECT doc_id, CAST((i - 1) // 20 AS BIGINT) AS chunk_idx,
       string_agg(w, ' ' ORDER BY i) AS chunk_text,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM w GROUP BY doc_id, (i - 1) // 20
ORDER BY doc_id, chunk_idx
""",
    category="udf",
)
def udtf_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document → 20-token chunks via a lateral-joined Python UDTF (U5).
    The oracle reproduces the chunking with pure SQL list slicing, so the
    UDTF's row expansion is value-checked, not just row-counted."""
    spark.udtf.register("chunk_doc", _make_chunk_udtf())
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
FROM documents AS d, LATERAL chunk_doc(d.doc_id, d.text) AS c
ORDER BY doc_id, chunk_idx
"""
    )


# ---------------------------------------------------------------------------
# U6 — mapInArrow: the pandas-free Arrow batch path
# ---------------------------------------------------------------------------

_U6_SCHEMA = "o_orderkey long, price_band int"


def _arrow_price_band(batches):
    """RecordBatch-in → RecordBatch-out, pure pyarrow.compute — skips the
    Arrow→pandas→Arrow conversion mapInPandas pays (copies + dtype
    coercions). The win matters on wide/binary batches at scale; semantics
    here are deliberately simple so the oracle is plain SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        band = pc.cast(
            pc.floor(pc.divide(batch.column("o_totalprice"), 50000.0)), pa.int32()
        )
        yield pa.RecordBatch.from_arrays(
            [batch.column("o_orderkey"), band], names=["o_orderkey", "price_band"]
        )


@query(
    "u6_map_in_arrow",
    oracle="""
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INTEGER) AS price_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM orders GROUP BY 1
""",
    category="udf",
)
def map_in_arrow_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition transform on raw Arrow RecordBatches (``mapInArrow``),
    feeding a JVM aggregation. floor(x/c) on float64 is IEEE-identical in
    pyarrow.compute and both SQL engines, so the banding hash-matches."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    banded = o.mapInArrow(_arrow_price_band, _U6_SCHEMA)
    return banded.groupBy("price_band").agg(
        F.count(F.lit(1)).alias("n"), F.min("o_orderkey").alias("min_key")
    )


# ---------------------------------------------------------------------------
# U7 — Arrow-optimized scalar Python UDF (Spark 4 useArrow=True)
# ---------------------------------------------------------------------------


def _priority_rank(p: str) -> int | None:
    """Plain-Python business rule (the kind that arrives as a code snippet,
    not a vectorizable expression): parse the leading digit of an order
    priority label. NULL/unparseable labels → NULL — row-signature UDFs
    receive None verbatim (Spark does not skip NULL inputs for them), and
    the oracle's TRY_CAST nulls the same rows."""
    try:
        return int(p.split("-", 1)[0])
    except (AttributeError, ValueError):
        return None


@query(
    "u7_arrow_scalar_udf",
    oracle="""
SELECT TRY_CAST(o_orderpriority[1] AS INTEGER) AS prank,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1
""",
    category="udf",
)
def arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-signature Python UDF with Arrow transport (``useArrow=True``):
    the author writes per-row Python, Spark batches it over Arrow instead
    of pickling row-by-row (~2-5× over the legacy path). Still the slow
    lane vs pandas_udf/built-ins — registered here because inherited
    per-row business rules are a fact of ETL life; the plan auditor flags
    any OTHER query that sprouts this node."""
    fn = F.udf(_priority_rank, "int", useArrow=True)
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(fn(F.col("o_orderpriority")).alias("prank")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# U8 — UDTF with analyze(): output schema computed from the call arguments
# ---------------------------------------------------------------------------


def _make_ngram_udtf():
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import IntegerType, LongType, StringType, StructType
    from pyspark.sql.functions import udtf

    @udtf
    class NGrams:
        """Emit the document's n-grams; `n` is a compile-time constant and
        analyze() names the output column 'gram{n}' from it — the schema is
        derived per CALL SITE, which static @udtf(returnType=...) cannot do."""

        @staticmethod
        def analyze(doc_id: AnalyzeArgument, text: AnalyzeArgument, n: AnalyzeArgument):
            if not n.isConstantExpression:
                raise Exception("n must be a constant")
            width = int(n.value)
            schema = (
                StructType()
                .add("doc_id", LongType())
                .add("pos", IntegerType())
                .add(f"gram{width}", StringType())
            )
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id, text, n):
            # NULL text emits nothing, matching the oracle's unnest(NULL)
            toks = [t for t in text.split(" ") if t] if text is not None else []
            for i in range(len(toks) - n + 1):
                yield doc_id, i, " ".join(toks[i : i + n])

    return NGrams


@query(
    "u8_udtf_analyze_ngrams",
    oracle="""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 50
), w AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS i,
         len(toks) AS n
  FROM t
)
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       concat_ws(' ', w, lead(w, 1) OVER win, lead(w, 2) OVER win) AS gram3
FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
QUALIFY i <= n - 2 AND n >= 3
ORDER BY doc_id, pos
""",
    category="udf",
)
def udtf_analyze_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (U8): ``analyze()`` computes the output
    schema from the constant n argument at plan time — the column is
    literally named gram3 because the call site passed n=3. The lateral
    expansion itself runs Arrow-batched per partition like u5; the oracle
    re-derives the trigrams with SQL list slicing."""
    spark.udtf.register("ngrams_udtf", _make_ngram_udtf())
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("u8_documents")
    return spark.sql(
        """
SELECT g.doc_id, g.pos, g.gram3
FROM u8_documents AS d, LATERAL ngrams_udtf(d.doc_id, d.text, 3) AS g
WHERE d.doc_id < 50
ORDER BY doc_id, pos
"""
    )


# ---------------------------------------------------------------------------
# U9 — GROUPED_AGG pandas UDF (Series → scalar, usable in agg AND windows)
# ---------------------------------------------------------------------------


@query(
    "u9_grouped_agg_pandas_udf",
    oracle="""
SELECT c_mktsegment,
       SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) * c_custkey)
         / (100.0 * SUM(c_custkey)) AS weighted_bal
FROM customer GROUP BY c_mktsegment
""",
    category="udf",
)
def grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: an Arrow-batched Series→scalar aggregate
    that plugs into groupBy().agg() like a built-in (and into unbounded
    windows). Unlike the u4 grouped-map UDAF, Spark handles the grouping —
    the Python side only reduces one group's columns to one value. The
    weighted mean accumulates as exact int64 cents·weight inside pandas
    (same quantized-sum idiom as the JVM aggregates), so the single final
    double division is bit-identical to the oracle's."""
    import pandas as pd  # noqa: F401

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean_cents(cents: pd.Series, w: pd.Series) -> float:
        # the oracle's exact shape: SUM(cents*w) skips NULL products but the
        # SUM(w) denominator covers every row of the group
        ok = cents.notna()
        if not ok.any():  # SUM over an all-NULL numerator is NULL, not 0
            return None
        num = int((cents[ok].astype("int64") * w[ok].astype("int64")).sum())
        den = int(w.astype("int64").sum())
        return num / (100.0 * den) if den else None

    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long")
    return c.groupBy("c_mktsegment").agg(
        weighted_mean_cents(cents, F.col("c_custkey")).alias("weighted_bal")
    )


# ---------------------------------------------------------------------------
# U10 — SCALAR_ITER pandas UDF (amortized per-worker initialization)
# ---------------------------------------------------------------------------


@query(
    "u10_iterator_pandas_udf",
    oracle="""
SELECT doc_id,
       CAST(length(text) % 97 + 29 AS BIGINT) AS scored
FROM documents
""",
    category="udf",
)
def iterator_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF: the expensive 'model load' runs ONCE
    per Python worker, then every Arrow batch streams through it — the
    shape for tokenizer/model scoring where per-batch init would dominate.
    The stub model is integer arithmetic so the oracle is exact; swap
    `init_model` for a real tokenizer load and nothing else moves."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model_bias = 29  # init_model(): runs once per worker, not per batch
        for texts in batches:
            # nullable Int64: a NULL text scores NULL like the oracle's
            # length(NULL) — plain int64 astype raises on the NaN len
            # (dirty-probe find, r08)
            yield texts.str.len().astype("Int64") % 97 + model_bias

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", score(F.col("text")).alias("scored"))
