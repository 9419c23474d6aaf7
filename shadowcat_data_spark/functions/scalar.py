"""Scalar function surface (SURVEY.md §2.7, F1–F10).

All built-in ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd;
no Python touches the hot path.

Cross-engine exactness (measured, this image):
- EXACT vs DuckDB: sqrt, exp, +,-,*,/, array aggregate/zip_with lambdas,
  levenshtein, string ops, sha256/md5 hex.
- LAST-ULP DIFFERENT: ln, pow → round to 9 decimals in oracle-checked output.
- NEVER in oracle output: xxhash64 (seed differs), monotonically_increasing_id
  (non-deterministic; use row_number for surrogate keys), array_distinct
  (element order unspecified), double→int CAST (Spark truncates, DuckDB rounds).
- NEVER two "equal" interval adds in one DuckDB SELECT: its CSE compares
  interval constants under 30-day-month normalization, so INTERVAL 90 DAY and
  INTERVAL 3 MONTH unify and one add silently becomes the other (f21 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..session import load_table

# ---------------------------------------------------------------------------
# F1 — string basics
# ---------------------------------------------------------------------------


@query(
    "f1_string_basics",
    oracle="""
SELECT c_custkey,
       lower(c_name) AS name_lower,
       upper(c_mktsegment) AS seg_upper,
       CAST(length(c_name) AS INTEGER) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       substring(c_name, 10, 5) AS name_mid,
       concat_ws('|', c_mktsegment, trim(c_name)) AS tagged,
       replace(c_name, 'Customer', 'Cust') AS name_short
FROM customer
""",
    category="function",
)
def string_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/length/lpad/substring/concat_ws/trim/replace."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.concat_ws("|", F.col("c_mktsegment"), F.trim(F.col("c_name"))).alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
    )


# ---------------------------------------------------------------------------
# F2 — regex
# ---------------------------------------------------------------------------


@query(
    "f2_regex",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
       regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
       regexp_matches(p_type, 'ECONOMY|STANDARD') AS is_cheap
FROM part
""",
    category="function",
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract (group), global replace, match predicate."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.col("p_type").rlike("ECONOMY|STANDARD").alias("is_cheap"),
    )


# ---------------------------------------------------------------------------
# F3 — split / tokenize
# ---------------------------------------------------------------------------


@query(
    "f3_split_tokenize",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       string_split(text, ' ')[1] AS first_token,
       string_split(text, ' ')[-1] AS last_token
FROM documents
""",
    category="function",
)
def split_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization → array ops (element_at is 1-based, -1 = last)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
    )


# ---------------------------------------------------------------------------
# F4 — fuzzy string matching
# ---------------------------------------------------------------------------


@query(
    "f4_fuzzy_match",
    oracle="""
SELECT s_suppkey, s_name,
       CAST(levenshtein(s_name, 'Supplier#000000001') AS INTEGER) AS edit_dist
FROM supplier
WHERE levenshtein(s_name, 'Supplier#000000001') <= 3
""",
    category="function",
)
def fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance filter (identifier reconciliation / fuzzy dedup)."""
    s = load_table(spark, sf_dir, "supplier")
    dist = F.levenshtein(F.col("s_name"), F.lit("Supplier#000000001"))
    return s.select("s_suppkey", "s_name", dist.alias("edit_dist")).filter(
        F.col("edit_dist") <= 3
    )


@query("f4b_phonetic", category="function")
def phonetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """soundex phonetic key (no DuckDB equivalent → rows-only check)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", F.soundex("c_name").alias("name_soundex")).limit(100)


# ---------------------------------------------------------------------------
# F5 — date / time
# ---------------------------------------------------------------------------


@query(
    "f5_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k,
       CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date
FROM orders
""",
    category="function",
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract / trunc / diff / add. NOTE: DuckDB date_diff args are
    (part, start, end); Spark datediff is (end, start)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
        # DATE stays out of output schemas: DuckDB's pandas conversion turns
        # DATE into midnight timestamps while Spark yields datetime.date.
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_date"),
    )


# ---------------------------------------------------------------------------
# F6 — math
# ---------------------------------------------------------------------------


@query(
    "f6_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       abs(l_discount - 0.04) AS disc_dev,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       CASE WHEN l_extendedprice >= 0 THEN sqrt(l_extendedprice) END AS price_sqrt,
       CASE WHEN l_extendedprice > 0 THEN round(ln(l_extendedprice), 9) END AS price_ln,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate
FROM lineitem
""",
    category="function",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/floor/ceil/sqrt/ln/mod/greatest/least (ln rounded: last-ulp
    differs between JVM and libm)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.04).alias("disc_dev"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        # domain guards spelled in BOTH engines: sqrt/ln of a negative price
        # is NULL, not a NaN (Spark) or an exception (DuckDB errors on both)
        F.when(F.col("l_extendedprice") >= 0, F.sqrt("l_extendedprice")).alias(
            "price_sqrt"
        ),
        F.when(
            F.col("l_extendedprice") > 0, F.round(F.ln("l_extendedprice"), 9)
        ).alias("price_ln"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


# ---------------------------------------------------------------------------
# F7 — array functions (incl. higher-order lambdas)
# ---------------------------------------------------------------------------


@query(
    "f7_array_lambdas",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS n_dims,
       embedding[1] AS head_val,
       ((0.0 + CAST(embedding[1] AS DOUBLE)) + CAST(embedding[2] AS DOUBLE)) + CAST(embedding[3] AS DOUBLE) AS head3_sum,
       CAST(embedding[2] AS DOUBLE) * 2.0 AS second_doubled,
       list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm_sq,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
FROM embeddings
""",
    category="function",
)
def array_lambdas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice + transform/filter/aggregate lambdas over the
    multimodal array<float> column (all JVM-side; exact vs oracle). Array
    intermediates are reduced to scalars for the output — the grading
    comparator canonicalizes with pandas and cannot sort array cells. The
    fold is a fixed left-to-right order, so double sums match the oracle's
    explicit parenthesization bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    head3_d = F.transform(F.slice("embedding", 1, 3), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).alias("head_val"),
        F.aggregate(head3_d, F.lit(0.0), lambda acc, x: acc + x).alias("head3_sum"),
        F.element_at(
            F.transform(F.slice("embedding", 1, 3), lambda x: x.cast("double") * 2.0), 2
        ).alias("second_doubled"),
        F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x).alias("norm_sq"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


# ---------------------------------------------------------------------------
# F8 — map functions
# ---------------------------------------------------------------------------


@query(
    "f8_map_funcs",
    oracle="""
SELECT vec_id,
       array_to_string(map_keys(MAP {'label': label, 'half': label // 2}), ',') AS mkeys,
       array_to_string(map_values(MAP {'label': label, 'half': label // 2}), ',') AS mvals,
       MAP {'label': label, 'half': label // 2}['label'][1] AS label_val
FROM embeddings
""",
    category="function",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction / keys / values / element access. Neither map nor
    array cells survive the grading comparator's pandas canonicalization, so
    keys/values are emitted as ','-joined strings (insertion order — both
    engines preserve map literal order)."""
    e = load_table(spark, sf_dir, "embeddings")
    m = F.create_map(
        F.lit("label"), F.col("label"), F.lit("half"), (F.col("label") / 2).cast("int")
    )
    return e.select(
        "vec_id",
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.transform(F.map_values(m), lambda v: v.cast("string")), ",").alias(
            "mvals"
        ),
        F.element_at(m, "label").alias("label_val"),
    )


# ---------------------------------------------------------------------------
# F9 — JSON
# ---------------------------------------------------------------------------


@query(
    "f9_json",
    oracle="""
SELECT event_id,
       CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS k_str,
       CASE WHEN json_valid(props) THEN CAST(json_extract(props, '$.k') AS INTEGER) END AS k_int,
       CASE WHEN json_valid(props) THEN CAST(json_extract(props, '$.k') AS INTEGER) * 10 END AS k_scaled
FROM events
""",
    category="function",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path extraction + schema'd parse of the semi-structured props column."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") * 10).alias("k_scaled"),
    )


# ---------------------------------------------------------------------------
# F10 — hashing / stable ids
# ---------------------------------------------------------------------------


@query(
    "f10_hash",
    oracle="""
SELECT doc_id,
       sha256(text) AS text_sha,
       md5(text) AS text_md5,
       sha256(COALESCE(lang, '') || '|' || COALESCE(text, '')) AS keyed_sha
FROM documents
""",
    category="function",
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content hashes (dedup keys, fingerprints). xxhash64 is
    Spark-seeded and monotonically_increasing_id non-deterministic — both are
    available in the engine but excluded from oracle-checked output. The
    keyed hash's NULL policy is EXPLICIT (coalesce both parts to ''):
    Spark's concat_ws drops null parts separator-and-all while DuckDB's
    concat keeps the separators, so a hash over an implicit-NULL concat
    diverges the moment a field is missing (dirty-probe find, r08)."""
    d = load_table(spark, sf_dir, "documents")
    keyed = F.concat(
        F.coalesce(F.col("lang"), F.lit("")),
        F.lit("|"),
        F.coalesce(F.col("text"), F.lit("")),
    )
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha"),
        F.md5(F.col("text")).alias("text_md5"),
        F.sha2(keyed, 256).alias("keyed_sha"),
    )


# ---------------------------------------------------------------------------
# F9b — VARIANT type (Spark 4): open-schema semi-structured path
# ---------------------------------------------------------------------------


@query(
    "f9b_variant",
    oracle="""
WITH k AS (
  SELECT CASE WHEN json_valid(props)
              THEN CAST(json_extract(props, '$.k') AS INTEGER) END AS k
  FROM events
)
SELECT k % 7 AS k_mod,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS k_sum
FROM k GROUP BY k_mod
""",
    category="function",
)
def variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semi-structured extraction as f9_json but through Spark 4's
    VARIANT type: ``parse_json`` once into an open-schema binary encoding,
    then typed ``variant_get`` paths — the scale answer when event payloads
    have no stable schema (from_json needs one up front; variant defers
    typing to the access site and pushes shredded columns at the scan in
    Parquet readers that support it). DuckDB has no variant; its JSON
    functions are the semantic oracle."""
    e = load_table(spark, sf_dir, "events")
    # try_parse_json, not parse_json: a malformed payload (truncated write,
    # non-JSON producer) must become a NULL variant, not kill the query
    v = F.try_parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return (
        e.select(k.alias("k"))
        .groupBy((F.col("k") % 7).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").cast("long").alias("k_sum"))
    )


# ---------------------------------------------------------------------------
# F11 — ANSI-safe arithmetic: try_* returns NULL where ANSI mode would throw
# ---------------------------------------------------------------------------


@query(
    "f11_try_arithmetic",
    oracle="""
SELECT p_partkey,
       TRY_CAST(p_name AS INTEGER) AS name_as_int,
       TRY_CAST(p_brand[7:] AS INTEGER) AS brand_num,
       CASE WHEN p_size % 3 = 0 THEN NULL
            ELSE p_retailprice / CAST(p_size % 3 AS DOUBLE) END AS price_ratio
FROM part
""",
    category="function",
)
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 runs ANSI mode by default: bad casts and division by zero
    THROW instead of silently nulling. The ``try_*`` family is the escape
    hatch dirty-data pipelines need — same expression, NULL on failure,
    still whole-stage-codegen. ``try_cast`` on a non-numeric name nulls;
    on the digits sliced off ``Brand#N`` it parses; ``try_divide`` nulls
    exactly where the CASE-guarded oracle does."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.try_to_number(F.col("p_name"), F.lit("999")).cast("int").alias("name_as_int"),
        F.expr("try_cast(substr(p_brand, 7) AS INT)").alias("brand_num"),
        F.try_divide(
            F.col("p_retailprice"), (F.col("p_size") % 3).cast("double")
        ).alias("price_ratio"),
    )


# ---------------------------------------------------------------------------
# F5b — calendar functions (month boundaries, ISO weeks, weekday math)
# ---------------------------------------------------------------------------


@query(
    "f5b_calendar",
    oracle="""
SELECT o_orderkey,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week
FROM orders WHERE o_orderkey % 97 = 0
""",
    category="function",
)
def calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end snap, month arithmetic (end-of-month clamping included),
    weekday and ISO week — the calendar toolkit every reporting rollup
    needs. Convention trap pinned here: Spark's dayofweek is 1=Sunday,
    DuckDB's is 0=Sunday (oracle adds 1); DATE-typed results cast to
    timestamp (DATE output encodings differ across engines)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("iso_week"),
    )


# ---------------------------------------------------------------------------
# F12 — collation-aware comparison (Spark 4 COLLATE)
# ---------------------------------------------------------------------------


@query(
    "f12_collation",
    oracle="""
SELECT lower(p_name) AS name_ci, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END AS p_name,
             p_partkey
      FROM part)
GROUP BY 1
""",
    category="function",
)
def collation_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping through Spark 4's COLLATE (UNICODE_CI)
    instead of lower() normalization: the collation travels with the TYPE,
    so every comparison/join/group on the column is case-insensitive
    without rewriting expressions — and collation-aware sorts/joins stay
    inside codegen. The mixed-case input is synthesized (upper every even
    key); output normalizes to lower for the cross-engine compare since
    group REPRESENTATIVES under CI collation are pick-arbitrary."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_name"))
        .otherwise(F.col("p_name"))
        .alias("p_name"),
    )
    ci = F.expr("p_name COLLATE UNICODE_CI")
    return (
        p.groupBy(ci.alias("name_grp"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower(F.col("name_grp")).cast("string").alias("name_ci"), "n")
    )


# ---------------------------------------------------------------------------
# F13 — URL parsing
# ---------------------------------------------------------------------------


@query(
    "f13_url_parse",
    oracle="""
SELECT doc_id,
       CASE WHEN source IS NULL OR lang IS NULL THEN NULL
            ELSE 'https' END AS proto,
       CASE WHEN source IS NULL OR lang IS NULL THEN NULL
            ELSE source || '.example.com' END AS host,
       CASE WHEN source IS NULL OR lang IS NULL THEN NULL
            ELSE '/docs/' || CAST(doc_id AS VARCHAR) END AS path,
       CASE WHEN source IS NULL THEN NULL ELSE lang END AS lang_param
FROM documents
""",
    category="function",
)
def url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url over synthesized per-doc URLs: protocol, host, path, and a
    named query parameter. The oracle reconstructs each component from the
    source columns, so what is checked is that parse_url inverts the URL
    construction exactly — including the NULL row: a missing source or
    lang nulls the synthesized URL, so EVERY component is NULL, even the
    constant-valued protocol (dirty-probe find, r08)."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


# ---------------------------------------------------------------------------
# F14 — delimited key-value string → map
# ---------------------------------------------------------------------------


@query(
    "f14_str_to_map",
    oracle="""
SELECT doc_id,
       CASE WHEN lang IS NULL OR source IS NULL OR n_chars IS NULL
            THEN NULL ELSE lang END AS m_lang,
       CASE WHEN lang IS NULL OR source IS NULL OR n_chars IS NULL
            THEN NULL ELSE source END AS m_src,
       CASE WHEN lang IS NULL OR source IS NULL OR n_chars IS NULL
            THEN NULL ELSE CAST(n_chars AS VARCHAR) END AS m_len,
       CASE WHEN lang IS NULL OR source IS NULL OR n_chars IS NULL
            THEN NULL ELSE 3 END AS n_keys
FROM documents
""",
    category="function",
)
def str_to_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map round-trip on a synthesized 'k:v,k:v' properties string —
    the classic loose-attributes ingestion idiom. Map cells never reach the
    output (the grading comparator cannot sort them); values are extracted
    back to scalar columns, proving parse fidelity against the columns the
    string was built from. One missing field nulls the synthesized string,
    so every extracted column — including the constant-looking key count —
    is NULL for that row (dirty-probe find, r08)."""
    d = load_table(spark, sf_dir, "documents")
    kv = F.concat(
        F.lit("lang:"),
        F.col("lang"),
        F.lit(",src:"),
        F.col("source"),
        F.lit(",len:"),
        F.col("n_chars").cast("string"),
    )
    m = F.str_to_map(kv, F.lit(","), F.lit(":"))
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("m_lang"),
        F.element_at(m, "src").alias("m_src"),
        F.element_at(m, "len").alias("m_len"),
        F.size(m).alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# F15 — trigonometry / angle conversion (rounded: libm last-ulp differences)
# ---------------------------------------------------------------------------


@query(
    "f15_trig",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(sin(l_discount), 9) AS sin_d,
       round(cos(l_discount), 9) AS cos_d,
       round(atan2(l_discount, l_tax), 9) AS angle,
       round(degrees(l_discount), 9) AS deg,
       round(radians(l_quantity), 9) AS rad
FROM lineitem WHERE l_orderkey <= 1000
""",
    category="function",
)
def trig_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sin/cos/atan2/degrees/radians — rounded to 9dp (JVM StrictMath and
    C libm may differ in the last ulp; everything else is bit-exact)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 9).alias("sin_d"),
        F.round(F.cos("l_discount"), 9).alias("cos_d"),
        F.round(F.atan2(F.col("l_discount"), F.col("l_tax")), 9).alias("angle"),
        F.round(F.degrees("l_discount"), 9).alias("deg"),
        F.round(F.radians("l_quantity"), 9).alias("rad"),
    )


# ---------------------------------------------------------------------------
# F16 — XML parsing (Spark 4 from_xml)
# ---------------------------------------------------------------------------


@query(
    "f16_xml",
    oracle="""
SELECT doc_id,
       CASE WHEN lang IS NULL OR n_chars IS NULL THEN NULL
            ELSE lang END AS x_lang,
       CASE WHEN lang IS NULL OR n_chars IS NULL THEN NULL
            ELSE CAST(n_chars AS INTEGER) END AS x_len
FROM documents
""",
    category="function",
)
def xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_xml round-trip: synthesize an XML doc per row, parse it back
    with an explicit schema, and emit the extracted scalars (struct stays
    internal — the grading comparator cannot sort struct cells). Proves
    the Spark 4 XML reader inverts the construction exactly — including
    the NULL row: one missing field nulls the whole synthesized XML, so
    BOTH extracted scalars are NULL (dirty-probe find, r08)."""
    d = load_table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit("<doc><lang>"),
        F.col("lang"),
        F.lit("</lang><len>"),
        F.col("n_chars").cast("string"),
        F.lit("</len></doc>"),
    )
    parsed = F.from_xml(xml, "lang STRING, len INT")
    return d.select(
        "doc_id",
        parsed.getField("lang").alias("x_lang"),
        parsed.getField("len").alias("x_len"),
    )


# ---------------------------------------------------------------------------
# F17 — scalar bit manipulation
# ---------------------------------------------------------------------------


@query(
    "f17_bit_ops",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, o_custkey) AS key_xor,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount,
       o_orderkey << 2 AS shifted_up,
       o_orderkey >> 3 AS shifted_down
FROM orders WHERE o_orderkey <= 2000
""",
    category="function",
)
def bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar bit surface: and/or/xor masks, popcount, shifts — the
    building blocks the engine's own bloom/simhash/z-order operators are
    made of, exposed as first-class scalar coverage."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.bit_count(k).alias("popcount"),
        F.shiftleft(k, 2).alias("shifted_up"),
        F.shiftright(k, 3).alias("shifted_down"),
    )


# ---------------------------------------------------------------------------
# F18 — binary-to-text encodings (hex / base64 / radix conversion)
# ---------------------------------------------------------------------------


@query(
    "f18_encodings",
    oracle="""
SELECT doc_id,
       hex(doc_id) AS id_hex,
       base64(encode(lang)) AS lang_b64,
       CAST(length(lang) AS INTEGER) AS lang_rt_len
FROM documents
""",
    category="function",
)
def encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hex / base64 / round-trip decode — the id-munging and payload-
    embedding primitives (base64 is how binary multimodal payloads ride
    inside JSON/text envelopes). unbase64∘base64 is verified by emitting
    the decoded length against the source column."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.hex(F.col("doc_id")).alias("id_hex"),
        F.base64(F.col("lang").cast("binary")).alias("lang_b64"),
        F.length(
            F.unbase64(F.base64(F.col("lang").cast("binary"))).cast("string")
        ).alias("lang_rt_len"),
    )


# ---------------------------------------------------------------------------
# F19 — structured → JSON serialization
# ---------------------------------------------------------------------------


@query(
    "f19_to_json",
    oracle="""
SELECT doc_id,
       CAST(to_json(struct_pack(lang := lang, len := n_chars)) AS VARCHAR) AS doc_json,
       CAST(to_json([doc_id, n_chars]) AS VARCHAR) AS arr_json
FROM documents
""",
    category="function",
)
def to_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/array → JSON text (the export half of f9's parse): both
    engines emit identical compact JSON, so the serialization itself is
    hash-checked. This is the envelope format for event emission and
    API-facing exports. ignoreNullFields=false pins the null policy:
    Spark's default silently DROPS null struct fields ('{}' for an
    all-null row) while DuckDB serializes them — an export consumer
    needs one contract, and keep-nulls is the schema-stable one
    (dirty-probe find, r08)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.to_json(
            F.struct(F.col("lang").alias("lang"), F.col("n_chars").alias("len")),
            {"ignoreNullFields": "false"},
        ).alias("doc_json"),
        F.to_json(
            F.array(F.col("doc_id"), F.col("n_chars")),
            {"ignoreNullFields": "false"},
        ).alias("arr_json"),
    )


# ---------------------------------------------------------------------------
# F20 — field extraction: split_part / left / right
# ---------------------------------------------------------------------------


@query(
    "f20_split_part",
    oracle="""
SELECT doc_id,
       CASE WHEN source IS NULL OR lang IS NULL THEN NULL
            ELSE split_part(source || ':' || lang || ':' || CAST(doc_id AS VARCHAR), ':', 1)
       END AS part_source,
       CASE WHEN source IS NULL OR lang IS NULL THEN NULL
            ELSE split_part(source || ':' || lang || ':' || CAST(doc_id AS VARCHAR), ':', 2)
       END AS part_lang,
       left(source, 3) AS src_prefix,
       right(lang, 1) AS lang_last
FROM documents
""",
    category="function",
)
def split_part_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimited-field extraction without regex: split_part picks the Nth
    field directly (the log/URI field-grab idiom) and left/right take
    fixed-width affixes — all identical semantics across engines EXCEPT
    the null input: Spark's split_part(NULL) is NULL while DuckDB's is
    '', so the oracle spells the null-composite case explicitly
    (dirty-probe find, r08)."""
    d = load_table(spark, sf_dir, "documents")
    composite = F.concat(
        F.col("source"), F.lit(":"), F.col("lang"), F.lit(":"), F.col("doc_id").cast("string")
    )
    return d.select(
        "doc_id",
        F.split_part(composite, F.lit(":"), F.lit(1)).alias("part_source"),
        F.split_part(composite, F.lit(":"), F.lit(2)).alias("part_lang"),
        F.left(F.col("source"), F.lit(3)).alias("src_prefix"),
        F.right(F.col("lang"), F.lit(1)).alias("lang_last"),
    )


# ---------------------------------------------------------------------------
# F21 — interval arithmetic
# ---------------------------------------------------------------------------


@query(
    "f21_interval_arithmetic",
    oracle="""
SELECT o_orderkey,
       -- day shift spelled as DATE+int, NOT INTERVAL 90 DAY: DuckDB 1.0 CSE
       -- unifies interval constants that compare equal under its 30-day-month
       -- normalization (INTERVAL 90 DAY = INTERVAL 3 MONTH is TRUE), silently
       -- rewriting one add into the other when both appear over the same column
       CAST(CAST(o_orderdate AS DATE) + 90 AS TIMESTAMP) AS due_ts,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS quarter_ts,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS BIGINT)
         AS days_to_cutoff,
       round(CAST(date_diff('month', CAST(o_orderdate AS DATE), DATE '1998-12-01')
                  AS DOUBLE)
             + (CASE WHEN day(CAST(o_orderdate AS DATE)) = 1 THEN 0.0
                     ELSE (1 - day(CAST(o_orderdate AS DATE))) / 31.0 END),
             8) AS months_to_cutoff
FROM orders WHERE o_orderkey <= 200
""",
    category="function",
)
def interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar INTERVAL arithmetic: shift a timestamp by day/month
    intervals (month shifts clamp to month-end, unlike fixed-second
    arithmetic) and measure day/fractional-month distances. Spark's
    ``months_between`` is mirrored in the oracle by its documented
    definition — calendar-month delta (DuckDB ``date_diff('month')``
    counts exactly those boundaries) plus remainder-days/31 when the
    days-of-month differ (the cutoff literal is day 1, so the both-ends
    last-day special cases collapse to ``day(start)=1``) — exercising
    interval semantics end-to-end rather than only the happy path."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_ts"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("quarter_ts"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_cutoff"),
        F.round(
            F.months_between(F.lit("1998-12-01").cast("timestamp"), F.col("o_orderdate")),
            8,
        ).alias("months_to_cutoff"),
    )
