"""Sampling / splitting / packing operators for training-data pipelines.

Design rule for 100 TB: every sample or split here is DETERMINISTIC — a
pure function of the row's key via a portable hash (md5 hex prefix), never
an RNG. Reproducible splits survive re-runs, backfills, and partial
failures, need no seed plumbing across 1000 executors, and can be verified
against an oracle. ``df.sample()``/``sampleBy()`` (seeded per-partition
RNG) appears only as a rows-only variant.

The md5-prefix idiom: ``substr(md5(cast(key as string)), 1, k)`` is a
uniform hex string; comparing it lexicographically against a hex threshold
selects a deterministic fraction at 16^-k granularity. Identical bytes on
Spark and DuckDB, so these split/sample queries are fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from ..registry import query
from ..session import load_table


def hash_bucket(key: Column, chars: int = 4) -> Column:
    """Uniform hex string in ['0'*chars, 'f'*chars] — portable across engines."""
    return F.substring(F.md5(key.cast("string")), 1, chars)


def hash_split(df: DataFrame, key: str, cuts: dict[str, str]) -> DataFrame:
    """Label each row train/val/test by its hash bucket.

    ``cuts`` maps split name → exclusive upper hex bound, in ascending
    order; the last entry takes the remainder. A narrow projection plus one
    md5 per row — no shuffle, no RNG, embarrassingly parallel.
    """
    b = hash_bucket(F.col(key))
    names = list(cuts.items())
    expr = F.lit(names[-1][0])
    for name, bound in reversed(names[:-1]):
        expr = F.when(b < bound, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


@query(
    "l11_hash_split",
    oracle="""
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT n_chars,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
GROUP BY split
""",
    category="pipeline-sampling",
)
def hash_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split of the corpus by
    md5(doc_id) bucket; reports per-split doc and char counts. Rerunning on
    appended data never reassigns an existing row's split."""
    d = load_table(spark, sf_dir, "documents")
    out = hash_split(d, "doc_id", {"train": "cccd", "val": "e666", "test": ""})
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "l11b_stratified_sample",
    oracle="""
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      CASE WHEN lang = 'en' THEN '8000' ELSE 'cccd' END
ORDER BY doc_id
""",
    category="pipeline-sampling",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: keep ~50% of English docs and
    ~80% of every other language (rebalancing an en-heavy corpus). Pure
    per-row filter — the fraction is a function of the stratum, the choice
    a function of the key hash; pushdown-friendly and shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    thresh = F.when(F.col("lang") == "en", "8000").otherwise("cccd")
    return (
        d.filter(hash_bucket(F.col("doc_id")) < thresh)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "l11c_per_source_cap",
    oracle="""
SELECT source, doc_id, n_chars
FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY n_chars DESC, doc_id) <= 5
ORDER BY source, doc_id
""",
    category="pipeline-sampling",
)
def per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap the corpus at the 5 longest docs per source (domain-balancing a
    crawl so no site dominates). One window over the source key; at scale
    sources are many and small so the shuffle is well-spread — a skewed
    mega-source would get the j12 salting treatment."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id", "n_chars")
        .orderBy("source", "doc_id")
    )


@query("l11d_rng_sample", oracle=None, category="pipeline-sampling")
def rng_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli ``df.sample`` — the rows-only variant. Spark's
    per-partition RNG stream is not reproducible in another engine (and
    shifts if the partitioning changes), which is exactly why the
    hash-split ops above are the recommended path; kept for API parity.
    Fraction accuracy is property-tested."""
    d = load_table(spark, sf_dir, "documents")
    return d.sample(fraction=0.2, seed=42).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# L12 — token-budget shard packing
# ---------------------------------------------------------------------------


@query(
    "l12_token_packing",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tok
  FROM documents
), packed AS (
  SELECT doc_id, lang, n_tok,
         CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - 1) / 500) AS BIGINT) AS shard
  FROM toks
)
SELECT lang, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS shard_tokens
FROM packed GROUP BY lang, shard
""",
    category="pipeline-sampling",
)
def token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~500-token training shards per language:
    shard id = (running token count - 1) DIV budget in stable doc_id
    order. One running-sum window per lang partition; writing with
    ``partitionBy(lang, shard)`` then yields size-bounded training files.
    (Counts whitespace tokens; budget is a soft bound — a doc never
    splits across shards.)"""
    d = load_table(spark, sf_dir, "documents")
    n_tok = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    ).cast("bigint")
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    packed = d.select("doc_id", "lang", n_tok.alias("n_tok")).withColumn(
        "shard", F.floor((F.sum("n_tok").over(w) - 1) / 500).cast("bigint")
    )
    return packed.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("shard_tokens"),
    )


# ---------------------------------------------------------------------------
# L18 — target-mixture domain resampling (exact quotas, integer arithmetic)
# ---------------------------------------------------------------------------

# target corpus mixture by language, in percent (sums to 100)
_MIX_WEIGHTS = {"en": 40, "de": 15, "es": 15, "fr": 15, "zh": 15}


@query(
    "l18_mixture_resample",
    oracle=f"""
WITH w(lang, wt) AS (VALUES {", ".join(f"('{l}', {p})" for l, p in _MIX_WEIGHTS.items())}),
counts AS (
  SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang
), budget AS (
  SELECT MIN(n_l * 100 // wt) AS b FROM counts JOIN w USING (lang)
), quota AS (
  SELECT lang, b * wt // 100 AS k_l FROM w, budget
)
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) JOIN quota USING (lang)
WHERE rk <= k_l
""",
    category="pipeline-sampling",
)
def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to a target language mixture (40% en, 15%
    each de/es/fr/zh) by downsampling every language to an exact integer
    quota: budget B = min over langs of n_l*100 DIV w_l (the largest total
    honoring every share), quota k_l = B*w_l DIV 100, rows chosen by
    md5(doc_id) rank — deterministic, integer-only, re-run stable. The
    quota table is 5 rows → broadcast; the only wide shuffle is the
    per-lang rank window, which at 100 TB becomes a per-lang sort — or the
    md5 threshold variant (l11b) when approximate shares suffice."""
    d = load_table(spark, sf_dir, "documents")
    w = spark.createDataFrame(list(_MIX_WEIGHTS.items()), "lang string, wt int")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    budget = (
        counts.join(w, "lang")
        .select(F.expr("n_l * 100 div wt").alias("cap"))
        .agg(F.min("cap").alias("b"))
    )
    quota = w.join(F.broadcast(budget)).select(
        "lang", F.expr("b * wt div 100").alias("k_l")
    )
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    return (
        d.select("doc_id", "lang", rk.alias("rk"))
        .join(F.broadcast(quota), "lang")
        .filter(F.col("rk") <= F.col("k_l"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# L19 — deterministic per-epoch training shuffle (shard + position)
# ---------------------------------------------------------------------------


@query(
    "l19_epoch_shuffle",
    oracle="""
SELECT epoch, shard, doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY h, doc_id)
            AS BIGINT) AS pos
FROM (
  SELECT e.epoch, d.doc_id,
         md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS h,
         ('0x' || substr(md5(CAST(e.epoch AS VARCHAR) || ':' ||
                             CAST(d.doc_id AS VARCHAR)), 1, 1))::INTEGER AS shard
  FROM documents d, (SELECT unnest(range(0, 3)) AS epoch) e
)
""",
    category="pipeline-sampling",
)
def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-loader epoch shuffling as a query: for each of 3 epochs, every
    doc gets a shard (first md5 nibble of epoch:doc_id → 16 shards) and a
    position within the shard (rank of the remaining digest). Each epoch
    is an independent uniform permutation, reproducible on any engine and
    any cluster size — the property a resumable training run needs. At
    scale: one narrow projection fans out ×epochs, then one window per
    (epoch, shard) — 16×epochs balanced sort groups, no global sort."""
    d = load_table(spark, sf_dir, "documents")
    e = d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("epoch")
    ).select(
        F.col("epoch").cast("long").alias("epoch"),
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("epoch").cast("string"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    e = e.withColumn("shard", F.conv(F.substring("h", 1, 1), 16, 10).cast("int"))
    pos = F.row_number().over(W.partitionBy("epoch", "shard").orderBy("h", "doc_id"))
    return e.select("epoch", "shard", "doc_id", pos.cast("long").alias("pos"))


# ---------------------------------------------------------------------------
# L20 — weighted sampling without replacement (exponential-key / A-ES)
# ---------------------------------------------------------------------------


@query(
    "l20_weighted_sample",
    oracle="""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM (
  SELECT doc_id, lang, n_chars,
         round(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::INTEGER + 1)
                   / 16777217.0) / n_chars, 9) AS k
  FROM documents
  WHERE n_chars > 0
)
ORDER BY k, doc_id
LIMIT 50
""",
    category="pipeline-sampling",
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sample of 50 docs without replacement (Efraimidis–
    Spirakis exponential keys): key = -ln(u)/w with u a deterministic
    md5-derived uniform and w = n_chars; the 50 smallest keys win.
    P(doc in sample) scales with its weight, yet the draw is a pure
    function of doc_id — reproducible across engines, re-runs, and
    cluster sizes. ln is rounded to 9 dp before ranking (last-ulp), ties
    break on doc_id. At scale this is a TakeOrdered top-k, no sort of the
    full corpus. Zero-weight docs (n_chars = 0) are ineligible by the
    A-ES definition (key = -ln(u)/w → ∞) and are filtered rather than
    divided by — an empty doc must never crash the draw (ANSI mode)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
            "long"
        )
        + 1
    ) / F.lit(16777217.0)
    k = F.round(-F.log(u) / F.col("n_chars"), 9)
    return (
        d.select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"), k.alias("k"))
        .orderBy("k", "doc_id")
        .limit(50)
        .select("doc_id", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# L13 — embedding int8 quantization (shrinking vectors before ANN / storage)
# ---------------------------------------------------------------------------


@query(
    "l13_embedding_quantize",
    oracle="""
WITH scaled AS (
  SELECT vec_id, label,
         127.0 / GREATEST(list_max(list_transform(embedding, x -> abs(x))), 1e-12)
           AS scale,
         embedding
  FROM embeddings
)
SELECT vec_id, label,
       array_to_string(list_transform(embedding,
         x -> CAST(FLOOR(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)), ',') AS q,
       scale
FROM scaled ORDER BY vec_id
""",
    category="pipeline-sampling",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = 127/max|x|, element →
    floor(x*scale + 0.5) — the only rounding that is bit-identical across
    engines. All higher-order array lambdas, JVM-side, no UDF; 4× smaller
    vectors feed the ANN index build. Floats are promoted to double BEFORE
    multiplying (float*double differs between engines otherwise)."""
    e = load_table(spark, sf_dir, "embeddings")
    absmax = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    scaled = e.select(
        "vec_id",
        "label",
        (F.lit(127.0) / F.greatest(absmax.cast("double"), F.lit(1e-12))).alias("scale"),
        "embedding",
    )
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.col("scale") + F.lit(0.5)).cast("bigint"),
    )
    # ','-joined string at the output boundary only (int8 codes are exact, so
    # stringification is lossless); the grading comparator cannot sort array
    # cells. The quantized ARRAY itself is what downstream ANN builds consume.
    q_str = F.array_join(F.transform(q, lambda v: v.cast("string")), ",")
    return scaled.select("vec_id", "label", q_str.alias("q"), "scale").orderBy("vec_id")
