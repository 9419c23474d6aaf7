"""Deduplication operators for training-data pipelines (SURVEY.md §2.8).

Four tiers, each a composable operator plus a registered query:

- exact        — normalized-content hash → keep canonical row (L1)
- n-gram Jaccard — exact set similarity via inverted-index join (L2a)
- MinHash+LSH  — banded signatures → candidate pairs → exact verify (L2b)
- SimHash      — 64-bit sketch, hamming-distance candidates (L2c)

Scale design: everything is explode → groupBy → equi-join; no all-pairs
cross product ever materializes. The inverted-index join fans out per
shared token — at 100 TB you bound it by dropping ultra-common tokens
(``max_df``) exactly like a search engine drops stopwords; MinHash/LSH
replaces the exact join when even that is too wide. Banded LSH buckets
are equi-join keys, so AQE's skew handling covers hot buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from ..registry import query
from ..session import fan_out as _fan_out, load_table, materialize

# ---------------------------------------------------------------------------
# L1 — exact dedup by normalized content hash
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-text hash; count group size."""
    key = F.sha2(F.lower(F.trim(F.col(text_col))), 256)
    w = W.partitionBy("content_key").orderBy(id_col)
    return (
        df.withColumn("content_key", key)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(W.partitionBy("content_key")))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "l1_exact_dedup",
    oracle="""
WITH keyed AS (
  SELECT doc_id, sha256(lower(trim(text))) AS content_key,
         COUNT(*) OVER (PARTITION BY sha256(lower(trim(text)))) AS n_copies
  FROM documents
)
SELECT doc_id, content_key, CAST(n_copies AS BIGINT) AS n_copies
FROM keyed
QUALIFY ROW_NUMBER() OVER (PARTITION BY content_key ORDER BY doc_id) = 1
""",
    category="pipeline-dedup",
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of the documents corpus (canonical row = lowest doc_id)."""
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").select("doc_id", "content_key", "n_copies")


# ---------------------------------------------------------------------------
# Shared tokenization
# ---------------------------------------------------------------------------


def distinct_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) pairs, one row per distinct token per doc."""
    return (
        _fan_out(df)
        .select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(id, shingle) pairs: every k-token shingle per doc (duplicates kept).

    Shingles (not single tokens) are what MinHash needs on natural corpora:
    token vocabularies are tiny (every doc pair shares words) while the
    shingle space is |V|^k, so only genuinely duplicated passages collide.

    Duplicates are deliberately NOT removed here: ``min`` (MinHash) and
    ``collect_set`` (verify) are both duplicate-insensitive, so the
    dedup shuffle a ``.distinct()`` would add is pure cost on those paths.
    Use :func:`distinct_shingles` when downstream math needs set semantics.
    """
    # materialize the token array in its own projection: inlining the split()
    # into the lambda would re-tokenize the document once per shingle
    tok_df = _fan_out(df).select(id_col, F.split(F.col(text_col), " ").alias("__toks"))
    shingle_seq = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(F.col("__toks")) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, k)),
    )
    return tok_df.select(id_col, F.explode(shingle_seq).alias("tok")).filter(
        F.col("tok") != ""
    )


def distinct_chargrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """(id, gram) pairs: distinct character n-grams per doc. The
    formatting-robust dedup unit — whitespace/punctuation reflows that
    shift token boundaries barely move a char-gram set, where they
    wreck token Jaccard. Texts shorter than n contribute ONE gram (the
    whole text), mirroring the oracle's GREATEST(len-n+1, 1) bound.

    Cost note: the naive ``substr(i, n)`` per position seeks to codepoint
    i by scanning the UTF-8 string from the start, Σᵢ O(i) = O(len²) per
    DOCUMENT (measured 163 s on one 200 KB doc). This formulation splits
    the text ONCE into a codepoint array (``split('')`` matches at Java
    regex code-point boundaries, so astral codepoints stay whole —
    verified against U+1F600) and builds each gram with an O(n) array
    slice + join: O(len·n) total, linear in document size. Byte-identical
    output to the substr form (and to the oracle's codepoint substr) —
    asserted by the standing l2g oracle hash-match."""
    # split ONCE in its own projection — inlining the split() into the
    # lambda would re-split the document once per gram (the shingle_rows
    # trap), putting the O(len²) right back. NULL text contributes NO
    # grams: without the filter, concat_ws('', slice(NULL, i, n)) folds
    # the missing document to the '' gram — making every NULL doc an
    # exact near-dup of every empty doc (dirty-probe find, r08)
    src = F.col(text_col)
    cp_df = _fan_out(df.filter(src.isNotNull())).select(
        id_col, F.length(src).alias("__len"), F.split(src, "").alias("__cps")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.col("__len") - (n - 1), F.lit(1))),
        lambda i: F.concat_ws("", F.slice(F.col("__cps"), i, n)),
    )
    return cp_df.select(id_col, F.explode(grams).alias("tok")).distinct()


def distinct_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(id, shingle) pairs: distinct k-token shingles per doc."""
    return shingle_rows(df, id_col, text_col, k).distinct()


def _pair_shared_counts(
    tok: DataFrame, id_col: str, max_df: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """The inverted-index core every exact pair metric shares: per-doc set
    sizes and, for each (d1 < d2) pair with ≥1 common token, the shared
    count. One self-join shuffled on the token — never all-pairs.

    ``max_df`` is the scale lever: a token appearing in d docs fans out
    d·(d-1)/2 pair rows, so one boilerplate token in a million docs is a
    5·10¹¹-row join all by itself. Dropping tokens with document
    frequency > max_df (the stopword cut a search engine makes) bounds
    every posting list BEFORE the join; sizes are computed on the full
    token sets, so the metric denominators are unaffected — only pairs
    whose ONLY shared tokens are ultra-common are (deliberately) missed.
    Returns (sizes[id, n_tok], shared[d1, d2, shared]).

    The (id, tok) set is materialized ONCE up front (``localCheckpoint``;
    persist/durable checkpoint on a cluster): it feeds FOUR consumers
    (sizes, the df counts, and both sides of the self-join), and an
    unmaterialized plan re-runs the tokenizer — explode + distinct over
    the full corpus, the dominant cost for shingle/chargram units — once
    per consumer (the r11 sf0.01 plan snapshot showed 4 full tokenize
    subtrees for l2a). Same storage budget the l2b signature pass and the
    t35 postings index already spend: O(Σ distinct tokens) rows."""
    tok = materialize(tok, eager=False)
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))
    if max_df is not None:
        df_counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
        tok = (
            tok.join(df_counts.filter(F.col("__df") <= max_df), "tok")
            .drop("__df")
        )
    a = tok.select(F.col(id_col).alias("d1"), "tok")
    b = tok.select(F.col(id_col).alias("d2"), "tok")
    shared = (
        a.join(b, ["tok"])
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return sizes, shared


# ---------------------------------------------------------------------------
# L2a — exact n-gram/token Jaccard via inverted-index join (oracle-checkable)
# ---------------------------------------------------------------------------


def jaccard_pairs_from_tokens(
    tok: DataFrame, id_col: str, max_df: int | None = None
) -> DataFrame:
    """The Jaccard pair kernel on an ALREADY-TOKENIZED (id, tok) set —
    shared by the batch path (``jaccard_pairs`` tokenizes then calls
    here) and the streaming postings index (t35 accumulates the
    tokenized state online and serves pairs from it, so tokenization
    happens once per ingest batch, never at serve time)."""
    sizes, shared = _pair_shared_counts(tok, id_col, max_df=max_df)
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_tok").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_tok").alias("n2"))
    return (
        shared.join(s1, "d1")
        .join(s2, "d2")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tokenizer=distinct_tokens,
    max_df: int | None = None,
) -> DataFrame:
    """Exact token-set Jaccard for every doc pair sharing ≥1 token.

    Inverted-index self-join on token (shuffle on token, hash join) — never
    an all-pairs product. shared/(|A|+|B|-shared) is an int ratio → the
    double result is bit-identical across engines.
    """
    return jaccard_pairs_from_tokens(
        tokenizer(df, id_col, text_col), id_col, max_df=max_df
    )


# The mandatory posting-list bound for the exact shingle-Jaccard tier.
# A shingle in d docs fans out d·(d-1)/2 join rows, so the bound caps every
# posting list BEFORE the self-join — the same stopword cut l2g applies to
# char grams (df ≤ 20 there). 50 here: comfortably above the fixture's max
# shingle df (25 at sf0.1), so nothing is dropped at test scale, while at
# 100 TB any boilerplate passage shared by >50 docs is exactly what the
# l1 (exact) and l2b (LSH, bucket cap 200) tiers resolve instead — the
# recall hand-off contract documented on l2g_chargram_jaccard.
SHINGLE_MAX_DF = 50

# The shingle CTE is the LINEAR parallel-unnest + lead() shape, not a
# lateral UNNEST over the token array: DuckDB materializes the parent's
# list column once per lateral row, which is O(doc_tokens^2) memory — a
# 100k-token probe document OOM-killed the whole gate through the old
# shape (r09; the Spark side was always linear).
_SHINGLE_PAIRS_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
), shp AS (
  SELECT doc_id, i, COUNT(*) OVER (PARTITION BY doc_id) AS n,
         concat_ws(' ', w, lead(w, 1) OVER win, lead(w, 2) OVER win) AS sh
  FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
), tok AS (
  SELECT DISTINCT doc_id, sh AS t FROM shp
  WHERE i <= greatest(n - 2, 1) AND sh <> ''
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id
), df_ok AS (
  SELECT t FROM tok GROUP BY t HAVING COUNT(*) <= 50
), shared AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
  WHERE a.t IN (SELECT t FROM df_ok)
  GROUP BY 1, 2
)
"""


@query(
    "l2a_jaccard_histogram",
    oracle=_SHINGLE_PAIRS_SQL
    + """
, pairs AS (
  SELECT shared * 1.0 / (s1.n_tok + s2.n_tok - shared) AS jaccard
  FROM shared JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
)
SELECT CAST(FLOOR(jaccard * 10) AS BIGINT) AS j_decile, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1
""",
    category="pipeline-dedup",
)
def jaccard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of pairwise 3-shingle-Jaccard across the corpus (pairs
    sharing ≥1 df-bounded shingle). Shingles, not single tokens: a natural
    vocabulary makes every doc pair share words (the fixture's 31-token
    vocabulary gives 32% of ALL pairs token-J ≥ 0.75 — meaningless), while
    k-token shingles only collide on genuinely shared passages. The
    SHINGLE_MAX_DF posting-list bound is mirrored by the oracle's HAVING."""
    d = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        d, "doc_id", "text", tokenizer=distinct_shingles, max_df=SHINGLE_MAX_DF
    )
    return pairs.groupBy(
        F.floor(F.col("jaccard") * 10).cast("long").alias("j_decile")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "l2a_near_dup_pairs",
    oracle=_SHINGLE_PAIRS_SQL
    + """
SELECT d1, d2, shared * 1.0 / (s1.n_tok + s2.n_tok - shared) AS jaccard
FROM shared JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
WHERE shared * 1.0 / (s1.n_tok + s2.n_tok - shared) >= 0.75
""",
    category="pipeline-dedup",
)
def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate doc pairs at 3-shingle Jaccard ≥ 0.75 (exact, df ≤
    SHINGLE_MAX_DF posting lists — every join fan-out bounded; sizes use
    the FULL shingle sets so denominators are exact)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        jaccard_pairs(
            d, "doc_id", "text", tokenizer=distinct_shingles, max_df=SHINGLE_MAX_DF
        )
        .filter(F.col("jaccard") >= 0.75)
        .select("d1", "d2", "jaccard")
    )


def decontam_report(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """Orient near-dup pairs through split labels into the per-eval-doc
    contamination report (shared by l50 batch and t35 streaming): only
    (eval, train) pairs contaminate — eval-eval near-dups are the eval
    set's own dedup problem and train-train pairs are l1/l2's."""
    p = (
        pairs.join(
            labels.select(F.col("doc_id").alias("d1"), F.col("split").alias("s1")),
            "d1",
        ).join(
            labels.select(F.col("doc_id").alias("d2"), F.col("split").alias("s2")),
            "d2",
        )
    )
    oriented = (
        p.filter((F.col("s1") == "eval") & (F.col("s2") == "train"))
        .select(F.col("d1").alias("doc_id"), "jaccard")
        .unionByName(
            p.filter((F.col("s2") == "eval") & (F.col("s1") == "train"))
            .select(F.col("d2").alias("doc_id"), "jaccard")
        )
    )
    return oriented.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_train_neighbors"),
        F.max("jaccard").alias("max_jaccard"),
    )


_L50_ORACLE = _SHINGLE_PAIRS_SQL + """
, pairs AS (
  SELECT d1, d2, shared * 1.0 / (s1.n_tok + s2.n_tok - shared) AS jaccard
  FROM shared JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE shared * 1.0 / (s1.n_tok + s2.n_tok - shared) >= 0.75
), sp AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
              THEN 'train' ELSE 'eval' END AS split
  FROM documents
), oriented AS (
  SELECT p.d1 AS doc_id, p.jaccard FROM pairs p
  JOIN sp a ON a.doc_id = p.d1 JOIN sp b ON b.doc_id = p.d2
  WHERE a.split = 'eval' AND b.split = 'train'
  UNION ALL
  SELECT p.d2 AS doc_id, p.jaccard FROM pairs p
  JOIN sp a ON a.doc_id = p.d1 JOIN sp b ON b.doc_id = p.d2
  WHERE b.split = 'eval' AND a.split = 'train'
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_train_neighbors,
       MAX(jaccard) AS max_jaccard
FROM oriented GROUP BY doc_id
"""


@query("l50_near_dup_decontam", oracle=_L50_ORACLE, category="pipeline-dedup")
def near_dup_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUP cross-split decontamination (r11): l49 gates eval docs
    that share exact k-token windows with train; the standard LLM-data
    gate ALSO drops eval docs that are near-duplicates of any train doc
    at the document level (rewordings, salt-token variants, re-crawled
    revisions — overlap an exact-window test understates). Composition
    of two already-graded stages: the l2a exact shingle-Jaccard pairs
    (inverted-index self-join, SHINGLE_MAX_DF-bounded fan-out, exact
    denominators) oriented through the l11 hash-split labels — one
    md5-projection join per side, no extra shuffle class. Output: each
    contaminated EVAL doc with its train-neighbor count and the highest
    Jaccard (the audit row a decontamination report needs). Only
    (eval, train) pairs contaminate — eval-eval near-dups are the eval
    set's own dedup problem and train-train pairs are l1/l2's —
    pytest-pinned orientation. Same 100 TB story as l2a: every posting
    list bounded before the join; the split labels are a projection of
    the corpus, not a second corpus-scale state."""
    from .sampling import hash_split

    d = load_table(spark, sf_dir, "documents")
    labels = hash_split(d.select("doc_id"), "doc_id", {"train": "cccd", "eval": ""})
    pairs = (
        jaccard_pairs(
            d, "doc_id", "text",
            tokenizer=distinct_shingles, max_df=SHINGLE_MAX_DF,
        )
        .filter(F.col("jaccard") >= 0.75)
        .select("d1", "d2", "jaccard")
    )
    return decontam_report(pairs, labels)


@query(
    "l2g_chargram_jaccard",
    oracle="""
WITH g AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS t FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, GREATEST(length(text) - 4, 1))) AS i
    FROM documents WHERE text IS NOT NULL
  )
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_tok FROM g GROUP BY doc_id
), df_ok AS (
  SELECT t FROM g GROUP BY t HAVING COUNT(*) <= 20
), shared AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
  FROM g a JOIN g b ON a.t = b.t AND a.doc_id < b.doc_id
  WHERE a.t IN (SELECT t FROM df_ok)
  GROUP BY 1, 2
)
SELECT d1, d2, shared * 1.0 / (s1.n_tok + s2.n_tok - shared) AS jaccard
FROM shared JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
WHERE shared * 1.0 / (s1.n_tok + s2.n_tok - shared) >= 0.5
""",
    category="pipeline-dedup",
)
def chargram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 5-gram Jaccard near-dup pairs (exact, ≥ 0.5) — the
    formatting-robust tier between token Jaccard (l2a) and MinHash (l2b).
    Char grams are DENSE (every doc shares common English 5-grams), so the
    ``max_df`` posting-list cut is mandatory here, not optional: a gram in
    d docs fans out d·(d-1)/2 join rows, and common grams appear in most
    of the corpus. df ≤ 20 keeps every posting list bounded while the
    Jaccard denominators stay exact (sizes use the FULL gram sets).

    The honest recall contract of the cut: a duplicate FAMILY larger than
    max_df pushes every gram its members share past the df bound, so this
    tier emits NO pairs for it — the heavier the duplication, the earlier
    it leaves this tier's reach. That is by design, not an accident:
    families at that multiplicity are exactly what the hash tier (l1,
    exact copies at any count) and the LSH tier (l2b, near-dups with a
    bucket cap of 200, not 20) are for, and max_df is the knob that
    decides the hand-off point. Size max_df ≥ the largest family this
    exact tier must itself resolve. Same inverted-index kernel and
    int-ratio determinism as l2a."""
    d = load_table(spark, sf_dir, "documents")
    return (
        jaccard_pairs(d, "doc_id", "text", tokenizer=distinct_chargrams, max_df=20)
        .filter(F.col("jaccard") >= 0.5)
        .select("d1", "d2", "jaccard")
    )


# ---------------------------------------------------------------------------
# L2b — MinHash + banded LSH (engine-hash-based → rows-only; property-tested
# against exact Jaccard in tests/test_pipeline.py)
# ---------------------------------------------------------------------------

N_HASHES = 32
N_BANDS = 16  # 16 bands × 2 rows → band threshold (1/16)^(1/2) = 0.25; a
# J=0.5 pair collides in a band w.p. 0.5² = 0.25, so its miss probability is
# 0.75¹⁶ ≈ 1% — high recall at the query threshold. Narrower than the earlier
# 48×(16×3) config: ~1.5× faster agg+banding, +candidates only cost the
# verify join (candidates are exact-verified anyway, so precision is free).
ROWS_PER_BAND = N_HASHES // N_BANDS
MAX_BUCKET = 200  # LSH buckets larger than this are boilerplate, not dups
_MASK32 = (1 << 32) - 1


def hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(id, shingle-hash) pairs: every k-token shingle hashed to int64.

    The hot-path tokenizer for MinHash/verify: hashing the k tokens directly
    (``xxhash64(tok_i, …, tok_{i+k-1})``) skips building the concatenated
    shingle STRING entirely, so the explode emits longs, the groupBy
    shuffles longs, and the verify ``array_intersect`` compares longs —
    measured ~1.4× end-to-end vs string shingles at sf0.1. Collisions are
    2⁻⁶⁴-rare and only perturb a Jaccard estimate that is already
    probabilistic (this path is rows-only + recall-tested, not oracled).
    Duplicates kept: ``min``/``collect_set`` are duplicate-insensitive.
    """
    sh = shingle_hash_array(df, id_col, text_col, k)
    return sh.select(id_col, F.explode("sh").alias("tok"))


def shingle_hash_array(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """One row per doc with the array of its k-token shingle hashes —
    the un-exploded form of :func:`hashed_shingles`, and the input to the
    row-wise MinHash kernel (shingles of a doc never leave their row).
    NULL text is treated as the empty string, matching the pre-row-wise
    explode+groupBy kernel exactly (there, ``concat_ws(' ', NULL)`` → ''
    gave every NULL-text doc the single empty-shingle hash, so NULL-text
    docs pair with each other and with ''-text docs at Jaccard 1)."""
    tok_df = df.select(
        id_col,
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("__toks"),
    )
    n = F.size(F.col("__toks"))
    full = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.xxhash64(*[F.element_at(F.col("__toks"), i + j) for j in range(k)]),
    )
    # Docs shorter than k tokens get ONE shingle hashing their whole token
    # sequence (the k-gram branch would index past the array, an ANSI error).
    # CASE short-circuits per row, so the k-gram lambda never evaluates for
    # short docs; identical short docs still collide with Jaccard 1.
    short = F.array(F.xxhash64(F.concat_ws(" ", F.col("__toks"))))
    return tok_df.select(
        id_col, F.when(n >= k, full).otherwise(short).alias("sh")
    )


def _km_minhash_cols(pre_hashed: bool = False) -> list[Column]:
    """N_HASHES minhash aggregates from TWO base hashes (Kirsch–Mitzenmacher):
    h_i = h1 + i·h2, with h1/h2 masked to 32 bits so the arithmetic stays
    in-range under ANSI mode. 2 xxhash64 calls per token instead of one per
    permutation; with ``pre_hashed`` (tok already an xxhash64 int64, as from
    :func:`hashed_shingles`) the first base hash is just a mask."""
    base = F.col("tok") if pre_hashed else F.xxhash64(F.col("tok"))
    h1 = base.bitwiseAND(F.lit(_MASK32))
    h2 = F.xxhash64(F.lit(1), F.col("tok")).bitwiseAND(F.lit(_MASK32))
    return [F.min(h1 + F.lit(i) * h2).alias(f"h{i}") for i in range(N_HASHES)]


def _rowwise_minhash(
    df: DataFrame, id_col: str, text_col: str, with_toks: bool = False
) -> DataFrame:
    """N_HASHES-permutation MinHash signature per doc computed ENTIRELY
    within each doc's row — no explode, no hash aggregate, no shuffle.

    A doc's shingles are born as an array in its own row, so min per
    permutation is ``array_min`` over a per-row ``transform``, and the
    verify token set is ``array_distinct`` — bit-identical values to the
    old explode+groupBy formulation (same Kirsch–Mitzenmacher h1+i·h2
    over the same shingle multiset) with the 33-buffer aggregate hash
    map and its exchange deleted. The sf10 probe put that aggregate at
    1739 task-seconds of l2b's 165 s wall (the single largest stage);
    the row-wise kernel re-reads the same parquet and does only the hash
    arithmetic. The (h1, h2) struct array is projected ONCE in a lower
    select; CollapseProject keeps non-cheap lambda projections with
    multiply-referenced outputs uncollapsed, so the 32 ``array_min``
    consumers reuse the materialized array instead of re-hashing 32×
    (plan-asserted in pytest: exactly one xxhash64-of-seed-1 site).

    Deleting the shuffle also deletes the fan-out the old aggregate got
    for free, and this kernel is COMPUTE-bound (N_HASHES minima over
    ~n_tokens shingle hashes per row) — on a single-file fixture the
    whole corpus would run on scan parallelism (measured: 1 task at
    sf0.1, l2b 1.6 s → 2.3 s). When the scan yields fewer partitions
    than the session has cores, fan out with one round-robin shuffle of
    (id, text) — far narrower than the exploded-shingle shuffle this
    kernel replaced; on a real multi-file corpus the scan already
    matches the core count and no shuffle is added."""
    sh = shingle_hash_array(_fan_out(df), id_col, text_col)
    hs = sh.select(
        id_col,
        *([F.array_distinct("sh").alias("toks")] if with_toks else []),
        F.transform(
            "sh",
            lambda t: F.struct(
                t.bitwiseAND(F.lit(_MASK32)).alias("h1"),
                F.xxhash64(F.lit(1), t).bitwiseAND(F.lit(_MASK32)).alias("h2"),
            ),
        ).alias("hs"),
    )
    # ONE nested transform computes all N_HASHES minima as an array —
    # i ranges over sequence(0, N_HASHES-1) exactly as the old unrolled
    # F.lit(i) did (int × long → long, same arithmetic per element) —
    # then a second projection unpacks h0..h{N-1} with cheap getItems.
    # The unrolled form built N_HASHES lambda expressions per invocation
    # (~0.4 s of py4j latency per l2b call, r11 cProfile) and carried
    # N_HASHES copies of the min-subtree through analysis; the array
    # stays in ONE intermediate projection that CollapseProject keeps
    # uncollapsed (multiply-referenced non-cheap lambda — the same
    # mechanism that protects "hs" above), so the minima compute once.
    mins_arr = F.transform(
        F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
        lambda i: F.array_min(
            F.transform(F.col("hs"), lambda s: s["h1"] + i * s["h2"])
        ),
    )
    keep = [id_col, "toks"] if with_toks else [id_col]
    return hs.withColumn("__mins", mins_arr).select(
        *keep, *[F.col("__mins")[i].alias(f"h{i}") for i in range(N_HASHES)]
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """N_HASHES-permutation MinHash signature per doc (over k-token
    shingles), via the row-wise kernel (see :func:`_rowwise_minhash`).

    One signature row per INPUT row: ids are assumed unique (they are
    dedup keys). The pre-row-wise groupBy incidentally merged duplicate-id
    rows' shingle sets into one signature; rows sharing an id now get
    independent signatures — exact-dedup (l1) or keyed dedup (o5) first
    if the corpus can carry duplicate ids."""
    return _rowwise_minhash(df, id_col, text_col)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """Band the signatures; docs sharing any band bucket become candidates.

    Pairs are generated inside each bucket from ONE collect_list pass (no
    signature self-join → the expensive signature subtree is computed once,
    not twice). ``max_bucket`` caps the quadratic fan-out: a bucket with
    thousands of members is shared boilerplate, not duplication — standard
    LSH practice is to drop it, which is also what bounds a single task's
    memory at 100 TB.
    """
    bands = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
                        ).alias("bucket"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    # all ordered pairs within a bucket: ids[i] × ids[i+1:]
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("d1"), y.alias("d2")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.d1", "p.d2")
        .distinct()
    )


def _rebalance_pairs(joined: DataFrame) -> DataFrame:
    """AQE REBALANCE exchange on the candidate-pair key, inserted between
    the verify join and the ``array_intersect`` projection.

    Why (r05 verdict #1 — the one identified scale ceiling): a pair's
    exact-Jaccard verification is one task-local unit, and the verify
    join's output partitioning is whatever the LAST equi-join key hashed
    to — at sf10 that stage's peak task reached 78.6–81.3s against the
    smoke's 120s invariant, growing linearly with corpus size. The
    rebalance hint hash-distributes pairs by (d1, d2) — uniform, since
    candidate pairs are distinct — and AQE's
    OptimizeSkewInRebalancePartitions then SPLITS any output partition
    above ``advisoryPartitionSizeInBytes``. Intersect compute is
    proportional to the token-array bytes each row carries, so bounding
    partition BYTES bounds the task's COMPUTE: peak verify-task time
    becomes ~constant in corpus size (sublinear, as required), at the
    cost of one extra exchange of the verify input — which only AQE can
    size correctly, because |candidates| is unknowable at plan time."""
    return joined.hint("rebalance", "d1", "d2")


def verify_candidate_jaccard(
    tok: DataFrame, cands: DataFrame, id_col: str
) -> DataFrame:
    """Exact Jaccard computed ONLY for candidate pairs (never all pairs) —
    this is what keeps LSH sub-quadratic: |cands| ≪ |pairs|.

    Token sets are aggregated to one array per doc and intersected with
    ``array_intersect`` (JVM, codegen) — two equi-joins total instead of a
    per-token fan-out join. Per-doc arrays are bounded by document length,
    so a row fits executor memory at any corpus scale. The intersect runs
    AFTER a REBALANCE exchange on the pair key (see
    :func:`_rebalance_pairs`), so its per-task work is bounded by AQE's
    advisory partition size instead of growing with the corpus.
    """
    sets = tok.groupBy(id_col).agg(F.collect_set("tok").alias("toks"))
    s1 = sets.select(F.col(id_col).alias("d1"), F.col("toks").alias("t1"))
    s2 = sets.select(F.col(id_col).alias("d2"), F.col("toks").alias("t2"))
    shared = F.size(F.array_intersect(F.col("t1"), F.col("t2")))
    return (
        _rebalance_pairs(cands.join(s1, "d1").join(s2, "d2"))
        .withColumn("jaccard", shared / (F.size("t1") + F.size("t2") - shared))
        .select("d1", "d2", "jaccard")
    )


def minhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, threshold: float,
    tokenizer=hashed_shingles,
) -> DataFrame:
    """LSH candidates verified with exact (shingle-hash) Jaccard ≥ threshold.

    Signatures and per-doc token sets come from ONE row-wise projection
    over the corpus (:func:`_rowwise_minhash` — no explode, no aggregate,
    no shuffle; the r05 sf10 probe measured the old explode+groupBy
    formulation as l2b's single largest stage at 1739 task-seconds),
    materialized once (``localCheckpoint``; persist to MEMORY_AND_DISK /
    durable checkpoint on a cluster). Measured: the three consumers
    (banding, verify-s1, verify-s2) prune different columns, which makes
    their subtrees non-identical, so Catalyst's reuse does NOT fire and
    an unmaterialized plan re-tokenizes the full corpus three times — the
    dominant cost at any real scale. The default tokenizer is
    :func:`hashed_shingles` (int64 shingle ids — no shingle strings
    built, narrow shuffles, long-typed ``array_intersect``); a custom
    exploded tokenizer falls back to the groupBy path. The candidate
    ``.distinct()`` stays BEFORE the verify join because a pair colliding
    in several bands would otherwise be verified several times (measured:
    dedup-after-verify is slower, not faster).
    """
    if tokenizer is hashed_shingles:
        combined = _rowwise_minhash(df, id_col, text_col, with_toks=True)
    else:  # custom tokenizer: tokens arrive exploded — aggregate path
        tok = tokenizer(df, id_col, text_col)
        combined = tok.groupBy(id_col).agg(
            F.collect_set("tok").alias("toks"),
            *_km_minhash_cols(pre_hashed=False),
        )
    combined = materialize(combined, eager=False)
    # eager=False: the checkpoint RDD is shared by all three consumers, so
    # one action computes the agg subtree once and caches it mid-job — an
    # eager checkpoint does the same work but pays an extra blocking job
    # launch first (measured ~0.3 s at sf0.1, pure scheduling overhead).
    cands = lsh_candidate_pairs(combined, id_col)
    s1 = combined.select(F.col(id_col).alias("d1"), F.col("toks").alias("t1"))
    s2 = combined.select(F.col(id_col).alias("d2"), F.col("toks").alias("t2"))
    shared = F.size(F.array_intersect(F.col("t1"), F.col("t2")))
    return (
        _rebalance_pairs(cands.join(s1, "d1").join(s2, "d2"))
        .withColumn("jaccard", shared / (F.size("t1") + F.size("t2") - shared))
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


@query("l2b_minhash_lsh", category="pipeline-dedup")
def minhash_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates (3-shingles) verified at J ≥ 0.5
    (probabilistic recall → rows-only; recall asserted in the test suite).
    No global sort: the driver's rows-only check is order-free, and a
    range-partitioned sort would add a sampling job + exchange per run."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_near_dups(d, "doc_id", "text", 0.5)


# ---------------------------------------------------------------------------
# L2c — SimHash (64-bit sketch)
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of token-hash bits.

    One explode + one groupBy with 64 conditional sums — all JVM built-ins,
    partial-aggregable, no UDF.
    """
    tok = distinct_tokens(df, id_col, text_col).withColumn(
        "th", F.xxhash64(F.col("tok"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select(id_col, sig.alias("simhash"))


@query("l2c_simhash", category="pipeline-dedup")
def simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash sketches (Spark-hash-seeded → rows-only; hamming-neighbor
    behavior property-tested)."""
    d = load_table(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# L2d — duplicate clusters: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 15
) -> DataFrame:
    """(node, comp) labels via iterative min-label propagation.

    Each round every node takes the min label among itself and its
    neighbors; converges in O(component diameter) rounds — dup clusters
    are shallow, so a handful. Lineage is truncated per round with
    ``localCheckpoint`` (on a cluster: ``checkpoint`` to durable storage),
    otherwise the plan doubles every iteration. The only driver-side data
    is one change-count scalar per round. This is the iterative-algorithm
    escape hatch the DataFrame API handles fine — no RDDs needed.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = materialize(sym, eager=True)
    labels = materialize(
        sym.select("a")
        .union(sym.select("b"))
        .distinct()
        .select(F.col("a").alias("node"), F.col("a").alias("comp")),
        eager=True,
        iterative=True,
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_min"))
        )
        new_labels = materialize(
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left").select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_min", "comp")).alias("comp"),
            ),
            eager=True,
            iterative=True,
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


_NEAR_DUP_EDGES_SQL = (
    _SHINGLE_PAIRS_SQL.replace("WITH w AS", "WITH RECURSIVE w AS")
    + """
, edges AS (
  SELECT d1, d2
  FROM shared JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE shared * 1.0 / (s1.n_tok + s2.n_tok - shared) >= 0.75
)
"""
)


def _near_dup_edges(d: DataFrame) -> DataFrame:
    """The bounded near-dup edge kernel l2d/l14 cluster on — the SAME
    df-bounded shingle pairs l2a_near_dup_pairs emits (one definition of
    "edge" across the dedup family, and the bound that makes edge
    generation survive 100×; previously these two clustered on unbounded
    token pairs, the r03 verdict's named scale-killer)."""
    return jaccard_pairs(
        d, "doc_id", "text", tokenizer=distinct_shingles, max_df=SHINGLE_MAX_DF
    ).filter(F.col("jaccard") >= 0.75)


@query(
    "l2d_dup_clusters",
    oracle=_NEAR_DUP_EDGES_SQL
    + """
, sym AS (
  SELECT d1 AS a, d2 AS b FROM edges UNION SELECT d2, d1 FROM edges
), reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
)
SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
FROM reach GROUP BY a ORDER BY doc_id
""",
    category="pipeline-dedup",
)
def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group near-duplicate docs (exact Jaccard ≥ 0.75 pairs) into clusters;
    cluster id = min doc_id in the component. The oracle computes the same
    components with a recursive-CTE transitive closure — feasible only at
    fixture scale, which is exactly why the engine side is the iterative
    propagation that scales."""
    d = load_table(spark, sf_dir, "documents")
    labels = connected_components(_near_dup_edges(d), "d1", "d2")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L14 — end-to-end corpus dedup sweep: clusters → canonical doc → clean corpus
# ---------------------------------------------------------------------------


@query(
    "l14_corpus_dedup_sweep",
    oracle=_NEAR_DUP_EDGES_SQL
    + """
, sym AS (
  SELECT d1 AS a, d2 AS b FROM edges UNION SELECT d2, d1 FROM edges
), reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
), clusters AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
), removed AS (
  SELECT doc_id FROM clusters WHERE doc_id <> cluster_id
)
SELECT lang,
       CAST(COUNT(*) FILTER (WHERE doc_id NOT IN (SELECT doc_id FROM removed)) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM removed)) AS BIGINT) AS n_removed
FROM documents
GROUP BY lang
""",
    category="pipeline-dedup",
)
def corpus_dedup_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup removal pipeline end-to-end: Jaccard edges →
    connected components → keep ONE canonical doc per cluster (the min
    doc_id = the cluster label itself, so no extra ranking pass) → report
    kept/removed per language. This is the operation a 100 TB corpus
    actually runs nightly; the edge step is the df-bounded shingle kernel
    (swap in l2b's MinHash-LSH candidates when even bounded exact pairs
    are too wide), and the rest of the pipeline is unchanged — which is
    the point of keeping the sweep compositional."""
    d = load_table(spark, sf_dir, "documents")
    labels = connected_components(_near_dup_edges(d), "d1", "d2")
    removed = labels.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("rm_id")
    )
    flagged = d.select("doc_id", "lang").join(
        F.broadcast(removed), F.col("doc_id") == F.col("rm_id"), "left"
    )
    return flagged.groupBy("lang").agg(
        F.count(F.when(F.col("rm_id").isNull(), 1)).alias("n_kept"),
        F.count(F.when(F.col("rm_id").isNotNull(), 1)).alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# L15 — blocked fuzzy record linkage (edit-distance match within blocks)
# ---------------------------------------------------------------------------


@query(
    "l15_blocked_fuzzy_linkage",
    oracle="""
WITH names AS (
  SELECT DISTINCT p_name AS name, string_split(p_name, ' ')[2] AS block
  FROM part
)
SELECT a.name AS name1, b.name AS name2,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2
""",
    category="pipeline-dedup",
)
def blocked_fuzzy_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage the way authority-reconciliation jobs do it: first
    collapse records to the DISTINCT name vocabulary (64 names here vs 20k
    part rows — the vocabulary is always orders of magnitude smaller than
    the record table), then compare only within a blocking key (the head
    noun), then verify candidates with exact edit distance. Blocking turns
    the quadratic all-pairs into Σ block² over bounded blocks — same
    shape as LSH banding (l2b), with a semantic key instead of a hash.
    ``levenshtein`` is bit-identical across engines (it's an integer DP),
    so the whole pipeline is oracle-checkable."""
    p = load_table(spark, sf_dir, "part")
    names = (
        p.select(F.col("p_name").alias("name"))
        .distinct()
        # F.get, not getItem: a one-word name has no index 1, which is an
        # ANSI INVALID_ARRAY_INDEX under getItem but NULL under get — the
        # same out-of-bounds-is-NULL rule as the oracle's list indexing
        .withColumn("block", F.get(F.split(F.col("name"), " "), 1))
    )
    a = names.select(F.col("name").alias("name1"), "block")
    b = names.select(F.col("name").alias("name2"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("name1") < F.col("name2"))
        .withColumn("dist", F.levenshtein("name1", "name2"))
        .filter(F.col("dist") <= 2)
        .select("name1", "name2", "dist")
    )


# ---------------------------------------------------------------------------
# L2e — asymmetric containment (sub-document / quote detection)
# ---------------------------------------------------------------------------


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    tokenizer=distinct_shingles,
    max_df: int | None = None,
) -> DataFrame:
    """Doc pairs where one shingle set is ≥ ``threshold`` contained in the
    other: C(A→B) = |A∩B| / |A|.

    Symmetric Jaccard (l2a/l2b) misses the case a corpus cleaner cares
    about most — a short document that is a verbatim quote or excerpt of a
    long one (Jaccard |A∩B|/|A∪B| is dragged down by the big doc's size,
    containment is not). Shingles, not single tokens, are the unit: token
    sets over a natural vocabulary make every short doc "contained" in
    every long one, while k-token shingles only collide on genuinely
    shared passages. Same inverted-index shape as :func:`jaccard_pairs`:
    shuffle on shingle, count shared per pair, join per-doc sizes — never
    all-pairs, and the same ``max_df`` stopword bound applies at scale.
    Emits one row per DIRECTED containment (sub → super), so a pair where
    both directions clear the bar (i.e. a true near-dup) yields two rows.
    shared/n is an int ratio → bit-identical double across engines.
    """
    tok = tokenizer(df, id_col, text_col)
    sizes, shared = _pair_shared_counts(tok, id_col, max_df=max_df)
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_tok").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_tok").alias("n2"))
    both = shared.join(s1, "d1").join(s2, "d2")
    fwd = both.select(
        F.col("d1").alias("d_sub"),
        F.col("d2").alias("d_super"),
        (F.col("shared") / F.col("n1")).alias("containment"),
    )
    rev = both.select(
        F.col("d2").alias("d_sub"),
        F.col("d1").alias("d_super"),
        (F.col("shared") / F.col("n2")).alias("containment"),
    )
    return fwd.unionAll(rev).filter(F.col("containment") >= threshold)


@query(
    "l2e_containment_pairs",
    oracle="""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
), shp AS (
  SELECT doc_id, i, COUNT(*) OVER (PARTITION BY doc_id) AS n,
         concat_ws(' ', w, lead(w, 1) OVER win, lead(w, 2) OVER win) AS sh
  FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
), tok AS (
  SELECT DISTINCT doc_id, sh AS t FROM shp
  WHERE i <= greatest(n - 2, 1) AND sh <> ''
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id
), shared AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), both_sides AS (
  SELECT d1, d2, shared, s1.n_tok AS n1, s2.n_tok AS n2
  FROM shared JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
), directed AS (
  SELECT d1 AS d_sub, d2 AS d_super, shared * 1.0 / n1 AS containment FROM both_sides
  UNION ALL
  SELECT d2, d1, shared * 1.0 / n2 FROM both_sides
)
SELECT d_sub, d_super, containment FROM directed WHERE containment >= 0.8
""",
    category="pipeline-dedup",
)
def containment_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed sub-document detection at 3-shingle containment ≥ 0.8
    (exact)."""
    d = load_table(spark, sf_dir, "documents")
    return containment_pairs(d, "doc_id", "text", threshold=0.8)


# ---------------------------------------------------------------------------
# L2f — incremental dedup: a new ingest batch vs the existing corpus
# ---------------------------------------------------------------------------


def incremental_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    new_pred,
    threshold: float = 0.6,
    tokenizer=distinct_shingles,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dups of NEWLY-ingested docs against the whole corpus (new↔old
    and new↔new), never re-comparing old↔old pairs.

    The daily-ingest shape: a steady-state corpus only ever needs the new
    batch checked, so candidate generation must scale with |new| — this
    inverted-index join probes only new docs' shingles into the corpus
    index (shuffle ∝ |new batch| + matched postings, not |corpus|²).
    Emits (d_new, d_other, jaccard); a new↔new pair appears once
    (d_new < d_other), a new↔old pair is oriented new→old.

    ``max_df`` bounds every posting list of the INDEX side before the
    join — the same mandatory stopword cut as l2a/l2g, with the same
    hand-off contract (a passage shared by > max_df docs belongs to the
    l1/l2b tiers): without it, one boilerplate shingle in d corpus docs
    fans every probing doc out to d rows, and a heavily-duplicated
    corpus makes the probe quadratic no matter how small the batch is —
    the round-5 sf10 probe (every doc ×100 verbatim) did not finish in
    20 minutes unbounded and runs in seconds bounded. Sizes use the FULL
    token sets, so denominators stay exact."""
    # NOT _pair_shared_counts: the probe side is filtered to the new batch
    # BEFORE the join (the whole point), and the pair predicate is
    # orientation-aware rather than d1 < d2
    tok = tokenizer(df, id_col, text_col)
    is_new = new_pred(F.col(id_col))
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))
    join_tok = tok
    if max_df is not None:
        df_counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
        join_tok = tok.join(
            df_counts.filter(F.col("__df") <= max_df), "tok"
        ).drop("__df")
    new_tok = join_tok.filter(is_new).select(F.col(id_col).alias("d_new"), "tok")
    all_tok = join_tok.select(F.col(id_col).alias("d_other"), "tok")
    shared = (
        new_tok.join(all_tok, "tok")
        .filter(
            (~new_pred(F.col("d_other")))
            | (F.col("d_new") < F.col("d_other"))
        )
        .groupBy("d_new", "d_other")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    s1 = sizes.select(F.col(id_col).alias("d_new"), F.col("n_tok").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d_other"), F.col("n_tok").alias("n2"))
    return (
        shared.join(s1, "d_new")
        .join(s2, "d_other")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d_new", "d_other", "jaccard")
    )


# Shared by l2f (one-shot batch) and t25 (streaming twin): the twin
# relationship is the ORACLE TEXT — both registrations must stay the
# same query or the stream≡batch claim silently breaks.
INCREMENTAL_DEDUP_ORACLE = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
), shp AS (
  SELECT doc_id, i, COUNT(*) OVER (PARTITION BY doc_id) AS n,
         concat_ws(' ', w, lead(w, 1) OVER win, lead(w, 2) OVER win) AS sh
  FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
), tok AS (
  SELECT DISTINCT doc_id, sh AS t FROM shp
  WHERE i <= greatest(n - 2, 1) AND sh <> ''
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id
), df_ok AS (
  SELECT t FROM tok GROUP BY t HAVING COUNT(*) <= 50
), shared AS (
  SELECT a.doc_id AS d_new, b.doc_id AS d_other, COUNT(*) AS shared
  FROM tok a JOIN tok b ON a.t = b.t
  WHERE a.doc_id >= 400 AND (b.doc_id < 400 OR a.doc_id < b.doc_id)
    AND a.t IN (SELECT t FROM df_ok)
  GROUP BY 1, 2
)
SELECT d_new, d_other, shared * 1.0 / (s1.n_tok + s2.n_tok - shared) AS jaccard
FROM shared JOIN sizes s1 ON d_new = s1.doc_id JOIN sizes s2 ON d_other = s2.doc_id
WHERE shared * 1.0 / (s1.n_tok + s2.n_tok - shared) >= 0.6
"""


@query(
    "l2f_incremental_dedup",
    oracle=INCREMENTAL_DEDUP_ORACLE,
    category="pipeline-dedup",
)
def incremental_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs with doc_id ≥ 400 play the freshly-ingested batch; exact
    3-shingle Jaccard ≥ 0.6 against the whole corpus, old↔old skipped."""
    d = load_table(spark, sf_dir, "documents")
    return incremental_near_dups(
        d, "doc_id", "text", lambda c: c >= 400, threshold=0.6,
        max_df=SHINGLE_MAX_DF,
    )
