"""Similarity search over embedding columns (SURVEY.md §2.8 L3/L4).

Brute-force cosine top-k is the exactness baseline; random-hyperplane LSH
bucketing is the scale path (candidates ∝ bucket size, not corpus size).
All dot products use ``F.zip_with`` + ``F.aggregate`` lambdas — JVM-side,
sequential fold → bit-identical to the DuckDB oracle's list_sum fold
(verified empirically; see functions/scalar.py header).

100 TB design: the query side is broadcast (top-k questions are about a
bounded query set); the corpus side never shuffles for brute force. The
LSH variant buckets the corpus once (one narrow column write) and turns
each query into an equi-join probe on (bucket) — sub-linear per query.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import (
    Column,
    DataFrame,
    SparkSession,
    Window as W,
    functions as F,
    types as T,
)

from ..registry import query
from ..session import fan_out as _fan_out, load_table, materialize


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _lit_darray(vals) -> Column:
    """Literal array<double> built in ONE driver→JVM step.

    ``F.array(*[F.lit(float(x)) for x in vals])`` costs one py4j round
    trip per ELEMENT — a k×dim centroid fold paid ~1 ms × 512 calls of
    pure socket latency per probe (r11 cProfile: 2.6 s of a 3.0 s l3h
    invocation inside py4j send_command). One ``F.expr`` string parses
    the same literal array in a single call. ``repr(float)`` is Python's
    shortest round-trip form and Spark's ``D`` literal parses
    correctly-rounded, so the planned doubles are bit-identical to the
    F.lit path (non-finite values fall back to F.lit — no SQL literal
    spells NaN/Infinity)."""
    import math

    xs = [float(v) for v in vals]
    if not xs:
        return F.expr("CAST(array() AS array<double>)")
    if all(math.isfinite(x) for x in xs):
        return F.expr("array(" + ",".join(repr(x) + "D" for x in xs) + ")")
    return F.array(*[F.lit(x) for x in xs])


def _lit_dmatrix(rows) -> Column:
    """Literal array<array<double>> (a centroid matrix) in one step —
    the 2-D companion of :func:`_lit_darray`, feeding indexed
    ``F.transform`` folds so k centroids cost ONE lambda instead of k
    unrolled expression trees."""
    import math

    rs = [[float(v) for v in r] for r in rows]
    flat = [x for r in rs for x in r]
    if flat and all(math.isfinite(x) for x in flat):
        return F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(repr(x) + "D" for x in r) + ")"
                if r
                else "CAST(array() AS array<double>)"
                for r in rs
            )
            + ")"
        )
    return F.array(*[_lit_darray(r) for r in rs])


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with the zero-norm convention cos(x, 0) := 0.

    A real corpus contains zero vectors (failed encoder, padding); a bare
    dot/(‖a‖·‖b‖) crashes the whole query on the first one under Spark's
    default ANSI mode. Defining the similarity as 0 keeps thresholds and
    top-k ranks well-defined, and every oracle spells the same CASE so
    both engines agree bit-for-bit."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > F.lit(0.0), _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    q_id: str,
    c_id: str,
    q_vec: str,
    c_vec: str,
    k: int,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the corpus,
    rank per query. Ties broken by corpus id — fully deterministic."""
    q = F.broadcast(
        queries.select(F.col(q_id).alias("qid"), _to_double(F.col(q_vec)).alias("qe"))
    )
    c = corpus.select(F.col(c_id).alias("cid"), _to_double(F.col(c_vec)).alias("ce"))
    scored = c.crossJoin(q).select(
        "qid",
        "cid",
        _cosine(F.col("qe"), F.col("ce")).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).drop(
        "rnk"
    )


COSINE_ORACLE_CTE = """
WITH q AS (
  SELECT vec_id AS qid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
  FROM embeddings WHERE vec_id >= 5
), scored AS (
  SELECT qid, cid,
         CASE WHEN (sqrt(list_sum(list_transform(qe, x -> x * x)))
                    * sqrt(list_sum(list_transform(ce, x -> x * x)))) > 0
              THEN list_sum(list_transform(list_zip(qe, ce), p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(qe, x -> x * x)))
                      * sqrt(list_sum(list_transform(ce, x -> x * x))))
              ELSE 0.0 END AS cos
  FROM c, q
)
"""


@query(
    "l3_cosine_topk",
    oracle=COSINE_ORACLE_CTE
    + """
SELECT qid, cid, cos FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) <= 5
""",
    category="pipeline-similarity",
)
def cosine_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 nearest corpus vectors (cosine) for each of 5 query vectors."""
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(
        e.filter(F.col("vec_id") < 5),
        e.filter(F.col("vec_id") >= 5),
        "vec_id",
        "vec_id",
        "embedding",
        "embedding",
        k=5,
    )


# ---------------------------------------------------------------------------
# L3b — LSH-bucketed approximate NN (scale path)
# ---------------------------------------------------------------------------

N_TABLES = 8  # multi-table LSH: union of candidates across tables
BITS_PER_TABLE = 6  # 64 buckets per table
_PLANE_SEED = 7


def _hyperplanes(dim: int) -> list[list[list[float]]]:
    """Deterministic hyperplanes, [table][bit][dim] (fixed seed → stable plans)."""
    rng = np.random.RandomState(_PLANE_SEED)
    return rng.standard_normal((N_TABLES, BITS_PER_TABLE, dim)).tolist()


def _srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: one bit per hyperplane."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = _lit_darray(p)
        bit = F.when(_dot(_to_double(vec), plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def _srp_bucket_rows(df: DataFrame, id_col: str, vec: str) -> DataFrame:
    """(id, vec-as-double, tbl, bucket) — all N_TABLES SRP buckets per
    vector computed in ONE Arrow GEMM batch (sign bits of V·Pᵗ packed per
    table), then posexploded. The expression formulation evaluated
    N_TABLES×BITS_PER_TABLE interpreted higher-order dot-folds per row
    and its Catalyst analysis dominated l3b's wall at every scale; this
    kernel moves each vector over Arrow once and does the 48 dots as one
    matmul. Rows-only tier: the oracle-checked SRP paths (l28/l3j) keep
    the expression form whose fold order their inlined SQL mirrors. Null
    vectors produce no bucket rows (they can never verify as neighbors)."""
    planes = np.asarray(_hyperplanes(64), dtype=np.float64)  # [tbl][bit][dim]
    n_tables, n_bits, _ = planes.shape
    P = planes.reshape(n_tables * n_bits, -1)
    weights = (1 << np.arange(n_bits, dtype=np.int64))[None, None, :]

    # id keeps its INPUT type — the expression form was id-type-generic
    # and the Arrow kernel must not narrow that contract
    id_type = df.select(F.col(id_col)).schema[0].dataType
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("ve", T.ArrayType(T.DoubleType())),
            T.StructField("buckets", T.ArrayType(T.LongType())),
        ]
    )

    def bucketize(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = {"id": pdf["id"], "ve": pdf["ve"]}
            bks = np.full(len(pdf), None, dtype=object)
            if len(pdf):
                valid = np.array([v is not None for v in pdf["ve"]])
                if valid.any():
                    V = np.array([np.asarray(v, np.float64) for v in pdf["ve"][valid]])
                    bits = (V @ P.T > 0).reshape(len(V), n_tables, n_bits)
                    buckets = (bits * weights).sum(axis=2)  # [row][tbl]
                    rows = np.empty(len(V), dtype=object)
                    rows[:] = [b.tolist() for b in buckets]
                    bks[valid] = rows
            out["buckets"] = bks
            yield pd.DataFrame(out)

    bucketed = df.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec)).alias("ve")
    ).mapInPandas(bucketize, schema)
    return bucketed.select(
        "id", "ve", F.posexplode("buckets").alias("tbl", "bucket")
    )


def ann_lsh_topk(
    queries: DataFrame, corpus: DataFrame, q_id: str, c_id: str, vec: str, k: int
) -> DataFrame:
    """Approximate top-k via multi-table SRP-LSH: candidates = union over
    tables of same-bucket vectors, exact-cosine re-rank on candidates only.
    More tables → higher recall, linear candidate cost; recall is
    property-tested against brute force. At scale the corpus side's
    (tbl, bucket) index is computed once and reused across query batches."""
    q = _srp_bucket_rows(queries, q_id, vec).select(
        F.col("id").alias("qid"), F.col("ve").alias("qe"), "tbl", "bucket"
    )
    c = _srp_bucket_rows(_fan_out(corpus), c_id, vec).select(
        F.col("id").alias("cid"), F.col("ve").alias("ce"), "tbl", "bucket"
    )
    cands = q.join(c, ["tbl", "bucket"]).select("qid", "qe", "cid", "ce").distinct()
    scored = cands.select(
        "qid",
        "cid",
        _cosine(F.col("qe"), F.col("ce")).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).drop(
        "rnk"
    )


@query("l3b_ann_lsh", category="pipeline-similarity")
def ann_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (approximate → rows-only; recall vs brute force
    asserted in tests)."""
    e = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(
        e.filter(F.col("vec_id") < 20), e.filter(F.col("vec_id") >= 20), "vec_id", "vec_id", "embedding", k=5
    ).orderBy("qid", "cid")


# ---------------------------------------------------------------------------
# L3c — IVF: k-means coarse quantizer, probe-limited search (scale path #2)
# ---------------------------------------------------------------------------


# driver-side quantizer training is allowed up to this many sample rows
# (≤8 MB at dim 64); a k large enough to need more trains distributed
_MAX_DRIVER_TRAIN_ROWS = 16384


def _kmeans_centroids(
    corpus: DataFrame, vec: str, k: int, iters: int = 3
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the coarse quantizer.

    Small/medium k (50·k sample fits the driver budget): FAISS's
    train-on-sample rule taken literally — collect a HASH-ordered sample
    of max(4096, 50·k) rows (``xxhash64`` over the vector, so the sample
    is partitioning-independent and immune to a z-ordered/sorted layout
    feeding a spatially-correlated prefix) and run Lloyd's in numpy: same
    first-minimum tie rule and keep-empty-cluster semantics as the
    DataFrame formulation this replaced, which spent its wall on
    per-iteration Catalyst analysis (measured r05: 15 s plan-build, 3 s
    math). Large k: the distributed loop — per-iteration GEMM assignment
    (``_assign_nearest``, O(1) plan size past 32 centroids) + one grouped
    mean; only k×dim floats reach the driver per round. Quantizer quality
    is a recall knob, not a correctness contract — every consumer is a
    rows-only ANN tier with recall property tests."""
    target = max(4096, 50 * k)
    if target <= _MAX_DRIVER_TRAIN_ROWS:
        rows = (
            corpus.where(F.col(vec).isNotNull())
            .select(_to_double(F.col(vec)).alias("__tv"))
            .orderBy(F.xxhash64(F.col(vec)))
            .limit(target)
            .collect()
        )
        if not rows:  # empty corpus: no quantizer to train
            return []
        X = np.array([r["__tv"] for r in rows], dtype=np.float64)
        X = X[np.argsort(X[:, 0], kind="stable")]
        C = X[:k].copy()
        for _ in range(iters):
            d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
            a = d2.argmin(axis=1)
            for c in range(len(C)):
                mask = a == c
                if mask.any():  # empty cluster keeps its old centroid
                    C[c] = X[mask].mean(axis=0)
        return [[float(x) for x in c] for c in C]

    # large k: distributed Lloyd's over whatever sample the caller passed.
    # Filter NULL vectors BEFORE seeding (they sort first under asc and
    # would silently shrink or empty the seed set), same as the driver path.
    corpus = corpus.where(F.col(vec).isNotNull())
    seeds = corpus.orderBy(F.col(vec).getItem(0)).limit(k).select(vec).collect()
    centroids = [[float(x) for x in r[0]] for r in seeds]
    if not centroids:
        return []
    for _ in range(iters):
        assigned = _assign_nearest(corpus, vec, centroids).select(
            F.col("__cluster"), F.posexplode(_to_double(F.col(vec))).alias("dim", "v")
        )
        rows = (
            assigned.groupBy("__cluster", "dim")
            .agg(F.avg("v").alias("c"))
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in rows:
            new[r["__cluster"]][r["dim"]] = r["c"]
        centroids = new
    return centroids


_MAX_LITERAL_CENTROIDS = 32  # above this, plan-literal folding would blow
# up the expression tree (k × dim literals); switch to the data-side path


def _assign_nearest(df: DataFrame, vec: str, centroids: list[list[float]]) -> DataFrame:
    """Add __cluster = argmin_k ||v - c_k||² (ties → lowest cluster id).
    k ≤ 32 folds centroids as plan literals (fixture plans unchanged);
    larger k runs an Arrow-batched numpy GEMM kernel — same argmin,
    O(1) plan size, vectorized distance math."""
    if len(centroids) <= _MAX_LITERAL_CENTROIDS:
        # one transform over the literal centroid MATRIX instead of k
        # unrolled per-centroid trees: same distances in the same order
        # (bit-identical folds), one lambda to analyze, and the k×dim
        # literals enter the plan in one py4j step (r11: the unrolled
        # form cost ~1 ms of socket latency per literal per invocation)
        dists = F.transform(
            _lit_dmatrix(centroids),
            lambda c: F.aggregate(
                F.zip_with(
                    _to_double(F.col(vec)), c, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return df.withColumn(
            "__cluster", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    # large k: Arrow-batched GEMM kernel. Higher-order-function distance
    # expressions never enter whole-stage codegen — the sf10 smoke
    # measured 150 s tasks interpreting 446-centroid argmins row by row —
    # while the expanded-form ‖v‖²−2vCᵀ+‖c‖² matmul does the same block
    # in milliseconds (the l3d/l3k pattern). argmin takes the FIRST
    # minimum, matching the literal path's lowest-cluster tie rule.
    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("__cluster", T.IntegerType())]
    )

    def assign(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf):
                valid = np.array([v is not None for v in pdf[vec]])
                clusters = np.full(len(pdf), None, dtype=object)
                if valid.any():
                    V = np.array(
                        [np.asarray(v, np.float64) for v in pdf[vec][valid]]
                    )
                    d2 = (V * V).sum(1)[:, None] - 2.0 * (V @ C.T) + c2[None, :]
                    clusters[valid] = d2.argmin(axis=1).astype(np.int32)
                pdf["__cluster"] = clusters
            else:
                pdf["__cluster"] = pd.Series([], dtype=object)
            yield pdf

    return df.mapInPandas(assign, out_schema)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    q_id: str,
    c_id: str,
    vec: str,
    k: int,
    n_clusters: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: cluster the corpus once (coarse quantizer),
    probe each query against its n_probe nearest clusters only, exact-cosine
    re-rank inside. Candidate cost ∝ n_probe/n_clusters of the corpus."""
    centroids = _kmeans_centroids(corpus, vec, n_clusters)
    if not centroids:  # empty corpus: no quantizer, no neighbors
        # the empty frame keeps the CORPUS id type so per-shard unions
        # schema-match the non-empty path (id-type-generic contract)
        cid_type = corpus.select(F.col(c_id)).schema[0].dataType
        return (
            queries.select(F.col(q_id).alias("qid"))
            .withColumn("cid", F.lit(None).cast(cid_type))
            .withColumn("cos", F.lit(None).cast("double"))
            .filter(F.lit(False))
        )
    c = _assign_nearest(corpus, vec, centroids).select(
        F.col(c_id).alias("cid"), _to_double(F.col(vec)).alias("ce"), "__cluster"
    )
    # per-query probe list: n_probe nearest centroids
    q_assigned = queries.select(
        F.col(q_id).alias("qid"), _to_double(F.col(vec)).alias("qe"), F.col(vec).alias("__v")
    )
    # indexed transform over the literal centroid matrix — same (d, cl)
    # structs in the same order as the old k-unrolled form (transform's
    # index is the same 0-based int F.lit(i) was), one lambda, one py4j
    # step for the literals (see _assign_nearest)
    dists = F.transform(
        _lit_dmatrix(centroids),
        lambda cen, i: F.struct(
            F.aggregate(
                F.zip_with(F.col("qe"), cen, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.alias("cl"),
        ),
    )
    q = (
        q_assigned.withColumn("__probes", F.slice(F.array_sort(dists), 1, n_probe))
        .select(
            "qid", "qe", F.explode(F.col("__probes.cl")).alias("__cluster")
        )
    )
    scored = q.join(c, "__cluster").select(
        "qid",
        "cid",
        _cosine(F.col("qe"), F.col("ce")).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).drop(
        "rnk"
    )


@query("l3c_ann_ivf", category="pipeline-similarity")
def ann_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (k-means quantizer; approximate → rows-only; recall
    asserted in tests)."""
    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        e.filter(F.col("vec_id") < 20),
        e.filter(F.col("vec_id") >= 20),
        "vec_id",
        "vec_id",
        "embedding",
        k=5,
    ).orderBy("qid", "cid")


# ---------------------------------------------------------------------------
# L4 — per-label embedding statistics (centroids)
# ---------------------------------------------------------------------------


@query(
    "l4_embedding_centroids",
    oracle="""
WITH flat AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS dim,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT label, CAST(dim AS INTEGER) AS dim,
       CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1e9 / COUNT(*) AS centroid,
       CAST(COUNT(*) AS BIGINT) AS n
FROM flat GROUP BY label, dim
""",
    category="pipeline-similarity",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dimension). Decimal-sum idiom
    keeps the float mean order-independent. posexplode is 0-based → +1."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select("label", F.posexplode("embedding").alias("pos", "v")).select(
        "label", (F.col("pos") + 1).alias("dim"), "v"
    )
    return flat.groupBy("label", "dim").agg(
        # quantize at 1e-9 via floor(x*1e9+0.5) → exact BIGINT sum: decimal
        # casts of floats tie-break differently across engines (string-repr vs
        # exact-binary rounding); floor/multiply are IEEE-identical everywhere.
        (
            F.sum(
                F.floor(F.col("v").cast("double") * F.lit(1e9) + F.lit(0.5)).cast("long")
            ).cast("double")
            / F.lit(1e9)
            / F.count(F.lit(1))
        ).alias("centroid"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# L4b — embedding near-dup pairs within label blocks
# ---------------------------------------------------------------------------


@query(
    "l4b_embedding_near_dup",
    oracle="""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), pairs AS (
  SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
         CASE WHEN (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                    * sqrt(list_sum(list_transform(b.e, x -> x * x)))) > 0
              THEN list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                      * sqrt(list_sum(list_transform(b.e, x -> x * x))))
              ELSE 0.0 END AS cos
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) FILTER (WHERE cos >= 0.2) AS BIGINT) AS n_close
FROM pairs GROUP BY label
""",
    category="pipeline-similarity",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine near-dup detection blocked by label (block-local all-pairs —
    the blocking key is what makes this feasible at scale)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", _to_double(F.col("embedding")).alias("e"))
    a = v.select("label", F.col("vec_id").alias("v1"), F.col("e").alias("e1"))
    b = v.select("label", F.col("vec_id").alias("v2"), F.col("e").alias("e2"))
    pairs = (
        a.join(b, "label")
        .filter(F.col("v1") < F.col("v2"))
        .select(
            "label",
            (
                _cosine(F.col("e1"), F.col("e2"))
            ).alias("cos"),
        )
    )
    return pairs.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count(F.when(F.col("cos") >= 0.2, 1)).alias("n_close"),
    )


# ---------------------------------------------------------------------------
# L3d — blocked-GEMM exact top-k (the vectorized 100 TB scale path)
# ---------------------------------------------------------------------------


@query("l3d_blocked_gemm_topk", category="pipeline-similarity")
def blocked_gemm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k computed as a blocked matrix multiply: the query
    block (k×d, tiny) is broadcast into every corpus partition, and each
    Arrow batch does ONE float64 numpy GEMM instead of per-pair array
    folds. Same answer as l3_cosine_topk (asserted in the test suite to
    1e-9 — summation order differs, so rows-only here), but the per-row
    cost is a BLAS inner loop, which is what survives a 100 TB corpus:
    per-partition work is (batch × d) @ (d × k), no shuffle until the
    final per-query top-k reduction over partition-local candidates.

    The partition-local rank pre-prune (top-k per query WITHIN each Arrow
    batch) bounds the shuffle to k rows per (partition, query) — the
    classic distributed-top-k two-phase reduction."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    k = 5
    q_rows = (
        e.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    )  # 5 query vectors — a bounded, deliberate driver-side broadcast
    qids = np.array([r.vec_id for r in q_rows])
    qmat = (
        np.array([r.embedding for r in q_rows], dtype=np.float64)
        if q_rows
        else np.zeros((0, 1))  # no queries: batches short-circuit below
    )
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0 or len(qids) == 0:  # empty batch or no queries
                yield pd.DataFrame({"qid": [], "cid": [], "cos": []})
                continue
            cmat = np.array(list(pdf.embedding), dtype=np.float64)
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            denom = np.outer(cnorm, qnorm)  # (batch, nq)
            cos = np.divide(  # zero-norm convention: cos(x, 0) := 0
                cmat @ qmat.T, denom, out=np.zeros_like(denom), where=denom > 0
            )
            n_c, n_q = cos.shape
            out = pd.DataFrame(
                {
                    "qid": np.repeat(qids, n_c),
                    "cid": np.tile(pdf.vec_id.to_numpy(), n_q),
                    "cos": cos.T.ravel(),
                }
            )
            # partition-local pre-prune: only k candidates per query leave
            out = (
                out.sort_values(["qid", "cos", "cid"], ascending=[True, False, True])
                .groupby("qid", sort=False)
                .head(k)
            )
            yield out

    corpus = e.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    scored = corpus.mapInPandas(score_batches, "qid long, cid long, cos double")
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
        .orderBy("qid", "cid")
    )


# ---------------------------------------------------------------------------
# L3e — product-quantization ANN (asymmetric-distance scan + exact re-rank)
# ---------------------------------------------------------------------------


def _pq_train(
    corpus, vec: str, m: int, sub: int, n_codes: int, iters: int = 3
) -> list[list[list[float]]]:
    """Train all m subspace codebooks on a BOUNDED sample, driver-side.

    FAISS's rule, taken literally: quantizers train on a fixed-size
    sample (4096 rows here — ≤2 MB at dim 64, a bounded driver transfer
    like every other trained-model family), so training cost is
    independent of corpus size; only the resulting m×n_codes×sub
    codebook matrix (KBs) matters downstream, where it becomes plan
    literals. The first formulation ran Lloyd's as Spark expressions
    over the sample — m×n_codes nested higher-order aggregates per
    iteration — and Catalyst spent 15.5 s ANALYZING those trees at any
    scale (measured r05, sf0.1: the whole 18 s of l3e was plan-build,
    3 s was execution). numpy Lloyd's on the same sample is exact, uses
    the same seeding (sort by first coordinate, first n_codes) and the
    same first-minimum/keep-empty-cluster rules, and costs milliseconds.
    """
    rows = (
        corpus.where(F.col(vec).isNotNull())
        .select(_to_double(F.col(vec)).alias("__tv"))
        # hash-ordered sample: partitioning-independent and immune to a
        # sorted/z-ordered layout feeding a spatially-correlated prefix
        # (same rule as _kmeans_centroids)
        .orderBy(F.xxhash64(F.col("__tv")))
        .limit(4096)
        .collect()
    )
    if not rows:  # all-null vector column: zero codebooks, never crash
        return [[[0.0] * sub for _ in range(n_codes)] for _ in range(m)]
    X = np.array([r["__tv"] for r in rows], dtype=np.float64)
    X = X[np.argsort(X[:, 0], kind="stable")]
    codebooks = []
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        C = S[:n_codes].copy()
        for _ in range(iters):
            d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
            a = d2.argmin(axis=1)  # first minimum on ties, like array_position
            for c in range(n_codes):
                mask = a == c
                if mask.any():  # empty cluster keeps its old centroid
                    C[c] = S[mask].mean(axis=0)
        codebooks.append([[float(x) for x in c] for c in C])
    return codebooks


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    q_id: str,
    c_id: str,
    vec: str,
    k: int,
    m: int = 8,
    n_codes: int = 16,
    n_rerank: int = 64,
) -> DataFrame:
    """Product-quantization approximate top-k (the FAISS ``PQ{m}x{bits}``
    shape, asymmetric distance computation + exact re-rank).

    Train: split each vector into ``m`` subvectors, k-means a ``n_codes``
    codebook per subspace (the m codebooks total m*n_codes*(dim/m) floats
    — KBs at any corpus size, so they become plan literals, the DataFrame
    analogue of FAISS keeping codebooks in L1 cache). Encode: each corpus
    vector compresses to m small ints — dim*4 bytes → m bytes, the memory
    win that lets a 100 TB corpus's codes fit in cluster RAM. Search:
    each query precomputes a lookup table of sub-dot-products against
    every code ONCE in its own projection (m*n_codes sub-dots per query
    row), then scoring a corpus point is just m ``element_at`` lookups +
    adds — the ADC scan; the scan itself is a broadcast of the tiny
    query+LUT side across corpus partitions (map-side, no shuffle of the
    corpus). Approximate top-``n_rerank`` per query then joins back the
    true vectors for exact-cosine re-ranking of the final top-``k``, so
    PQ error only costs recall, never wrong ordering inside the returned
    set. At 100 TB you compose this with the IVF router (l3c) so the ADC
    scan touches only probed buckets — the two operators are deliberately
    the same (qid, cid, cos) shape to chain."""
    # sniff the dimension from the first NON-NULL vector: a null first row
    # would crash len() here and make the all-null training guard dead code
    first = corpus.where(F.col(vec).isNotNull()).select(vec).first()
    if first is None:  # empty or all-null corpus: nothing to train/search
        # keep the corpus id type, matching the non-empty path's schema
        empty_cid_type = corpus.select(F.col(c_id)).schema[0].dataType
        return (
            queries.select(F.col(q_id).alias("qid"))
            .withColumn("cid", F.lit(None).cast(empty_cid_type))
            .withColumn("cos", F.lit(None).cast("double"))
            .filter(F.lit(False))
        )
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(
            f"PQ requires the vector dimension to be divisible by m "
            f"(dim={dim}, m={m}) — pad the vectors or pick m from the "
            f"divisors of dim (FAISS imposes the same contract)"
        )
    sub = dim // m
    codebooks = _pq_train(corpus, vec, m, sub, n_codes)

    # encode corpus: m code columns (small ints), true vector dropped.
    # ONE Arrow-batched GEMM kernel assigns all m subspace codes per batch
    # (the _assign_nearest large-k pattern) — the literal-expression
    # formulation chained m 16-way aggregate trees whose Catalyst analysis
    # dwarfed the actual math at every scale. Fan out first: the kernel is
    # compute-bound and would otherwise inherit a single-file fixture's
    # scan parallelism.
    corpus = _fan_out(corpus)
    CBS = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    # ids keep their INPUT types — the expression form was id-type-generic
    cid_type = corpus.select(F.col(c_id)).schema[0].dataType
    qid_type = queries.select(F.col(q_id)).schema[0].dataType
    code_schema = T.StructType(
        [T.StructField("cid", cid_type)]
        + [T.StructField(f"code{j}", T.IntegerType()) for j in range(m)]
    )

    def encode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = {"cid": pdf["cid"]}
            if len(pdf):
                # null vectors get null codes (the literal path's NULL
                # propagation), so they rank last instead of crashing
                valid = np.array([v is not None for v in pdf["ce"]])
                cols = {j: np.full(len(pdf), None, dtype=object) for j in range(m)}
                if valid.any():
                    V = np.array(
                        [np.asarray(v, np.float64) for v in pdf["ce"][valid]]
                    )
                    for j, C in enumerate(CBS):
                        S = V[:, j * sub : (j + 1) * sub]
                        d2 = (
                            (S * S).sum(1)[:, None]
                            - 2.0 * (S @ C.T)
                            + (C * C).sum(1)[None, :]
                        )
                        cols[j][valid] = d2.argmin(axis=1).astype(np.int32)
                for j in range(m):
                    out[f"code{j}"] = cols[j]
            else:
                for j in range(m):
                    out[f"code{j}"] = pd.Series([], dtype=np.int32)
            yield pd.DataFrame(out)

    codes = corpus.select(
        F.col(c_id).alias("cid"), _to_double(F.col(vec)).alias("ce")
    ).mapInPandas(encode, code_schema)
    # per-code squared norms, a literal lookup table per subspace
    norm_luts = [
        _lit_darray([sum(x * x for x in c) for c in cb]) for cb in codebooks
    ]

    # query side: LUT_j[c] = <q_sub_j, codebook_j[c]> computed once per
    # query, in the same Arrow GEMM shape as the encode kernel (the
    # literal-expression LUT was another m×n_codes aggregate tree whose
    # analysis cost, not math, dominated)
    lut_schema = T.StructType(
        [T.StructField("qid", qid_type)]
        + [
            T.StructField(f"__lut{j}", T.ArrayType(T.DoubleType()))
            for j in range(m)
        ]
        + [T.StructField("__qn", T.DoubleType())]
    )

    def build_luts(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = {"qid": pdf["qid"]}
            if len(pdf):
                valid = np.array([v is not None for v in pdf["qe"]])
                luts = {j: np.full(len(pdf), None, dtype=object) for j in range(m)}
                qn = np.full(len(pdf), None, dtype=object)
                if valid.any():
                    V = np.array(
                        [np.asarray(v, np.float64) for v in pdf["qe"][valid]]
                    )
                    qn[valid] = np.sqrt((V * V).sum(1))
                    for j, C in enumerate(CBS):
                        L = V[:, j * sub : (j + 1) * sub] @ C.T
                        # 1-D object wrapper: a bare 2-D assign would try
                        # to broadcast into the boolean mask
                        rows = np.empty(len(L), dtype=object)
                        rows[:] = [r.tolist() for r in L]
                        luts[j][valid] = rows
                for j in range(m):
                    out[f"__lut{j}"] = luts[j]
                out["__qn"] = qn
            else:
                for j in range(m):
                    out[f"__lut{j}"] = pd.Series([], dtype=object)
                out["__qn"] = pd.Series([], dtype=np.float64)
            yield pd.DataFrame(out)

    q = queries.select(
        F.col(q_id).alias("qid"), _to_double(F.col(vec)).alias("qe")
    ).mapInPandas(build_luts, lut_schema)

    # ADC scan: approx cos = Σ_j LUT_j[code_j] / (||q|| * sqrt(Σ_j ||cb_j[code_j]||²))
    approx_dot = sum(
        (F.element_at(F.col(f"__lut{j}"), F.col(f"code{j}") + 1) for j in range(m)),
        start=F.lit(0.0),
    )
    approx_nsq = sum(
        (F.element_at(norm_luts[j], F.col(f"code{j}") + 1) for j in range(m)),
        start=F.lit(0.0),
    )
    adc_denom = F.col("__qn") * F.sqrt(approx_nsq)
    scored = q.crossJoin(codes).select(
        "qid",
        "cid",
        F.when(adc_denom > F.lit(0.0), approx_dot / adc_denom)
        .otherwise(F.lit(0.0))
        .alias("approx_cos"),
    )
    w = W.partitionBy("qid").orderBy(F.col("approx_cos").desc(), F.col("cid"))
    cand = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n_rerank)
        .select("qid", "cid")
    )

    # exact re-rank on the surviving candidates only
    qv = queries.select(F.col(q_id).alias("qid"), _to_double(F.col(vec)).alias("qe"))
    cv = corpus.select(F.col(c_id).alias("cid"), _to_double(F.col(vec)).alias("ce"))
    exact = (
        cand.join(qv, "qid")
        .join(cv, "cid")
        .select(
            "qid",
            "cid",
            _cosine(F.col("qe"), F.col("ce")).alias("cos"),
        )
    )
    w2 = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        exact.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


@query("l3e_pq_ann", category="pipeline-similarity")
def pq_ann_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN (8×16 codebooks, ADC scan, exact re-rank;
    approximate → rows-only; recall asserted in tests)."""
    e = load_table(spark, sf_dir, "embeddings")
    return pq_topk(
        e.filter(F.col("vec_id") < 20),
        e.filter(F.col("vec_id") >= 20),
        "vec_id",
        "vec_id",
        "embedding",
        k=5,
    ).orderBy("qid", "cid")


# ---------------------------------------------------------------------------
# L3f — int8-quantized similarity scan (the oracle-checkable ANN tier)
# ---------------------------------------------------------------------------


def _q8(vec: Column) -> Column:
    """Symmetric int8 quantization (l13 scheme): floor(x·127/max|x| + 0.5),
    promoted to double before multiplying — bit-identical across engines."""
    v = _to_double(vec)
    scale = F.lit(127.0) / F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-12)
    )
    return F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("bigint"))


@query(
    "l3f_int8_topk",
    oracle="""
WITH q8 AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(FLOOR(
           CAST(x AS DOUBLE) * (127.0 / GREATEST(
             list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))), 1e-12))
           + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), q AS (
  SELECT vec_id AS qid, qv AS qe FROM q8 WHERE vec_id < 20
), c AS (
  SELECT vec_id AS cid, qv AS ce FROM q8 WHERE vec_id >= 20
), scored AS (
  SELECT qid, cid,
         CASE WHEN (sqrt(CAST(CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS DOUBLE))
                    * sqrt(CAST(CAST(list_sum(list_transform(ce, x -> x * x)) AS BIGINT) AS DOUBLE))) > 0
              THEN CAST(CAST(list_sum(list_transform(list_zip(qe, ce), p -> p[1] * p[2]))
                   AS BIGINT) AS DOUBLE)
                   / (sqrt(CAST(CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS DOUBLE))
                      * sqrt(CAST(CAST(list_sum(list_transform(ce, x -> x * x)) AS BIGINT) AS DOUBLE)))
              ELSE 0.0 END AS cos_q8
  FROM c, q
)
SELECT qid, cid, cos_q8 FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_q8 DESC, cid) <= 5
""",
    category="pipeline-similarity",
)
def int8_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 by cosine over int8-quantized vectors — the memory-bandwidth
    ANN tier between full precision (l3) and PQ codes (l3e): 4× smaller
    vectors, integer multiply-accumulate scoring, ~no recall loss at int8.
    Unlike the sketch-based tiers this one is fully ORACLE-CHECKED: the
    quantization rounding (l13 scheme) and the int64 dot products are
    exact on both engines, and the only floats are sqrt/division of
    exact integers, evaluated in the same order. Same broadcast-query
    map-side scan shape as l3; at 100 TB compose with the IVF router
    (l3c) exactly like l3e."""
    e = load_table(spark, sf_dir, "embeddings")
    q8 = e.select("vec_id", _q8(F.col("embedding")).alias("qv"))
    q = F.broadcast(
        q8.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("qid"), F.col("qv").alias("qe")
        )
    )
    c = q8.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("ce")
    )
    idot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ce"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    inorm = lambda col: F.sqrt(
        F.aggregate(
            col, F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
        ).cast("double")
    )
    int8_denom = inorm(F.col("qe")) * inorm(F.col("ce"))
    scored = c.crossJoin(q).select(
        "qid",
        "cid",
        F.when(int8_denom > F.lit(0.0), idot.cast("double") / int8_denom)
        .otherwise(F.lit(0.0))
        .alias("cos_q8"),
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_q8").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .drop("rnk")
    )


# ---------------------------------------------------------------------------
# L28 — semantic dedup (cluster-then-prune, SemDeDup-style)
# ---------------------------------------------------------------------------

_SEM_TAU = 0.2  # cosine threshold: same-cluster pairs at/above it are dups
_SEM_PLANES = None  # lazily built: one SRP table, 6 bits → 64 clusters


def _sem_planes() -> list[list[float]]:
    global _SEM_PLANES
    if _SEM_PLANES is None:
        _SEM_PLANES = _hyperplanes(64)[0]
    return _SEM_PLANES


_SEM_TARGET_BUCKET_ROWS = 75  # hold Σ bucket² work ≈ linear: rows/bucket const


def _sem_n_bits(n_rows: int) -> int:
    """Corpus-adaptive SRP bit count: enough bits that the EXPECTED bucket
    population stays ≈ _SEM_TARGET_BUCKET_ROWS, floored at the 6 bits the
    inlined oracle planes use. At every driver fixture scale (≤2000
    vectors) this returns exactly 6, so the hash-checked oracle is
    untouched; the growth only engages beyond fixture scale — the sf10
    smoke caught the fixed-6-bit cliff this rule removes (bucket sizes
    grew 100× → Σ bucket² went quadratic)."""
    import math

    if n_rows <= 0:
        return 6
    return max(6, math.ceil(math.log2(max(n_rows / _SEM_TARGET_BUCKET_ROWS, 1.0))))


def _sem_planes_n(n_bits: int) -> list[list[float]]:
    """First 6 planes = the shared oracle planes (one source of truth);
    additional bits extend them with a second fixed seed — deterministic
    at any corpus size, and a 6-bit bucket is always a prefix of the
    wider bucket (plane i keeps bit position i)."""
    base = _sem_planes()
    if n_bits <= len(base):
        return base
    dim = len(base[0])
    rng = np.random.RandomState(_PLANE_SEED + 7919)
    return base + rng.standard_normal((n_bits - len(base), dim)).tolist()


def _sem_bucket_sql(e_col: str) -> str:
    """DuckDB expression computing the SAME 6-bit SRP bucket as
    ``_srp_bucket`` — the plane constants are inlined from the one shared
    Python source of truth, so Spark and the oracle hash identical planes."""
    bits = []
    for i, plane in enumerate(_sem_planes()):
        consts = ", ".join(repr(float(x)) for x in plane)
        dot = (
            f"list_sum(list_transform(list_zip({e_col}, [{consts}]),"
            " p -> p[1] * p[2]))"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(bits)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    n_planes: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster embeddings, then drop any
    vector whose cosine to a LOWER-id vector in the same cluster is ≥ tau
    (keep-first within each ε-ball). The cluster stage here is a
    deterministic signed-random-projection bucketing — the fixed-seed,
    oracle-reproducible stand-in for the k-means coarse quantizer the
    published recipe uses (see ``_kmeans_centroids`` for that path).

    Scale shape: bucketing is one narrow projection (no shuffle); the
    pairwise stage is a self-equi-join on the cluster id, so cost is
    Σ bucket², never corpus² — and as of round 5 the bit count actually
    GROWS with log₂(corpus) by default (``n_planes=None`` → one count()
    job → ``_sem_n_bits``), holding bucket populations ≈ constant. The
    round-5 sf10 smoke measured the fixed-6-bit version going quadratic
    at 200k vectors (every bucket 100× denser); at all driver fixture
    scales the adaptive rule still yields exactly 6 bits, so the inlined-
    plane oracle is unaffected. AQE skew-join splits any residual hot
    bucket. The keep-rule needs only lower-id neighbors, not the
    transitive dup closure, so one join round suffices — no iteration."""
    if n_planes is None:
        n_planes = _sem_n_bits(corpus.count())
    planes = _sem_planes_n(n_planes)
    v = corpus.select(
        F.col(id_col).alias("vec_id"),
        _to_double(F.col(vec_col)).alias("e"),
        _srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a = v.select("bucket", F.col("vec_id").alias("v1"), F.col("e").alias("e1"))
    b = v.select("bucket", F.col("vec_id").alias("v2"), F.col("e").alias("e2"))
    drops = (
        a.join(b, "bucket")
        .filter(F.col("v1") < F.col("v2"))
        .filter(_cosine(F.col("e1"), F.col("e2")) >= F.lit(tau))
        .select(F.col("v2").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return v.join(drops, "vec_id", "left").select(
        "vec_id", "bucket", F.col("dropped").isNull().alias("kept")
    )


def _sem_dedup_oracle() -> str:
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), b AS (
  SELECT vec_id, e, CAST({_sem_bucket_sql("e")} AS BIGINT) AS bucket FROM v
), drops AS (
  SELECT DISTINCT b2.vec_id
  FROM b b1 JOIN b b2 ON b1.bucket = b2.bucket AND b1.vec_id < b2.vec_id
  WHERE (sqrt(list_sum(list_transform(b1.e, x -> x * x)))
         * sqrt(list_sum(list_transform(b2.e, x -> x * x)))) > 0
    AND list_sum(list_transform(list_zip(b1.e, b2.e), p -> p[1] * p[2]))
        / (sqrt(list_sum(list_transform(b1.e, x -> x * x)))
           * sqrt(list_sum(list_transform(b2.e, x -> x * x)))) >= {_SEM_TAU}
)
SELECT b.vec_id, b.bucket, d.vec_id IS NULL AS kept
FROM b LEFT JOIN drops d ON b.vec_id = d.vec_id
"""


@query("l28_semantic_dedup", oracle=_sem_dedup_oracle(), category="pipeline-similarity")
def semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup over the embeddings table: SRP-cluster then
    keep-lowest-id within each cosine-ε ball (exact oracle — the SRP planes
    are inlined into the SQL from the same constants Spark uses)."""
    e = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(e, "vec_id", "embedding", _SEM_TAU)


# ---------------------------------------------------------------------------
# L3g/L3h/L3i — persisted ANN index: build once / probe many / refresh
# (r03 verdict "what's missing" #2: the ANN tiers re-trained per query call)
# ---------------------------------------------------------------------------

_ANN_INDEX_DDL = "cid long, cluster long, ce array<double>"


_ANN_ADAPTIVE_MIN_ROWS = 4096  # below this, 8 coarse clusters suffice


def _ann_n_clusters(n_rows: int) -> int:
    """IVF coarse-quantizer sizing: 8 clusters up to ~4k vectors (the
    driver fixtures — keeps every registered plan/census/recall test
    byte-stable), √N beyond (the FAISS guidance: √N clusters of √N rows
    each, so probe candidate sets and per-task memory stay ~√N). The
    round-5 sf10 smoke measured why: 200k vectors in 8 fixed clusters
    put 25k rows in every probed cluster and sent the kNN-graph to ~10B
    candidate pairs; √N sizing cuts that to ~180M."""
    import math

    if n_rows <= _ANN_ADAPTIVE_MIN_ROWS:
        return 8
    return math.ceil(math.sqrt(n_rows))


def build_ann_index(
    spark: SparkSession,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    table: str,
    n_clusters: int | None = None,
) -> int:
    """Train the IVF coarse quantizer ONCE and persist the whole index as
    a snapshot-log table: assignments (cid, cluster, vector) PARTITIONED
    BY CLUSTER (composing the key-range table format — each cluster's
    rows live in their own data file, so a probe opens only the probed
    clusters' files via manifest stats), centroids in the manifest
    metadata (k×dim floats — KBs at any corpus size, exactly what fits in
    table metadata). Probes then run against the committed snapshot with
    zero training jobs, and refreshes append to it incrementally — the
    build/probe split every repeated-query pipeline needs, same shape as
    FAISS's train()/add()/search() but as lake tables. ``n_clusters=None``
    → ``_ann_n_clusters`` (√N beyond fixture scale); past fixture scale
    the quantizer trains on a deterministic ~50·k-row hash sample (the
    FAISS train-on-sample rule — Lloyd's converges on the sample's
    distribution, and the full corpus is only touched by the single
    assignment pass), and the corpus is repartitioned to the session's
    parallelism first, because the assignment stage is COMPUTE-bound
    (k·dim flops/row) and would otherwise inherit however few partitions
    the scan produced — the round-5 sf10 smoke measured a 400s build and
    a 4-task stall exactly here."""
    train = corpus
    if n_clusters is None:
        n = corpus.count()
        n_clusters = _ann_n_clusters(n)
        if n > _ANN_ADAPTIVE_MIN_ROWS:
            corpus = corpus.repartition(spark.sparkContext.defaultParallelism)
            target = 50 * n_clusters
            if n > 2 * target:
                m = n // target
                train = corpus.filter(
                    F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(m)) == 0
                )
            else:
                train = corpus
    centroids = _kmeans_centroids(train, vec_col, n_clusters)
    if centroids:
        assigned = _assign_nearest(corpus, vec_col, centroids).select(
            F.col(id_col).cast("long").alias("cid"),
            F.col("__cluster").cast("long").alias("cluster"),
            _to_double(F.col(vec_col)).alias("ce"),
        )
    else:  # empty corpus: commit an empty index (probes return nothing)
        assigned = corpus.select(
            F.col(id_col).cast("long").alias("cid"),
            F.lit(0).cast("long").alias("cluster"),
            _to_double(F.col(vec_col)).alias("ce"),
        )
    import shutil

    from ..plans.lakehouse import create_partitioned

    shutil.rmtree(table, ignore_errors=True)
    return create_partitioned(
        spark,
        assigned,
        table,
        _ANN_INDEX_DDL,
        "cluster",
        n_buckets=max(n_clusters, 1),
        extra={"centroids": centroids},
    )


def _nearest_clusters(q: DataFrame, centroids: list[list[float]], n_probe: int) -> DataFrame:
    """(qid, qe, cluster): each query row exploded to its n_probe nearest
    centroids. Small k folds centroid literals into the plan (no training,
    no extra job); large k maps the broadcast centroid-matrix cell to
    (d, cl) structs and sorts — same output, O(1) plan size."""
    if len(centroids) <= _MAX_LITERAL_CENTROIDS:
        # indexed transform over the literal centroid matrix (see
        # _assign_nearest): identical (d, cl) structs and array_sort tie
        # order, one lambda + one py4j literal step instead of k×dim
        # round trips (r11 cProfile: 2.6 s of l3h's 3.0 s was py4j)
        dists = F.transform(
            _lit_dmatrix(centroids),
            lambda cen, i: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("qe"), cen, lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                i.cast("long").alias("cl"),
            ),
        )
        return q.withColumn(
            "__probes", F.slice(F.array_sort(dists), 1, n_probe)
        ).select("qid", "qe", F.explode(F.col("__probes.cl")).alias("cluster"))
    # large k: same GEMM kernel as _assign_nearest, keeping the n_probe
    # smallest distances per row. Stable argsort → equal distances keep
    # the lower cluster id, matching the struct-sort (d, cl) tie rule.
    # Null vectors are masked out (they can never verify as neighbors),
    # and qid keeps its INPUT type — the literal-centroid path above is
    # id-type-generic and the kernel must not narrow that contract.
    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    take = min(n_probe, len(centroids))
    qid_type = q.select(F.col("qid")).schema[0].dataType
    schema = T.StructType(
        [
            T.StructField("qid", qid_type),
            T.StructField("qe", T.ArrayType(T.DoubleType())),
            T.StructField("cluster", T.LongType()),
        ]
    )

    def route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"qid": [], "qe": [], "cluster": []}
            if len(pdf):
                valid = np.array([v is not None for v in pdf["qe"]])
                if valid.any():
                    sub = pdf[valid]
                    Q = np.array([np.asarray(v, np.float64) for v in sub["qe"]])
                    d2 = (Q * Q).sum(1)[:, None] - 2.0 * (Q @ C.T) + c2[None, :]
                    probes = np.argsort(d2, axis=1, kind="stable")[:, :take]
                    for i, (qid, qe) in enumerate(zip(sub["qid"], sub["qe"])):
                        for cl in probes[i]:
                            out["qid"].append(qid)
                            out["qe"].append(qe)
                            out["cluster"].append(int(cl))
            # explicit dtypes: a batch whose rows were ALL null-masked
            # yields empty columns, which pandas defaults to float64 and
            # Arrow then refuses to cast to array<double>/the id type
            yield pd.DataFrame(
                {
                    "qid": pd.Series(out["qid"], dtype="object"),
                    "qe": pd.Series(out["qe"], dtype="object"),
                    "cluster": pd.Series(out["cluster"], dtype="int64"),
                }
            )

    return q.mapInPandas(route, schema)


def probe_ann_index(
    spark: SparkSession,
    table: str,
    queries: DataFrame,
    q_id: str,
    vec_col: str,
    k: int,
    n_probe: int = 2,
) -> DataFrame:
    """Search the PREBUILT index: route each query to its n_probe nearest
    stored centroids (plan literals from the manifest — no k-means jobs
    anywhere in this plan), open only the data files whose cluster span
    intersects the probed set (manifest file skipping), equi-join on
    cluster, exact-cosine re-rank. Per-query cost ∝ probed clusters'
    rows; index cost paid once at build time."""
    import os

    from ..plans.lakehouse import read_manifest

    man = read_manifest(table)
    centroids = man.get("centroids") or []
    empty = spark.createDataFrame([], "qid long, cid long, cos double")
    if not centroids or not man["files"]:
        return empty
    q = _nearest_clusters(
        queries.select(
            F.col(q_id).cast("long").alias("qid"),
            _to_double(F.col(vec_col)).alias("qe"),
        ),
        centroids,
        n_probe,
    )
    return _bucket_join_topk(spark, table, man, q, "cluster", k)


def _bucket_join_topk(
    spark: SparkSession, table: str, man: dict, q: DataFrame, route_col: str, k: int
) -> DataFrame:
    """The shared index-probe tail: prune the index's data files to the
    routed bucket/cluster set (manifest stats — skipped files are never
    opened), equi-join queries to stored vectors on the routing column,
    exact-cosine re-rank, per-query top-k. ``q`` = (qid, qe, route_col)."""
    import os

    empty = spark.createDataFrame([], "qid long, cid long, cos double")
    # the routed set is ≤ the bucket count — the only driver transfer
    probed = sorted(r[0] for r in q.select(route_col).distinct().collect())
    if not probed:
        return empty
    stats = man["stats"]
    keep = [
        f
        for f in man["files"]
        if stats[f]["min"] is None
        or any(stats[f]["min"] <= c <= stats[f]["max"] for c in probed)
    ]
    if not keep:
        return empty
    c = spark.read.schema(man["schema"]).parquet(
        *[os.path.join(table, f) for f in keep]
    )
    # broadcast the QUERY side: its smallness is invariant (a bounded
    # probe batch), while the pruned index side grows with the corpus —
    # at fixture scale the planner would happily broadcast the corpus
    # instead, which inverts at 100 TB
    scored = c.join(F.broadcast(q), route_col).select(
        "qid", "cid", _cosine(F.col("qe"), F.col("ce")).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def refresh_ann_index(
    spark: SparkSession,
    table: str,
    new_vectors: DataFrame,
    id_col: str,
    vec_col: str,
) -> int:
    """Incremental index maintenance: assign ONLY the new vectors to the
    existing centroids (read from the manifest — no retraining) and
    APPEND their files; every existing file is carried forward untouched.
    Cost ∝ |new batch|, the l2f daily-ingest shape applied to ANN.
    Centroids drift as the corpus grows — a periodic full build (l3g) is
    the rebalance job, exactly FAISS's retrain-when-distribution-shifts
    guidance."""
    from ..plans.lakehouse import append_partitioned, read_manifest

    centroids = read_manifest(table).get("centroids") or []
    if not centroids:
        raise ValueError(f"index {table!r} has no trained centroids to assign against")
    assigned = _assign_nearest(new_vectors, vec_col, centroids).select(
        F.col(id_col).cast("long").alias("cid"),
        F.col("__cluster").cast("long").alias("cluster"),
        _to_double(F.col(vec_col)).alias("ce"),
    )
    return append_partitioned(spark, table, assigned)


def _ann_corpus(spark, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") >= 20), e.filter(F.col("vec_id") < 20)


def _ensure_ann_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build-on-miss: reuse the committed index iff its row
    census still matches the corpus (stale/foreign scratch → rebuild)."""
    from ..plans.lakehouse import current_version, read_manifest
    from ..sources.io import _scratch

    table = _scratch(sf_dir, "l3g_ann_index")
    corpus, _ = _ann_corpus(spark, sf_dir)
    n = corpus.count()
    if current_version(table) > 0:
        man = read_manifest(table)
        if "centroids" in man and sum(
            man["stats"][f]["rows"] for f in man["files"]
        ) == n:
            return table
    build_ann_index(spark, corpus, "vec_id", "embedding", table)
    return table


@query("l3g_ann_index_build", category="pipeline-similarity")
def ann_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index BUILD job: train + persist the IVF index table, return
    its per-cluster census (the partition histogram an operator watches
    for skew). Rows-only: k-means structure is engine-specific; the
    probe path's recall is property-tested against brute force."""
    from ..plans.lakehouse import read_snapshot
    from ..sources.io import _scratch

    corpus, _ = _ann_corpus(spark, sf_dir)
    table = _scratch(sf_dir, "l3g_ann_index")
    build_ann_index(spark, corpus, "vec_id", "embedding", table)
    return (
        read_snapshot(spark, table)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cluster")
    )


@query("l3h_ann_index_probe", category="pipeline-similarity")
def ann_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index PROBE job: top-5 neighbors for each query vector against
    the PREBUILT committed index — no training in this plan (pytest
    proves the trainer is never invoked on the probe path), files opened
    only for probed clusters. Rows-only + recall-vs-brute-force test."""
    table = _ensure_ann_index(spark, sf_dir)
    _, q = _ann_corpus(spark, sf_dir)
    return probe_ann_index(spark, table, q, "vec_id", "embedding", k=5).orderBy(
        "qid", "cid"
    )


@query("l3i_ann_index_refresh", category="pipeline-similarity")
def ann_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index REFRESH job: build the index WITHOUT the 10 highest-id
    corpus vectors, append them via refresh (no existing file rewritten —
    property-tested), then probe with those same vectors: each must now
    be discoverable in the index (its own top hit at cos 1.0)."""
    from ..sources.io import _scratch

    e = load_table(spark, sf_dir, "embeddings")
    hi = e.agg(F.max("vec_id")).first()[0]
    if hi is None:  # empty fixture: nothing to index or refresh
        return spark.createDataFrame([], "qid long, cid long, cos double")
    boundary = hi - 9
    old = e.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < boundary))
    new = e.filter(F.col("vec_id") >= boundary)
    table = _scratch(sf_dir, "l3i_ann_index")
    build_ann_index(spark, old, "vec_id", "embedding", table)
    refresh_ann_index(spark, table, new, "vec_id", "embedding")
    return probe_ann_index(spark, table, new, "vec_id", "embedding", k=3).orderBy(
        "qid", "cid"
    )


# ---------------------------------------------------------------------------
# L3j — SRP persisted index: the fully ORACLE-CHECKED index tier
# ---------------------------------------------------------------------------

_SRP_INDEX_DDL = "cid long, bucket long, ce array<double>"


def build_srp_index(
    spark: SparkSession, corpus: DataFrame, id_col: str, vec_col: str, table: str
) -> int:
    """Persist a signed-random-projection index: every corpus vector's
    6-bit SRP bucket (the SAME fixed-seed planes l28 shares, so the
    clustering itself is oracle-reproducible), committed as a snapshot-log
    table partitioned BY BUCKET. Deterministic counterpart of the k-means
    index (l3g) — no training stage at all, so build cost is one
    projection pass and the whole build+probe lifecycle is exactly
    checkable against SQL, which no sketch-seeded tier can offer."""
    import shutil

    from ..plans.lakehouse import create_partitioned

    planes = _sem_planes()
    idx = corpus.select(
        F.col(id_col).cast("long").alias("cid"),
        _srp_bucket(F.col(vec_col), planes).alias("bucket"),
        _to_double(F.col(vec_col)).alias("ce"),
    )
    shutil.rmtree(table, ignore_errors=True)
    return create_partitioned(spark, idx, table, _SRP_INDEX_DDL, "bucket", n_buckets=16)


def probe_srp_index(
    spark: SparkSession, table: str, queries: DataFrame, q_id: str, vec_col: str, k: int
) -> DataFrame:
    """Search the persisted SRP index: bucket each query with the same
    plane literals (no state beyond the committed table), open only the
    matching buckets' files, exact-cosine top-k inside the bucket."""
    from ..plans.lakehouse import read_manifest

    man = read_manifest(table)
    if not man["files"]:
        return spark.createDataFrame([], "qid long, cid long, cos double")
    planes = _sem_planes()
    q = queries.select(
        F.col(q_id).cast("long").alias("qid"),
        _to_double(F.col(vec_col)).alias("qe"),
        _srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    return _bucket_join_topk(spark, table, man, q, "bucket", k)


def _srp_probe_oracle() -> str:
    cos = (
        "CASE WHEN (sqrt(list_sum(list_transform(qe, x -> x * x)))"
        " * sqrt(list_sum(list_transform(ce, x -> x * x)))) > 0"
        " THEN list_sum(list_transform(list_zip(qe, ce), p -> p[1] * p[2]))"
        " / (sqrt(list_sum(list_transform(qe, x -> x * x)))"
        " * sqrt(list_sum(list_transform(ce, x -> x * x))))"
        " ELSE 0.0 END"
    )
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), b AS (
  SELECT vec_id, e, CAST({_sem_bucket_sql("e")} AS BIGINT) AS bucket FROM v
), q AS (
  SELECT vec_id AS qid, e AS qe, bucket FROM b WHERE vec_id < 20
), c AS (
  SELECT vec_id AS cid, e AS ce, bucket FROM b WHERE vec_id >= 20
), scored AS (
  SELECT qid, cid, {cos} AS cos
  FROM q JOIN c USING (bucket)
)
SELECT qid, cid, cos FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) <= 5
"""


@query("l3j_srp_index_probe", oracle=_srp_probe_oracle(), category="pipeline-similarity")
def srp_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the persisted SRP index then probe it — end-to-end ORACLE-
    CHECKED: the plane constants are inlined into the SQL from the one
    Python source of truth (l28's trick), so bucketing, file routing,
    candidate sets, cosines, and tie-broken top-5 all hash-match DuckDB.
    The exactness witness for the whole persisted-index machinery: any
    routing/pruning bug in the lakehouse-backed index path breaks this
    hash, not just a recall curve."""
    from ..sources.io import _scratch

    corpus, q = _ann_corpus(spark, sf_dir)
    table = _scratch(sf_dir, "l3j_srp_index")
    build_srp_index(spark, corpus, "vec_id", "embedding", table)
    return probe_srp_index(spark, table, q, "vec_id", "embedding", k=5)


# ---------------------------------------------------------------------------
# L3k — all-pairs embedding kNN-graph through the persisted index
# (r04 verdict "What's missing" #2: corpus↔corpus top-k neighbors — the
# retrieval shape behind global semantic dedup and cluster balancing)
# ---------------------------------------------------------------------------


def knn_graph(
    spark: SparkSession, table: str, k: int, n_probe: int = 2
) -> DataFrame:
    """Approximate kNN-GRAPH over the stored corpus itself: every indexed
    vector is routed to its ``n_probe`` nearest centroids (plan literals
    from the manifest — no training jobs anywhere in this plan), candidates
    are generated by an EQUI-JOIN on the cluster id between the routed
    corpus and the stored assignments, and each vector keeps its top-k
    exact-cosine neighbors, self excluded. A vector's own cluster is by
    construction among its probes (it was assigned to the nearest
    centroid), so same-cluster neighbors — the bulk of true top-k mass —
    are always candidates.

    Scale shape: unlike the query-batch probe (l3h), NEITHER side is
    broadcastable — both are the corpus — so candidates are generated by
    cogrouping members and probes PER CLUSTER and scoring each cluster's
    block with one numpy GEMM (normalize → Q̂·M̂ᵀ), per-probe top-k inside
    the kernel, then a global window merges the ≤ n_probe·k candidates
    per vector. The first sf10 run scored pairs with the expression-tree
    cosine instead: higher-order functions never enter codegen, and 180M
    interpreted zip_with/aggregate evals pinned 22 tasks for 15+ minutes
    — the blocked-GEMM kernel does the same 23 GFLOP in seconds, which
    is why l3d uses it too. Candidate volume is Σ_c |c|·|probes into c|
    ≈ (n_probe/n_clusters)·N²; with the √N sizing rule each cluster
    holds ~√N rows so every cogroup block is ~√N×√N — bounded kernel
    memory at any corpus size. Routing is repartitioned to session
    parallelism past the literal-centroid cap (the scan is MBs but the
    routing math is k·dim flops/row — measured 4-task stall otherwise).
    Per-cluster top-k then global top-k is exact: a stored vector
    belongs to exactly one cluster, so candidate sets across probed
    clusters are disjoint. Tie handling: within the argpartition window
    ties rank by lower cid; WHICH equally-scored candidates enter the
    window at the partition boundary is positional — deterministic
    (members are cid-sorted first, so reruns and repartitionings agree)
    but not globally lowest-cid, the standard ANN top-k relaxation."""
    from ..plans.lakehouse import read_manifest, read_snapshot

    man = read_manifest(table)
    centroids = man.get("centroids") or []
    empty = spark.createDataFrame([], "qid long, cid long, cos double")
    if not centroids or not man["files"]:
        return empty
    stored = read_snapshot(spark, table)
    if len(centroids) > _MAX_LITERAL_CENTROIDS:
        stored = stored.repartition(spark.sparkContext.defaultParallelism)
    routed = _nearest_clusters(
        stored.select(F.col("cid").alias("qid"), F.col("ce").alias("qe")),
        centroids,
        n_probe,
    )

    _CHUNK = 2048  # probe rows per GEMM block: caps the cos matrix at
    # chunk × |cluster| cells even in a skewed cluster (the sf10 smoke
    # hit a 14k-probe × 6.9k-member group — a 795 MB matrix and a full
    # per-row sort cost 157 s; chunked argpartition does it in seconds)

    def score_cluster(key, members: pd.DataFrame, probes: pd.DataFrame) -> pd.DataFrame:
        empty_pdf = pd.DataFrame({"qid": [], "cid": [], "cos": []})
        # null vectors never verify as neighbors (the index stores them
        # under a null cluster, but a corrupt/partial snapshot could leak
        # one here) — mask them like every sibling Arrow kernel does
        if len(members):
            members = members[[v is not None for v in members["ce"]]]
        if len(probes):
            probes = probes[[v is not None for v in probes["qe"]]]
        if not len(members) or not len(probes):
            return empty_pdf
        # deterministic base order: group-row arrival order depends on the
        # shuffle, and argpartition's boundary-tie choice is positional
        members = members.sort_values("cid")
        M = np.array([np.asarray(v, np.float64) for v in members["ce"]])
        cids = members["cid"].to_numpy()

        def unit(A):
            n = np.linalg.norm(A, axis=1, keepdims=True)
            n[n == 0] = 1.0  # zero-norm → cos 0, the house convention
            return A / n

        Mh = unit(M).T
        m = len(cids)
        kk = min(k + 1, m)  # +1 absorbs the (single) self candidate
        frames = []
        for lo in range(0, len(probes), _CHUNK):
            chunk = probes.iloc[lo : lo + _CHUNK]
            qids = chunk["qid"].to_numpy()
            cos = unit(
                np.array([np.asarray(v, np.float64) for v in chunk["qe"]])
            ) @ Mh
            # top-kk per row WITHOUT a full sort (argpartition is O(m));
            # then rank only the kk survivors by (-cos, cid)
            if kk < m:
                part = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
            else:
                part = np.broadcast_to(np.arange(m), cos.shape).copy()
            cosk = np.take_along_axis(cos, part, axis=1)
            cidk = cids[part]
            cosk[cidk == qids[:, None]] = -np.inf  # self-exclusion
            width = min(k, kk)
            order = np.lexsort((cidk, -cosk), axis=1)[:, :width]
            selc = np.take_along_axis(cosk, order, axis=1).ravel()
            seli = np.take_along_axis(cidk, order, axis=1).ravel()
            keep = selc > -np.inf
            frames.append(
                pd.DataFrame(
                    {
                        "qid": np.repeat(qids, width)[keep],
                        "cid": seli[keep],
                        "cos": selc[keep],
                    }
                )
            )
        return pd.concat(frames) if frames else empty_pdf

    scored = (
        stored.groupBy("cluster")
        .cogroup(routed.groupBy("cluster"))
        .applyInPandas(score_cluster, "qid long, cid long, cos double")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


@query("l3k_knn_graph", category="pipeline-similarity")
def knn_graph_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 neighbor graph of the whole indexed corpus via the persisted
    l3g index (built on miss, reused when fresh — same idempotence as
    l3h). Rows-only: k-means cluster structure is engine-specific; the
    graph's recall against brute-force all-pairs truth and the train-free
    probe plan are pytest-pinned (mirroring l3h's contract)."""
    table = _ensure_ann_index(spark, sf_dir)
    return knn_graph(spark, table, k=3).orderBy("qid", "cid")


# ---------------------------------------------------------------------------
# L31 — distributed k-means with a full SQL training replay (ML family)
# ---------------------------------------------------------------------------

_KM_K = 5
_KM_ITERS = 3
_KM_Q = "1000000.0"  # micro-unit grid shared with l30 (see SURVEY §2.12)


def _km_d2_sql(c: str) -> str:
    """Quantized squared distance: each per-dimension term is floored to
    integer micro-units BEFORE the sum, so the distance is an exact
    BIGINT — independent of summation order in either engine."""
    return (
        f"CAST(SUM(CAST(FLOOR(((p.x - {c}.cx) * (p.x - {c}.cx)) * {_KM_Q} + 0.5) "
        f"AS BIGINT)) AS BIGINT)"
    )


def _km_assign_sql(name: str, cent: str) -> str:
    return f"""{name} AS MATERIALIZED (
  SELECT vec_id, cluster, d2 FROM (
    SELECT p.vec_id, c.cluster, {_km_d2_sql('c')} AS d2
    FROM km_pts p JOIN {cent} c ON p.d = c.d
    GROUP BY p.vec_id, c.cluster)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)"""


def _km_oracle() -> str:
    ctes = [
        f"""km_base AS MATERIALIZED (
  SELECT vec_id, label, embedding FROM embeddings
  WHERE embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND len(embedding) =
    (SELECT len(embedding) FROM embeddings
     WHERE embedding IS NOT NULL
       AND len(list_filter(embedding, x -> x IS NULL)) = 0
     ORDER BY vec_id LIMIT 1)
)""",
        """km_pts AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM km_base
)""",
        f"""km_seeds AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster
  FROM km_base QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {_KM_K}
)""",
        """km_c0 AS MATERIALIZED (
  SELECT s.cluster, p.d, p.x AS cx FROM km_seeds s JOIN km_pts p USING (vec_id)
)""",
    ]
    prev = "km_c0"
    for t in range(1, _KM_ITERS + 1):
        ctes.append(_km_assign_sql(f"km_a{t}", prev))
        ctes.append(
            f"""km_c{t} AS MATERIALIZED (
  SELECT a.cluster, p.d,
         (CAST(SUM(CAST(FLOOR(p.x * {_KM_Q} + 0.5) AS BIGINT)) AS DOUBLE)
            / {_KM_Q}) / COUNT(*) AS cx
  FROM km_a{t} a JOIN km_pts p USING (vec_id)
  GROUP BY a.cluster, p.d
)"""
        )
        prev = f"km_c{t}"
    ctes.append(_km_assign_sql("km_fin", prev))
    return (
        "WITH "
        + ",\n".join(ctes)
        + """,
km_lbl AS (
  SELECT f.cluster, b.label, COUNT(*) AS n
  FROM km_fin f JOIN km_base b USING (vec_id)
  GROUP BY f.cluster, b.label
),
km_top AS (
  SELECT cluster, label AS top_label FROM km_lbl
  QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY n DESC, label) = 1
)
SELECT f.cluster,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(f.d2) AS BIGINT) AS inertia_micro,
       t.top_label
FROM km_fin f JOIN km_top t USING (cluster)
GROUP BY f.cluster, t.top_label
"""
    )


def _km_d2_col(emb: Column, vals: list[float]) -> Column:
    c = _lit_darray(vals)
    terms = F.zip_with(
        emb,
        c,
        lambda a, b: F.floor(
            ((a.cast("double") - b) * (a.cast("double") - b)) * float(_KM_Q) + 0.5
        ).cast("long"),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


def _km_assign_col(centroids: dict[int, list[float]]) -> Column:
    """argmin(distance) with deterministic tie-break by cluster id: the
    (d2, cluster) struct array's minimum — lexicographic struct compare
    mirrors the oracle's ORDER BY d2, cluster."""
    choices = F.array(
        *[
            F.struct(
                _km_d2_col(F.col("embedding"), vals).alias("d2"),
                F.lit(k).alias("cluster"),
            )
            for k, vals in sorted(centroids.items())
        ]
    )
    return F.array_min(choices)


def kmeans_fit(
    vecs: DataFrame, k: int = _KM_K, iters: int = _KM_ITERS
) -> dict[int, list[float]]:
    """Distributed Lloyd's: each round assigns every vector to its
    nearest centroid (centroids ride into the plan as literals — the
    broadcast model pattern) and reduces per-(cluster, dim) quantized
    component sums with ONE map-side-combinable aggregate; only
    k × dim partial sums (KBs) ever reach the driver, at any corpus
    scale. Distances quantize per-term and means quantize per-component,
    so the fitted centroids are bit-reproducible under any partitioning
    — which is what lets the DuckDB oracle replay the whole fit.
    Clusters that lose all members drop out (both engines agree)."""
    seeds = vecs.orderBy("vec_id").limit(k).select("embedding").collect()
    centroids = {
        i: [float(x) for x in row["embedding"]] for i, row in enumerate(seeds)
    }
    q = float(_KM_Q)
    for _ in range(iters):
        if not centroids:
            break
        best = _km_assign_col(centroids)
        rows = (
            vecs.select(best["cluster"].alias("cluster"), "embedding")
            .select("cluster", F.posexplode("embedding").alias("d", "x"))
            .groupBy("cluster", "d")
            .agg(
                F.sum(
                    F.floor(F.col("x").cast("double") * q + 0.5).cast("long")
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        nxt: dict[int, dict[int, float]] = {}
        for r in rows:
            nxt.setdefault(r["cluster"], {})[r["d"]] = (r["s"] / q) / r["n"]
        centroids = {
            c: [comps[d] for d in sorted(comps)] for c, comps in nxt.items()
        }
    return centroids


@query("l31_kmeans", oracle=_km_oracle(), category="pipeline-similarity")
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embeddings corpus, trained in-engine and
    ORACLE-CHECKED end to end: the DuckDB oracle replays seeding, all
    three assign/update rounds, and the final assignment via unrolled
    MATERIALIZED CTEs, so cluster sizes, exact quantized inertia, and
    majority labels hash-match. This is the coarse-quantizer training
    IVF (l3c) uses, promoted to a first-class verified operator — the
    third member of the quantized-iteration ML family (SURVEY §2.12)."""
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        # element-level nulls would make Spark's fold NULL while SUM in
        # the oracle skips them — exclude such rows identically up front
        .filter(
            F.col("embedding").isNotNull()
            & ~F.exists("embedding", lambda x: x.isNull())
        )
        .select("vec_id", "label", "embedding")
    )
    first = vecs.orderBy("vec_id").limit(1).select(F.size("embedding")).collect()
    schema = "cluster int, n_points long, inertia_micro long, top_label int"
    if not first:
        return spark.createDataFrame([], schema)
    # 5 full passes (seed, 3 Lloyd rounds, final assignment): materialize
    # the filtered projection once
    vecs = materialize(
        vecs.filter(F.size("embedding") == first[0][0]), eager=False
    )
    centroids = kmeans_fit(vecs)
    best = _km_assign_col(centroids)
    fin = vecs.select(
        "vec_id",
        "label",
        best["cluster"].alias("cluster"),
        best["d2"].alias("d2"),
    )
    lbl = fin.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("n"))
    top = lbl.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("cluster").orderBy(F.desc("n"), F.asc("label"))
        ),
    ).filter("rn = 1").select("cluster", F.col("label").alias("top_label"))
    return (
        fin.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("d2").alias("inertia_micro"),
        )
        .join(top, "cluster")
        .select("cluster", "n_points", "inertia_micro", "top_label")
    )
