"""Multimodal column handling (SURVEY.md §2.8 L8 + media plumbing).

Design: media is an opaque ``binary`` column plus a typed metadata struct,
exactly the layout a 100 TB image/audio/video corpus uses in parquet. The
Spark-side plumbing — schema, partition-preserving transforms, Arrow batch
shape through ``mapInPandas`` — is real and tested. The actual codec step
is STUBBED (``decode_media_batch`` with deterministic fake features):
image/audio libraries are not in this container. Swapping the stub for
PIL/torchaudio is a one-function change; nothing upstream or downstream
moves.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..registry import query
from ..session import load_table

# ---------------------------------------------------------------------------
# L8 — array<float> carried intact through relational ops (full oracle)
# ---------------------------------------------------------------------------


@query(
    "l8_multimodal_passthrough",
    oracle="""
SELECT e.vec_id, e.label, d.lang,
       CAST(i AS INTEGER) - 1 AS pos,
       CAST(e.embedding[i] AS DOUBLE) AS val
FROM embeddings e
JOIN documents d ON e.vec_id = d.doc_id
CROSS JOIN UNNEST(generate_series(1, len(e.embedding))) AS t(i)
WHERE e.label IN (1, 3) AND d.lang IN ('en', 'de')
""",
    category="pipeline-multimodal",
)
def multimodal_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding array survives join/filter untouched (no flatten, no
    serde round-trip) — the core guarantee for multimodal columns. Fidelity
    is PROVEN element-wise: the output posexplodes every component (exact
    float32→double widening), since the grading comparator cannot sort
    array cells. The join/filter plan itself carries the intact array."""
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    joined = (
        e.join(d, e.vec_id == d.doc_id)
        .filter(F.col("label").isin(1, 3) & F.col("lang").isin("en", "de"))
        .select("vec_id", "label", "embedding", "lang")
    )
    return joined.select(
        "vec_id",
        "label",
        "lang",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "val"
        ),
    )


# ---------------------------------------------------------------------------
# Media table synthesis + decode stub
# ---------------------------------------------------------------------------

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media corpus derived from documents: binary payload
    = sha256(text) bytes, metadata struct typed like a real media manifest."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.unbase64(F.base64(F.encode(F.sha2(F.col("text"), 256), "utf-8")))
    return d.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("content"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, "png").otherwise("jpeg").alias("format"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.length(F.col("text")).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder (mapInPandas kernel). Real deployments replace the body
    with PIL / ffmpeg / torchaudio decode; the Arrow batch contract
    (pd.DataFrame in → pd.DataFrame matching DECODED_SCHEMA out) is what the
    engine guarantees and tests.

    The fake "feature" is a deterministic function of the payload bytes so
    results are stable across partitionings.
    """
    for pdf in batches:
        feats = []
        for content in pdf["content"]:
            h = hashlib.sha256(bytes(content)).digest()
            feats.append(np.frombuffer(h[:32], dtype=np.uint8).astype(np.float32) / 255.0)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "format": [m["format"] for m in pdf["meta"]],
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "feature": feats,
            }
        )


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode over partitions; no shuffle, schema fixed."""
    return df.mapInPandas(decode_media_batch, DECODED_SCHEMA)


@query("mm_decode_features", category="pipeline-multimodal")
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary+metadata → mapInPandas decode stub → per-format feature stats.
    (Python-defined features → rows-only check; determinism tested in CI.)"""
    decoded = decode_media(media_table(spark, sf_dir))
    return (
        decoded.select(
            "format",
            "n_bytes",
            F.aggregate(
                F.col("feature"), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ).alias("feat_sum"),
        )
        .groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.col("feat_sum").cast("decimal(22,6)")).cast("double").alias("total_activation"),
        )
        .orderBy("format")
    )


@query(
    "mm_metadata_stats",
    oracle="""
SELECT CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
       CAST(MAX(n_chars % 640) AS INTEGER) AS max_width
FROM documents
GROUP BY 1
""",
    category="pipeline-multimodal",
)
def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level stats over the typed metadata struct (no decode needed —
    the point: metadata queries never touch the binary payload at scale)."""
    m = media_table(spark, sf_dir)
    return m.groupBy(F.col("meta.format").alias("format")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("meta.n_bytes").cast("long")).alias("total_bytes"),
        F.max("meta.width").alias("max_width"),
    )


# ---------------------------------------------------------------------------
# MM — frame sampling: 1 media row → N frame rows (video/audio pattern)
# ---------------------------------------------------------------------------

FRAME_BYTES = 16  # stub "frame" stride over the payload

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_off", T.IntegerType()),
    ]
)


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampler (mapInPandas kernel): emits one row per
    FRAME_BYTES-stride of the payload — the 1→N expansion shape of real
    video frame extraction / audio windowing (ffmpeg/torchaudio go here).
    Expansion happens INSIDE the batch iterator, so output batches can
    exceed input batches without any driver involvement, and a long video
    never materializes as one giant row-list on a single executor thread."""
    for pdf in batches:
        ids, fmts, idxs, offs = [], [], [], []
        for media_id, fmt, content in zip(pdf["media_id"], [m["format"] for m in pdf["meta"]], pdf["content"]):
            n = len(bytes(content))
            n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
            for i in range(n_frames):
                ids.append(media_id)
                fmts.append(fmt)
                idxs.append(i)
                offs.append(i * FRAME_BYTES)
        yield pd.DataFrame(
            {"media_id": ids, "format": fmts, "frame_idx": idxs, "frame_off": offs}
        )


@query(
    "mm_frame_sample",
    oracle="""
SELECT CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
       CAST(SUM((64 + 15) // 16) AS BIGINT) AS n_frames,
       CAST(COUNT(*) AS BIGINT) AS n_media
FROM documents
GROUP BY 1
""",
    category="pipeline-multimodal",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample the fake media corpus (payload = 64-byte sha256 hex →
    4 frames each) and aggregate frames/media per format. The Python stage
    is pure plumbing; the frame COUNT is pure arithmetic on payload length,
    so the whole 1→N pipeline is oracle-checkable even though the sampler
    is a stub. Real decoders swap into ``sample_frames_batch`` unchanged."""
    frames = media_table(spark, sf_dir).mapInPandas(sample_frames_batch, FRAME_SCHEMA)
    return frames.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("media_id").alias("n_media"),
    )


# ---------------------------------------------------------------------------
# MM — binaryFile ingest: raw media files → DataFrame with opaque payloads
# ---------------------------------------------------------------------------


def _ensure_media_fixture(spark: SparkSession, sf_dir: str, n_docs: int = 50) -> str:
    """Scratch-FIXTURE synthesis (not part of the operator): materialize one
    raw ``media_<doc_id>.bin`` file per document (payload = hex sha256 of
    its text) for the ``binaryFile`` ingest query to read. Driver-side by
    nature — it plays the role of the external system that produced the
    files — and idempotent by CONTENT, not by file count: a manifest file
    records the sha256 of the SOURCE documents parquet, so a regenerated
    fixture with the same row count can never silently reuse stale media
    files, while an unchanged fixture short-circuits on one small file
    hash (no Spark job, no per-file reads)."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ..sources.io import _scratch

    media_dir = _scratch(sf_dir, "media_files")
    # sibling of the media dir — the binaryFile read would ingest anything
    # placed INSIDE it
    manifest = media_dir.rstrip("/") + ".manifest"
    src = _os.path.join(sf_dir, "documents.parquet")
    h = _hashlib.sha256()
    if _os.path.isdir(src):  # spark-written directory fixture
        for name in sorted(_os.listdir(src)):
            fp = _os.path.join(src, name)
            if _os.path.isfile(fp):
                with open(fp, "rb") as f:
                    h.update(f.read())
    else:
        with open(src, "rb") as f:
            h.update(f.read())
    src_sha = f"{h.hexdigest()}:{n_docs}"
    try:
        with open(manifest) as f:
            if f.read() == src_sha:
                return media_dir
    except FileNotFoundError:
        pass
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < n_docs)
    expected = {
        f"media_{r.doc_id}.bin": r.payload.encode("ascii")
        for r in d.select("doc_id", F.sha2("text", 256).alias("payload")).collect()
    }
    _shutil.rmtree(media_dir, ignore_errors=True)  # stale files would ingest
    _os.makedirs(media_dir, exist_ok=True)
    for name, payload in expected.items():
        with open(_os.path.join(media_dir, name), "wb") as f:
            f.write(payload)
    with open(manifest, "w") as f:  # written LAST: a crash mid-synth re-runs
        f.write(src_sha)
    return media_dir


@query(
    "mm_binary_file_ingest",
    oracle="""
SELECT doc_id AS media_id,
       CAST(64 AS BIGINT) AS n_bytes,
       sha256(sha256(text)) AS payload_sha
FROM documents WHERE doc_id < 50
""",
    category="pipeline-multimodal",
)
def binary_file_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real media-lake entry path: raw files on disk ingested with the
    built-in ``binaryFile`` source (path, length, content as opaque bytes),
    media id recovered from the file name, payload integrity proven by
    hashing the bytes. Payloads are deterministic (hex sha256 of each doc's
    text, 64 bytes), so the oracle recomputes the expected digest with SQL
    alone. At 100 TB: binaryFile splits per FILE (content is one cell) —
    keep shard files ≤ a few hundred MB and let maxPartitionBytes group
    small ones; decode then rides mapInPandas (mm_decode_features)."""
    media_dir = _ensure_media_fixture(spark, sf_dir)
    files = spark.read.format("binaryFile").load(media_dir)
    return files.select(
        F.regexp_extract(F.col("path"), r"media_(\d+)\.bin$", 1)
        .cast("long")
        .alias("media_id"),
        F.col("length").alias("n_bytes"),
        F.lower(F.sha2(F.col("content"), 256)).alias("payload_sha"),
    )


# ---------------------------------------------------------------------------
# mm_resize — resize stub: real Arrow plumbing, fake pixel math
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("dst_width", T.IntegerType()),
        T.StructField("dst_height", T.IntegerType()),
        T.StructField("scale_x", T.DoubleType()),
        T.StructField("scale_y", T.DoubleType()),
        T.StructField("resized_digest", T.StringType()),
    ]
)

_DST_W, _DST_H = 64, 64


def resize_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize kernel (mapInPandas). A real deployment swaps the body
    for PIL ``Image.resize`` / ``cv2.resize``; what the engine guarantees
    — and what this fake preserves — is the contract: Arrow batches in,
    one output row per input row, fixed schema out, per-row-deterministic
    payload transform (here: linspace byte decimation + sha256, a stand-in
    for nearest-neighbor downsampling), so results are identical under any
    partitioning."""
    for pdf in batches:
        out = {k: [] for k in ("media_id", "src_width", "src_height", "scale_x",
                               "scale_y", "resized_digest")}
        for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
            w = max(int(meta["width"]), 1)
            h = max(int(meta["height"]), 1)
            arr = np.frombuffer(bytes(content), dtype=np.uint8)
            if arr.size:
                idx = np.linspace(0, arr.size - 1, num=min(arr.size, _DST_W)).astype(
                    np.int64
                )
                sampled = arr[idx]
            else:  # empty/corrupt payload: keep the row, digest of zero bytes
                sampled = arr
            out["media_id"].append(media_id)
            out["src_width"].append(w)
            out["src_height"].append(h)
            out["scale_x"].append(_DST_W / w)
            out["scale_y"].append(_DST_H / h)
            out["resized_digest"].append(hashlib.sha256(sampled.tobytes()).hexdigest())
        out["dst_width"] = [_DST_W] * len(out["media_id"])
        out["dst_height"] = [_DST_H] * len(out["media_id"])
        yield pd.DataFrame(out)[[f.name for f in RESIZED_SCHEMA.fields]]


@query("mm_resize", category="pipeline-multimodal")
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch resize of the media corpus to 64×64 via the Arrow iterator
    contract — map-side only, no shuffle; the per-row scale factors and
    the decimated-payload digest stand in for the pixel work (no image
    libs in this image — SURVEY §2.8 L8 mandates the stub be explicit).
    Partitioning-invariance is pytest-asserted; rows-only for the driver
    (bytes math isn't SQL-expressible)."""
    media = media_table(spark, sf_dir)
    return media.mapInPandas(resize_media_batch, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# MM dedup — exact content-hash dedup of binary media payloads
# ---------------------------------------------------------------------------


@query(
    "mm_dedup_exact",
    oracle="""
WITH m AS (
  SELECT doc_id, sha256(sha256(text)) AS payload_sha
  FROM documents WHERE doc_id < 50
)
SELECT payload_sha,
       CAST(2 * COUNT(*) AS BIGINT) AS n_copies,
       MIN(doc_id) AS canonical_id,
       CAST(1 AS BIGINT) AS canonical_batch
FROM m GROUP BY payload_sha
""",
    category="pipeline-multimodal",
)
def mm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup for BINARY media — the multimodal twin of l1: the
    same media directory is ingested twice (the double-ingest every
    production pipeline eventually does), payloads are keyed by
    sha2(content) computed from the actual file BYTES, and each group
    collapses to its earliest (batch, id) copy. The oracle recomputes
    every payload hash from the SOURCE documents (the fixture's media
    payload is derived from text), so the whole binary path — file
    bytes → JVM sha2 → group → canonical pick — is value-checked, not
    just counted. At 100 TB: sha2 streams per file on executors (bytes
    never shuffle — only the 32-byte digest + id do), and the groupBy
    key is the digest, so dedup cost is O(corpus) scan + a digest-sized
    shuffle regardless of media size. Near-dup tiers (perceptual hash →
    band join, mirroring l2b's shape) plug in behind the same digest
    grouping; the decode stubs in this module are where a pHash kernel
    would land."""
    media_dir = _ensure_media_fixture(spark, sf_dir)
    bf = spark.read.format("binaryFile").load(media_dir)
    mid = F.regexp_extract(F.col("path"), r"media_(\d+)\.bin$", 1).cast("long")
    one = bf.select(
        mid.alias("media_id"),
        F.sha2(F.col("content"), 256).alias("payload_sha"),
        F.lit(1).cast("long").alias("batch"),
    )
    two = one.withColumn("batch", F.lit(2).cast("long"))
    return (
        one.unionByName(two)
        .groupBy("payload_sha")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("canonical_id"),
            F.min("batch").alias("canonical_batch"),
        )
    )
