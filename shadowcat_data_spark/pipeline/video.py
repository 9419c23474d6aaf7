"""Video container tier: YUV4MPEG2 (Y4M) — real frames, full oracle.

Round 5 made images and audio real; video remained the byte-stride stub
(`multimodal.mm_frame_sample` samples fixed-width byte windows of an
opaque payload — honest plumbing, fake frames). Y4M closes that the way
PPM closed images: it is the PUBLIC uncompressed interchange container
every ffmpeg/mpv pipeline can emit (plain-text stream header, then
``FRAME`` + raw planes per frame), so a complete codec is ~stdlib-only
and LOSSLESS — decoded planes ARE the closed-form fixture formula, and
both registered queries carry full value oracles.

- ``encode_y4m`` / ``decode_y4m``: C444 (three full planes) and Cmono
  (luma only); stream-header tag parsing (W/H/F/I/A/C, unknown X tags
  skipped per spec), per-frame ``FRAME`` headers with optional
  parameters, exact plane-size validation. 4:2:0 subsampled streams
  raise a named ``ValueError`` (the fixture emits C444; a real
  deployment adds the chroma upsample in the same kernel — the decode
  contract doesn't move).
- ``mm_video_decode``: per-clip geometry + per-plane sums over ALL
  frames, hash-checked against the closed-form per-sample oracle.
- ``mm_video_frame_sample``: the real version of frame sampling — every
  k-th frame (k=3) decoded and reduced, one output row per SAMPLED
  frame; the oracle reproduces the stride with ``i % 3 = 0``. At 100 TB
  this is the shape that matters: sampling happens INSIDE the decode
  kernel, so unsampled frames are read but never shuffled — only the
  per-sampled-frame scalars leave the executor.

Scale shape: identical to every media kernel — binaryFile splits,
map-side-only decode, scalars-only shuffle.
"""

from __future__ import annotations

import numpy as np

from .multimodal import codec_guard as _codec_guard

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: int = 25, mono: bool = False) -> bytes:
    """Serialize (n, h, w) mono or (n, h, w, 3) C444 uint8 frames."""
    if frames.dtype != np.uint8:
        raise ValueError(f"expected uint8 frames, got {frames.dtype}")
    if mono:
        if frames.ndim != 3:
            raise ValueError("mono frames must be (n, h, w)")
    elif frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("C444 frames must be (n, h, w, 3)")
    n, h, w = frames.shape[:3]
    if n == 0 or h == 0 or w == 0:
        raise ValueError("degenerate video dimensions")
    colorspace = b"Cmono" if mono else b"C444"
    out = bytearray(
        _MAGIC
        + b" W%d H%d F%d:1 Ip A1:1 " % (w, h, fps)
        + colorspace
        + b"\n"
    )
    for i in range(n):
        out += b"FRAME\n"
        if mono:
            out += frames[i].tobytes()
        else:
            for c in range(3):  # planar: full Y, U, V planes
                out += np.ascontiguousarray(frames[i, :, :, c]).tobytes()
    return bytes(out)


@_codec_guard
def decode_y4m(buf: bytes) -> tuple[dict, np.ndarray]:
    """Decode a Y4M stream to (params, frames) — frames is (n, h, w) for
    Cmono or (n, h, w, 3) for C444. Raises ``ValueError`` on malformed
    headers, short planes, and the declared 4:2:0/4:2:2 gate."""
    if not buf.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload (bad magic)")
    eol = buf.find(b"\n")
    if eol < 0:
        raise ValueError("unterminated stream header")
    params: dict = {"C": "420jpeg"}  # spec default when absent
    for tag in buf[len(_MAGIC) : eol].split():
        key, val = chr(tag[0]), tag[1:].decode("ascii", "replace")
        if key == "W":
            params["W"] = int(val)
        elif key == "H":
            params["H"] = int(val)
        elif key == "F":
            params["F"] = val
        elif key in ("I", "A"):
            params[key] = val
        elif key == "C":
            params["C"] = val
        elif key == "X":
            pass  # extension tags: skipped per spec
        else:
            raise ValueError(f"unknown stream-header tag {key!r}")
    if "W" not in params or "H" not in params:
        raise ValueError("stream header missing W or H")
    w, h = params["W"], params["H"]
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate dimensions {w}x{h}")
    cs = params["C"]
    if cs == "mono":
        nplanes, mono = 1, True
    elif cs == "444":
        nplanes, mono = 3, False
    else:
        raise ValueError(f"colorspace C{cs} unsupported (C444/Cmono only)")
    plane = w * h
    pos = eol + 1
    frames = []
    while pos < len(buf):
        feol = buf.find(b"\n", pos)
        if feol < 0 or buf[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME header at byte {pos}")
        extra = buf[pos + 5 : feol]
        if extra and not extra.startswith(b" "):
            raise ValueError("malformed FRAME parameter list")
        pos = feol + 1
        need = plane * nplanes
        data = buf[pos : pos + need]
        if len(data) != need:
            raise ValueError(
                f"short frame: want {need} plane bytes, have {len(data)}"
            )
        arr = np.frombuffer(data, np.uint8)
        if mono:
            frames.append(arr.reshape(h, w))
        else:
            frames.append(arr.reshape(3, h, w).transpose(1, 2, 0))
        pos += need
    if not frames:
        raise ValueError("stream carries zero frames")
    return params, np.stack(frames)


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T  # noqa: E402

from ..registry import query  # noqa: E402
from ..session import load_table  # noqa: E402

_VID_N = 30  # clips are the heaviest fixture (n_frames × planes)
_VID_FIXTURE_TAG = "y4m-v1"
_VID_STRIDE = 3  # mm_video_frame_sample keeps every 3rd frame


def _vid_geometry(doc_id: int) -> tuple[int, int, int]:
    """(n_frames, width, height) — small, co-prime-ish moduli."""
    return 4 + doc_id % 5, 8 + doc_id % 6, 8 + doc_id % 4


def _vid_frames(doc_id: int, n: int, w: int, h: int) -> np.ndarray:
    """(n, h, w, 3) uint8 — closed form the SQL oracle replays:
    (doc_id*3 + f*19 + x*5 + y*7 + c*11) % 256."""
    f, y, x, c = np.meshgrid(
        np.arange(n), np.arange(h), np.arange(w), np.arange(3), indexing="ij"
    )
    return ((doc_id * 3 + f * 19 + x * 5 + y * 7 + c * 11) % 256).astype(np.uint8)


def _ensure_video_fixture(spark: SparkSession, sf_dir: str) -> str:
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ..sources.io import _scratch

    vid_dir = _scratch(sf_dir, "y4m_files")
    manifest = vid_dir.rstrip("/") + ".manifest"
    ids = sorted(
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _VID_N)
        .select("doc_id")
        .distinct()
        .collect()
    )
    tag = (
        _VID_FIXTURE_TAG
        + ":"
        + _hashlib.sha256(",".join(map(str, ids)).encode()).hexdigest()
    )
    try:
        with open(manifest) as f:
            if f.read() == tag:
                return vid_dir
    except FileNotFoundError:
        pass
    _shutil.rmtree(vid_dir, ignore_errors=True)
    _os.makedirs(vid_dir, exist_ok=True)
    for doc_id in ids:
        n, w, h = _vid_geometry(doc_id)
        payload = encode_y4m(_vid_frames(doc_id, n, w, h), fps=24)
        with open(_os.path.join(vid_dir, f"clip_{doc_id}.y4m"), "wb") as f:
            f.write(payload)
    with open(manifest, "w") as f:
        f.write(tag)
    return vid_dir


def _video_frames_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    vid_dir = _ensure_video_fixture(spark, sf_dir)
    return spark.read.format("binaryFile").load(vid_dir).select(
        F.regexp_extract(F.col("path"), r"clip_(\d+)\.y4m$", 1)
        .cast("long")
        .alias("media_id"),
        "content",
    )


_VID_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("y_sum", T.LongType()),
        T.StructField("u_sum", T.LongType()),
        T.StructField("v_sum", T.LongType()),
    ]
)


def _video_decode_kernel(batches):
    import pandas as pd

    for pdf in batches:
        cols = ["n_frames", "width", "height", "y_sum", "u_sum", "v_sum"]
        out = {"media_id": []}
        for c in cols:
            out[c] = []
        for media_id, content in zip(pdf["media_id"], pdf["content"]):
            out["media_id"].append(int(media_id))
            try:
                params, frames = decode_y4m(bytes(content))
                # Cmono yields (n,h,w); add a channel axis so the plane
                # sums below never reduce to a scalar and IndexError past
                # the ValueError-only quarantine (u/v read as 0 for mono)
                if frames.ndim == 3:
                    frames = frames[:, :, :, None]
                if frames.shape[3] < 3:
                    pad = np.zeros(
                        frames.shape[:3] + (3 - frames.shape[3],), np.uint8
                    )
                    frames = np.concatenate([frames, pad], axis=3)
                s = frames.astype(np.int64).sum(axis=(0, 1, 2))
                out["n_frames"].append(int(frames.shape[0]))
                out["width"].append(int(params["W"]))
                out["height"].append(int(params["H"]))
                out["y_sum"].append(int(s[0]))
                out["u_sum"].append(int(s[1]))
                out["v_sum"].append(int(s[2]))
            except ValueError:
                for c in cols:
                    out[c].append(None)
        yield pd.DataFrame(out)


_VID_CTE = f"""
WITH clips AS (
  SELECT doc_id, 4 + doc_id % 5 AS n, 8 + doc_id % 6 AS w, 8 + doc_id % 4 AS h
  FROM documents WHERE doc_id < {_VID_N}
)"""

_VID_PX = "(doc_id*3 + f.f*19 + x.x*5 + y.y*7 + c.c*11) % 256"


@query(
    "mm_video_decode",
    oracle=f"""{_VID_CTE}
SELECT doc_id AS media_id,
       CAST(n AS INTEGER) AS n_frames,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(SUM(CASE WHEN c.c = 0 THEN {_VID_PX} END) AS BIGINT) AS y_sum,
       CAST(SUM(CASE WHEN c.c = 1 THEN {_VID_PX} END) AS BIGINT) AS u_sum,
       CAST(SUM(CASE WHEN c.c = 2 THEN {_VID_PX} END) AS BIGINT) AS v_sum
FROM clips
CROSS JOIN UNNEST(generate_series(0, n - 1)) AS f(f)
CROSS JOIN UNNEST(generate_series(0, w - 1)) AS x(x)
CROSS JOIN UNNEST(generate_series(0, h - 1)) AS y(y)
CROSS JOIN UNNEST(generate_series(0, 2)) AS c(c)
GROUP BY doc_id, n, w, h
""",
    category="pipeline-multimodal",
)
def mm_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode: Y4M clips (the ffmpeg-interchange container) →
    mapInPandas stream-header + FRAME parse → per-clip geometry and
    per-plane sums over every frame, hash-checked against the
    closed-form per-sample oracle. The video modality's byte-stride stub
    (mm_frame_sample) is superseded by real frames."""
    return _video_frames_df(spark, sf_dir).mapInPandas(
        _video_decode_kernel, _VID_DECODE_SCHEMA
    )


_VID_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("y_sum", T.LongType()),
        T.StructField("rgbish_max", T.IntegerType()),
    ]
)


def _video_sample_kernel(batches):
    import pandas as pd

    for pdf in batches:
        out = {"media_id": [], "frame_idx": [], "y_sum": [], "rgbish_max": []}
        for media_id, content in zip(pdf["media_id"], pdf["content"]):
            try:
                _, frames = decode_y4m(bytes(content))
                if frames.ndim == 3:  # Cmono: (n,h,w) → (n,h,w,1)
                    frames = frames[:, :, :, None]
            except ValueError:
                out["media_id"].append(int(media_id))
                out["frame_idx"].append(None)
                out["y_sum"].append(None)
                out["rgbish_max"].append(None)
                continue
            for i in range(0, len(frames), _VID_STRIDE):
                out["media_id"].append(int(media_id))
                out["frame_idx"].append(i)
                out["y_sum"].append(int(frames[i, :, :, 0].astype(np.int64).sum()))
                out["rgbish_max"].append(int(frames[i].max()))
        yield pd.DataFrame(out)


@query(
    "mm_video_frame_sample",
    oracle=f"""{_VID_CTE}
, px AS (
  SELECT doc_id, f.f, c.c, {_VID_PX} AS v
  FROM clips
  CROSS JOIN UNNEST(generate_series(0, n - 1)) AS f(f)
  CROSS JOIN UNNEST(generate_series(0, w - 1)) AS x(x)
  CROSS JOIN UNNEST(generate_series(0, h - 1)) AS y(y)
  CROSS JOIN UNNEST(generate_series(0, 2)) AS c(c)
  WHERE f.f % {_VID_STRIDE} = 0
)
SELECT doc_id AS media_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(SUM(CASE WHEN c = 0 THEN v END) AS BIGINT) AS y_sum,
       CAST(MAX(v) AS INTEGER) AS rgbish_max
FROM px GROUP BY doc_id, f
""",
    category="pipeline-multimodal",
)
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling: every {stride}rd frame of each decoded clip,
    reduced to scalars INSIDE the kernel — unsampled frames never leave
    the executor, which is the only per-frame economics that survives a
    100 TB video corpus. One output row per sampled frame; the oracle
    reproduces the stride with ``f % 3 = 0``."""
    return _video_frames_df(spark, sf_dir).mapInPandas(
        _video_sample_kernel, _VID_SAMPLE_SCHEMA
    )
