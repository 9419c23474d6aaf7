"""PNG codec tier (continues r05 verdict #4: close the compressed-codec gate).

PNG is DEFLATE (stdlib ``zlib``) around per-scanline filters, so — unlike
JPEG — a complete, spec-exact implementation needs no external library at
all. This module implements the PUBLIC spec (RFC 2083 / ISO 15948):

- ``encode_png``: 8-bit grayscale / RGB / RGBA, filter type 0 (None) or 4
  (Paeth) per scanline, one zlib IDAT, CRC-32 per chunk (stdlib
  ``zlib.crc32``).
- ``decode_png``: chunk walk with CRC validation, IHDR sanity, multi-IDAT
  concatenation, full unfiltering (None/Sub/Up/Average/Paeth — the Paeth
  predictor per the spec's exact tie-breaking), 8-bit gray / gray+alpha /
  RGB / RGBA / indexed (PLTE). Interlaced (Adam7), 16-bit, and 1/2/4-bit
  depths raise named ``ValueError``s — quarantine rows, pytest-pinned.

PNG is LOSSLESS, so the oracle story is stronger than JPEG's: the decoded
pixels of the synthetic fixture ARE the closed-form pixel formula, and
``mm_png_decode`` hash-checks dimensions + per-channel sums against the
same lateral-series SQL the PPM queries use. With this tier the external
codec gate narrows to progressive JPEG and MP3.

Scale shape: identical to every media kernel — decode is map-side-only
over binaryFile splits (zlib inflate + numpy unfilter per image), only
per-image scalars shuffle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .multimodal import codec_guard as _codec_guard

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """The Paeth predictor, vectorized, with the spec's exact tie order
    (a, then b, then c on equal distances)."""
    p = a.astype(np.int64) + b.astype(np.int64) - c.astype(np.int64)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def encode_png(px: np.ndarray, paeth: bool = False) -> bytes:
    """Serialize (h, w) gray, (h, w, 3) RGB, or (h, w, 4) RGBA uint8 pixels.
    ``paeth=True`` filters every scanline with type 4 (exercises the
    decoder's hardest unfilter path on every read); default is type 0."""
    if px.dtype != np.uint8 or px.ndim not in (2, 3):
        raise ValueError(f"expected (h,w[,3|4]) uint8 pixels, got {px.shape} {px.dtype}")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("degenerate image dimensions")
    if px.ndim == 2:
        color, nch = 0, 1
        flat = px[:, :, None]
    elif px.shape[2] == 3:
        color, nch = 2, 3
        flat = px
    elif px.shape[2] == 4:
        color, nch = 6, 4
        flat = px
    else:
        raise ValueError(f"unsupported channel count {px.shape[2]}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros((w, nch), dtype=np.uint8)
    for y in range(h):
        line = flat[y]
        if paeth:
            left = np.vstack([np.zeros((1, nch), np.uint8), line[:-1]])
            ul = np.vstack([np.zeros((1, nch), np.uint8), prev[:-1]])
            pred = _paeth(left, prev, ul)
            raw.append(4)
            raw += ((line.astype(np.int64) - pred) % 256).astype(np.uint8).tobytes()
        else:
            raw.append(0)
            raw += line.tobytes()
        prev = line
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


@_codec_guard
def decode_png(buf: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to (h, w) gray, (h, w, 2) gray+alpha, (h, w, 3)
    RGB, or (h, w, 4) RGBA uint8. Raises ``ValueError`` on malformed
    chunks, CRC mismatches, and the declared gates (16-bit, sub-byte
    depths, Adam7 interlace)."""
    if not buf.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload (bad magic)")
    pos = len(_PNG_MAGIC)
    ihdr = None
    idat = bytearray()
    palette = None
    seen_end = False
    while pos < len(buf):
        if pos + 8 > len(buf):
            raise ValueError("truncated chunk header")
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(buf):
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(">I", buf[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"{depth}-bit depth unsupported (8-bit only)")
            if color not in _CHANNELS:
                raise ValueError(f"unknown color type {color}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("Adam7 interlace unsupported")
            if w == 0 or h == 0:
                raise ValueError("degenerate image dimensions")
            ihdr = (w, h, color)
        elif tag == b"PLTE":
            if len(body) % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_end = True
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    if not seen_end:
        raise ValueError("missing IEND")
    if not idat:
        raise ValueError("missing IDAT")
    w, h, color = ihdr
    nch = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from None
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"inflated size {len(raw)} != expected {h * (stride + 1)}"
        )
    out = np.empty((h, w, nch), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], np.uint8
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub — sequential along the row
            line = line.astype(np.int64)
            for x in range(nch, stride):
                line[x] = (line[x] + line[x - nch]) % 256
            line = line.astype(np.uint8)
        elif ftype == 2:  # Up
            line = ((line.astype(np.int64) + prev) % 256).astype(np.uint8)
        elif ftype == 3:  # Average
            line = line.astype(np.int64)
            for x in range(stride):
                left = line[x - nch] if x >= nch else 0
                line[x] = (line[x] + (left + int(prev[x])) // 2) % 256
            line = line.astype(np.uint8)
        elif ftype == 4:  # Paeth
            line = line.astype(np.int64)
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) % 256
            line = line.astype(np.uint8)
        else:
            raise ValueError(f"unknown filter type {ftype} on scanline {y}")
        out[y] = line.reshape(w, nch)
        prev = line
    if color == 3:
        if palette is None:
            raise ValueError("indexed PNG without PLTE")
        idx = out[:, :, 0]
        if int(idx.max()) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[idx]
    if nch == 1:
        return out[:, :, 0]
    return out


# ---------------------------------------------------------------------------
# Registered query: mm_png_decode — lossless, so the FULL pixel oracle
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T  # noqa: E402

from ..registry import query  # noqa: E402
from ..session import load_table  # noqa: E402

_PNG_N = 50
_PNG_FIXTURE_TAG = "png-v1"


def _ensure_png_fixture(spark: SparkSession, sf_dir: str) -> str:
    """img_<doc_id>.png per document with doc_id < 50: the SAME pixel
    formula as the PPM fixture (so the SQL oracle is shared arithmetic),
    encoded losslessly — odd ids Paeth-filtered so the decoder's hardest
    unfilter path runs on every read. Same manifest idempotence."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ..sources.io import _scratch
    from .multimodal import _img_dims, _img_pixels

    png_dir = _scratch(sf_dir, "png_files")
    manifest = png_dir.rstrip("/") + ".manifest"
    ids = sorted(
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PNG_N)
        .select("doc_id")
        .distinct()
        .collect()
    )
    tag = (
        _PNG_FIXTURE_TAG
        + ":"
        + _hashlib.sha256(",".join(map(str, ids)).encode()).hexdigest()
    )
    try:
        with open(manifest) as f:
            if f.read() == tag:
                return png_dir
    except FileNotFoundError:
        pass
    _shutil.rmtree(png_dir, ignore_errors=True)
    _os.makedirs(png_dir, exist_ok=True)
    for doc_id in ids:
        w, h = _img_dims(doc_id)
        payload = encode_png(_img_pixels(doc_id, w, h), paeth=bool(doc_id % 2))
        with open(_os.path.join(png_dir, f"img_{doc_id}.png"), "wb") as f:
            f.write(payload)
    with open(manifest, "w") as f:  # written LAST: a crash mid-synth re-runs
        f.write(tag)
    return png_dir


_PNG_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
    ]
)


def _png_kernel(batches):
    import pandas as pd

    for pdf in batches:
        out = {
            "media_id": [], "width": [], "height": [],
            "r_sum": [], "g_sum": [], "b_sum": [],
        }
        for media_id, content in zip(pdf["media_id"], pdf["content"]):
            out["media_id"].append(int(media_id))
            try:
                px = decode_png(bytes(content))
                # decode_png legitimately yields (h,w) gray or (h,w,2)
                # gray+alpha; normalize to >=3 channels (r=g=b=gray) so
                # the s[0..2] reads below can never IndexError and break
                # the only-ValueError-escapes quarantine contract
                if px.ndim == 2:
                    px = px[:, :, None]
                if px.shape[2] < 3:
                    px = np.repeat(px[:, :, :1], 3, axis=2)
                s = px.astype(np.int64).sum(axis=(0, 1))
                out["width"].append(int(px.shape[1]))
                out["height"].append(int(px.shape[0]))
                out["r_sum"].append(int(s[0]))
                out["g_sum"].append(int(s[1]))
                out["b_sum"].append(int(s[2]))
            except ValueError:
                for f in ("width", "height", "r_sum", "g_sum", "b_sum"):
                    out[f].append(None)
        yield pd.DataFrame(out)


# import the shared pixel-oracle builders lazily to avoid a cycle at
# registry load (multimodal imports nothing from here)
def _png_oracle() -> str:
    from .multimodal import _IMGS_CTE, _chan_sums_sql

    return f"""{_IMGS_CTE}
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       {_chan_sums_sql("x.x", "y.y")}
FROM imgs
CROSS JOIN UNNEST(generate_series(0, w - 1)) AS x(x)
CROSS JOIN UNNEST(generate_series(0, h - 1)) AS y(y)
CROSS JOIN UNNEST(generate_series(0, 2)) AS c(c)
GROUP BY doc_id, w, h
"""


@query("mm_png_decode", oracle=_png_oracle(), category="pipeline-multimodal")
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end to end: binaryFile ingest of in-repo encoded
    PNGs (odd ids Paeth-filtered) → mapInPandas chunk walk + CRC check +
    zlib inflate + unfilter → per-image dimensions and channel sums.
    PNG is lossless, so this is the FULL pixel-formula oracle the PPM
    queries use — byte-for-byte the same arithmetic, now through a real
    compressed container. The codec gate narrows to progressive JPEG and
    MP3."""
    png_dir = _ensure_png_fixture(spark, sf_dir)
    frames = spark.read.format("binaryFile").load(png_dir).select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.png$", 1)
        .cast("long")
        .alias("media_id"),
        "content",
    )
    return frames.mapInPandas(_png_kernel, _PNG_DECODE_SCHEMA)
