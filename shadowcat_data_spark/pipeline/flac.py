"""FLAC codec tier (continues the compressed-codec gate closure).

FLAC is the lossless audio complement to round 5's WAV/PCM tier: pure
integer arithmetic end to end (fixed/LPC prediction + Rice-coded
residuals + CRC framing), so — like PNG — a complete implementation
needs only the stdlib, and losslessness means the decoded samples ARE
the closed-form fixture formula: ``mm_flac_decode`` reuses the exact
per-sample SQL oracle the WAV query uses. With this tier the audio gate
narrows to MP3 (a perceptual codec whose enormous spec tables put it
genuinely out of pure-reimplementation scope).

Implemented per the public spec (xiph.org FLAC format):

- ``encode_flac``: 16-bit PCM, independent channels, fixed blocking
  (4096-sample frames, 16-bit end-of-header blocksize field), CONSTANT
  and FIXED(order 0–2) subframes chosen per channel by residual cost,
  single-partition Rice residuals (escape to verbatim when Rice would
  expand), UTF-8 frame numbers, CRC-8 header / CRC-16 frame trailers,
  STREAMINFO with the spec's MD5 of the raw little-endian samples.
- ``decode_flac``: metadata-block walk, STREAMINFO parse, frame-header
  parse with CRC-8 validation, CONSTANT / VERBATIM / FIXED(0–4) / LPC
  subframes (quantized-coefficient prediction with arithmetic shift),
  Rice and Rice2 partitions with escapes, wasted-bits, CRC-16
  validation, MD5 verification against STREAMINFO. Non-16-bit depths
  and mid/side channel assignments raise named ``ValueError``s (our
  encoder never emits them; real-world FLACs that use them quarantine
  cleanly).

Scale shape: identical to every media kernel — decode is map-side-only
over binaryFile splits, per-clip scalars are all that shuffles.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .multimodal import codec_guard as _codec_guard

_BLOCK = 4096


# --- CRCs (spec polynomials) -------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# --- bit I/O -----------------------------------------------------------------


class _BW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BR:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bitpos = pos * 8

    def take(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise ValueError("FLAC bitstream exhausted")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v

    def take_signed(self, bits: int) -> int:
        v = self.take(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def take_unary(self) -> int:
        q = 0
        while True:
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise ValueError("FLAC bitstream exhausted in unary")
            if (self.data[byte] >> (7 - (self.bitpos & 7))) & 1:
                self.bitpos += 1
                return q
            q += 1
            self.bitpos += 1

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def byte_pos(self) -> int:
        return self.bitpos >> 3


# --- UTF-8-style coded numbers (frame header) --------------------------------


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    # smallest byte count in 2..7 whose capacity holds n: the lead byte
    # keeps (7 - nb) payload bits, each continuation byte 6 more,
    # i.e. 5*nb + 1 payload bits total
    nbytes = 7
    for nb in range(2, 8):
        if n < (1 << (5 * nb + 1)):
            nbytes = nb
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_decode(r: _BR) -> int:
    b0 = r.take(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8-coded frame number")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = r.take(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        v = (v << 6) | (b & 0x3F)
    return v


# --- fixed predictors ---------------------------------------------------------

_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(res: np.ndarray, warm: np.ndarray, order: int) -> np.ndarray:
    out = np.empty(len(res) + order, dtype=np.int64)
    out[:order] = warm
    coefs = _FIXED_COEF[order]
    for i in range(order, len(out)):
        pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
        out[i] = res[i - order] + pred
    return out


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, ((-r) << 1) - 1).astype(np.int64)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


# --- encoder -------------------------------------------------------------------


def _best_rice_param(u: np.ndarray) -> int:
    if not len(u):
        return 0
    mean = float(u.mean())
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def _write_subframe(w: _BW, x: np.ndarray) -> None:
    if (x == x[0]).all():
        w.put(0, 1)  # padding
        w.put(0, 6)  # CONSTANT
        w.put(0, 1)  # no wasted bits
        w.put(int(x[0]) & 0xFFFF, 16)
        return
    # pick the cheapest FIXED order 0-2 by absolute residual mass
    best_order, best_cost = 0, None
    for order in range(0, 3):
        if len(x) <= order:
            continue
        cost = int(np.abs(_fixed_residual(x, order)).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    order = best_order
    w.put(0, 1)
    w.put(0b001000 | order, 6)  # FIXED(order)
    w.put(0, 1)  # no wasted bits
    for i in range(order):  # warmup, verbatim signed bps
        w.put(int(x[i]) & 0xFFFF, 16)
    res = _fixed_residual(x, order)
    u = _zigzag(res)
    w.put(0, 2)  # residual method 0: 4-bit Rice
    w.put(0, 4)  # partition order 0 → one partition
    p = _best_rice_param(u)
    # escape to verbatim if Rice would expand pathologically
    est = int((u >> p).sum()) + len(u) * (p + 1)
    if p >= 15 or est > 17 * len(u):
        w.put(0xF, 4)  # escape
        w.put(17, 5)  # 17-bit verbatim residuals (covers 16-bit diffs)
        for v in res:
            w.put(int(v) & 0x1FFFF, 17)
        return
    w.put(p, 4)
    for v in u:
        w.put_unary(int(v) >> p)
        if p:
            w.put(int(v) & ((1 << p) - 1), p)


def encode_flac(samples: np.ndarray, sample_rate: int) -> bytes:
    """Serialize (n, channels) int16 PCM as a FLAC stream (independent
    channels, fixed 4096-sample blocking, FIXED/CONSTANT subframes)."""
    if samples.dtype != np.int16 or samples.ndim != 2:
        raise ValueError(f"expected (n, ch) int16 samples, got {samples.shape} {samples.dtype}")
    n, nch = samples.shape
    if n == 0 or not 1 <= nch <= 8:
        raise ValueError("degenerate sample matrix")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError(f"sample rate {sample_rate} out of FLAC's 20-bit range")
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    # STREAMINFO
    si = _BW()
    si.put(_BLOCK, 16)  # min block
    si.put(_BLOCK, 16)  # max block (spec: last frame may be shorter)
    si.put(0, 24)  # min frame size unknown
    si.put(0, 24)  # max frame size unknown
    si.put(sample_rate, 20)
    si.put(nch - 1, 3)
    si.put(15, 5)  # bits per sample - 1
    si.put(n, 36)
    body = si.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body  # last-block flag
    # frames
    frame_no = 0
    for start in range(0, n, _BLOCK):
        block = samples[start : start + _BLOCK]
        bs = len(block)
        hdr = _BW()
        hdr.put(0b11111111111110, 14)
        hdr.put(0, 1)  # reserved
        hdr.put(0, 1)  # fixed blocksize strategy
        hdr.put(0b0111, 4)  # blocksize: 16-bit value-1 at end of header
        hdr.put(0, 4)  # sample rate: in STREAMINFO
        hdr.put(nch - 1, 4)  # independent channels
        hdr.put(0b100, 3)  # 16 bits per sample
        hdr.put(0, 1)  # reserved
        hdr.align()
        hbytes = bytearray(hdr.bytes())
        hbytes += _utf8_encode(frame_no)
        hbytes += struct.pack(">H", bs - 1)
        hbytes.append(_crc8(bytes(hbytes)))
        fw = _BW()
        for ch in range(nch):
            _write_subframe(fw, block[:, ch].astype(np.int64))
        fw.align()
        frame = bytes(hbytes) + fw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)


# --- decoder -------------------------------------------------------------------


def _read_residual(r: _BR, bs: int, order: int) -> np.ndarray:
    method = r.take(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    po = r.take(4)
    nparts = 1 << po
    if bs % nparts:
        raise ValueError("partition count does not divide block size")
    res = np.empty(bs - order, dtype=np.int64)
    idx = 0
    for part in range(nparts):
        cnt = (bs >> po) - (order if part == 0 else 0)
        param = r.take(pbits)
        if param == (1 << pbits) - 1:  # escape: verbatim residuals
            width = r.take(5)
            for i in range(cnt):
                res[idx] = r.take_signed(width) if width else 0
                idx += 1
            continue
        for i in range(cnt):
            q = r.take_unary()
            u = (q << param) | (r.take(param) if param else 0)
            res[idx] = _unzigzag(u)
            idx += 1
    return res


def _read_subframe(r: _BR, bs: int, bps: int) -> np.ndarray:
    if r.take(1):
        raise ValueError("subframe padding bit set")
    t = r.take(6)
    wasted = 0
    if r.take(1):  # wasted-bits flag: unary count - 1
        wasted = r.take_unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        out = np.full(bs, _to_signed(r.take(eff), eff), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([_to_signed(r.take(eff), eff) for _ in range(bs)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED(order)
        order = t - 8
        warm = np.array([_to_signed(r.take(eff), eff) for _ in range(order)], dtype=np.int64)
        res = _read_residual(r, bs, order)
        out = _fixed_restore(res, warm, order)
    elif t >= 32:  # LPC(order)
        order = t - 31
        warm = np.array([_to_signed(r.take(eff), eff) for _ in range(order)], dtype=np.int64)
        prec = r.take(4)
        if prec == 15:
            raise ValueError("invalid LPC coefficient precision")
        prec += 1
        shift = r.take_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.take_signed(prec) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            pred = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs)) >> shift
            out[i] = res[i - order] + pred
    else:
        raise ValueError(f"reserved subframe type {t}")
    return out << wasted


def _to_signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}


@_codec_guard
def decode_flac(buf: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC stream to (sample_rate, (n, channels) int16).
    Validates magic, STREAMINFO, per-frame CRC-8/CRC-16, and the stream
    MD5. Mid/side stereo and non-16-bit depths raise ``ValueError``."""
    if not buf.startswith(b"fLaC"):
        raise ValueError("not a FLAC payload (bad magic)")
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(buf):
            raise ValueError("truncated metadata block header")
        last = bool(buf[pos] & 0x80)
        btype = buf[pos] & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        body = buf[pos + 4 : pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("truncated metadata block")
        if btype == 0:
            if ln != 34:
                raise ValueError("STREAMINFO must be 34 bytes")
            r = _BR(body)
            r.take(16)  # min block
            r.take(16)
            r.take(24)
            r.take(24)
            rate = r.take(20)
            nch = r.take(3) + 1
            bps = r.take(5) + 1
            total = r.take(36)
            md5 = body[18:34]
            streaminfo = (rate, nch, bps, total, md5)
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + ln
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    rate, nch, bps, total, md5 = streaminfo
    if bps != 16:
        raise ValueError(f"{bps}-bit FLAC unsupported (16-bit only)")
    chans: list[np.ndarray] = []
    collected = 0
    frames: list[np.ndarray] = []
    while collected < total:
        if pos + 2 > len(buf):
            raise ValueError("truncated FLAC stream (missing frames)")
        r = _BR(buf, pos)
        if r.take(14) != 0b11111111111110:
            raise ValueError(f"lost frame sync at byte {pos}")
        r.take(1)
        r.take(1)  # blocking strategy
        bs_code = r.take(4)
        sr_code = r.take(4)
        ch_code = r.take(4)
        ss_code = r.take(3)
        r.take(1)
        _utf8_decode(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code 0")
        elif bs_code == 6:
            bs = r.take(8) + 1
        elif bs_code == 7:
            bs = r.take(16) + 1
        else:
            bs = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            r.take(8)
        elif sr_code in (13, 14):
            r.take(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code 15")
        if ch_code >= 8:
            raise ValueError("mid/side channel assignments unsupported")
        if ch_code + 1 != nch:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        if ss_code not in (0, 0b100):
            raise ValueError("frame sample size disagrees with 16-bit stream")
        hdr_end = r.byte_pos()
        if _crc8(buf[pos:hdr_end]) != r.take(8):
            raise ValueError("frame header CRC-8 mismatch")
        sub = [_read_subframe(r, bs, 16) for _ in range(nch)]
        r.align()
        crc_start = r.byte_pos()
        if struct.unpack(">H", buf[crc_start : crc_start + 2])[0] != _crc16(
            buf[pos:crc_start]
        ):
            raise ValueError("frame CRC-16 mismatch")
        pos = crc_start + 2
        frame = np.stack(sub, axis=1)
        if (np.abs(frame) > 32768).any() or frame.max(initial=0) > 32767:
            raise ValueError("decoded samples out of int16 range")
        frames.append(frame)
        collected += bs
    if collected != total:
        raise ValueError("frame samples disagree with STREAMINFO total")
    samples = np.concatenate(frames).astype(np.int16)
    if md5 != b"\x00" * 16 and hashlib.md5(samples.astype("<i2").tobytes()).digest() != md5:
        raise ValueError("stream MD5 mismatch (corrupt or mis-decoded)")
    return rate, samples


# ---------------------------------------------------------------------------
# Registered query: mm_flac_decode — lossless, full sample oracle
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T  # noqa: E402

from ..registry import query  # noqa: E402
from ..session import load_table  # noqa: E402

_FLAC_N = 50
_FLAC_FIXTURE_TAG = "flac-v1"


def _ensure_flac_fixture(spark: SparkSession, sf_dir: str) -> str:
    """clip_<doc_id>.flac per document with doc_id < 50: the SAME sample
    formula as the WAV fixture (shared SQL oracle arithmetic), FLAC-
    encoded losslessly. Same manifest idempotence as every fixture."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ..sources.io import _scratch
    from .multimodal import _aud_geometry, _aud_samples

    flac_dir = _scratch(sf_dir, "flac_files")
    manifest = flac_dir.rstrip("/") + ".manifest"
    ids = sorted(
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _FLAC_N)
        .select("doc_id")
        .distinct()
        .collect()
    )
    tag = (
        _FLAC_FIXTURE_TAG
        + ":"
        + _hashlib.sha256(",".join(map(str, ids)).encode()).hexdigest()
    )
    try:
        with open(manifest) as f:
            if f.read() == tag:
                return flac_dir
    except FileNotFoundError:
        pass
    _shutil.rmtree(flac_dir, ignore_errors=True)
    _os.makedirs(flac_dir, exist_ok=True)
    for doc_id in ids:
        n_samples, n_ch, rate = _aud_geometry(doc_id)
        payload = encode_flac(_aud_samples(doc_id, n_samples, n_ch), rate)
        with open(_os.path.join(flac_dir, f"clip_{doc_id}.flac"), "wb") as f:
            f.write(payload)
    with open(manifest, "w") as f:  # written LAST: a crash mid-synth re-runs
        f.write(tag)
    return flac_dir


_FLAC_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("ch0_sum", T.LongType()),
        T.StructField("ch1_sum", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def _flac_kernel(batches):
    import pandas as pd

    for pdf in batches:
        cols = ["sample_rate", "n_samples", "n_channels", "ch0_sum", "ch1_sum", "energy"]
        out = {"media_id": []}
        for c in cols:
            out[c] = []
        for media_id, content in zip(pdf["media_id"], pdf["content"]):
            out["media_id"].append(int(media_id))
            try:
                rate, s = decode_flac(bytes(content))
                s64 = s.astype(np.int64)
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(int(s.shape[0]))
                out["n_channels"].append(int(s.shape[1]))
                out["ch0_sum"].append(int(s64[:, 0].sum()))
                out["ch1_sum"].append(int(s64[:, 1].sum()) if s.shape[1] > 1 else None)
                out["energy"].append(int((s64 * s64).sum()))
            except ValueError:
                for c in cols:
                    out[c].append(None)
        yield pd.DataFrame(out)


def _flac_oracle() -> str:
    # the WAV fixture's per-sample formula, shared arithmetic (see
    # multimodal._aud_samples / the mm_audio_decode oracle)
    from .multimodal import _AUD_S_SQL

    return f"""
WITH clips AS (
  SELECT doc_id,
         8000 + (doc_id % 3) * 4000 AS sample_rate,
         64 + doc_id % 33 AS n,
         1 + doc_id % 2 AS nch
  FROM documents WHERE doc_id < {_FLAC_N}
), s AS (
  SELECT doc_id, sample_rate, n, nch, ch.ch, i.i,
         {_AUD_S_SQL} AS v
  FROM clips
  CROSS JOIN UNNEST(generate_series(0, n - 1)) AS i(i)
  CROSS JOIN UNNEST(generate_series(0, nch - 1)) AS ch(ch)
)
SELECT doc_id AS media_id,
       CAST(sample_rate AS INTEGER) AS sample_rate,
       CAST(n AS INTEGER) AS n_samples,
       CAST(nch AS INTEGER) AS n_channels,
       CAST(SUM(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS ch0_sum,
       CAST(SUM(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS ch1_sum,
       CAST(SUM(v * v) AS BIGINT) AS energy
FROM s GROUP BY doc_id, sample_rate, n, nch
"""


@query("mm_flac_decode", oracle=_flac_oracle(), category="pipeline-multimodal")
def mm_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC decode end to end: binaryFile ingest of in-repo encoded
    FLACs → mapInPandas frame decode (CRC-8/16 validated, Rice residual
    + fixed-predictor restore, stream MD5 check) → per-clip geometry,
    channel sums, and Σs² energy. FLAC is lossless, so this is the FULL
    per-sample oracle mm_audio_decode uses — the same closed-form
    arithmetic through a real compressed container. The audio gate
    narrows to MP3."""
    flac_dir = _ensure_flac_fixture(spark, sf_dir)
    frames = spark.read.format("binaryFile").load(flac_dir).select(
        F.regexp_extract(F.col("path"), r"clip_(\d+)\.flac$", 1)
        .cast("long")
        .alias("media_id"),
        "content",
    )
    return frames.mapInPandas(_flac_kernel, _FLAC_SCHEMA)
