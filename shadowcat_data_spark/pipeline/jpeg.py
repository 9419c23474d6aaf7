"""JPEG codec tier — baseline AND progressive (r05 verdict #4).

A real crawl's image payloads are overwhelmingly JPEG, and no image
library ships in this container — so the compressed-codec gate is closed
the same way the PPM/WAV gates were in round 5: a pure-numpy/stdlib
implementation of the PUBLIC spec (ITU-T T.81, 8-bit), with in-repo
encoders synthesizing the fixtures and the decoder value-checked by
closed-form SQL oracles.

What is implemented (and what still raises):

- ``encode_jpeg_baseline``: grayscale (1 component) and YCbCr 4:4:4 or
  4:2:0 (2×2 chroma average) baseline JFIF streams — SOI/APP0/DQT/SOF0/
  DHT/SOS/EOI, IJG-style quality-scaled Annex-K quantization tables, and
  a FLAT canonical Huffman table (every DC category 4 bits, every AC
  run/size/EOBn symbol 8 bits). A flat table is spec-valid (the decoder
  reads whatever DHT declares) and removes any dependence on remembering
  the Annex-K code tables correctly; fixtures are tiny, so the
  compression loss is irrelevant.
- ``encode_jpeg_progressive``: SOF2 streams with a full progression
  script — interleaved DC first pass at Al=1, DC refinement, spectral-
  selection AC bands (1–5, 6–63) at Al=1 per component, then AC
  refinement passes (the correction-bit protocol with cross-block EOB
  runs), matching the shape of libjpeg's default progression.
- ``decode_jpeg``: a genuine multi-scan entropy decoder — marker walk,
  DQT/DHT/SOF0/SOF2/SOS/DRI parsing, canonical Huffman decode (mincode/
  maxcode/valptr per T.81 F.2.2.3), DC-prediction EXTEND, progressive
  coefficient accumulation across scans (spectral selection, DC/AC
  successive approximation, EOB runs, AC refinement correction bits),
  zigzag de-ordering, dequantization, fixed-point integer IDCT, chroma
  upsampling by sample replication, and JFIF YCbCr→RGB. Restart markers
  reset the DC predictors / EOB runs and byte-align, per spec.
- ``encode_jpeg_lossless`` / SOF3 decode (r07): predictive Huffman
  coding per annex H, all seven predictors, components stored raw —
  bit-exact round-trip, so the query carries a FULL per-pixel oracle.
- Arithmetic-coded (SOF9+), 12-bit, and hierarchical streams
  raise ``ValueError`` with a named reason — the narrowed gate (now:
  those JPEG rarities and MP3), pinned by pytest like every other
  environment gate.

Oracle design (the house exact-arithmetic pattern): the fixture images
are PIECEWISE-CONSTANT per 8×8 block. The DCT of a constant block is
DC-only (the float FDCT's ~1e-13 AC residue quantizes to exactly zero),
the encoder computes the DC losslessly (sum/8 − 1024 — dyadic, exact in
float64), and the decoder takes the same DC-only shortcut libjpeg's
integer IDCT takes: ``((dc·Q + 4) >> 3) + 128`` clamped. Every decoded
pixel is therefore the closed form

    clamp(floor((round(8·(c−128)/Q00)·Q00 + 4) / 8) + 128, 0, 255)

which DuckDB replays per block with integer/dyadic arithmetic — a
Huffman mis-decode, zigzag slip, dequant or predictor bug shifts a block
value and breaks the hash. General (non-constant) content is covered by
round-trip and malformed-payload property tests, l29-style.

Scale note: decode runs inside the standard mapInPandas media kernel —
map-side-only over binaryFile splits, per-image scalars are all that
shuffles. The entropy loop is per-image Python (fixtures are ≤48×48);
at 100 TB a real deployment swaps the body for a C-accelerated decode
behind the SAME kernel contract, which is the point of keeping the
Arrow plumbing, quarantine behavior, and oracles codec-independent.
"""

from __future__ import annotations

import struct

import numpy as np

from .multimodal import codec_guard as _codec_guard

# --- tables (ITU-T T.81 Annex K quantization; zigzag per Figure 5) ---------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = the Annex-K table verbatim, 100 → all 1s."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# --- flat canonical Huffman tables ------------------------------------------

_DC_SYMBOLS = list(range(12))  # DC size categories 0..11
_AC_SYMBOLS = (
    [0x00, 0xF0]  # EOB, ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]  # run/size
    + [n << 4 for n in range(1, 15)]  # EOBn run symbols (progressive scans)
)
_DC_LEN, _AC_LEN = 4, 8  # 12 < 2^4-1 and 162 < 2^8-1: valid canonical codes


def _flat_table(symbols: list[int], length: int):
    """(bits-per-length[1..16], symbols, {sym: (code, len)}) for a canonical
    table where every symbol has the same code length."""
    bits = [0] * 17
    bits[length] = len(symbols)
    enc = {sym: (i, length) for i, sym in enumerate(symbols)}
    return bits, symbols, enc


# --- bit I/O -----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing per B.1.1.5
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1 bits per B.1.1.5
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over one entropy-coded segment (already unstuffed)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted mid-block")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


# --- Huffman decode tables (T.81 F.2.2.3 canonical construction) ------------


class _HuffTable:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        if sum(bits[1:]) != len(vals):
            raise ValueError("DHT: bits counts disagree with value count")
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln]
                k += bits[ln]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = r.bit()
        ln = 1
        while code > self.maxcode[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("invalid Huffman code (no symbol at any length)")
            code = (code << 1) | r.bit()
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


def _extend(v: int, s: int) -> int:
    """F.2.2.1 EXTEND: map the s magnitude bits to a signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# --- fixed-point integer IDCT ------------------------------------------------
# The Loeffler–Ligtenberg–Moshovitz 8-point IDCT in 13-bit fixed point
# (the published algorithm behind every "islow" implementation), vectorized
# over blocks in int64 so no intermediate can overflow. DC-only blocks take
# the exact shortcut ((dc + 4) >> 3), which is what the oracle replays.

_CBITS, _P1BITS = 13, 2
_F0_298631336 = 2446
_F0_390180644 = 3196
_F0_541196100 = 4433
_F0_765366865 = 6270
_F0_899976223 = 7373
_F1_175875602 = 9633
_F1_501321110 = 12299
_F1_847759065 = 15137
_F1_961570560 = 16069
_F2_053119869 = 16819
_F2_562915447 = 20995
_F3_072711026 = 25172


def _idct_1d(s, descale: int):
    """One LLM butterfly over axis -1 of ``s`` (..., 8) int64."""
    s0, s1, s2, s3, s4, s5, s6, s7 = (s[..., i] for i in range(8))
    z1 = (s2 + s6) * _F0_541196100
    tmp2 = z1 - s6 * _F1_847759065
    tmp3 = z1 + s2 * _F0_765366865
    tmp0 = (s0 + s4) << _CBITS
    tmp1 = (s0 - s4) << _CBITS
    t10, t13 = tmp0 + tmp3, tmp0 - tmp3
    t11, t12 = tmp1 + tmp2, tmp1 - tmp2
    z1 = s7 + s1
    z2 = s5 + s3
    z3 = s7 + s3
    z4 = s5 + s1
    z5 = (z3 + z4) * _F1_175875602
    o0 = s7 * _F0_298631336
    o1 = s5 * _F2_053119869
    o2 = s3 * _F3_072711026
    o3 = s1 * _F1_501321110
    z1 = z1 * -_F0_899976223
    z2 = z2 * -_F2_562915447
    z3 = z3 * -_F1_961570560 + z5
    z4 = z4 * -_F0_390180644 + z5
    o0 += z1 + z3
    o1 += z2 + z4
    o2 += z2 + z3
    o3 += z1 + z4
    half = 1 << (descale - 1)
    out = np.stack(
        [
            (t10 + o3 + half) >> descale,
            (t11 + o2 + half) >> descale,
            (t12 + o1 + half) >> descale,
            (t13 + o0 + half) >> descale,
            (t13 - o0 + half) >> descale,
            (t12 - o1 + half) >> descale,
            (t11 - o2 + half) >> descale,
            (t10 - o3 + half) >> descale,
        ],
        axis=-1,
    )
    return out


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) int64 dequantized coefficients → (n, 8, 8) uint8 samples
    (level-shifted +128, clamped). DC-only blocks short-circuit to the
    exact ``(dc + 4) >> 3`` the oracle replays."""
    coefs = coefs.astype(np.int64)
    n = len(coefs)
    out = np.empty((n, 8, 8), dtype=np.int64)
    flat = coefs.reshape(n, 64)
    dc_only = (flat[:, 1:] == 0).all(axis=1)
    if dc_only.any():
        dcval = (flat[dc_only, 0] + 4) >> 3
        out[dc_only] = dcval[:, None, None]
    rest = ~dc_only
    if rest.any():
        c = coefs[rest]
        # pass 1 over columns (transform axis = rows index), then rows
        p1 = _idct_1d(np.swapaxes(c, -1, -2), _CBITS - _P1BITS)
        p1 = np.swapaxes(p1, -1, -2)
        out[rest] = _idct_1d(p1, _CBITS + _P1BITS + 3)
    return np.clip(out + 128, 0, 255).astype(np.uint8)


# --- forward DCT (encoder side; float64, DC recomputed exactly) -------------

_DCT_BASIS = None


def _dct_basis() -> np.ndarray:
    global _DCT_BASIS
    if _DCT_BASIS is None:
        k = np.arange(8)
        b = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
        b[0] /= np.sqrt(2.0)
        _DCT_BASIS = b
    return _DCT_BASIS


def fdct_quantized(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n, 8, 8) uint8 samples → (n, 64) int64 zigzagged quantized coefs.
    The DC is recomputed as sum/8 − 1024 (exact in float64 — dyadic), so
    constant blocks quantize to the closed form the oracle uses; the
    quantizer is sign·floor(|S|/Q + 0.5), mirrored by the SQL."""
    x = blocks.astype(np.float64) - 128.0
    b = _dct_basis()
    s = np.einsum("ux,nxy,vy->nuv", b, x, b)
    s[:, 0, 0] = blocks.reshape(len(blocks), 64).astype(np.float64).sum(axis=1) / 8.0 - 1024.0
    flat = s.reshape(len(s), 64)[:, ZIGZAG]
    qzig = q.reshape(64)[ZIGZAG]
    quant = np.sign(flat) * np.floor(np.abs(flat) / qzig + 0.5)
    return np.clip(quant, -1023, 1023).astype(np.int64)


# --- encoder -----------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.clip(np.floor(np.stack([y, cb, cr], axis=-1) + 0.5), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.floor(np.stack([r, g, b], axis=-1) + 0.5), 0, 255).astype(np.uint8)


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % bh, -w % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane → (n, 8, 8) blocks in raster MCU order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2).reshape(-1, 8, 8)
    )


def _encode_block(
    coefs: np.ndarray, pred: int, dc_enc: dict, ac_enc: dict, w: _BitWriter
) -> int:
    dc = int(coefs[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    code, ln = dc_enc[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coefs[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            w.put(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]  # EOB
        w.put(code, ln)
    return dc


def encode_jpeg_baseline(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Serialize (h, w) uint8 grayscale or (h, w, 3) uint8 RGB as a baseline
    sequential JFIF stream. ``subsample=True`` emits 4:2:0 (2×2 chroma
    average); grayscale ignores it. ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that-many MCUs (predictors reset,
    byte-aligned) — crawl JPEGs carry these, so the decoder's restart
    path is round-trip testable against our own streams."""
    if px.dtype != np.uint8 or px.ndim not in (2, 3):
        raise ValueError(f"expected (h,w[,3]) uint8 pixels, got {px.shape} {px.dtype}")
    gray = px.ndim == 2
    if not gray and px.shape[2] != 3:
        raise ValueError("color images must have exactly 3 channels")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("degenerate image dimensions")
    qlum = quality_scaled(QUANT_LUM, quality)
    qchr = quality_scaled(QUANT_CHROM, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qlum),) + (() if gray else ((1, qchr),)):
        zz = q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz
    # SOF0
    samp = (2, 2) if (subsample and not gray) else (1, 1)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    comps = [(1, samp[0], samp[1], 0)] if not gray else [(1, 1, 1, 0)]
    if not gray:
        comps += [(2, 1, 1, 1), (3, 1, 1, 1)]
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: flat tables; ids 0 (DC) and 0 (AC), reused by chroma for brevity
    dc_bits, dc_vals, dc_enc = _flat_table(_DC_SYMBOLS, _DC_LEN)
    ac_bits, ac_vals, ac_enc = _flat_table(_AC_SYMBOLS, _AC_LEN)
    for cls, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        body = bytes([cls << 4]) + bytes(bits[1:]) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # planes
    if gray:
        planes = [px]
        qs = [qlum]
    else:
        ycc = _rgb_to_ycbcr(px)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            yp = _pad_to_blocks(y, 16, 16)
            # 2x2 chroma average (integer, round-half-up) on the padded grid
            def ds(p):
                p = _pad_to_blocks(p, 16, 16).astype(np.int64)
                return (
                    (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2)
                    // 4
                ).astype(np.uint8)

            planes = [yp, ds(cb), ds(cr)]
        else:
            planes = [_pad_to_blocks(p, 8, 8) for p in (y, cb, cr)]
        qs = [qlum, qchr, qchr]

    state = {"wtr": _BitWriter(), "preds": [0] * len(planes), "rst": 0, "mcu": 0}

    def end_mcu(total: int) -> None:
        """After each MCU: flush + RSTn + predictor reset at the interval."""
        state["mcu"] += 1
        if (
            restart_interval
            and state["mcu"] % restart_interval == 0
            and state["mcu"] < total
        ):
            out.extend(state["wtr"].flush())
            out.extend(bytes([0xFF, 0xD0 + state["rst"] % 8]))
            state["rst"] += 1
            state["wtr"] = _BitWriter()
            state["preds"] = [0] * len(planes)

    if gray or not subsample:
        # every component 1×1 → MCU = one block per component, interleaved
        # in raster order
        padded = [_pad_to_blocks(p, 8, 8) for p in planes]
        nby, nbx = padded[0].shape[0] // 8, padded[0].shape[1] // 8
        coefs = [
            fdct_quantized(_plane_blocks(p), q).reshape(nby, nbx, 64)
            for p, q in zip(padded, qs)
        ]
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(len(planes)):
                    state["preds"][ci] = _encode_block(
                        coefs[ci][by, bx], state["preds"][ci], dc_enc, ac_enc, state["wtr"]
                    )
                end_mcu(nby * nbx)
    else:
        # 4:2:0 MCU: 4 Y blocks (2×2) + 1 Cb + 1 Cr
        yv, cbv, crv = planes
        nmy, nmx = yv.shape[0] // 16, yv.shape[1] // 16
        yb = fdct_quantized(_plane_blocks(yv), qs[0]).reshape(nmy * 2, nmx * 2, 64)
        cbb = fdct_quantized(_plane_blocks(cbv), qs[1]).reshape(nmy, nmx, 64)
        crb = fdct_quantized(_plane_blocks(crv), qs[2]).reshape(nmy, nmx, 64)
        for my in range(nmy):
            for mx in range(nmx):
                for dy in range(2):
                    for dx in range(2):
                        state["preds"][0] = _encode_block(
                            yb[my * 2 + dy, mx * 2 + dx],
                            state["preds"][0], dc_enc, ac_enc, state["wtr"],
                        )
                state["preds"][1] = _encode_block(
                    cbb[my, mx], state["preds"][1], dc_enc, ac_enc, state["wtr"]
                )
                state["preds"][2] = _encode_block(
                    crb[my, mx], state["preds"][2], dc_enc, ac_enc, state["wtr"]
                )
                end_mcu(nmy * nmx)
    out += state["wtr"].flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder ------------------------------------------------------


def _prog_components(px: np.ndarray, quality: int, subsample: bool):
    """(comps meta, zigzag-quantized grids {id: (bh, bw, 64)}, header info)
    shared by the progressive scan emitters. Grids are interleaved
    (MCU-padded) like the decoder's state arrays."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qlum = quality_scaled(QUANT_LUM, quality)
    qchr = quality_scaled(QUANT_CHROM, quality)
    if gray:
        plane = _pad_to_blocks(px, 8, 8)
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        grids = {1: fdct_quantized(_plane_blocks(plane), qlum).reshape(nby, nbx, 64)}
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "bh": nby, "bw": nbx,
                  "cx": -(-w // 8), "cy": -(-h // 8)}]
        return comps, grids, (h, w, [qlum]), (1, 1)
    ycc = _rgb_to_ycbcr(px)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    if subsample:
        yp = _pad_to_blocks(y, 16, 16)

        def ds(p):
            p = _pad_to_blocks(p, 16, 16).astype(np.int64)
            return (
                (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2)
                // 4
            ).astype(np.uint8)

        planes = [yp, ds(cb), ds(cr)]
        hv = [(2, 2), (1, 1), (1, 1)]
        hmax = vmax = 2
    else:
        planes = [_pad_to_blocks(p, 8, 8) for p in (y, cb, cr)]
        hv = [(1, 1)] * 3
        hmax = vmax = 1
    qs = [qlum, qchr, qchr]
    grids, comps = {}, []
    for i, (p, (ch, cv), q) in enumerate(zip(planes, hv, qs)):
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        grids[i + 1] = fdct_quantized(_plane_blocks(p), q).reshape(nby, nbx, 64)
        comps.append({
            "id": i + 1, "h": ch, "v": cv, "tq": 0 if i == 0 else 1,
            "bh": nby, "bw": nbx,
            "cx": -(-((w * ch + hmax - 1) // hmax) // 8),
            "cy": -(-((h * cv + vmax - 1) // vmax) // 8),
        })
    return comps, grids, (h, w, [qlum, qchr]), (hmax, vmax)


class _EobRun:
    """Cross-block EOB-run accumulator for progressive AC scans, carrying
    the correction bits that the spec defers until the run is coded."""

    def __init__(self, w: _BitWriter, ac_enc: dict) -> None:
        self.w = w
        self.ac_enc = ac_enc
        self.run = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.run:
            n = self.run.bit_length() - 1
            code, ln = self.ac_enc[n << 4]
            self.w.put(code, ln)
            if n:
                self.w.put(self.run - (1 << n), n)
            for b in self.bits:
                self.w.put(b, 1)
            self.run = 0
            self.bits = []

    def add(self, bits: list[int]) -> None:
        self.run += 1
        self.bits += bits
        if self.run == 0x7FFF:
            self.flush()


def _emit_ac_first(w, grid, cx, cy, ss, se, al, ac_enc):
    eob = _EobRun(w, ac_enc)
    for by in range(cy):
        for bx in range(cx):
            coef = grid[by, bx]
            r = 0
            any_sig = False
            for k in range(ss, se + 1):
                v = int(coef[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                eob.flush()
                while r > 15:
                    code, ln = ac_enc[0xF0]
                    w.put(code, ln)
                    r -= 16
                s = t.bit_length()
                code, ln = ac_enc[(r << 4) | s]
                w.put(code, ln)
                vv = t if v > 0 else -t
                w.put(vv if vv >= 0 else vv + (1 << s) - 1, s)
                r = 0
                any_sig = True
            if r > 0 or not any_sig:
                eob.add([])
    eob.flush()


def _emit_ac_refine(w, grid, cx, cy, ss, se, al, ac_enc):
    for_bit = lambda v: (abs(int(v)) >> al) & 1  # noqa: E731
    eob = _EobRun(w, ac_enc)
    for by in range(cy):
        for bx in range(cx):
            coef = grid[by, bx]
            absv = [abs(int(coef[k])) >> al for k in range(ss, se + 1)]
            eobidx = ss - 1
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eobidx = k
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobidx:
                    eob.flush()
                    code, ln = ac_enc[0xF0]
                    w.put(code, ln)
                    r -= 16
                    for b in br:
                        w.put(b, 1)
                    br = []
                if t > 1:
                    br.append(for_bit(coef[k]))
                    continue
                eob.flush()
                code, ln = ac_enc[(r << 4) | 1]
                w.put(code, ln)
                w.put(1 if int(coef[k]) > 0 else 0, 1)
                for b in br:
                    w.put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eob.add(br)
    eob.flush()


def encode_jpeg_progressive(
    px: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """Serialize pixels as a PROGRESSIVE (SOF2) JFIF stream with a scan
    script exercising every progressive mechanism: interleaved DC first
    pass at Al=1, DC refinement, per-component spectral-selection AC
    bands (1–5, 6–63) at Al=1, then AC refinement passes for both bands
    — the same successive-approximation shape libjpeg's default
    progression uses. Decodes bit-identically to the baseline encoding
    of the same pixels (same quantized coefficients, same IDCT) —
    pytest-pinned."""
    if px.dtype != np.uint8 or px.ndim not in (2, 3):
        raise ValueError(f"expected (h,w[,3]) uint8 pixels, got {px.shape} {px.dtype}")
    if px.ndim == 3 and px.shape[2] != 3:
        raise ValueError("color images must have exactly 3 channels")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("degenerate image dimensions")
    comps, grids, (_, _, qtabs), (hmax, vmax) = _prog_components(
        px, quality, subsample
    )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(qtabs):
        zz = q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dc_bits, dc_vals, dc_enc = _flat_table(_DC_SYMBOLS, _DC_LEN)
    ac_bits, ac_vals, ac_enc = _flat_table(_AC_SYMBOLS, _AC_LEN)
    for cls, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        body = bytes([cls << 4]) + bytes(bits[1:]) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(sel: list[int], ss: int, se: int, ah: int, al: int, entropy: bytes):
        hdr = bytes([len(sel)])
        for cid in sel:
            hdr += bytes([cid, 0x00])
        hdr += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr + entropy)

    all_ids = [c["id"] for c in comps]
    by_id = {c["id"]: c for c in comps}

    # scan 1: DC first pass, Al=1 (interleaved when multi-component)
    wtr = _BitWriter()
    preds = {cid: 0 for cid in all_ids}
    if len(comps) == 1:
        c = comps[0]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                preds[c["id"]] = _emit_dc_first(
                    wtr, grids[c["id"]][by, bx], preds[c["id"]], 1, dc_enc
                )
    else:
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for c in comps:
                for dv in range(c["v"]):
                    for dh in range(c["h"]):
                        preds[c["id"]] = _emit_dc_first(
                            wtr,
                            grids[c["id"]][my * c["v"] + dv, mx * c["h"] + dh],
                            preds[c["id"]], 1, dc_enc,
                        )
    sos(all_ids, 0, 0, 0, 1, wtr.flush())
    # scan 2: DC refinement (bit 0) — same block order, raw bits only
    wtr = _BitWriter()
    if len(comps) == 1:
        c = comps[0]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                wtr.put(int(grids[c["id"]][by, bx][0]) & 1, 1)
    else:
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for c in comps:
                for dv in range(c["v"]):
                    for dh in range(c["h"]):
                        wtr.put(
                            int(grids[c["id"]][my * c["v"] + dv, mx * c["h"] + dh][0]) & 1,
                            1,
                        )
    sos(all_ids, 0, 0, 1, 0, wtr.flush())
    # per component: AC bands first pass then refinement
    for cid in all_ids:
        c = by_id[cid]
        for ss, se in ((1, 5), (6, 63)):
            wtr = _BitWriter()
            _emit_ac_first(wtr, grids[cid], c["cx"], c["cy"], ss, se, 1, ac_enc)
            sos([cid], ss, se, 0, 1, wtr.flush())
    for cid in all_ids:
        c = by_id[cid]
        for ss, se in ((1, 5), (6, 63)):
            wtr = _BitWriter()
            _emit_ac_refine(wtr, grids[cid], c["cx"], c["cy"], ss, se, 0, ac_enc)
            sos([cid], ss, se, 1, 0, wtr.flush())
    out += b"\xff\xd9"
    return bytes(out)


def _emit_dc_first(w: _BitWriter, coef, pred: int, al: int, dc_enc: dict) -> int:
    d = int(coef[0]) >> al
    diff = d - pred
    s = abs(diff).bit_length()
    code, ln = dc_enc[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    return d


# --- decoder -----------------------------------------------------------------

_UNSUPPORTED_SOF = {
    0xC1: "extended sequential",
    0xC5: "differential sequential",
    0xC6: "differential progressive",
    0xC7: "differential lossless",
    0xC9: "arithmetic sequential",
    0xCA: "arithmetic progressive",
    0xCB: "arithmetic lossless",
    0xCD: "differential arithmetic sequential",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}


@_codec_guard
def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) or PROGRESSIVE (SOF2) JPEG to (h, w)
    uint8 grayscale or (h, w, 3) uint8 RGB. Progressive streams
    accumulate coefficients across scans — spectral selection, DC and AC
    successive approximation (including the AC refinement correction-bit
    protocol), and EOB runs are all implemented; the dequant/IDCT tail
    is shared with baseline, so a coefficient reaching the same value by
    either route decodes to the same pixel. LOSSLESS (SOF3) streams
    decode through the predictive path (r07). Raises ``ValueError`` on
    anything malformed or outside the gate (arithmetic-coded / 12-bit /
    hierarchical) — callers in the media kernels quarantine such rows."""
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    state = None  # per-component zigzag coefficient grids + DC-refine flags
    restart_interval = 0
    saw_scan = False
    while True:
        if pos + 2 > len(buf):
            raise ValueError("truncated JPEG (no SOS/EOI)")
        if buf[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(buf):
            raise ValueError("truncated marker segment header")
        ln = struct.unpack(">H", buf[pos : pos + 2])[0]
        seg = buf[pos + 2 : pos + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated marker segment")
        if marker in _UNSUPPORTED_SOF:
            raise ValueError(f"unsupported JPEG mode: {_UNSUPPORTED_SOF[marker]}")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(seg[off + 1 : off + 65], dtype=np.uint8)
                if len(zz) != 64:
                    raise ValueError("short DQT segment")
                tab = np.empty(64, dtype=np.int64)
                tab[ZIGZAG] = zz
                qtables[tq] = tab.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                if off + 17 > len(seg):
                    raise ValueError("short DHT segment")
                cls, tid = seg[off] >> 4, seg[off] & 0xF
                bits = [0] + list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                htables[(cls, tid)] = _HuffTable(bits, vals)
                off += 17 + nv
        elif marker == 0xC3:  # SOF3 lossless (predictive, no DCT)
            if len(seg) < 6:
                raise ValueError("short SOF3 segment")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if len(seg) < 6 + 3 * nc:
                raise ValueError("short SOF3 component list")
            if prec != 8:
                raise ValueError(
                    f"{prec}-bit lossless precision unsupported (8-bit only)"
                )
            if not 1 <= nc <= 4:
                raise ValueError(f"{nc}-component frame out of range")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled lossless JPEG unsupported (1x1 only)"
                    )
                comps.append({"id": cid, "h": 1, "v": 1, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "lossless": True}
            state = {
                c["id"]: np.zeros((h, w), dtype=np.int64) for c in comps
            }
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if len(seg) < 6:
                raise ValueError("short SOF segment")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if len(seg) < 6 + 3 * nc:
                raise ValueError("short SOF component list")
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported (8-bit only)")
            if not 1 <= nc <= 4:
                raise ValueError(f"{nc}-component frame out of range")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(f"sampling factors {ch}x{cv} out of spec range")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]  # interleaved (MCU-padded) block grid
                c["bh"] = mcuy * c["v"]
                # non-interleaved scans cover only the ceil-sized grid
                c["cx"] = -(-((w * c["h"] + hmax - 1) // hmax) // 8)
                c["cy"] = -(-((h * c["v"] + vmax - 1) // vmax) // 8)
            frame = {
                "h": h, "w": w, "comps": comps,
                "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
                "progressive": marker == 0xC2,
            }
            state = {
                c["id"]: np.zeros((c["bh"], c["bw"], 64), dtype=np.int64)
                for c in comps
            }
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("short DRI segment")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(seg) < 1 or len(seg) < 4 + 2 * seg[0]:
                raise ValueError("short SOS segment")
            ns = seg[0]
            sel = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                sel.append((cs, tabs >> 4, tabs & 0xF))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if frame.get("lossless"):
                segments, end = _entropy_segments(buf, pos + ln)
                _apply_lossless_scan(
                    frame, state, sel, ss, se, ah, al, segments, htables,
                    restart_interval,
                )
                saw_scan = True
                pos = end
                continue
            if not frame["progressive"] and (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("baseline scan with progressive parameters")
            segments, end = _entropy_segments(buf, pos + ln)
            _apply_scan(
                frame, state, sel, (ss, se, ah, al), segments, htables,
                restart_interval,
            )
            saw_scan = True
            pos = end
            continue
        pos += ln
    if not saw_scan:
        raise ValueError("EOI before SOS (no image data)")
    if frame.get("lossless"):
        return _finish_lossless(frame, state)
    return _finish_frame(frame, state, qtables)


def _lossless_predict(plane, y: int, x: int, sv: int, default: int) -> int:
    """T.81 H.1.2: first sample → 2^(P-1); rest of the first line → Ra;
    first column → Rb; everywhere else the scan's selected predictor
    (shifts are arithmetic/floor, per the spec's integer division)."""
    if y == 0:
        return int(plane[y, x - 1]) if x else default
    if x == 0:
        return int(plane[y - 1, x])
    ra = int(plane[y, x - 1])
    rb = int(plane[y - 1, x])
    rc = int(plane[y - 1, x - 1])
    if sv == 1:
        return ra
    if sv == 2:
        return rb
    if sv == 3:
        return rc
    if sv == 4:
        return ra + rb - rc
    if sv == 5:
        return ra + ((rb - rc) >> 1)
    if sv == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # sv == 7


def _apply_lossless_scan(
    frame, state, sel, sv, se, ah, al, segments, htables, restart_interval
):
    """One SOF3 scan: raster order, one Huffman-coded DIFF per sample
    (DC-style categories; SSSS=16 is the no-extra-bits 32768 case),
    interleaved across the scan's components, modulo-2^16 arithmetic.
    A restart resets prediction to the SCAN-START rules, per H.1.1: the
    interval's first sample predicts from the default (2^(P-1)) and the
    REMAINDER OF THAT LINE uses the Ra (left-neighbor) predictor — not
    just the single restart sample (ADVICE r07); later lines resume the
    selected predictor."""
    if not 1 <= sv <= 7:
        raise ValueError(f"lossless predictor {sv} out of range 1-7")
    if se != 0 or ah != 0:
        raise ValueError("bad lossless scan parameters (Se/Ah must be 0)")
    if al != 0:
        raise ValueError("lossless point transform unsupported")
    comps = []
    for cs, dsel, _asel in sel:
        if cs not in state:
            raise ValueError(f"scan selects unknown component {cs}")
        tab = htables.get((0, dsel))
        if tab is None:
            raise ValueError(f"scan references missing DC table {dsel}")
        comps.append((cs, tab))
    h, w = frame["h"], frame["w"]
    default = 1 << 7  # 2^(P-1), P=8
    seg_idx = 0
    rdr = _BitReader(segments[0])
    fresh = {cs: False for cs, _ in comps}  # post-restart prediction reset
    restart_y = 0  # row holding the current interval's first line
    count = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing restart segment in lossless scan")
                rdr = _BitReader(segments[seg_idx])
                for cs, _ in comps:
                    fresh[cs] = True
                restart_y = y
            for cs, tab in comps:
                plane = state[cs]
                if fresh[cs]:
                    pred = default
                    fresh[cs] = False
                elif y == restart_y:
                    # the interval's first line: Ra to the row's end
                    # (scan start is interval 0 — same first-line rule)
                    pred = int(plane[y, x - 1]) if x else default
                else:
                    pred = _lossless_predict(plane, y, x, sv, default)
                s = tab.decode(rdr)
                if s > 16:
                    raise ValueError(f"lossless DIFF category {s} out of range")
                if s == 16:
                    diff = 32768
                elif s:
                    diff = _extend(rdr.bits(s), s)
                else:
                    diff = 0
                plane[y, x] = (pred + diff) & 0xFFFF
            count += 1


def _finish_lossless(frame, state) -> np.ndarray:
    planes = [
        np.clip(state[c["id"]], 0, 255).astype(np.uint8)
        for c in frame["comps"]
    ]
    if len(planes) == 1:
        return planes[0]
    if len(planes) == 3:
        return np.stack(planes, axis=2)  # components stored raw (RGB)
    raise ValueError(f"{len(planes)}-component lossless output unsupported")


def encode_jpeg_lossless(
    px: np.ndarray, predictor: int = 4, restart_interval: int = 0
) -> bytes:
    """Serialize pixels as a LOSSLESS (SOF3) JPEG: no DCT, no
    quantization — each sample is a Huffman-coded difference from its
    neighborhood prediction (T.81 annex H). Components are stored RAW
    (grayscale or RGB, 1x1 sampling), so decode is bit-exact:
    decode_jpeg(encode_jpeg_lossless(px)) == px for every input, which
    is what lets mm_jpeg_lossless carry a FULL per-pixel oracle like
    PNG/FLAC. Uses a flat 5-bit table over the 17 DIFF categories.
    ``restart_interval`` > 0 emits DRI + byte-aligned RSTn every that
    many samples with the H.1.1 prediction reset (default at the
    interval start, Ra for the rest of that line) — the round-trip
    oracle for the decoder's restart path (ADVICE r07)."""
    if px.dtype != np.uint8 or px.ndim not in (2, 3):
        raise ValueError(f"expected (h,w[,3]) uint8 pixels, got {px.shape} {px.dtype}")
    if px.ndim == 3 and px.shape[2] != 3:
        raise ValueError("color images must have exactly 3 channels")
    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor {predictor} out of range 1-7")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("degenerate image dimensions")
    planes = [px] if px.ndim == 2 else [px[:, :, i] for i in range(3)]
    nc = len(planes)
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    bits, vals, enc = _flat_table(list(range(17)), 5)
    body = bytes([0x00]) + bytes(bits[1:]) + bytes(vals)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    hdr = bytes([nc])
    for i in range(nc):
        hdr += bytes([i + 1, 0x00])
    hdr += bytes([predictor, 0, 0])  # Ss=predictor, Se=0, AhAl=0
    wtr = _BitWriter()
    default = 1 << 7
    iplanes = [p.astype(np.int64) for p in planes]
    scan = bytearray()
    rst = count = 0
    fresh = False
    restart_y = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                scan += wtr.flush()
                scan += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                wtr = _BitWriter()
                fresh = True
                restart_y = y
            for p in iplanes:
                if fresh:
                    pred = default
                elif y == restart_y:
                    pred = int(p[y, x - 1]) if x else default
                else:
                    pred = _lossless_predict(p, y, x, predictor, default)
                d = int(p[y, x]) - pred
                d = ((d + 32768) & 0xFFFF) - 32768
                if d == -32768:
                    s = 16
                else:
                    s = abs(d).bit_length()
                code, ln = enc[s]
                wtr.put(code, ln)
                if 0 < s < 16:
                    wtr.put(d if d >= 0 else d + (1 << s) - 1, s)
            fresh = False
            count += 1
    out += b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr + scan + wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_baseline(buf: bytes) -> np.ndarray:
    """Kept name from the baseline-only round-6 codec; now decodes
    progressive streams too (see :func:`decode_jpeg`)."""
    return decode_jpeg(buf)


def _entropy_segments(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy-coded data into restart segments
    (unstuffing 0xFF00); returns (segments, position of the next marker)."""
    segments: list[bytearray] = [bytearray()]
    i = pos
    while i < len(buf):
        b = buf[i]
        if b == 0xFF:
            nxt = buf[i + 1] if i + 1 < len(buf) else None
            if nxt == 0x00:
                segments[-1].append(0xFF)
                i += 2
                continue
            if nxt is not None and 0xD0 <= nxt <= 0xD7:
                segments.append(bytearray())
                i += 2
                continue
            break  # EOI or another marker: end of scan
        segments[-1].append(b)
        i += 1
    return [bytes(s) for s in segments], i


def _apply_scan(frame, state, sel, ssal, segments, htables, restart_interval):
    ss, se, ah, al = ssal
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    progressive = frame["progressive"]
    if ss > 0 and len(sel) != 1:
        raise ValueError("AC scans must be non-interleaved (one component)")
    if ss == 0 and progressive and se != 0:
        raise ValueError("progressive DC scan must have Se = 0")

    def tables(cs, dsel, asel, need_dc, need_ac):
        dct = htables.get((0, dsel)) if need_dc else None
        act = htables.get((1, asel)) if need_ac else None
        if need_dc and dct is None:
            raise ValueError(f"scan references undeclared DC table {dsel}")
        if need_ac and act is None:
            raise ValueError(f"scan references undeclared AC table {asel}")
        return dct, act

    seg_idx = 0
    rdr = _BitReader(segments[0])
    preds = {c["id"]: 0 for c in comps}
    eobrun = 0

    def restart(unit: int) -> None:
        nonlocal seg_idx, rdr, preds, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            rdr = _BitReader(segments[seg_idx])
            preds = {c["id"]: 0 for c in comps}
            eobrun = 0

    if len(sel) > 1 or (ss == 0 and not progressive):
        # interleaved MCU scan: baseline full blocks, or progressive DC
        order = [(by_id[cs], d, a) for cs, d, a in sel]
        for mcu in range(frame["mcux"] * frame["mcuy"]):
            restart(mcu)
            my, mx = divmod(mcu, frame["mcux"])
            for c, dsel, asel in order:
                dct, act = tables(
                    c["id"], dsel, asel, True, not progressive
                )
                for dv in range(c["v"]):
                    for dh in range(c["h"]):
                        coef = state[c["id"]][my * c["v"] + dv, mx * c["h"] + dh]
                        if progressive:
                            if ah == 0:
                                preds[c["id"]] = _dc_first(
                                    rdr, dct, coef, preds[c["id"]], al
                                )
                            else:
                                coef[0] |= rdr.bit() << al
                        else:
                            preds[c["id"]] = _full_block(
                                rdr, dct, act, coef, preds[c["id"]]
                            )
    else:
        # non-interleaved scan over the component's ceil-sized block grid
        cs, dsel, asel = sel[0]
        c = by_id[cs]
        dct, act = tables(cs, dsel, asel, ss == 0, ss > 0 or not progressive)
        # T.81 A.2.2: every non-interleaved scan covers the component's
        # ceil-sized grid (cx, cy), never the MCU-padded bh/bw — using the
        # padded grid desyncs the entropy decoder on external multi-SOS
        # baseline or progressive-DC streams with subsampled components.
        unit = 0
        for by in range(c["cy"]):
            for bx in range(c["cx"]):
                restart(unit)
                unit += 1
                coef = state[cs][by, bx]
                if not progressive:
                    preds[cs] = _full_block(rdr, dct, act, coef, preds[cs])
                elif ss == 0:
                    if ah == 0:
                        preds[cs] = _dc_first(rdr, dct, coef, preds[cs], al)
                    else:
                        coef[0] |= rdr.bit() << al
                elif ah == 0:
                    eobrun = _ac_first(rdr, act, coef, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(rdr, act, coef, ss, se, al, eobrun)


def _full_block(rdr, dct, act, coef, pred):
    """Baseline: one complete (DC + all AC) block into zigzag ``coef``."""
    s = dct.decode(rdr)
    if s > 11:
        raise ValueError(f"DC category {s} out of range")
    pred += _extend(rdr.bits(s), s) if s else 0
    coef[0] = pred
    k = 1
    while k < 64:
        rs = act.decode(rdr)
        r, sz = rs >> 4, rs & 0xF
        if sz == 0:
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            raise ValueError(f"invalid AC symbol {rs:#x}")
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(rdr.bits(sz), sz)
        k += 1
    return pred


def _dc_first(rdr, dct, coef, pred, al):
    s = dct.decode(rdr)
    if s > 11:
        raise ValueError(f"DC category {s} out of range")
    pred += _extend(rdr.bits(s), s) if s else 0
    coef[0] = pred << al
    return pred


def _ac_first(rdr, act, coef, ss, se, al, eobrun):
    """Progressive AC first pass (Ah = 0): band [ss, se] at precision Al,
    with EOB-run skipping of all-zero-band blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = act.decode(rdr)
        r, sz = rs >> 4, rs & 0xF
        if sz == 0:
            if r < 15:  # EOBn: this block ends; skip the next (run-1)
                return (1 << r) - 1 + (rdr.bits(r) if r else 0)
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past end of band")
        coef[k] = _extend(rdr.bits(sz), sz) << al
        k += 1
    return 0


def _ac_refine(rdr, act, coef, ss, se, al, eobrun):
    """Progressive AC refinement (Ah > 0): the correction-bit protocol —
    newly-significant coefficients arrive as ±1<<Al, and every
    already-nonzero coefficient passed along the way consumes one
    appended correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = act.decode(rdr)
            r, sz = rs >> 4, rs & 0xF
            val = 0
            if sz == 0:
                if r < 15:  # EOBn — fall through to the tail correction loop
                    eobrun = (1 << r) + (rdr.bits(r) if r else 0)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if sz != 1:
                    raise ValueError("refinement scan with magnitude > 1")
                val = p1 if rdr.bit() else m1
            while k <= se:
                if coef[k] != 0:
                    if rdr.bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0 and rdr.bit() and (coef[k] & p1) == 0:
                coef[k] += p1 if coef[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finish_frame(frame, state, qtables):
    """Shared tail: dequantize the accumulated zigzag coefficients,
    integer-IDCT, assemble each component's plane, upsample, color."""
    h, w = frame["h"], frame["w"]
    planes = {}
    for c in frame["comps"]:
        qt = qtables.get(c["tq"])
        if qt is None:
            raise ValueError(f"frame references undeclared quant table {c['tq']}")
        zz = state[c["id"]].reshape(-1, 64)
        raster = np.zeros_like(zz)
        raster[:, ZIGZAG] = zz
        raster *= qt.reshape(64)[None, :]
        arr = idct_blocks(raster.reshape(-1, 8, 8))
        grid = (
            arr.reshape(c["bh"], c["bw"], 8, 8)
            .swapaxes(1, 2)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        ry, rx = frame["vmax"] // c["v"], frame["hmax"] // c["h"]
        up = np.repeat(np.repeat(grid, ry, axis=0), rx, axis=1)
        planes[c["id"]] = up[:h, :w]
    comps = frame["comps"]
    if len(comps) == 1:
        return planes[comps[0]["id"]]
    if len(comps) == 3:
        ids = [c["id"] for c in comps]
        return _ycbcr_to_rgb(planes[ids[0]], planes[ids[1]], planes[ids[2]])
    raise ValueError(f"{len(comps)}-component JPEG unsupported")


# ---------------------------------------------------------------------------
# Registered query: mm_jpeg_decode — full-oracle JPEG decode
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T  # noqa: E402

from ..registry import query  # noqa: E402
from ..session import load_table  # noqa: E402

_JPG_N = 50
_JPG_QUALITY = 90
_JPG_FIXTURE_TAG = "jpeg-v2"  # v2: flat AC table gained the EOBn symbols
_JPG_Q00 = int(quality_scaled(QUANT_LUM, _JPG_QUALITY).reshape(64)[0])


def _jpg_block_dims(doc_id: int) -> tuple[int, int]:
    """(width, height) in 8×8 BLOCKS: 2–4 × 2–3 — multiples of 8 pixels, so
    no padding enters the oracle (padding is property-tested separately)."""
    return 2 + doc_id % 3, 2 + doc_id % 2


def _jpg_block_values(doc_id: int, wb: int, hb: int) -> np.ndarray:
    """(hb, wb) int block constants — closed-form integer arithmetic the
    SQL oracle replays: (doc_id*7 + bx*13 + by*29) % 256."""
    by, bx = np.meshgrid(np.arange(hb), np.arange(wb), indexing="ij")
    return (doc_id * 7 + bx * 13 + by * 29) % 256


def _jpg_pixels(doc_id: int) -> np.ndarray:
    wb, hb = _jpg_block_dims(doc_id)
    blocks = _jpg_block_values(doc_id, wb, hb)
    return np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)


def _ensure_jpeg_fixture(spark: SparkSession, sf_dir: str) -> str:
    """img_<doc_id>.jpg per document with doc_id < 50: grayscale baseline
    JPEG of piecewise-constant 8×8 blocks (same manifest-idempotence
    contract as the PPM/WAV fixtures). Every third image is encoded with
    a restart interval so the decoder's DRI/RSTn path runs on every real
    read, not just in unit tests."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ..sources.io import _scratch

    jpg_dir = _scratch(sf_dir, "jpeg_files")
    manifest = jpg_dir.rstrip("/") + ".manifest"
    ids = sorted(
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _JPG_N)
        .select("doc_id")
        .distinct()
        .collect()
    )
    tag = (
        _JPG_FIXTURE_TAG
        + ":"
        + _hashlib.sha256(",".join(map(str, ids)).encode()).hexdigest()
    )
    try:
        with open(manifest) as f:
            if f.read() == tag:
                return jpg_dir
    except FileNotFoundError:
        pass
    _shutil.rmtree(jpg_dir, ignore_errors=True)
    _os.makedirs(jpg_dir, exist_ok=True)
    for doc_id in ids:
        payload = encode_jpeg_baseline(
            _jpg_pixels(doc_id),
            quality=_JPG_QUALITY,
            restart_interval=2 if doc_id % 3 == 0 else 0,
        )
        with open(_os.path.join(jpg_dir, f"img_{doc_id}.jpg"), "wb") as f:
            f.write(payload)
    with open(manifest, "w") as f:  # written LAST: a crash mid-synth re-runs
        f.write(tag)
    return jpg_dir


_JPEG_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
    ]
)


def _jpeg_kernel(batches):
    import pandas as pd

    for pdf in batches:
        out = {"media_id": [], "width": [], "height": [], "px_sum": []}
        for media_id, content in zip(pdf["media_id"], pdf["content"]):
            out["media_id"].append(int(media_id))
            try:
                px = decode_jpeg_baseline(bytes(content))
                out["width"].append(int(px.shape[1]))
                out["height"].append(int(px.shape[0]))
                out["px_sum"].append(int(px.astype(np.int64).sum()))
            except ValueError:
                out["width"].append(None)
                out["height"].append(None)
                out["px_sum"].append(None)
        yield pd.DataFrame(out)


# Every decoded pixel of a constant block c is the closed form
# clamp(floor((round(8(c-128)/Q00)*Q00 + 4) / 8) + 128): the block's only
# nonzero coefficient is its exact DC, and the decoder's integer IDCT takes
# the DC shortcut. Q00 is inlined at import from the same quality scaling
# the encoder used.
_JPEG_ORACLE = f"""
WITH jimgs AS (
  SELECT doc_id, 2 + doc_id % 3 AS wb, 2 + doc_id % 2 AS hb
  FROM documents WHERE doc_id < {_JPG_N}
), blocks AS (
  SELECT doc_id, wb, hb,
         (doc_id*7 + bx.bx*13 + by.by*29) % 256 AS c
  FROM jimgs
  CROSS JOIN UNNEST(generate_series(0, wb - 1)) AS bx(bx)
  CROSS JOIN UNNEST(generate_series(0, hb - 1)) AS by(by)
), px AS (
  SELECT doc_id, wb, hb,
         LEAST(255, GREATEST(0, CAST(FLOOR((
           (CASE WHEN c >= 128
                 THEN FLOOR((8*(c-128))/{_JPG_Q00} + 0.5)
                 ELSE -FLOOR((8*(128-c))/{_JPG_Q00} + 0.5) END) * {_JPG_Q00}
           + 4) / 8.0) AS INTEGER) + 128)) AS v
  FROM blocks
)
SELECT doc_id AS media_id,
       CAST(wb*8 AS INTEGER) AS width,
       CAST(hb*8 AS INTEGER) AS height,
       CAST(SUM(64*v) AS BIGINT) AS px_sum
FROM px GROUP BY doc_id, wb, hb
"""


@query("mm_jpeg_decode", oracle=_JPEG_ORACLE, category="pipeline-multimodal")
def mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode end to end: binaryFile ingest of in-repo
    encoded JPEGs (a third with restart markers) → mapInPandas entropy
    decode (Huffman, DC prediction, dequant, integer IDCT) → per-image
    dimensions and pixel sum, hash-checked against the closed-form DC
    oracle. The codec gate narrows to progressive JPEG / PNG / MP3
    (r05 verdict #4). Scale shape identical to mm_decode_features:
    map-side-only decode, scalars-only shuffle."""
    jpg_dir = _ensure_jpeg_fixture(spark, sf_dir)
    frames = spark.read.format("binaryFile").load(jpg_dir).select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.jpg$", 1)
        .cast("long")
        .alias("media_id"),
        "content",
    )
    return frames.mapInPandas(_jpeg_kernel, _JPEG_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# mm_jpeg_progressive — the SOF2 path end to end, with its own DC oracle
# ---------------------------------------------------------------------------

_JPGP_FIXTURE_TAG = "jpeg-prog-v1"


def _jpgp_block_values(doc_id: int, wb: int, hb: int) -> np.ndarray:
    """A DIFFERENT closed form than the baseline fixture's, so the two
    queries can never mask each other: (doc_id*11 + bx*17 + by*23) % 256."""
    by, bx = np.meshgrid(np.arange(hb), np.arange(wb), indexing="ij")
    return (doc_id * 11 + bx * 17 + by * 23) % 256


def _ensure_jpeg_prog_fixture(spark: SparkSession, sf_dir: str) -> str:
    """img_<doc_id>.jpg per document: PROGRESSIVE (SOF2) grayscale streams
    of piecewise-constant blocks — the full scan script (DC Al=1 + DC
    refine + AC spectral bands + AC refines) runs on every read."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ..sources.io import _scratch

    jpg_dir = _scratch(sf_dir, "jpeg_prog_files")
    manifest = jpg_dir.rstrip("/") + ".manifest"
    ids = sorted(
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _JPG_N)
        .select("doc_id")
        .distinct()
        .collect()
    )
    tag = (
        _JPGP_FIXTURE_TAG
        + ":"
        + _hashlib.sha256(",".join(map(str, ids)).encode()).hexdigest()
    )
    try:
        with open(manifest) as f:
            if f.read() == tag:
                return jpg_dir
    except FileNotFoundError:
        pass
    _shutil.rmtree(jpg_dir, ignore_errors=True)
    _os.makedirs(jpg_dir, exist_ok=True)
    for doc_id in ids:
        wb, hb = _jpg_block_dims(doc_id)
        px = np.repeat(
            np.repeat(_jpgp_block_values(doc_id, wb, hb), 8, 0), 8, 1
        ).astype(np.uint8)
        payload = encode_jpeg_progressive(px, quality=_JPG_QUALITY)
        with open(_os.path.join(jpg_dir, f"img_{doc_id}.jpg"), "wb") as f:
            f.write(payload)
    with open(manifest, "w") as f:
        f.write(tag)
    return jpg_dir


_JPEG_PROG_ORACLE = f"""
WITH jimgs AS (
  SELECT doc_id, 2 + doc_id % 3 AS wb, 2 + doc_id % 2 AS hb
  FROM documents WHERE doc_id < {_JPG_N}
), blocks AS (
  SELECT doc_id, wb, hb,
         (doc_id*11 + bx.bx*17 + by.by*23) % 256 AS c
  FROM jimgs
  CROSS JOIN UNNEST(generate_series(0, wb - 1)) AS bx(bx)
  CROSS JOIN UNNEST(generate_series(0, hb - 1)) AS by(by)
), px AS (
  SELECT doc_id, wb, hb,
         LEAST(255, GREATEST(0, CAST(FLOOR((
           (CASE WHEN c >= 128
                 THEN FLOOR((8*(c-128))/{_JPG_Q00} + 0.5)
                 ELSE -FLOOR((8*(128-c))/{_JPG_Q00} + 0.5) END) * {_JPG_Q00}
           + 4) / 8.0) AS INTEGER) + 128)) AS v
  FROM blocks
)
SELECT doc_id AS media_id,
       CAST(wb*8 AS INTEGER) AS width,
       CAST(hb*8 AS INTEGER) AS height,
       CAST(SUM(64*v) AS BIGINT) AS px_sum
FROM px GROUP BY doc_id, wb, hb
"""


@query("mm_jpeg_progressive", oracle=_JPEG_PROG_ORACLE, category="pipeline-multimodal")
def mm_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG decode end to end: SOF2 streams whose scan script
    exercises spectral selection, DC and AC successive approximation
    (including the AC refinement correction-bit protocol), and EOB runs —
    decoded through the same coefficient-accumulation path a crawl's
    progressive JPEGs take, hash-checked against the closed-form DC
    oracle. A constant block's DC reaches the identical quantized value
    through the two-pass DC script (first pass codes dc>>1, refinement
    restores bit 0), so the closed form is unchanged from the baseline
    query's — only the block formula differs. With mm_jpeg_lossless
    covering SOF3, what remains external is arithmetic-coded JPEG and
    MP3."""
    jpg_dir = _ensure_jpeg_prog_fixture(spark, sf_dir)
    frames = spark.read.format("binaryFile").load(jpg_dir).select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.jpg$", 1)
        .cast("long")
        .alias("media_id"),
        "content",
    )
    return frames.mapInPandas(_jpeg_kernel, _JPEG_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# mm_jpeg_lossless — the SOF3 predictive path end to end, FULL pixel oracle
# ---------------------------------------------------------------------------

_JPGL_N = 50
_JPGL_FIXTURE_TAG = "jpeg-lossless-v1"


def _ensure_jpeg_lossless_fixture(spark: SparkSession, sf_dir: str) -> str:
    """img_<doc_id>.jls per document with doc_id < 50: RGB pixels from
    the SHARED formula the PPM/PNG fixtures use (so the per-pixel SQL
    oracle is the same arithmetic), encoded SOF3 with the predictor
    rotating over all seven (doc_id % 7 + 1) so every prediction path
    decodes on every real read. Same manifest idempotence."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ..sources.io import _scratch
    from .multimodal import _img_dims, _img_pixels

    jls_dir = _scratch(sf_dir, "jpeg_lossless_files")
    manifest = jls_dir.rstrip("/") + ".manifest"
    ids = sorted(
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _JPGL_N)
        .select("doc_id")
        .distinct()
        .collect()
    )
    tag = (
        _JPGL_FIXTURE_TAG
        + ":"
        + _hashlib.sha256(",".join(map(str, ids)).encode()).hexdigest()
    )
    try:
        with open(manifest) as f:
            if f.read() == tag:
                return jls_dir
    except FileNotFoundError:
        pass
    _shutil.rmtree(jls_dir, ignore_errors=True)
    _os.makedirs(jls_dir, exist_ok=True)
    for doc_id in ids:
        w, h = _img_dims(doc_id)
        payload = encode_jpeg_lossless(
            _img_pixels(doc_id, w, h), predictor=doc_id % 7 + 1
        )
        with open(_os.path.join(jls_dir, f"img_{doc_id}.jls"), "wb") as f:
            f.write(payload)
    with open(manifest, "w") as f:  # written LAST: a crash mid-synth re-runs
        f.write(tag)
    return jls_dir


_JPGL_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
    ]
)


def _jpgl_kernel(batches):
    import pandas as pd

    for pdf in batches:
        out = {
            "media_id": [], "width": [], "height": [],
            "r_sum": [], "g_sum": [], "b_sum": [],
        }
        for media_id, content in zip(pdf["media_id"], pdf["content"]):
            out["media_id"].append(int(media_id))
            try:
                px = decode_jpeg(bytes(content))
                if px.ndim == 2:
                    px = np.repeat(px[:, :, None], 3, axis=2)
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


def _jpgl_oracle() -> str:
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


@query(
    "mm_jpeg_lossless", oracle=_jpgl_oracle(), category="pipeline-multimodal"
)
def mm_jpeg_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS (SOF3) JPEG decode end to end: predictive Huffman coding,
    no DCT, components stored raw — so unlike the lossy tiers this
    carries the FULL per-pixel channel-sums oracle (the PNG/PPM
    arithmetic, byte-exact through a real SOF3 container; all seven
    T.81 predictors exercised across the fixture). The external-codec
    gate narrows to arithmetic-coded JPEG and MP3."""
    jls_dir = _ensure_jpeg_lossless_fixture(spark, sf_dir)
    frames = spark.read.format("binaryFile").load(jls_dir).select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.jls$", 1)
        .cast("long")
        .alias("media_id"),
        "content",
    )
    return frames.mapInPandas(_jpgl_kernel, _JPGL_DECODE_SCHEMA)
