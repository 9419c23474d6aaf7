"""WARC ingestion (S18) — the Common Crawl container format.

Web-scale training corpora arrive as ``.warc.gz``: concatenated gzip
members, each holding one WARC record (version line, CRLF header block,
Content-Length-delimited body). A 100 TB crawl ingest is therefore:
distribute the *.warc.gz files across executors (``binaryFile`` — WARC's
per-record gzip members make the file the natural split unit, exactly how
Common Crawl ships 1 GiB segments), split records map-side, and emit only
the extracted scalars/text — raw archive bytes never shuffle. That is the
same scale shape as every codec kernel in ``pipeline/``.

Pure stdlib: ``gzip``/``zlib`` decompress the member chain; the record
parser is a header walk with a Content-Length cut. Malformed archives
raise ``ValueError`` (the mapInPandas kernel quarantines the file to a
NULL row, matching the codec-kernel contract).

Writer (``encode_warc``) exists so fixtures are self-synthesized and the
reader is pinned by round-trip + oracle, like every other container in
the repo (PPM/WAV/PNG/FLAC/GIF/Y4M/JPEG discipline).
"""

from __future__ import annotations

import gzip
import io as _io
import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..registry import query
from ..session import load_table
from .io import _scratch

_CRLF = b"\r\n"


def encode_warc(records: list[dict], compress: bool = True) -> bytes:
    """Serialize records as a WARC/1.0 stream. Each record dict carries
    ``type`` (e.g. "resource"), ``uri``, ``body`` (bytes), and optional
    extra headers. With ``compress``, each record becomes its own gzip
    member (the Common Crawl layout — members are independently
    decompressible, which is what makes record-level random access
    possible on a remote store)."""
    out = bytearray()
    for rec in records:
        body = rec["body"]
        # header values are interpolated into the CRLF-delimited header
        # block: an embedded CR/LF would smuggle extra header lines and
        # corrupt record framing for every downstream parser (ADVICE r07)
        for s in (
            rec["type"],
            rec["uri"],
            rec.get("id", "0"),
            *(x for kv in rec.get("extra", {}).items() for x in kv),
        ):
            if "\r" in s or "\n" in s:
                raise ValueError(
                    f"WARC header field contains CR/LF: {s!r}"
                )
        hdrs = [
            b"WARC/1.0",
            b"WARC-Type: " + rec["type"].encode(),
            b"WARC-Target-URI: " + rec["uri"].encode(),
            b"WARC-Record-ID: <urn:uuid:" + rec.get("id", "0").encode() + b">",
            b"Content-Length: " + str(len(body)).encode(),
        ]
        for k, v in rec.get("extra", {}).items():
            hdrs.append(k.encode() + b": " + v.encode())
        raw = _CRLF.join(hdrs) + _CRLF + _CRLF + body + _CRLF + _CRLF
        if compress:
            buf = _io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(raw)
            out += buf.getvalue()
        else:
            out += raw
    return bytes(out)


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress a chain of concatenated gzip members (or pass through
    an uncompressed stream)."""
    if buf[:2] != b"\x1f\x8b":
        return buf
    import zlib

    out = bytearray()
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(buf[pos:])
        except zlib.error as exc:
            raise ValueError(f"bad gzip member at byte {pos}: {exc}") from exc
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = d.unused_data
        if not rest:
            break
        pos = len(buf) - len(rest)
    return bytes(out)


def parse_warc(buf: bytes) -> list[dict]:
    """Parse a WARC/1.0 stream (gzip-member chain or plain) into records:
    {type, uri, headers, body}. Raises ``ValueError`` on malformed input
    — bad magic, header block without terminator, missing/invalid
    Content-Length, short body."""
    data = _gunzip_members(buf)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data[pos:].startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at byte {pos}")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        lines = data[pos:hdr_end].split(_CRLF)
        version = lines[0].decode("ascii", "replace")
        if version not in ("WARC/1.0", "WARC/1.1"):
            raise ValueError(f"unsupported WARC version {version!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            if b":" not in ln:
                raise ValueError(f"malformed WARC header line {ln!r}")
            k, v = ln.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("missing/invalid Content-Length") from exc
        if clen < 0:
            raise ValueError("negative Content-Length")
        body_start = hdr_end + 4
        body = data[body_start : body_start + clen]
        if len(body) != clen:
            raise ValueError(
                f"short WARC body: want {clen} bytes, have {len(body)}"
            )
        records.append(
            {
                "type": headers.get("warc-type", ""),
                "uri": headers.get("warc-target-uri", ""),
                "headers": headers,
                "body": body,
            }
        )
        pos = body_start + clen
    if not records:
        raise ValueError("no WARC records in stream")
    return records


# ---------------------------------------------------------------------------
# S18 — the registered ingest query
# ---------------------------------------------------------------------------

_WARC_N = 200
_WARC_FILES = 4
_WARC_FIXTURE_TAG = "warc-v1"


def _ensure_warc_fixture(spark: SparkSession, sf_dir: str) -> str:
    """crawl_<k>.warc.gz shards, each holding ~N/4 resource records whose
    body is the document's actual text (so the oracle is a plain join
    back to the documents table) plus one warcinfo record per shard that
    extraction must SKIP. Manifest idempotence as every fixture."""
    import hashlib as _hashlib
    import shutil as _shutil

    warc_dir = _scratch(sf_dir, "warc_files")
    manifest = warc_dir.rstrip("/") + ".manifest"
    rows = sorted(
        (r.doc_id, r.text or "")
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _WARC_N)
        .select("doc_id", "text")
        .collect()
    )
    # hash the CONTENT, not lengths: unlike the formula-derived image
    # fixtures, the payload here IS the text, so a regenerated corpus
    # with length-preserving changes must invalidate the shards
    # (review-found)
    h = _hashlib.sha256()
    for i, t in rows:
        h.update(str(i).encode())
        h.update(t.encode())
        h.update(b"\x00")
    tag = _WARC_FIXTURE_TAG + ":" + h.hexdigest()
    try:
        with open(manifest) as f:
            if f.read() == tag:
                return warc_dir
    except FileNotFoundError:
        pass
    _shutil.rmtree(warc_dir, ignore_errors=True)
    os.makedirs(warc_dir, exist_ok=True)
    for k in range(_WARC_FILES):
        recs = [
            {
                "type": "warcinfo",
                "uri": f"crawl://shard/{k}",
                "id": f"info-{k}",
                "body": b"software: shadowcat-crawler",
            }
        ]
        for doc_id, text in rows:
            if doc_id % _WARC_FILES == k:
                recs.append(
                    {
                        "type": "resource",
                        "uri": f"http://corpus.example/doc/{doc_id}",
                        "id": str(doc_id),
                        "body": text.encode(),
                    }
                )
        with open(os.path.join(warc_dir, f"crawl_{k}.warc.gz"), "wb") as f:
            f.write(encode_warc(recs, compress=True))
    with open(manifest, "w") as f:  # written LAST: a crash mid-synth re-runs
        f.write(tag)
    return warc_dir


_WARC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("uri", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
    ]
)


def _warc_kernel(batches):
    import hashlib as _hashlib
    import re as _re

    import pandas as pd

    for pdf in batches:
        out = {"doc_id": [], "uri": [], "n_bytes": [], "payload_sha": []}
        for content in pdf["content"]:
            try:
                recs = parse_warc(bytes(content))
            except ValueError:
                out["doc_id"].append(None)
                out["uri"].append(None)
                out["n_bytes"].append(None)
                out["payload_sha"].append(None)
                continue
            for rec in recs:
                if rec["type"] != "resource":
                    continue  # warcinfo/request/metadata records skipped
                m = _re.search(r"/doc/(\d+)$", rec["uri"])
                out["doc_id"].append(int(m.group(1)) if m else None)
                out["uri"].append(rec["uri"])
                out["n_bytes"].append(len(rec["body"]))
                out["payload_sha"].append(
                    _hashlib.sha256(rec["body"]).hexdigest()
                )
        yield pd.DataFrame(out)


@query(
    "s18_warc_ingest",
    oracle=f"""
SELECT doc_id,
       'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
       CAST(strlen(COALESCE(text, '')) AS BIGINT) AS n_bytes,
       sha256(COALESCE(text, '')) AS payload_sha
FROM documents WHERE doc_id < {_WARC_N}
""",
    category="source",
)
def warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl-shaped ingest end to end: self-synthesized
    ``.warc.gz`` shards (per-record gzip members, warcinfo records that
    must be skipped) → ``binaryFile`` distribution → map-side record
    split + payload digest — archive bytes never shuffle, only the
    extracted scalars. Hash-checked against a plain join back to the
    documents the fixture was built from, so header walk, gzip-member
    chain, Content-Length cut, and record filtering are all on the
    oracle path."""
    warc_dir = _ensure_warc_fixture(spark, sf_dir)
    frames = spark.read.format("binaryFile").load(warc_dir).select("content")
    return frames.mapInPandas(_warc_kernel, _WARC_SCHEMA)
