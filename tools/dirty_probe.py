"""Degenerate-input robustness gate: run every documents-only and
embeddings-only registry query against adversarial fixtures the driver's
TPC-H-ish generator never emits — empty/whitespace-only/one-token docs,
token-free docs inside the length band, exact-duplicate short docs, zero
embedding vectors, duplicate vectors under different labels.

Found in round 3 (all since fixed): ANSI DIVIDE_BY_ZERO in l20's A-ES key
(n_chars=0), in l27's repetition ratio (token-free text), and across the
whole cosine family (zero-norm vectors, 7 queries); an out-of-range
element_at in the k-gram shingler (docs shorter than k). The driver's
fixtures contain none of these rows, so only this probe catches them.

Run: python tools/dirty_probe.py        Exit: non-zero on any error/mismatch.
"""

from __future__ import annotations

import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

from gate_common import run_gate

from shadowcat_data_spark import registry
from shadowcat_data_spark.session import get_spark

DIRTY_DOCS = [
    (0, "a  b", "en", "src0", 4),
    (1, "", "en", "src0", 0),
    (2, " ", "en", "src0", 1),
    (3, " ".join(["aa"] * 20), "en", "src0", 59),
    (4, "x", "fr", "src1", 1),
    (5, "hello world foo bar", "en", "src0", 19),
    (6, " " * 120, "en", "src0", 120),  # token-free INSIDE the length band
    (7, "tiny doc", "de", "src1", 8),
    (8, "tiny doc", "de", "src1", 8),
    # unicode: emoji (astral plane), CJK (no spaces — one giant token),
    # combining accents (e + U+0301), RTL, multi-byte in every position
    (9, "caf\u00e9 \u2615 caf\u00e9\u0301 \U0001f600\U0001f680", "fr", "src2", 14),
    (10, "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\u3067\u3059", "ja", "src2", 10),
    (11, "\u05e9\u05dc\u05d5\u05dd abc \u05e2\u05d5\u05dc\u05dd", "he", "src2", 12),
    # analyzer stress (r08): mixed case + punctuation \u2014 the shared
    # build/probe analyzer and every retrieval oracle twin must agree on
    # "Customer, JOIN!" == "customer join" (case fold, punct-run fold)
    (12, "Customer, JOIN! filter; Customer-join?", "en", "src0", 38),
    (13, "CUSTOMER   join...customer (join) [filter]", "en", "src0", 42),
    (14, "a.b,c;d:e!f?g-h_i+j=k", "en", "src0", 21),
    # NULL documents (r08): a fully-NULL doc and a NULL-lang doc WITH
    # tokens. Found live: l27's oracle NULL-propagated len(NULL toks)
    # through its repetition ratio and called a NULL-text doc 'kept'
    # while Spark's when()-chain called it 'repetitive'; t30's per-lang
    # join dropped a NULL-lang doc's token sums. Both fixture-only holes
    # until a real corpus ships a row with missing fields.
    (15, None, None, None, None),
    (16, "beta beta gamma", None, None, 15),
]


def _long_doc(uniq_prefix: str, n_tokens: int) -> str:
    """Book-shaped text: a 40-token boilerplate paragraph alternating
    with 40-token unique runs — ~50% of tokens sit under corpus-
    duplicated windows. VERDICT r08 missing #3: nothing in the probe
    was book-shaped, so the l46 O(n·d) trim lambda (hours at 100k
    tokens) could only be caught by code reading. This row turns that
    class of per-doc quadratics into a probe hang."""
    boiler = " ".join(f"bp{i}" for i in range(40))
    parts, tok, u = [], 0, 0
    while tok < n_tokens:
        parts.append(boiler)
        parts.append(" ".join(f"{uniq_prefix}{u + i}" for i in range(40)))
        u += 40
        tok += 80
    return " ".join(parts)


_LONG17 = _long_doc("ua", 100_000)
_LONG18 = _long_doc("ub", 20_000)
DIRTY_DOCS += [
    # the book: 100k tokens, ~50% under duplicated windows
    (17, _LONG17, "en", "src3", len(_LONG17)),
    # long doc with every adjacent field NULL (lang/source/n_chars) —
    # shares the boilerplate with doc 17 (cross-doc duplication), its
    # unique runs are its own
    (18, _LONG18, None, None, None),
]

_OTHER_TABLES = re.compile(
    r"\b(lineitem|orders|customer|supplier|part|nation|region|events)\b"
)
_NON_EVENTS = re.compile(
    r"\b(lineitem|orders|customer|supplier|part|nation|region|documents|embeddings)\b"
)

# ts stays NON-NULL by contract (event-time semantics need it); everything
# else is adversarial: null value/event_type/props, value=0 and negative,
# a single-event user, and a burst of identical timestamps for one user
# (tie-order stress for every window that claims a unique ordering tuple).
DIRTY_EVENTS = [
    (0, "2024-01-01 00:00:00", 1, "click", 0.0, None),
    (1, "2024-01-01 00:00:00", 1, "click", -5.5, '{"k": 1}'),
    (2, "2024-01-01 00:00:00", 1, "purchase", None, '{"k": 2}'),
    (3, "2024-01-01 00:00:01", 1, None, 2.25, '{"k": 3}'),
    (4, "2024-01-01 02:00:00", 2, "signup", 7.0, None),
    (5, "2024-01-01 02:30:00", 2, "purchase", 0.0, '{"k": 5}'),
    (6, "2024-01-03 00:00:00", 3, "error", 1.0, "not json"),
    (7, "2024-01-03 00:00:00", 3, "error", 1.0, ""),
]


def dirty_embeddings() -> list:
    rng = np.random.RandomState(3)
    rows = [
        (i, [float(x) for x in rng.standard_normal(64).astype(np.float32)], i % 3)
        for i in range(40)
    ]
    rows.append((40, [0.0] * 64, 0))  # zero vector
    rows.append((41, [0.0] * 64, 1))  # second zero vector, same bucket
    rows.append((42, rows[0][1], 2))  # exact duplicate under another label
    return rows


def main() -> int:
    spark = get_spark("dirty-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.load_all()
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        DIRTY_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    spark.createDataFrame(
        dirty_embeddings(), "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
    # events.parquet must be a single FILE (the driver's fixture layout —
    # the streaming source's pathGlobFilter matches leaf file names)
    con_tmp = duckdb.connect()
    con_tmp.execute(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con_tmp.executemany("INSERT INTO ev VALUES (?, ?, ?, ?, ?, ?)", DIRTY_EVENTS)
    con_tmp.execute(
        f"COPY ev TO '{os.path.join(tmp, 'events.parquet')}' (FORMAT PARQUET)"
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):  # Spark-written directories
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp}/{t}.parquet/*.parquet')"
        )
    con.execute(  # single file — the driver's events fixture layout
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp}/events.parquet')"
    )
    def include(name, spec):  # doc/emb/events-only oracles (case-blind)
        sql = spec.oracle.lower()
        return (
            ("documents" in sql or "embeddings" in sql)
            and not _OTHER_TABLES.search(sql)
        ) or ("events" in sql and not _NON_EVENTS.search(sql))

    failures = run_gate(
        spark, con, specs, tmp, "dirty",
        include=include,
        rows_only_include=lambda n: n.startswith(("l2", "l3", "l7d")),
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
