"""Measure the WAND pruning ratio at scale (VERDICT r07 #5): how many
postings enter the ranking aggregate WITH the per-term-bound pruning vs
the naive disjunction, for the registered probe terms, on an arbitrary
corpus directory (the sf0.1 fixture or a scale_smoke synthesis dir).

The r07 number (20 vs 510) came from a toy corpus with hand-planted
skew; this records the ratio on the driver-shaped term distribution so
BASELINE.md can carry a measured row instead of an anecdote.

Run: python tools/wand_ratio.py [sf_dir]      (default /root/testdata/sf0.1)
Prints one JSON line: naive/kept posting counts and theta for the l37
(tf-OR) and l34 (BM25) tiers. Exit 0 unless a probe fails.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadowcat_data_spark.pipeline.text_index import (
    _PROBE_TERMS,
    _ensure_text_index,
    bm25_topk,
    search_any_terms,
)
from shadowcat_data_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("wand-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    table = _ensure_text_index(spark, sf_dir)
    out: dict = {"sf_dir": sf_dir, "terms": _PROBE_TERMS}
    t0 = time.perf_counter()
    s_or: dict = {}
    search_any_terms(spark, table, _PROBE_TERMS, k=10, stats_out=s_or).collect()
    s_bm: dict = {}
    bm25_topk(spark, table, _PROBE_TERMS, k=10, stats_out=s_bm).collect()
    # the shape WAND exists for: a rare (high-impact) term probed next to
    # common ones — pick the corpus's rarest term from the stats sidecar
    from pyspark.sql import functions as F

    from shadowcat_data_spark.pipeline.text_index import _terms_table
    from shadowcat_data_spark.plans.lakehouse import read_snapshot

    rare = (
        read_snapshot(spark, _terms_table(table))
        .groupBy("tok")
        .agg(F.sum("df").alias("df"))
        .orderBy("df", "tok")
        .first()["tok"]
    )
    skew_terms = [rare] + list(_PROBE_TERMS)
    out["skew_terms"] = skew_terms
    s_sk: dict = {}
    search_any_terms(spark, table, skew_terms, k=10, stats_out=s_sk).collect()
    s_skb: dict = {}
    bm25_topk(spark, table, skew_terms, k=10, stats_out=s_skb).collect()
    for name, s in (
        ("or", s_or), ("bm25", s_bm), ("or_skew", s_sk), ("bm25_skew", s_skb)
    ):
        ratio = (
            round(s["naive_postings"] / s["kept_postings"], 3)
            if s.get("kept_postings")
            else None
        )
        out[name] = {**s, "prune_ratio": ratio}
    out["wall_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
