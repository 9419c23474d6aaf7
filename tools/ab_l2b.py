"""A/B the l2b minhash kernel's final projection: nested transform
(r11 commit 380ff03) vs the unrolled per-permutation array_min form it
replaced. VERDICT r11 #1: the driver read l2b 1.7-1.8x slower in BOTH
graded runs after the nested rewrite, and the committed plan snapshots
could not prove the "one min-subtree" claim because the projection hides
behind the localCheckpoint leaf.

This script produces the two missing pieces of evidence:
  1. the PRE-checkpoint `.explain("formatted")` of `_rowwise_minhash`
     for the active form, written to plans/r12/ (min-subtree count is
     visible there), plus a direct count of `array_min` sites in the
     optimized plan string;
  2. an in-process timed A/B of the FULL l2b query (noop sink, warmup +
     median of 5) with each form, run as separate invocations so each
     gets a fresh JVM.

Run:  python tools/ab_l2b.py nested|unrolled [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def _unrolled_rowwise_minhash(
    df: DataFrame, id_col: str, text_col: str, with_toks: bool = False
) -> DataFrame:
    """The pre-380ff03 unrolled form, verbatim (git show 380ff03)."""
    from shadowcat_data_spark.pipeline import dedup as dd

    sh = dd.shingle_hash_array(dd._fan_out(df), id_col, text_col)
    hs = sh.select(
        id_col,
        *([F.array_distinct("sh").alias("toks")] if with_toks else []),
        F.transform(
            "sh",
            lambda t: F.struct(
                t.bitwiseAND(F.lit(dd._MASK32)).alias("h1"),
                F.xxhash64(F.lit(1), t).bitwiseAND(F.lit(dd._MASK32)).alias("h2"),
            ),
        ).alias("hs"),
    )
    mins = [
        F.array_min(
            F.transform(F.col("hs"), lambda s: s["h1"] + F.lit(i) * s["h2"])
        ).alias(f"h{i}")
        for i in range(dd.N_HASHES)
    ]
    keep = [id_col, "toks"] if with_toks else [id_col]
    return hs.select(*keep, *mins)


def main() -> int:
    form = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from shadowcat_data_spark.pipeline import dedup as dd
    from shadowcat_data_spark.session import get_spark, load_table

    if form == "unrolled":
        dd._rowwise_minhash = _unrolled_rowwise_minhash
    elif form != "nested":
        raise SystemExit(f"unknown form {form!r}")

    spark = get_spark(f"ab-l2b-{form}")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. pre-checkpoint plan of the signature projection itself
    docs = load_table(spark, sf_dir, "documents")
    sig = dd._rowwise_minhash(docs, "doc_id", "text", with_toks=True)
    plan = sig._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12", f"l2b_rowwise_minhash_prechkpt_{form}.txt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write(
            "PRE-checkpoint plan of _rowwise_minhash(documents, doc_id, text, "
            f"with_toks=True), form={form} (tools/ab_l2b.py)\n\n"
        )
        fh.write(plan)
    n_min = plan.count("array_min")
    n_h2 = plan.count("xxhash64(1,")
    print(f"[{form}] plan: array_min sites={n_min}, xxhash64(1,..) sites={n_h2}")

    # 2. timed full-query A/B (registry fn, noop sink, warmup + median of 5)
    from shadowcat_data_spark import registry

    fn = registry.load_all()["l2b_minhash_lsh"].fn

    def once() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()  # warm-up (codegen)
    xs = [once() for _ in range(5)]
    print(
        f"[{form}] l2b median {statistics.median(xs):.4f}s "
        f"(min {min(xs):.4f}, max {max(xs):.4f}, all {[round(x,3) for x in xs]})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
