"""A/B l5_tfidf_top_terms' tf materialization (VERDICT r11 #4): the r11
change materialized tf (localCheckpoint) so the corpus is tokenized once
instead of twice (plan: 3 -> 1 parquet scans, structurally verified); the
driver's warm bench then read l5 0.75x, inside the ambient band but
unresolved. This times the full l5 query with the materialization ON
(current code) vs OFF (materialize patched to identity, restoring the
two-pass plan), fresh JVM per invocation.

Run:  python tools/ab_l5.py mat|nomat [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    form = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from shadowcat_data_spark.pipeline import text as tx
    from shadowcat_data_spark.session import get_spark

    if form == "nomat":
        tx.materialize = lambda df, **kw: df
    elif form != "mat":
        raise SystemExit(f"unknown form {form!r}")

    spark = get_spark(f"ab-l5-{form}")
    spark.sparkContext.setLogLevel("ERROR")

    from shadowcat_data_spark import registry

    fn = registry.load_all()["l5_tfidf_top_terms"].fn

    def once() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()  # warm-up
    xs = [once() for _ in range(5)]
    print(
        f"[{form}] l5 median {statistics.median(xs):.4f}s "
        f"(min {min(xs):.4f}, max {max(xs):.4f}, all {[round(x,3) for x in xs]})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
