"""A/B spark.sql.objectHashAggregate.sortBased.fallbackThreshold.

Every TypedImperativeAggregate in the engine (collect_set / collect_list:
l2a's token sets, l2b's LSH buckets + verify sets, a9, the listagg/mode
family) plans as ObjectHashAggregate, which abandons hash aggregation and
SORTS once a task's in-memory map passes the threshold — default 128
keys, i.e. ~every real aggregate here runs sort-based. The threshold
exists to bound per-key OBJECT state in memory; our per-key states are
small bounded arrays (shingle sets bounded by doc length, buckets capped
at MAX_BUCKET), so a larger map is safe and skips the sort.

Run:  python tools/ab_objhash.py <threshold|default> [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["l2a_near_dup_pairs", "l2b_minhash_lsh", "a9_collect_set", "a16_listagg"]


def main() -> int:
    thr = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from shadowcat_data_spark import registry
    from shadowcat_data_spark.session import get_spark

    spark = get_spark(f"ab-objhash-{thr}")
    if thr != "default":
        spark.conf.set(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr
        )
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.load_all()

    def once(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    samples: dict[str, list[float]] = {n: [] for n in QUERIES}
    for name in QUERIES:
        once(name)  # warm-up
    for _ in range(n_runs):
        for name in QUERIES:
            samples[name].append(once(name))
    for name, xs in samples.items():
        print(
            f"[thr={thr}] {name}: median {statistics.median(xs):.4f}s "
            f"(min {min(xs):.4f}, max {max(xs):.4f})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
