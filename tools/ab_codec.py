"""A/B the engine parquet write codec (zstd vs snappy) on the
commit-heavy extras VERDICT r11 #2 flagged (m20 +27%, m24 +29% on the
graded bench after r11's session-wide zstd default) plus the read-heavy
index lifecycles that motivated zstd in the first place.

Alternated passes (the repo's r05 rule: back-to-back repeats share one
ambient window; alternation spreads it), median + spread per query.

Run:  python tools/ab_codec.py snappy|zstd [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "m20_partitioned_merge",
    "m24_change_data_feed",
    "m47_partition_evolution",
    "l33_text_index_refresh",
    "l36_text_index_lifecycle",
    "l37_text_search_or",
]


def main() -> int:
    codec = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from shadowcat_data_spark import registry, session
    from shadowcat_data_spark.session import get_spark

    # Override the engine default BEFORE any session conf is applied so
    # ensure_session() re-applies the A/B codec, not the committed one.
    session._DYNAMIC_CONFS["spark.sql.parquet.compression.codec"] = codec

    spark = get_spark(f"ab-codec-{codec}")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.load_all()

    def once(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    samples: dict[str, list[float]] = {n: [] for n in QUERIES}
    for name in QUERIES:  # warm-up pass
        once(name)
    for _ in range(n_runs):
        for name in QUERIES:
            samples[name].append(once(name))
    for name, xs in samples.items():
        print(
            f"[{codec}] {name}: median {statistics.median(xs):.4f}s "
            f"(min {min(xs):.4f}, max {max(xs):.4f})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
