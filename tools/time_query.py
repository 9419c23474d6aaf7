"""Time one registered query in a fresh process: warm-up + N noop-sink
runs, print median + all samples. The building block for old-vs-new
A/Bs run alternately from a git worktree (old code) and the repo (new).

Run:  python tools/time_query.py <query> [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from shadowcat_data_spark import registry
    from shadowcat_data_spark.session import get_spark

    spark = get_spark(f"time-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = registry.load_all()[name].fn

    def once() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    cold = once()
    xs = [once() for _ in range(n_runs)]
    tag = os.path.basename(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    print(
        f"[{tag}] {name}: cold {cold:.4f}s median {statistics.median(xs):.4f}s "
        f"(all {[round(x, 3) for x in xs]})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
