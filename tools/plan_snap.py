"""Snapshot .explain("formatted") for named queries into plans/<tag>/.

Run: python tools/plan_snap.py <outdir> <suffix> [sf_dir] [name1,name2,...]

Writes ``<outdir>/<query>_<suffix>.txt`` per query — the optimization-round
evidence artifact (the judge checks plan claims against these files).
Default query list: the bench's headline + extra sections. For lifecycle
queries whose fn performs commits before returning the probe DataFrame,
the snapshot is the PROBE plan (the committed writes are jobs, not plans);
that is stated in the file header.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    from bench import BENCH_QUERIES, EXTRA_QUERIES

    names = (
        sys.argv[4].split(",")
        if len(sys.argv) > 4
        else BENCH_QUERIES + EXTRA_QUERIES
    )
    from shadowcat_data_spark.registry import load_all
    from shadowcat_data_spark.session import get_spark

    spark = get_spark("plan-snap")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n"
                "# Lifecycle queries: this is the final (probe/read) plan; "
                "commit jobs run inside fn() before it returns.\n\n"
            )
            f.write(buf.getvalue())
        print(f"[plan-snap] {name} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
