"""Full-registry correctness sweep — the pre-driver gate (VERDICT r02 item 3).

The driver samples only ~50 of the registered queries per round, so any of
the 228 can be the next one it checks. This tool runs EVERY registry entry
through the same comparator the driver uses (``compare.run_compare``) at an
arbitrary scale factor (default the driver's t2 scale, sf0.01) and prints
one line per query plus a JSON summary suitable for recording in
BASELINE.md each round.

Run: python tools/sweep.py [sf_dir] [--json-out PATH]
       [--oracle-skip name1,name2] [--start-after NAME]
       [--category cat1,cat2]

``--category`` restricts the sweep to the named registry categories
(e.g. ``--category pipeline-dedup,streaming``) so per-family iteration
stays fast as the registry grows (r05 verdict #7) — the FULL sweep (no
flag) remains the recorded pre-commit gate; a category run never
substitutes for it.
``--oracle-skip`` demotes the named queries to the rows-only check.
Since r04 (df-bounded shingle edges) it is NOT needed at any shipped
scale: the r04 sf0.1 deep sweep ran all 240 oracles with zero skips in
462 s — r03 had to skip l2d/l14, whose closure oracles were unrunnable
against the unbounded token-edge graph. ``--start-after`` resumes an
interrupted sweep alphabetically.
Exit: non-zero iff any oracle-checked query mismatches or any query errors.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import duckdb

from shadowcat_data_spark import registry
from shadowcat_data_spark.compare import (
    complex_output_columns,
    register_views,
    run_compare,
)
from shadowcat_data_spark.session import get_spark


def main() -> int:
    json_out = None
    oracle_skip: set[str] = set()
    start_after = None
    categories: set[str] | None = None
    rest = sys.argv[1:]
    for flag in ("--json-out", "--oracle-skip", "--start-after", "--category"):
        if flag in rest:
            i = rest.index(flag)
            val = rest[i + 1]
            rest = rest[:i] + rest[i + 2 :]
            if flag == "--json-out":
                json_out = val
            elif flag == "--oracle-skip":
                oracle_skip = set(val.split(","))
            elif flag == "--category":
                categories = set(val.split(","))
            else:
                start_after = val
    args = [a for a in rest if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    spark = get_spark("shadowcat-sweep")
    con = duckdb.connect()
    register_views(con, sf_dir)
    specs = registry.load_all()

    results: dict[str, dict] = {}
    n_pass = n_rows_only = n_fail = 0
    t_start = time.perf_counter()
    if categories is not None:
        known = {s.category for s in specs.values()}
        unknown = categories - known
        if unknown:
            print(f"unknown categories: {sorted(unknown)}; have {sorted(known)}")
            return 2
        specs = {n: s for n, s in specs.items() if s.category in categories}
    for name in sorted(specs):
        if start_after is not None and name <= start_after:
            continue
        spec = specs[name]
        t0 = time.perf_counter()
        try:
            if spec.oracle is None or name in oracle_skip:
                df = spec.fn(spark, sf_dir)
                bad = complex_output_columns(df)
                if bad:
                    raise ValueError(f"complex-typed output columns: {bad}")
                rows = df.count()
                results[name] = {"status": "rows_only", "rows": rows}
                n_rows_only += 1
                status = f"rows-only ({rows} rows)"
            else:
                res = run_compare(name, spark, con, sf_dir, spec.fn, spec.oracle)
                if res.ok:
                    results[name] = {"status": "pass"}
                    n_pass += 1
                    status = "pass"
                else:
                    results[name] = {"status": "FAIL", "detail": res.detail[:300]}
                    n_fail += 1
                    status = f"FAIL {res.detail[:120]}"
        except Exception as exc:  # a broken query must not end the sweep
            results[name] = {
                "status": "ERROR",
                "detail": f"{type(exc).__name__}: {exc}"[:300],
            }
            n_fail += 1
            status = f"ERROR {type(exc).__name__}: {str(exc)[:100]}"
        dt = time.perf_counter() - t0
        print(f"[sweep] {name}: {status} ({dt:.2f}s)", flush=True)

    total = len(specs)
    summary = {
        "sf_dir": sf_dir,
        # a category-filtered run is a dev-loop aid, never the gate —
        # stamp it so a partial summary can't be recorded as the full sweep
        **({"partial_categories": sorted(categories)} if categories else {}),
        "total": total,
        "pass": n_pass,
        "rows_only": n_rows_only,
        "fail_or_error": n_fail,
        "wall_sec": round(time.perf_counter() - t_start, 1),
    }
    print(json.dumps(summary))
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "results": results}, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
