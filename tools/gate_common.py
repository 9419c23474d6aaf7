"""Shared driver for the robustness gates (dirty/empty/nulls probes).

One loop, one report format, one exit-code policy — the probes differ
only in the fixture they synthesize and in which queries they select.
"""

from __future__ import annotations

from collections.abc import Callable

from shadowcat_data_spark.compare import compare_frames


def run_gate(
    spark,
    con,
    specs: dict,
    sf_dir: str,
    tag: str,
    expected_divergent: frozenset[str] | set[str] = frozenset(),
    include: Callable[[str, object], bool] | None = None,
    rows_only_include: Callable[[str], bool] | None = None,
) -> int:
    """Run every selected registry query against ``sf_dir`` and its oracle
    against ``con``; print one line per query, return the failure count.

    ``include(name, spec)`` selects oracle-checked queries (default: all);
    ``rows_only_include(name)`` selects oracle-less queries to smoke-run
    with ``.count()`` (default: all)."""
    fails = 0
    n_run = 0
    for name in sorted(specs):
        s = specs[name]
        try:
            if s.oracle is not None:
                if include is not None and not include(name, s):
                    continue
                n_run += 1
                res = compare_frames(
                    name, s.fn(spark, sf_dir).toPandas(), con.sql(s.oracle).df()
                )
                ok = res.ok or name in expected_divergent
                st = (
                    "ok"
                    if res.ok
                    else (
                        "expected-divergent" if ok else f"MISMATCH {res.detail[:160]}"
                    )
                )
                fails += 0 if ok else 1
            else:
                if rows_only_include is not None and not rows_only_include(name):
                    continue
                n_run += 1
                st = f"rows-only ok ({s.fn(spark, sf_dir).count()})"
        except Exception as ex:  # noqa: BLE001 — a gate reports, never hides
            st = f"ERROR {type(ex).__name__}: {str(ex)[:160]}"
            fails += 1
        print(f"[{tag}] {name}: {st}", flush=True)
    print(f"[{tag}] {n_run} queries probed, {fails} failures", flush=True)
    return fails
