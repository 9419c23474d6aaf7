"""Measure the phrase/NEAR θ-cutoff's work saved at scale (VERDICT r10
next #5): how many postings rows enter the positional intersection WITH
the r09/r10 pruning tiers (rarest-anchor IN pushdown + the all-common
two-phase θ cutoff) vs the naive full-chain intersection, for the
REGISTERED l38 phrase ("customer join") and l39 NEAR probe
("customer" NEAR/3 "query"), on an arbitrary corpus directory.

The r10 plan-shape pytests prove the cutoff path is TAKEN at sf0.1; this
records the rows-not-read number so BASELINE.md carries a measurement,
not a mechanism claim (the wand_ratio.py discipline, extended to the
positional tier). Both modes' top-k must be IDENTICAL — the cutoff is an
optimization, never an answer change — and the tool exits non-zero if
they differ. Wall time is measured on the plain (no stats_out) runs so
the diagnostic counts never pollute the timing.

A ratio of 1.0 with theta=null is a REAL result, not a failed probe: it
means the seed pass ran and honestly found θ = 1 (no k docs stand out
on the anchor term), so the planner degraded to the full chain exactly
as designed — the corpus lacks the repeated-boilerplate phrases the
cutoff exists for, and the measured cost of finding that out is the
on-vs-off wall delta.

Run: python tools/phrase_ratio.py [sf_dir]     (default /root/testdata/sf0.1)
Prints one JSON line: per-probe naive/kept posting rows, θ, prune ratio,
and on/off wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadowcat_data_spark.pipeline.text_index import (
    _ensure_positional_index,
    phrase_search,
    proximity_search,
)
from shadowcat_data_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("phrase-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    table = _ensure_positional_index(spark, sf_dir)
    out: dict = {"sf_dir": sf_dir}
    ok = True
    t0 = time.perf_counter()

    probes = {
        "l38_phrase": lambda **kw: phrase_search(
            spark, table, ["customer", "join"], k=10, **kw
        ),
        "l39_near": lambda **kw: proximity_search(
            spark, table, "customer", "query", 3, 10, **kw
        ),
    }
    for name, run in probes.items():
        run().collect()  # warm: index/sidecar caches + codegen, untimed
        t_on = time.perf_counter()
        on = sorted(map(tuple, run().collect()))
        t_on = time.perf_counter() - t_on
        t_off = time.perf_counter()
        off = sorted(map(tuple, run(use_cutoff=False).collect()))
        t_off = time.perf_counter() - t_off
        if on != off:
            out[name] = {"error": "cutoff changed the answer", "on": on, "off": off}
            ok = False
            continue
        s_on: dict = {}
        run(stats_out=s_on).collect()
        s_off: dict = {}
        run(stats_out=s_off, use_cutoff=False).collect()
        ratio = (
            round(s_off["naive_postings"] / s_on["kept_postings"], 3)
            if s_on.get("kept_postings")
            else None
        )
        out[name] = {
            "naive_postings": s_off["naive_postings"],
            "kept_postings": s_on["kept_postings"],
            "theta": s_on["theta"],
            "prune_ratio": ratio,
            "wall_on_sec": round(t_on, 3),
            "wall_off_sec": round(t_off, 3),
        }
    out["wall_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
