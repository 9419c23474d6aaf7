"""Audit every registered query's physical plan for scale red flags.

Run: python tools/plan_audit.py [sf_dir]

For each entry in the registry it builds the DataFrame (no execution) and
inspects the Spark physical plan for:

- ``BatchEvalPython``  — row-at-a-time Python UDF in the plan (slow path;
  only acceptable where a query is explicitly UDF-surface coverage)
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — non-equi fan-out
  (acceptable only for the intentional theta/cross-join coverage queries
  and tiny broadcast-side probes)
- exchange (shuffle) count — a smell when far above what the operator
  semantically needs
- ``InMemoryTableScan`` leaks, missing WholeStageCodegen

Prints one line per query plus a summary of flagged plans; exits non-zero
if an UNEXPECTED flag appears (the allowlist below records the intended
exceptions, each with its reason).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

# queries where the "red flag" is the documented point of the query
ALLOW = {
    "j7_cross_join": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "j7_theta_join": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    # brute-force cosine baseline: broadcast the tiny query side over the
    # corpus is exactly the intended plan (BNLJ with broadcast build side)
    "l3_cosine_topk": {"BroadcastNestedLoopJoin"},
    "l4b_embedding_near_dup": {"BroadcastNestedLoopJoin"},
    # contamination scan: `contains(text, probe)` is inherently non-equi;
    # the probe set (benchmark n-grams) stays MBs at any corpus scale, so
    # broadcast-NLJ over the broadcast probes IS the scale plan
    "l10_contamination": {"BroadcastNestedLoopJoin"},
    # scalar-aggregate subquery pattern: a ONE-row aggregate (global avg /
    # min-max bounds) broadcast-joined with no key — the build side is a
    # single row at any data scale, so BNLJ here is a constant-cost apply
    "q22_idle_rich_customers": {"BroadcastNestedLoopJoin"},
    "q11_important_stock": {"BroadcastNestedLoopJoin"},
    "q15_top_supplier": {"BroadcastNestedLoopJoin"},
    # snapshot-log DataSource smoke: combines a ONE-row aggregate of the
    # current snapshot with a ONE-row aggregate of version 1 — both sides
    # are single rows at any table scale, so the keyless BNLJ is a
    # constant-cost apply (a literal join key gets constant-folded away,
    # so there is no way to express this as a hash join)
    "s17_snapshotlog_source": {"BroadcastNestedLoopJoin"},
    "l5_tfidf_top_terms": {"BroadcastNestedLoopJoin"},
    "l16_bigram_pmi": {"BroadcastNestedLoopJoin"},
    "m4_gap_fill_locf": {"BroadcastNestedLoopJoin"},
    # UDF-surface coverage queries exist to exercise the Python paths
    "u1_pandas_udf": {"ArrowEvalPython"},
    "u7_arrow_scalar_udf": {"ArrowEvalPython"},
    "u10_iterator_pandas_udf": {"ArrowEvalPython"},
    "u2_apply_in_pandas": {"FlatMapGroupsInPandas"},
    "u3_map_in_pandas": {"MapInPandas"},
    "u6_map_in_arrow": {"MapInArrow"},
    # scalable global-enumerate: the Arrow pass is the per-partition
    # enumerator that REPLACES the single-task global window
    "o7_global_enumerate": {"MapInArrow"},
    "u4_udaf_segment_avg": {"FlatMapGroupsInPandas"},
    # UDTF-surface coverage: Spark 4 runs Python UDTFs via BatchEvalPythonUDTF
    # (not Arrow-batched yet) — the Python table-function path is the point
    "u5_udtf_chunking": {"BatchEvalPython"},
    "mm_decode_features": {"MapInPandas"},
    "mm_frame_sample": {"MapInPandas"},
    # real pixel kernels (round 5): PPM decode + NN/box/bilinear resize —
    # the Arrow-batched Python stage IS the codec path, map-side only
    "mm_resize": {"MapInPandas"},
    "mm_resize_box": {"MapInPandas"},
    "mm_resize_bilinear": {"MapInPandas"},
    "mm_audio_decode": {"MapInPandas"},
    "mm_phash_neardup": {"MapInPandas"},
    # the baseline-JPEG entropy decode is a codec kernel like the PPM/WAV
    # ones: map-side-only over binaryFile splits, scalars-only shuffle
    "mm_jpeg_decode": {"MapInPandas"},
    "mm_png_decode": {"MapInPandas"},
    "mm_flac_decode": {"MapInPandas"},
    "mm_jpeg_progressive": {"MapInPandas"},
    "mm_jpeg_lossless": {"MapInPandas"},
    # WARC record split is a map-side container kernel like the codecs
    "s18_warc_ingest": {"MapInPandas"},
    # the rerank stage applies a ONE-row broadcast query vector to the
    # <=50 candidate rows — constant-cost keyless apply (q11/q15/l18's
    # documented one-row-aggregate pattern)
    "l41_hybrid_rerank": {"BroadcastNestedLoopJoin"},
    "mm_video_decode": {"MapInPandas"},
    "mm_video_frame_sample": {"MapInPandas"},
    "mm_gif_decode": {"MapInPandas"},
    # multimodal curation composes the PPM + WAV decode kernels
    "mm_curation_gate": {"MapInPandas"},
    # corpus↔corpus kNN graph: per-cluster blocked-GEMM scoring — the
    # vectorized Python stage IS the scale path (interpreted HOF cosine
    # measured 100x slower at sf10); same justification as l3d
    "l3k_knn_graph": {"FlatMapCoGroupsInPandas"},
    "t6_stateful_per_key": {"FlatMapGroupsInPandas", "ArrowEvalPython"},
    # one-row scalar-aggregate broadcast (quota / percentile bounds): the
    # build side is a single row at any scale — constant-cost apply
    "l18_mixture_resample": {"BroadcastNestedLoopJoin"},
    "l23_length_band_filter": {"BroadcastNestedLoopJoin"},
    "m15_orphan_file_audit": {"BroadcastNestedLoopJoin"},  # one-row count apply
    # the blocked-GEMM scale path IS the vectorized Python stage
    "l3d_blocked_gemm_topk": {"MapInPandas"},
    # PQ ADC scan: the tiny query+LUT side (m*n_codes floats per query row)
    # broadcasts across corpus partitions — BNLJ with a KB-sized build side
    # is the intended map-side scan, same justification as l3_cosine_topk.
    # MapInPandas (round 5): the PQ encode + query-LUT GEMM kernels — the
    # literal-expression forms spent 15 s in Catalyst analysis per run
    "l3e_pq_ann": {"BroadcastNestedLoopJoin", "MapInPandas"},
    # SRP bucketing (round 5): one Arrow GEMM packs all table sign-bits per
    # vector batch — the 48 interpreted dot-folds it replaces dominated wall
    "l3b_ann_lsh": {"MapInPandas"},
    # int8 scan: broadcast quantized query side over the corpus — same
    # intended map-side scan as l3_cosine_topk, with 4x narrower rows
    "l3f_int8_topk": {"BroadcastNestedLoopJoin"},
    # three ONE-row aggregates (node/edge/triangle counts) combined into a
    # single summary row — constant-cost scalar crossJoin at any scale
    "graph_triangle_count": {"BroadcastNestedLoopJoin", "CartesianProduct"},
    # polymorphic UDTF coverage — same Python table-function path as u5
    "u8_udtf_analyze_ngrams": {"BatchEvalPython"},
}

FLAGS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "FlatMapCoGroupsInPandas",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "MapInArrow",
)

# queries whose GLOBAL (no-partitionBy) window is the documented point:
# o1 materializes a total order with rank (the semantics ARE global), and
# o7's offsets window runs over one row PER PARTITION (#partitions rows —
# bounded by cluster topology, not data)
GLOBAL_WINDOW_ALLOW = {
    "o1_global_sort",
    "o7_global_enumerate",
    # W11 is the empty-OVER ratio-to-report operator itself; its input is
    # pre-aggregated to key grain (one row per customer), documented in
    # the query docstring as the contract that keeps the window viable
    "w11_ratio_to_report",
    # m15's empty-frame count runs over the orphan FILE CENSUS — O(#files)
    # metadata rows, not data rows; the window avoids a second
    # listing+anti-join pass for the total
    "m15_orphan_file_audit",
}


def _top_level_bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a plan-node description. A Window
    node prints [exprs], then its NON-EMPTY specs: partitioned+ordered →
    3 groups; partition-only or order-only → 2 (disambiguated by the
    ASC/DESC markers only an order spec carries); fully global → 1."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0:
                groups.append("".join(buf))
                continue
        if depth >= 1:
            buf.append(ch)
    return groups


def _is_global_window(node: str) -> bool:
    groups = _top_level_bracket_groups(node)
    if len(groups) >= 3:
        return False  # partitioned AND ordered
    if len(groups) <= 1:
        return True  # no spec at all: empty OVER ()
    # two groups: [exprs] plus either a partition spec (fine) or an
    # order spec (global sort — flag)
    spec = groups[1]
    return " ASC" in spec or " DESC" in spec


def _node_indent(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-*(":
        i += 1
    return i


def find_unbounded_global_windows(plan: str) -> bool:
    """VERDICT r06 rule: a ``Window`` with an EMPTY partition spec
    executes in ONE task over its whole input — a scale-killer unless
    that input is constant-bounded. Flags any such window whose subtree
    contains no bounding node (TakeOrderedAndProject / limit); the
    orderBy().limit(k)-then-rank house pattern passes because the
    window's child IS the k-row TakeOrderedAndProject."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        s = ln[_node_indent(ln):]
        if not (s.startswith("Window ") or s.startswith("WindowInPandas ")):
            continue
        if not _is_global_window(s):
            continue  # partitioned window: fine
        indent = _node_indent(ln)
        bounded = False
        for nxt in lines[i + 1:]:
            if nxt.strip() and _node_indent(nxt) <= indent:
                break  # left the subtree
            if any(
                t in nxt
                for t in ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")
            ):
                bounded = True
                break
        if not bounded:
            return True
    return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from shadowcat_data_spark.session import get_spark
    from shadowcat_data_spark.registry import all_queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    unexpected: dict[str, list[str]] = {}
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming wrappers execute eagerly; skip
            print(f"{name:32s}  SKIP ({type(exc).__name__})")
            continue
        hits = [f for f in FLAGS if f in plan]
        if find_unbounded_global_windows(plan) and name not in GLOBAL_WINDOW_ALLOW:
            hits.append("GlobalWindow")
        n_ex = plan.count("Exchange") - plan.count("ReusedExchange")
        bad = [h for h in hits if h not in ALLOW.get(name, set())]
        mark = "!!" if bad else ("ok" if not hits else "ok*")
        print(f"{name:32s}  {mark}  exchanges={n_ex:2d}  {','.join(hits) or '-'}")
        if bad:
            unexpected[name] = bad

    if unexpected:
        print("\nUNEXPECTED FLAGS:")
        for name, bad in unexpected.items():
            print(f"  {name}: {', '.join(bad)}")
        return 1
    print("\nall plans clean (allowlisted exceptions marked ok*)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
