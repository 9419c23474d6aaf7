"""sf1 / sf10 scale smoke (VERDICT r02 item 6; sf10 tier = VERDICT r04 #2):
synthesize 10× / 100× the sf0.1 fixtures, run the headline queries (sf1)
or the heavy machinery families (sf10), and assert the task-level scale
invariants the sf0.1 bench cannot see — no large stage collapsing to a
single task (packing/partitioning cliff) and bounded peak task time
(skew cliff).

Synthesis: each table is COPIES disjoint replicas of its sf0.1 self, with
every key column offset by copy_i * 10_000_000. Offsetting keeps each
replica's join graph closed, so query result sizes scale ~linearly
(duplicating keys verbatim would square join fan-outs instead). Timestamps
are untouched — more events per time window is exactly what a bigger
deployment looks like. Output is resharded to SHARDS files per table so
scans start from a multi-file layout, not the single-file fixture.

Run:  python tools/scale_smoke.py            # sf1: synthesizes if needed
      python tools/scale_smoke.py --sf10     # sf10: ~60M-row lineitem tier
      python tools/scale_smoke.py --sf30     # sf30: documents-only l2b probe
      python tools/scale_smoke.py --resynth  # force re-synthesis
      python tools/scale_smoke.py --sf10 --only=l2b_minhash_lsh  # one query
Prints one JSON line (queries, per-query max task seconds, violations) and
exits non-zero on an invariant violation.

The sf30 tier (r05 verdict #1) synthesizes ONLY the documents table at
300× sf0.1 — the l2b verify stage was the one identified scale ceiling
(peak task 78.6–81.3s at sf10, linear in corpus size, vs the 120s
invariant); this tier proves the rebalanced verify keeps the peak task
SUBLINEAR across the sf10→sf30 corpus step. Synthesis detail: each
copy's text gets a ``grp{i%3}`` salt token appended, so dup FAMILIES
stay 100 members (the sf10 density) while the corpus and the candidate
volume triple — naive 300-way replication would push every LSH bucket
past the 200 cap and the verify stage would (correctly, by design)
receive nothing.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SRC_SF = "/root/testdata/sf0.1"
SF10 = "--sf10" in sys.argv
SF30 = "--sf30" in sys.argv
TIER = "sf30" if SF30 else ("sf10" if SF10 else "sf1")
ONLY = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
OUT_DIR = os.path.join(tempfile.gettempdir(), "shadowcat_io", f"{TIER}_smoke")
EVENTLOG_DIR = os.path.join(
    tempfile.gettempdir(), "shadowcat_io", f"{TIER}_eventlog"
)
COPIES = 300 if SF30 else (100 if SF10 else 10)
OFFSET = 10_000_000
SHARDS = 128 if SF30 else (64 if SF10 else 32)

# sf10 runs the heavy machinery families only (bounded dedup, persisted
# ANN, lakehouse write paths + CDF, graph, plus two relational anchors):
# the full 12-query headline set stays the sf1 tier's job — at 100× the
# point is finding packing/skew cliffs in exactly the operators whose
# candidate generation or routing could go quadratic, not re-timing scans.
SF10_QUERIES = [
    "a1_pricing_summary",      # scan+agg anchor (60M-row lineitem)
    "j6_star_join",            # join anchor
    "l1_exact_dedup",          # digest shuffle at 100-way dup density
    "l2b_minhash_lsh",         # LSH bands: every doc now has 99 true dups
    "l28_semantic_dedup",      # SRP bucket self-join at 100-dup density
    "l3g_ann_index_build",     # IVF train+persist over 100× vectors
    "l3h_ann_index_probe",     # probe the committed index
    "l3k_knn_graph",           # corpus↔corpus top-k through the index
    "m20_partitioned_merge",   # bucket-routed COW MERGE write path
    "m24_change_data_feed",    # CDF diff at 100× change volume
    "m28_cdf_replay",          # CDC replay of the change stream
    "graph_triangle_count",    # degree-ordered wedge join
    "graph_label_propagation", # iterative per-round shuffle discipline
    # r06 verdict #5: the text-index family gets its own scale story
    "l32_text_index_probe",    # inverted-index build + pruned probe at 100×
    # r07 verdict #5: the bounded retrieval tiers get their own scale rows
    "l37_text_search_or",      # WAND-pruned OR top-k at 100×
    "l34_text_bm25",           # bounded BM25 probe (dl-on-posting, post-fix)
    "t27_stream_text_index",   # streaming index maintenance at 100×
    "t28_stream_reindex",      # streaming MOR re-crawl upserts at 100×
    # r08: tokenizer train+encode (the word-count explode and the
    # per-round vocab jobs must stay flat at 100×) and the dup-substring
    # window sweep (≈100M digest rows through one groupBy + semi join)
    "l43_bpe_encode",
    "l44_dup_ngram_coverage",
    # r08: the streaming window-digest index — each trigger's additive
    # merge must rewrite only touched shards as the index grows
    "t31_stream_ngram_index",
    # r09: the trim's interval-gap rewrite — the planted 100k-token book
    # rows (below) put a worst-case boilerplate doc through the per-doc
    # trim; its bounded task time is the recorded evidence the r08
    # quadratic stays dead (VERDICT r08 #2/#3)
    "l46_dup_ngram_trim",
    # r09: the delete/re-crawl lifecycle at 100× — seed-with-mis-crawl,
    # retract+add, delete: every commit must stay delta-sized (negative
    # deltas route through the same partition-pruned merge as t31's)
    "l47_dup_ngram_recrawl",
    # r11 (VERDICT r10 missing #3): the STREAMING lifecycle leg — now
    # the sweep's most expensive query and, after the r11 pruned
    # point-lookup store reads, the one whose per-trigger boundedness
    # this tier exists to keep honest: each trigger's two store reads
    # must plan from the bloom/span-pruned file set, its store commit
    # is an O(batch) MOR upsert, and its index commit an appended delta
    # segment — at 100× corpus the peak task is the trigger's digest
    # leg, never a store scan
    "t33_stream_ngram_recrawl",
]

# every int64 key-domain column per table (offset per copy so each replica's
# join graph stays closed and disjoint from the others)
KEY_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# task-level invariants: a stage moving this much data must parallelize,
# and no task may run away (skew straggler)
BIG_STAGE_BYTES = 512 * 1024 * 1024
MIN_TASKS_FOR_BIG_STAGE = 8
MAX_TASK_SECONDS = 120.0


# the sf30 tier probes only documents-reading queries — synthesizing the
# other nine tables at 300× would triple the tier's disk/time for nothing.
# l32 joined l2b in r07 (verdict #5): the index build is the explode+groupBy
# word-count shape whose peak task must stay flat as the corpus triples
SF30_TABLES = {"documents"}
SF30_QUERIES = [
    "l2b_minhash_lsh",
    "l32_text_index_probe",
    # r07: the positional tier (position arrays triple the posting row
    # weight — the build's write fan-out and probe pruning must hold)
    "l38_phrase_search",
    # r08: the dup-substring window sweep at 300× — the digest groupBy
    # is the largest shuffle row count of any text query, and the
    # salted copies make every window a 100-fold duplicate (the
    # boilerplate regime the left-semi probe must not fan out on)
    "l44_dup_ngram_coverage",
    # r10 (VERDICT r09 #6): the delete/re-crawl lifecycle at 300×, with
    # a BOOK in the re-crawl slice (doc 999000005 ≡ 3 mod 7): the seed
    # mis-crawl doubles it to ~200k tokens, so the retraction leg nets
    # the single heaviest per-doc delta the engine can see. Every
    # lifecycle commit is an appended delta segment after the r10 LSM
    # rewrite — this row records that the commits stay delta-sized and
    # the fold/compact stays task-bounded as the index reaches its
    # largest tier
    "l47_dup_ngram_recrawl",
]


def synthesize(spark: SparkSession, force: bool = False) -> None:
    tables = (
        {t: k for t, k in KEY_COLS.items() if t in SF30_TABLES}
        if SF30
        else KEY_COLS
    )
    for table, keys in tables.items():
        dst = os.path.join(OUT_DIR, f"{table}.parquet")
        if not force and os.path.isdir(dst):
            continue
        src = spark.read.parquet(os.path.join(SRC_SF, f"{table}.parquet"))
        copies = []
        for i in range(COPIES):
            c = src
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * OFFSET)).cast(src.schema[k].dataType))
            if SF30 and table == "documents":
                # keep dup families at the sf10 density (100 members, under
                # the 200 LSH bucket cap) while tripling the corpus — see
                # the module docstring
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" grp{i % 3}"))
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        if table == "documents" and (SF10 or SF30):
            # r09: two book-shaped rows — a 100k-token doc alternating a
            # 40-token boilerplate paragraph with unique runs (~50% of
            # tokens under corpus-duplicated windows) and a half-length
            # prefix copy (cross-doc duplication). The l46 trim's task
            # time on these is the smoke's evidence that the per-doc
            # work stays O(n + d log d), not O(n·d). r10: the first
            # book's id is ≡ 3 mod 7 (and ≢ 5 mod 11), putting it in
            # l47's re-crawl slice — the lifecycle must retract a
            # ~200k-token doubled mis-crawl of it.
            boiler = " ".join(f"bp{i}" for i in range(40))
            parts: list[str] = []
            u = 0
            while u < 50_000:
                parts.append(boiler)
                parts.append(" ".join(f"bk{u + i}" for i in range(40)))
                u += 40
            book = " ".join(parts)
            half = " ".join(book.split(" ")[: len(book.split(" ")) // 2])
            books = spark.createDataFrame(
                [
                    (999_000_005, book, "en", "book", len(book)),
                    (999_000_002, half, "en", "book", len(half)),
                ],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
            out = out.unionByName(books.select(*out.columns))
        out.repartition(SHARDS).write.mode("overwrite").parquet(dst)
        print(f"[synth] {table}: {out.count()} rows -> {dst}", file=sys.stderr)


def parse_eventlog() -> tuple[dict[int, dict], list[str]]:
    """Aggregate task metrics per stage from the newest event log."""
    logs = sorted(
        (
            os.path.join(EVENTLOG_DIR, f)
            for f in os.listdir(EVENTLOG_DIR)
            if os.path.isfile(os.path.join(EVENTLOG_DIR, f))
            and not f.endswith(".inprogress")
        ),
        key=os.path.getmtime,
    )
    stages: dict[int, dict] = {}
    with open(logs[-1]) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                info = ev.get("Task Info", {})
                dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1000.0
                m = ev.get("Task Metrics") or {}
                in_b = (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                sh_b = sum(
                    (m.get("Shuffle Read Metrics") or {}).get(k, 0)
                    for k in ("Remote Bytes Read", "Local Bytes Read")
                )
                s = stages.setdefault(sid, {"n_tasks": 0, "bytes": 0, "max_task_s": 0.0})
                s["n_tasks"] += 1
                s["bytes"] += in_b + sh_b
                s["max_task_s"] = max(s["max_task_s"], dur)
    violations = []
    for sid, s in stages.items():
        if s["bytes"] >= BIG_STAGE_BYTES and s["n_tasks"] < MIN_TASKS_FOR_BIG_STAGE:
            violations.append(
                f"stage {sid}: {s['bytes'] >> 20} MiB in {s['n_tasks']} task(s)"
            )
        if s["max_task_s"] > MAX_TASK_SECONDS:
            violations.append(f"stage {sid}: task ran {s['max_task_s']:.0f}s")
    return stages, violations


def main() -> None:
    force = "--resynth" in sys.argv
    os.makedirs(EVENTLOG_DIR, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", OUT_DIR)

    from shadowcat_data_spark import registry
    from shadowcat_data_spark.session import effective_cpus

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(effective_cpus()))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"{TIER}-scale-smoke")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g" if (SF10 or SF30) else "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{EVENTLOG_DIR}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from shadowcat_data_spark.session import ensure_session

    ensure_session(spark)
    synthesize(spark, force=force)

    import bench  # repo-root bench: reuse its query list

    # round-3 additions with nontrivial scale behavior worth smoking: the
    # degree-oriented wedge join (graph), the PQ ADC scan, and the
    # window+array curation pass. The exact-edge inverted-index ops
    # (l2a/l2e/l2f) are deliberately NOT here: their output is quadratic
    # in dup-cluster size and this synthetic corpus makes every doc a
    # 10-way near-dup — the LSH tier (l2b, in the bench list) is their
    # scale path (SCALE.md "exact-edge density bound").
    extra = [
        "graph_triangle_count",
        "l3e_pq_ann",
        "l27_curation_pipeline",
        # continued-session additions: the iterative LPA loop (per-round
        # shuffle discipline) and the SRP-bucketed semantic dedup (the
        # 10-way-replica corpus makes every vector a 10-dup family, so the
        # bucket self-join is exercised at real density)
        "graph_label_propagation",
        "l28_semantic_dedup",
        # lakehouse: full copy-on-write MERGE commit over ~1.5M orders and
        # the 4-batch streaming upsert — the write-path additions
        "m17_acid_merge",
        "t18_stream_lakehouse_merge",
        # round-4 additions: the partition-pruned MERGE (touched buckets
        # only — contrast with m17's full rewrite at the same row count),
        # manifest-stats file skipping, and the persisted-ANN-index
        # build/probe split (probe time here includes the one-time build
        # via the ensure-on-miss path; l3g isolates the build cost)
        "m20_partitioned_merge",
        "m21_pruned_key_scan",
        "l3g_ann_index_build",
        "l3h_ann_index_probe",
        # continued-session additions: the merge-on-read lifecycle at 1.5M
        # rows (delete/upsert commits write O(change-set); materialize
        # rewrites touched buckets) and the WAP staged-append publish
        "m33_mor_materialize",
        "m37_wap_publish",
        # this session's additions: runtime-filter join pruning (probe
        # files skipped from the build side's key span) and in-engine
        # GD training (12 corpus-pass aggregates — the iteration cost is
        # what must stay flat per pass at scale)
        "m40_runtime_filter_join",
        "l30_quality_logreg",
        # r08: the tokenizer pipeline (train = 20 vocab-sized argmax
        # rounds after ONE corpus word count; encode = broadcast join)
        # and the sliding-window dup-substring signal (per-token window
        # explode — the largest shuffle row count of any text query)
        "l43_bpe_encode",
        "l44_dup_ngram_coverage",
    ]

    specs = registry.load_all()
    times: dict[str, float] = {}
    names = (
        SF30_QUERIES if SF30 else SF10_QUERIES if SF10 else bench.BENCH_QUERIES + extra
    )
    if ONLY:
        names = [n for n in names if n in ONLY] or ONLY
    for name in names:
        fn = specs[name].fn
        t0 = time.perf_counter()
        fn(spark, OUT_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 2)
        print(f"[smoke] {name}: {times[name]}s", file=sys.stderr)

    spark.stop()  # flush the event log before parsing
    stages, violations = parse_eventlog()
    worst = sorted(stages.values(), key=lambda s: -s["max_task_s"])[:5]
    out = {
        "metric": f"{TIER}_scale_smoke_total",
        "value": round(sum(times.values()), 2),
        "unit": "sec",
        "queries": times,
        "sf": 30.0 if SF30 else 10.0 if SF10 else 1.0,
        "n_stages": len(stages),
        "peak_task_s": max((s["max_task_s"] for s in stages.values()), default=0.0),
        "worst_stages": worst,
        "violations": violations,
    }
    print(json.dumps(out))
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
