"""Physical-plan invariants: the optimizations we rely on at 100 TB must be
visible in explain output, or a regression has silently disabled them."""

from __future__ import annotations

from pyspark.sql import functions as F

from shadowcat_data_spark.session import load_table

from .conftest import SF_DIR


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(spark):
    p = load_table(spark, SF_DIR, "part")
    df = p.filter(F.col("p_size") >= 40).select("p_partkey", "p_brand")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(p_size,40)" in plan


def test_column_pruning_reaches_parquet(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    plan = _plan(df)
    # ReadSchema must NOT include unprojected columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_broadcast_hint_respected(spark):
    c = load_table(spark, SF_DIR, "customer")
    n = load_table(spark, SF_DIR, "nation")
    df = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    assert "BroadcastHashJoin" in _plan(df)


def test_star_join_broadcasts_dims(spark):
    from shadowcat_data_spark.operators.joins import star_join

    plan = _plan(star_join(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_semi_anti_planned_as_joins(spark):
    c = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    assert "LeftSemi" in _plan(c.join(o, c.c_custkey == o.o_custkey, "left_semi"))
    assert "LeftAnti" in _plan(c.join(o, c.c_custkey == o.o_custkey, "left_anti"))


def test_aggregation_is_partial_then_final(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    plan = _plan(li.groupBy("l_returnflag").agg(F.sum("l_quantity")))
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_whole_stage_codegen_active(spark):
    import contextlib
    import io

    li = load_table(spark, SF_DIR, "lineitem")
    df = (
        li.filter(F.col("l_quantity") > 10)
        .groupBy("l_returnflag")
        .agg(F.sum("l_extendedprice"))
    )
    # AQE wraps everything in AdaptiveSparkPlan pre-execution, hiding codegen
    # nodes from explain; flip it off just to observe the codegen planning.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
        assert "WholeStageCodegen subtrees" in buf.getvalue()
        assert "Found 0" not in buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_range_join_is_hash_join_not_bnlj(spark):
    """The band-expansion rewrite must plan as an equi hash/sortmerge join —
    a BroadcastNestedLoopJoin would mean the rewrite regressed."""
    from shadowcat_data_spark.operators.joins import range_join_tiers

    plan = _plan(range_join_tiers(spark, SF_DIR))
    assert "NestedLoop" not in plan


def test_topn_uses_take_ordered(spark):
    o = load_table(spark, SF_DIR, "orders")
    df = o.orderBy(F.col("o_totalprice").desc()).limit(10)
    assert "TakeOrderedAndProject" in _plan(df)


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed by the join key → SortMergeJoin with zero
    shuffles: the whole point of paying the bucketing at write time."""
    from shadowcat_data_spark.operators.joins import bucketed_orders_lineitem

    plan = _plan(bucketed_orders_lineitem(spark, SF_DIR))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_salted_join_matches_plain_join(spark):
    """Salting redistributes rows but must not change the join result."""
    from shadowcat_data_spark.operators.joins import salted_join

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    s = load_table(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(8)).cast("int")
    salted = salted_join(li, s, "l_suppkey", "s_suppkey", salt)
    plain = li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
    assert salted.count() == plain.count()
    diff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
    assert diff == 0


def test_clustered_layout_enables_file_skipping(spark):
    """s7: after range-clustering by l_shipdate, per-file min/max footer
    stats are (a) tight and (b) mostly disjoint, so a one-month filter
    overlaps only a small subset of files — the pruning payoff."""
    import glob
    import os

    import pyarrow.parquet as pq

    from shadowcat_data_spark.sources.io import _scratch
    from shadowcat_data_spark.sources.layout import clustered_write

    li = load_table(spark, SF_DIR, "lineitem")
    path = _scratch(SF_DIR, "lineitem_by_shipdate_test")
    clustered_write(li, path, ["l_shipdate"], 8)
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        lo = min(md.row_group(g).column(col_idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(col_idx).statistics.max for g in range(md.num_row_groups))
        spans.append((lo, hi))
    assert len(spans) == 8
    spans.sort()
    # disjoint ranges: each file's min is >= the previous file's max
    for (_, prev_hi), (lo, _) in zip(spans, spans[1:]):
        assert lo >= prev_hi
    # a one-month window overlaps few files (here: at most 2 of 8)
    import datetime as dt

    w_lo, w_hi = dt.datetime(1997, 1, 1), dt.datetime(1997, 2, 1)
    overlapping = sum(1 for lo, hi in spans if lo < w_hi and hi >= w_lo)
    assert overlapping <= 2, spans


def test_zorder_key_locality(spark):
    """s8: sorting by the Morton key bounds BOTH dimensions' spread within
    each of k contiguous chunks (vs sorting by one column, which leaves the
    other at full spread). Uses two uniform 0..255 dims — the property
    needs comparable cardinality on both axes, which the skewed fixture
    keys (10 distinct suppkeys) can't show."""
    import statistics

    from shadowcat_data_spark.sources.layout import zorder_key

    n, k, full = 4096, 16, 255
    base = spark.range(n).select(
        (F.col("id") % 256).alias("x"),
        F.floor(F.col("id") / 256 * 16).alias("y"),  # decorrelated 0..255
    )
    base = base.withColumn("y", (F.col("y") * 37 + F.col("x") * 13) % 256)
    chunk = (
        base.orderBy(zorder_key(F.col("x"), F.col("y")))
        .coalesce(1)  # one partition → monotonic id preserves global order
        .withColumn("rn", F.monotonically_increasing_id())
        .withColumn("bucket", (F.col("rn") * k / n).cast("int"))
    )
    rows = chunk.groupBy("bucket").agg(
        (F.max("x") - F.min("x")).alias("dx"),
        (F.max("y") - F.min("y")).alias("dy"),
    ).collect()
    # median per-chunk spread must be well under the full range in BOTH
    # dimensions — the whole point of multi-dim clustering
    assert statistics.median(r.dx for r in rows) < 0.7 * full
    assert statistics.median(r.dy for r in rows) < 0.7 * full


def test_q21_decorrelates_to_single_fact_pass(spark):
    """q21's EXISTS/NOT-EXISTS pair must stay collapsed into one per-order
    aggregate: no nested-loop join and no third lineitem scan."""
    from shadowcat_data_spark.plans.tpch import waiting_orders

    plan = _plan(waiting_orders(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("lineitem.parquet") <= 2  # late-lines side + flags side


def test_q18_preaggregates_before_join(spark):
    """The HAVING pre-aggregation must sit BELOW the orders join (join
    inputs are |groups|, not |lineitem|). ``explain("formatted")`` prints
    pre-order from the root, so a correctly placed aggregate appears AFTER
    the joins in the text; an aggregate printed before every join would
    mean the plan regressed to join-then-aggregate."""
    from shadowcat_data_spark.plans.analytics import large_orders

    plan = _plan(large_orders(spark, SF_DIR))
    first_agg = plan.find("HashAggregate")
    first_join = min(
        x
        for x in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"))
        if x != -1
    )
    assert first_agg != -1 and first_join != -1 and first_join < first_agg


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """A partitioned fact joined to a filtered dim must prune partitions at
    RUNTIME via DPP: the fact scan carries a dynamicpruning subquery on the
    partition column, so only partitions matching the dim filter are read —
    at 100 TB the difference between scanning 3 partitions and 3000."""
    li = load_table(spark, SF_DIR, "lineitem")
    fact_path = str(tmp_path / "fact_by_flag")
    li.select("l_orderkey", "l_quantity", "l_returnflag").write.mode(
        "overwrite"
    ).partitionBy("l_returnflag").parquet(fact_path)
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), ("N", "neither")],
        "flag string, label string",
    ).write.parquet(dim_path)
    fact = spark.read.parquet(fact_path)
    # DPP needs a FILTERED scan on the dim side (a bare LocalRelation has no
    # Filter node to derive the pruning subquery from)
    dim = spark.read.parquet(dim_path).filter(F.col("label") == "returned")
    joined = fact.join(dim, fact["l_returnflag"] == dim["flag"]).select(
        "l_orderkey", "label"
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_global_enumerate_is_exact_permutation(spark):
    """o7: global ids are exactly 1..n and rank-consistent with the order
    column, regardless of input partitioning."""
    from shadowcat_data_spark.operators.relational import global_enumerate

    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k")
    ).repartition(13)  # scrambled values, adversarial partitioning
    out = global_enumerate(df, ["k"]).orderBy("k").collect()
    ids = [r.global_id for r in out]
    ks = [r.k for r in out]
    assert ids == list(range(1, 1001))
    assert ks == sorted(ks)


def test_analyze_table_attaches_cbo_stats(spark, tmp_path):
    """`ANALYZE TABLE` must attach rowCount/sizeInBytes statistics the
    cost-based optimizer reads — the cluster-side prerequisite for CBO
    join reordering that SCALE.md defers to (AQE covers it locally)."""
    df = load_table(spark, SF_DIR, "nation")
    spark.sql("CREATE DATABASE IF NOT EXISTS stats_test")
    spark.sql("DROP TABLE IF EXISTS stats_test.nation_stats")
    import shutil
    from urllib.parse import urlparse
    import os as _os

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(_os.path.join(wh, "stats_test.db", "nation_stats"), ignore_errors=True)
    df.write.saveAsTable("stats_test.nation_stats")
    spark.sql("ANALYZE TABLE stats_test.nation_stats COMPUTE STATISTICS")
    desc = {
        r.col_name: r.data_type
        for r in spark.sql("DESCRIBE TABLE EXTENDED stats_test.nation_stats").collect()
    }
    assert "Statistics" in desc, sorted(desc)
    assert "25 rows" in desc["Statistics"], desc["Statistics"]


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's skew-join handling must actually fire when a join key is hot:
    with the skew thresholds forced low, the executed plan marks the
    SortMergeJoin with skew=true and splits the oversized partition. This
    is the runtime half of the skew story (j12's salting is the manual
    half) — worth pinning because a conf regression would silently turn
    100 TB hot keys back into stragglers."""
    skewed = spark.range(0, 500_000).select(
        F.when(F.col("id") % 100 < 97, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),  # fat rows
    )
    dim = spark.range(0, 50_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ path
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = skewed.join(dim, "k")
        # execute through THIS DataFrame's own queryExecution: count()/write
        # plan separately and would leave this plan isFinalPlan=false
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_topk_per_group_pushes_window_group_limit(spark):
    """w2's rank-filter must plan with Partial+Final WindowGroupLimit —
    the map-side top-3-per-group pruning that makes the pattern scale;
    without it every row shuffles into the window sort."""
    from shadowcat_data_spark.operators.windows import topk_per_group

    plan = _plan(topk_per_group(spark, SF_DIR))
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_interval_overlap_is_equi_join_not_bnlj(spark):
    """j13's week-bucket expansion must plan as an equi join on wk — a
    NestedLoop plan means the theta predicate leaked into the join."""
    from shadowcat_data_spark.operators.joins import interval_overlap

    plan = _plan(interval_overlap(spark, SF_DIR))
    assert "NestedLoop" not in plan


def test_bloom_prefilter_join_is_all_broadcast(spark):
    """j15: both phases (bucket semi + exact join) must broadcast — the
    fact table is never shuffled, which is the entire point of the
    pre-filter at scale."""
    from shadowcat_data_spark.operators.joins import bloom_prefilter_join

    plan = _plan(bloom_prefilter_join(spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # semi + inner
    assert "SortMergeJoin" not in plan  # fact side never shuffled for a join
    assert "LeftSemi" in plan


def test_lateral_join_decorrelates(spark):
    """j14: the LATERAL top-2 subquery must decorrelate to a join + window
    rank, not a per-row nested-loop replay."""
    from shadowcat_data_spark.operators.joins import lateral_join

    plan = _plan(lateral_join(spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_span_dedup_shuffle_count_is_bounded(spark):
    """l21 needs exactly two data shuffles: one on span_text (occurrence
    window), one on doc_id (reassembly). A third would mean the plan
    re-shuffles the exploded spans."""
    from shadowcat_data_spark.pipeline.text import span_dedup

    plan = _plan(span_dedup(spark, SF_DIR))
    # tree nodes only — "formatted" prints each operator again in the detail
    assert plan.count("+- Exchange") <= 2


def test_bucket_pruning_selects_buckets(spark):
    """s16: an IN filter on the bucket column must prune buckets at scan
    (SelectedBucketsCount < total) — layout-as-index working."""
    from shadowcat_data_spark.sources.layout import bucket_pruning

    df = bucket_pruning(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan[:500]


def test_shuffle_hash_hint_pins_strategy(spark):
    """j16: the hint must produce a ShuffledHashJoin (no sort-merge)."""
    from shadowcat_data_spark.operators.joins import shuffle_hash_hint

    plan = _plan(shuffle_hash_hint(spark, SF_DIR))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_plan_constant_across_iterations(spark):
    """graph_pagerank must localCheckpoint per iteration (like
    connected_components): the optimized plan of the returned ranks is a
    constant-size checkpointed relation, not a tree that grows with
    _PR_ITERS — the lineage blow-up that kills iterative DataFrame loops."""
    import shadowcat_data_spark.plans.analytics as A

    def plan_lines(iters):
        orig = A._PR_ITERS
        A._PR_ITERS = iters
        try:
            df = A.graph_pagerank(spark, SF_DIR)
            return len(df._jdf.queryExecution().optimizedPlan().toString().splitlines())
        finally:
            A._PR_ITERS = orig

    assert plan_lines(2) == plan_lines(6)


def test_j18_plan_has_dynamic_partition_pruning(spark):
    """j18's point is the PLAN: the fact scan's partition filters must
    carry a runtime dynamicpruning subquery fed by the filtered dim."""
    from shadowcat_data_spark import registry
    from tests.conftest import SF_DIR

    df = registry.load_all()["j18_dynamic_partition_pruning"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan


def test_plan_audit_flags_unbounded_global_windows(spark):
    """VERDICT r06 rule: the audit must flag any Window with an empty
    partition spec over a non-constant-bounded input (the l34/l35 class),
    while passing (a) partitioned windows, (b) partition-only frames,
    (c) the orderBy().limit(k)-then-rank house pattern whose global
    window reads a constant-bounded TakeOrderedAndProject."""
    import sys

    sys.path.insert(0, ".")
    from pyspark.sql import Window as W, functions as F

    from tools.plan_audit import find_unbounded_global_windows

    df = spark.range(100).withColumn("k", F.col("id") % 7)

    def plan(d):
        return d._jdf.queryExecution().executedPlan().toString()

    # the scale-killer: global row_number over the whole input
    bad = df.withColumn("rn", F.row_number().over(W.orderBy("id")))
    assert find_unbounded_global_windows(plan(bad))
    # empty OVER () aggregate: also a one-task window
    bad2 = df.withColumn("total", F.sum("id").over(W.partitionBy()))
    assert find_unbounded_global_windows(plan(bad2))
    # partitioned window: fine
    ok1 = df.withColumn(
        "rn", F.row_number().over(W.partitionBy("k").orderBy("id"))
    )
    assert not find_unbounded_global_windows(plan(ok1))
    # partition-only frame (no order): fine
    ok2 = df.withColumn("n", F.count("*").over(W.partitionBy("k")))
    assert not find_unbounded_global_windows(plan(ok2))
    # the house pattern: limit-bounded global rank
    from shadowcat_data_spark.pipeline.text_index import _global_topk_ranked

    ok3 = _global_topk_ranked(df, [F.col("id").desc()], 5)
    p3 = plan(ok3)
    assert "TakeOrderedAndProject" in p3
    assert not find_unbounded_global_windows(p3)
