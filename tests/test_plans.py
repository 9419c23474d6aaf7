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
