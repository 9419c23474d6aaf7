"""Hypothesis property tests for the pure-expression operators — algebraic
laws that need no oracle and run on a tiny in-memory frame. One shared
frame per case keeps Spark job count low; hypothesis drives the VALUES."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from shadowcat_data_spark.sources.layout import zorder_key
from shadowcat_data_spark.pipeline.text import _REDACTIONS


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
        min_size=1,
        max_size=8,
    )
)
def test_zorder_matches_reference_interleave(spark, pairs):
    """The SQL bit-interleave equals the literal Python Morton encode —
    and is therefore invertible (both halves recoverable)."""
    df = spark.createDataFrame(pairs, "x: long, y: long")
    got = df.select(zorder_key(F.col("x"), F.col("y")).alias("z"), "x", "y").collect()
    for r in got:
        assert r.z == _morton_py(r.x, r.y)


@settings(max_examples=15, deadline=None)
@given(st.text(alphabet="ab0-@. ", min_size=0, max_size=60))
def test_redaction_is_idempotent(spark, s):
    """Applying the PII scrub twice equals applying it once (no pattern
    matches its own replacement tokens)."""
    from shadowcat_data_spark.pipeline.text import redact

    df = spark.createDataFrame([(s,)], "t: string")
    once = df.select(redact(F.col("t")).alias("r"))
    twice = once.select(redact(F.col("r")).alias("r"))
    assert once.collect() == twice.collect()


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=40),
    st.integers(min_value=50, max_value=600),
)
def test_token_packing_invariants(spark, sizes, budget):
    """l12's shard id is floor((running_sum-1)/budget) in doc order — i.e.
    the budget-block containing the doc's LAST token (an oversized doc may
    skip ids; hypothesis found that with sizes=[51], budget=50 → shard 1).
    Check the Spark window against a pure-Python fold, plus the overshoot
    bound: a shard's last token sits within its block and its first doc
    starts at most first_doc-1 tokens before it, so
    total - budget <= first_doc - 1 (docs never split)."""
    from pyspark.sql import Window as W

    rows = [(i, int(s)) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    packed = df.withColumn(
        "shard", F.floor((F.sum("n_tok").over(w) - 1) / budget).cast("bigint")
    ).orderBy("doc_id").collect()

    running, expect = 0, []
    for s in sizes:
        running += s
        expect.append((running - 1) // budget)
    assert [r.shard for r in packed] == expect

    totals: dict[int, int] = {}
    first_doc: dict[int, int] = {}
    for r in packed:
        totals[r.shard] = totals.get(r.shard, 0) + r.n_tok
        first_doc.setdefault(r.shard, r.n_tok)
    for s, tot in totals.items():
        assert tot - budget <= first_doc[s] - 1, (s, tot, budget, first_doc[s])


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 60), st.integers(1, 20)), min_size=1, max_size=10),
    st.lists(st.tuples(st.integers(0, 60), st.integers(1, 20)), min_size=1, max_size=10),
    st.integers(min_value=1, max_value=14),
)
def test_interval_overlap_rewrite_equals_naive_theta(spark, ls, rs, bucket_days):
    """j13's bucket-expansion rewrite must emit exactly the pairs of the
    naive cross-join theta filter, each exactly once, for ANY intervals
    and ANY bucket width (the first-shared-bucket condition is what
    hypothesis is hunting here)."""
    from shadowcat_data_spark.operators.joins import interval_overlap_join

    def frame(rows, pre):
        return spark.createDataFrame(
            [(i, off, off + ln) for i, (off, ln) in enumerate(rows)],
            f"{pre}_id int, {pre}_o int, {pre}_e int",
        ).select(
            f"{pre}_id",
            F.date_add(F.lit("2024-01-01").cast("date"), F.col(f"{pre}_o")).alias(f"{pre}_lo"),
            F.date_add(F.lit("2024-01-01").cast("date"), F.col(f"{pre}_e")).alias(f"{pre}_hi"),
        )

    L, R = frame(ls, "l"), frame(rs, "r")
    got = sorted(
        (r.l_id, r.r_id)
        for r in interval_overlap_join(L, R, "l_lo", "l_hi", "r_lo", "r_hi", bucket_days).collect()
    )
    naive = sorted(
        (r.l_id, r.r_id)
        for r in L.crossJoin(R)
        .filter((F.col("l_lo") < F.col("r_hi")) & (F.col("r_lo") < F.col("l_hi")))
        .collect()
    )
    assert got == naive
