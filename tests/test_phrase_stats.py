"""Positional-tier term statistics (r09, VERDICT r08 missing #2): the
__terms sidecar on the positional index drives phrase/NEAR
intersections from the rarest term, short-circuits never-indexed terms
without opening a postings file, and pushes the rare term's doc set
into the common term's scan as a doc_id IN filter."""

from __future__ import annotations

from pyspark.sql import functions as F


def _corpus(spark, n_common=300):
    # "the" is stopword-frequency (every doc), "zebra" appears in two
    # docs — adjacent as "the zebra" in both
    rows = [(i, f"the filler{i} pad{i % 7}") for i in range(n_common)]
    rows += [(1000, "see the zebra run"), (1001, "near the zebra now")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _build(spark, tmp_path, name="pidx"):
    from shadowcat_data_spark.pipeline import text_index as TI

    table = str(tmp_path / name)
    TI.build_positional_index(spark, _corpus(spark), "doc_id", "text", table)
    return table


def test_phrase_probe_drives_from_rarest_term(spark, tmp_path, monkeypatch):
    """A phrase whose FIRST term is stopword-frequency must not drag the
    stopword's full posting list through the chain: the sidecar
    reorders the intersection to start at 'zebra' (df 2), and the
    point-lookup fetch-back pushes zebra's doc set into 'the''s scan as
    a doc_id IN pushdown — visible in the executed plan. Results equal
    the brute force."""
    from shadowcat_data_spark.pipeline import text_index as TI

    table = _build(spark, tmp_path)
    dfs = TI._term_dfs(spark, table, ["the", "zebra"])
    assert dfs == {"the": 302, "zebra": 2}

    got = TI.phrase_search(spark, table, ["the", "zebra"], k=10)
    rows = [(r.doc_id, r.n_matches, r.rnk) for r in got.collect()]
    assert rows == [(1000, 1, 1), (1001, 1, 2)]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "In(doc_id, [1000,1001])" in plan, (
        "common term's scan must carry the rare term's doc_id pushdown"
    )


def test_phrase_never_indexed_term_opens_no_postings_file(
    spark, tmp_path, monkeypatch
):
    """df=0 is exact when the sidecar exists (delta-before-postings
    ordering), so a phrase containing a never-indexed term returns
    empty having read ONLY the sidecar — zero postings files open."""
    from shadowcat_data_spark.pipeline import text_index as TI
    from shadowcat_data_spark.plans import lakehouse as LH

    table = _build(spark, tmp_path)
    opened: list[str] = []
    orig = LH._read_files_mor

    def spy(spark_, table_, man_, files_, *a, **k):
        opened.append(table_)
        return orig(spark_, table_, man_, files_, *a, **k)

    monkeypatch.setattr(LH, "_read_files_mor", spy)
    got = TI.phrase_search(spark, table, ["the", "nosuchtoken"], k=10)
    assert got.count() == 0
    assert table not in opened, "postings must not be read for df=0"
    assert all(t == TI._terms_table(table) for t in opened)

    # proximity takes the same short-circuit
    opened.clear()
    got = TI.proximity_search(spark, table, "nosuchtoken", "the", 3, 10)
    assert got.count() == 0
    assert table not in opened


def test_phrase_fallback_without_sidecar_unchanged(spark, tmp_path):
    """An index without a sidecar (pre-r09 layout, or a crash between
    the postings create and the sidecar create) serves the original
    union-read plan — same answers, no reorder, no short-circuit that
    could wrongly empty a live phrase."""
    import shutil

    from shadowcat_data_spark.pipeline import text_index as TI

    table = _build(spark, tmp_path)
    shutil.rmtree(TI._terms_table(table))
    assert TI._term_dfs(spark, table, ["the"]) is None
    got = [
        (r.doc_id, r.n_matches)
        for r in TI.phrase_search(spark, table, ["the", "zebra"], k=10).collect()
    ]
    assert got == [(1000, 1), (1001, 1)]


def test_phrase_two_common_terms_theta_cutoff(spark, tmp_path, monkeypatch):
    """The r10 early-termination bound (VERDICT r09 missing #3): a
    phrase of two COMMON terms (both df above the point-lookup
    threshold) must not intersect both full posting lists — the
    two-phase cutoff exact-counts the k docs with the largest
    rarest-term tf, takes θ = the kth count, and the final chain reads
    the other term's postings with the θ-candidate doc set pushed into
    the SCAN: strictly less work than the full df-sized intersection,
    with results equal to brute force."""
    from shadowcat_data_spark.pipeline import text_index as TI

    rows = [
        (1, "alpha beta alpha beta alpha beta"),
        (2, "alpha beta alpha beta"),
        (3, "alpha beta"),
    ]
    rows += [(10 + i, f"alpha pad{i}") for i in range(20)]
    rows += [(40 + i, f"beta qad{i}") for i in range(20)]
    table = str(tmp_path / "pidx_theta")
    TI.build_positional_index(
        spark,
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
        table,
    )
    monkeypatch.setattr(TI, "_PHRASE_POINT_LOOKUP_MAX", 4)
    assert TI._term_stats(spark, table, ["alpha", "beta"]) == {
        "alpha": (23, 3),
        "beta": (23, 3),
    }

    got = TI.phrase_search(spark, table, ["alpha", "beta"], k=2)
    assert [(r.doc_id, r.n_matches, r.rnk) for r in got.collect()] == [
        (1, 3, 1),
        (2, 2, 2),
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    # θ = 2 (the 2nd-best seed count) → candidates = docs with
    # rarest-term tf ≥ 2 = {1, 2}; both common scans carry the cut —
    # the anchor by the tf filter, the other term by the doc_id IN
    # pushdown (df 23 list never enters the join)
    assert "In(doc_id, [1,2])" in plan, (
        "common term's scan must carry the θ-candidate doc_id pushdown"
    )
    assert "size(positions" in plan and ">= 2" in plan, (
        "anchor scan must carry the tf ≥ θ cut"
    )
    # doc 3 matches the phrase but cannot reach θ — correctly outside
    # the top-2 without its intersection ever being computed
    full = TI.phrase_search(spark, table, ["alpha", "beta"], k=10)
    assert [(r.doc_id, r.n_matches) for r in full.collect()][:3] == [
        (1, 3),
        (2, 2),
        (3, 1),
    ]


def test_proximity_two_common_endpoints_theta_cutoff(spark, tmp_path, monkeypatch):
    """The NEAR half of the r10 cutoff: with both endpoints common, the
    planner anchors on t1 (a doc's match count is ≤ its t1 tf — the
    only sound per-doc bound, since one t2 occurrence can qualify up to
    slop t1 positions), seeds the k largest t1 tfs, and restricts the
    band join to docs whose t1 tf reaches the kth seed count, pushed
    into t2's scan."""
    from shadowcat_data_spark.pipeline import text_index as TI

    rows = [
        (1, "alpha beta alpha beta alpha beta"),
        (2, "alpha beta alpha beta"),
        (3, "alpha beta"),
    ]
    rows += [(10 + i, f"alpha pad{i}") for i in range(20)]
    rows += [(40 + i, f"beta qad{i}") for i in range(20)]
    table = str(tmp_path / "pidx_near")
    TI.build_positional_index(
        spark,
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
        table,
    )
    monkeypatch.setattr(TI, "_PHRASE_POINT_LOOKUP_MAX", 4)
    got = TI.proximity_search(spark, table, "alpha", "beta", 1, 2)
    assert [(r.doc_id, r.n_matches, r.rnk) for r in got.collect()] == [
        (1, 3, 1),
        (2, 2, 2),
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "In(doc_id, [1,2])" in plan, (
        "t2's scan must carry the θ-candidate doc_id pushdown"
    )
    assert "size(positions" in plan and ">= 2" in plan, (
        "t1's scan must carry the tf ≥ θ cut"
    )
    # full-k run still surfaces the θ-pruned doc at its true rank
    full = TI.proximity_search(spark, table, "alpha", "beta", 1, 10)
    assert [(r.doc_id, r.n_matches) for r in full.collect()][:3] == [
        (1, 3),
        (2, 2),
        (3, 1),
    ]


def test_phrase_max_tf_one_skips_seed_pass(spark, tmp_path, monkeypatch):
    """max_tf's job in the phrase planner: a phrase count is ≤ every
    term's tf, so when no doc repeats a term (min max_tf == 1 — most
    bigrams) θ can never exceed 1 and the seed pass must be SKIPPED —
    no seed lookup jobs, no candidate pushdown, the plain full chain."""
    from shadowcat_data_spark.pipeline import text_index as TI

    rows = [(i, f"gamma delta fill{i}") for i in range(12)]
    rows += [(100 + i, f"gamma gap{i}") for i in range(8)]
    rows += [(200 + i, f"delta gup{i}") for i in range(8)]
    table = str(tmp_path / "pidx_flat")
    TI.build_positional_index(
        spark,
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
        table,
    )
    monkeypatch.setattr(TI, "_PHRASE_POINT_LOOKUP_MAX", 4)
    stats = TI._term_stats(spark, table, ["gamma", "delta"])
    assert {t: s[1] for t, s in stats.items()} == {"gamma": 1, "delta": 1}

    collects = []
    cls = type(spark.range(1))  # the CONCRETE DataFrame class (pyspark 4
    # facades collect on pyspark.sql.DataFrame; instances resolve the
    # classic subclass override, so patch where the lookup lands)
    orig = cls.collect

    def spy(df):
        collects.append(df)
        return orig(df)

    monkeypatch.setattr(cls, "collect", spy)
    got = TI.phrase_search(spark, table, ["gamma", "delta"], k=5)
    # the only collects are metadata lookups (bucket routing + the
    # sidecar stats fold) — no seed-id lookup, no seed-count job, no
    # candidate-id fetch, all of which would collect doc-level frames
    seedish = [
        df for df in collects
        if set(df.columns) & {"doc_id", "n_matches", "tfr"}
    ]
    assert not seedish, (
        "seed pass must be skipped when min max_tf == 1"
    )
    rows_out = [(r.doc_id, r.n_matches) for r in got.collect()]
    assert rows_out == [(i, 1) for i in range(5)]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "In(doc_id" not in plan


def test_proximity_common_side_scan_pruned(spark, tmp_path):
    """NEAR probes drive from the rarer endpoint regardless of argument
    order: the common side's scan carries the doc_id pushdown in both
    ('the' NEAR 'zebra') and ('zebra' NEAR 'the') argument orders, and
    both answer the brute force."""
    from shadowcat_data_spark.pipeline import text_index as TI

    table = _build(spark, tmp_path)
    # "the zebra": zebra follows 'the' within 2 in both zebra docs
    got = TI.proximity_search(spark, table, "the", "zebra", 2, 10)
    rows = [(r.doc_id, r.n_matches) for r in got.collect()]
    assert rows == [(1000, 1), (1001, 1)]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "In(doc_id, [1000,1001])" in plan

    # reversed endpoints: 'the' within 2 AFTER zebra occurs nowhere
    got = TI.proximity_search(spark, table, "zebra", "the", 2, 10)
    assert got.count() == 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "In(doc_id, [1000,1001])" in plan


def test_positional_lifecycle_keeps_sidecar_current(spark, tmp_path):
    """The lifecycle legs maintain the positional sidecar exactly like
    the tf tier's: a re-crawl that INTRODUCES a term gives it a df>0
    row (without it the short-circuit would wrongly empty its
    phrases), and the re-crawled phrase answers from the rare-driven
    plan."""
    from shadowcat_data_spark.pipeline import text_index as TI

    table = _build(spark, tmp_path)
    fixed = spark.createDataFrame(
        [(1000, "see the okapi run")], "doc_id long, text string"
    )
    TI.reindex_docs(
        spark, fixed, "doc_id", "text", table,
        postings_fn=TI._positional_postings,
    )
    dfs = TI._term_dfs(spark, table, ["okapi", "zebra"])
    assert dfs["okapi"] == 1  # introduced by the re-crawl
    assert dfs["zebra"] >= 1  # stale-high allowed, never 0
    got = [
        (r.doc_id, r.n_matches)
        for r in TI.phrase_search(spark, table, ["the", "okapi"], k=10).collect()
    ]
    assert got == [(1000, 1)]
    got = [
        (r.doc_id, r.n_matches)
        for r in TI.phrase_search(spark, table, ["the", "zebra"], k=10).collect()
    ]
    assert got == [(1001, 1)]


def test_ensure_positional_rebuilds_when_sidecar_missing(spark, tmp_path, monkeypatch):
    """The ensure predicate (r09): a persisted positional index whose
    __terms sidecar is missing — pre-r09 layout, or a crash between the
    postings create and the sidecar create — must REBUILD on ensure,
    not serve without the stats tier; a current index with its sidecar
    is reused without a build."""
    import os
    import shutil

    from shadowcat_data_spark.pipeline import text_index as TI

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    _corpus(spark, 30).select(
        "doc_id", "text",
        F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").alias("n_chars"),
    ).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    table = TI._ensure_positional_index(spark, sf_dir)
    assert TI._term_dfs(spark, table, ["the"]) is not None

    # simulate the crash window: postings committed, sidecar never landed
    shutil.rmtree(TI._terms_table(table))
    table2 = TI._ensure_positional_index(spark, sf_dir)
    assert table2 == table
    dfs = TI._term_dfs(spark, table, ["the", "zebra"])
    assert dfs is not None and dfs["zebra"] == 2, "rebuild must restore the sidecar"

    # and a current index is trusted without rebuilding: builder bombed
    def bomb(*a, **k):
        raise AssertionError("ensure rebuilt a current index")

    monkeypatch.setattr(TI, "build_positional_index", bomb)
    assert TI._ensure_positional_index(spark, sf_dir) == table
