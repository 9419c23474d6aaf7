"""Streaming semantics that the batch-twin oracle can't see: real multi-batch
watermark behavior (late-data drop / in-watermark accept)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mk(spark, rows):
    return (
        spark.createDataFrame(rows, "id long, ts_s string")
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .drop("ts_s")
    )


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "wm_stream"
    d.mkdir()
    return str(d)


def test_watermark_drops_late_beyond_accepts_within(spark, stream_dir):
    """Batch 1 advances the watermark; batch 2 carries one row older than the
    watermark (dropped) and one within it (accepted)."""
    _mk(spark, [(1, "2024-06-01 12:00:10"), (2, "2024-06-01 13:00:10")]).coalesce(
        1
    ).write.mode("append").parquet(stream_dir)

    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .parquet(stream_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("wm_test")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 → watermark = 13:00:10 - 1h = 12:00:10
        # batch 2: id=3 at 08:00 (far beyond watermark → dropped),
        #          id=4 at 12:30 (within the 12:00 window, not yet expired → counted)
        _mk(spark, [(3, "2024-06-01 08:00:00"), (4, "2024-06-01 12:30:00")]).coalesce(
            1
        ).write.mode("append").parquet(stream_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.sql(
        "SELECT window.start AS s, n FROM wm_test ORDER BY s, n"
    ).collect()
    starts = {r.s.strftime("%H:%M") for r in out}
    assert "08:00" not in starts, f"late row leaked past the watermark: {out}"
    # the 12:00 window appears twice in update mode: n=1 (batch 1), n=2 (batch 2)
    twelve = sorted(r.n for r in out if r.s.strftime("%H:%M") == "12:00")
    assert twelve == [1, 2], out


def test_streaming_dedup_across_batches(spark, tmp_path):
    """dropDuplicates state must persist across micro-batches: a key seen in
    batch 1 and re-sent in batch 2 (within the watermark) is emitted once."""
    d = tmp_path / "dedup_stream"
    d.mkdir()
    sdir = str(d)
    _mk(spark, [(1, "2024-06-01 12:00:00"), (2, "2024-06-01 12:10:00")]).coalesce(
        1
    ).write.mode("append").parquet(sdir)

    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .parquet(sdir)
        .withWatermark("ts", "2 hours")
        .dropDuplicates(["id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_test")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: id=1 is a cross-batch duplicate (must NOT re-emit);
        # id=3 is new (must emit)
        _mk(spark, [(1, "2024-06-01 12:20:00"), (3, "2024-06-01 12:30:00")]).coalesce(
            1
        ).write.mode("append").parquet(sdir)
        q.processAllAvailable()
    finally:
        q.stop()

    ids = sorted(r.id for r in spark.sql("SELECT id FROM dedup_test").collect())
    assert ids == [1, 2, 3], f"cross-batch dedup broken: {ids}"


def test_checkpoint_recovery_no_reprocessing(spark, tmp_path):
    """Exactly-once across restarts: a NEW query resuming from the same
    checkpoint must process only data that arrived after the stop — no
    duplicates from re-reading batch 1."""
    src = tmp_path / "ckpt_src"
    src.mkdir()
    sdir, ckpt, sink = str(src), str(tmp_path / "ckpt"), str(tmp_path / "sink")

    def start():
        return (
            spark.readStream.schema("id long, ts timestamp")
            .parquet(sdir)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    _mk(spark, [(1, "2024-06-01 12:00:00"), (2, "2024-06-01 12:10:00")]).coalesce(
        1
    ).write.mode("append").parquet(sdir)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _mk(spark, [(3, "2024-06-01 12:20:00")]).coalesce(1).write.mode("append").parquet(sdir)
    q2 = start()  # fresh query object, same checkpoint
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    ids = sorted(r.id for r in spark.read.parquet(sink).collect())
    assert ids == [1, 2, 3], f"checkpoint recovery re/under-processed: {ids}"


def test_available_now_trigger_processes_all_then_stops(spark, tmp_path):
    """Trigger.AvailableNow: process everything present, in rate-limited
    batches, then terminate on its own — the batch-over-stream execution
    mode for scheduled incremental jobs (vs processAllAvailable, which
    needs the caller to decide when to stop)."""
    src = tmp_path / "an_src"
    src.mkdir()
    sdir = str(src)
    _mk(spark, [(1, "2024-06-01 12:00:00"), (2, "2024-06-01 12:10:00")]).coalesce(
        1
    ).write.mode("append").parquet(sdir)
    _mk(spark, [(3, "2024-06-01 12:20:00")]).coalesce(1).write.mode("append").parquet(
        sdir
    )

    q = (
        spark.readStream.schema("id long, ts timestamp")
        .parquet(sdir)
        .writeStream.format("memory")
        .queryName("an_test")
        .trigger(availableNow=True)
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    assert q.awaitTermination(120), "availableNow query did not self-terminate"
    ids = sorted(r.id for r in spark.sql("SELECT id FROM an_test").collect())
    assert ids == [1, 2, 3]


def test_rocksdb_state_store_backend(spark, tmp_path):
    """Stateful streaming on the RocksDB state-store provider — the
    production backend for large state (HDFS-backed in-memory maps don't
    survive 100 GB of dedup keys). The provider is a per-query option via
    the session conf; verify a dedup query runs and dedups on it."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        d = tmp_path / "rocks_src"
        d.mkdir()
        sdir = str(d)
        _mk(
            spark,
            [(1, "2024-06-01 12:00:00"), (1, "2024-06-01 12:01:00"), (2, "2024-06-01 12:02:00")],
        ).coalesce(1).write.mode("append").parquet(sdir)
        stream = (
            spark.readStream.schema("id long, ts timestamp")
            .parquet(sdir)
            .dropDuplicates(["id"])
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("rocks_test")
            .option("checkpointLocation", str(tmp_path / "rocks_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            # the backend actually in use shows as rocksdb* custom metrics
            # on the state operator (provider class isn't echoed directly)
            ops = q.lastProgress["stateOperators"]
            assert ops and any(
                k.startswith("rocksdb") for k in ops[0]["customMetrics"]
            ), ops
        finally:
            q.stop()
        ids = sorted(r.id for r in spark.sql("SELECT id FROM rocks_test").collect())
        assert ids == [1, 2]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_lakehouse_merge_commits_one_snapshot_per_batch(spark):
    """t18: four micro-batches must leave exactly four committed snapshots
    with monotonically increasing recorded batch ids — the manifest trail
    that makes the idempotence guard (skip replayed ids) auditable."""
    from shadowcat_data_spark import registry
    from shadowcat_data_spark.plans.lakehouse import current_version, read_manifest
    from shadowcat_data_spark.sources.io import _scratch

    from .conftest import SF_DIR

    registry.load_all()["t18_stream_lakehouse_merge"].fn(spark, SF_DIR)
    table = _scratch(SF_DIR, "t18_user_totals")
    assert current_version(table) == 4
    ids = [read_manifest(table, v)["batch_id"] for v in range(1, 5)]
    assert ids == sorted(ids) == [0, 1, 2, 3]


def test_stream_partitioned_upsert_prunes_and_protects_order(spark):
    """t19: each micro-batch commit goes through the partition-pruned
    MERGE (manifests carry per-bucket stats; batch ids recorded for the
    replay guard), and the converged state is the GLOBAL per-user latest
    event — the conditional (ts, event_id) overwrite must make the result
    independent of how rows were sliced into batches."""
    from pyspark.sql import functions as SF

    from shadowcat_data_spark import registry
    from shadowcat_data_spark.plans.lakehouse import current_version, read_manifest
    from shadowcat_data_spark.session import load_table
    from shadowcat_data_spark.sources.io import _scratch

    from .conftest import SF_DIR

    out = registry.load_all()["t19_stream_partitioned_upsert"].fn(spark, SF_DIR)
    got = {r.user_id: (r.last_event_id, r.last_value) for r in out.collect()}
    table = _scratch(SF_DIR, "t19_user_latest")
    # v1 create + one merge per non-skipped batch, batch ids monotone
    v = current_version(table)
    assert v == 5
    ids = [read_manifest(table, k).get("batch_id") for k in range(2, v + 1)]
    assert ids == sorted(ids)
    # converged state equals the one-shot batch window over ALL events
    ev = load_table(spark, SF_DIR, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(SF.col("ts").desc(), SF.col("event_id").desc())
    truth = {
        r.user_id: (r.event_id, r.value)
        for r in ev.withColumn("rn", SF.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == truth


def test_cdf_stream_reader_matches_spark_diff(spark, tmp_path):
    """The t20 source's driver-side pyarrow diff must equal the
    executor-side snapshot_changes_incremental row for row, per commit —
    the stream emits exactly what a batch CDF reader would."""
    from shadowcat_data_spark.plans import lakehouse as LH
    from shadowcat_data_spark.sources.custom import _cdf_rows_for_version

    table = str(tmp_path / "pt")
    ddl = "k long, v double"
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], ddl)
    LH.create_partitioned(spark, df, table, ddl, "k", n_buckets=4)
    ch = spark.createDataFrame(
        [(3, "U", 1, 33.0), (100, "I", 1, 1.0), (7, "D", 1, None)],
        "k long, op string, seq int, v double",
    )
    LH.merge_partitioned(spark, table, ch)
    LH.append_partitioned(spark, table, spark.createDataFrame([(200, 2.0)], ddl))
    for v in (2, 3):
        via_arrow = sorted(_cdf_rows_for_version(table, v, "k", ["v"]))
        via_spark = sorted(
            map(tuple, LH.snapshot_changes_incremental(spark, table, v, "k").collect())
        )
        assert via_arrow == via_spark, f"v{v}: {via_arrow} != {via_spark}"


def test_t21_mor_forget_replay_idempotent(spark, tmp_path):
    """A replayed foreachBatch delivery (at-least-once under retries) must
    not double-commit: the manifest's batch_id guard makes the second
    delivery a no-op, and the deleted users stay deleted — no resurrect,
    no extra snapshot."""
    from shadowcat_data_spark.plans import lakehouse as LH
    from shadowcat_data_spark.plans import lakehouse_mor as MOR

    table = str(tmp_path / "t")
    ddl = "k long, u long"
    df = spark.createDataFrame([(i, i % 5) for i in range(50)], ddl)
    LH.create_partitioned(spark, df, table, ddl, "k", n_buckets=2)

    def forget(batch_users, batch_id):
        if LH.read_manifest(table).get("batch_id", -1) >= batch_id:
            return
        doomed = (
            LH.read_snapshot(spark, table)
            .join(batch_users, "u", "semi")
            .select("k")
        )
        MOR.delete_mor(spark, table, doomed, extra={"batch_id": batch_id})

    users = spark.createDataFrame([(3,)], "u long")
    forget(users, 0)
    v = LH.current_version(table)
    assert LH.read_snapshot(spark, table).count() == 40
    forget(users, 0)  # replayed delivery
    assert LH.current_version(table) == v, "replay must not commit"
    assert LH.read_snapshot(spark, table).count() == 40


def test_t26_cross_batch_duplicate_media_collapse(spark, tmp_path):
    """t26's merge property driven through the REAL helper: a payload
    arriving in two DIFFERENT micro-batches must still collapse to one
    index row with n_copies 2 and the lower id as canonical — the
    cross-batch associativity the lakehouse-maintained digest index
    relies on. Also pins the replay guard (re-committing a seen batch_id
    is a no-op) and — the r09 plan-weak fix — DELTA-SIZED commits: a
    trigger APPENDS its netted digests without reading or rewriting any
    existing file (uniform sha keys touch all shards, so the previous
    touched-shard MERGE was an O(index) rewrite); every prior segment
    carries forward byte-identical and the new files' row census equals
    the batch's distinct-digest count."""
    import os

    from shadowcat_data_spark.plans.lakehouse import (
        current_version,
        read_manifest,
    )
    from shadowcat_data_spark.streaming.ops import (
        read_media_digests,
        upsert_media_digests,
    )

    table = str(tmp_path / "midx")

    def upsert(batch_rows, batch_id):
        if current_version(table) and read_manifest(table).get("batch_id", -1) >= batch_id:
            return
        b = spark.createDataFrame(batch_rows, "media_id long, content binary")
        upsert_media_digests(
            spark, table,
            b.select(F.sha2(F.col("content"), 256).alias("payload_sha"), "media_id"),
            batch_id,
        )

    dup = b"same-bytes"
    # seed with a WIDE batch so many shards materialize files
    seed = [(i, f"payload-{i}".encode()) for i in range(40)] + [(10_000, dup)]
    upsert(seed, 0)
    man0 = read_manifest(table)
    sizes0 = {
        f: os.path.getsize(os.path.join(table, f)) for f in man0["files"]
    }
    upsert([(20, b"only-b1")], 1)
    upsert([(30, dup)], 2)  # the cross-batch duplicate

    got = {
        r.payload_sha: (r.n_copies, r.canonical_id)
        for r in read_media_digests(spark, table).collect()
    }
    assert len(got) == 42
    dup_sha = [s for s, (n, _) in got.items() if n == 2]
    assert len(dup_sha) == 1 and got[dup_sha[0]] == (2, 30)

    # delta-sized commits: EVERY v1 segment file is carried forward by
    # reference (same path, same bytes — appends read nothing), and the
    # rows added since v1 are exactly the two batches' digest counts
    man2 = read_manifest(table)
    assert all(f in man2["files"] for f in sizes0)
    for f in sizes0:
        assert os.path.getsize(os.path.join(table, f)) == sizes0[f]
    new_rows = sum(
        man2["stats"][f]["rows"] for f in man2["files"] if f not in sizes0
    )
    assert new_rows == 2

    # replay guard: batch 2 again → no new snapshot, nothing double-counted
    v = current_version(table)
    upsert([(30, dup)], 2)
    assert current_version(table) == v
    assert {
        r.payload_sha: (r.n_copies, r.canonical_id)
        for r in read_media_digests(spark, table).collect()
    } == got


def test_t31_cross_batch_window_counts_converge(spark, tmp_path):
    """t31's commit property driven through the REAL helper: an 8-token
    window whose two occurrences arrive in DIFFERENT micro-batches must
    still fold to n_occ 2 in the maintained index (count-sum
    associativity — the converged-equals-one-shot oracle equality), the
    replay guard must make a re-committed batch_id a no-op, and — the
    r09 plan-weak fix, pinned on a REALISTIC batch rather than the
    one-window degenerate case — a trigger must APPEND exactly its own
    netted delta rows: every pre-existing segment file carries forward
    byte-identical (zero reads, zero rewrites) and the new files' row
    census equals the batch's distinct-digest count, so per-commit
    written bytes are ∝ batch even though uniform digests touch ALL 16
    shards."""
    import os

    from shadowcat_data_spark.pipeline.ngram_index import read_ngram_counts
    from shadowcat_data_spark.pipeline.text import (
        _L44_K,
        ngram_window_digests,
    )
    from shadowcat_data_spark.plans.lakehouse import (
        current_version,
        read_manifest,
    )
    from shadowcat_data_spark.streaming.ops import upsert_ngram_counts

    table = str(tmp_path / "nidx")
    phrase = " ".join(f"tok{i}" for i in range(_L44_K))  # one exact window

    def upsert(batch_rows, batch_id):
        if current_version(table) and read_manifest(table).get("batch_id", -1) >= batch_id:
            return
        b = spark.createDataFrame(batch_rows, "doc_id long, text string")
        _, wins = ngram_window_digests(b, _L44_K)
        upsert_ngram_counts(spark, table, wins, batch_id)

    # seed WIDE (many distinct windows → every shard holds files), one
    # occurrence of the tracked phrase
    seed = [(i, " ".join(f"w{i}_{j}" for j in range(_L44_K))) for i in range(40)]
    seed.append((100, phrase))
    upsert(seed, 0)
    man0 = read_manifest(table)
    sizes0 = {f: os.path.getsize(os.path.join(table, f)) for f in man0["files"]}

    # a REALISTIC second trigger: 300 fresh single-window docs plus the
    # tracked phrase's duplicate — 301 uniform digests touch all 16
    # shards, the case where a touched-shard MERGE degenerates to a
    # full-index rewrite; the append commit must stay delta-sized
    batch1 = [
        (1000 + i, " ".join(f"x{i}_{j}" for j in range(_L44_K)))
        for i in range(300)
    ]
    batch1.append((2000, phrase))
    upsert(batch1, 1)

    idx = {r.h: r.n_occ for r in read_ngram_counts(spark, table).collect()}
    assert sum(1 for n in idx.values() if n == 2) == 1
    assert sum(idx.values()) == 342  # 341 singles + the tracked pair

    # delta-sized commit: EVERY seed segment file carries forward
    # byte-identical (the append read and rewrote nothing), and the new
    # files' manifest row census is exactly the batch's distinct-digest
    # count — written rows ∝ batch, never ∝ index
    man1 = read_manifest(table)
    assert all(f in man1["files"] for f in sizes0)
    for f in sizes0:
        assert os.path.getsize(os.path.join(table, f)) == sizes0[f]
    new_rows = sum(
        man1["stats"][f]["rows"] for f in man1["files"] if f not in sizes0
    )
    assert new_rows == 301

    # replay guard: batch 1 again → no new snapshot, nothing double-counted
    v = current_version(table)
    upsert([(2000, phrase)], 1)
    assert current_version(table) == v
    assert {r.h: r.n_occ for r in read_ngram_counts(spark, table).collect()} == idx


def test_l47_recrawl_erases_stale_windows(spark, tmp_path):
    """The delete/re-crawl lifecycle on the window-count index (VERDICT
    r08 "What's missing" #1): after seeding from a mis-crawl (doc 1
    text-doubled) and re-crawling with the true text, the index must be
    FOLD-IDENTICAL to a one-shot build over the true corpus — stale-only
    digests (the doubled doc's cross-boundary windows) read as erased,
    and counts inflated by the stale duplication return to their true
    values — and after ``compact_ngram_counts`` the equality holds
    PHYSICALLY: the on-disk rows are the one-shot rows, retracted
    digests leave no zombie rows in any segment file. Then a pure
    delete retracts a document entirely."""
    from shadowcat_data_spark.pipeline.ngram_index import (
        compact_ngram_counts,
        read_ngram_counts,
        recrawl_ngram_counts,
        upsert_ngram_counts,
    )
    from shadowcat_data_spark.pipeline.text import (
        _L44_K,
        ngram_window_digests,
    )
    from shadowcat_data_spark.plans.lakehouse import read_snapshot

    t1 = " ".join(f"a{i}" for i in range(12))
    t2 = " ".join(f"b{i}" for i in range(12))
    true = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    )
    stale = spark.createDataFrame(
        [(1, t1 + " " + t1), (2, t2)], "doc_id long, text string"
    )

    def counts(table):
        return {
            r.h: r.n_occ for r in read_ngram_counts(spark, table).collect()
        }

    def physical_rows(table):
        return {
            (r.h,): r.n_occ for r in read_snapshot(spark, table).collect()
        }

    # one-shot truth over the true corpus
    oneshot = str(tmp_path / "oneshot")
    _, w_true = ngram_window_digests(true, _L44_K)
    upsert_ngram_counts(spark, oneshot, w_true, 0)

    # lifecycle: seed stale → re-crawl doc 1 with the true text
    lived = str(tmp_path / "lived")
    _, w_stale = ngram_window_digests(stale, _L44_K)
    upsert_ngram_counts(spark, lived, w_stale, 0)
    before = counts(lived)
    _, old_w = ngram_window_digests(stale.filter("doc_id = 1"), _L44_K)
    _, new_w = ngram_window_digests(true.filter("doc_id = 1"), _L44_K)
    recrawl_ngram_counts(spark, lived, old_w, new_w, 1)

    after = counts(lived)
    assert after == counts(oneshot)
    # the mis-crawl really had inflated counts and stale-only digests —
    # otherwise this test proves nothing
    assert any(n >= 2 for n in before.values())
    assert set(before) - set(after), "stale-only digests must be erased"
    assert all(n == 1 for n in after.values())
    # physically: the retraction segment coexists with the seed until
    # compaction folds them — after it, the on-disk rows ARE the folded
    # rows (no zombie ≤0 digests in any file)
    compact_ngram_counts(spark, lived)
    assert physical_rows(lived) == {(h,): n for h, n in after.items()}

    # pure delete: doc 2's windows vanish, doc 1's stay
    _, del_w = ngram_window_digests(true.filter("doc_id = 2"), _L44_K)
    recrawl_ngram_counts(spark, lived, del_w, None, 2)
    left = counts(lived)
    _, w1 = ngram_window_digests(true.filter("doc_id = 1"), _L44_K)
    assert left == {
        r.h: 1 for r in w1.select("h").distinct().collect()
    }


def test_t33_second_retraction_targets_interim_not_seed(spark, tmp_path):
    """The crawl-store update leg (VERDICT r09 "What's missing" #2): a
    document re-crawled TWICE across triggers must have its SECOND
    retraction target the first re-crawl's interim text — which only
    the per-trigger store upsert can know — never the seed's. A static
    store would double-retract the seed and leave the interim windows
    as phantom counts; the negative control computes that wrong state
    and asserts the lifecycle does NOT land there. Also pins the
    crash-window replay: a trigger that committed its STORE leg but
    died before the INDEX leg must, on replay, retract the version
    that was live BEFORE the batch (the store's prev_text), not the
    one the interrupted attempt installed."""
    import hashlib
    from collections import Counter

    from pyspark.sql import functions as F
    from shadowcat_data_spark.pipeline.ngram_index import (
        read_ngram_counts,
        upsert_ngram_counts,
    )
    from shadowcat_data_spark.pipeline.text import ngram_window_digests
    from shadowcat_data_spark.plans.lakehouse import (
        create_partitioned,
        read_snapshot,
    )
    from shadowcat_data_spark.plans.lakehouse_mor import upsert_mor
    from shadowcat_data_spark.streaming.ops import (
        _T33_STORE_DDL,
        recrawl_store_batch,
    )

    k = 4
    seed1 = " ".join(f"s{i}" for i in range(8))
    interim1 = " ".join(f"i{i}" for i in range(8))
    final1 = " ".join(f"f{i}" for i in range(8))
    keep2 = " ".join(f"z{i}" for i in range(8))

    def wins(text):
        toks = text.split(" ")
        return Counter(
            hashlib.md5(" ".join(toks[j : j + k]).encode()).hexdigest()
            for j in range(len(toks) - k + 1)
        )

    def folded(table):
        return {
            r.h: r.n_occ for r in read_ngram_counts(spark, table).collect()
        }

    store = str(tmp_path / "store")
    table = str(tmp_path / "nidx")
    corpus = spark.createDataFrame(
        [(1, seed1), (2, keep2)], "doc_id long, text string"
    )
    create_partitioned(
        spark,
        corpus.select(
            "doc_id", "text",
            F.lit(None).cast("string").alias("prev_text"),
            F.lit(-1).cast("long").alias("last_batch"),
        ),
        store,
        _T33_STORE_DDL,
        "doc_id",
        n_buckets=2,
        bounds=[1.5],
    )
    _, w = ngram_window_digests(corpus, k)
    upsert_ngram_counts(spark, table, w, -1)

    def batch(text, bid):
        b = spark.createDataFrame(
            [(1, text, "recrawl")], "doc_id long, text string, op string"
        )
        recrawl_store_batch(spark, store, table, b, bid, k)

    batch(interim1, 0)
    st = {r.doc_id: (r.text, r.prev_text) for r in read_snapshot(spark, store).collect()}
    assert st[1] == (interim1, seed1)
    assert folded(table) == dict(wins(interim1) + wins(keep2))

    batch(final1, 1)
    st = {r.doc_id: (r.text, r.prev_text) for r in read_snapshot(spark, store).collect()}
    assert st[1] == (final1, interim1)
    got = folded(table)
    assert got == dict(wins(final1) + wins(keep2))
    # negative control: the static-store lifecycle (retract the SEED
    # twice) would leave interim windows live and seed windows negative
    static = Counter(wins(seed1) + wins(keep2))
    static.subtract(wins(seed1)); static.update(wins(interim1))
    static.subtract(wins(seed1)); static.update(wins(final1))
    wrong = {h: n for h, n in static.items() if n > 0}
    assert wrong != got, "negative control must diverge or it proves nothing"

    # replay of a completed trigger: both guards skip, nothing changes
    batch(final1, 1)
    assert folded(table) == got

    # crash window: batch 2's STORE leg commits (as the interrupted
    # attempt did), then the full trigger replays — the index leg must
    # retract final1 (the pre-batch version, = store prev_text), never
    # the just-installed next1
    next1 = " ".join(f"n{i}" for i in range(8))
    upsert_mor(
        spark, store,
        spark.createDataFrame(
            [(1, next1, final1, 2)], _T33_STORE_DDL
        ),
        extra={"batch_id": 2},
    )
    batch(next1, 2)
    assert folded(table) == dict(wins(next1) + wins(keep2))


def test_ngram_index_expire_snapshots_after_lifecycle(spark, tmp_path):
    """The dedup-gate state is an ordinary snapshot-log table, so the
    standard retention story applies: after a seed + re-crawl + delete
    lifetime (3 APPEND commits — which never supersede a file — plus
    the scheduled compaction, which supersedes every delta segment),
    expire_snapshots must reclaim every file only dead manifests
    reference while the surviving counts stay fold-identical — at
    100 TB the window-count index is the gate's only corpus-scale
    artifact and its history would otherwise grow without bound. This
    is the LSM retention story end to end: appends accumulate
    segments, compaction folds them, expiry reclaims them."""
    import os

    from shadowcat_data_spark.pipeline.ngram_index import (
        compact_ngram_counts,
        read_ngram_counts,
        recrawl_ngram_counts,
        upsert_ngram_counts,
    )
    from shadowcat_data_spark.pipeline.text import (
        _L44_K,
        ngram_window_digests,
    )
    from shadowcat_data_spark.plans.lakehouse import (
        expire_snapshots,
        read_snapshot,
    )

    t1 = " ".join(f"a{i}" for i in range(12))
    t2 = " ".join(f"b{i}" for i in range(12))
    true = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    )
    stale = spark.createDataFrame(
        [(1, t1 + " " + t1), (2, t2)], "doc_id long, text string"
    )
    table = str(tmp_path / "nidx")
    _, w_stale = ngram_window_digests(stale, _L44_K)
    upsert_ngram_counts(spark, table, w_stale, 0)
    _, old_w = ngram_window_digests(stale.filter("doc_id = 1"), _L44_K)
    _, new_w = ngram_window_digests(true.filter("doc_id = 1"), _L44_K)
    recrawl_ngram_counts(spark, table, old_w, new_w, 1)
    _, del_w = ngram_window_digests(true.filter("doc_id = 2"), _L44_K)
    recrawl_ngram_counts(spark, table, del_w, None, 2)
    compact_ngram_counts(spark, table)  # supersedes all delta segments

    before = {r.h: r.n_occ for r in read_ngram_counts(spark, table).collect()}
    n_files_before = sum(
        len(fs) for _, _, fs in os.walk(table) if fs
    )
    versions_before, versions_after, deleted = expire_snapshots(
        table, keep_latest=1
    )
    assert versions_before == 4 and versions_after == 1
    assert deleted > 0, "superseded delta segments must be reclaimed"
    after = {r.h: r.n_occ for r in read_ngram_counts(spark, table).collect()}
    assert after == before
    # strictly fewer on-disk files (expire also unlinks the dead
    # manifests and writer markers, so >= deleted data files went away)
    n_files_after = sum(len(fs) for _, _, fs in os.walk(table) if fs)
    assert n_files_after <= n_files_before - deleted


def test_t34_window_set_fold_forgives_replay(spark, tmp_path):
    """The decontamination index's SET fold (DISTINCT) is idempotent,
    so a segment appended TWICE — a replay that slipped past the
    batch-id guard entirely — still folds to the one-shot train set;
    the counter index needs its guard for correctness, the set index
    only for write economy. Compaction then collapses the duplicate
    segments physically: post-compact on-disk rows equal the folded
    set exactly."""
    from pyspark.sql import functions as F
    from shadowcat_data_spark.pipeline.text import ngram_window_digests
    from shadowcat_data_spark.plans.lakehouse import (
        compact_partitioned,
        read_snapshot,
    )
    from shadowcat_data_spark.streaming.ops import (
        _fold_window_set,
        read_train_windows,
        upsert_train_windows,
    )

    k = 4
    t1 = " ".join(f"a{i}" for i in range(8))
    t2 = " ".join(f"b{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    )
    table = str(tmp_path / "tw")
    _, w1 = ngram_window_digests(docs.filter("doc_id = 1"), k)
    _, w2 = ngram_window_digests(docs.filter("doc_id = 2"), k)
    upsert_train_windows(spark, table, w1, 0)
    upsert_train_windows(spark, table, w2, 1)
    oneshot = {r.h for r in read_train_windows(spark, table).collect()}
    _, wall = ngram_window_digests(docs, k)
    assert oneshot == {r.h for r in wall.select("h").distinct().collect()}

    # the replay that slipped the guard: append batch 1's segment again
    upsert_train_windows(spark, table, w2, 2)
    assert {r.h for r in read_train_windows(spark, table).collect()} == oneshot

    # physical collapse: raw rows exceed the set until compaction folds
    raw = read_snapshot(spark, table).count()
    assert raw > len(oneshot)
    compact_partitioned(spark, table, fold=_fold_window_set)
    assert read_snapshot(spark, table).count() == len(oneshot)
    assert {r.h for r in read_train_windows(spark, table).collect()} == oneshot


def test_t32_serving_snapshot_pinned_by_version(spark, tmp_path):
    """t32's serving contract (VERDICT r08 minor (a)): the hot set is
    pinned by lakehouse VERSION, so a concurrent t31 commit that
    advances HEAD — here, a new duplicate pair arriving mid-stream —
    must not change what in-flight triggers serve against; re-reading
    at HEAD sees the new hot digest, the pinned frame never does."""
    from shadowcat_data_spark.pipeline.ngram_index import (
        read_ngram_counts,
        upsert_ngram_counts,
    )
    from shadowcat_data_spark.pipeline.text import (
        _L44_K,
        ngram_window_digests,
    )
    from shadowcat_data_spark.plans.lakehouse import current_version
    from pyspark.sql import functions as F

    table = str(tmp_path / "nidx")
    pair = " ".join(f"p{i}" for i in range(_L44_K))
    seed = spark.createDataFrame(
        [(1, pair), (2, pair)], "doc_id long, text string"
    )
    _, w = ngram_window_digests(seed, _L44_K)
    upsert_ngram_counts(spark, table, w, 0)
    pinned = current_version(table)
    hot = (
        read_ngram_counts(spark, table, version=pinned)
        .filter(F.col("n_occ") >= 2)
        .select("h")
    )
    served0 = {r.h for r in hot.collect()}
    assert len(served0) == 1

    # concurrent maintenance commit advances HEAD with a NEW hot pair
    pair2 = " ".join(f"q{i}" for i in range(_L44_K))
    more = spark.createDataFrame(
        [(3, pair2), (4, pair2)], "doc_id long, text string"
    )
    _, w2 = ngram_window_digests(more, _L44_K)
    upsert_ngram_counts(spark, table, w2, 1)
    assert current_version(table) > pinned

    # a later trigger evaluating the SAME pinned frame serves the old set
    assert {r.h for r in hot.collect()} == served0
    head_hot = {
        r.h
        for r in read_ngram_counts(spark, table)
        .filter(F.col("n_occ") >= 2)
        .collect()
    }
    assert len(head_hot) == 2 and served0 < head_hot


def test_t30_null_lang_group_parity(spark, tmp_path):
    """A NULL-lang document WITH tokens must land its token sums in the
    NULL group on both sides: Spark's groupBy treats NULL as an ordinary
    key, so the oracle's doc→lang_words join must be null-safe (IS NOT
    DISTINCT FROM) — a plain equi-join silently zeroes the group's sums
    (review-found, fixture-verified)."""
    import os

    import duckdb

    from shadowcat_data_spark.compare import compare_frames
    from shadowcat_data_spark.registry import load_all

    fix = str(tmp_path / "fix")
    os.makedirs(fix)
    rows = [
        (0, "alpha beta gamma alpha", "en", "s0", 22),
        (1, "beta beta", None, None, 9),  # NULL lang WITH tokens
        (2, None, None, "s1", None),  # NULL text
        (3, "", "fr", "s0", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(fix, "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{fix}/documents.parquet/*.parquet')"
    )
    spec = load_all()["t30_stream_bpe_encode"]
    got = spec.fn(spark, fix).toPandas()
    res = compare_frames("t30", got, con.sql(spec.oracle).df())
    assert res.ok, res.detail
    null_row = got[got["lang"].isna()].iloc[0]
    assert (null_row["n_docs"], null_row["n_words"]) == (2, 2)


def test_t33_store_reads_are_pruned_point_lookups(spark, tmp_path):
    """The per-trigger store READS must be O(batch), not O(store)
    (VERDICT r10 "What's wrong"): a realistic multi-doc trigger against
    a corpus-scale crawl store must open strictly fewer store files
    than the manifest holds — both the pre-merge prev_text read and the
    post-merge retraction read — while the lifecycle's semantics stay
    byte-identical. The spy wraps the routed planner itself, so the
    counts are the real kept/total sets the reads were planned from."""
    import hashlib
    from collections import Counter

    from pyspark.sql import functions as F
    from shadowcat_data_spark.pipeline.ngram_index import (
        read_ngram_counts,
        upsert_ngram_counts,
    )
    from shadowcat_data_spark.pipeline.text import ngram_window_digests
    from shadowcat_data_spark.plans import lakehouse_zorder as LZ
    from shadowcat_data_spark.plans.lakehouse import (
        create_partitioned,
        read_manifest,
        read_snapshot,
    )
    from shadowcat_data_spark.streaming.ops import (
        _T33_STORE_DDL,
        recrawl_store_batch,
    )

    k = 4
    n_docs = 400
    corpus = spark.createDataFrame(
        [(i, " ".join(f"d{i}w{j}" for j in range(8))) for i in range(n_docs)],
        "doc_id long, text string",
    )
    store = str(tmp_path / "store")
    table = str(tmp_path / "nidx")
    create_partitioned(
        spark,
        corpus.select(
            "doc_id", "text",
            F.lit(None).cast("string").alias("prev_text"),
            F.lit(-1).cast("long").alias("last_batch"),
        ),
        store,
        _T33_STORE_DDL,
        "doc_id",
        n_buckets=8,
    )
    LZ.add_bloom_filters(spark, store, "doc_id")
    _, w = ngram_window_digests(corpus, k)
    upsert_ngram_counts(spark, table, w, -1)

    # realistic trigger: six documents re-crawled, ids clustered in two
    # of the eight bucket ranges (a crawl frontier's locality is weak,
    # but any batch is a BOUNDED id set — that's what the pruning uses)
    batch_ids = [10, 11, 12, 205, 206, 207]
    new_text = {i: " ".join(f"n{i}w{j}" for j in range(8)) for i in batch_ids}
    batch = spark.createDataFrame(
        [(i, new_text[i], "recrawl") for i in batch_ids],
        "doc_id long, text string, op string",
    )

    calls: list[tuple[int, int]] = []
    orig = LZ.pruned_files_routed

    def spy(*a, **kw):
        kept, total, report = orig(*a, **kw)
        calls.append((len(kept), total))
        return kept, total, report

    LZ.pruned_files_routed = spy
    try:
        recrawl_store_batch(spark, store, table, batch, 0, k)
    finally:
        LZ.pruned_files_routed = orig

    # both legs planned through the pruned reader, each opening a
    # strict subset of the store's data files
    assert len(calls) >= 2, f"expected two pruned store reads, saw {calls}"
    for kept, total in calls:
        assert 0 < kept < total, f"store read not pruned: {kept}/{total}"
    # the second (post-merge) read sees the appended trigger files
    assert calls[1][1] > calls[0][1]
    # the store advanced exactly the batch's docs
    st = {
        r.doc_id: (r.text, r.prev_text)
        for r in read_snapshot(spark, store)
        .filter(F.col("doc_id").isin(batch_ids))
        .collect()
    }
    for i in batch_ids:
        assert st[i][0] == new_text[i]
        assert st[i][1].startswith(f"d{i}w0")
    assert read_manifest(store)["batch_id"] == 0
    # index equals the one-shot over the post-batch corpus
    def wins(text):
        toks = text.split(" ")
        return Counter(
            hashlib.md5(" ".join(toks[j : j + k]).encode()).hexdigest()
            for j in range(len(toks) - k + 1)
        )

    want = Counter()
    for r in corpus.collect():
        want.update(wins(new_text.get(r.doc_id, r.text)))
    got = {r.h: r.n_occ for r in read_ngram_counts(spark, table).collect()}
    assert got == dict(want)


def test_t33_rejects_two_events_for_one_doc_in_a_trigger(spark, tmp_path):
    """Within-trigger event order is undefined, so a trigger carrying
    two events for one doc_id must fail LOUDLY instead of silently
    double-retracting prev_text and installing both revisions (r10
    ADVICE). The store must be untouched by the rejected batch."""
    import pytest
    from pyspark.sql import functions as F
    from shadowcat_data_spark.plans.lakehouse import (
        create_partitioned,
        current_version,
    )
    from shadowcat_data_spark.streaming.ops import (
        _T33_STORE_DDL,
        recrawl_store_batch,
    )

    store = str(tmp_path / "store")
    table = str(tmp_path / "nidx")
    create_partitioned(
        spark,
        spark.createDataFrame(
            [(1, "a b c d e", None, -1), (2, "f g h i j", None, -1)],
            _T33_STORE_DDL,
        ),
        store,
        _T33_STORE_DDL,
        "doc_id",
        n_buckets=2,
        bounds=[1.5],
    )
    v0 = current_version(store)
    dup = spark.createDataFrame(
        [(1, "x y z w v", "recrawl"), (1, "p q r s t", "recrawl")],
        "doc_id long, text string, op string",
    )
    with pytest.raises(ValueError, match="multiple events"):
        recrawl_store_batch(spark, store, table, dup, 0, 4)
    assert current_version(store) == v0, "rejected batch must not commit"


def test_fold_compaction_noop_and_flat_serving(spark, tmp_path):
    """The folded_seq stamp closes two costs at once (r10 ADVICE +
    VERDICT r10 next #4): (a) a repeat fold-compaction over a table
    with nothing appended since is a metadata-only NO-OP — no new
    snapshot, no O(index) rewrite of identical content; (b) the serving
    read of a fully-folded index plans FLAT — no aggregate node — while
    hash-equalling the folding read, and the next append restores the
    fold automatically."""
    from shadowcat_data_spark.pipeline.ngram_index import (
        _fold,
        compact_ngram_counts,
        read_ngram_counts,
        upsert_ngram_counts,
    )
    from shadowcat_data_spark.pipeline.text import ngram_window_digests
    from shadowcat_data_spark.plans.lakehouse import (
        current_version,
        read_snapshot,
    )

    k = 4
    docs1 = spark.createDataFrame(
        [(1, " ".join(f"a{i}" for i in range(10)))], "doc_id long, text string"
    )
    docs2 = spark.createDataFrame(
        [(2, " ".join(f"a{i}" for i in range(10)))], "doc_id long, text string"
    )
    table = str(tmp_path / "nidx")
    _, w1 = ngram_window_digests(docs1, k)
    upsert_ngram_counts(spark, table, w1, 0)
    _, w2 = ngram_window_digests(docs2, k)
    upsert_ngram_counts(spark, table, w2, 1)

    # pre-compaction: the read must fold (two overlapping segments)
    plan_before = (
        read_ngram_counts(spark, table)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Aggregate" in plan_before
    want = {(r.h, r.n_occ) for r in read_ngram_counts(spark, table).collect()}
    assert all(n == 2 for _, n in want), "segments must actually overlap"

    compact_ngram_counts(spark, table)
    v1 = current_version(table)

    # (a) repeat fold: no-op, no commit
    nb, na = compact_ngram_counts(spark, table)
    assert nb == na and current_version(table) == v1

    # (b) flat serving: no aggregate node, same content
    served = read_ngram_counts(spark, table)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" not in plan, plan
    assert {(r.h, r.n_occ) for r in served.collect()} == want
    # the fold of the physical rows is the identity on a folded base
    assert {
        (r.h, r.n_occ)
        for r in _fold(read_snapshot(spark, table)).collect()
    } == want

    # an append invalidates the stamp: the read folds again and the
    # next fold-compaction is no longer a no-op
    upsert_ngram_counts(spark, table, w2, 2)
    refolded = read_ngram_counts(spark, table)
    plan2 = refolded._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" in plan2
    got = {(r.h, r.n_occ) for r in refolded.collect()}
    assert all(n == 3 for _, n in got)
    v2 = current_version(table)
    compact_ngram_counts(spark, table)
    assert current_version(table) == v2 + 1
    assert {
        (r.h, r.n_occ) for r in read_ngram_counts(spark, table).collect()
    } == got


def test_t35_postings_set_fold_forgives_replay(spark, tmp_path):
    """The shingle-postings index is a SET-semantics LSM on the
    two-column (doc_id, shingle) identity: a double-appended segment
    (a replay that slipped the batch-id guard) folds to the same
    postings, cross-batch duplicate shingles collapse, and after the
    fold-compaction the read serves FLAT (no DISTINCT aggregate) —
    t34's replay argument carried to the t35 state."""
    from shadowcat_data_spark.pipeline.dedup import distinct_shingles
    from shadowcat_data_spark.plans.lakehouse import current_version
    from shadowcat_data_spark.streaming.ops import (
        _fold_postings,
        read_shingle_postings,
        upsert_shingle_postings,
    )

    docs1 = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y")], "doc_id long, text string"
    )
    docs2 = spark.createDataFrame(
        [(3, "a b c d e")], "doc_id long, text string"
    )
    table = str(tmp_path / "postings")
    t1 = distinct_shingles(docs1, "doc_id", "text")
    t2 = distinct_shingles(docs2, "doc_id", "text")
    upsert_shingle_postings(spark, table, t1, 0)
    upsert_shingle_postings(spark, table, t2, 1)
    want = {
        (r.doc_id, r.t)
        for r in read_shingle_postings(spark, table).collect()
    }
    # docs 1 and 3 share their full shingle sets; doc 2 overlaps on one
    assert (1, "a b c") in want and (3, "a b c") in want
    # replayed segment that slipped the guard: the set fold forgives it
    upsert_shingle_postings(spark, table, t2, 1)
    got = {
        (r.doc_id, r.t)
        for r in read_shingle_postings(spark, table).collect()
    }
    assert got == want
    # physical fold: flat serve, same content, repeat fold no-ops
    from shadowcat_data_spark.plans.lakehouse import compact_partitioned

    compact_partitioned(spark, table, fold=_fold_postings)
    v = current_version(table)
    served = read_shingle_postings(spark, table)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" not in plan, plan
    assert {(r.doc_id, r.t) for r in served.collect()} == want
    nb, na = compact_partitioned(spark, table, fold=_fold_postings)
    assert nb == na and current_version(table) == v
