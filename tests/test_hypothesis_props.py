"""Hypothesis property tests for the pure-expression operators — algebraic
laws that need no oracle and run on a tiny in-memory frame. One shared
frame per case keeps Spark job count low; hypothesis drives the VALUES."""

from __future__ import annotations

from hypothesis import assume, given, settings, strategies as st
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


@settings(max_examples=15, deadline=None)
@given(
    st.lists(  # per-user event offsets (minutes) + purchase flag
        st.tuples(st.integers(0, 5000), st.booleans()),
        min_size=1,
        max_size=12,
    )
)
def test_dynamic_gap_sessionize_matches_reference(spark, events):
    """The t15 batch-twin semantics (running max of per-event window ends)
    fuzzed against a direct Python sessionizer on random event streams."""
    import datetime as dt

    from pyspark.sql import Window as W

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(minutes=m), "purchase" if p else "view")
        for m, p in events
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    gap_min = lambda p: 30 if p == "purchase" else 10  # noqa: E731

    # reference: sort, sweep, split where ts >= running max end
    ref_sessions = []
    cur = None
    for _, ts, et in sorted(rows, key=lambda r: r[1]):
        end = ts + dt.timedelta(minutes=gap_min(et))
        if cur is None or ts >= cur["end"]:
            cur = {"start": ts, "end": end, "n": 1}
            ref_sessions.append(cur)
        else:
            cur["end"] = max(cur["end"], end)
            cur["n"] += 1

    gap = F.when(F.col("event_type") == "purchase", F.expr("INTERVAL 30 MINUTES")).otherwise(
        F.expr("INTERVAL 10 MINUTES")
    )
    w_prev = (
        W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, -1)
    )
    ends = F.col("ts") + gap
    prev_max_end = F.max(ends).over(w_prev)
    brk = F.when(prev_max_end.isNull() | (F.col("ts") >= prev_max_end), 1).otherwise(0)
    w_run = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
    got = (
        df.withColumn("sid", F.sum(brk).over(w_run))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("start"),
            F.max(ends).alias("end"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("start")
        .collect()
    )
    assert len(got) == len(ref_sessions)
    for g, r in zip(got, ref_sessions):
        assert g.start == r["start"] and g.end == r["end"] and g.n == r["n"]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(  # small vocab forces cross-doc span collisions
        st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=25),
        min_size=1,
        max_size=6,
    )
)
def test_span_dedup_matches_reference(spark, docs):
    """l21's window+reassembly fuzzed against a direct Python span-dedup
    on random corpora with forced span collisions."""
    from shadowcat_data_spark.pipeline.text import _SPAN, span_dedup

    rows = [(i, " ".join(toks), "en", "src0", len(" ".join(toks))) for i, toks in enumerate(docs)]

    # reference: seen updates span-by-span, so an intra-doc repeat of the
    # same span is ALSO a duplicate (matches the impl's global first-
    # occurrence ordering by (doc_id, span_idx))
    seen: set[str] = set()
    ref: dict[int, tuple[int, int, str | None]] = {}
    for i, toks in enumerate(docs):
        spans = [" ".join(toks[j : j + _SPAN]) for j in range(0, len(toks), _SPAN)]
        kept = []
        for s in spans:
            if s not in seen:
                kept.append(s)
                seen.add(s)
        ref[i] = (len(spans), len(kept), " ".join(kept) if kept else None)

    import os, tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        out = {r.doc_id: r for r in span_dedup(spark, tmp).collect()}

    for i, (n_spans, n_kept, kept_text) in ref.items():
        r = out[i]
        assert (r.n_spans, r.n_kept, r.kept_text) == (n_spans, n_kept, kept_text), i


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=24).map(str.strip).filter(bool),
        min_size=2,
        max_size=8,
    )
)
def test_containment_matches_python_reference(spark, texts):
    """containment_pairs (token mode) equals a literal Python set
    computation on arbitrary tiny corpora — every pair, both directions,
    exact ratio."""
    from shadowcat_data_spark.pipeline.dedup import containment_pairs, distinct_tokens

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.d_sub, r.d_super): r.containment
        for r in containment_pairs(
            df, "doc_id", "text", threshold=0.0, tokenizer=distinct_tokens
        ).collect()
    }
    sets = {i: {w for w in t.split(" ") if w} for i, t in rows}
    want = {}
    for i in sets:
        for j in sets:
            if i == j or not sets[i]:
                continue
            inter = len(sets[i] & sets[j])
            if inter:
                want[(i, j)] = inter / len(sets[i])
    assert got == want, (got, want)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # a run of change batches, each a list of (key, op, value)
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.sampled_from(["I", "U", "D"]),
                st.integers(min_value=-999, max_value=999),
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_partitioned_merge_matches_serial_reference(spark, tmp_path_factory, batches):
    """Random CDC sequences through merge_partitioned must equal the
    serial Python application of the changelog semantics: within a batch
    the highest seq wins per key; 'I' inserts-or-replaces, 'U' updates
    only existing keys (a U for an absent key is dropped), 'D' removes.
    Hypothesis drives key collisions, replays of the same key across
    batches, deletes of absent keys, and inserts over live keys —
    including the bucket-routing of every one of those through the
    partitioned write path."""
    from shadowcat_data_spark.plans.lakehouse import (
        create_partitioned,
        merge_partitioned,
        read_snapshot,
    )

    table = str(tmp_path_factory.mktemp("pmerge") / "t")
    ddl = "k long, v double"
    state = {k: float(k) for k in range(16)}
    df = spark.createDataFrame(sorted(state.items()), ddl)
    create_partitioned(spark, df, table, ddl, "k", n_buckets=4)
    for batch in batches:
        rows = [
            (k, op, seq + 1, float(v)) for seq, (k, op, v) in enumerate(batch)
        ]
        changes = spark.createDataFrame(rows, "k long, op string, seq int, v double")
        merge_partitioned(spark, table, changes)
        # serial reference: per key, the highest-seq change wins
        latest = {}
        for k, op, seq, v in rows:
            if k not in latest or seq > latest[k][1]:
                latest[k] = (op, seq, v)
        for k, (op, _, v) in latest.items():
            if op == "D":
                state.pop(k, None)
            elif op == "I":
                state[k] = v
            elif k in state:  # U: updates only existing keys
                state[k] = v
    got = {r.k: r.v for r in read_snapshot(spark, table).collect()}
    assert got == state


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=30), min_size=2, max_size=8
    ),
    st.integers(min_value=1, max_value=6),
)
def test_bounded_jaccard_matches_python_reference(spark, texts, max_df):
    """jaccard_pairs with a max_df posting-list bound must equal the
    literal Python set computation: shared counts use ONLY tokens with
    df ≤ max_df, denominators use the FULL token sets — the exact
    contract the HAVING-mirrored oracles encode. Hypothesis drives tiny
    vocabularies where every token crosses the bound."""
    from collections import Counter

    from shadowcat_data_spark.pipeline.dedup import distinct_tokens, jaccard_pairs

    docs = {i: {t for t in s.split(" ") if t} for i, s in enumerate(texts)}
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.d1, r.d2): r.jaccard
        for r in jaccard_pairs(
            df, "doc_id", "text", tokenizer=distinct_tokens, max_df=max_df
        ).collect()
    }
    dfreq = Counter(t for toks in docs.values() for t in toks)
    want = {}
    for i in docs:
        for j in docs:
            if i < j:
                shared = sum(
                    1 for t in docs[i] & docs[j] if dfreq[t] <= max_df
                )
                if shared:
                    want[(i, j)] = shared / (len(docs[i]) + len(docs[j]) - shared)
    assert got == want


_SERVICE_OPS = st.lists(
    st.one_of(
        st.tuples(  # merge: update some keys, insert fresh, delete some
            st.just("merge"),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=60),
                    st.sampled_from(["I", "U", "D"]),
                    st.integers(min_value=-99, max_value=99),
                ),
                min_size=1,
                max_size=5,
            ),
        ),
        st.tuples(st.just("append"), st.integers(min_value=0, max_value=3)),
        st.tuples(st.just("compact"), st.none()),
        st.tuples(st.just("evolve"), st.none()),
        st.tuples(st.just("rebound"), st.none()),
        st.tuples(st.just("expire"), st.none()),
        st.tuples(  # merge-on-read delete: a few keys from the merge space
            st.just("mor_delete"),
            st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=4),
        ),
        st.tuples(  # merge-on-read upsert: key → new value
            st.just("mor_upsert"),
            st.dictionaries(
                st.integers(min_value=0, max_value=60),
                st.integers(min_value=-99, max_value=99),
                min_size=1,
                max_size=4,
            ),
        ),
        st.tuples(st.just("materialize"), st.none()),
        st.tuples(st.just("wap_append"), st.integers(min_value=0, max_value=2)),
        st.tuples(st.just("rewrite_sort"), st.none()),
    ),
    min_size=2,
    max_size=6,
)


@settings(max_examples=4, deadline=None)
@given(_SERVICE_OPS)
def test_lakehouse_service_fuzzer(spark, tmp_path_factory, ops):
    """Random interleavings of EVERY table service — COW merge, append,
    compact, evolve, rebound, expire, MOR delete/upsert, delete
    materialization, staged WAP publish — must preserve exactly the
    content a serial key→value model predicts, leave zero orphans, and
    (after a final materialize) keep the manifest row census equal to
    the table. The content-neutral services (compact/evolve/rebound/
    expire/materialize) are the dangerous ones: each rewrites or drops
    files while claiming to change nothing; the MOR ops additionally
    mix visibility state (delete files) into every later service."""
    from shadowcat_data_spark.plans import lakehouse as LH
    from shadowcat_data_spark.plans import lakehouse_mor as MOR
    from shadowcat_data_spark.plans import lakehouse_wap as WAP

    table = str(tmp_path_factory.mktemp("svc") / "t")
    ddl = "k long, v double"
    state = {k: float(k) for k in range(20)}
    LH.create_partitioned(
        spark, spark.createDataFrame(sorted(state.items()), ddl), table, ddl,
        "k", n_buckets=3,
    )
    n_evolved = 0
    next_fresh = 1000  # appended keys disjoint from merge key space
    for kind, arg in ops:
        if kind == "merge":
            rows = [(k, op, i + 1, float(v)) for i, (k, op, v) in enumerate(arg)]
            LH.merge_partitioned(
                spark,
                table,
                spark.createDataFrame(rows, "k long, op string, seq int, v double"),
            )
            latest = {}
            for k, op, seq, v in rows:
                if k not in latest or seq > latest[k][1]:
                    latest[k] = (op, seq, v)
            for k, (op, _, v) in latest.items():
                if op == "D":
                    state.pop(k, None)
                elif op == "I":
                    state[k] = v
                elif k in state:
                    state[k] = v
        elif kind == "append":
            fresh = [(next_fresh + i, -1.0) for i in range(arg)]
            next_fresh += arg
            if fresh:
                # writes may lag a schema evolution: old-shape rows are
                # legal, the explicit-schema read null-pads the new cols
                LH.append_partitioned(
                    spark, table, spark.createDataFrame(fresh, "k long, v double")
                )
                state.update(dict(fresh))
        elif kind == "compact":
            LH.compact_partitioned(spark, table)
        elif kind == "evolve":
            n_evolved += 1
            LH.evolve_schema(table, f"{ddl}, x{n_evolved} string")
            ddl = f"{ddl}, x{n_evolved} string"
        elif kind == "rebound":
            LH.rebound_partitioned(spark, table)
        elif kind == "expire":
            LH.expire_snapshots(table, keep_latest=2)
        elif kind == "mor_delete":
            MOR.delete_mor(
                spark, table, spark.createDataFrame([(k,) for k in arg], "k long")
            )
            for k in arg:
                state.pop(k, None)
        elif kind == "mor_upsert":
            rows = [(k, float(v)) for k, v in arg.items()]
            MOR.upsert_mor(spark, table, spark.createDataFrame(rows, "k long, v double"))
            state.update(dict(rows))
        elif kind == "materialize":
            MOR.materialize_deletes(spark, table)
        elif kind == "rewrite_sort":
            LH.rewrite_sorted(spark, table, "v", slices_per_bucket=2)
        elif kind == "wap_append":
            fresh = [(next_fresh + i, -2.0) for i in range(arg)]
            next_fresh += arg
            if fresh:
                sid = WAP.stage_append(
                    spark, table, spark.createDataFrame(fresh, "k long, v double")
                )
                WAP.publish_staged(table, sid)
                state.update(dict(fresh))
    got = {r.k: r.v for r in LH.read_snapshot(spark, table).select("k", "v").collect()}
    assert got == state
    # the metadata row census counts DATA rows: exact only once standing
    # MOR delete files are folded (the documented m29/m39 caveat)
    MOR.materialize_deletes(spark, table)
    got2 = {r.k: r.v for r in LH.read_snapshot(spark, table).select("k", "v").collect()}
    assert got2 == state, "materialize changed visible content"
    man = LH.read_manifest(table)
    assert sum(man["stats"][f]["rows"] for f in man["files"]) == len(state)
    assert LH.remove_orphan_files(table) == 0, "clean services left orphans"


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_bpe_matches_python_reference(spark, words_list, n_merges):
    """The Catalyst BPE trainer (pair argmax + F.aggregate greedy fold)
    must produce exactly the merge sequence of a pure-Python reference
    implementation — same tie-break (count desc, lexicographic pair) and
    same greedy left-to-right non-overlapping replacement."""
    from collections import Counter

    from shadowcat_data_spark.pipeline.text import bpe_merges

    def reference(tokens, n):
        counts = Counter(tokens)
        vocab = {tuple(list(w) + ["</w>"]): c for w, c in counts.items()}
        out = []
        for rank in range(1, n + 1):
            pairs = Counter()
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += c
            if not pairs:
                break
            (a, b), pc = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((rank, a, b, a + b, pc))
            new_vocab = Counter()
            for syms, c in vocab.items():
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                new_vocab[tuple(res)] += c
            vocab = new_vocab
        return out

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words_list)], "doc_id long, text string"
    )
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_merges(spark, docs, "text", n_merges)
        .orderBy("rank")
        .collect()
    ]
    assert got == reference(words_list, n_merges)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_bpe_encode_matches_python_reference(spark, words_list, n_merges):
    """The l43 encoder (trained merges applied as chained literal
    replaces over the symbol-string representation) must reproduce the
    pure-Python greedy encoder's per-doc token counts — INCLUDING on
    words the trainer never saw: merges train on the even docs only and
    encode everything, and hypothesis freely generates train/apply
    vocabulary mismatches. Early-stop is exercised too (n_merges can
    exceed the available pairs of a tiny corpus)."""
    from collections import Counter

    from shadowcat_data_spark.pipeline.text import (
        _bpe_train,
        bpe_encode_corpus,
    )

    def train_reference(tokens, n):
        vocab = Counter(tuple(list(w) + ["</w>"]) for w in tokens)
        out = []
        for _ in range(n):
            pairs = Counter()
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += c
            if not pairs:
                break
            (a, b), _pc = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((a, b))
            vocab = Counter(
                {tuple(_apply(syms, a, b)): c for syms, c in vocab.items()}
            )
        return out

    def _apply(syms, a, b):
        res, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                res.append(a + b)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        return res

    def encode_len(w, merges):
        syms = list(w) + ["</w>"]
        for a, b in merges:
            syms = _apply(syms, a, b)
        return len(syms)

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words_list)], "doc_id long, text string"
    )
    train_tokens = [w for i, w in enumerate(words_list) if i % 2 == 0]
    ref_merges = train_reference(train_tokens, n_merges)
    expected = {
        i: (1, encode_len(w, ref_merges), len(w))
        for i, w in enumerate(words_list)
    }
    merges, _ = _bpe_train(
        spark, docs.filter(F.col("doc_id") % 2 == 0), "text", n_merges
    )
    assert [(m[1], m[2]) for m in merges] == ref_merges
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_chars)
        for r in bpe_encode_corpus(spark, docs, "text", merges).collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_dup_ngram_coverage_matches_bruteforce(spark, texts, k):
    """l44's covered-token count comes from a max-end-so-far interval
    union computed with a window function; the reference marks every
    token under every duplicated window one token at a time. A 2-letter
    alphabet makes duplicated windows (including heavy overlaps and
    same-doc repeats) the common case rather than the edge case."""
    from collections import Counter

    from shadowcat_data_spark.pipeline.text import dup_ngram_coverage_frame

    docs = [(i, t) for i, t in enumerate(texts)]
    tok = {i: [w for w in t.split(" ") if w != ""] for i, t in docs}
    wins = Counter()
    for i, ts in tok.items():
        for j in range(len(ts) - k + 1):
            wins[" ".join(ts[j : j + k])] += 1
    expected = {}
    for i, ts in tok.items():
        starts = [
            j
            for j in range(len(ts) - k + 1)
            if wins[" ".join(ts[j : j + k])] >= 2
        ]
        covered = set()
        for s in starts:
            covered.update(range(s, s + k))
        expected[i] = (max(len(ts) - k + 1, 0), len(starts), len(covered))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.n_dup_tokens)
        for r in dup_ngram_coverage_frame(df, k).collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_dup_ngram_trim_matches_bruteforce(spark, texts, k):
    """l46's trimmed text must equal the reference that marks every
    token under every duplicated window and keeps the rest in order —
    the indexed-lambda filter (0-based in Spark, 1-based in DuckDB) is
    exactly the off-by-one a twin exists to catch."""
    from collections import Counter

    from shadowcat_data_spark.pipeline.text import dup_ngram_trim_frame

    docs = [(i, t) for i, t in enumerate(texts)]
    tok = {i: [w for w in t.split(" ") if w != ""] for i, t in docs}
    wins = Counter()
    for i, ts in tok.items():
        for j in range(len(ts) - k + 1):
            wins[" ".join(ts[j : j + k])] += 1
    expected = {}
    for i, ts in tok.items():
        covered = set()
        for j in range(len(ts) - k + 1):
            if wins[" ".join(ts[j : j + k])] >= 2:
                covered.update(range(j, j + k))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        expected[i] = (len(ts), len(kept), " ".join(kept) or None)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.kept_text)
        for r in dup_ngram_trim_frame(df, k).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from("ab"), min_size=0, max_size=10).map(" ".join),
            st.lists(st.sampled_from("ab"), min_size=0, max_size=10).map(" ".join),
            st.booleans(),  # mis-crawled (seeded with the stale text)
            st.booleans(),  # deleted after the re-crawl
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_ngram_recrawl_lifecycle_matches_oneshot(spark, rows, k):
    """The l47/t33 machinery's convergence property, randomized: seed
    the window-count index from a corpus where an arbitrary subset was
    mis-crawled with arbitrary stale text, re-crawl that subset to the
    true text (retract + add in one delta commit), then delete another
    arbitrary subset — the surviving index rows must equal a pure-Python
    md5 window count over the surviving TRUE corpus exactly: no zombie
    zero-count rows, no residual stale counts, no lost live counts,
    for ANY overlap of the mis-crawl and delete sets."""
    import hashlib
    import tempfile
    from collections import Counter

    from shadowcat_data_spark.pipeline.ngram_index import (
        read_ngram_counts,
        recrawl_ngram_counts,
        upsert_ngram_counts,
    )
    from shadowcat_data_spark.pipeline.text import ngram_window_digests

    docs = [
        (i, true, stale, mis, gone)
        for i, (true, stale, mis, gone) in enumerate(rows)
    ]

    def py_counts(pairs):
        c: Counter = Counter()
        for _i, t in pairs:
            toks = [w for w in t.split(" ") if w != ""]
            for j in range(len(toks) - k + 1):
                c[hashlib.md5(" ".join(toks[j : j + k]).encode()).hexdigest()] += 1
        return dict(c)

    seeded = [(i, stale if mis else true) for i, true, stale, mis, gone in docs]
    assume(sum(py_counts(seeded).values()) > 0)  # recrawl needs a snapshot

    def frame(pairs):
        return spark.createDataFrame(pairs, "doc_id long, text string")

    table = tempfile.mkdtemp() + "/nidx"
    _, w_seed = ngram_window_digests(frame(seeded), k)
    upsert_ngram_counts(spark, table, w_seed, 0)

    mis_ids = [i for i, *_rest in docs if docs[i][3]]
    if mis_ids:
        _, old_w = ngram_window_digests(
            frame([(i, docs[i][2]) for i in mis_ids]), k
        )
        _, new_w = ngram_window_digests(
            frame([(i, docs[i][1]) for i in mis_ids]), k
        )
        recrawl_ngram_counts(spark, table, old_w, new_w, 1)
    gone_ids = [i for i, *_rest in docs if docs[i][4]]
    if gone_ids:
        # a deleted doc's CURRENT version is always the true text by
        # this point: mis-crawled docs were re-crawled above, everything
        # else was seeded true
        _, del_w = ngram_window_digests(
            frame([(i, docs[i][1]) for i in gone_ids]), k
        )
        recrawl_ngram_counts(spark, table, del_w, None, 2)

    got = {r.h: r.n_occ for r in read_ngram_counts(spark, table).collect()}
    expected = py_counts(
        [(i, docs[i][1]) for i, *_rest in docs if not docs[i][4]]
    )
    assert got == expected
