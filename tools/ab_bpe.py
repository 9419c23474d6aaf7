"""Prototype A/B for VERDICT r11 #8: plan-parameterized BPE merge.

Current loop: each round chains one more literal `replace(s, ' a  b ', ...)`
onto the vocab plan (materialized every 16 rounds). String literals land in
the codegen references array, so per-round VALUES don't recompile — but the
CHAIN DEPTH grows, so rounds 1..16 each compile a distinct whole-stage
source on first run (the ~20 s cold-codegen tail the verdict flagged).

Prototype: apply each round's merge through a broadcast 1-ROW merge table
(replace(s, pat_col, rep_col)) and materialize the vocab EVERY round — the
pair-count plan and the merge plan then have ONE constant shape each, so
codegen compiles ~2 sources for all 20 rounds. Price: a per-round
materialization job (the cadence r11's A/B already measured and rejected
at every-1 vs every-16 — re-tested here because the parameterized form is
what makes the constant shape possible).

Keep-criterion (VERDICT): cold time drops >= 25% with warm no worse and
hashes unchanged; otherwise reject with numbers.

Run:  python tools/ab_bpe.py current|param [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F


def _bpe_train_param(
    spark: SparkSession, docs: DataFrame, text_col: str, n_merges: int
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    from shadowcat_data_spark.pipeline import text as tx
    from shadowcat_data_spark.session import materialize

    words = materialize(
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("w", tx._bpe_word_string(F.col("w")).alias("s"), "cnt")
        .repartition(8),
        eager=True,
        iterative=True,
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        syms = tx._bpe_syms("s")
        n = F.size(syms)
        pair_rows = (
            words.select(
                F.explode(
                    F.arrays_zip(
                        F.slice(syms, F.lit(1), n - 1).alias("a"),
                        F.slice(syms, F.lit(2), n - 1).alias("b"),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.col("pc").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not pair_rows:
            break
        a, b, pc = pair_rows[0]["a"], pair_rows[0]["b"], int(pair_rows[0]["pc"])
        merged = a + b
        merges.append((rank, a, b, merged, pc))
        rule = spark.createDataFrame(
            [(f" {a}  {b} ", f" {merged} ")], "pat string, rep string"
        )
        words = materialize(
            words.crossJoin(F.broadcast(rule)).select(
                "w", F.replace(F.col("s"), F.col("pat"), F.col("rep")).alias("s"), "cnt"
            ),
            eager=True,
            iterative=True,
        )
    return merges, words


def main() -> int:
    form = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from shadowcat_data_spark.pipeline import text as tx
    from shadowcat_data_spark.session import get_spark

    if form == "param":
        tx._bpe_train = _bpe_train_param
    elif form != "current":
        raise SystemExit(f"unknown form {form!r}")

    spark = get_spark(f"ab-bpe-{form}")
    spark.sparkContext.setLogLevel("ERROR")

    from shadowcat_data_spark import registry

    fn = registry.load_all()["l43_bpe_encode"].fn

    def once() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    cold = once()  # first run: codegen compiles included
    xs = [once() for _ in range(3)]
    # result hash for equivalence (row-order-free)
    rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    import hashlib

    h = hashlib.md5(repr(rows).encode()).hexdigest()[:12]
    print(
        f"[{form}] l43 cold {cold:.4f}s warm median {statistics.median(xs):.4f}s "
        f"(all {[round(x,3) for x in xs]}) hash {h}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
