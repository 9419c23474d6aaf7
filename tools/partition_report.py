"""Partition-skew report: per-partition row counts for any registered query.

Run: python tools/partition_report.py [query_name ...] [--sf-dir DIR]

For each query it executes the plan once and aggregates rows per physical
output partition — computed DISTRIBUTEDLY via ``spark_partition_id()`` +
groupBy (only the per-partition counts reach the driver, one row per
partition), so the report itself is safe to run on a 100 TB input.

Reported per query:
- partitions (non-empty / total tasks seen)
- rows: min / median / max per partition
- skew = max / median — the number AQE's skew-join threshold reasons about;
  a skew ≥ 4-5× on a shuffle feeding a join or agg is where you reach for
  salting (j12) or AQE skew splitting.

This is the local stand-in for what the Spark UI's stage view tells you on
a cluster; keeping it scripted makes skew checks part of the dev loop
instead of a post-mortem.
"""

from __future__ import annotations

import statistics
import sys

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F

DEFAULT_QUERIES = [
    "a1_pricing_summary",
    "j1_inner_join",
    "j12_salted_join",
    "l2b_minhash_lsh",
    "w2_topk_per_group",
]


def partition_stats(df: DataFrame) -> dict:
    counts = [
        r.n
        for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    if not counts:
        return {"partitions": 0, "rows_min": 0, "rows_med": 0, "rows_max": 0, "skew": 0.0}
    med = statistics.median(counts)
    return {
        "partitions": len(counts),
        "rows_min": min(counts),
        "rows_med": int(med),
        "rows_max": max(counts),
        "skew": round(max(counts) / med, 2) if med else float("inf"),
    }


def shuffle_skew(df: DataFrame, keys: list[str], n_partitions: int) -> dict:
    """Predict the reduce-side distribution of shuffling ``df`` on ``keys``
    into ``n_partitions``, WITHOUT running the shuffle: bucket rows by
    ``pmod(hash(keys), n)`` (the hash-partitioner's placement function) and
    count per bucket. The result is exactly the row histogram the exchange
    would produce — this is how you vet a join/agg key for skew before
    paying for it at 100 TB."""
    counts = [
        r.n
        for r in df.groupBy(
            F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(n_partitions)).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    med = statistics.median(counts) if counts else 0
    return {
        "partitions": len(counts),
        "rows_min": min(counts, default=0),
        "rows_med": int(med),
        "rows_max": max(counts, default=0),
        "skew": round(max(counts, default=0) / med, 2) if med else float("inf"),
    }


# (table, shuffle keys) pairs worth vetting before every big join/agg
DEFAULT_KEY_PROBES = [
    ("lineitem", ["l_orderkey"]),
    ("lineitem", ["l_partkey"]),
    ("orders", ["o_custkey"]),
    ("events", ["user_id"]),
    ("documents", ["lang"]),  # deliberately low-cardinality: shows real skew
]


def _print_row(label: str, s: dict) -> None:
    print(
        f"{label:40s}  {s['partitions']:5d}  {s['rows_min']:8d}  "
        f"{s['rows_med']:8d}  {s['rows_max']:8d}  {s['skew']:6.2f}"
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
    names = args or DEFAULT_QUERIES

    from shadowcat_data_spark.session import get_spark, load_table
    from shadowcat_data_spark.registry import all_queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    qs = all_queries()
    hdr = f"{'':40s}  {'parts':>5s}  {'min':>8s}  {'med':>8s}  {'max':>8s}  {'skew':>6s}"

    print("== query output partitions (post-AQE coalesce) ==")
    print(hdr)
    for name in names:
        _print_row(name, partition_stats(qs[name](spark, sf_dir)))

    print("\n== predicted shuffle distribution per candidate key ==")
    print(hdr)
    for table, keys in DEFAULT_KEY_PROBES:
        s = shuffle_skew(load_table(spark, sf_dir, table), keys, n_shuffle)
        _print_row(f"{table} by {','.join(keys)} @{n_shuffle}", s)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
