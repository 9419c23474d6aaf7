"""Named query registry — the single source for the driver contract.

Each operator/feature of the engine registers one (or more) named queries:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where ANSI-SQL can
express the same semantics, a DuckDB oracle SQL string. ``__spark_entry__``
simply re-exports this registry.

Conventions that make the driver's order-insensitive value-hash match:
- Alias EVERY computed column identically in Spark and SQL.
- Money/double sums: sum exact decimals, cast the result back to DOUBLE on
  both sides (deterministic under any partitioning / thread order).
- Integer aggregates: CAST(... AS BIGINT) in SQL (DuckDB sum(int)→HUGEINT).
- events.ts: Spark side is µs-truncated; oracle must CAST(ts AS TIMESTAMP).
- Top-N queries: always order by a unique tiebreaker before LIMIT.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver runs rows-only check
    category: str = ""
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# Modules whose import registers queries (side-effect registration).
_QUERY_MODULES = [
    "shadowcat_data_spark.operators.relational",
    "shadowcat_data_spark.operators.joins",
    "shadowcat_data_spark.operators.aggregates",
    "shadowcat_data_spark.operators.windows",
    "shadowcat_data_spark.functions.scalar",
    "shadowcat_data_spark.pipeline.dedup",
    "shadowcat_data_spark.pipeline.similarity",
    "shadowcat_data_spark.pipeline.text",
    "shadowcat_data_spark.pipeline.text_index",
    "shadowcat_data_spark.pipeline.multimodal",
    "shadowcat_data_spark.pipeline.jpeg",
    "shadowcat_data_spark.pipeline.png",
    "shadowcat_data_spark.pipeline.flac",
    "shadowcat_data_spark.pipeline.video",
    "shadowcat_data_spark.pipeline.gif",
    "shadowcat_data_spark.pipeline.sampling",
    "shadowcat_data_spark.sources.io",
    "shadowcat_data_spark.sources.layout",
    "shadowcat_data_spark.sources.custom",
    "shadowcat_data_spark.sources.warc",
    "shadowcat_data_spark.streaming.ops",
    "shadowcat_data_spark.udf.surface",
    "shadowcat_data_spark.plans.analytics",
    "shadowcat_data_spark.plans.tpch",
    "shadowcat_data_spark.plans.maintenance",
    "shadowcat_data_spark.plans.lakehouse",
    "shadowcat_data_spark.plans.lakehouse_mor",
    "shadowcat_data_spark.plans.lakehouse_wap",
    "shadowcat_data_spark.plans.lakehouse_zorder",
    "shadowcat_data_spark.plans.lakehouse_evolve",
]

_loaded = False


def query(
    name: str,
    oracle: str | None = None,
    category: str = "",
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query (and optional oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            category=category,
            description=description or (fn.__doc__ or "").strip().splitlines()[0]
            if (description or fn.__doc__)
            else "",
            tags=tags,
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module once; return the full registry."""
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True
    return _REGISTRY


def all_queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in load_all().items()}


def all_oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in load_all().items() if v.oracle is not None}
