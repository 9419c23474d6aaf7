"""shadowcat_data_spark — a PySpark-native analytics/ETL engine.

A ground-up Spark-first re-expression of the capability surface of
``nypl-registry/shadowcat-data`` (reference unavailable at build time —
see SURVEY.md §0; the driver contract in ``__spark_entry__.py`` is the
operational spec).

Layout:
    session     — SparkSession factory + fixture-table loaders
    registry    — named query registry (queries() / oracle_sql() source)
    compare     — DuckDB oracle comparison helper (mirrors the driver)
    operators/  — relational operators (project/filter/join/agg/window/setops)
    functions/  — scalar function surface (string/date/math/array/map/json)
    pipeline/   — LLM-data-pipeline ops (dedup, similarity, text, multimodal)
    sources/    — sources & sinks (parquet/csv/json/jdbc-stub/stream)
    streaming/  — Structured Streaming operators
    udf/        — pandas-UDF / applyInPandas / mapInPandas surface
"""

__version__ = "0.1.0"
