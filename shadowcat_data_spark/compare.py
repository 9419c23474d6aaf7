"""DuckDB oracle comparison — local mirror of the driver's correctness gate.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB (tables pre-registered as views), then
compares row-count + schema + order-insensitive value-hash. This module
reproduces that check so the pytest suite catches mismatches before the
driver does, using the strictest plausible interpretation: EXACT value
equality after canonical stringification, rows sorted, columns sorted by
name.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import hashlib
import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .session import TABLES


def register_views(con, sf_dir: str) -> None:
    """Register the fixture parquet files as DuckDB views (driver does same)."""
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def _canon_cell(v) -> str:
    """Canonical, engine-agnostic string for one cell value.

    NaN canonicalizes to "<null>", same as None: pandas float64 columns
    cannot represent SQL NULL as anything but NaN, so the distinction is
    already erased for every double column after toPandas()/df() — keeping
    it for OBJECT columns (nullable booleans, strings) would only turn the
    engines' different missing-value representations (Spark → None,
    DuckDB → NaN) into false mismatches."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)  # shortest round-trip repr — exact for float64
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "<null>" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return format(v.normalize(), "f")
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "<null>"
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if v is pd.NaT:
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonicalize(pdf: pd.DataFrame) -> tuple[int, list[str], str, list[tuple[str, ...]]]:
    """(row_count, sorted column names, value hash, sorted canonical rows)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return len(rows), cols, h.hexdigest(), rows


@dataclass
class CompareResult:
    name: str
    ok: bool
    count_match: bool
    schema_match: bool
    hash_match: bool
    detail: str = ""

    def __bool__(self) -> bool:
        return self.ok


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    n_s, cols_s, h_s, rows_s = canonicalize(spark_pdf)
    n_o, cols_o, h_o, rows_o = canonicalize(oracle_pdf)
    count_ok = n_s == n_o
    schema_ok = cols_s == cols_o
    hash_ok = h_s == h_o
    detail = ""
    if not schema_ok:
        detail = f"spark cols {cols_s} != oracle cols {cols_o}"
    elif not count_ok:
        detail = f"spark rows {n_s} != oracle rows {n_o}"
    elif not hash_ok:
        diffs = []
        for i, (rs, ro) in enumerate(zip(rows_s, rows_o)):
            if rs != ro:
                for c, (a, b) in zip(cols_s, zip(rs, ro)):
                    if a != b:
                        diffs.append(f"row {i} col {c}: spark={a!r} oracle={b!r}")
                if len(diffs) >= 5:
                    break
        detail = "; ".join(diffs[:5]) or "hash mismatch (rows align pairwise?)"
    return CompareResult(
        name=name,
        ok=count_ok and schema_ok and hash_ok,
        count_match=count_ok,
        schema_match=schema_ok,
        hash_match=hash_ok,
        detail=detail,
    )


def complex_output_columns(df) -> list[str]:
    """Top-level array/map/struct columns in a result schema. The grading
    driver canonicalizes results with ``pandas.sort_values`` over every
    column, which raises on unhashable cells (ndarray/dict) — so NO query,
    oracle-checked or rows-only, may emit complex-typed output columns.
    Flatten at the output boundary (posexplode / array_join / struct.*)."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def run_compare(name: str, spark, con, sf_dir: str, fn, oracle: str) -> CompareResult:
    """Execute one registered query on Spark and its oracle on DuckDB, compare."""
    df = fn(spark, sf_dir)
    bad = complex_output_columns(df)
    if bad:
        return CompareResult(
            name=name,
            ok=False,
            count_match=False,
            schema_match=False,
            hash_match=False,
            detail=f"complex-typed output columns break the driver comparator: {bad}",
        )
    spark_pdf = df.toPandas()
    oracle_pdf = con.sql(oracle).df()
    return compare_frames(name, spark_pdf, oracle_pdf)
