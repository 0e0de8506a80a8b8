"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + exact canonicalized values."""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        else:
            try:
                if s.map(lambda v: isinstance(v, float)).any():
                    df[c] = s.map(lambda v: round(v, 9) if isinstance(v, float) else v)
            except Exception:
                pass
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _num_kind(s: pd.Series) -> str:
    """'int', 'float', or 'other' — for object columns, inferred from the
    Python types of the non-null values (DuckDB HUGEINT arrives as object
    or float64, which the driver renders differently from Spark's int64)."""
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if s.dtype == object:
        vals = s.dropna()
        if len(vals) and vals.map(lambda v: isinstance(v, float)).all():
            return "float"
        if len(vals) and vals.map(
            lambda v: isinstance(v, int) and not isinstance(v, bool)
        ).all():
            return "int"
    return "other"


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> Tuple[bool, str]:
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return False, f"columns differ: {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return False, f"row counts differ: {len(spark_df)} vs {len(oracle_df)}"
    # Driver-hash strictness: the driver hashes FORMATTED values, so an
    # int64 Spark column vs a float/HUGEINT oracle column ("3504091" vs
    # "3504091.0") hash-mismatches even when every value is equal. Fail
    # here too instead of unifying dtypes (the r5 dsir/ccnet escape).
    for c in sorted(spark_df.columns):
        ka, kb = _num_kind(spark_df[c]), _num_kind(oracle_df[c])
        if {ka, kb} == {"int", "float"}:
            return False, (
                f"dtype mismatch in '{c}': spark renders {ka}, oracle renders "
                f"{kb} — driver would hash-fail (CAST the oracle column)"
            )
    a, b = _canon(spark_df), _canon(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # EXACT float equality: the driver hashes values, so any ulp
            # difference between Spark and DuckDB is a failure there too
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            bad = av.astype(str) != bv.astype(str)
        if bad.any():
            i = bad.idxmax()
            return False, f"value mismatch in '{c}' row {i}: spark={a[c][i]!r} oracle={b[c][i]!r}"
    return True, "ok"


def run_all(spark, sf_dir: str, only: Optional[set] = None) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_conn(sf_dir)
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            results[name] = (len(sdf) >= 0, f"rows-only: {len(sdf)} rows")
            continue
        odf = con.sql(oracles[name]).df()
        results[name] = compare(sdf, odf)
    return results
