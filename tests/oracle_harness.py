"""Local replica of the driver's oracle comparison.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables and compares row count, column set, and values
order-insensitively (columns sorted by name, rows sorted by all columns).
Catches name/typing/value drift before the driver does.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

from time_sift_spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def _dtype_kind(s: pd.Series) -> str:
    """Coarse value-representation kind, mimicking what a stringifying
    value-hash (the driver's) is sensitive to. DuckDB's SUM(BIGINT)
    returns HUGEINT → float64 in pandas, and DATE → datetime64, while
    Spark collects BIGINT → int64 and DATE → object(datetime.date):
    equal values, different strings — the r3/r4 rollup/series_arrays
    hash-fail class. Flag the kind drift even when values compare equal."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if s.dtype == object:
        import datetime as _dt

        nn = s.dropna()
        if len(nn) and isinstance(nn.iloc[0], _dt.date) and not isinstance(nn.iloc[0], _dt.datetime):
            return "date-object"
    return "other"


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, *, float_exact: bool = True) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return [f"column mismatch: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"]
    for c in sorted(spark_df.columns):
        ka, kb = _dtype_kind(spark_df[c]), _dtype_kind(oracle_df[c])
        if ka != kb:
            problems.append(
                f"col {c}: representation kind drift spark={ka} oracle={kb}"
                " (driver value-hash would mismatch)"
            )
    if problems:
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    a, b = _normalize(spark_df), _normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            x, y = av.to_numpy(dtype=float), bv.to_numpy(dtype=float)
            both_nan = np.isnan(x) & np.isnan(y)
            if float_exact:
                eq = (x == y) | both_nan
            else:
                eq = np.isclose(x, y, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(f"col {c}: first diff at sorted row {i}: {x[i]!r} vs {y[i]!r}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                problems.append(f"col {c}: first diff at sorted row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
    return problems


def check_query(spark, name: str, sf_dir: str, *, float_exact: bool = True) -> list[str]:
    from time_sift_spark.queries import REGISTRY

    qd = REGISTRY[name]
    sdf = qd.spark_fn(spark, sf_dir).toPandas()
    if qd.oracle is None:
        return [] if len(sdf) >= 0 else ["spark query failed"]
    odf = run_oracle(qd.oracle, sf_dir)
    return compare(sdf, odf, float_exact=float_exact)
