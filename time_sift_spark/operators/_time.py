"""Timestamp-type tolerance helpers.

The driver's testdata has shipped both TIMESTAMP(NANOS) (read as long
under ``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS)
parquet; the latter surfaces as TIMESTAMP_NTZ when a session has
``spark.sql.parquet.inferTimestampNTZ.enabled`` left at its Spark-4
default. ``unix_micros`` and numeric casts reject TIMESTAMP_NTZ
(DATATYPE_MISMATCH), so every operator that does epoch arithmetic goes
through :func:`ts_us`, which is a no-op wrapper for TIMESTAMP input and a
value-preserving conversion for NTZ input (sessions are pinned to UTC by
``sources.catalog.ensure_session_confs``, making the NTZ→TIMESTAMP cast
a pure re-tag).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: dtypes ts_us is defined over. Anything else (notably epoch-µs LONG
#: columns) would be silently re-interpreted by CAST(x AS TIMESTAMP) as
#: epoch SECONDS — off by 1e6 with no error — so operators assert first.
_TS_DTYPES = ("timestamp", "timestamp_ntz", "date")


def assert_time_dtype(df: DataFrame, *cols: str) -> None:
    """Fail loudly where CAST would fail silently: every ``ts_us`` /
    ``ts_us_sql`` operator call site passes its DataFrame + time column
    names through here, so a numeric (epoch-long) time column raises
    TypeError at plan-build time instead of yielding values off by 1e6.
    (The old bare ``unix_micros`` raised DATATYPE_MISMATCH for free; the
    NTZ-tolerant CAST traded that away — this check restores it.)"""
    dtypes = dict(df.dtypes)
    for c in cols:
        dt = dtypes.get(c)
        if dt is not None and dt not in _TS_DTYPES:
            raise TypeError(
                f"time column {c!r} has dtype {dt!r}; ts_us accepts only "
                f"{_TS_DTYPES} (an epoch-numeric column would be misread "
                f"as epoch seconds — convert explicitly first)"
            )


def ts_us(col: Column | str) -> Column:
    """Epoch microseconds of a timestamp column, NTZ-tolerant.

    ``CAST(x AS TIMESTAMP)`` is the identity on TimestampType and a
    session-timezone re-interpretation on TimestampNTZType; with the
    engine's UTC session pin both agree with DuckDB's ``epoch_us(ts)``
    over the same parquet bit-for-bit.  Accepts ONLY timestamp/ntz/date
    input — call sites taking a DataFrame enforce this via
    :func:`assert_time_dtype`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def ts_us_sql(col_name: str) -> str:
    """SQL-text form of :func:`ts_us` for ``F.expr`` call sites."""
    return f"unix_micros(CAST({col_name} AS TIMESTAMP))"
