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

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_us(col: Column | str) -> Column:
    """Epoch microseconds of a timestamp column, NTZ-tolerant.

    ``CAST(x AS TIMESTAMP)`` is the identity on TimestampType and a
    session-timezone re-interpretation on TimestampNTZType; with the
    engine's UTC session pin both agree with DuckDB's ``epoch_us(ts)``
    over the same parquet bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def ts_us_sql(col_name: str) -> str:
    """SQL-text form of :func:`ts_us` for ``F.expr`` call sites."""
    return f"unix_micros(CAST({col_name} AS TIMESTAMP))"
