"""Query registry — the driver-facing inventory of implemented operators.

Each entry pairs a Spark query builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for
genuinely non-SQL-expressible operators → driver records a rows-only
check).  ``__spark_entry__.queries()`` / ``oracle_sql()`` read this
registry.

Contract (BASELINE.json / __spark_entry__ docstring): column names must
match between the Spark result and the oracle — every computed column is
aliased identically on both sides; the driver's compare sorts columns by
name and value-hashes order-insensitively.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from .operators.lag import lag_features, lead_features
from .sources.catalog import load_table


@dataclass
class QueryDef:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    headline: bool = False  # included in bench.py timings


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: Optional[str] = None, headline: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(fn, oracle, headline)
        return fn

    return deco


INF_SQL = "CAST('infinity' AS DOUBLE)"

# --------------------------------------------------------------------------
# Core lag-feature operators (reference O1-O3 analogues, SURVEY §2.1/§2.3)
# --------------------------------------------------------------------------


@register(
    "lag_events_wide",
    oracle="""
    SELECT user_id, ts, event_id,
           LAG(value, 1) OVER w AS value_lag1,
           LAG(value, 2) OVER w AS value_lag2,
           LAG(value, 3) OVER w AS value_lag3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    headline=True,
)
def lag_events_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: lag features of event value per user (O1/O3 analogue)."""
    events = load_table(spark, "events", sf_dir)
    return lag_features(
        events, "value", "ts", [1, 2, 3], partition_by="user_id", order_extra="event_id"
    )


@register(
    "lag_events_fill_inf",
    oracle=f"""
    SELECT user_id, ts, event_id,
           COALESCE(LAG(value, 1) OVER w, {INF_SQL}) AS value_lag1,
           COALESCE(LAG(value, 4) OVER w, {INF_SQL}) AS value_lag4
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lag_events_fill_inf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference fill parity: fill=+inf (src/lib.rs:18-20 recommends inf)."""
    events = load_table(spark, "events", sf_dir)
    return lag_features(
        events,
        "value",
        "ts",
        [1, 4],
        partition_by="user_id",
        order_extra="event_id",
        fill=float("inf"),
    )


@register(
    "lag_events_long_unordered",
    oracle="""
    WITH lagged AS (
      SELECT user_id, ts, event_id,
             LAG(value, 1) OVER w AS l1,
             LAG(value, 3) OVER w AS l3,
             LAG(value, 2) OVER w AS l2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, ts, event_id, 0 AS lag_pos, 1 AS lag, l1 AS value_lagged FROM lagged
    UNION ALL
    SELECT user_id, ts, event_id, 1 AS lag_pos, 3 AS lag, l3 AS value_lagged FROM lagged
    UNION ALL
    SELECT user_id, ts, event_id, 2 AS lag_pos, 2 AS lag, l2 AS value_lagged FROM lagged
    """,
)
def lag_events_long_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long/RowMajor-analogue layout with an unordered lag set [1,3,2]
    (lag-set order preserved via lag_pos — reference src/lib.rs:699-704)."""
    events = load_table(spark, "events", sf_dir)
    return lag_features(
        events,
        "value",
        "ts",
        [1, 3, 2],
        partition_by="user_id",
        order_extra="event_id",
        layout="long",
    )


@register(
    "lag_lineitem_price",
    oracle="""
    SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
           LAG(l_extendedprice, 1) OVER w AS l_extendedprice_lag1,
           LAG(l_extendedprice, 2) OVER w AS l_extendedprice_lag2,
           LAG(l_quantity, 1) OVER w AS l_quantity_lag1,
           LAG(l_quantity, 2) OVER w AS l_quantity_lag2
    FROM lineitem
    WINDOW w AS (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
    headline=True,
)
def lag_lineitem_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-value-column lags on the biggest table (bench headline)."""
    li = load_table(spark, "lineitem", sf_dir)
    return lag_features(
        li,
        ["l_extendedprice", "l_quantity"],
        "l_shipdate",
        [1, 2],
        partition_by="l_partkey",
        order_extra=["l_orderkey", "l_linenumber"],
    )


@register(
    "lag_orders_totalprice",
    oracle="""
    SELECT o_custkey, o_orderdate, o_orderkey,
           LAG(o_totalprice, 1) OVER w AS o_totalprice_lag1,
           o_totalprice AS o_totalprice_lag0
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def lag_orders_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag set containing 0 (identity copy, reference src/lib.rs:304,493)."""
    orders = load_table(spark, "orders", sf_dir)
    return lag_features(
        orders,
        "o_totalprice",
        "o_orderdate",
        [1, 0],
        partition_by="o_custkey",
        order_extra="o_orderkey",
    )


@register(
    "lead_events",
    oracle="""
    SELECT user_id, ts, event_id,
           LEAD(value, 1) OVER w AS value_lead1,
           LEAD(value, 2) OVER w AS value_lead2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward shift extension (no reference counterpart)."""
    events = load_table(spark, "events", sf_dir)
    return lead_features(
        events, "value", "ts", [1, 2], partition_by="user_id", order_extra="event_id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def headline_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in REGISTRY.items() if q.headline}
