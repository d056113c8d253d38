"""Marketing attribution: first-touch / last-touch revenue assignment.

The standard funnel-economics workload (every product-analytics store —
GA4, Amplitude, Snowplow models — ships it): each conversion event's
value is credited to a touch event in the same key's history — the most
recent touch within a lookback tolerance (last-touch) or the earliest
touch ever seen (first-touch).

Relational formulation without a join: one window pass per key.  Each
touch row encodes (event-time, campaign) into a single BIGINT
(micros·128 + campaign); conversion rows carry NULL.  A running
MAX/MIN over the (key, time) window yields the last/first touch at
every conversion — MAX/MIN skip NULLs by SQL semantics on both engines,
so no IGNORE NULLS dialect divergence, and the encoding makes
"latest ts wins, then largest campaign" a single integer comparison
(deterministic tiebreak).  ONE shuffle on the key; the campaign
aggregation is a second bounded-key shuffle with the engine's
decimal-exact revenue sum.

Reference parity note: no attribution surface exists in the reference
(Rust lag-matrix crate); charter extension (SURVEY §2.5), composing the
funnel/sessionize family with the as-of-join temporal semantics in
window form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError
from ..functions.text_fns import SPARK, Dialect

__all__ = ["attribution_sql", "attribution", "attribution_position_sql", "attribution_position"]

# Campaign-id domain contract: ids fold into [0, 128) via the engine's
# double-mod idiom (((x % 128) + 128) % 128) — sign-safe, so a negative
# id can never produce a negative remainder that would corrupt the
# MAX/MIN encode-compare tiebreak.  Ids outside [0, 128) COLLIDE after
# the fold (campaign 5 and 133 share a bucket); callers with wider id
# spaces must pre-bucket.  A touch whose campaign JSON is missing or
# non-numeric has no encodable campaign: its enc is NULL, so it is
# skipped as unattributable (the conversion falls to an earlier touch
# or to the NULL `campaign` bucket) — a contract, not an accident.
_CAMP_MOD = 128


def _json_long(d: Dialect, col: str, path: str) -> str:
    # TRY_CAST on both engines: a non-numeric campaign is the documented
    # NULL-enc skip, not an ANSI cast error killing the whole job.
    if d.name == "spark":
        return f"TRY_CAST(get_json_object({col}, '{path}') AS BIGINT)"
    return f"TRY_CAST(json_extract_string({col}, '{path}') AS BIGINT)"


def _epoch_micros(d: Dialect, col: str) -> str:
    return f"unix_micros({col})" if d.name == "spark" else f"epoch_us({col})"


def _intdiv(d: Dialect, num: str, den: int) -> str:
    """INTEGER division — plain ``/`` is float division on BOTH engines
    and micros-scaled encodings exceed 2^53, so ``/`` would corrupt the
    decoded timestamp."""
    return f"({num} div {den})" if d.name == "spark" else f"({num} // {den})"


def _attr_stage_sql(
    d: Dialect,
    table: str,
    *,
    key_col: str,
    time_col: str,
    order_col: str,
    type_col: str,
    touch_type: str,
    convert_type: str,
    value_col: str,
    campaign_json_col: str,
    campaign_json_path: str,
    tolerance_days: int,
) -> str:
    """Per-conversion stage: (value, last_campaign, first_campaign) —
    one window pass; shared by the one-statement oracle and the staged
    DataFrame path (which materializes it once: Spark inlines the CTE
    into BOTH model arms, recomputing the timeline window twice)."""
    camp = (
        f"((({_json_long(d, campaign_json_col, campaign_json_path)})"
        f" % {_CAMP_MOD} + {_CAMP_MOD}) % {_CAMP_MOD})"
    )
    mic = _epoch_micros(d, time_col)
    tol_us = tolerance_days * 86_400_000_000
    return f"""
    SELECT value,
           CASE WHEN last_enc IS NOT NULL
                 AND ({_epoch_micros(d, "ts")}) - {_intdiv(d, "last_enc", _CAMP_MOD)} <= {tol_us}
                THEN CAST(last_enc % {_CAMP_MOD} AS INT) END AS last_campaign,
           CAST(first_enc % {_CAMP_MOD} AS INT) AS first_campaign
    FROM (
      SELECT k, ts, oid, is_conv, value,
             MAX(enc) OVER w AS last_enc,
             MIN(enc) OVER w AS first_enc
      FROM (
        SELECT {key_col} AS k, {time_col} AS ts, {order_col} AS oid,
               CASE WHEN {type_col} = '{convert_type}' THEN 1 ELSE 0 END AS is_conv,
               CASE WHEN {type_col} = '{touch_type}'
                    THEN ({mic}) * {_CAMP_MOD} + ({camp}) END AS enc,
               CASE WHEN {type_col} = '{convert_type}' THEN {value_col} END AS value
        FROM {table}
        WHERE {type_col} IN ('{touch_type}', '{convert_type}')
      ) _ev
      WINDOW w AS (
        PARTITION BY k ORDER BY ts, is_conv, oid
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      )
    ) _run
    WHERE is_conv = 1
    """


def _attr_tail_sql(conv_table: str) -> str:
    """The two model aggregation arms over a staged per-conversion
    relation — dialect-neutral, shared verbatim by oracle and staged
    paths."""
    rev = "CAST(ROUND(SUM(CAST((value) AS DECIMAL(27,6))), 4) AS DOUBLE)"
    return f"""
    SELECT 'last' AS model, last_campaign AS campaign,
           COUNT(*) AS n_conversions, {rev} AS revenue
    FROM {conv_table} GROUP BY last_campaign
    UNION ALL
    SELECT 'first' AS model, first_campaign AS campaign,
           COUNT(*) AS n_conversions, {rev} AS revenue
    FROM {conv_table} GROUP BY first_campaign
    ORDER BY model, campaign
    """


def attribution_sql(
    d: Dialect,
    table: str,
    *,
    key_col: str,
    time_col: str,
    order_col: str,
    type_col: str,
    touch_type: str,
    convert_type: str,
    value_col: str,
    campaign_json_col: str,
    campaign_json_path: str = "$.k",
    tolerance_days: int = 3,
) -> str:
    """Long-format attribution report: one row per (model, campaign) —
    model ∈ ('first', 'last') — with conversion count and decimal-exact
    attributed revenue; campaign NULL collects unattributed conversions
    (no prior touch, or outside the last-touch lookback).

    Equal-timestamp touch/conversion pairs credit the touch (touches
    order before conversions at the same instant; ``order_col`` breaks
    remaining ties) — the convention documented here so both engines
    and both models share it.  This one-statement form is the ORACLE;
    the DataFrame front door stages the window once.
    """
    stage = _attr_stage_sql(
        d, table,
        key_col=key_col, time_col=time_col, order_col=order_col,
        type_col=type_col, touch_type=touch_type, convert_type=convert_type,
        value_col=value_col, campaign_json_col=campaign_json_col,
        campaign_json_path=campaign_json_path, tolerance_days=tolerance_days,
    )
    return f"WITH _conv AS ({stage})\n" + _attr_tail_sql("_conv")


def attribution(
    df: DataFrame,
    *,
    key_col: str,
    time_col: str,
    order_col: str,
    type_col: str,
    touch_type: str,
    convert_type: str,
    value_col: str,
    campaign_json_col: str,
    campaign_json_path: str = "$.k",
    tolerance_days: int = 3,
) -> DataFrame:
    """Staged execution: the per-conversion window stage materializes
    ONCE (lazy localCheckpoint) and both model arms aggregate the
    staged frame — the one-statement form (kept as the oracle) inlines
    the stage CTE into each arm, recomputing the timeline window twice.
    Tail text shared verbatim, so staged ≡ one-statement.

    Campaign-id domain: see the ``_CAMP_MOD`` contract at module top —
    ids fold sign-safely into [0, 128) (wider spaces collide; pre-bucket
    if that matters), and a touch with a missing/non-numeric campaign is
    unattributable and skipped."""
    for c in (key_col, time_col, order_col, type_col, value_col, campaign_json_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    spark = df.sparkSession
    view = "_ts_attr_in"
    df.createOrReplaceTempView(view)
    conv = spark.sql(
        _attr_stage_sql(
            SPARK, view,
            key_col=key_col, time_col=time_col, order_col=order_col,
            type_col=type_col, touch_type=touch_type, convert_type=convert_type,
            value_col=value_col, campaign_json_col=campaign_json_col,
            campaign_json_path=campaign_json_path, tolerance_days=tolerance_days,
        )
    ).localCheckpoint(eager=False)
    conv.createOrReplaceTempView("_ts_attr_conv")
    return spark.sql(_attr_tail_sql("_ts_attr_conv"))


def attribution_position_sql(
    d: Dialect,
    table: str,
    *,
    key_col: str,
    time_col: str,
    order_col: str,
    type_col: str,
    touch_type: str,
    convert_type: str,
    value_col: str,
    campaign_json_col: str,
    campaign_json_path: str = "$.k",
    round_to: int = 6,
) -> str:
    """Position-based (U-shaped) multi-touch attribution — the third
    standard model next to first/last-touch: every conversion's value
    splits across ALL its touches since the key's previous conversion —
    40% to the first touch, 40% to the last, the middle 20% evenly
    among the interior touches (n = 1 → 100%, n = 2 → 50/50 — the
    first/last shares absorb the empty interior).

    Relational shape, no self-join on time: ONE (key, time) window pass
    computes each row's running conversion count — a conversion's count
    of PRIOR conversions and a touch's count of conversions before it
    are the SAME segment id, so touch → absorbing conversion is an
    equi-join on (key, segment), never a range join.  A second window
    over (key, segment) ranks touches and counts n; per-touch credit is
    value · w with w from the exact rule above (IEEE doubles from exact
    integers, identical order both engines), round_double-quantized
    before the campaign DECIMAL sum.

    Touches after a key's last conversion credit nothing (no absorbing
    conversion — the inner join drops them); a conversion with zero
    touches in its segment appears in no campaign row (its value is
    unattributed, the first/last models' NULL-bucket analogue).
    Campaign ids fold via the module's ``_CAMP_MOD`` contract.

    Output: (campaign, n_touches, revenue) ordered by campaign.
    """
    from ._num import dec_to_double, round_double

    camp = (
        f"((({_json_long(d, campaign_json_col, campaign_json_path)})"
        f" % {_CAMP_MOD} + {_CAMP_MOD}) % {_CAMP_MOD})"
    )
    # Explicit NULLS FIRST: Spark defaults ASC to NULLS FIRST but DuckDB
    # to NULLS LAST, so a NULL-timestamp event would silently diverge
    # segment assignment between engine and oracle (ADVICE r13).
    w = ("(PARTITION BY k ORDER BY ts NULLS FIRST, is_conv, oid NULLS FIRST "
         "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    ws = "(PARTITION BY k, seg)"
    wr = "(PARTITION BY k, seg ORDER BY ts NULLS FIRST, oid NULLS FIRST)"
    share = (
        "CASE WHEN n_seg = 1 THEN CAST(1 AS DOUBLE) "
        "WHEN pos = 1 OR pos = n_seg THEN "
        "CASE WHEN n_seg = 2 THEN CAST(0.5 AS DOUBLE) "
        "ELSE CAST(0.4 AS DOUBLE) END "
        "ELSE CAST(0.2 AS DOUBLE) / CAST(n_seg - 2 AS DOUBLE) END"
    )
    credit = round_double(f"({dec_to_double('conv_value')} * ({share}))",
                          round_to)
    return f"""
    WITH _pab AS (
      SELECT {key_col} AS k, {time_col} AS ts, {order_col} AS oid,
             CASE WHEN {type_col} = '{convert_type}' THEN 1 ELSE 0 END AS is_conv,
             CASE WHEN {type_col} = '{touch_type}' THEN ({camp}) END AS campaign,
             CASE WHEN {type_col} = '{convert_type}'
                  THEN CAST({value_col} AS DECIMAL(18,6)) END AS val
      FROM {table}
      WHERE {type_col} IN ('{touch_type}', '{convert_type}')
    ),
    _par AS (
      SELECT k, ts, oid, is_conv, campaign, val,
             SUM(is_conv) OVER {w} - is_conv AS seg
      FROM _pab
    ),
    _pac AS (
      SELECT k, seg, val AS conv_value FROM _par WHERE is_conv = 1
    ),
    _pat AS (
      SELECT k, seg, campaign, ts, oid,
             ROW_NUMBER() OVER {wr} AS pos,
             COUNT(*) OVER {ws} AS n_seg
      FROM _par WHERE is_conv = 0 AND campaign IS NOT NULL
    )
    SELECT campaign,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(ROUND(SUM(CAST({credit} AS DECIMAL(27,6))), 4) AS DOUBLE)
             AS revenue
    FROM _pat t JOIN _pac c ON c.k = t.k AND c.seg = t.seg
    GROUP BY campaign
    ORDER BY campaign
    """


def attribution_position(
    df: DataFrame,
    *,
    key_col: str,
    time_col: str,
    order_col: str,
    type_col: str,
    touch_type: str,
    convert_type: str,
    value_col: str,
    campaign_json_col: str,
    campaign_json_path: str = "$.k",
) -> DataFrame:
    """DataFrame front door for :func:`attribution_position_sql` (one
    statement — every CTE is referenced once, nothing to stage)."""
    for c in (key_col, time_col, order_col, type_col, value_col,
              campaign_json_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_pattr_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        attribution_position_sql(
            SPARK, view,
            key_col=key_col, time_col=time_col, order_col=order_col,
            type_col=type_col, touch_type=touch_type,
            convert_type=convert_type, value_col=value_col,
            campaign_json_col=campaign_json_col,
            campaign_json_path=campaign_json_path,
        )
    )
